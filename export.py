#!/usr/bin/env python
"""CLI: python export.py --cfg configs/17/model_RSN.yaml [--batch 16]
[--out DIR] — export a trained checkpoint to a self-contained jax.export
serving artifact (see otpose_tpu/engine/export.py)."""

from otpose_tpu.cli.export import main

if __name__ == "__main__":
    main()
