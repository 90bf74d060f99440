#!/usr/bin/env python
"""CLI: python train.py --cfg configs/17/model_RSN.yaml [opts...]
(public surface matches the reference train.py)."""

from otpose_tpu.cli.train import main

if __name__ == "__main__":
    main()
