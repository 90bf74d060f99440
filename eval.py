#!/usr/bin/env python
"""CLI: python eval.py --cfg configs/17/model_RSN.yaml [--test]
(public surface matches the reference eval.py)."""

from otpose_tpu.cli.eval import main

if __name__ == "__main__":
    main()
