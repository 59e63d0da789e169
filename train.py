#!/usr/bin/env python
"""Train a model (ref AbDock/train.py). See configs/train/*.yml."""
from ab_opt_tpu.runners.train_cli import main

if __name__ == '__main__':
    main()
