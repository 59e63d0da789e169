#!/usr/bin/env python
"""Run the test-set pipeline (ref AbDock/design_testset.py)."""
from ab_opt_tpu.runners.testset import main

if __name__ == '__main__':
    main()
