#!/usr/bin/env python
"""3-stage antibody optimization pipeline (ref AbDock/optimize_ab.py)."""
from ab_opt_tpu.runners.optimize import main

if __name__ == '__main__':
    main()
