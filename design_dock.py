#!/usr/bin/env python
"""HDock global docking + CDR design (ref AbDesign/design_dock.py)."""
from ab_opt_tpu.runners.design_dock import main

if __name__ == '__main__':
    main()
