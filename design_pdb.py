#!/usr/bin/env python
"""CDR sequence-structure co-design for one PDB (ref design_pdb.py)."""
from ab_opt_tpu.runners.design_cli import main

if __name__ == '__main__':
    main()
