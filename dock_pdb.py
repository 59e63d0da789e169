#!/usr/bin/env python
"""Site-specific CDR docking for one PDB (ref AbDock/dock_pdb.py)."""
from ab_opt_tpu.runners.design_cli import main

if __name__ == '__main__':
    main()
