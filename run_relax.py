#!/usr/bin/env python
"""Relax poses under a results tree (ref AbDock/run_relax.py)."""
import argparse
import logging

from ab_opt_tpu.tools.relax import relax_directory

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', required=True)
    parser.add_argument('--pipeline', default='openmm_pyrosetta')
    parser.add_argument('--workers', type=int, default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    tasks = relax_directory(args.root, args.pipeline, args.workers)
    print(f'{sum(t.status == "success" for t in tasks)}/{len(tasks)} relaxed')
