#!/usr/bin/env python
"""Evaluate designed structures under a results tree (ref AbDock/eval.py)."""
import argparse
import logging

from ab_opt_tpu.tools.eval import evaluate_directory

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', required=True)
    parser.add_argument('--postfix', default='')
    parser.add_argument('--energy', action='store_true', default=False)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    df = evaluate_directory(args.root, args.postfix, with_energy=args.energy)
    print(df.describe() if len(df) else 'no tasks found')
