"""Design/docking CLI (ref dock_pdb.py / design_pdb.py thin wrappers around
design_for_pdb; args mirror design_for_pdb.py:362-425)."""
from __future__ import annotations

import argparse
import logging

from ..utils import load_config
from .design import DesignArgs, design_for_pdb


def main(argv=None):
    from ..utils import enable_compile_cache
    enable_compile_cache()  # skip recompiles across processes
    parser = argparse.ArgumentParser()
    parser.add_argument('--pdb_path', type=str, required=True)
    parser.add_argument('--id', type=str, default='')
    parser.add_argument('-c', '--config', type=str, required=True)
    parser.add_argument('-ck', '--ckpt', type=str, default=None)
    parser.add_argument('--heavy', type=str, default='H')
    parser.add_argument('--light', type=str, default='L')
    parser.add_argument('-n', '--num_samples', type=int, default=10)
    parser.add_argument('-b', '--batch_size', type=int, default=16)
    parser.add_argument('--topk', type=int, default=1)
    parser.add_argument('--no_renumber', action='store_true', default=False)
    parser.add_argument('--label_heavy_as_cdr', action='store_true', default=False)
    parser.add_argument('--contig', type=str, default='')
    parser.add_argument('-o', '--out_root', type=str, default='./results')
    parser.add_argument('-t', '--tag', type=str, default='')
    parser.add_argument('-s', '--seed', type=int, default=0)
    parser.add_argument('--no_dockq', action='store_true', default=False)
    parser.add_argument('--stride', type=int, default=1,
                        help='Strided (DDIM-style) sampling: >1 trades '
                             'quality for k-fold fewer denoiser steps.')
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    config, _ = load_config(args.config)
    design_args = DesignArgs(
        pdb_path=args.pdb_path, ckpt=args.ckpt, config=dict(config),
        heavy=args.heavy, light=args.light, no_renumber=args.no_renumber,
        num_samples=args.num_samples, batch_size=args.batch_size,
        topk=args.topk, seed=args.seed, out_root=args.out_root, tag=args.tag,
        contig=args.contig, label_heavy_as_cdr=args.label_heavy_as_cdr,
        run_dockq=not args.no_dockq, id=args.id, stride=args.stride)
    results = design_for_pdb(design_args)
    print(results)
    return results


if __name__ == '__main__':
    main()
