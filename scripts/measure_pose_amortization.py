"""Measure sampler-compile amortization across a pipeline pose loop.

The optimize pipeline's stage loops call design_for_pdb once per pose; with
the memoized BatchedSampler + shared length buckets, only the first pose
pays tracing/compilation. This script times a stage-2-style loop (same
model, several poses) and reports per-pose wall times.

Usage: python scripts/measure_pose_amortization.py [n_poses]
"""
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from ab_opt_tpu.models import get_model
from ab_opt_tpu.runners import DesignArgs, design_for_pdb

PDB = '/root/reference/AbDock/data/examples/7DK2_AB_C.pdb'
CFG = {
    'mode': 'single_cdr',
    'sampling': {'cdrs': ['H_CDR3'], 'sample_structure': True,
                 'sample_sequence': False},
    'model': {'res_feat_dim': 128, 'pair_feat_dim': 64, 'num_bins': 40,
              'initial_patch_size': 80, 'antigen_size': 48,
              'remove_anchor': True, 'dtype': 'bfloat16',
              'diffusion': {'num_steps': 100,
                            'eps_net_opt': {'num_layers': 6}}},
}


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    model = get_model(dict(CFG['model'], type='diffab'))
    out = tempfile.mkdtemp()
    times = []
    try:
        for i in range(n_poses):
            t0 = time.perf_counter()
            design_for_pdb(
                DesignArgs(pdb_path=PDB, config=CFG, heavy='A', light='B',
                           num_samples=16, batch_size=16, topk=1,
                           out_root=out, keep_traj=False, run_dockq=True,
                           seed=i, id=f'pose{i}', no_renumber=True),
                model=model)
            times.append(time.perf_counter() - t0)
            print(f'pose {i}: {times[-1]:.1f} s', flush=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    if len(times) > 1:
        steady = sum(times[1:]) / (len(times) - 1)
        print(f'first pose (incl. compile): {times[0]:.1f} s; '
              f'steady-state per pose: {steady:.1f} s; '
              f'amortization factor: {times[0] / steady:.1f}x', flush=True)


if __name__ == '__main__':
    main()
