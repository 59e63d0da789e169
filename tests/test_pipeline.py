"""Smoke tests for the optimize_ab 3-stage pipeline and the testset runner
with a tiny random model."""
import pathlib

import numpy as np
import pytest

from ab_opt_tpu.runners import DesignArgs, design_for_pdb
from ab_opt_tpu.runners.optimize import OptimizeArgs, optimize_antibody, scan_poses

EXAMPLES = pathlib.Path('/root/reference/AbDock/data/examples')
PDB = EXAMPLES / '7DK2_AB_C.pdb'

pytestmark = pytest.mark.skipif(not PDB.exists(), reason='examples unavailable')


def tiny_model_cfg():
    return {'res_feat_dim': 16, 'pair_feat_dim': 8, 'num_bins': 8,
            'initial_patch_size': 0, 'antigen_size': 16, 'remove_anchor': True,
            'diffusion': {'num_steps': 3, 'eps_net_opt': {'num_layers': 1},
                          'obj': 'pred_x0'}}


DOCK_CFG = {
    'mode': 'single_cdr',
    'sampling': {'cdrs': ['H_CDR3'], 'sample_structure': True,
                 'sample_sequence': False},
    'model': tiny_model_cfg(),
}
SEQ_CFG = {
    'mode': 'single_cdr',
    'sampling': {'cdrs': ['H_CDR3'], 'sample_structure': False,
                 'sample_sequence': True},
    'model': tiny_model_cfg(),
}


def test_optimize_pipeline(tmp_path):
    # Stage 0: generate docking poses for the native complex.
    pose_root = tmp_path / 'poses'
    args = DesignArgs(pdb_path=str(PDB), config=DOCK_CFG, heavy='A', light='B',
                      num_samples=2, batch_size=2, out_root=str(pose_root),
                      keep_traj=False, run_dockq=False, seed=0, id='7DK2')
    design_for_pdb(args)
    pose_dir = pose_root / '7DK2' / 'H_CDR3'
    poses = scan_poses(str(pose_dir))
    assert len(poses) == 2

    # Stages 1+2: design sequences per pose, re-dock, screen.
    df = optimize_antibody(OptimizeArgs(
        docked_pose_dir=str(pose_dir),
        seq_design_dir=str(tmp_path / 'seq_design'),
        screen_dir=str(tmp_path / 'screen'),
        design_config=SEQ_CFG, dock_config=DOCK_CFG,
        heavy_chain_id='A', design_contig='2-4',
        nums=2, num_designs=2, max_poses=1, seed=0, batch_size=2))
    assert len(df) >= 1
    assert 'DockQ_avg' in df.columns
    assert np.isfinite(df['DockQ_avg']).all()
    assert (tmp_path / 'screen' / 'screening_summary.csv').exists()


def test_scan_poses_suffix(tmp_path):
    (tmp_path / '0000.pdb').write_text('x')
    (tmp_path / '0001.pdb').write_text('x')
    (tmp_path / '0000_rosetta.pdb').write_text('x')
    (tmp_path / 'REF1.pdb').write_text('x')
    assert len(scan_poses(str(tmp_path))) == 2
    assert len(scan_poses(str(tmp_path), suffix='rosetta')) == 1
    assert len(scan_poses(str(tmp_path), max_poses=1)) == 1
