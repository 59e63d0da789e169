"""End-to-end runner tests on the 7DK2 example with a tiny random model."""
import pathlib

import numpy as np
import pytest

from ab_opt_tpu.runners import DesignArgs, design_for_pdb

EXAMPLES = pathlib.Path('/root/reference/AbDock/data/examples')
PDB = EXAMPLES / '7DK2_AB_C.pdb'

pytestmark = pytest.mark.skipif(not PDB.exists(), reason='examples unavailable')

TINY_CFG = {
    'mode': 'single_cdr',
    'sampling': {'cdrs': ['H_CDR3'], 'sample_structure': True,
                 'sample_sequence': True},
    'model': {'res_feat_dim': 16, 'pair_feat_dim': 8, 'num_bins': 8,
              'initial_patch_size': 0, 'antigen_size': 20,
              'remove_anchor': True,
              'diffusion': {'num_steps': 4,
                            'eps_net_opt': {'num_layers': 1},
                            'obj': 'pred_x0'}},
}


def test_design_for_pdb_smoke(tmp_path):
    args = DesignArgs(
        pdb_path=str(PDB), config=TINY_CFG, heavy='A', light='B',
        num_samples=3, batch_size=3, topk=2, out_root=str(tmp_path),
        keep_traj=True, run_dockq=True, seed=0)
    results = design_for_pdb(args)

    assert 'H_CDR3' in results
    summ = results['H_CDR3']
    assert 'DockQ_mean' in summ and np.isfinite(summ['DockQ_mean'])
    assert 0 <= summ['AAR_mean'] <= 1
    assert 'prmsd_mean' in summ
    assert len(summ['DockQ_top2']) == 2

    out_dir = next(tmp_path.glob('7DK2*'))
    vdir = out_dir / 'H_CDR3'
    assert (vdir / 'REF1.pdb').exists()
    assert (vdir / '0000.pdb').exists()
    assert (vdir / '0002.pdb').exists()
    assert (out_dir / 'results.csv').exists()
    assert (out_dir / 'aa.csv').exists()
    assert (out_dir / 'traj.pdb').exists()
    # Trajectory has one MODEL per diffusion step.
    traj_text = (out_dir / 'traj.pdb').read_text()
    assert traj_text.count('MODEL ') == 4

    # Sampled PDBs parse back and contain the antigen chain + CDR chain.
    from ab_opt_tpu.data import parse_pdb
    sample, _ = parse_pdb(str(vdir / '0000.pdb'))
    assert set(sample['chain_id']) == {'A', 'C'}


def test_design_seq_only(tmp_path):
    cfg = dict(TINY_CFG)
    cfg['sampling'] = {'cdrs': ['H_CDR3'], 'sample_structure': False,
                       'sample_sequence': True}
    args = DesignArgs(
        pdb_path=str(PDB), config=cfg, heavy='A', light='B',
        num_samples=2, batch_size=2, topk=1, out_root=str(tmp_path),
        keep_traj=False, run_dockq=False, seed=0)
    results = design_for_pdb(args)
    summ = results['H_CDR3']
    # Structure untouched -> no DockQ requested; AAR present.
    assert 'AAR_mean' in summ


def test_abopt_mode(tmp_path):
    cfg = dict(TINY_CFG)
    cfg['mode'] = 'abopt'
    cfg['sampling'] = {'cdrs': ['H_CDR3'], 'optimize_steps': [2],
                       'sample_structure': True, 'sample_sequence': True}
    args = DesignArgs(
        pdb_path=str(PDB), config=cfg, heavy='A', light='B',
        num_samples=2, batch_size=2, topk=1, out_root=str(tmp_path),
        keep_traj=False, run_dockq=False, seed=0)
    results = design_for_pdb(args)
    assert 'H_CDR3-O2' in results


def test_design_with_diff_gnn(tmp_path):
    """The runner dispatches on model type: diff_gnn end-to-end."""
    cfg = {
        'mode': 'single_cdr',
        'sampling': {'cdrs': ['H_CDR3'], 'sample_structure': True,
                     'sample_sequence': True},
        'model': {'type': 'diff_gnn', 'res_feat_dim': 16, 'edge_feat_dim': 8,
                  'hidden_size': 16, 'num_steps': 3, 'n_layers': 1,
                  'dropout': 0.0, 'initial_patch_size': 0, 'antigen_size': 16,
                  'remove_anchor': True},
    }
    args = DesignArgs(
        pdb_path=str(PDB), config=cfg, heavy='A', light='B',
        num_samples=2, batch_size=2, topk=1, out_root=str(tmp_path),
        keep_traj=False, run_dockq=False, seed=0)
    results = design_for_pdb(args)
    summ = results['H_CDR3']
    assert 0 <= summ['AAR_mean'] <= 1
    out_dir = next(tmp_path.glob('7DK2*'))
    assert (out_dir / 'H_CDR3' / '0000.pdb').exists()
