"""End-to-end reference-checkpoint import: build the actual reference torch
model, save a torch checkpoint, convert with scripts/convert_checkpoint.py,
and run design_for_pdb from the converted file."""
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
EXAMPLES = pathlib.Path('/root/reference/AbDock/data/examples')

MODEL_CFG = {
    'type': 'diffab',
    'res_feat_dim': 16,
    'pair_feat_dim': 8,
    'num_bins': 8,
    'dist_min': 0.5,
    'dist_max': 19.5,
    'train_structure': True,
    'train_sequence': False,
    'initial_patch_size': 0,
    'antigen_size': 16,
    'remove_anchor': True,
    'diffusion': {'num_steps': 4, 'eps_net_opt': {'num_layers': 1},
                  'obj': 'pred_x0'},
}


@pytest.fixture(scope='module')
def torch_ckpt(tmp_path_factory, reference_abdock):
    _, torch = reference_abdock
    from ab_opt_tpu.utils.config import ConfigDict
    from src.models.diffab import DiffusionAntibodyDesign

    torch.manual_seed(0)
    cfg = ConfigDict.wrap(MODEL_CFG)
    model = DiffusionAntibodyDesign(cfg)
    path = tmp_path_factory.mktemp('ckpt') / 'ref_100.pt'
    torch.save({'config': {'model': MODEL_CFG}, 'model': model.state_dict(),
                'iteration': 100}, str(path))
    return path


def test_convert_script_and_inference(torch_ckpt, tmp_path):
    out_ckpt = tmp_path / 'converted.ckpt'
    res = subprocess.run(
        [sys.executable, str(REPO / 'scripts' / 'convert_checkpoint.py'),
         str(torch_ckpt), str(out_ckpt)],
        capture_output=True, text=True, cwd=str(REPO), timeout=300,
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin:/usr/local/bin',
             'HOME': '/root', 'PYTHONPATH': str(REPO)})
    assert res.returncode == 0, res.stderr[-2000:]
    assert out_ckpt.exists()

    # Load via the runner path: architecture rebuilt from embedded config.
    from ab_opt_tpu.runners.design import load_model_from_checkpoint
    model, params, config = load_model_from_checkpoint(str(out_ckpt))
    assert model.cfg.num_steps == 4 and model.cfg.num_layers == 1
    n_leaves = len(__import__('jax').tree_util.tree_leaves(params))
    assert n_leaves > 50

    if not EXAMPLES.exists():
        pytest.skip('examples unavailable')
    from ab_opt_tpu.runners import DesignArgs, design_for_pdb
    args = DesignArgs(
        pdb_path=str(EXAMPLES / '7DK2_AB_C.pdb'), ckpt=str(out_ckpt),
        config={'mode': 'single_cdr',
                'sampling': {'cdrs': ['H_CDR3'], 'sample_structure': True,
                             'sample_sequence': False}},
        heavy='A', light='B', num_samples=2, batch_size=2,
        out_root=str(tmp_path / 'res'), keep_traj=False, run_dockq=True)
    results = design_for_pdb(args)
    assert np.isfinite(results['H_CDR3']['DockQ_mean'])
