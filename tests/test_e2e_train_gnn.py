"""End-to-end diff_gnn training through the full config pipeline on the
mini-SAbDab fixture (aa_label-style transforms incl. hotspots)."""
import pathlib
import shutil

import numpy as np
import pytest

from ab_opt_tpu.data import PaddingCollate, get_dataset
from ab_opt_tpu.data.loader import DataLoader, inf_iterator
from ab_opt_tpu.models import get_model
from ab_opt_tpu.train import Trainer

EXAMPLES = pathlib.Path('/root/reference/AbDock/data/examples')

pytestmark = pytest.mark.skipif(not EXAMPLES.exists(),
                                reason='examples unavailable')


@pytest.fixture(scope='module')
def mini_sabdab(tmp_path_factory):
    root = tmp_path_factory.mktemp('sabdab_gnn')
    chothia = root / 'chothia'
    chothia.mkdir()
    for code, src in (('7dk2', '7DK2_AB_C_chothia.pdb'),
                      ('7bsd', '7bsd_A_B_G_chothia.pdb')):
        shutil.copy(EXAMPLES / src, chothia / f'{code}.pdb')
    tsv = root / 'summary.tsv'
    tsv.write_text(
        'pdb\tHchain\tLchain\tmodel\tantigen_chain\tantigen_type\tantigen_name\tdate\tresolution\tmethod\tscfv\n'
        '7dk2\tA\tB\t0\tC\tprotein\tx\t01/01/21\t2.5\tX-RAY\tFalse\n'
        '7bsd\tA\tB\t0\tG\tprotein\ty\t02/02/21\t2.0\tX-RAY\tFalse\n')
    return root


def test_diff_gnn_training_pipeline(mini_sabdab, tmp_path):
    ds_cfg = {
        'type': 'sabdab',
        'summary_path': str(mini_sabdab / 'summary.tsv'),
        'chothia_dir': str(mini_sabdab / 'chothia'),
        'processed_dir': str(mini_sabdab / 'processed'),
        'split': 'val',
        'transform': [
            {'type': 'filter_structure', 'must_have_antigen': True},
            {'type': 'mask_single_cdr', 'selection': 'H_CDR3'},
            {'type': 'merge_chains'},
            {'type': 'patch_around_anchor_hotspot', 'antigen_size': 16,
             'max_nb_hotspots': 1},
            {'type': 'aa_label', 'hydropathy': True, 'charge': True,
             'drop_prob': 0.3},
        ],
    }
    dataset = get_dataset(ds_cfg)
    assert len(dataset) == 2
    item = dataset[0]
    for key in ('hotspot_label', 'hydropathy', 'charge', 'generate_flag'):
        assert key in item, key
    assert (item['hotspot_label'] == 2).sum() == 1

    model = get_model({'type': 'diff_gnn', 'res_feat_dim': 16,
                       'edge_feat_dim': 8, 'hidden_size': 16, 'num_steps': 6,
                       'n_layers': 1, 'dropout': 0.1})
    train_cfg = {
        'loss_weights': {'rot': 1.0, 'pos': 1.0, 'bb_pos': 1.0, 'seq': 1.0},
        'batch_size': 2, 'max_iters': 4, 'val_freq': 100,
        'optimizer': {'type': 'adam', 'lr': 1e-3},
    }
    trainer = Trainer(model, train_cfg, log_dir=str(tmp_path))
    loader = DataLoader(dataset, 2, collate_fn=PaddingCollate(), prefetch=0)
    trainer.init_params(next(iter(loader)))
    trainer.train(inf_iterator(loader), max_iters=4, log_every=1000)
    assert trainer.iteration == 4
