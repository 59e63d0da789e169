"""Data-layer tests: PDB IO, preprocessing, transforms, collation, and the
full host->device pipeline feeding the model."""
import pathlib

import jax
import numpy as np
import pytest

from ab_opt_tpu.constants import CDR, Fragment, AA_UNK
from ab_opt_tpu.data import (
    PaddingCollate,
    apply_patch_to_tensor,
    get_transform,
    parse_pdb,
    pdb_chain_ids,
    preprocess_antibody_structure,
    save_pdb,
    to_device_batch,
)
from ab_opt_tpu.data.transforms import DISTVIOLATION

EXAMPLES = pathlib.Path('/root/reference/AbDock/data/examples')
PDB_7DK2 = EXAMPLES / '7DK2_AB_C.pdb'

pytestmark = pytest.mark.skipif(not PDB_7DK2.exists(),
                                reason='example PDBs unavailable')


@pytest.fixture(scope='module')
def structure():
    return preprocess_antibody_structure(
        {'id': '7DK2', 'pdb_path': str(PDB_7DK2), 'heavy_id': 'A', 'light_id': 'B'})


class TestParser:
    def test_chain_ids(self):
        assert pdb_chain_ids(str(PDB_7DK2)) == ['A', 'B', 'C']

    def test_parse_basic(self):
        data, seq_map = parse_pdb(str(PDB_7DK2))
        L = data['aa'].shape[0]
        assert L > 300
        assert data['pos_heavyatom'].shape == (L, 15, 3)
        assert data['mask_heavyatom'][:, :3].all()      # N, CA, C present
        assert len(seq_map) == L
        assert (data['aa'] >= 0).all() and (data['aa'] <= 19).all()
        # res_nb is strictly increasing within a chain.
        ids = np.asarray([c for c in data['chain_id']])
        for c in 'ABC':
            nb = data['res_nb'][ids == c]
            assert (np.diff(nb) >= 1).all()

    def test_roundtrip(self, tmp_path):
        data, _ = parse_pdb(str(PDB_7DK2), chain_ids=['A'])
        out = tmp_path / 'out.pdb'
        save_pdb(data, str(out))
        data2, _ = parse_pdb(str(out))
        np.testing.assert_array_equal(data2['aa'], data['aa'])
        np.testing.assert_array_equal(data2['resseq'], data['resseq'])
        np.testing.assert_allclose(data2['pos_heavyatom'], data['pos_heavyatom'],
                                   atol=2e-3)
        np.testing.assert_array_equal(data2['mask_heavyatom'], data['mask_heavyatom'])


class TestPreprocess:
    def test_groups(self, structure):
        assert structure is not None
        assert structure['heavy'] is not None
        assert structure['light'] is not None
        assert structure['antigen'] is not None
        # Heavy chain has a CDR-H3 labeled.
        cdr = structure['heavy']['cdr_flag']
        assert (cdr == int(CDR.H3)).sum() > 0
        assert structure['heavy']['H3_seq'] != ''
        # Fv truncation: Chothia resseq <= 113.
        assert structure['heavy']['resseq'].max() <= 113


class TestTransformPipeline:
    TFM_CFG = [
        {'type': 'mask_single_cdr', 'selection': 'H_CDR3', 'augmentation': False},
        {'type': 'merge_chains'},
        {'type': 'patch_around_anchor', 'initial_patch_size': 0,
         'antigen_size': 20, 'remove_anchor': True, 'dist_cutoff': 12.0},
    ]

    def test_crop(self, structure):
        import copy
        tfm = get_transform(self.TFM_CFG)
        patch = tfm(copy.deepcopy(structure), rng=np.random.default_rng(0))
        # Patch = CDR-H3 + up to 20 antigen residues, recentered.
        n_cdr = int((structure['heavy']['cdr_flag'] == int(CDR.H3)).sum())
        assert patch['generate_flag'].sum() == n_cdr
        assert (patch['fragment_type'] == int(Fragment.Antigen)).sum() <= 20
        assert patch['aa'].shape[0] == patch['generate_flag'].shape[0]
        assert 'patch_idx' in patch and 'origin' in patch
        # Anchor-centered: coordinates are near the origin.
        ca = patch['pos_heavyatom'][:, 1]
        assert np.abs(ca).max() < 100

    def test_dist_violation(self, structure):
        import copy
        cfg = [dict(d) for d in self.TFM_CFG]
        cfg[2] = dict(cfg[2], dist_cutoff=0.1)
        tfm = get_transform(cfg)
        with pytest.raises(DISTVIOLATION):
            tfm(copy.deepcopy(structure), rng=np.random.default_rng(0))

    def test_remove_native(self, structure):
        import copy
        cfg = self.TFM_CFG + [{'type': 'remove_native'}]
        tfm = get_transform(cfg)
        patch = tfm(copy.deepcopy(structure), rng=np.random.default_rng(0))
        gen = patch['generate_flag']
        assert (patch['aa'][gen] == AA_UNK).all()

    @pytest.mark.e2e
    def test_full_pipeline_to_model(self, structure):
        """Crop -> collate -> device batch -> model loss runs finite."""
        import copy
        from ab_opt_tpu.models import DiffAb, DiffAbConfig

        tfm = get_transform(self.TFM_CFG)
        rng = np.random.default_rng(0)
        items = [tfm(copy.deepcopy(structure), rng=rng) for _ in range(2)]
        batch_np = PaddingCollate()(items)
        assert batch_np['aa'].shape[0] == 2
        assert batch_np['mask'].dtype == bool
        batch = to_device_batch(batch_np)
        assert 'aa' in batch and 'generate_flag' in batch

        model = DiffAb(DiffAbConfig(res_feat_dim=16, pair_feat_dim=8,
                                    num_steps=4, num_layers=1, num_bins=8))
        params = model.init(jax.random.key(0), batch)
        losses = model.loss(params, batch, jax.random.key(1))
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, v)

    def test_patch_paste_back(self, structure):
        import copy
        tfm = get_transform(self.TFM_CFG)
        patch = tfm(copy.deepcopy(structure), rng=np.random.default_rng(0))
        merged = get_transform(self.TFM_CFG[:2])(copy.deepcopy(structure),
                                                 rng=np.random.default_rng(0))
        full_aa = merged['aa']
        new_aa = np.zeros_like(patch['aa'])
        pasted = apply_patch_to_tensor(full_aa, new_aa, patch['patch_idx'])
        assert (pasted[patch['patch_idx']] == 0).all()
        untouched = np.setdiff1d(np.arange(full_aa.shape[0]), patch['patch_idx'])
        np.testing.assert_array_equal(pasted[untouched], full_aa[untouched])


class TestCollate:
    def test_bucket_padding(self):
        rng = np.random.default_rng(0)
        items = []
        for L in (30, 45):
            items.append({
                'aa': rng.integers(0, 20, L),
                'pos_heavyatom': rng.normal(size=(L, 15, 3)).astype(np.float32),
                'generate_flag': np.zeros(L, bool),
            })
        batch = PaddingCollate()(items)
        # 45 -> bucket 48.
        assert batch['aa'].shape == (2, 48)
        assert batch['mask'].sum() == 75
        assert (batch['aa'][0, 30:] == 21).all()
