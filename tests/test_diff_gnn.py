"""Tests for the AbDesign graph-path model (diff_gnn) in its dense-masked
TPU formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_opt_tpu.constants import Hydropathy, Charge, aa_hydropathy_table
from ab_opt_tpu.models import DiffGNN, DiffGNNConfig, get_model
from ab_opt_tpu.models.diff_gnn import interpolate_masked_coords
from ab_opt_tpu.nn.egnn import build_adjacency, radial_features
from helpers import make_batch

CFG = DiffGNNConfig(res_feat_dim=16, edge_feat_dim=8, hidden_size=16,
                    num_steps=6, n_layers=1, dropout=0.0)


@pytest.fixture(scope='module')
def setup():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, N=2, L=20)
    # Property-conditioning channels.
    aa = np.asarray(batch['aa'])
    batch['hydropathy'] = jnp.asarray(aa_hydropathy_table[aa])
    batch['charge'] = jnp.full(aa.shape, int(Charge.unknown), jnp.int32)
    batch['hotspot_label'] = jnp.ones(aa.shape, jnp.int32)
    model = DiffGNN(CFG)
    params = model.init(jax.random.key(0), batch)
    return model, batch, params


class TestAdjacency:
    def test_build_adjacency(self):
        ca = jnp.asarray([[[0, 0, 0], [3, 0, 0], [20, 0, 0], [4, 0, 0.]]])
        frag = jnp.asarray([[1, 1, 1, 3]])
        mask = jnp.ones((1, 4), bool)
        ctx, inter = build_adjacency(ca, frag, mask, 8.0, 12.0)
        ctx, inter = np.asarray(ctx[0]), np.asarray(inter[0])
        assert ctx[0, 1] and ctx[1, 0]          # same frag, 3 A
        assert not ctx[0, 2]                    # same frag, 20 A
        assert not ctx[0, 0]                    # no self loop
        assert inter[0, 3] and inter[3, 0]      # cross frag, 4 A
        assert not inter[2, 3]                  # cross frag, 16 A
        assert not ctx[0, 3]                    # cross frag not in ctx

    def test_radial_features_mask(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 5, 3, 3)), jnp.float32)
        adj = jnp.zeros((1, 5, 5), bool).at[0, 0, 1].set(True)
        radial, dist, diff = radial_features(x, adj)
        r = np.asarray(radial[0])
        # Only the (0,1) edge is nonzero.
        assert np.abs(r[0, 1]).sum() > 0
        assert np.abs(r[2, 3]).sum() == 0
        # Normalized over the single valid edge: unit L2 per channel pair.
        np.testing.assert_allclose(np.abs(r[0, 1]), 1.0, atol=1e-5)


class TestInterpolation:
    def test_pseudo_coords(self):
        L = 8
        coord = jnp.arange(L, dtype=jnp.float32)[None, :, None, None]
        coord = jnp.broadcast_to(coord, (1, L, 3, 3)) * 10
        gen = jnp.zeros((1, L), bool).at[0, 3:6].set(True)
        mask = jnp.ones((1, L), bool)
        out = interpolate_masked_coords(coord, gen, mask)
        out = np.asarray(out[0, :, 0, 0])
        # Anchors at 2 (=20) and 6 (=60): span of 4 -> 30, 40, 50.
        np.testing.assert_allclose(out[3:6], [30, 40, 50], atol=1e-4)
        np.testing.assert_allclose(out[0], 0)
        np.testing.assert_allclose(out[6], 60)


class TestDiffGNN:
    def test_registry(self):
        m = get_model({'type': 'diff_gnn', 'res_feat_dim': 8,
                       'edge_feat_dim': 8, 'hidden_size': 8, 'num_steps': 4,
                       'n_layers': 1})
        assert m.cfg.num_steps == 4

    def test_loss_finite_and_grads(self, setup):
        model, batch, params = setup
        losses = jax.jit(model.loss)(params, batch, jax.random.key(1))
        for k in ('rot', 'pos', 'bb_pos', 'seq', 'accuracy'):
            assert k in losses and np.isfinite(float(losses[k])), k

        def total(p):
            d = model.loss(p, batch, jax.random.key(2))
            return d['rot'] + d['pos'] + d['bb_pos'] + d['seq']

        g = jax.grad(total)(params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))

    def test_loss_grads_finite_with_padding(self, setup):
        """Padded rows (mask=False, aa=21, all-zero coords) must not leak
        NaN: the seq CE's OOB gather fills NaN, and construct_3d_basis on
        zero coords NaNs the rot loss *gradient* even though the masked
        loss value is finite (regression: both found via
        scripts/validation_train.py --model diff_gnn)."""
        model, batch, params = setup
        padded = {k: (np.asarray(v).copy() if isinstance(v, (np.ndarray,))
                      or hasattr(v, 'shape') else v)
                  for k, v in batch.items()}
        # Pad the last 6 rows of item 0 the way PaddingCollate does.
        sl = np.s_[0, -6:]
        padded['mask'][sl] = False
        padded['generate_flag'][sl] = False
        padded['aa'][sl] = 21
        padded['pos_heavyatom'][sl] = 0.0
        losses = model.loss(params, padded, jax.random.key(5))
        for k in ('rot', 'pos', 'bb_pos', 'seq'):
            assert np.isfinite(float(losses[k])), k

        def total(p):
            d = model.loss(p, padded, jax.random.key(6))
            return d['rot'] + d['pos'] + d['bb_pos'] + d['seq']

        g = jax.grad(total)(params)
        bad = [jax.tree_util.keystr(path)
               for path, x in jax.tree_util.tree_leaves_with_path(g)
               if not np.isfinite(np.asarray(x)).all()]
        assert not bad, bad

    def test_sample(self, setup):
        model, batch, params = setup
        out = jax.jit(lambda p, b, k: model.sample(p, b, k))(
            params, batch, jax.random.key(3))
        N, L = batch['aa'].shape
        assert out['p'].shape == (N, L, 3)
        assert out['s'].shape == (N, L)
        assert np.isfinite(np.asarray(out['p'])).all()
        ctx = ~np.asarray(batch['generate_flag'])
        np.testing.assert_array_equal(np.asarray(out['s'])[ctx],
                                      np.asarray(batch['aa'])[ctx])

    def test_optimize(self, setup):
        """Noise-to-t-then-denoise path (working equivalent of the
        reference's dead-code diff_gnn.optimize, diff_gnn.py:305-324)."""
        model, batch, params = setup
        out = jax.jit(lambda p, b, k: model.optimize(p, b, k, opt_step=3))(
            params, batch, jax.random.key(7))
        N, L = batch['aa'].shape
        assert out['p'].shape == (N, L, 3)
        assert np.isfinite(np.asarray(out['p'])).all()
        ctx = ~np.asarray(batch['generate_flag'])
        # Context residues untouched (sequence and positions).
        np.testing.assert_array_equal(np.asarray(out['s'])[ctx],
                                      np.asarray(batch['aa'])[ctx])
        p_ctx = np.asarray(batch['pos_heavyatom'])[:, :, 1][ctx]
        np.testing.assert_allclose(np.asarray(out['p'])[ctx], p_ctx,
                                   atol=1e-4)
        # Small opt_step keeps the optimized CDR near the native one
        # (it is a perturb-and-repair, not a resample from scratch).
        gen = ~ctx
        d = np.linalg.norm(np.asarray(out['p'])[gen]
                           - np.asarray(batch['pos_heavyatom'])[:, :, 1][gen],
                           axis=-1)
        assert np.isfinite(d).all()

    def test_no_leakage_through_embeddings_and_edges(self, setup):
        """Embeddings + adjacency must not depend on native CDR geometry/seq
        (the denoiser's *input* legitimately sees the noised native state)."""
        from ab_opt_tpu.models.diff_gnn import DiffGNNNet, interpolate_masked_coords
        model, batch, params = setup
        batch2 = dict(batch)
        gen = np.asarray(batch['generate_flag'])
        pos = np.array(batch['pos_heavyatom'])
        pos[gen] = pos[gen] + 100.0
        aa2 = np.array(batch['aa'])
        aa2[gen] = (aa2[gen] + 7) % 20
        batch2['pos_heavyatom'] = jnp.asarray(pos)
        batch2['aa'] = jnp.asarray(aa2)

        r1, p1 = model.net.apply(params, batch, True, True,
                                 method=DiffGNNNet.embed)
        r2, p2 = model.net.apply(params, batch2, True, True,
                                 method=DiffGNNNet.embed)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)

        # Adjacency is built from interpolated pseudo-coords: identical too.
        for b in (batch, batch2):
            b['_mc'] = interpolate_masked_coords(
                b['pos_heavyatom'][:, :, :3], b['generate_flag'], b['mask'])
        np.testing.assert_allclose(np.asarray(batch['_mc']),
                                   np.asarray(batch2['_mc']), atol=1e-4)


class TestPropertyTables:
    def test_hydropathy_values(self):
        from ab_opt_tpu.constants import ressymb_to_resindex
        assert aa_hydropathy_table[ressymb_to_resindex['C']] == int(Hydropathy.moderate)
        assert aa_hydropathy_table[ressymb_to_resindex['R']] == int(Hydropathy.hydrophilic)

    def test_label_transform(self):
        from ab_opt_tpu.data.transforms import Label
        rng = np.random.default_rng(0)
        data = {'aa': np.array([0, 1, 14, 2]),
                'generate_flag': np.array([False, True, True, True])}
        out = Label(hydropathy=True, charge=True)(dict(data), rng)
        assert out['hydropathy'][0] == int(Hydropathy.unknown)
        assert out['hydropathy'][1] == int(Hydropathy.moderate)   # C
        assert out['charge'][2] == int(Charge.positive)           # R
        assert out['charge'][3] == int(Charge.negative)           # D
        # Full dropout -> all unknown.
        out2 = Label(hydropathy=True, charge=True, drop_prob=1.0)(dict(data), rng)
        assert (out2['hydropathy'][1:] == int(Hydropathy.unknown)).all()

    def test_strided_sampling_gnn(self, setup):
        model, batch, params = setup
        out = model.sample(params, batch, jax.random.key(13), stride=2)
        assert np.isfinite(np.asarray(out['p'])).all()
        ctx = ~np.asarray(batch['generate_flag'])
        np.testing.assert_array_equal(np.asarray(out['s'])[ctx],
                                      np.asarray(batch['aa'])[ctx])
