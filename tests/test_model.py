"""End-to-end model tests: init, loss, sampling, optimize, jit caching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_opt_tpu.models import DiffAb, DiffAbConfig, get_model
from helpers import make_batch

CFG = DiffAbConfig(res_feat_dim=32, pair_feat_dim=16, num_steps=10,
                   num_layers=2, num_bins=8)


@pytest.fixture(scope='module')
def model():
    return DiffAb(CFG)


@pytest.fixture(scope='module')
def setup(model):
    rng = np.random.default_rng(0)
    batch = make_batch(rng, N=2, L=24)
    params = model.init(jax.random.key(0), batch)
    return batch, params


class TestDiffAb:
    def test_registry(self):
        m = get_model({'type': 'diffab', 'res_feat_dim': 16, 'pair_feat_dim': 8,
                       'num_bins': 8, 'dist_min': 0.5, 'dist_max': 19.5,
                       'diffusion': {'num_steps': 5,
                                     'eps_net_opt': {'num_layers': 1},
                                     'obj': 'pred_x0'}})
        assert m.cfg.num_steps == 5 and m.cfg.num_layers == 1
        assert m.cfg.obj == 'pred_x0'

    def test_loss_finite(self, model, setup):
        batch, params = setup
        losses = jax.jit(model.loss)(params, batch, jax.random.key(1))
        for k in ('rot', 'pos', 'seq', 'prmsd', 'dist'):
            assert k in losses
            assert np.isfinite(float(losses[k])), (k, losses[k])

    def test_prmsd_loss_live_with_mid_sequence_cdr(self, model, setup):
        """The pRMSD confidence loss must be nonzero when the generate
        region is NOT at patch index 0 (the reference's positional
        mask_generate[:, 0] silently zeroes it for any crop with
        initial_patch_size > 0; the rebuild uses the semantic any-generated
        mask). make_batch puts the CDR at [6, 12), so a zero here means the
        head is not training."""
        batch, params = setup
        losses = model.loss(params, batch, jax.random.key(3))
        assert float(losses['prmsd']) > 1e-4, losses['prmsd']

    def test_loss_t0_finite(self, model, setup):
        """t=0 must not NaN (the torch reference's KL NaNs there)."""
        batch, params = setup
        t = jnp.zeros((2,), jnp.int32)
        losses = model.loss(params, batch, jax.random.key(2), t=t)
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, v)

    def test_loss_grads_finite(self, model, setup):
        batch, params = setup

        def total(params):
            d = model.loss(params, batch, jax.random.key(3))
            return sum(d.values())

        g = jax.grad(total)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # Gradients reach the encoder embeddings, not just the heads.
        flat = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: float(jnp.abs(x).sum()), g))
        assert sum(flat) > 0

    def test_sample_shapes_and_context(self, model, setup):
        batch, params = setup
        out = jax.jit(lambda p, b, k: model.sample(p, b, k))(params, batch,
                                                             jax.random.key(4))
        N, L = batch['aa'].shape
        assert out['v'].shape == (N, L, 3)
        assert out['p'].shape == (N, L, 3)
        assert out['s'].shape == (N, L)
        assert out['prmsd'].shape == (CFG.num_steps, N)
        assert out['perplexity'].shape == (CFG.num_steps, N)
        # Context residues keep their native sequence and positions.
        ctx = ~np.asarray(batch['generate_flag'])
        np.testing.assert_array_equal(np.asarray(out['s'])[ctx],
                                      np.asarray(batch['aa'])[ctx])
        pos_ca = np.asarray(batch['pos_heavyatom'][:, :, 1])
        np.testing.assert_allclose(np.asarray(out['p'])[ctx], pos_ca[ctx],
                                   atol=1e-4)
        # Generated residues moved.
        gen = ~ctx
        assert not np.allclose(np.asarray(out['p'])[gen], pos_ca[gen], atol=0.5)

    def test_sample_keep_traj(self, model, setup):
        batch, params = setup
        out = model.sample(params, batch, jax.random.key(5), keep_traj=True)
        N, L = batch['aa'].shape
        assert out['traj']['p'].shape == (CFG.num_steps, N, L, 3)

    def test_optimize(self, model, setup):
        batch, params = setup
        out = model.optimize(params, batch, jax.random.key(6), opt_step=5)
        assert out['prmsd'].shape == (5, 2)
        assert np.isfinite(np.asarray(out['p'])).all()

    def test_sample_seq_only(self, model, setup):
        """Sequence design mode: structure untouched."""
        batch, params = setup
        out = model.sample(params, batch, jax.random.key(7),
                           sample_structure=False, sample_sequence=True)
        pos_ca = np.asarray(batch['pos_heavyatom'][:, :, 1])
        np.testing.assert_allclose(np.asarray(out['p']), pos_ca, atol=1e-4)

    def test_grads_finite_with_padding(self, model):
        """Real batches have padded rows (pos=0): zero-vector norms must not
        NaN the backward pass (regression for jnp.linalg.norm 0/0 grads)."""
        rng = np.random.default_rng(3)
        batch = make_batch(rng, N=2, L=24)
        # Pad out the last 8 residues like PaddingCollate would.
        mask = np.asarray(batch['mask']).copy(); mask[:, 16:] = False
        pos = np.asarray(batch['pos_heavyatom']).copy(); pos[:, 16:] = 0.0
        ma = np.asarray(batch['mask_heavyatom']).copy(); ma[:, 16:] = False
        aa = np.asarray(batch['aa']).copy(); aa[:, 16:] = 21
        frag = np.asarray(batch['fragment_type']).copy(); frag[:, 16:] = 0
        batch.update(mask=jnp.asarray(mask), pos_heavyatom=jnp.asarray(pos),
                     mask_heavyatom=jnp.asarray(ma), aa=jnp.asarray(aa),
                     fragment_type=jnp.asarray(frag))
        params = model.init(jax.random.key(10), batch)

        def total(p):
            d = model.loss(p, batch, jax.random.key(11))
            return sum(d.values())

        g = jax.grad(total)(params)
        bad = [jax.tree_util.keystr(path)
               for path, leaf in jax.tree_util.tree_leaves_with_path(g)
               if not np.isfinite(np.asarray(leaf)).all()]
        assert not bad, f'non-finite grads in: {bad[:5]}'

    def test_strided_sampling(self, model, setup):
        """DDIM-style stride: fewer denoiser calls, same output contract."""
        batch, params = setup
        out = model.sample(params, batch, jax.random.key(12), stride=2)
        N, L = batch['aa'].shape
        assert out['prmsd'].shape[0] == CFG.num_steps // 2
        assert np.isfinite(np.asarray(out['p'])).all()
        ctx = ~np.asarray(batch['generate_flag'])
        np.testing.assert_array_equal(np.asarray(out['s'])[ctx],
                                      np.asarray(batch['aa'])[ctx])
