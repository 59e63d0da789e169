"""Fused pallas IPA kernel: equivalence with the einsum path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_opt_tpu.ops import fused_ipa_from_flat, ipa_attention_reference
from ab_opt_tpu.nn import EpsilonNet


def _rand_inputs(rng, N=2, L=32, H=12, Dqk=32, P=8, PV=8, Cz=64):
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    return dict(
        q=f(N, L, H * Dqk), k=f(N, L, H * Dqk),
        qp=f(N, L, H * P * 3), kp=f(N, L, H * P * 3),
        v=f(N, L, H * Dqk), vp=f(N, L, H * PV * 3),
        z=f(N, L, L, Cz), pair_w=f(Cz, H) * 0.1,
        coef=-jnp.abs(f(H)) * 0.05,
        mask=jnp.ones((N, L)).at[1, -5:].set(0),
    )


class TestKernel:
    def test_matches_reference(self, rng):
        inp = _rand_inputs(rng)
        ref = ipa_attention_reference(**inp)
        got = fused_ipa_from_flat(**inp, interpret=True)
        for a, b, name in zip(got, ref, ('p2n', 'node', 'pts')):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, err_msg=name)

    def test_odd_tile_sizes(self, rng):
        """L=48 exercises the TI=16 tiling path."""
        inp = _rand_inputs(rng, N=1, L=48)
        ref = ipa_attention_reference(**inp)
        got = fused_ipa_from_flat(**inp, interpret=True)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestEndToEnd:
    def test_epsilon_net_pallas_vs_einsum(self, rng):
        """Full EpsilonNet forward agrees between implementations."""
        N, L, F, C = 2, 16, 16, 8
        from helpers import make_batch
        batch = make_batch(np.random.default_rng(0), N=N, L=L)

        v_t = jnp.asarray(rng.normal(size=(N, L, 3)) * 0.5, jnp.float32)
        p_t = jnp.asarray(rng.normal(size=(N, L, 3)), jnp.float32)
        res_feat = jnp.asarray(rng.normal(size=(N, L, F)), jnp.float32)
        pair_feat = jnp.asarray(rng.normal(size=(N, L, L, C)), jnp.float32)
        beta = jnp.asarray([0.1, 0.5])

        net_e = EpsilonNet(F, C, 2, num_bins=8, use_pallas=False)
        net_p = EpsilonNet(F, C, 2, num_bins=8, use_pallas=True)
        params = net_e.init(jax.random.key(0), v_t, p_t, batch['aa'], res_feat,
                            pair_feat, beta, batch['generate_flag'], batch['mask'])
        args = (v_t, p_t, batch['aa'], res_feat, pair_feat, beta,
                batch['generate_flag'], batch['mask'])
        out_e = net_e.apply(params, *args)
        out_p = net_p.apply(params, *args)
        for a, b, name in zip(out_p, out_e,
                              ('v', 'R', 'eps_pos', 'c', 'prmsd')):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, err_msg=name)


class TestTrainingPath:
    def test_grad_with_pallas_model(self, rng):
        """Training must differentiate even when the model uses the fused
        kernel for sampling (regression: pallas_call has no JVP)."""
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from helpers import make_batch
        from ab_opt_tpu.models import DiffAb, DiffAbConfig

        model = DiffAb(DiffAbConfig(res_feat_dim=16, pair_feat_dim=8,
                                    num_steps=4, num_layers=1, num_bins=8,
                                    ipa_impl='pallas'))
        batch = make_batch(np.random.default_rng(0), N=2, L=16)
        params = model.init(jax.random.key(0), batch)

        def total(p):
            d = model.loss(p, batch, jax.random.key(1))
            return sum(v for k, v in d.items())

        g = jax.grad(total)(params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))


class TestReplicaSharing:
    def test_reps_matches_repeated_z(self, rng):
        """Fan-out with a shared per-complex pair tensor must equal the
        explicit per-trajectory replication, on both IPA paths."""
        reps, Nc, L = 3, 2, 16
        inp = _rand_inputs(rng, N=Nc * reps, L=L)
        # Make z per-complex and build the replicated equivalent.
        z_c = inp['z'][:Nc]
        z_rep = jnp.repeat(z_c, reps, axis=0)
        mask = jnp.ones((Nc * reps, L)).at[1, -3:].set(0).at[4, -3:].set(0)
        # Same masks within each complex's replica group.
        mask = jnp.repeat(mask[::reps][:Nc], reps, axis=0)
        base = dict(inp, mask=mask)

        ref = fused_ipa_from_flat(**{**base, 'z': z_rep}, interpret=True)
        got = fused_ipa_from_flat(**{**base, 'z': z_c}, reps=reps,
                                  interpret=True)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_reps_grad_matches_repeated_z(self, rng):
        """VJP through the fused kernel with reps>1 equals autodiff through
        the einsum reference with explicitly repeated z (VERDICT r2 #4: this
        used to raise NotImplementedError)."""
        reps, Nc, L = 4, 1, 16
        inp = _rand_inputs(rng, N=Nc * reps, L=L)
        z_c = inp['z'][:Nc]
        mask = jnp.repeat(jnp.ones((Nc, L)).at[0, -3:].set(0), reps, axis=0)
        names = ('q', 'k', 'qp', 'kp', 'v', 'vp')

        def loss_fused(args, z):
            kw = dict(zip(names, args))
            outs = fused_ipa_from_flat(
                **kw, z=z, pair_w=inp['pair_w'], coef=inp['coef'],
                mask=mask, reps=reps, interpret=True)
            return sum(jnp.sum(o * o) for o in outs)

        def loss_ref(args, z):
            kw = dict(zip(names, args))
            outs = ipa_attention_reference(
                **kw, z=z, pair_w=inp['pair_w'], coef=inp['coef'], mask=mask)
            return sum(jnp.sum(o * o) for o in outs)

        args = tuple(inp[n] for n in names)
        g_fused, gz_fused = jax.grad(loss_fused, argnums=(0, 1))(args, z_c)
        g_ref, gz_ref = jax.grad(loss_ref, argnums=(0, 1))(
            args, jnp.repeat(z_c, reps, axis=0))
        gz_ref = gz_ref.reshape(Nc, reps, L, L, -1).sum(axis=1)
        for a, b, name in zip(g_fused, g_ref, names):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, err_msg=name)
        np.testing.assert_allclose(np.asarray(gz_fused), np.asarray(gz_ref),
                                   atol=3e-4, err_msg='z')

    def test_fuse_p2n_matches_composable(self, rng):
        """Sampling fast path (in-kernel pair aggregation, no alphas in HBM)
        == composable pallas path, with replica-shared z."""
        from ab_opt_tpu.nn.ipa import GABlock
        reps, Nc, L, F, C = 3, 2, 16, 32, 8
        N = Nc * reps
        R = jnp.broadcast_to(jnp.eye(3), (N, L, 3, 3))
        t = jnp.asarray(rng.normal(size=(N, L, 3)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(N, L, F)), jnp.float32)
        z_c = jnp.asarray(rng.normal(size=(Nc, L, L, C)), jnp.float32)
        mask = jnp.ones((N, L), bool)

        blk = GABlock(F, C, value_dim=8, query_key_dim=8, num_query_points=4,
                      num_value_points=4, num_heads=2, use_pallas=True)
        params = blk.init(jax.random.key(0), R, t, x,
                          jnp.repeat(z_c, reps, 0), mask)
        ref = blk.apply(params, R, t, x, z_c, mask, reps=reps)
        got = blk.apply(params, R, t, x, z_c, mask, reps=reps, fuse_p2n=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_gablock_reps_einsum_path(self, rng):
        """Einsum path with shared z == einsum path with repeated z."""
        from ab_opt_tpu.nn.ipa import GABlock
        reps, Nc, L, F, C = 2, 2, 12, 16, 8
        N = Nc * reps
        R = jnp.broadcast_to(jnp.eye(3), (N, L, 3, 3))
        t = jnp.asarray(rng.normal(size=(N, L, 3)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(N, L, F)), jnp.float32)
        z_c = jnp.asarray(rng.normal(size=(Nc, L, L, C)), jnp.float32)
        mask = jnp.ones((N, L), bool)

        blk = GABlock(F, C, value_dim=8, query_key_dim=8, num_query_points=4,
                      num_value_points=4, num_heads=2)
        params = blk.init(jax.random.key(0), R, t, x,
                          jnp.repeat(z_c, reps, 0), mask)
        ref = blk.apply(params, R, t, x, jnp.repeat(z_c, reps, 0), mask)
        got = blk.apply(params, R, t, x, z_c, mask, reps=reps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


class TestFusedBlock:
    """Fully-fused GABlock sampling kernel (ops/gablock_pallas.py) vs the
    composable GABlock module."""

    def _setup(self, rng, N=2, L=32, F=64, Cz=16, reps=1):
        from ab_opt_tpu.geometry import quaternion_to_rotation_matrix
        from ab_opt_tpu.nn.ipa import GABlock
        q = rng.normal(size=(N, L, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        R = quaternion_to_rotation_matrix(jnp.asarray(q))
        t = jnp.asarray(rng.normal(size=(N, L, 3)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(N, L, F)), jnp.float32)
        Nc = N // reps
        z = jnp.asarray(rng.normal(size=(Nc, L, L, Cz)), jnp.float32)
        mask = jnp.ones((N, L)).at[:, -4:].set(0)
        block = GABlock(F, Cz, dtype=jnp.bfloat16)
        params = block.init(jax.random.key(0), R, t, x,
                            z if reps == 1 else jnp.repeat(z, reps, 0), mask)
        return block, params, (R, t, x, z, mask)

    def test_matches_gablock(self, rng):
        from ab_opt_tpu.ops.gablock_pallas import (build_gablock_weights,
                                                   fused_gablock_layer,
                                                   transpose_pair_for_fused)
        from ab_opt_tpu.ops.ipa_pallas import precompute_pair_bias
        block, params, (R, t, x, z, mask) = self._setup(rng)
        ref = block.apply(params, R, t, x, z, mask)       # einsum path, bf16

        bp = params['params']
        wb = build_gablock_weights(bp)
        pw = bp['proj_pair_bias']['kernel'].astype(jnp.bfloat16)
        bias = precompute_pair_bias(z.astype(jnp.bfloat16), pw, mask,
                                    out_dtype=jnp.bfloat16)
        N, L, F = x.shape
        got = fused_gablock_layer(
            x, R.reshape(N, L, 9).astype(jnp.float32), t,
            transpose_pair_for_fused(z.astype(jnp.bfloat16)), bias,
            mask.astype(jnp.float32), wb, interpret=True)
        valid = np.asarray(mask, bool)
        np.testing.assert_allclose(np.asarray(got)[valid],
                                   np.asarray(ref)[valid],
                                   atol=0.05, rtol=0.05)

    def test_replica_shared_pair(self, rng):
        """reps > 1: replicas read their complex's z/bias block."""
        from ab_opt_tpu.ops.gablock_pallas import (build_gablock_weights,
                                                   fused_gablock_layer,
                                                   transpose_pair_for_fused)
        from ab_opt_tpu.ops.ipa_pallas import precompute_pair_bias
        block, params, (R, t, x, z, mask) = self._setup(rng, N=4, reps=2)
        z_rep = jnp.repeat(z, 2, axis=0)
        ref = block.apply(params, R, t, x, z_rep, mask)

        bp = params['params']
        wb = build_gablock_weights(bp)
        pw = bp['proj_pair_bias']['kernel'].astype(jnp.bfloat16)
        bias = precompute_pair_bias(z.astype(jnp.bfloat16), pw, mask[::2],
                                    out_dtype=jnp.bfloat16)
        N, L, F = x.shape
        got = fused_gablock_layer(
            x, R.reshape(N, L, 9).astype(jnp.float32), t,
            transpose_pair_for_fused(z.astype(jnp.bfloat16)), bias,
            mask.astype(jnp.float32), wb, reps=2, interpret=True)
        valid = np.asarray(mask, bool)
        np.testing.assert_allclose(np.asarray(got)[valid],
                                   np.asarray(ref)[valid],
                                   atol=0.05, rtol=0.05)

    @pytest.mark.parametrize('opts', [
        {'split_gemm': True},
        {'stacked_logits': True},
        {'merged_x': True},
        {'fast_softmax': True},
        {'merged_x': True, 'fast_softmax': True, 'stacked_logits': True},
        {'dual': True},
        {'dual': True, 'merged_x': True},
        {'lhl': True},
        {'lhl': True, 'defer_norm': True},
        {'defer_norm': True},
        {'p2n_mc': True},
        {'p2n_cat': True},
        {'dual': True, 'merged_x': True, 'lhl': True, 'defer_norm': True,
         'p2n_mc': True},
        {'dual': True, 'merged_x': True, 'lhl': True, 'stacked_logits': True,
         'p2n_cat': True},
    ])
    def test_body_variants_match_base(self, rng, opts):
        """Measurement-gated kernel-body restructurings (AB_OPT_FUSED_BODY)
        keep parity with the base body at small dims (interpret mode)."""
        from ab_opt_tpu.ops.gablock_pallas import (build_gablock_weights,
                                                   fused_gablock_layer,
                                                   transpose_bias_for_fused,
                                                   transpose_pair_for_fused)
        from ab_opt_tpu.ops.ipa_pallas import precompute_pair_bias
        block, params, (R, t, x, z, mask) = self._setup(rng, N=4, reps=2)
        bp = params['params']
        wb = build_gablock_weights(bp)
        pw = bp['proj_pair_bias']['kernel'].astype(jnp.bfloat16)
        bias = precompute_pair_bias(z.astype(jnp.bfloat16), pw, mask[::2],
                                    out_dtype=jnp.bfloat16)
        if opts.get('lhl'):
            bias = transpose_bias_for_fused(bias)
        N, L, F = x.shape
        args = (x, R.reshape(N, L, 9).astype(jnp.float32), t,
                transpose_pair_for_fused(z.astype(jnp.bfloat16)), bias,
                mask.astype(jnp.float32), wb)
        base_bias = (transpose_bias_for_fused(bias) if opts.get('lhl')
                     else bias)
        base = fused_gablock_layer(x, args[1], t, args[3], base_bias,
                                   args[5], wb, reps=2, rt=2,
                                   interpret=True)
        got = fused_gablock_layer(*args, reps=2, rt=2, interpret=True,
                                  body_opts=opts)
        valid = np.asarray(mask, bool)
        np.testing.assert_allclose(np.asarray(got)[valid],
                                   np.asarray(base)[valid],
                                   atol=0.02, rtol=0.02)

    def test_quad_tiles_match_base(self, rng):
        """``quad`` needs RT % 4 == 0 — exercised at reps=4, rt=4."""
        from ab_opt_tpu.ops.gablock_pallas import (build_gablock_weights,
                                                   fused_gablock_layer,
                                                   transpose_pair_for_fused)
        from ab_opt_tpu.ops.ipa_pallas import precompute_pair_bias
        block, params, (R, t, x, z, mask) = self._setup(rng, N=4, reps=4)
        bp = params['params']
        wb = build_gablock_weights(bp)
        pw = bp['proj_pair_bias']['kernel'].astype(jnp.bfloat16)
        bias = precompute_pair_bias(z.astype(jnp.bfloat16), pw, mask[::4],
                                    out_dtype=jnp.bfloat16)
        N, L, F = x.shape
        args = (x, R.reshape(N, L, 9).astype(jnp.float32), t,
                transpose_pair_for_fused(z.astype(jnp.bfloat16)), bias,
                mask.astype(jnp.float32), wb)
        base = fused_gablock_layer(*args, reps=4, rt=4, interpret=True)
        got = fused_gablock_layer(*args, reps=4, rt=4, interpret=True,
                                  body_opts={'quad': True, 'merged_x': True})
        valid = np.asarray(mask, bool)
        np.testing.assert_allclose(np.asarray(got)[valid],
                                   np.asarray(base)[valid],
                                   atol=0.02, rtol=0.02)

    def test_sample_e2e_fused(self, rng):
        """DiffAb.sample with ipa_impl='pallas' routes the fused block
        kernel (interpret on CPU) end-to-end: finite output, context
        untouched, fan-out shapes right."""
        from helpers import make_batch
        from ab_opt_tpu.models import DiffAb, DiffAbConfig
        batch = make_batch(np.random.default_rng(0), N=1, L=16)
        cfg = DiffAbConfig(res_feat_dim=16, pair_feat_dim=8, num_steps=4,
                           num_layers=2, num_bins=8, ipa_impl='pallas_fused')
        model = DiffAb(cfg)
        params = model.init(jax.random.key(0), batch)
        out = jax.jit(lambda p, b, k: model.sample(p, b, k, num_replicas=3))(
            params, batch, jax.random.key(1))
        assert out['p'].shape == (3, 16, 3)
        assert np.isfinite(np.asarray(out['p'])).all()
        ctx = ~np.asarray(batch['generate_flag'])[0]
        for i in range(3):
            np.testing.assert_array_equal(np.asarray(out['s'])[i][ctx],
                                          np.asarray(batch['aa'])[0][ctx])


class TestPickRT:
    def test_override_validation(self):
        """Explicit replica-tile overrides must be positive divisors; the
        default picks the largest in-budget divisor."""
        from ab_opt_tpu.ops.gablock_pallas import _pick_rt
        assert _pick_rt(32, 128, rt=4) == 4
        assert _pick_rt(32, 128, rt=None) >= 1
        assert 32 % _pick_rt(32, 128, rt=None) == 0
        with pytest.raises(ValueError):
            _pick_rt(32, 128, rt=0)
        with pytest.raises(ValueError):
            _pick_rt(12, 128, rt=8)     # not a divisor: no silent fallback


class TestFusedHeads:
    """Batched-GEMM output heads (nn/epsilon_net.py::precompute_head_weights)
    vs the per-head flax MLP modules, through DiffAbNet.denoise_step."""

    def _denoise(self, dtype, fused):
        from helpers import make_batch
        from ab_opt_tpu.geometry import rotation_to_so3vec
        from ab_opt_tpu.models import DiffAb, DiffAbConfig
        from ab_opt_tpu.models.diffab import DiffAbNet
        from ab_opt_tpu.nn.epsilon_net import precompute_head_weights
        batch = make_batch(np.random.default_rng(1), N=2, L=16)
        cfg = DiffAbConfig(res_feat_dim=16, pair_feat_dim=8, num_steps=4,
                           num_layers=2, num_bins=8, dtype=dtype,
                           ipa_impl='einsum')
        model = DiffAb(cfg)
        params = model.init(jax.random.key(0), batch)
        res_feat, pair_feat, R0, p_ctx = model.encode(params, batch, True, True)
        v = rotation_to_so3vec(R0)
        p = model.normalize_position(p_ctx)
        hw = (precompute_head_weights(params['params']['eps_net'],
                                      dtype=cfg.compute_dtype)
              if fused else None)
        return model.net.apply(
            params, v, p, batch['aa'], res_feat, pair_feat,
            jnp.full((2,), 0.37), batch['generate_flag'], batch['mask'],
            head_weights=hw, method=DiffAbNet.denoise_step)

    @pytest.mark.parametrize('dtype,atol', [('float32', 3e-5),
                                            ('bfloat16', 0.03)])
    def test_matches_module_heads(self, dtype, atol):
        ref = self._denoise(dtype, fused=False)
        got = self._denoise(dtype, fused=True)
        names = ('v_next', 'R_next', 'eps_pos', 'c_denoised', 'prmsd_logits')
        for a, b, name in zip(got, ref, names):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=atol, err_msg=name)

    def test_training_grad_parity(self):
        """loss() with fused heads (the TPU train path) must match the
        module-head gradients: autodiff flows through the concat/stack/pad
        in precompute_head_weights back to the per-head Dense kernels."""
        from helpers import make_batch
        from ab_opt_tpu.models import DiffAb, DiffAbConfig
        batch = make_batch(np.random.default_rng(3), N=2, L=16)
        cfg = DiffAbConfig(res_feat_dim=16, pair_feat_dim=8, num_steps=4,
                           num_layers=2, num_bins=8, dtype='float32',
                           ipa_impl='einsum')
        model = DiffAb(cfg)
        params = model.init(jax.random.key(0), batch)

        def total(p, fused):
            model._use_pallas = fused   # heads only; encoder stays einsum
            losses = model.loss(p, batch, jax.random.key(7))
            return sum(jnp.mean(v) for v in losses.values())

        g_ref = jax.grad(lambda p: total(p, False))(params)
        g_fused = jax.grad(lambda p: total(p, True))(params)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_fused = jax.tree_util.tree_leaves(g_fused)
        assert len(flat_ref) == len(flat_fused)
        for (path, a), b in zip(flat_ref, flat_fused):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3,
                err_msg=jax.tree_util.keystr(path))


class TestChainedEncoder:
    """Chained whole-encoder kernel (all layers per grid cell) vs the
    sequential per-layer fused kernels — same weights, same z/biases."""

    def _inputs(self, rng, reps=4, nl=2, L=16):
        from ab_opt_tpu.ops.gablock_pallas import _planar_pool_np
        from ab_opt_tpu.ops.ipa_pallas import _DA, _DV
        F, H, QK, V, P, PV, Cz = 32, 4, 8, 8, 4, 4, 8
        f32, bf = jnp.float32, jnp.bfloat16
        nrm = lambda s, d=bf: jnp.asarray(rng.normal(size=s) * 0.1, f32).astype(d)
        HP, HPV = H * P, H * PV
        n_tot = 2 * HP + HPV
        rest_rows = H * (V + 7 * PV)
        bundles = []
        for _ in range(nl):
            bundles.append({
                'w_pts': nrm((F, 3 * n_tot)),
                's_q': nrm((F + 3 * HP + H, H * _DA)),
                's_k': nrm((F + 3 * HP + H, H * _DA)),
                's_v': nrm((F + 3 * HPV, H * _DV)),
                'b_q': nrm((1, H * _DA)),
                'b_k': nrm((1, H * _DA)),
                'pool': jnp.asarray(_planar_pool_np(H, 3 * P), bf),
                'wp2n': nrm((H, Cz, F)),
                'wrest': nrm((rest_rows, F)),
                'bout': nrm((1, F), f32),
                'ln1': nrm((2, F), f32) + 1.0,
                'wm1': nrm((F, F)), 'wm2': nrm((F, F)), 'wm3': nrm((F, F)),
                'bm': nrm((3, F), f32),
                'ln2': nrm((2, F), f32) + 1.0,
                'dims': (H, QK, V, P, PV),
            })
        N = reps
        x = jnp.asarray(rng.normal(size=(N, L, F)), jnp.float32)
        R9 = jnp.asarray(rng.normal(size=(N, L, 9)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(N, L, 3)), jnp.float32)
        z = nrm((1, L, Cz, L))
        biases = [nrm((1, H, L, L)) for _ in range(nl)]
        mask = jnp.ones((N, L, 1), jnp.float32)
        return bundles, x, R9, t, z, biases, mask

    def test_matches_sequential(self, rng):
        from ab_opt_tpu.ops.gablock_pallas import (fused_encoder_apply,
                                                   fused_encoder_chained,
                                                   stack_encoder_weights)
        bundles, x, R9, t, z, biases, mask = self._inputs(rng)
        seq = fused_encoder_apply(bundles, R9, t, x, z, biases, mask,
                                  reps=4, rt=2, interpret=True)
        stacked = stack_encoder_weights(bundles)
        bst = jnp.stack(biases, axis=1)
        ch = fused_encoder_chained(stacked, 2, R9, t, x, z, bst, mask,
                                   reps=4, rt=2, interpret=True)
        np.testing.assert_allclose(np.asarray(ch), np.asarray(seq),
                                   atol=1e-5)

    def test_sample_e2e_chained(self):
        """DiffAb.sample with AB_OPT_FUSED_CHAIN=1 routes the chained kernel
        end-to-end: finite output, context untouched, fan-out shapes right.

        Bitwise equality with the per-layer path holds at the kernel level
        (test_matches_sequential); the full jitted samplers are two
        different XLA programs whose surrounding bf16 casts fuse
        differently, and the per-step categorical sequence resampling
        amplifies that to visible (but equally valid) trajectories — so the
        e2e check is functional, like test_sample_e2e_fused."""
        import os
        from helpers import make_batch
        from ab_opt_tpu.models import DiffAb, DiffAbConfig
        batch = make_batch(np.random.default_rng(0), N=1, L=16)
        cfg = DiffAbConfig(res_feat_dim=16, pair_feat_dim=8, num_steps=4,
                           num_layers=2, num_bins=8, ipa_impl='pallas_fused')
        model = DiffAb(cfg)
        params = model.init(jax.random.key(0), batch)
        old = os.environ.pop('AB_OPT_FUSED_CHAIN', None)
        try:
            os.environ['AB_OPT_FUSED_CHAIN'] = '1'
            out = jax.jit(lambda p, b, k: model.sample(
                p, b, k, num_replicas=3))(params, batch, jax.random.key(1))
        finally:
            os.environ.pop('AB_OPT_FUSED_CHAIN', None)
            if old is not None:
                os.environ['AB_OPT_FUSED_CHAIN'] = old
        assert out['p'].shape == (3, 16, 3)
        assert np.isfinite(np.asarray(out['p'])).all()
        ctx = ~np.asarray(batch['generate_flag'])[0]
        for i in range(3):
            np.testing.assert_array_equal(np.asarray(out['s'])[i][ctx],
                                          np.asarray(batch['aa'])[0][ctx])
