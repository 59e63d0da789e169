"""Tests for schedules, IGSO3 tables, and transition kernels."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_opt_tpu.diffusion import (
    IGSO3Tables,
    PositionTransition,
    RotationTransition,
    SequenceTransition,
    VarianceSchedule,
    build_igso3_tables,
    sample_igso3_angle,
)
from ab_opt_tpu.diffusion.transitions import clamped_one_hot
from ab_opt_tpu.geometry import so3vec_to_rotation, rotation_to_so3vec

T = 100


@pytest.fixture(scope='module')
def sched():
    return VarianceSchedule.cosine(T)


@pytest.fixture(scope='module')
def trans_pos(sched):
    return PositionTransition(sched)


@pytest.fixture(scope='module')
def trans_rot():
    return RotationTransition.create(T)


@pytest.fixture(scope='module')
def trans_seq(sched):
    return SequenceTransition(sched, 20)


class TestSchedule:
    def test_basic_properties(self, sched):
        a = np.asarray(sched.alpha_bars)
        assert a[0] == pytest.approx(1.0)
        assert np.all(np.diff(a) <= 0)
        assert np.asarray(sched.betas)[0] == 0.0
        assert np.all(np.asarray(sched.betas) <= 0.999)
        np.testing.assert_allclose(np.asarray(sched.alphas),
                                   1 - np.asarray(sched.betas), atol=1e-7)

    def test_parity_with_reference(self, reference_abdock):
        _, torch = reference_abdock
        from src.modules.diffusion.transition import VarianceSchedule as RefSched
        ref = RefSched(num_steps=T)
        ours = VarianceSchedule.cosine(T)
        np.testing.assert_allclose(np.asarray(ours.betas), ref.betas.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.alpha_bars), ref.alpha_bars.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.sigmas), ref.sigmas.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.sqrt_recip_alpha_bars),
                                   ref.sqrt_recip_alphas_cumprod.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.sqrt_recipm1_alpha_bars),
                                   ref.sqrt_recipm1_alphas_cumprod.numpy(),
                                   rtol=1e-3, atol=1e-4)


class TestIGSO3:
    def test_cdf_parity_with_reference(self, reference_abdock):
        _, torch = reference_abdock
        from src.modules.common.so3 import ApproxAngularDistribution
        stds = [0.2, 0.5, 1.0]
        ref = ApproxAngularDistribution(stds, num_bins=1024, num_iters=256)
        ours = build_igso3_tables(stds, num_bins=1024, num_iters=256)
        for i in range(len(stds)):
            y = ref.Y[i].numpy()[:-1]
            ref_cdf = np.cumsum(y) / y.sum()
            np.testing.assert_allclose(np.asarray(ours.cdf[i]), ref_cdf, atol=1e-4)

    def test_sample_distribution_matches_table(self):
        """Empirical CDF of drawn angles matches the table CDF."""
        tables = build_igso3_tables([0.8], num_bins=2048, num_iters=256)
        t = jnp.zeros((200, 100), jnp.int32)
        angles = np.asarray(sample_igso3_angle(jax.random.key(0), tables, t)).ravel()
        assert (angles >= 0).all() and (angles <= np.pi).all()
        # Compare empirical quantiles to the table's inverse CDF.
        cdf = np.asarray(tables.cdf[0])
        for q in [0.1, 0.25, 0.5, 0.75, 0.9]:
            table_q = np.searchsorted(cdf, q) * tables.dx
            emp_q = np.quantile(angles, q)
            assert abs(emp_q - table_q) < 0.05, (q, emp_q, table_q)

    def test_gaussian_branch(self):
        tables = build_igso3_tables([0.05], num_bins=256, num_iters=64)
        assert bool(tables.approx_flag[0])
        t = jnp.zeros((100, 100), jnp.int32)
        angles = np.asarray(sample_igso3_angle(jax.random.key(1), tables, t)).ravel()
        # Gaussian approx: mean 2*sigma = 0.1.
        assert abs(angles.mean() - 0.1) < 0.01


class TestPositionTransition:
    def test_forward_moments(self, trans_pos, rng):
        N, L = 512, 8
        p0 = jnp.asarray(rng.normal(size=(N, L, 3)) * 0.5, jnp.float32)
        t = jnp.full((N,), 60)
        mask = jnp.ones((N, L), bool)
        p_t, eps = trans_pos.add_noise(jax.random.key(0), p0, mask, t)
        abar = float(trans_pos.sched.alpha_bars[60])
        resid = np.asarray(p_t) - np.sqrt(abar) * np.asarray(p0)
        assert abs(resid.std() - np.sqrt(1 - abar)) < 0.01
        assert abs(resid.mean()) < 0.01

    def test_context_passthrough(self, trans_pos, rng):
        p0 = jnp.asarray(rng.normal(size=(4, 8, 3)), jnp.float32)
        mask = jnp.zeros((4, 8), bool).at[:, :3].set(True)
        t = jnp.full((4,), 50)
        p_t, _ = trans_pos.add_noise(jax.random.key(0), p0, mask, t)
        np.testing.assert_array_equal(np.asarray(p_t[:, 3:]), np.asarray(p0[:, 3:]))

    def test_pred_roundtrip(self, trans_pos, rng):
        p_t = jnp.asarray(rng.normal(size=(4, 8, 3)), jnp.float32)
        eps = jnp.asarray(rng.normal(size=(4, 8, 3)), jnp.float32)
        mask = jnp.ones((4, 8), bool)
        t = jnp.full((4,), 30)
        p0 = trans_pos.pred_start_from_noise(p_t, eps, mask, t)
        eps2 = trans_pos.pred_noise_from_start(p_t, p0, mask, t)
        np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), atol=1e-4)

    def test_denoise_no_noise_at_t1(self, trans_pos, rng):
        p_t = jnp.asarray(rng.normal(size=(2, 8, 3)), jnp.float32)
        eps = jnp.zeros((2, 8, 3), jnp.float32)
        mask = jnp.ones((2, 8), bool)
        p1 = trans_pos.denoise(jax.random.key(0), p_t, eps, mask, jnp.ones((2,), jnp.int32))
        p2 = trans_pos.denoise(jax.random.key(1), p_t, eps, mask, jnp.ones((2,), jnp.int32))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)

    def test_full_reverse_chain_gaussian(self, trans_pos):
        """With a perfect eps-predictor on x0=0 data, the chain contracts to ~0."""
        N, L = 256, 4
        key = jax.random.key(0)
        p = jax.random.normal(jax.random.fold_in(key, T + 1), (N, L, 3))
        mask = jnp.ones((N, L), bool)
        for t in range(T, 0, -1):
            tt = jnp.full((N,), t)
            # true eps for x0 = 0: eps = p_t / sqrt(1 - abar)
            abar = trans_pos.sched.alpha_bars[tt][:, None, None]
            eps = p / jnp.sqrt(1 - abar + 1e-8)
            p = trans_pos.denoise(jax.random.fold_in(key, t), p, eps, mask, tt)
        assert float(jnp.abs(p).mean()) < 0.1


class TestRotationTransition:
    def test_forward_small_t_near_identity(self, trans_rot, rng):
        """At small t the noised rotation stays close to the original."""
        v0 = jnp.asarray(rng.normal(size=(32, 4, 3)) * 0.5, jnp.float32)
        mask = jnp.ones((32, 4), bool)
        v_t, _ = trans_rot.add_noise(jax.random.key(0), v0, mask, jnp.full((32,), 2))
        R0 = so3vec_to_rotation(v0)
        Rt = so3vec_to_rotation(v_t)
        rel = jnp.einsum('...ij,...ik->...jk', R0, Rt)  # R0^T Rt
        ang = np.abs(np.asarray(rotation_to_so3vec(rel)))
        assert np.linalg.norm(ang, axis=-1).mean() < 0.5

    def test_forward_large_t_is_wide(self, trans_rot, rng):
        v0 = jnp.zeros((64, 4, 3), jnp.float32)
        mask = jnp.ones((64, 4), bool)
        v_t, _ = trans_rot.add_noise(jax.random.key(0), v0, mask, jnp.full((64,), T))
        angles = np.linalg.norm(np.asarray(v_t), axis=-1)
        # Uniform-ish on SO(3): mean angle ~ pi/2 + 2/pi.
        assert angles.mean() > 1.5

    def test_denoise_masks_and_final_step(self, trans_rot, rng):
        v_t = jnp.asarray(rng.normal(size=(4, 6, 3)) * 0.3, jnp.float32)
        v_pred = jnp.asarray(rng.normal(size=(4, 6, 3)) * 0.3, jnp.float32)
        mask = jnp.zeros((4, 6), bool).at[:, :2].set(True)
        out1 = trans_rot.denoise(jax.random.key(0), v_t, v_pred, mask, jnp.ones((4,), jnp.int32))
        # Final step adds no noise -> equals v_pred where mask, v_t elsewhere.
        np.testing.assert_allclose(np.asarray(out1[:, :2]), np.asarray(v_pred[:, :2]), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out1[:, 2:]), np.asarray(v_t[:, 2:]))


class TestSequenceTransition:
    def test_add_noise_distribution(self, trans_seq):
        N, L = 2000, 4
        x0 = jnp.zeros((N, L), jnp.int32)
        mask = jnp.ones((N, L), bool)
        t = jnp.full((N,), T)
        c_t, x_t = trans_seq.add_noise(jax.random.key(0), x0, mask, t)
        # At t=T the distribution is nearly uniform.
        counts = np.bincount(np.asarray(x_t).ravel(), minlength=20)
        freq = counts / counts.sum()
        assert freq.max() < 0.10 and freq.min() > 0.02

    def test_posterior_parity(self, reference_abdock, trans_seq, rng):
        _, torch = reference_abdock
        from src.modules.diffusion.transition import AminoacidCategoricalTransition
        ref = AminoacidCategoricalTransition(T)
        x_t = rng.integers(0, 20, (3, 7))
        c_0 = rng.random((3, 7, 20)).astype(np.float32)
        c_0 /= c_0.sum(-1, keepdims=True)
        t = np.array([5, 50, 99])
        ref_post = ref.posterior(torch.from_numpy(x_t), torch.from_numpy(c_0),
                                 torch.from_numpy(t)).numpy()
        our_post = np.asarray(trans_seq.posterior(jnp.asarray(x_t), jnp.asarray(c_0),
                                                  jnp.asarray(t)))
        np.testing.assert_allclose(our_post, ref_post, atol=1e-5)

    def test_clamped_one_hot(self):
        x = jnp.asarray([[0, 19, 20, 21, -1]])
        oh = np.asarray(clamped_one_hot(x, 20))
        assert oh[0, 0, 0] == 1 and oh[0, 1, 19] == 1
        assert oh[0, 2].sum() == 0 and oh[0, 3].sum() == 0 and oh[0, 4].sum() == 0

    def test_denoise_masks(self, trans_seq, rng):
        x_t = jnp.asarray(rng.integers(0, 20, (4, 8)))
        c0 = jax.nn.softmax(jnp.asarray(rng.normal(size=(4, 8, 20)), jnp.float32))
        mask = jnp.zeros((4, 8), bool).at[:, :4].set(True)
        post, x_next = trans_seq.denoise(jax.random.key(0), x_t, c0, mask,
                                         jnp.full((4,), 50))
        np.testing.assert_array_equal(np.asarray(x_next[:, 4:]), np.asarray(x_t[:, 4:]))


class TestJitScan:
    def test_transitions_jit_scan(self, trans_pos, trans_rot, trans_seq):
        """All kernels compose under jit + lax.scan (the sampling loop shape)."""
        N, L = 2, 16

        @jax.jit
        def run(key):
            v = jnp.zeros((N, L, 3))
            p = jax.random.normal(jax.random.fold_in(key, 0), (N, L, 3))
            s = jnp.zeros((N, L), jnp.int32)
            mask = jnp.ones((N, L), bool)

            def step(carry, t):
                v, p, s, key = carry
                key, k1, k2, k3 = jax.random.split(key, 4)
                tt = jnp.full((N,), t)
                v = trans_rot.denoise(k1, v, v, mask, tt)
                p = trans_pos.denoise(k2, p, jnp.zeros_like(p), mask, tt)
                _, s = trans_seq.denoise(k3, s, jax.nn.softmax(jnp.zeros((N, L, 20))), mask, tt)
                return (v, p, s, key), None

            (v, p, s, _), _ = jax.lax.scan(step, (v, p, s, key),
                                           jnp.arange(T, 0, -1))
            return v, p, s

        v, p, s = run(jax.random.key(0))
        assert np.isfinite(np.asarray(v)).all()
        assert np.isfinite(np.asarray(p)).all()
