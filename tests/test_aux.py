"""Tests for auxiliary pieces: pLDDT head, profiling utils, property specs,
tensor utils, config interpolation."""
import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ab_opt_tpu.nn import compute_plddt, lddt, lddt_loss, PerResidueLDDTCaPredictor
from ab_opt_tpu.nn.tensor_utils import flatten_final_dims, masked_mean, permute_final_dims
from ab_opt_tpu.runners.design import apply_property_spec
from ab_opt_tpu.utils import StepTimer, load_config, seed_all


class TestPLDDT:
    def test_lddt_perfect(self, rng):
        pos = jnp.asarray(rng.normal(size=(2, 10, 3)) * 5, jnp.float32)
        mask = jnp.ones((2, 10, 1))
        score = lddt(pos, pos, mask)
        np.testing.assert_allclose(np.asarray(score), 1.0, atol=1e-5)
        # Perturbed structure scores lower.
        noisy = pos + jnp.asarray(rng.normal(size=pos.shape), jnp.float32) * 3
        assert float(lddt(noisy, pos, mask).mean()) < 0.9

    def test_plddt_decode_and_loss(self, rng):
        logits = jnp.asarray(rng.normal(size=(2, 10, 50)), jnp.float32)
        p = compute_plddt(logits)
        assert ((np.asarray(p) >= 0) & (np.asarray(p) <= 100)).all()
        pos = jnp.asarray(rng.normal(size=(2, 10, 3)), jnp.float32)
        mask = jnp.ones((2, 10, 1))
        loss = lddt_loss(logits, pos, pos, mask)
        assert np.isfinite(float(loss))

    def test_head_module(self, rng):
        head = PerResidueLDDTCaPredictor(no_bins=50, c_hidden=16)
        x = jnp.asarray(rng.normal(size=(2, 10, 16)), jnp.float32)
        params = head.init(jax.random.key(0), x)
        out = head.apply(params, x)
        assert out.shape == (2, 10, 50)


class TestPropertySpec:
    def test_apply(self):
        d = {'aa': np.zeros(8, np.int64),
             'generate_flag': np.array([0, 0, 1, 1, 1, 0, 0, 0], bool)}
        out = apply_property_spec(d, hydropathy_spec='+-?', charge_spec='+=?')
        np.testing.assert_array_equal(out['hydropathy'][2:5], [1, 2, 3])
        np.testing.assert_array_equal(out['charge'][2:5], [1, 3, 4])
        assert out['hydropathy'][0] == 3 and out['charge'][0] == 4

    def test_length_mismatch(self):
        d = {'aa': np.zeros(4, np.int64),
             'generate_flag': np.array([0, 1, 1, 0], bool)}
        with pytest.raises(ValueError):
            apply_property_spec(d, hydropathy_spec='+')


class TestTensorUtils:
    def test_permute_flatten(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 3, 4, 5)), jnp.float32)
        y = permute_final_dims(x, (2, 0, 1))
        assert y.shape == (2, 5, 3, 4)
        z = flatten_final_dims(x, 2)
        assert z.shape == (2, 3, 20)

    def test_masked_mean(self):
        v = jnp.asarray([[1.0, 2.0, 3.0]])
        m = jnp.asarray([[1.0, 1.0, 0.0]])
        np.testing.assert_allclose(np.asarray(masked_mean(m, v, axis=1)), [1.5])


class TestUtils:
    def test_step_timer(self):
        t = StepTimer(window=2)
        for _ in range(3):
            t.start()
            t.stop()
        assert len(t.times) == 2
        assert t.mean_ms >= 0

    def test_seed_all(self):
        seed_all(7)
        a = np.random.rand()
        seed_all(7)
        assert np.random.rand() == a

    def test_config_interpolation(self, tmp_path):
        p = tmp_path / 'c.yml'
        p.write_text(
            'model:\n  size: 20\n'
            'data:\n  transform:\n    - type: patch\n      antigen_size: "{model.size}"\n')
        cfg, name = load_config(str(p))
        assert name == 'c'
        assert cfg['data']['transform'][0]['antigen_size'] == 20

    def test_enable_compile_cache(self, tmp_path, monkeypatch):
        """Default-on persistent compile cache; env var wins; idempotent."""
        from ab_opt_tpu.utils import enable_compile_cache
        # env var set -> no-op, returns the env dir untouched
        monkeypatch.setenv('JAX_COMPILATION_CACHE_DIR', '/somewhere/else')
        assert enable_compile_cache(str(tmp_path / 'a')) == '/somewhere/else'
        monkeypatch.delenv('JAX_COMPILATION_CACHE_DIR')
        prior = jax.config.jax_compilation_cache_dir
        try:
            if prior:  # already configured (e.g. by a prior test/process)
                assert enable_compile_cache(str(tmp_path / 'b')) == prior
                return
            d = str(tmp_path / 'cache')
            assert enable_compile_cache(d) == d
            assert jax.config.jax_compilation_cache_dir == d
            assert os.path.isdir(d)
            # second call respects the existing configuration
            assert enable_compile_cache(str(tmp_path / 'other')) == d
        finally:
            jax.config.update('jax_compilation_cache_dir', prior)

    def test_jit_sample_scoped_vmem_options(self, monkeypatch):
        """The sampling jit helper: raises XLA's scoped-VMEM limit on TPU
        (regression for the L=160 eval OOM — a full model.sample at N=8,
        L=160 needs 17.73 MB scoped VMEM against the 16 MB default), stays
        a plain jit elsewhere (CPU/GPU clients reject the TPU-only flag)."""
        from ab_opt_tpu.utils.compile_cache import (
            jit_sample, tpu_sampling_compiler_options)
        # On the CPU test backend: no options, plain jit still works.
        assert tpu_sampling_compiler_options() is None
        fn = jit_sample(lambda x: x * 2)
        assert float(fn(jnp.float32(3.0))) == 6.0
        # On TPU: the limit is applied and env-overridable.
        monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
        assert tpu_sampling_compiler_options() == {
            'xla_tpu_scoped_vmem_limit_kib': 24576}
        monkeypatch.setenv('AB_OPT_SCOPED_VMEM_KIB', '32768')
        assert tpu_sampling_compiler_options() == {
            'xla_tpu_scoped_vmem_limit_kib': 32768}
