"""Persistent XLA compilation cache, on by default for the CLIs.

The 100-step sampler / train step compile takes minutes on first trace
(PERF.md "first pose"); with a persistent cache every later *process* that
hits the same shapes loads the executable in seconds. The reference has no
equivalent (torch eager); for a jit-compiled TPU framework this is the
idiomatic serving setup.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser('~'), '.cache', 'ab_opt_tpu', 'jaxcache')


_SCOPED_VMEM_ENV = 'AB_OPT_SCOPED_VMEM_KIB'
_SCOPED_VMEM_DEFAULT_KIB = 24576


def tpu_sampling_compiler_options() -> dict | None:
    """Per-jit compiler options for the TPU *sampling* programs.

    XLA's default scoped-VMEM budget is 16 MB; inside the 100-step reverse
    scan it places the fused GABlock kernel's operands/output on the scoped
    VMEM stack, and at eval crop lengths past the production L=128 the whole
    allocation overflows (measured: a full ``model.sample`` at N=8, L=160
    needs 17.73 MB even though the bare kernel fits — the overage is XLA's
    own stack placement around the custom call, and it scales with N).
    Raising the limit to 24 MB fixes every observed shape; the v5e has far
    more physical VMEM than the conservative default assumes. Returns None
    off-TPU (the CPU/GPU clients reject the TPU-only flag).
    """
    import jax
    if jax.default_backend() != 'tpu':
        return None
    kib = int(os.environ.get(_SCOPED_VMEM_ENV, _SCOPED_VMEM_DEFAULT_KIB))
    return {'xla_tpu_scoped_vmem_limit_kib': kib}


def jit_sample(fn, **jit_kwargs):
    """``jax.jit`` for sampling entry points, with the TPU scoped-VMEM raise
    applied (see :func:`tpu_sampling_compiler_options`). Drop-in at every
    site that jits ``model.sample``-shaped programs."""
    import jax
    opts = tpu_sampling_compiler_options()
    if opts:
        jit_kwargs.setdefault('compiler_options', opts)
    return jax.jit(fn, **jit_kwargs)


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compile cache.

    Respects the user's own configuration: a set ``JAX_COMPILATION_CACHE_DIR``
    env var (jax reads it natively) or an already-configured jax config key
    makes this a no-op. Safe to call before backend init; config keys only
    affect future compiles. Returns the directory in effect, or None if the
    cache could not be enabled (read-only filesystem, etc.).
    """
    env_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if env_dir:
        return env_dir
    import jax
    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = path or DEFAULT_CACHE_DIR
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    jax.config.update('jax_compilation_cache_dir', path)
    # Cache everything that took a nontrivial compile; the default 1GB/entry
    # floor would skip the models we care about.
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    return path
