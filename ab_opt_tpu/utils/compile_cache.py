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
