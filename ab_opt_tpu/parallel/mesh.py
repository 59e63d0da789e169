"""Mesh construction + sharded training/sampling entry points.

The reference has no collective backend at all (SURVEY.md §2.7): it trains on
one GPU and fans sampling out by replicating the batch (and Ray for host
jobs). The TPU-native equivalents here:

* training: data-parallel ``jit`` over a 1-D ``dp`` mesh — batch sharded,
  params replicated; XLA inserts the gradient all-reduce over ICI;
* sampling: the trajectory fan-out axis (hundreds of stochastic docking
  poses of one complex) is sharded over ``dp`` the same way — embarrassingly
  parallel, no cross-chip traffic during the 100-step reverse scan.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = 'dp') -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'make_mesh({n_devices}) but only {len(devices)} JAX devices '
                f'are available ({jax.default_backend()} backend); set '
                f'JAX_PLATFORMS=cpu with '
                f'--xla_force_host_platform_device_count={n_devices} for a '
                f'virtual mesh')
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def auto_mesh_for_batch(batch_size: int, n_devices: Optional[int] = None,
                        axis_name: str = 'dp') -> Mesh:
    """Mesh over the largest device count that divides ``batch_size``."""
    limit = n_devices or jax.device_count()
    k = max(d for d in range(1, limit + 1) if batch_size % d == 0)
    return make_mesh(k, axis_name)


def shard_batch(batch: Dict, mesh: Mesh, axis_name: str = 'dp') -> Dict:
    """Place a host batch with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def sharded_train_step(loss_fn: Callable, optimizer, mesh: Mesh,
                       axis_name: str = 'dp', loss_weights: Optional[Dict] = None,
                       max_grad_norm: Optional[float] = None) -> Callable:
    """Build a jitted data-parallel train step.

    loss_fn(params, batch, key) -> dict of scalar losses. The returned step
    has signature (params, opt_state, batch, key) -> (params, opt_state,
    loss_dict) with batch sharded over ``axis_name`` and params replicated.
    """
    weights = loss_weights or {}

    def total_loss(params, batch, key):
        losses = loss_fn(params, batch, key)
        # With explicit weights, only the weighted terms train (the
        # reference's sum_weighted_losses skips unweighted/no-grad entries,
        # e.g. diff_gnn's 'accuracy' metric).
        keys = [k for k in losses if k in weights] if weights else list(losses)
        total = sum(losses[k] * weights.get(k, 1.0) for k in keys)
        return total, losses

    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    import functools

    import optax

    # Donating params/opt_state halves their device footprint (they are
    # consumed and rebuilt every step). Ignored (with a warning) on CPU.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, key):
        (total, losses), grads = jax.value_and_grad(
            total_loss, has_aux=True)(params, batch, key)
        if max_grad_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses = dict(losses, overall=total)
        # Device-side finite guard: the host polls this one scalar (possibly
        # steps later) instead of materializing every loss each step.
        losses['_finite'] = jnp.all(
            jnp.stack([jnp.isfinite(v) for v in losses.values()]))
        return params, opt_state, losses

    def wrapped(params, opt_state, batch, key):
        batch = {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}
        params = jax.device_put(params, repl)
        return step(params, opt_state, batch, key)

    # Expose the raw jitted step too (callers may manage placement).
    wrapped.jitted = step
    return wrapped


def sharded_sample_fn(sample_fn: Callable, mesh: Mesh, axis_name: str = 'dp',
                      **sample_kwargs) -> Callable:
    """Jit a sampling function with the trajectory axis sharded over chips.

    sample_fn(params, batch, key, **kw) -> dict of arrays with leading
    trajectory axis N. Batch arrays must have N divisible by mesh size.
    """
    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    from ..utils.compile_cache import jit_sample
    fn = jit_sample(lambda params, batch, key: sample_fn(
        params, batch, key, **sample_kwargs))

    def wrapped(params, batch, key):
        batch = {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}
        params = jax.device_put(params, repl)
        return fn(params, batch, key)

    wrapped.jitted = fn
    return wrapped


def replicate_batch(batch: Dict, num: int) -> Dict:
    """Tile a single-complex batch to ``num`` independent trajectories
    (the reference's DataLoader([data]*num) trick, design_for_pdb.py:141)."""
    return {k: (jnp.repeat(v, num, axis=0) if hasattr(v, 'ndim') and v.ndim >= 1
                else v) for k, v in batch.items()}
