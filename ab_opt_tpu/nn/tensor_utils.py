"""Small tensor helpers (ref AbDock/src/modules/common/tensor_utils.py,
an OpenFold-derived module the reference uses lightly)."""
from __future__ import annotations

import jax.numpy as jnp


def permute_final_dims(t, inds):
    """Permute the last ``len(inds)`` dims by ``inds`` (ref tensor_utils.py)."""
    zero_index = -1 * len(inds)
    first = list(range(t.ndim + zero_index))
    return jnp.transpose(t, first + [zero_index + i for i in inds])


def flatten_final_dims(t, num_dims: int):
    return t.reshape(t.shape[:-num_dims] + (-1,))


def masked_mean(mask, value, axis, eps: float = 1e-10):
    mask = jnp.broadcast_to(mask, value.shape)
    return (mask * value).sum(axis) / (eps + mask.sum(axis))
