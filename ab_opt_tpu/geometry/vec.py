"""Small vector helpers (ref: AbDock/src/modules/common/geometry.py:12-44)."""
from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    """Norm with a floor on the squared sum so gradients stay finite at 0."""
    sq = jnp.clip(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims), min=eps)
    return jnp.sqrt(sq) if sqrt else sq


def normalize_vector(v, axis=-1, eps=1e-6):
    # sqrt of an eps-floored squared sum: zero vectors (padded residues)
    # yield zero output AND finite gradients — jnp.linalg.norm's 0/0
    # jacobian would NaN the whole backward pass otherwise.
    n = jnp.sqrt(jnp.sum(jnp.square(v), axis=axis, keepdims=True) + eps * eps)
    return v / (n + eps)


def project_v2v(v, e, axis=-1):
    """Project vector ``v`` onto unit vector ``e``."""
    return jnp.sum(e * v, axis=axis, keepdims=True) * e


def pairwise_distances(x, y=None, return_v=False):
    """All-pairs distances. x: (..., N, d), y: (..., M, d) -> (..., N, M)."""
    if y is None:
        y = x
    v = x[..., :, None, :] - y[..., None, :, :]
    d = safe_norm(v, axis=-1)
    return (d, v) if return_v else d


def angstrom_to_nm(x):
    return x / 10.0


def nm_to_angstrom(x):
    return x * 10.0
