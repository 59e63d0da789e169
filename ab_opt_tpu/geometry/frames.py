"""Rigid-frame construction and local/global coordinate maps.

TPU-native rewrite of ``AbDock/src/modules/common/geometry.py:47-140,236-251``.
Frames are (R, t) with R (..., 3, 3) storing basis vectors as *columns* and
t (..., 3). Point clouds attach extra axes between the frame axes and the
final coordinate axis: p (..., K1, ..., 3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from .vec import normalize_vector, project_v2v


def construct_3d_basis(center, p1, p2):
    """Orthonormal basis from three points (typically CA, C, N).

    e1 points to p1, e2 is the Gram-Schmidt complement toward p2, e3 = e1 x e2.
    Returns (..., 3, 3) with [e1 e2 e3] as columns. (ref geometry.py:47)
    """
    e1 = normalize_vector(p1 - center)
    v2 = p2 - center
    e2 = normalize_vector(v2 - project_v2v(v2, e1))
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)


def _flatten_points(p, batch_ndim):
    """(..., K1, ..., 3) -> (..., K, 3) plus the original shape."""
    shape = p.shape
    return p.reshape(shape[:batch_ndim] + (-1, 3)), shape


def local_to_global(R, t, p):
    """q = R p + t. R: (..., 3, 3), t: (..., 3), p: (..., K..., 3)."""
    batch_ndim = R.ndim - 2
    p_flat, shape = _flatten_points(p, batch_ndim)
    q = jnp.einsum('...ij,...kj->...ki', R, p_flat, precision=_HI) + t[..., None, :]
    return q.reshape(shape)


def global_to_local(R, t, q):
    """p = R^T (q - t). Inverse of :func:`local_to_global`."""
    batch_ndim = R.ndim - 2
    q_flat, shape = _flatten_points(q, batch_ndim)
    p = jnp.einsum('...ji,...kj->...ki', R, q_flat - t[..., None, :], precision=_HI)
    return p.reshape(shape)


def apply_rotation_to_vector(R, p):
    """Rotate vectors without translation (ref geometry.py:116)."""
    return local_to_global(R, jnp.zeros_like(p), p)


def compose_rotation_and_translation(R1, t1, R2, t2):
    """Apply (R2, t2) inside frame (R1, t1): R' = R1 R2, t' = R1 t2 + t1."""
    R_new = jnp.matmul(R1, R2, precision=_HI)
    t_new = jnp.einsum('...ij,...j->...i', R1, t2, precision=_HI) + t1
    return R_new, t_new


def compose_chain(transforms):
    """Left-fold a list of (R, t) transforms (ref geometry.py:134)."""
    R, t = transforms[0]
    for R2, t2 in transforms[1:]:
        R, t = compose_rotation_and_translation(R, t, R2, t2)
    return R, t


def repr_6d_to_rotation_matrix(x):
    """6D rotation representation (..., 6) -> (..., 3, 3) via Gram-Schmidt."""
    b1 = normalize_vector(x[..., 0:3])
    a2 = x[..., 3:6]
    b2 = normalize_vector(a2 - project_v2v(a2, b1))
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)
