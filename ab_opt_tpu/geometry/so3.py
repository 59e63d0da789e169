"""SO(3) exponential/log maps and rotation parameterizations.

TPU-native rewrite of the reference's ``AbDock/src/modules/common/so3.py``
(log_rotation :10, so3vec<->rotation :56-63, random_uniform_so3 :66) and the
quaternion conversions in ``geometry.py:148-233``. All functions take arbitrary
leading batch dimensions and are differentiable; the acos in ``log_rotation``
is clamped on both sides so gradients stay finite under jit (the reference
toggles the clamp on ``torch.is_grad_enabled()``, which has no JAX analog).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .vec import normalize_vector

_MIN_COS = -0.9999


def so3vec_to_skewsym(w):
    """Axis-angle vector (..., 3) -> skew-symmetric matrix (..., 3, 3)."""
    x, y, z = jnp.moveaxis(w, -1, 0)
    o = jnp.zeros_like(x)
    rows = jnp.stack([o, z, -y, -z, o, x, y, -x, o], axis=-1)
    return rows.reshape(w.shape[:-1] + (3, 3))


def skewsym_to_so3vec(S):
    """Skew-symmetric matrix (..., 3, 3) -> axis-angle vector (..., 3)."""
    return jnp.stack([S[..., 1, 2], S[..., 2, 0], S[..., 0, 1]], axis=-1)


def exp_skewsym(S):
    """Rodrigues' formula: exp of a skew-symmetric matrix (..., 3, 3)."""
    w = skewsym_to_so3vec(S)
    # Grad-safe angle: sqrt of an eps-floored squared sum (identity inputs
    # would otherwise NaN the backward pass).
    x = jnp.sqrt(jnp.clip(jnp.sum(w * w, axis=-1), min=1e-16))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), S.shape)
    # Regularized sinc-style coefficients; limits at x->0 are 1 and 0.5.
    b = (jnp.sin(x) + 1e-8) / (x + 1e-8)
    c = (1.0 - jnp.cos(x) + 1e-8) / (x * x + 2e-8)
    # 3x3 matmuls must run at full f32 precision on TPU (the MXU's default
    # bf16 accumulation breaks orthogonality); HIGHEST is free at this size.
    S2 = jnp.matmul(S, S, precision=jax.lax.Precision.HIGHEST)
    return eye + b[..., None, None] * S + c[..., None, None] * S2


def log_rotation(R):
    """Matrix log of a rotation (..., 3, 3) -> skew-symmetric (..., 3, 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # Upper clamp strictly below 1 keeps arccos' finite for identity inputs.
    cos_theta = jnp.clip((trace - 1.0) / 2.0, _MIN_COS, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta**2, min=1e-12))
    coef = (theta + 1e-8) / (2.0 * sin_theta + 2e-8)
    return coef[..., None, None] * (R - jnp.swapaxes(R, -1, -2))


def so3vec_to_rotation(w):
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    return exp_skewsym(so3vec_to_skewsym(w))


def rotation_to_so3vec(R):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    return skewsym_to_so3vec(log_rotation(R))


# --------------------------------------------------------------------------- #
# Planar rotation representation: a tuple of 9 (...)-shaped components in
# row-major order (R9[3*c + d] == R[..., c, d]). On TPU, (..., 3, 3) tensors
# tile their tiny minor dims terribly — extracting the 9 components of a
# (N, L, 3, 3) rotation measured 0.17 ms/step at production shapes, and 3x3
# matmuls/stacks relayout constantly. The planar form keeps every rotation
# op a fused elementwise pass over (N, L) planes.
# --------------------------------------------------------------------------- #


def planar_from_matrix(R):
    """(..., 3, 3) -> tuple of 9 components (row-major)."""
    return tuple(R[..., c, d] for c in range(3) for d in range(3))


def planar_to_matrix(R9):
    """Tuple of 9 components -> (..., 3, 3)."""
    rows = jnp.stack(R9, axis=-1)
    return rows.reshape(rows.shape[:-1] + (3, 3))


def so3vec_to_rotation_planar(w):
    """Axis-angle (..., 3) -> planar rotation (tuple of 9 components).

    Same Rodrigues math as :func:`so3vec_to_rotation` (this codebase's
    transposed-skew convention), with S^2 expanded as w w^T - |w|^2 I so no
    3x3 matmul or stack ever materializes.
    """
    x, y, z = jnp.moveaxis(w, -1, 0)
    n2 = x * x + y * y + z * z
    theta = jnp.sqrt(jnp.clip(n2, min=1e-16))
    b = (jnp.sin(theta) + 1e-8) / (theta + 1e-8)
    c = (1.0 - jnp.cos(theta) + 1e-8) / (n2 + 2e-8)
    return (
        1.0 + c * (x * x - n2), b * z + c * (x * y), -b * y + c * (x * z),
        -b * z + c * (x * y), 1.0 + c * (y * y - n2), b * x + c * (y * z),
        b * y + c * (x * z), -b * x + c * (y * z), 1.0 + c * (z * z - n2),
    )


def planar_rotation_to_so3vec(R9):
    """Planar rotation -> axis-angle (..., 3) (log map, planar form)."""
    trace = R9[0] + R9[4] + R9[8]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, _MIN_COS, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta**2, min=1e-12))
    coef = (theta + 1e-8) / (2.0 * sin_theta + 2e-8)
    # vee(coef * (R - R^T)) with this codebase's skew convention.
    return jnp.stack([coef * (R9[5] - R9[7]),
                      coef * (R9[6] - R9[2]),
                      coef * (R9[1] - R9[3])], axis=-1)


def quaternion_1ijk_to_rotation_planar(v):
    """(1 + bi + cj + dk) -> planar rotation (tuple of 9 components)."""
    b, c, d = jnp.moveaxis(v, -1, 0)
    s = jnp.sqrt(1.0 + b * b + c * c + d * d)
    a, b, c, d = 1.0 / s, b / s, c / s, d / s
    return (
        a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c),
        2 * (b * c + a * d), a * a - b * b + c * c - d * d, 2 * (c * d - a * b),
        2 * (b * d - a * c), 2 * (c * d + a * b), a * a - b * b - c * c + d * d,
    )


def planar_compose(A9, B9):
    """Planar rotation product A @ B (27 fused multiply-adds)."""
    return tuple(
        A9[3 * c + 0] * B9[0 + d] + A9[3 * c + 1] * B9[3 + d]
        + A9[3 * c + 2] * B9[6 + d]
        for c in range(3) for d in range(3))


def planar_apply_to_vector(R9, p):
    """R @ p for planar R and (..., 3) vectors."""
    px, py, pz = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [R9[3 * c] * px + R9[3 * c + 1] * py + R9[3 * c + 2] * pz
         for c in range(3)], axis=-1)


def quaternion_to_rotation_matrix(q):
    """Unit-normalized quaternion (..., 4) [w, x, y, z] -> rotation (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two = 2.0
    rows = jnp.stack([
        1 - two * (j * j + k * k), two * (i * j - k * r), two * (i * k + j * r),
        two * (i * j + k * r), 1 - two * (i * i + k * k), two * (j * k - i * r),
        two * (i * k - j * r), two * (j * k + i * r), 1 - two * (i * i + j * j),
    ], axis=-1)
    return rows.reshape(q.shape[:-1] + (3, 3))


def quaternion_1ijk_to_rotation_matrix(v):
    """(1 + bi + cj + dk) -> rotation matrix; v: (..., 3).

    Used by the denoiser's rotation-update head (ref dpm_full.py:102): the
    network outputs the imaginary part of a quaternion whose real part is
    pinned at 1, guaranteeing a rotation close to identity at small outputs.
    """
    b, c, d = jnp.moveaxis(v, -1, 0)
    s = jnp.sqrt(1.0 + b * b + c * c + d * d)
    a, b, c, d = 1.0 / s, b / s, c / s, d / s
    rows = jnp.stack([
        a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c),
        2 * (b * c + a * d), a * a - b * b + c * c - d * d, 2 * (c * d - a * b),
        2 * (b * d - a * c), 2 * (c * d + a * b), a * a - b * b - c * c + d * d,
    ], axis=-1)
    return rows.reshape(v.shape[:-1] + (3, 3))


def so3vec_to_quaternion(w):
    """Axis-angle (..., 3) -> unit quaternion (..., 4) [w, x, y, z].

    NOTE: this codebase's skew/exp convention (so3vec_to_skewsym) is the
    TRANSPOSE of the standard axis-angle rotation, so the matching
    quaternion is the conjugate of the textbook formula (negated vector
    part). With both helpers in this conjugate algebra, Hamilton products
    compose in the same left-to-right order as the matrix products:
    R(a) @ R(b) == R(quaternion_mul(q(a), q(b))).
    """
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    axis = w / (theta + 1e-12)
    half = 0.5 * theta
    return jnp.concatenate([jnp.cos(half), -jnp.sin(half) * axis], axis=-1)


def quaternion_mul(a, b):
    """Hamilton product of quaternions (..., 4) [w, x, y, z]."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quaternion_to_so3vec(q):
    """Unit quaternion (..., 4) -> axis-angle (..., 3), theta in [0, pi].

    Mirrors log_rotation's convention (shortest rotation): the sign of q is
    flipped to w >= 0 first (q and -q are the same rotation).
    """
    q = jnp.where(q[..., :1] < 0, -q, q)
    vec = -q[..., 1:]                    # conjugate convention; see above
    n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(n, q[..., :1])
    return vec / (n + 1e-12) * theta


def random_uniform_so3(key, shape, dtype=jnp.float32):
    """Uniform random rotations as so3 vectors, shape ``shape + (3,)``."""
    q = normalize_vector(jax.random.normal(key, tuple(shape) + (4,), dtype=dtype))
    return rotation_to_so3vec(quaternion_to_rotation_matrix(q))
