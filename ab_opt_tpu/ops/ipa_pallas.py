"""Fused invariant-point-attention kernel (Pallas TPU).

The IPA block (ref AbDock/src/modules/encoders/ga.py:40-178) is HBM-bound in
its XLA einsum form: per layer it materializes ~6 (N, L, L, H) logits/alpha
tensors and reads the (N, L, L, Cz) pair features twice. This kernel fuses

    node logits + pair bias + spatial logits -> masked softmax ->
    {pair, node, point} aggregation

into one VMEM-resident pass per (batch, query-tile) grid cell: the pair
tensor is streamed exactly once per layer and no (L, L) intermediate touches
HBM. All *projections* (q/k/v/points, out_transform, MLPs) stay in XLA —
they are plain matmuls the compiler already schedules well.

Layout note: the pair tensor is passed pre-transposed as zT (N, L, Cz, L)
so its last (lane) dimension is L — at L >= 128 this avoids the 2x VMEM
padding a (., ., Cz=64) layout would incur, and makes both the in-kernel
pair-bias contraction and the pair aggregation lane reductions.

Shapes (D* = per-head dims; H heads):
  q, k:   (N, L, H*Dqk)   frame-invariant queries/keys
  qp, kp: (N, L, H*P3)    global-frame query/key points (P3 = 3*num_points)
  v:      (N, L, H*Dv)    values
  vp:     (N, L, H*PV3)   global-frame value points
  zT:     (N, L, Cz, L)   pair features, transposed (i, c, j)
  pair_w: (Cz, H)         per-block pair-bias projection weights
  coef:   (H,)            spatial logit multiplier (-gamma * sqrt(2/9P) / 2)
  mask:   (N, L) float    1.0 valid / 0.0 padding
Returns:
  feat_p2n (N, L, H*Cz), feat_node (N, L, H*Dv), aggr_points (N, L, H*PV3)
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INV_SQRT3 = math.sqrt(1.0 / 3.0)
_NEG_BIG = 1e5
_VMEM_BUDGET = 10 * 1024 * 1024   # conservative per-buffer-set budget


def _pick_tile(L: int, Cz: int, itemsize: int) -> int:
    """Largest row tile dividing L whose double-buffered zT block fits VMEM."""
    for t in (128, 64, 32, 16, 8):
        if L % t != 0:
            continue
        if 2 * t * Cz * max(L, 128) * itemsize <= _VMEM_BUDGET:
            return t
    return 8 if L % 8 == 0 else L


def _kernel(q_ref, k_ref, qp_ref, kp_ref, v_ref, vp_ref, zt_ref, bias_w_ref,
            coef_ref, mask_row_ref, mask_col_ref,
            p2n_ref, node_ref, pts_ref,
            *, H, Dqk, P3, Dv, PV3, Cz):
    f32 = jnp.float32
    mask_row = mask_row_ref[:].astype(f32)             # (TI,)
    mask_col = mask_col_ref[:].astype(f32)             # (L,)
    mask_pair = mask_row[:, None] * mask_col[None, :]  # (TI, L)

    zt = zt_ref[:].astype(f32)                         # (TI, Cz, L)

    for h in range(H):
        q_h = q_ref[:, h * Dqk:(h + 1) * Dqk].astype(f32)
        k_h = k_ref[:, h * Dqk:(h + 1) * Dqk].astype(f32)
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=f32) * (1.0 / math.sqrt(Dqk))

        # Pair bias from the resident zT tile: sum_c w[c] * z[i, c, j].
        w_h = bias_w_ref[:, h].astype(f32)             # (Cz,)
        bias = jnp.sum(zt * w_h[None, :, None], axis=1)        # (TI, L)

        qp_h = qp_ref[:, h * P3:(h + 1) * P3].astype(f32)
        kp_h = kp_ref[:, h * P3:(h + 1) * P3].astype(f32)
        cross = jax.lax.dot_general(qp_h, kp_h, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
        sq_q = jnp.sum(qp_h * qp_h, axis=-1)
        sq_k = jnp.sum(kp_h * kp_h, axis=-1)
        d2 = sq_q[:, None] + sq_k[None, :] - 2.0 * cross
        logits = logits + bias + d2 * coef_ref[0, h]

        logits = logits * _INV_SQRT3
        logits = jnp.where(mask_pair > 0, logits, logits - _NEG_BIG)
        alpha = jax.nn.softmax(logits, axis=-1)        # (TI, L)
        alpha = alpha * mask_row[:, None]              # zero invalid rows

        # Aggregations.
        v_h = v_ref[:, h * Dv:(h + 1) * Dv].astype(f32)
        node_ref[:, h * Dv:(h + 1) * Dv] = jnp.dot(
            alpha, v_h, preferred_element_type=f32).astype(node_ref.dtype)

        vp_h = vp_ref[:, h * PV3:(h + 1) * PV3].astype(f32)
        pts_ref[:, h * PV3:(h + 1) * PV3] = jnp.dot(
            alpha, vp_h, preferred_element_type=f32).astype(pts_ref.dtype)

        # Pair aggregation: sum_j alpha[i, j] * z[i, c, j] (lane reduction).
        p2n = jnp.sum(alpha[:, None, :] * zt, axis=-1)         # (TI, Cz)
        p2n_ref[:, h * Cz:(h + 1) * Cz] = p2n.astype(p2n_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_ipa_attention(q, k, qp, kp, v, vp, zT, pair_w, coef, mask,
                        interpret: bool = False):
    N, L = q.shape[:2]
    H = coef.shape[-1]
    Dqk = q.shape[-1] // H
    P3 = qp.shape[-1] // H
    Dv = v.shape[-1] // H
    PV3 = vp.shape[-1] // H
    Cz = zT.shape[-2]
    TI = _pick_tile(L, Cz, zT.dtype.itemsize)
    out_dtype = q.dtype

    mask_f = mask.astype(jnp.float32)
    coef2 = coef.reshape(1, H).astype(jnp.float32)

    grid = (N, L // TI)
    q_spec = pl.BlockSpec((None, TI, H * Dqk), lambda n, i: (n, i, 0))
    qp_spec = pl.BlockSpec((None, TI, H * P3), lambda n, i: (n, i, 0))
    k_spec = pl.BlockSpec((None, L, H * Dqk), lambda n, i: (n, 0, 0))
    kp_spec = pl.BlockSpec((None, L, H * P3), lambda n, i: (n, 0, 0))
    v_spec = pl.BlockSpec((None, L, H * Dv), lambda n, i: (n, 0, 0))
    vp_spec = pl.BlockSpec((None, L, H * PV3), lambda n, i: (n, 0, 0))
    z_spec = pl.BlockSpec((None, TI, Cz, L), lambda n, i: (n, i, 0, 0))
    w_spec = pl.BlockSpec((Cz, H), lambda n, i: (0, 0))
    coef_spec = pl.BlockSpec((1, H), lambda n, i: (0, 0))
    mrow_spec = pl.BlockSpec((None, TI), lambda n, i: (n, i))
    mcol_spec = pl.BlockSpec((None, L), lambda n, i: (n, 0))

    kernel = functools.partial(
        _kernel, H=H, Dqk=Dqk, P3=P3, Dv=Dv, PV3=PV3, Cz=Cz)

    out_shapes = (
        jax.ShapeDtypeStruct((N, L, H * Cz), out_dtype),
        jax.ShapeDtypeStruct((N, L, H * Dv), out_dtype),
        jax.ShapeDtypeStruct((N, L, H * PV3), out_dtype),
    )
    out_specs = (
        pl.BlockSpec((None, TI, H * Cz), lambda n, i: (n, i, 0)),
        pl.BlockSpec((None, TI, H * Dv), lambda n, i: (n, i, 0)),
        pl.BlockSpec((None, TI, H * PV3), lambda n, i: (n, i, 0)),
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, k_spec, qp_spec, kp_spec, v_spec, vp_spec, z_spec,
                  w_spec, coef_spec, mrow_spec, mcol_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(q, k, qp, kp, v, vp, zT, pair_w, coef2, mask_f, mask_f)


def ipa_attention_reference(q, k, qp, kp, v, vp, z, pair_w, coef, mask):
    """Einsum reference implementation (same math, XLA-scheduled).

    Takes z in natural (N, L, L, Cz) layout.
    """
    N, L = q.shape[:2]
    H = coef.shape[-1]
    Dqk = q.shape[-1] // H
    reshape_h = lambda x: x.reshape(N, L, H, -1)
    qh, kh, qph, kph, vh, vph = map(reshape_h, (q, k, qp, kp, v, vp))

    logits = jnp.einsum('nihc,njhc->nijh', qh, kh) / math.sqrt(Dqk)
    bias = jnp.einsum('nijc,ch->nijh', z, pair_w)
    cross = jnp.einsum('nihc,njhc->nijh', qph, kph)
    sq_q = jnp.sum(qph * qph, axis=-1)
    sq_k = jnp.sum(kph * kph, axis=-1)
    d2 = sq_q[:, :, None, :] + sq_k[:, None, :, :] - 2 * cross
    logits = (logits + bias + d2 * coef) * _INV_SQRT3

    mask_b = mask.astype(bool)
    pair_mask = (mask_b[:, :, None] & mask_b[:, None, :])[..., None]
    logits = jnp.where(pair_mask, logits, logits - _NEG_BIG)
    alpha = jax.nn.softmax(logits, axis=2)
    alpha = jnp.where(mask_b[:, :, None, None], alpha, 0.0)

    p2n = jnp.einsum('nijh,nijc->nihc', alpha, z).reshape(N, L, -1)
    node = jnp.einsum('nijh,njhc->nihc', alpha, vh).reshape(N, L, -1)
    pts = jnp.einsum('nijh,njhc->nihc', alpha, vph).reshape(N, L, -1)
    return p2n, node, pts
