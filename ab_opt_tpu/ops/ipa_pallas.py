"""Fused invariant-point-attention kernel (Pallas TPU).

The IPA block (ref AbDock/src/modules/encoders/ga.py:40-178) is HBM-bound in
its XLA einsum form: per layer it materializes ~6 (N, L, L, H) logits/alpha
tensors and reads the (N, L, L, Cz) pair features twice. This kernel fuses

    node logits + pair bias + spatial logits -> masked softmax ->
    {pair, node, point} aggregation

into one VMEM-resident pass per (batch, query-tile) grid cell: the pair
tensor and the (precomputed) pair bias are streamed exactly once per layer
and no (L, L) logits/alpha intermediate touches HBM.

Design notes (Mosaic constraints drove these):
* all per-head contractions are head-batched dot_generals with the batch dim
  at position 0 (the only batching Mosaic implements) -- inputs arrive
  head-major (N, H, L, D);
* the pair bias is an input (N, H, L, L), not computed from z in-kernel:
  samplers hoist its projection out of the 100-step reverse scan, and the
  kernel streams it once -- unlike the XLA path, nothing re-materializes;
* the pair tensor arrives as zT (N, L, Cz, L) (query-row major) so the pair
  aggregation is a per-head lane reduction over the resident tile;
* outputs are head-major (N, H, L, D); the XLA caller transposes back
  (small tensors).

Shapes (D* = per-head dims; H heads):
  qh, kh:   (N, H, L, Dqk)
  qph, kph: (N, H, L, P3)    global-frame query/key points (P3 = 3*n_points)
  vh:       (N, H, L, Dv)
  vph:      (N, H, L, PV3)   global-frame value points
  zT:       (N, L, Cz, L)    pair features, transposed (i, c, j)
  bias:     (N, H, L, L)     pair-attention bias (z @ W_pair, precomputed)
  coef:     (H,)             spatial logit multiplier (-gamma*sqrt(2/9P)/2)
  mask:     (N, L) float     1.0 valid / 0.0 padding
Returns (head-major):
  feat_p2n (N, H, L, Cz), feat_node (N, H, L, Dv), aggr_points (N, H, L, PV3)
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT3 = math.sqrt(1.0 / 3.0)
_NEG_BIG = 1e5
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_tile(L: int, Cz: int, H: int, itemsize: int) -> int:
    """Largest row tile dividing L whose streamed blocks fit VMEM
    (double-buffered zT + bias + alpha scratch)."""
    for t in (128, 64, 32, 16, 8):
        if L % t != 0:
            continue
        z_blk = 2 * t * Cz * max(L, 128) * itemsize
        b_blk = 2 * H * t * max(L, 128) * 4
        if z_blk + b_blk + H * t * max(L, 128) * 4 <= _VMEM_BUDGET:
            return t
    return 8 if L % 8 == 0 else L


def _kernel(qh_ref, kh_ref, qph_ref, kph_ref, vh_ref, vph_ref, zt_ref,
            bias_ref, coef_ref, colbias_ref,
            p2n_ref, node_ref, pts_ref, alphas_ref,
            *, H, Dqk, Cz):
    f32 = jnp.float32
    # Additive column mask (0 valid / -1e5 padding); invalid *query rows*
    # are zeroed outside the kernel (their outputs are discarded anyway).
    col_bias = colbias_ref[0, :].astype(f32)               # (L,)

    qh = qh_ref[:].astype(f32)                             # (H, TI, Dqk)
    kh = kh_ref[:].astype(f32)                             # (H, L, Dqk)
    logits = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32) * (1.0 / math.sqrt(Dqk))   # (H, TI, L)

    qph = qph_ref[:].astype(f32)                           # (H, TI, P3)
    kph = kph_ref[:].astype(f32)                           # (H, L, P3)
    cross = jax.lax.dot_general(
        qph, kph, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)                        # (H, TI, L)
    sq_q = jnp.sum(qph * qph, axis=-1)                     # (H, TI)
    sq_k = jnp.sum(kph * kph, axis=-1)                     # (H, L)
    d2 = sq_q[:, :, None] + sq_k[:, None, :] - 2.0 * cross

    coef = coef_ref[0, :].astype(f32)                      # (H,)
    logits = logits + bias_ref[:].astype(f32) + d2 * coef[:, None, None]
    logits = logits * _INV_SQRT3 + col_bias[None, None, :]
    alphas = jax.nn.softmax(logits, axis=-1)               # (H, TI, L)
    alphas_ref[:] = alphas

    # Node/point aggregations: head-batched MXU dots.
    vh = vh_ref[:].astype(f32)                             # (H, L, Dv)
    node_ref[:] = jax.lax.dot_general(
        alphas, vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32).astype(node_ref.dtype)
    vph = vph_ref[:].astype(f32)                           # (H, L, PV3)
    pts_ref[:] = jax.lax.dot_general(
        alphas, vph, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32).astype(pts_ref.dtype)

    # Pair aggregation: per-head lane reduction over the resident zT tile.
    zt = zt_ref[:].astype(f32)                             # (TI, Cz, L)
    for h in range(H):
        a_h = alphas_ref[h]                                # (TI, L)
        p2n_h = jnp.sum(a_h[:, None, :] * zt, axis=-1)     # (TI, Cz)
        p2n_ref[h] = p2n_h.astype(p2n_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_ipa_attention(qh, kh, qph, kph, vh, vph, zT, bias, coef, mask,
                        interpret: bool = False):
    N, H, L, Dqk = qh.shape
    P3 = qph.shape[-1]
    Dv = vh.shape[-1]
    PV3 = vph.shape[-1]
    Cz = zT.shape[-2]
    TI = _pick_tile(L, Cz, H, zT.dtype.itemsize)
    out_dtype = qh.dtype

    # (N, 8, L) additive column bias: Mosaic wants >= 8 sublanes per block.
    col_bias = (mask.astype(jnp.float32) - 1.0) * _NEG_BIG
    col_bias = jnp.broadcast_to(col_bias[:, None, :], (N, 8, L))
    coef2 = coef.reshape(1, H).astype(jnp.float32)

    grid = (N, L // TI)
    row = lambda d: pl.BlockSpec((None, H, TI, d), lambda n, i: (n, 0, i, 0))
    full = lambda d: pl.BlockSpec((None, H, L, d), lambda n, i: (n, 0, 0, 0))
    z_spec = pl.BlockSpec((None, TI, Cz, L), lambda n, i: (n, i, 0, 0))
    bias_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n, 0, i, 0))
    coef_spec = pl.BlockSpec((1, H), lambda n, i: (0, 0))
    cb_spec = pl.BlockSpec((None, 8, L), lambda n, i: (n, 0, 0))

    kernel = functools.partial(_kernel, H=H, Dqk=Dqk, Cz=Cz)

    out_shapes = (
        jax.ShapeDtypeStruct((N, H, L, Cz), out_dtype),
        jax.ShapeDtypeStruct((N, H, L, Dv), out_dtype),
        jax.ShapeDtypeStruct((N, H, L, PV3), out_dtype),
    )
    out_specs = (
        pl.BlockSpec((None, H, TI, Cz), lambda n, i: (n, 0, i, 0)),
        pl.BlockSpec((None, H, TI, Dv), lambda n, i: (n, 0, i, 0)),
        pl.BlockSpec((None, H, TI, PV3), lambda n, i: (n, 0, i, 0)),
    )

    p2n, node, pts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row(Dqk), full(Dqk), row(P3), full(P3), full(Dv), full(PV3),
                  z_spec, bias_spec, coef_spec, cb_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((H, TI, L), jnp.float32)],
        interpret=interpret,
    )(qh, kh, qph, kph, vh, vph, zT, bias, coef2, col_bias)
    # Zero outputs of invalid query rows (reference zeroes alpha rows).
    row_mask = mask.astype(p2n.dtype)[:, None, :, None]
    return p2n * row_mask, node * row_mask, pts * row_mask


def ipa_attention_reference(q, k, qp, kp, v, vp, z, pair_w, coef, mask):
    """Einsum reference implementation (same math, XLA-scheduled).

    Takes flat head-minor inputs (N, L, H*D) and z in natural (N, L, L, Cz)
    layout, mirroring the GABlock einsum path.
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


def fused_ipa_from_flat(q, k, qp, kp, v, vp, z, pair_w, coef, mask,
                        pair_bias_t=None, zT=None, interpret: bool = False):
    """Convenience wrapper: flat head-minor inputs -> fused kernel.

    Handles the head-major transposes and the pair-bias projection.
    ``pair_bias_t``, if given, must already be head-major (N, H, L, L) —
    samplers hoist both it and ``zT`` out of the reverse scan.
    """
    N, L = q.shape[:2]
    H = coef.shape[-1]
    to_h = lambda x: jnp.transpose(x.reshape(N, L, H, -1), (0, 2, 1, 3))
    if pair_bias_t is None:
        pair_bias = jnp.einsum('nijc,ch->nijh', z, pair_w.astype(z.dtype))
        pair_bias_t = jnp.transpose(pair_bias, (0, 3, 1, 2))   # (N, H, L, L)
    bias_t = pair_bias_t
    if zT is None:
        zT = jnp.swapaxes(z, -1, -2)                       # (N, L, Cz, L)
    p2n, node, pts = fused_ipa_attention(
        to_h(q), to_h(k), to_h(qp), to_h(kp), to_h(v), to_h(vp),
        zT, bias_t, coef, mask, interpret=interpret)
    back = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(N, L, -1)
    return back(p2n), back(node), back(pts)
