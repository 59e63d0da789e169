"""Fused invariant-point-attention kernel (Pallas TPU).

The IPA block (ref AbDock/src/modules/encoders/ga.py:40-178) is HBM-bound in
its XLA einsum form: per layer it materializes ~6 (N, L, L, H) logits/alpha
tensors and reads the (N, L, L, Cz) pair features twice. This kernel fuses

    (node + pair + spatial) logits -> masked softmax ->
    {pair, node, point} aggregation

into one VMEM-resident pass per (batch, query-tile) grid cell: the pair
tensor is streamed exactly once per layer and no (L, L) logits/alpha
intermediate touches HBM.

Two tricks keep the kernel inside Mosaic's supported-op envelope and on the
MXU:

* **Augmented points**: the spatial logit sum_sq_dist * coef and the 1/sqrt(3)
  logit scaling are folded into a single q.k-style contraction by augmenting
  the query/key point vectors with [|p|^2, 1] channels (built in XLA), so
  each head needs exactly ONE logits matmul and no rank-changing broadcasts.
* **In-VMEM pair bias**: the per-layer pair-bias projection is computed from
  the resident zT tile with a row-batched dot (batch dim 0, the only
  batching Mosaic implements), so the (N, L, L, H) bias never exists in HBM.

Shapes (Da = augmented per-head dim; H heads):
  qa:   (N, L, H*Da)   augmented queries  (pre-scaled, see _augment)
  ka:   (N, L, H*Da)   augmented keys
  v:    (N, L, H*Dv)   values
  vp:   (N, L, H*PV3)  global-frame value points
  zT:   (N, L, Cz, L)  pair features, transposed (i, c, j)
  wT:   (H, Cz)        pair-bias weights, pre-scaled by 1/sqrt(3)
  colb: (N, 8, L)      additive column mask (0 valid / -1e5 padding)
Returns:
  feat_p2n (N, L, H, Cz), feat_node (N, L, H*Dv), aggr_points (N, L, H*PV3)
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
    """Largest row tile dividing L whose streamed blocks fit VMEM."""
    for t in (128, 64, 32, 16, 8):
        if L % t != 0:
            continue
        z_blk = 2 * t * Cz * max(L, 128) * itemsize
        scratch = t * H * max(L, 128) * 4 * 2   # alphas + bias_all
        if z_blk + scratch <= _VMEM_BUDGET:
            return t
    return 8 if L % 8 == 0 else L


def _kernel(qa_ref, ka_ref, v_ref, vp_ref, zt_ref, wT_ref, colbias_ref,
            p2n_ref, node_ref, pts_ref, alphas_ref,
            *, H, Da, Dv, PV3, Cz, TI):
    f32 = jnp.float32
    col_bias = colbias_ref[0, :].astype(f32)               # (L,)
    zt = zt_ref[:].astype(f32)                             # (TI, Cz, L)

    # Pair bias for all heads: row-batched MXU dot over the resident tile.
    # bias_all[i, h, j] = sum_c wT[h, c] * zt[i, c, j]
    w_b = jnp.broadcast_to(wT_ref[:].astype(f32)[None], (TI, H, Cz))
    bias_all = jax.lax.dot_general(
        w_b, zt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)                        # (TI, H, L)

    for h in range(H):
        qa_h = qa_ref[:, h * Da:(h + 1) * Da].astype(f32)  # (TI, Da)
        ka_h = ka_ref[:, h * Da:(h + 1) * Da].astype(f32)  # (L, Da)
        # One matmul = (node + spatial) logits, pre-scaled by 1/sqrt(3).
        logits = jax.lax.dot_general(
            qa_h, ka_h, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                    # (TI, L)
        logits = logits + bias_all[:, h, :] + col_bias[None, :]
        alpha = jax.nn.softmax(logits, axis=-1)            # (TI, L)
        alphas_ref[:, h, :] = alpha

        v_h = v_ref[:, h * Dv:(h + 1) * Dv].astype(f32)
        node_ref[:, h * Dv:(h + 1) * Dv] = jnp.dot(
            alpha, v_h, preferred_element_type=f32).astype(node_ref.dtype)
        vp_h = vp_ref[:, h * PV3:(h + 1) * PV3].astype(f32)
        pts_ref[:, h * PV3:(h + 1) * PV3] = jnp.dot(
            alpha, vp_h, preferred_element_type=f32).astype(pts_ref.dtype)

    # Pair aggregation for all heads: row-batched dot over j.
    # p2n[i, h, c] = sum_j alphas[i, h, j] * zt[i, c, j]
    alphas = alphas_ref[:]                                 # (TI, H, L)
    p2n = jax.lax.dot_general(
        alphas, zt, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)                        # (TI, H, Cz)
    p2n_ref[:] = p2n.astype(p2n_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _fused_call(qa, ka, v, vp, zT, wT, col_bias, interpret: bool = False):
    N, L = qa.shape[:2]
    H, Cz = wT.shape
    Da = qa.shape[-1] // H
    Dv = v.shape[-1] // H
    PV3 = vp.shape[-1] // H
    TI = _pick_tile(L, Cz, H, zT.dtype.itemsize)
    out_dtype = qa.dtype

    grid = (N, L // TI)
    row = lambda d: pl.BlockSpec((None, TI, d), lambda n, i: (n, i, 0))
    full = lambda d: pl.BlockSpec((None, L, d), lambda n, i: (n, 0, 0))
    z_spec = pl.BlockSpec((None, TI, Cz, L), lambda n, i: (n, i, 0, 0))
    w_spec = pl.BlockSpec((H, Cz), lambda n, i: (0, 0))
    cb_spec = pl.BlockSpec((None, 8, L), lambda n, i: (n, 0, 0))

    kernel = functools.partial(_kernel, H=H, Da=Da, Dv=Dv, PV3=PV3, Cz=Cz,
                               TI=TI)
    out_shapes = (
        jax.ShapeDtypeStruct((N, L, H, Cz), out_dtype),
        jax.ShapeDtypeStruct((N, L, H * Dv), out_dtype),
        jax.ShapeDtypeStruct((N, L, H * PV3), out_dtype),
    )
    out_specs = (
        pl.BlockSpec((None, TI, H, Cz), lambda n, i: (n, i, 0, 0)),
        pl.BlockSpec((None, TI, H * Dv), lambda n, i: (n, i, 0)),
        pl.BlockSpec((None, TI, H * PV3), lambda n, i: (n, i, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row(H * Da), full(H * Da), full(H * Dv), full(H * PV3),
                  z_spec, w_spec, cb_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((TI, H, L), jnp.float32)],
        interpret=interpret,
    )(qa, ka, v, vp, zT, wT, col_bias)


def _augment(q, k, qp, kp, coef, H, Dqk):
    """Fold spatial logits + scalings into augmented q/k channels.

    q.k/sqrt(Dqk)*inv3 + coef*inv3*(|qp|^2 + |kp|^2 - 2 qp.kp)
      = qa . ka  with
    qa = [q*inv3/sqrt(Dqk), -2*c*qp, c*|qp|^2, c] (c = coef*inv3, per head)
    ka = [k,                 kp,     1,        |kp|^2]
    padded to a 64-multiple per head.
    """
    N, L = q.shape[:2]
    qh = q.reshape(N, L, H, Dqk)
    kh = k.reshape(N, L, H, Dqk)
    qph = qp.reshape(N, L, H, -1)
    kph = kp.reshape(N, L, H, -1)
    c = (coef * _INV_SQRT3).reshape(1, 1, H, 1).astype(q.dtype)
    one = jnp.ones_like(c[..., :1])
    qa = jnp.concatenate([
        qh * (_INV_SQRT3 / math.sqrt(Dqk)),
        -2.0 * c * qph,
        c * jnp.sum(qph * qph, axis=-1, keepdims=True),
        jnp.broadcast_to(c, (N, L, H, 1)),
    ], axis=-1)
    ka = jnp.concatenate([
        kh, kph,
        jnp.broadcast_to(one, (N, L, H, 1)),
        jnp.sum(kph * kph, axis=-1, keepdims=True),
    ], axis=-1)
    Da = qa.shape[-1]
    pad = (-Da) % 64
    if pad:
        zeros_q = jnp.zeros((N, L, H, pad), qa.dtype)
        qa = jnp.concatenate([qa, zeros_q], axis=-1)
        ka = jnp.concatenate([ka, zeros_q], axis=-1)
    return qa.reshape(N, L, -1), ka.reshape(N, L, -1)


def fused_ipa_from_flat(q, k, qp, kp, v, vp, z, pair_w, coef, mask,
                        zT=None, interpret: bool = False):
    """Flat head-minor inputs -> fused kernel.

    ``zT`` (N, L, Cz, L), if given, skips the per-call transpose (samplers
    hoist it out of the reverse scan).
    """
    N, L = q.shape[:2]
    H = coef.shape[-1]
    Dqk = q.shape[-1] // H
    qa, ka = _augment(q, k, qp, kp, coef, H, Dqk)
    wT = (pair_w.T * _INV_SQRT3).astype(jnp.float32)       # (H, Cz)
    if zT is None:
        zT = jnp.swapaxes(z, -1, -2)                       # (N, L, Cz, L)
    col_bias = (mask.astype(jnp.float32) - 1.0) * _NEG_BIG
    col_bias = jnp.broadcast_to(col_bias[:, None, :], (N, 8, L))

    p2n, node, pts = _fused_call(qa, ka, v, vp, zT, wT, col_bias,
                                 interpret=interpret)
    # Zero outputs of invalid query rows (reference zeroes alpha rows).
    row = mask.astype(p2n.dtype)
    p2n = (p2n * row[:, :, None, None]).reshape(N, L, -1)
    return p2n, node * row[..., None], pts * row[..., None]


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
