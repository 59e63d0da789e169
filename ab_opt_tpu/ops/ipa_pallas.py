"""Fused invariant-point-attention kernel (Pallas TPU).

The IPA block (ref AbDock/src/modules/encoders/ga.py:40-178) is HBM-bound in
its XLA einsum form: per layer it materializes ~6 (N, L, L, H) logits/alpha
tensors and reads the (N, L, L, Cz) pair features twice. This kernel fuses

    (node + pair + spatial) logits -> masked softmax -> value aggregation

into one VMEM-resident pass per (batch, query-tile) grid cell. Design rules
learned from profiling on v5e (see PERF.md):

* **Flat head-minor layouts everywhere.** All q/k/v tensors stay (N, L, H*D)
  with D padded to 64 lanes, so the XLA side never materializes a
  (N, L, H, small) array (tiny minor dims force padded relayout copies that
  cost more than the attention itself) and the kernel slices heads at
  lane-aligned offsets.
* **Augmented points** (``_augment_matrix``): the spatial logit
  sum_sq_dist * coef and the 1/sqrt(3) scaling fold into a single q.k-style
  contraction by augmenting q/k with [|p|^2, 1] channels. The augmented
  tensors are built by ONE sparse-matrix GEMM per side (a scatter-built
  (688, 768) scale/permute matrix), not by per-head concatenation.
* **Hoisted pair bias**: the per-layer pair-bias projection z @ W_h is
  computed in XLA outside the kernel — and, during sampling, outside the
  whole reverse scan (the pair tensor is constant across diffusion steps) —
  then streamed head-major (N, H, L, L) with the column mask folded in. The
  kernel never touches the (N, L, L, Cz) pair tensor.
* **Alphas exported**: softmax weights leave the kernel head-major
  (N, H, L, L) so the value-from-pair aggregation sum_j alpha_ij z_ij (an
  inherently M=num_heads batched contraction) runs as one XLA einsum against
  z in natural layout; at trajectory fan-out the replicas share z, turning
  it into an MXU-efficient M=reps*H matmul (see ``p2n_aggregate``).
* **Custom VJP**: a backward kernel on grid (N, H) computes dqa/dka/dvvp/
  dbias from the saved alphas, so training runs fused too.

Shapes (Da = augmented per-head q/k dim = 64; Dv = padded value dim = 64):
  qa:   (N, L, H*Da)  augmented queries (pre-scaled)
  ka:   (N, L, H*Da)  augmented keys
  vvp:  (N, L, H*Dv)  concat [node values | global-frame value points] + pad
  bias: (N, H, L, L)  pair bias, pre-scaled by 1/sqrt(3), + column mask
Returns:
  out    (N, L, H*Dv)  alpha-weighted values
  alphas (N, H, L, L)  softmax weights (compute dtype)
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT3 = math.sqrt(1.0 / 3.0)
_NEG_BIG = 1e5
_DA = 64    # per-head augmented q/k width (lane-aligned)
_DV = 64    # per-head value width (node + point values + pad)


def _pick_tile(L: int) -> int:
    """Query-row tile: whole L when small, else the largest aligned divisor."""
    if L <= 256:
        return L
    for t in (256, 128, 64, 32, 16, 8):
        if L % t == 0:
            return t
    return L


# --------------------------------------------------------------------------- #
# Forward kernel: logits + softmax + value aggregation, per (n, query-tile).
# --------------------------------------------------------------------------- #


def _attention_body(qa_ref, ka_ref, vvp_ref, bias_ref, out_ref, H):
    """Phase-separated attention body shared by the forward kernels: all
    logits dots back-to-back, ONE stacked softmax, then all value dots —
    consecutive independent MXU ops pipeline without the per-head
    dot->VPU->dot round trips of the interleaved form. Writes the value
    aggregation to ``out_ref``; returns (alpha f32, alpha value-dtype)."""
    f32 = jnp.float32
    logits = []
    for h in range(H):
        sl = slice(h * _DA, (h + 1) * _DA)
        logits.append(jax.lax.dot_general(
            qa_ref[:, sl], ka_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32))                    # (TI, L)
    alpha = jax.nn.softmax(
        jnp.stack(logits, 0) + bias_ref[...].astype(f32), axis=-1)
    ab = alpha.astype(vvp_ref.dtype)                        # (H, TI, L)
    for h in range(H):
        sv = slice(h * _DV, (h + 1) * _DV)
        out_ref[:, sv] = jnp.dot(
            ab[h], vvp_ref[:, sv],
            preferred_element_type=f32).astype(out_ref.dtype)
    return alpha, ab


def _fwd_kernel(qa_ref, ka_ref, vvp_ref, bias_ref, out_ref, alphas_ref, *, H):
    alpha, _ = _attention_body(qa_ref, ka_ref, vvp_ref, bias_ref, out_ref, H)
    alphas_ref[...] = alpha.astype(alphas_ref.dtype)


def _attention_fwd_call(qa, ka, vvp, bias, interpret: bool, reps: int = 1):
    N, L = qa.shape[:2]
    H = bias.shape[1]
    TI = _pick_tile(L)
    grid = (N, L // TI)

    row = lambda d: pl.BlockSpec((None, TI, d), lambda n, i: (n, i, 0))
    full = lambda d: pl.BlockSpec((None, L, d), lambda n, i: (n, 0, 0))
    # Trajectory replicas share their complex's bias block (index n // reps)
    # — the (Nc, H, L, L) tensor is never materialized at full N.
    b_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n // reps, 0, i, 0))
    a_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n, 0, i, 0))

    out, alphas = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H),
        grid=grid,
        in_specs=[row(H * _DA), full(H * _DA), full(H * _DV), b_spec],
        out_specs=(row(H * _DV), a_spec),
        out_shape=(
            jax.ShapeDtypeStruct((N, L, H * _DV), qa.dtype),
            jax.ShapeDtypeStruct((N, H, L, L), qa.dtype),
        ),
        interpret=interpret,
    )(qa, ka, vvp, bias)
    return out, alphas


# --------------------------------------------------------------------------- #
# Sampling-path forward: value aggregation AND pair aggregation in-kernel;
# the (N, H, L, L) alphas never leave VMEM (they cost ~200 MB/layer of HBM
# round-trip at a 256-trajectory fan-out). Forward-only — samplers never
# differentiate; the training path keeps the alphas-saving kernel + XLA
# p2n einsum above.
# --------------------------------------------------------------------------- #


def _fwd_p2n_kernel(qa_ref, ka_ref, vvp_ref, bias_ref, z_ref, out_ref,
                    p2n_ref, *, H):
    _, ab = _attention_body(qa_ref, ka_ref, vvp_ref, bias_ref, out_ref, H)
    # p2n[l, h, c] = sum_j alpha[h, l, j] z[l, j, c]: batched dot over the
    # query rows (z's block is per-complex — resident across all replicas).
    p2n = jax.lax.dot_general(
        ab.transpose(1, 0, 2), z_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (TI, H, Cz)
    p2n_ref[...] = p2n.astype(p2n_ref.dtype)


def _attention_fwd_p2n_call(qa, ka, vvp, bias, z, interpret: bool,
                            reps: int = 1):
    """Returns (out (N, L, H*_DV), p2n (N, L, H, Cz)); no alphas output."""
    N, L = qa.shape[:2]
    H = bias.shape[1]
    Cz = z.shape[-1]
    TI = _pick_tile(L)
    grid = (N, L // TI)
    row = lambda d: pl.BlockSpec((None, TI, d), lambda n, i: (n, i, 0))
    full = lambda d: pl.BlockSpec((None, L, d), lambda n, i: (n, 0, 0))
    b_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n // reps, 0, i, 0))
    z_spec = pl.BlockSpec((None, TI, L, Cz), lambda n, i: (n // reps, i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_p2n_kernel, H=H),
        grid=grid,
        in_specs=[row(H * _DA), full(H * _DA), full(H * _DV), b_spec, z_spec],
        out_specs=(row(H * _DV),
                   pl.BlockSpec((None, TI, H, Cz), lambda n, i: (n, i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((N, L, H * _DV), qa.dtype),
                   jax.ShapeDtypeStruct((N, L, H, Cz), qa.dtype)),
        interpret=interpret,
    )(qa, ka, vvp, bias, z)


# --------------------------------------------------------------------------- #
# Backward kernel: one (n, h) cell recovers all input cotangents from the
# saved alphas — standard attention VJP, every dot (L, L) x (L, D).
# --------------------------------------------------------------------------- #


def _bwd_kernel(qa_ref, ka_ref, vvp_ref, alphas_ref, dout_ref, dalphas_ref,
                dqa_ref, dka_ref, dvvp_ref, dbias_ref, *, H):
    f32 = jnp.float32
    for h in range(H):
        sl = slice(h * _DA, (h + 1) * _DA)
        sv = slice(h * _DV, (h + 1) * _DV)
        alpha = alphas_ref[h].astype(f32)                   # (L, L)
        dout = dout_ref[:, sv].astype(f32)                  # (L, Dv)
        vvp = vvp_ref[:, sv].astype(f32)

        # d(alpha) from the value aggregation + any direct alpha cotangent.
        dal = jax.lax.dot_general(dout, vvp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)   # (L, L)
        dal = dal + dalphas_ref[h].astype(f32)

        # Softmax VJP: dlogits = alpha * (dal - rowsum(dal * alpha)).
        tmp = dal * alpha
        dlog = tmp - alpha * jnp.sum(tmp, axis=-1, keepdims=True)
        dbias_ref[h] = dlog.astype(dbias_ref.dtype)

        # dvvp = alpha^T @ dout; dqa = dlog @ ka; dka = dlog^T @ qa.
        dvvp_ref[:, sv] = jax.lax.dot_general(
            alpha, dout, (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dvvp_ref.dtype)
        dqa_ref[:, sl] = jnp.dot(
            dlog, ka_ref[:, sl].astype(f32),
            preferred_element_type=f32).astype(dqa_ref.dtype)
        dka_ref[:, sl] = jax.lax.dot_general(
            dlog, qa_ref[:, sl].astype(f32), (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dka_ref.dtype)


def _attention_bwd_call(qa, ka, vvp, alphas, dout, dalphas, interpret: bool):
    N, L = qa.shape[:2]
    H = alphas.shape[1]
    grid = (N,)

    flat = lambda d: pl.BlockSpec((None, L, d), lambda n: (n, 0, 0))
    head = pl.BlockSpec((None, H, L, L), lambda n: (n, 0, 0, 0))

    return pl.pallas_call(
        functools.partial(_bwd_kernel, H=H),
        grid=grid,
        in_specs=[flat(H * _DA), flat(H * _DA), flat(H * _DV), head,
                  flat(H * _DV), head],
        out_specs=(flat(H * _DA), flat(H * _DA), flat(H * _DV), head),
        out_shape=(
            jax.ShapeDtypeStruct(qa.shape, qa.dtype),
            jax.ShapeDtypeStruct(ka.shape, ka.dtype),
            jax.ShapeDtypeStruct(vvp.shape, vvp.dtype),
            jax.ShapeDtypeStruct((N, H, L, L), qa.dtype),
        ),
        interpret=interpret,
    )(qa, ka, vvp, alphas, dout, dalphas)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_attention(interpret, reps, qa, ka, vvp, bias):
    return _attention_fwd_call(qa, ka, vvp, bias, interpret, reps)


def _fused_attention_fwd(interpret, reps, qa, ka, vvp, bias):
    out, alphas = _attention_fwd_call(qa, ka, vvp, bias, interpret, reps)
    return (out, alphas), (qa, ka, vvp, alphas)


def _fused_attention_bwd(interpret, reps, res, cts):
    qa, ka, vvp, alphas = res
    dout, dalphas = cts
    dqa, dka, dvvp, dbias = _attention_bwd_call(
        qa, ka, vvp, alphas, dout, dalphas, interpret)
    if reps != 1:
        # Forward shares the per-complex bias across replicas (b_spec index
        # n // reps); the cotangent therefore sums over the replica axis.
        N, H, L, _ = dbias.shape
        dbias = dbias.reshape(N // reps, reps, H, L, L).sum(axis=1)
    return dqa, dka, dvvp, dbias


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


# --------------------------------------------------------------------------- #
# XLA-side assembly: sparse scale/permute matrices instead of concatenation.
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def _augment_layout(H: int, Dqk: int, P3: int):
    """Static (rows, cols) index arrays for the augment scatter matrices.

    Input channel order: [q (H*Dqk) | qp planar (H*P3) | sq (H) | one (1)],
    where the qp section is PLANAR: [x (H*P) | y (H*P) | z (H*P)], each
    component block head-major (h*P + p). Planar layouts keep every point
    tensor wide in the lane dimension — the (points, 3) interleaved layout's
    3-wide minor dim measured ~3x slower in rotations and copies.
    Output per head h (width _DA): [q_h | qp_h | sq_h | const | zero pad].
    """
    P = P3 // 3
    rows, cols, kinds = [], [], []   # kind 0: q, 1: qp, 2: sq, 3: one
    for h in range(H):
        base = h * _DA
        for d in range(Dqk):
            rows.append(h * Dqk + d); cols.append(base + d); kinds.append(0)
        for c in range(3):
            for p in range(P):
                rows.append(H * Dqk + c * H * P + h * P + p)
                cols.append(base + Dqk + c * P + p); kinds.append(1)
        rows.append(H * Dqk + H * P3 + h)
        cols.append(base + Dqk + P3); kinds.append(2)
        rows.append(H * Dqk + H * P3 + H)
        cols.append(base + Dqk + P3 + 1); kinds.append(3)
    return (np.asarray(rows), np.asarray(cols), np.asarray(kinds),
            H * Dqk + H * P3 + H + 1)


def _augment_matrix(coef, H, Dqk, P3, scales, dtype):
    """Build the (in_dim, H*_DA) scale/permute matrix.

    ``scales``: per-kind multipliers, each either a scalar or (H,) — kind
    order [q, qp, sq, one]. coef-dependent entries make the matrix traced;
    the scatter is tiny (one per layer per call).
    """
    rows, cols, kinds, in_dim = _augment_layout(H, Dqk, P3)
    per_head = [jnp.broadcast_to(jnp.asarray(s, jnp.float32), (H,))
                for s in scales]
    head_of_col = jnp.asarray(cols // _DA, jnp.int32)
    vals = jnp.stack(per_head, 0)[jnp.asarray(kinds), head_of_col]
    m = jnp.zeros((in_dim, H * _DA), jnp.float32)
    return m.at[rows, cols].set(vals).astype(dtype)


def make_augment_mat(coef, H, Dqk, P3, dtype):
    """The stacked (2, in_dim, H*_DA) scale/permute matrices (Sq, Sk).

    ``in_q @ S[0] -> qa`` and ``in_k @ S[1] -> ka`` (see :func:`_augment`).
    S depends only on the per-head spatial coefficient (a parameter), so it
    is constant across diffusion steps — samplers hoist it out of the
    reverse scan via ``nn.ipa.precompute_encoder_aug_mats`` (the scatter
    builds otherwise run every step: measured 0.28 ms/step at L=128)."""
    coef = jnp.asarray(coef).reshape(H)
    c = (coef * _INV_SQRT3).astype(jnp.float32)
    s_node = _INV_SQRT3 / math.sqrt(Dqk)
    Sq = _augment_matrix(coef, H, Dqk, P3, [s_node, -2.0 * c, c, c], dtype)
    # ka layout swaps the sq/one slots relative to qa ([.., 1, |kp|^2]):
    # drop both via zero scales, then add the swapped placements explicitly.
    _, _, _, in_dim = _augment_layout(H, Dqk, P3)
    Sk = _augment_matrix(coef, H, Dqk, P3, [1.0, 1.0, 0.0, 0.0], dtype)
    swap = jnp.zeros((in_dim, H * _DA), jnp.float32)
    sq_rows = np.asarray([H * Dqk + H * P3 + h for h in range(H)])
    sq_cols = np.asarray([h * _DA + Dqk + P3 + 1 for h in range(H)])
    one_row = np.asarray([in_dim - 1] * H)
    one_cols = np.asarray([h * _DA + Dqk + P3 for h in range(H)])
    swap = swap.at[sq_rows, sq_cols].set(1.0)
    swap = swap.at[one_row, one_cols].set(1.0)
    Sk = Sk + swap.astype(dtype)
    return jnp.stack([Sq.astype(dtype), Sk])


@functools.lru_cache(maxsize=None)
def _planar_pool_np(H: int, P3: int):
    """0/1 matrix pooling planar-flat squared points (H*P3) to per-head (H)."""
    P = P3 // 3
    m = np.zeros((H * P3, H), np.float32)
    for c in range(3):
        for h in range(H):
            m[c * H * P + h * P:c * H * P + (h + 1) * P, h] = 1.0
    return m


def _augment(q, k, qp, kp, coef, H, Dqk, aug_mat=None):
    """Augmented q/k, each built by one GEMM against a sparse scale matrix.

    ``qp``/``kp`` are planar-flat (N, L, H*P3): [x | y | z] component blocks,
    head-major within each block (see :func:`_augment_layout`).

    q.k/sqrt(Dqk)*inv3 + coef*inv3*(|qp|^2 + |kp|^2 - 2 qp.kp) = qa . ka with
    qa_h = [q_h*inv3/sqrt(Dqk), -2*c_h*qp_h, c_h*|qp_h|^2, c_h, 0-pad]
    ka_h = [k_h,                 kp_h,       1,            |kp_h|^2, 0-pad]
    """
    N, L = q.shape[:2]
    P3 = qp.shape[-1] // H
    dt = q.dtype
    if aug_mat is None:
        aug_mat = make_augment_mat(coef, H, Dqk, P3, dt)

    # Per-head |p|^2 for both sides via one 0/1 pooling GEMM.
    pool = jnp.asarray(_planar_pool_np(H, P3), dt)          # (H*P3, H)
    sq_qk = jnp.dot(jnp.stack([qp * qp, kp * kp], axis=2), pool)  # (N,L,2,H)
    one = jnp.ones((N, L, 1), dt)

    in_q = jnp.concatenate([q, qp, sq_qk[:, :, 0], one], axis=-1)
    in_k = jnp.concatenate([k, kp, sq_qk[:, :, 1], one], axis=-1)
    qa = jnp.dot(in_q, aug_mat[0].astype(dt))
    ka = jnp.dot(in_k, aug_mat[1].astype(dt))
    return qa, ka


@functools.lru_cache(maxsize=None)
def _value_matrix_np(H: int, Dv: int, PV3: int):
    """0/1 permute matrix packing [v | vp] into per-head _DV-wide slots.

    ``vp`` arrives planar-flat ([x | y | z] blocks, head-major inside); each
    head's slot gets [v_h (Dv) | x (PV) | y (PV) | z (PV)] so the kernel's
    per-head output stays planar too."""
    PV = PV3 // 3
    in_dim = H * (Dv + PV3)
    m = np.zeros((in_dim, H * _DV), np.float32)
    for h in range(H):
        for d in range(Dv):
            m[h * Dv + d, h * _DV + d] = 1.0
        for c in range(3):
            for p in range(PV):
                m[H * Dv + c * H * PV + h * PV + p,
                  h * _DV + Dv + c * PV + p] = 1.0
    return m


# --------------------------------------------------------------------------- #
# Fast-weights assembly: one GEMM per attention operand.
#
# The original pallas-path assembly ran, per layer: six projection dots
# (q/k/v/qp/kp/vp), then dense (688, 768) augment GEMMs and a (672, 768)
# value-packing GEMM whose matrices are ~99% zeros. Folding the q/k/v
# projections INTO the scatter matrices (qa = [x | qp_g | sq] @ Sq + bias)
# cuts the per-row MAC count ~40% and the dispatch count per layer from
# ~10 dots to 4. The folded matrices depend only on layer parameters, so
# samplers hoist them out of the reverse scan
# (nn.ipa.precompute_encoder_fast_weights).
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def _fast_layout(H: int, Dqk: int, P3: int, PV3: int, Dv: int):
    """Constant index arrays for the fast scatter matrices."""
    P, PV = P3 // 3, PV3 // 3
    F_off = 0          # placeholder; x rows are handled by placement matmuls
    # q/k placement: column h*_DA + d for head-major projection column.
    pq = np.zeros((H * Dqk, H * _DA), np.float32)
    for h in range(H):
        for d in range(Dqk):
            pq[h * Dqk + d, h * _DA + d] = 1.0
    # v placement into _DV slots.
    pv = np.zeros((H * Dv, H * _DV), np.float32)
    for h in range(H):
        for d in range(Dv):
            pv[h * Dv + d, h * _DV + d] = 1.0
    # qp/kp rows (planar-flat component-major) -> per-head point slots.
    rows_p, cols_p = [], []
    for h in range(H):
        for c in range(3):
            for p in range(P):
                rows_p.append(c * H * P + h * P + p)
                cols_p.append(h * _DA + Dqk + c * P + p)
    # vp rows -> value point slots.
    rows_vp, cols_vp = [], []
    for h in range(H):
        for c in range(3):
            for p in range(PV):
                rows_vp.append(c * H * PV + h * PV + p)
                cols_vp.append(h * _DV + Dv + c * PV + p)
    return (pq, pv, np.asarray(rows_p), np.asarray(cols_p),
            np.asarray(rows_vp), np.asarray(cols_vp))


def make_fast_weights(Wq, Wk, Wv, Wqp, Wkp, Wvp, coef, dtype):
    """Fold projections + augment/packing into per-operand matrices.

    Args: the six projection kernels (F, H*D) (point kernels planar
    component-major, as stored) and the per-head spatial coefficient
    ``coef`` (H,) (already includes the 1/sqrt(3)).
    Returns dict:
      w_pts (F, 3*(2*H*P + H*PV)): fused point projection, component-major
        over the concatenated [qp | kp | vp] point sets;
      s_q / s_k ((F + H*P3 + H), H*_DA): [x | qp_planar | sq] -> qa/ka;
      bias_q / bias_k (H*_DA,): constant slot columns;
      s_v ((F + H*PV3), H*_DV): [x | vp_planar] -> vvp.
    """
    F = Wq.shape[0]
    H = coef.shape[-1]
    Dqk = Wq.shape[1] // H
    Dv = Wv.shape[1] // H
    P3 = Wqp.shape[1] // H
    PV3 = Wvp.shape[1] // H
    P, PV = P3 // 3, PV3 // 3
    HP, HPV = H * P, H * PV
    pq, pv, rows_p, cols_p, rows_vp, cols_vp = _fast_layout(
        H, Dqk, P3, PV3, Dv)
    coef = jnp.asarray(coef, jnp.float32).reshape(H)
    f32 = jnp.float32

    # Fused point projection, component-major across the three sets:
    # columns [c=0: qp | kp | vp][c=1: ...][c=2: ...].
    w_pts = jnp.concatenate(
        [jnp.concatenate([Wqp[:, c * HP:(c + 1) * HP],
                          Wkp[:, c * HP:(c + 1) * HP],
                          Wvp[:, c * HPV:(c + 1) * HPV]], axis=1)
         for c in range(3)], axis=1)

    s_node = _INV_SQRT3 / math.sqrt(Dqk)
    head_of_p = jnp.asarray(cols_p // _DA, jnp.int32)

    def qp_scatter(scales_per_head):
        m = jnp.zeros((H * P3, H * _DA), f32)
        return m.at[rows_p, cols_p].set(scales_per_head[head_of_p])

    def sq_scatter(vals_per_head, col_off):
        m = jnp.zeros((H, H * _DA), f32)
        cols = np.asarray([h * _DA + col_off for h in range(H)])
        return m.at[np.arange(H), cols].set(vals_per_head)

    sq_col, one_col = Dqk + P3, Dqk + P3 + 1
    s_q = jnp.concatenate([
        (Wq.astype(f32) * s_node) @ jnp.asarray(pq),
        qp_scatter(-2.0 * coef),
        sq_scatter(coef, sq_col),
    ], axis=0)
    bias_q = jnp.zeros((H * _DA,), f32).at[
        np.asarray([h * _DA + one_col for h in range(H)])].set(coef)

    s_k = jnp.concatenate([
        Wk.astype(f32) @ jnp.asarray(pq),
        qp_scatter(jnp.ones((H,), f32)),
        sq_scatter(jnp.ones((H,), f32), one_col),   # |kp|^2 in the one slot
    ], axis=0)
    bias_k = jnp.zeros((H * _DA,), f32).at[
        np.asarray([h * _DA + sq_col for h in range(H)])].set(1.0)

    s_v = jnp.concatenate([
        Wv.astype(f32) @ jnp.asarray(pv),
        jnp.zeros((H * PV3, H * _DV), f32).at[rows_vp, cols_vp].set(1.0),
    ], axis=0)

    return {
        'w_pts': w_pts.astype(dtype),
        's_q': s_q.astype(dtype), 's_k': s_k.astype(dtype),
        'bias_q': bias_q.astype(dtype), 'bias_k': bias_k.astype(dtype),
        's_v': s_v.astype(dtype),
        'dims': (H, Dqk, Dv, P, PV),
    }


def fused_ipa_fast(x, R9, t, fast, z, mask, pair_bias, reps: int = 1,
                   interpret: bool = False, fuse_p2n: bool = False):
    """GABlock attention via fast weights: x -> (p2n, node, pts_planar).

    ``R9``: planar rotation (tuple of 9 (N, L) components); ``t``: (N, L, 3);
    ``fast``: dict from :func:`make_fast_weights`; ``pair_bias``: head-major
    per-complex bias from :func:`precompute_pair_bias`.
    ``fuse_p2n``: sampling-only fast path — pair aggregation happens inside
    the attention kernel and the (N, H, L, L) alphas never reach HBM; it has
    no VJP, so training paths must leave it False.
    Returns the same triple as :func:`fused_ipa_from_flat` (points output
    planar (N, L, 3, H*PV) for the caller's global->local rotation).
    """
    N, L = x.shape[:2]
    H, Dqk, Dv, P, PV = fast['dims']
    HP, HPV = H * P, H * PV
    n_tot = 2 * HP + HPV
    ct = x.dtype

    pts = jnp.dot(x, fast['w_pts']).reshape(N, L, 3, n_tot)
    R9c = tuple(r.astype(ct) for r in R9)
    rc = lambda c, d: R9c[3 * c + d][..., None]
    px, py, pz = pts[:, :, 0], pts[:, :, 1], pts[:, :, 2]
    pts_g = jnp.stack(
        [rc(c, 0) * px + rc(c, 1) * py + rc(c, 2) * pz
         + t.astype(ct)[:, :, c:c + 1] for c in range(3)], axis=2)

    qp = pts_g[..., :HP].reshape(N, L, 3 * HP)
    kp = pts_g[..., HP:2 * HP].reshape(N, L, 3 * HP)
    vp_g = pts_g[..., 2 * HP:]                       # (N, L, 3, HPV)

    # Per-head |p|^2 for q/k sides via one pooling GEMM.
    pool = jnp.asarray(_planar_pool_np(H, 3 * P), ct)
    sq_qk = jnp.dot(jnp.stack([qp * qp, kp * kp], axis=2), pool)  # (N,L,2,H)

    qa = jnp.dot(jnp.concatenate([x, qp, sq_qk[:, :, 0]], axis=-1),
                 fast['s_q']) + fast['bias_q']
    ka = jnp.dot(jnp.concatenate([x, kp, sq_qk[:, :, 1]], axis=-1),
                 fast['s_k']) + fast['bias_k']
    vvp = jnp.dot(
        jnp.concatenate([x, vp_g.reshape(N, L, 3 * HPV)], axis=-1),
        fast['s_v'])

    if fuse_p2n:
        out, p2n = _attention_fwd_p2n_call(qa, ka, vvp, pair_bias,
                                           z.astype(ct), interpret, reps)
        p2n = p2n.astype(ct)
    else:
        out, alphas = _fused_attention(interpret, reps, qa, ka, vvp, pair_bias)
        p2n = p2n_aggregate(alphas.astype(ct), z, reps)

    out4 = out.reshape(N, L, H, _DV)
    node = out4[..., :Dv].reshape(N, L, H * Dv)
    # Per-head planar slots -> planar across heads (N, L, 3, H*PV).
    pts_o = (out4[..., Dv:Dv + 3 * PV].reshape(N, L, H, 3, PV)
             .transpose(0, 1, 3, 2, 4).reshape(N, L, 3, HPV))

    rowm = mask.astype(ct)
    p2n = (p2n * rowm[:, :, None, None]).reshape(N, L, -1)
    return p2n, node * rowm[..., None], pts_o * rowm[:, :, None, None]


def precompute_pair_bias(z, pair_w, mask, out_dtype=None):
    """Head-major pair-attention bias for the fused kernel.

    bias[n, h, i, j] = (sum_c z[n,i,j,c] W[c,h]) / sqrt(3)  - 1e5 * ~mask[n,j]

    Constant across diffusion steps — samplers hoist this out of the reverse
    scan (one einsum per layer per *complex*, not per step).
    """
    bias = jnp.einsum('nijc,ch->nhij', z, pair_w) * _INV_SQRT3
    col = (mask.astype(jnp.float32) - 1.0) * _NEG_BIG        # (N, L)
    bias = bias + col[:, None, None, :]
    return bias.astype(out_dtype or z.dtype)


def p2n_aggregate(alphas, z, reps: int = 1):
    """Value-from-pair aggregation sum_j alpha[n,h,i,j] z[n,i,j,c].

    With ``reps`` > 1, ``z`` is per-complex (N // reps leading dim) and the
    trajectory replicas are folded into the matmul M dimension — the MXU
    sees M = reps * H instead of a latency-bound M = H.
    """
    N, H, L, _ = alphas.shape
    if reps == 1:
        return jnp.einsum('nhij,nijc->nihc', alphas, z)
    a = alphas.reshape(N // reps, reps * H, L, L)
    p2n = jnp.einsum('nkij,nijc->nikc', a, z)                # (Nc, L, rH, Cz)
    Cz = z.shape[-1]
    return (p2n.reshape(N // reps, L, reps, H, Cz)
            .transpose(0, 2, 1, 3, 4).reshape(N, L, H, Cz))


def fused_ipa_from_flat(q, k, qp, kp, v, vp, z, pair_w, coef, mask,
                        pair_bias=None, aug_mat=None, reps: int = 1,
                        interpret: bool = False):
    """Flat head-minor inputs -> fused kernel + XLA pair aggregation.

    Args mirror the GABlock projections (all (N, L, H*D) head-minor):
      q/k: scalar queries/keys; qp/kp: global-frame query/key points,
      PLANAR-flat ([x | y | z] blocks, head-major inside each — see
      _augment_layout); v: node values; vp: global-frame value points
      (planar-flat); z: pair features (N, L, L, Cz) — or (N//reps, L, L, Cz)
      when ``reps`` > 1 (trajectory fan-out shares the complex's pair
      tensor); pair_w: (Cz, H) pair-bias projection (unused if ``pair_bias``
      given); coef: (H,) spatial logit coefficients; mask: (N, L)
      valid-residue mask.
      pair_bias: optional precomputed head-major bias from
        :func:`precompute_pair_bias` (per-complex when ``reps`` > 1).
      aug_mat: optional precomputed (2, in, out) matrices from
        :func:`make_augment_mat` (step-constant; hoist out of scans).

    Returns (feat_p2n (N,L,H*Cz), feat_node (N,L,H*Dv), pts (N,L,H*PV3))
    with pts per-head planar: head h slot = [x (PV) | y (PV) | z (PV)].
    """
    N, L = q.shape[:2]
    H = coef.shape[-1]
    Dqk = q.shape[-1] // H
    Dv = v.shape[-1] // H
    PV3 = vp.shape[-1] // H
    ct = q.dtype

    qa, ka = _augment(q, k, qp, kp, coef, H, Dqk, aug_mat=aug_mat)
    if pair_bias is None:
        mask_c = mask[::reps] if reps > 1 else mask
        pair_bias = precompute_pair_bias(z, pair_w, mask_c, out_dtype=ct)

    vvp = jnp.dot(jnp.concatenate([v, vp], axis=-1),
                  jnp.asarray(_value_matrix_np(H, Dv, PV3), ct))

    out, alphas = _fused_attention(interpret, reps, qa, ka, vvp, pair_bias)

    p2n = p2n_aggregate(alphas.astype(ct), z, reps)

    out4 = out.reshape(N, L, H, _DV)
    node = out4[..., :Dv].reshape(N, L, H * Dv)
    pts = out4[..., Dv:Dv + PV3].reshape(N, L, H * PV3)

    # Zero outputs of invalid query rows (reference zeroes alpha rows).
    rowm = mask.astype(ct)
    p2n = (p2n * rowm[:, :, None, None]).reshape(N, L, -1)
    return p2n, node * rowm[..., None], pts * rowm[..., None]


def ipa_attention_reference(q, k, qp, kp, v, vp, z, pair_w, coef, mask):
    """Einsum reference implementation (same math, XLA-scheduled).

    Takes the same layouts as :func:`fused_ipa_from_flat` (planar-flat
    points) and z in natural (N, L, L, Cz) layout, mirroring the GABlock
    einsum path.
    """
    N, L = q.shape[:2]
    H = coef.shape[-1]
    Dqk = q.shape[-1] // H
    reshape_h = lambda x: x.reshape(N, L, H, -1)
    qh, kh, vh = map(reshape_h, (q, k, v))
    # planar-flat (H*P3) -> (3, H, P): component blocks, head-major inside.
    planar = lambda x: x.reshape(N, L, 3, H, -1)
    qph, kph, vph = map(planar, (qp, kp, vp))

    logits = jnp.einsum('nihc,njhc->nijh', qh, kh) / math.sqrt(Dqk)
    bias = jnp.einsum('nijc,ch->nijh', z, pair_w)
    cross = jnp.einsum('nichp,njchp->nijh', qph, kph)
    sq_q = jnp.sum(qph * qph, axis=(2, 4))
    sq_k = jnp.sum(kph * kph, axis=(2, 4))
    d2 = sq_q[:, :, None, :] + sq_k[:, None, :, :] - 2 * cross
    logits = (logits + bias + d2 * coef) * _INV_SQRT3

    mask_b = mask.astype(bool)
    pair_mask = (mask_b[:, :, None] & mask_b[:, None, :])[..., None]
    logits = jnp.where(pair_mask, logits, logits - _NEG_BIG)
    alpha = jax.nn.softmax(logits, axis=2)
    alpha = jnp.where(mask_b[:, :, None, None], alpha, 0.0)

    p2n = jnp.einsum('nijh,nijc->nihc', alpha, z).reshape(N, L, -1)
    node = jnp.einsum('nijh,njhc->nihc', alpha, vh).reshape(N, L, -1)
    # Per-head planar output: head h slot = [x (PV) | y (PV) | z (PV)].
    pts = jnp.einsum('nijh,njchp->nihcp', alpha, vph).reshape(N, L, -1)
    return p2n, node, pts
