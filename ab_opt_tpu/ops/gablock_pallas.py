"""Fully-fused GABlock sampling kernel (Pallas TPU).

One kernel call runs an ENTIRE IPA block (ref AbDock/src/modules/encoders/
ga.py:40-178) for one complex row-block: projections, frame rotations,
augmented-q/k assembly, per-head attention, value + pair aggregation, the
output transform, and the residual LayerNorm/MLP tail — all VMEM-resident.

Motivation (measured on v5e, L=128, 32-replica fan-out): after the v5.4
layout work the denoise step spent ~1.5 ms/step in ~30 modest XLA dots and
~160 pointwise fusions *between* kernels — every intermediate made a round
trip through HBM. Fusing the whole block keeps them on-chip.

This kernel serves the SAMPLING path only (forward, no custom VJP);
training and CPU/parity paths use the composable nn/ipa.py implementations.

Weight bundle per layer (see :func:`build_gablock_weights`):
  wqkvp (F, H*(2*QK+V) + 3*H*(2*P+PV))  fused projection (points planar)
  aug   (2, 685, H*64)                  augmented-q/k scale/permute (Sq, Sk)
  pool  (3*H*P, H)                      planar |p|^2 per-head pooling
  vpack (H*(V+3*PV), H*64)              value + value-point slot packing
  wout  (H*Cz + H*V + 7*H*PV, F), bout  output transform
  ln1/ln2 (2, F)                        LayerNorm scale row 0, bias row 1
  wm1/wm2/wm3 (F, F), bm (3, F)         transition MLP
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .ipa_pallas import (
    _DA,
    _DV,
    _planar_pool_np,
    _value_matrix_np,
    make_augment_mat,
)

_LN_EPS = 1e-10
# Per-head slot width inside this kernel: dynamic lane offsets (the
# fori_loop head index) must be provable multiples of 128 on TPU, so the
# 64-wide augmented/value slots are padded with 64 zero lanes each.
_SLOT = 128


def _widen_slots(m, H, width):
    """Expand packed (in, H*width) columns to 128-lane slots (zero pad)."""
    parts = []
    for h in range(H):
        parts.append(m[:, h * width:(h + 1) * width])
        parts.append(jnp.zeros((m.shape[0], _SLOT - width), m.dtype))
    return jnp.concatenate(parts, axis=1)


def _layernorm(x, scale, bias):
    """flax nn.LayerNorm semantics (f32, eps inside rsqrt)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return y * scale + bias


def _rotate_sections(R, t, pts, n_pts, transpose=False, sub_t=False):
    """Planar rotation of a flat [x | y | z] section block.

    pts: (L, 3*n_pts) with component-major planar layout. R: (L, 9) row-major
    3x3; t: (L, 3). Returns same layout. ``sub_t`` subtracts t before the
    (transposed) rotation (global->local); otherwise adds t after.
    """
    comps = [pts[:, c * n_pts:(c + 1) * n_pts] for c in range(3)]
    if sub_t:
        comps = [comps[c] - t[:, c:c + 1] for c in range(3)]
    out = []
    for c in range(3):
        rc = lambda d: (R[:, d * 3 + c:d * 3 + c + 1] if transpose
                        else R[:, c * 3 + d:c * 3 + d + 1])
        y = rc(0) * comps[0] + rc(1) * comps[1] + rc(2) * comps[2]
        if not sub_t:
            y = y + t[:, c:c + 1]
        out.append(y)
    return jnp.concatenate(out, axis=-1)


def _gablock_kernel(x_ref, R_ref, t_ref, z_ref, bias_ref, mask_ref,
                    wqkvp_ref, aug_ref, pool_ref, vpack_ref,
                    wout_ref, bout_ref, ln1_ref,
                    wm1_ref, wm2_ref, wm3_ref, bm_ref, ln2_ref,
                    out_ref, qa_s, ka_s, vvp_s, heads_s, p2n_s,
                    *, H, QK, V, P, PV, Cz):
    f32 = jnp.float32
    dt = jnp.bfloat16
    L = x_ref.shape[0]
    HP3 = 3 * H * P

    x_in = x_ref[...].astype(f32)                           # (L, F)
    x = x_in.astype(dt)
    proj = jnp.dot(x, wqkvp_ref[...],
                   preferred_element_type=f32).astype(dt)   # (L, 2016)

    o_q, o_k, o_v = 0, H * QK, 2 * H * QK
    o_p = 2 * H * QK + H * V
    q, k, v = proj[:, o_q:o_k], proj[:, o_k:o_v], proj[:, o_v:o_p]
    R = R_ref[...].astype(dt)
    t = t_ref[...].astype(dt)
    qp = _rotate_sections(R, t, proj[:, o_p:o_p + HP3], H * P)
    kp = _rotate_sections(R, t, proj[:, o_p + HP3:o_p + 2 * HP3], H * P)
    vp = _rotate_sections(R, t, proj[:, o_p + 2 * HP3:], H * PV)

    # Augmented q/k: [q | qp | |qp|^2 | 1] @ Sq (and k-side @ Sk).
    pool = pool_ref[...]
    sq_q = jnp.dot(qp * qp, pool, preferred_element_type=f32).astype(dt)
    sq_k = jnp.dot(kp * kp, pool, preferred_element_type=f32).astype(dt)
    one = jnp.ones((L, 1), dt)
    qa_s[...] = jnp.dot(jnp.concatenate([q, qp, sq_q, one], axis=-1),
                        aug_ref[0], preferred_element_type=f32).astype(dt)
    ka_s[...] = jnp.dot(jnp.concatenate([k, kp, sq_k, one], axis=-1),
                        aug_ref[1], preferred_element_type=f32).astype(dt)
    vvp_s[...] = jnp.dot(jnp.concatenate([v, vp], axis=-1), vpack_ref[...],
                         preferred_element_type=f32).astype(dt)  # (L, H*_DV)

    # Head loop as fori_loop over scratch refs: unrolled heads made Mosaic
    # stack-allocate every head's temps simultaneously (~90 MB vs the 16 MB
    # VMEM scope); the dynamic loop keeps ONE buffer per temp.
    CJ = 16 if L % 16 == 0 else 8

    def head_body(h, carry):
        qa_h = qa_s[:, pl.ds(h * _SLOT, _SLOT)]
        ka_h = ka_s[:, pl.ds(h * _SLOT, _SLOT)]
        logits = jax.lax.dot_general(
            qa_h, ka_h, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                     # (L, L)
        logits = logits + bias_ref[h].astype(f32)
        alpha = jax.nn.softmax(logits, axis=-1)
        heads_s[:, pl.ds(h * _SLOT, _SLOT)] = jnp.dot(
            alpha.astype(dt), vvp_s[:, pl.ds(h * _SLOT, _SLOT)],
            preferred_element_type=f32).astype(dt)
        # Pair aggregation sum_j alpha[i,j] z[i,j,:]: per-row weights make
        # this a broadcast-multiply + j-reduction, not a matmul; chunked
        # over j to bound the (L, CJ, Cz) f32 temp (f32 because Mosaic only
        # supports non-trivial minor-dim broadcasts on 32-bit types).
        acc = jnp.zeros((L, Cz), f32)
        for jc in range(L // CJ):
            a_c = alpha[:, jc * CJ:(jc + 1) * CJ]
            z_c = z_ref[:, jc * CJ:(jc + 1) * CJ, :].astype(f32)
            acc = acc + jnp.sum(a_c[:, :, None] * z_c, axis=1)
        p2n_s[:, pl.ds(h * _SLOT, _SLOT)] = jnp.concatenate(
            [acc.astype(dt), jnp.zeros((L, _SLOT - Cz), dt)], axis=-1)
        return carry

    jax.lax.fori_loop(0, H, head_body, 0)

    p2n = jnp.concatenate(
        [p2n_s[:, h * _SLOT:h * _SLOT + Cz] for h in range(H)], axis=-1)
    outs = [heads_s[:, h * _SLOT:(h + 1) * _SLOT] for h in range(H)]
    node = jnp.concatenate([o[:, :V] for o in outs], axis=-1)   # (L, H*V)
    # Per-head planar point slots -> planar across heads ([x | y | z]).
    pts_g = jnp.concatenate(
        [jnp.concatenate([o[:, V + c * PV:V + (c + 1) * PV] for o in outs],
                         axis=-1) for c in range(3)], axis=-1)  # (L, 3*H*PV)
    fp = _rotate_sections(R, t, pts_g, H * PV, transpose=True,
                          sub_t=True).astype(f32)           # (L, 3*H*PV)
    HPV = H * PV
    sumsq = (jnp.square(fp[:, :HPV]) + jnp.square(fp[:, HPV:2 * HPV])
             + jnp.square(fp[:, 2 * HPV:]))
    dist = jnp.sqrt(sumsq + 1e-12)
    # normalize_vector(eps=1e-4) semantics: n = sqrt(ss + eps^2); v/(n+eps).
    inv = 1.0 / (jnp.sqrt(sumsq + 1e-8) + 1e-4)
    direction = fp * jnp.concatenate([inv, inv, inv], axis=-1)

    feat_all = jnp.concatenate(
        [p2n, node, fp.astype(dt), dist.astype(dt), direction.astype(dt)],
        axis=-1)                                            # (L, 1824)
    y = jnp.dot(feat_all, wout_ref[...],
                preferred_element_type=f32) + bout_ref[...].astype(f32)
    y = y * mask_ref[...].astype(f32)                       # (L, 1) column

    x1 = _layernorm(x_in + y, ln1_ref[0].astype(f32), ln1_ref[1].astype(f32))
    h1 = jax.nn.relu(jnp.dot(x1.astype(dt), wm1_ref[...],
                             preferred_element_type=f32)
                     + bm_ref[0].astype(f32))
    h2 = jax.nn.relu(jnp.dot(h1.astype(dt), wm2_ref[...],
                             preferred_element_type=f32)
                     + bm_ref[1].astype(f32))
    h3 = (jnp.dot(h2.astype(dt), wm3_ref[...], preferred_element_type=f32)
          + bm_ref[2].astype(f32))
    out_ref[...] = _layernorm(x1 + h3, ln2_ref[0].astype(f32),
                              ln2_ref[1].astype(f32)).astype(out_ref.dtype)


def build_gablock_weights(bp, dtype=jnp.bfloat16):
    """Per-layer weight bundle for the fused kernel from a GABlock param
    subtree (``params['params'][...]['encoder']['block_i']``)."""
    g = lambda name: bp[name]['kernel'].astype(dtype)
    wqkvp = jnp.concatenate(
        [g('proj_query'), g('proj_key'), g('proj_value'),
         g('proj_query_point'), g('proj_key_point'), g('proj_value_point')],
        axis=1)
    raw = bp['spatial_coef'].reshape(-1)
    H = raw.shape[0]
    QK = bp['proj_query']['kernel'].shape[-1] // H
    V = bp['proj_value']['kernel'].shape[-1] // H
    P3 = bp['proj_query_point']['kernel'].shape[-1] // H
    PV3 = bp['proj_value_point']['kernel'].shape[-1] // H
    gamma = jax.nn.softplus(raw.astype(jnp.float32))
    coef = -gamma * math.sqrt(2.0 / (3.0 * P3)) / 2.0
    ln = lambda name: jnp.stack([bp[name]['scale'], bp[name]['bias']])
    mlp = lambda i: bp[f'Dense_{i}']
    aug = make_augment_mat(coef, H, QK, P3, dtype)
    return {
        'wqkvp': wqkvp,
        'aug': jnp.stack([_widen_slots(aug[0], H, _DA),
                          _widen_slots(aug[1], H, _DA)]),
        'pool': jnp.asarray(_planar_pool_np(H, P3), dtype),
        'vpack': _widen_slots(
            jnp.asarray(_value_matrix_np(H, V, PV3), dtype), H, _DV),
        'wout': bp['out_transform']['kernel'].astype(dtype),
        'bout': bp['out_transform']['bias'].astype(jnp.float32),
        'ln1': ln('LayerNorm_0').astype(jnp.float32),
        'wm1': mlp(0)['kernel'].astype(dtype),
        'wm2': mlp(1)['kernel'].astype(dtype),
        'wm3': mlp(2)['kernel'].astype(dtype),
        'bm': jnp.stack([mlp(i)['bias'] for i in range(3)]
                        ).astype(jnp.float32),
        'ln2': ln('LayerNorm_1').astype(jnp.float32),
        'dims': (H, QK, V, P3 // 3, PV3 // 3),
    }


def fused_gablock_layer(x, R9, t, z, bias, mask, wb, reps: int = 1,
                        interpret: bool = False):
    """One fused IPA block: x (N, L, F) f32 -> updated x (N, L, F) f32.

    z (Nc, L, L, Cz) and bias (Nc, H, L, L) are per-complex (Nc = N // reps)
    under trajectory fan-out; replicas index their complex's block.
    """
    N, L, F = x.shape
    mask = mask.reshape(N, L, 1)            # column vector per row-block
    H, QK, V, P, PV = wb['dims']
    Cz = z.shape[-1]

    grid = (N,)
    row = lambda d, dep=True: pl.BlockSpec(
        (None, L, d), (lambda n: (n, 0, 0)) if dep else (lambda n: (0, 0, 0)))
    const = lambda shape: pl.BlockSpec(shape, lambda n: (0,) * len(shape))
    z_spec = pl.BlockSpec((None, L, L, Cz), lambda n: (n // reps, 0, 0, 0))
    b_spec = pl.BlockSpec((None, H, L, L), lambda n: (n // reps, 0, 0, 0))
    m_spec = pl.BlockSpec((None, L, 1), lambda n: (n, 0, 0))

    from jax.experimental.pallas import tpu as pltpu
    kernel = functools.partial(_gablock_kernel, H=H, QK=QK, V=V, P=P, PV=PV,
                               Cz=Cz)
    scratch = [
        pltpu.VMEM((L, H * _SLOT), jnp.bfloat16),   # qa
        pltpu.VMEM((L, H * _SLOT), jnp.bfloat16),   # ka
        pltpu.VMEM((L, H * _SLOT), jnp.bfloat16),   # vvp
        pltpu.VMEM((L, H * _SLOT), jnp.bfloat16),   # per-head out slots
        pltpu.VMEM((L, H * _SLOT), jnp.bfloat16),   # p2n
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row(F), row(9), row(3), z_spec, b_spec, m_spec,
            const(wb['wqkvp'].shape), const(wb['aug'].shape),
            const(wb['pool'].shape), const(wb['vpack'].shape),
            const(wb['wout'].shape), const(wb['bout'].shape),
            const(wb['ln1'].shape), const(wb['wm1'].shape),
            const(wb['wm2'].shape), const(wb['wm3'].shape),
            const(wb['bm'].shape), const(wb['ln2'].shape),
        ],
        out_specs=row(F),
        out_shape=jax.ShapeDtypeStruct((N, L, F), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, R9, t, z, bias, mask,
      wb['wqkvp'], wb['aug'], wb['pool'], wb['vpack'],
      wb['wout'], wb['bout'], wb['ln1'], wb['wm1'], wb['wm2'], wb['wm3'],
      wb['bm'], wb['ln2'])


def build_encoder_weights(enc_params, num_layers: int, dtype=jnp.bfloat16):
    """Weight bundles for every block — constant across diffusion steps, so
    samplers build them once outside the reverse scan."""
    return [build_gablock_weights(enc_params[f'block_{i}'], dtype)
            for i in range(num_layers)]


def fused_encoder_apply(weight_bundles, R, t, x, z, biases, mask,
                        reps: int = 1, interpret: bool = False):
    """Run the whole GAEncoder stack through the fused per-layer kernel.

    Signature mirrors GAEncoder.__call__: R (N, L, 3, 3); t (N, L, 3);
    x (N, L, F) node features; z per-complex pair features; ``biases`` the
    per-layer head-major pair biases from precompute_encoder_pair_biases.
    """
    N, L = x.shape[:2]
    if isinstance(R, (tuple, list)):               # planar rotation tuple
        R9 = jnp.stack(R, axis=-1).astype(jnp.float32)
    else:
        R9 = R.reshape(N, L, 9).astype(jnp.float32)
    t = t.astype(jnp.float32)
    x = x.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    z = z.astype(jnp.bfloat16)
    for i, wb in enumerate(weight_bundles):
        x = fused_gablock_layer(x, R9, t, z, biases[i].astype(jnp.bfloat16),
                                mask_f, wb, reps=reps, interpret=interpret)
    return x
