"""Frame-based invariant point attention encoder (GAEncoder).

TPU-native rewrite of ``AbDock/src/modules/encoders/ga.py``. Every pairwise
interaction is expressed as a batched einsum so XLA can tile the O(L^2)
attention onto the MXU:

* node logits:   q.k contraction over head channels;
* spatial logits: squared distances of frame-projected points expanded as
  |q|^2 + |k|^2 - 2<q,k> (the cross term is a matmul) instead of the
  reference's (N, L, L, H, P*3) broadcast-subtract;
* aggregation:   alpha-weighted contractions over the j axis.

A fused Pallas kernel (ab_opt_tpu.ops.ipa_pallas) replaces the attention
inner loop on TPU — with a custom VJP, so training runs fused as well; the
einsum path is the reference semantics and the CPU/GPU fallback.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

import jax

from ..geometry import normalize_vector
from ..ops.ipa_pallas import (fused_ipa_fast, make_fast_weights,
                              precompute_pair_bias)


def as_planar_rotation(R):
    """Rotation input -> tuple of 9 (N, L) components (row-major).

    Accepts either the planar tuple (passed through) or a dense
    (N, L, 3, 3) matrix. The dense path extracts components with strided
    slices, which is expensive on TPU (0.17 ms/step at production shapes) —
    hot paths should produce planar rotations directly
    (``geometry.so3vec_to_rotation_planar``).
    """
    if isinstance(R, (tuple, list)):
        return tuple(R)
    return tuple(R[:, :, c, d] for c in range(3) for d in range(3))


def _rotate_planar(R9, pts, transpose=False):
    """Apply R (or R^T) to planar points (N, L, 3, n) as 9 broadcast FMAs.

    ``R9``: tuple of 9 (N, L) rotation components, row-major. Written out
    explicitly — an einsum here lowers to a batched K=3 dot_general (4096
    tiny matmuls; measured 0.045 ms per call at L=128), while this form
    fuses into one elementwise pass over the point planes.
    """
    rc = lambda c, d: (R9[3 * d + c] if transpose
                       else R9[3 * c + d])[..., None]
    px, py, pz = pts[:, :, 0], pts[:, :, 1], pts[:, :, 2]
    return jnp.stack(
        [rc(c, 0) * px + rc(c, 1) * py + rc(c, 2) * pz for c in range(3)],
        axis=2)


def _local_to_global_planar(R9, t, pts, dtype):
    """R p + t on planar points (N, L, 3, n)."""
    R9 = tuple(r.astype(dtype) for r in R9)
    return _rotate_planar(R9, pts) + t.astype(dtype)[..., None]


def _global_to_local_planar(R9, t, pts, dtype):
    """R^T (p - t) on planar points (N, L, 3, n)."""
    R9 = tuple(r.astype(dtype) for r in R9)
    return _rotate_planar(R9, pts - t.astype(dtype)[..., None],
                          transpose=True)


def _masked_softmax(logits, mask, axis, inf=1e5):
    """Softmax over ``axis`` with masked-out logits shifted by -inf; rows whose
    own residue is masked produce all-zero weights (ref ga.py:11-26)."""
    mask_row = mask[:, :, None, None]                  # (N, L, 1, 1)
    mask_pair = mask_row & mask[:, None, :, None]      # (N, L, L, 1)
    logits = jnp.where(mask_pair, logits, logits - inf)
    alpha = nn.softmax(logits, axis=axis)
    return jnp.where(mask_row, alpha, 0.0)


class GABlock(nn.Module):
    node_feat_dim: int
    pair_feat_dim: int
    value_dim: int = 32
    query_key_dim: int = 32
    num_query_points: int = 8
    num_value_points: int = 8
    num_heads: int = 12
    bias: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, R, t, x, z, mask, pair_bias=None, fast_w=None,
                 use_pallas=None, reps: int = 1, fuse_p2n: bool = False):
        """
        Args:
          R: frame bases — planar tuple of 9 (N, L) components (hot path)
            or a dense (N, L, 3, 3) matrix; t: (N, L, 3) frame origins;
          x: (N, L, F) node feats; z: pair feats — (N, L, L, C), or
            (N // reps, L, L, C) when ``reps`` > 1 (trajectory fan-out: the
            replicas of one complex share its pair tensor; see
            DiffAb.sample(num_replicas)); mask: (N, L);
          pair_bias: optional precomputed pair-attention bias — constant
            across diffusion steps, so samplers hoist it out of the reverse
            scan. Layout: (N, L, L, H) raw for the einsum path; head-major
            per-complex (N//reps, H, L, L), pre-scaled by 1/sqrt(3) with the
            column mask folded in (ops.ipa_pallas.precompute_pair_bias), for
            the pallas path.
          fast_w: optional precomputed fast-weight dict for the pallas path
            (ops.ipa_pallas.make_fast_weights) — parameter-only, so samplers
            hoist it out of the reverse scan.
        Returns: updated node feats (N, L, F).
        """
        use_pallas = self.use_pallas if use_pallas is None else use_pallas
        R = as_planar_rotation(R)
        N, L = x.shape[:2]
        H, QK, V = self.num_heads, self.query_key_dim, self.value_dim
        P, PV = self.num_query_points, self.num_value_points
        dense = lambda f, name: nn.Dense(f, use_bias=self.bias, name=name,
                                         dtype=self.dtype)
        # Declared here (used by every path); point-projection kernels are
        # stored PLANAR ([x | y | z] column blocks, head-major inside);
        # utils/torch_convert.py permutes reference checkpoints to match.
        proj_q = dense(H * QK, 'proj_query')
        proj_k = dense(H * QK, 'proj_key')
        proj_v = dense(H * V, 'proj_value')
        proj_qp = dense(H * P * 3, 'proj_query_point')
        proj_kp = dense(H * P * 3, 'proj_key_point')
        proj_vp = dense(H * PV * 3, 'proj_value_point')

        gamma_raw = self.param(
            'spatial_coef',
            nn.initializers.constant(math.log(math.exp(1.0) - 1.0)), (1, 1, 1, H))
        gamma = nn.softplus(gamma_raw.astype(jnp.float32))
        spatial_coef = (-gamma * math.sqrt(2.0 / (9.0 * P)) / 2.0)

        bias_dense = nn.Dense(H, use_bias=self.bias, name='proj_pair_bias',
                              dtype=self.dtype)

        if use_pallas:
            # Fused kernel path: one folded GEMM per attention operand
            # (ops.ipa_pallas.make_fast_weights), logits+softmax+aggregation
            # in VMEM, pair aggregation via XLA einsum.
            assert not self.bias, 'pallas IPA path assumes bias-free projections'
            if pair_bias is None:
                pair_w = bias_dense(jnp.eye(z.shape[-1], dtype=self.dtype))
                mask_c = mask[::reps] if reps > 1 else mask
                pair_bias = precompute_pair_bias(z, pair_w, mask_c,
                                                 out_dtype=self.dtype)
            if fast_w is None:
                eye = jnp.eye(self.node_feat_dim, dtype=self.dtype)
                fast_w = make_fast_weights(
                    proj_q(eye), proj_k(eye), proj_v(eye), proj_qp(eye),
                    proj_kp(eye), proj_vp(eye),
                    (spatial_coef * math.sqrt(1.0 / 3.0)).reshape(H),
                    self.dtype)
            interp = jax.default_backend() != 'tpu'
            feat_p2n, feat_node, aggr = fused_ipa_fast(
                x.astype(self.dtype), R, t, fast_w, z,
                mask.astype(jnp.float32), pair_bias, reps=reps,
                interpret=interp, fuse_p2n=fuse_p2n)
            feat_points = _global_to_local_planar(R, t, aggr, self.dtype)
        else:
            # Einsum paths (reference semantics; CPU/GPU fallback).
            # Point tensors are PLANAR: (N, L, 3, n_points) with the xyz
            # component as a short leading axis and points in the lane
            # dimension — one rotation moves all three point sets to the
            # global frame (they share R/t).
            q = proj_q(x)
            k = proj_k(x)
            v = proj_v(x)
            pts = jnp.concatenate(
                [a.reshape(N, L, 3, -1)
                 for a in (proj_qp(x), proj_kp(x), proj_vp(x))], axis=-1)
            pts = _local_to_global_planar(R, t, pts, self.dtype)
            HP = H * P
            qp = pts[..., :HP].reshape(N, L, H * P * 3)      # planar-flat
            kp = pts[..., HP:2 * HP].reshape(N, L, H * P * 3)
            vp_g = pts[..., 2 * HP:]                         # (N, L, 3, H*PV)
            feat_p2n, feat_node, feat_points = self._einsum_attention(
                q, k, v, qp, kp, vp_g, z, pair_bias, bias_dense,
                spatial_coef, R, t, mask, reps, N, L, H, QK, V, P, PV)
        # feat_points: planar (N, L, 3, H*PV).
        # Grad-safe norm: aggregated points are exactly zero on padded rows.
        feat_distance = jnp.sqrt(
            jnp.sum(feat_points * feat_points, axis=2) + 1e-12)  # (N,L,H*PV)
        feat_direction = normalize_vector(feat_points, axis=2, eps=1e-4)
        feat_spatial = jnp.concatenate([
            feat_points.reshape(N, L, -1),
            feat_distance,
            feat_direction.reshape(N, L, -1),
        ], axis=-1)

        # --- Output transform + residual MLP ---------------------------------
        feat_all = nn.Dense(self.node_feat_dim, name='out_transform',
                            dtype=self.dtype)(
            jnp.concatenate([feat_p2n, feat_node, feat_spatial], axis=-1))
        feat_all = jnp.where(mask[..., None].astype(bool), feat_all, 0.0)
        x = nn.LayerNorm(epsilon=1e-10, dtype=jnp.float32)(x + feat_all)
        mlp = nn.Sequential([
            nn.Dense(self.node_feat_dim, dtype=self.dtype), nn.relu,
            nn.Dense(self.node_feat_dim, dtype=self.dtype), nn.relu,
            nn.Dense(self.node_feat_dim, dtype=self.dtype),
        ])
        x = nn.LayerNorm(epsilon=1e-10, dtype=jnp.float32)(x + mlp(x))
        return x

    def _einsum_attention(self, q, k, v, qp, kp, vp_g, z, pair_bias,
                          bias_dense, spatial_coef, R, t, mask, reps,
                          N, L, H, QK, V, P, PV):
        """XLA einsum attention (reference semantics, ga.py:161-178).

        With ``reps`` > 1 the per-complex pair tensor is shared by folding
        the replica axis next to the batch axis and broadcasting z terms.
        """
        q = q.reshape(N, L, H, QK)
        k = k.reshape(N, L, H, QK)
        v = v.reshape(N, L, H, V)
        qp_h = qp.reshape(N, L, 3, H, P)                # planar
        kp_h = kp.reshape(N, L, 3, H, P)

        logits_node = jnp.einsum('nihc,njhc->nijh', q, k) / math.sqrt(QK)
        if pair_bias is None:
            pair_bias = bias_dense(z)                  # ((N or Nc), L, L, H)

        sq_q = jnp.sum(qp_h * qp_h, axis=(2, 4))       # (N, L, H)
        sq_k = jnp.sum(kp_h * kp_h, axis=(2, 4))
        cross = jnp.einsum('nichp,njchp->nijh', qp_h, kp_h)
        sum_sq_dist = (sq_q[:, :, None, :] + sq_k[:, None, :, :]
                       - 2.0 * cross)
        logits_spatial = sum_sq_dist * spatial_coef.astype(sum_sq_dist.dtype)

        if reps > 1:
            Nc = N // reps
            r5 = lambda a: a.reshape(Nc, reps, L, L, H)
            logits_sum = ((r5(logits_node) + pair_bias[:, None]
                           + r5(logits_spatial)) * math.sqrt(1 / 3)
                          ).reshape(N, L, L, H)
        else:
            logits_sum = ((logits_node + pair_bias + logits_spatial)
                          * math.sqrt(1 / 3))
        # Softmax in f32 for stability, weights back in compute dtype.
        alpha = _masked_softmax(logits_sum.astype(jnp.float32),
                                mask.astype(bool), axis=2)  # (N, L, L, H)
        alpha = alpha.astype(self.dtype)

        if reps > 1:
            Nc = N // reps
            feat_p2n = jnp.einsum('nrijh,nijc->nrihc',
                                  alpha.reshape(Nc, reps, L, L, H),
                                  z).reshape(N, L, -1)
        else:
            feat_p2n = jnp.einsum('nijh,nijc->nihc', alpha, z).reshape(N, L, -1)
        feat_node = jnp.einsum('nijh,njhc->nihc', alpha, v).reshape(N, L, -1)
        aggr = jnp.einsum('nijh,njchp->nichp', alpha,
                          vp_g.reshape(N, L, 3, H, PV)
                          ).reshape(N, L, 3, H * PV)
        feat_points = _global_to_local_planar(R, t, aggr, self.dtype)
        return feat_p2n, feat_node, feat_points


def precompute_encoder_pair_biases(encoder_params, z, mask, num_layers: int,
                                   dtype=None):
    """Hoist every GABlock's pair-attention bias out of a sampling scan.

    The pair features ``z`` are constant across diffusion steps, so the
    per-layer bias projections (the only step-invariant part of the attention
    logits) are computed once per complex here, head-major and pre-scaled for
    the fused pallas kernel.

    Args:
      encoder_params: the GAEncoder param subtree
        (``params['params'][...]['encoder']``).
      z: (N, L, L, C) pair features; mask: (N, L).
    Returns: (num_layers, N, H, L, L) stacked biases.
    """
    biases = []
    for i in range(num_layers):
        w = encoder_params[f'block_{i}']['proj_pair_bias']['kernel']
        biases.append(precompute_pair_bias(z, w.astype(z.dtype), mask,
                                           out_dtype=dtype or z.dtype))
    return jnp.stack(biases)


def precompute_encoder_fast_weights(encoder_params, num_layers: int,
                                    dtype=None):
    """Hoist every GABlock's fast-weight bundle out of a sampling scan.

    The bundles (ops.ipa_pallas.make_fast_weights) depend only on layer
    parameters, so they are constant across diffusion steps.

    Returns: list of ``num_layers`` fast-weight dicts.
    """
    bundles = []
    for i in range(num_layers):
        blk = encoder_params[f'block_{i}']
        raw = blk['spatial_coef'].reshape(-1)
        H = raw.shape[0]
        P3 = blk['proj_query_point']['kernel'].shape[-1] // H
        gamma = jax.nn.softplus(raw.astype(jnp.float32))
        coef = -gamma * math.sqrt(2.0 / (3.0 * P3)) / 2.0
        g = lambda name: blk[name]['kernel']
        bundles.append(make_fast_weights(
            g('proj_query'), g('proj_key'), g('proj_value'),
            g('proj_query_point'), g('proj_key_point'), g('proj_value_point'),
            coef * math.sqrt(1.0 / 3.0), dtype or jnp.float32))
    return bundles


class GAEncoder(nn.Module):
    """Stack of GABlocks (ref ga.py:181-193).

    ``pair_biases``: optional precomputed per-block pair-attention biases,
    stacked on a leading layer axis — hoisted out of the sampling scan (see
    :func:`precompute_encoder_pair_biases` for the pallas layout).
    """

    node_feat_dim: int
    pair_feat_dim: int
    num_layers: int
    ga_block_opt: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, R, t, res_feat, pair_feat, mask, pair_biases=None,
                 fast_weights=None, use_pallas=None, reps: int = 1,
                 fuse_p2n: bool = False):
        use_pallas = self.use_pallas if use_pallas is None else use_pallas
        R = as_planar_rotation(R)      # convert (if dense) once, not per block
        opt = dict(self.ga_block_opt or {})
        for i in range(self.num_layers):
            bias_i = None if pair_biases is None else pair_biases[i]
            fast_i = None if fast_weights is None else fast_weights[i]
            res_feat = GABlock(self.node_feat_dim, self.pair_feat_dim,
                               dtype=self.dtype, name=f'block_{i}',
                               use_pallas=self.use_pallas, **opt)(
                R, t, res_feat, pair_feat, mask, pair_bias=bias_i,
                fast_w=fast_i, use_pallas=use_pallas, reps=reps,
                fuse_p2n=fuse_p2n)
        return res_feat
