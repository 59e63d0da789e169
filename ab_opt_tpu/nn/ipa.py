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
from ..ops.ipa_pallas import fused_ipa_from_flat, precompute_pair_bias


def _rotate_planar(R, pts, transpose=False):
    """Apply R (or R^T) to planar points (N, L, 3, n) as 9 broadcast FMAs.

    Written out explicitly — an einsum here lowers to a batched K=3
    dot_general (4096 tiny matmuls; measured 0.045 ms per call at L=128),
    while this form fuses into one elementwise pass over the point planes.
    """
    rc = lambda c, d: (R[:, :, d, c] if transpose
                       else R[:, :, c, d])[..., None]
    px, py, pz = pts[:, :, 0], pts[:, :, 1], pts[:, :, 2]
    return jnp.stack(
        [rc(c, 0) * px + rc(c, 1) * py + rc(c, 2) * pz for c in range(3)],
        axis=2)


def _local_to_global_planar(R, t, pts, dtype):
    """R p + t on planar points (N, L, 3, n)."""
    return (_rotate_planar(R.astype(dtype), pts)
            + t.astype(dtype)[..., None])


def _global_to_local_planar(R, t, pts, dtype):
    """R^T (p - t) on planar points (N, L, 3, n)."""
    return _rotate_planar(R.astype(dtype), pts - t.astype(dtype)[..., None],
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
    def __call__(self, R, t, x, z, mask, pair_bias=None, aug_mat=None,
                 use_pallas=None, reps: int = 1):
        """
        Args:
          R: (N, L, 3, 3) frame bases; t: (N, L, 3) frame origins;
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
        Returns: updated node feats (N, L, F).
        """
        use_pallas = self.use_pallas if use_pallas is None else use_pallas
        N, L = x.shape[:2]
        H, QK, V = self.num_heads, self.query_key_dim, self.value_dim
        P, PV = self.num_query_points, self.num_value_points
        dense = lambda f, name: nn.Dense(f, use_bias=self.bias, name=name,
                                         dtype=self.dtype)

        # --- Projections -----------------------------------------------------
        # Point tensors are PLANAR throughout: (N, L, 3, n_points) with the
        # xyz component as a short leading axis and points in the lane
        # dimension. The (n_points, 3) interleaved layout's 3-wide minor dim
        # measured ~3x slower (rotations become 9 wide FMAs here, and no
        # padded relayouts appear downstream). Point-projection kernels are
        # stored planar too ([x | y | z] column blocks, head-major inside);
        # utils/torch_convert.py permutes reference checkpoints to match.
        q = dense(H * QK, 'proj_query')(x)
        k = dense(H * QK, 'proj_key')(x)
        v = dense(H * V, 'proj_value')(x)
        qp_l = dense(H * P * 3, 'proj_query_point')(x)
        kp_l = dense(H * P * 3, 'proj_key_point')(x)
        vp_l = dense(H * PV * 3, 'proj_value_point')(x)
        # One rotation moves all three point sets to the global frame (they
        # share R/t): y[c] = sum_d R[c,d] p[d] + t[c], planar over points.
        pts = jnp.concatenate(
            [a.reshape(N, L, 3, -1) for a in (qp_l, kp_l, vp_l)], axis=-1)
        pts = _local_to_global_planar(R, t, pts, self.dtype)
        HP = H * P
        qp = pts[..., :HP].reshape(N, L, H * P * 3)          # planar-flat
        kp = pts[..., HP:2 * HP].reshape(N, L, H * P * 3)
        vp_g = pts[..., 2 * HP:]                             # (N, L, 3, H*PV)

        gamma_raw = self.param(
            'spatial_coef',
            nn.initializers.constant(math.log(math.exp(1.0) - 1.0)), (1, 1, 1, H))
        gamma = nn.softplus(gamma_raw.astype(jnp.float32))
        spatial_coef = (-gamma * math.sqrt(2.0 / (9.0 * P)) / 2.0)

        bias_dense = nn.Dense(H, use_bias=self.bias, name='proj_pair_bias',
                              dtype=self.dtype)

        if use_pallas:
            # Fused kernel path: logits+softmax+aggregation in VMEM
            # (ab_opt_tpu/ops/ipa_pallas.py); pair bias precomputed here (or
            # hoisted by the sampler), pair aggregation via XLA einsum.
            assert not self.bias, 'pallas IPA path assumes bias-free projections'
            if pair_bias is None:
                pair_w = bias_dense(jnp.eye(z.shape[-1], dtype=self.dtype))
                mask_c = mask[::reps] if reps > 1 else mask
                pair_bias = precompute_pair_bias(z, pair_w, mask_c,
                                                 out_dtype=self.dtype)
            interp = jax.default_backend() != 'tpu'
            feat_p2n, feat_node, pts_o = fused_ipa_from_flat(
                q, k, qp, kp, v, vp_g.reshape(N, L, H * PV * 3), z,
                None, spatial_coef.reshape(H), mask.astype(jnp.float32),
                pair_bias=pair_bias, aug_mat=aug_mat, reps=reps,
                interpret=interp)
            # Kernel pts are per-head planar -> planar across heads.
            aggr = (pts_o.reshape(N, L, H, 3, PV).transpose(0, 1, 3, 2, 4)
                    .reshape(N, L, 3, H * PV))
            feat_points = _global_to_local_planar(R, t, aggr, self.dtype)
        elif reps > 1:
            # Einsum path with a shared per-complex pair tensor: fold the
            # replica axis next to the batch axis and broadcast z terms.
            q = q.reshape(N, L, H, QK)
            k = k.reshape(N, L, H, QK)
            v = v.reshape(N, L, H, V)
            qp_h = qp.reshape(N, L, 3, H, P)                # planar
            kp_h = kp.reshape(N, L, 3, H, P)

            logits_node = jnp.einsum('nihc,njhc->nijh', q, k) / math.sqrt(QK)
            if pair_bias is None:
                pair_bias = bias_dense(z)                  # (Nc, L, L, H)
            sq_q = jnp.sum(qp_h * qp_h, axis=(2, 4))
            sq_k = jnp.sum(kp_h * kp_h, axis=(2, 4))
            cross = jnp.einsum('nichp,njchp->nijh', qp_h, kp_h)
            sum_sq_dist = (sq_q[:, :, None, :] + sq_k[:, None, :, :]
                           - 2.0 * cross)
            logits_spatial = sum_sq_dist * spatial_coef.astype(sum_sq_dist.dtype)

            Nc = N // reps
            r5 = lambda a: a.reshape(Nc, reps, L, L, H)
            logits_sum = ((r5(logits_node) + pair_bias[:, None]
                           + r5(logits_spatial)) * math.sqrt(1 / 3))
            alpha = _masked_softmax(
                logits_sum.reshape(N, L, L, H).astype(jnp.float32),
                mask.astype(bool), axis=2)
            alpha = alpha.astype(self.dtype)

            feat_p2n = jnp.einsum('nrijh,nijc->nrihc',
                                  alpha.reshape(Nc, reps, L, L, H),
                                  z).reshape(N, L, -1)
            feat_node = jnp.einsum('nijh,njhc->nihc', alpha, v).reshape(N, L, -1)
            aggr = jnp.einsum('nijh,njchp->nichp', alpha,
                              vp_g.reshape(N, L, 3, H, PV)
                              ).reshape(N, L, 3, H * PV)
            feat_points = _global_to_local_planar(R, t, aggr, self.dtype)
        else:
            q = q.reshape(N, L, H, QK)
            k = k.reshape(N, L, H, QK)
            v = v.reshape(N, L, H, V)
            qp_h = qp.reshape(N, L, 3, H, P)                # planar
            kp_h = kp.reshape(N, L, 3, H, P)

            logits_node = jnp.einsum('nihc,njhc->nijh', q, k) / math.sqrt(QK)
            if pair_bias is None:
                pair_bias = bias_dense(z)                  # (N, L, L, H)
            logits_pair = pair_bias

            sq_q = jnp.sum(qp_h * qp_h, axis=(2, 4))       # (N, L, H)
            sq_k = jnp.sum(kp_h * kp_h, axis=(2, 4))
            cross = jnp.einsum('nichp,njchp->nijh', qp_h, kp_h)
            sum_sq_dist = (sq_q[:, :, None, :] + sq_k[:, None, :, :]
                           - 2.0 * cross)
            logits_spatial = sum_sq_dist * spatial_coef.astype(sum_sq_dist.dtype)

            logits_sum = ((logits_node + logits_pair + logits_spatial)
                          * math.sqrt(1 / 3))
            # Softmax in f32 for stability, weights back in compute dtype.
            alpha = _masked_softmax(logits_sum.astype(jnp.float32),
                                    mask.astype(bool), axis=2)  # (N, L, L, H)
            alpha = alpha.astype(self.dtype)

            feat_p2n = jnp.einsum('nijh,nijc->nihc', alpha, z).reshape(N, L, -1)
            feat_node = jnp.einsum('nijh,njhc->nihc', alpha, v).reshape(N, L, -1)
            aggr = jnp.einsum('nijh,njchp->nichp', alpha,
                              vp_g.reshape(N, L, 3, H, PV)
                              ).reshape(N, L, 3, H * PV)
            feat_points = _global_to_local_planar(R, t, aggr, self.dtype)
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


def precompute_encoder_aug_mats(encoder_params, num_layers: int, dtype=None):
    """Hoist every GABlock's augment scale/permute matrix out of a scan.

    The matrix depends only on the block's spatial-coefficient parameter
    (see ops.ipa_pallas.make_augment_mat), so it is constant across
    diffusion steps. Shapes are derived from the block's projection kernels.

    Returns: (num_layers, 2*in_dim, 2*H*64) stacked matrices.
    """
    from ..ops.ipa_pallas import make_augment_mat

    mats = []
    for i in range(num_layers):
        blk = encoder_params[f'block_{i}']
        raw = blk['spatial_coef'].reshape(-1)
        H = raw.shape[0]
        Dqk = blk['proj_query']['kernel'].shape[-1] // H
        P3 = blk['proj_query_point']['kernel'].shape[-1] // H
        gamma = jax.nn.softplus(raw.astype(jnp.float32))
        coef = -gamma * math.sqrt(2.0 / (3.0 * P3)) / 2.0
        mats.append(make_augment_mat(coef, H, Dqk, P3,
                                     dtype or jnp.float32))
    return jnp.stack(mats)


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
                 aug_mats=None, use_pallas=None, reps: int = 1):
        use_pallas = self.use_pallas if use_pallas is None else use_pallas
        opt = dict(self.ga_block_opt or {})
        for i in range(self.num_layers):
            bias_i = None if pair_biases is None else pair_biases[i]
            aug_i = None if aug_mats is None else aug_mats[i]
            res_feat = GABlock(self.node_feat_dim, self.pair_feat_dim,
                               dtype=self.dtype, name=f'block_{i}',
                               use_pallas=self.use_pallas, **opt)(
                R, t, res_feat, pair_feat, mask, pair_bias=bias_i,
                aug_mat=aug_i, use_pallas=use_pallas, reps=reps)
        return res_feat
