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

from ..geometry import global_to_local, local_to_global, normalize_vector
from ..ops.ipa_pallas import fused_ipa_from_flat, precompute_pair_bias


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
    def __call__(self, R, t, x, z, mask, pair_bias=None, use_pallas=None,
                 reps: int = 1):
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
        q = dense(H * QK, 'proj_query')(x)
        k = dense(H * QK, 'proj_key')(x)
        v = dense(H * V, 'proj_value')(x)
        qp = dense(H * P * 3, 'proj_query_point')(x).reshape(N, L, H * P, 3)
        kp = dense(H * P * 3, 'proj_key_point')(x).reshape(N, L, H * P, 3)
        vp = dense(H * PV * 3, 'proj_value_point')(x).reshape(N, L, H * PV, 3)
        qp = local_to_global(R, t, qp).reshape(N, L, H * P * 3)
        kp = local_to_global(R, t, kp).reshape(N, L, H * P * 3)
        vp_g = local_to_global(R, t, vp.reshape(N, L, H * PV, 3))

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
            feat_p2n, feat_node, pts = fused_ipa_from_flat(
                q, k, qp, kp, v, vp_g.reshape(N, L, H * PV * 3), z,
                None, spatial_coef.reshape(H), mask.astype(jnp.float32),
                pair_bias=pair_bias, reps=reps, interpret=interp)
            aggr = pts.reshape(N, L, H, PV, 3)
            feat_points = global_to_local(R, t, aggr.reshape(N, L, H * PV, 3))
        elif reps > 1:
            # Einsum path with a shared per-complex pair tensor: fold the
            # replica axis next to the batch axis and broadcast z terms.
            q = q.reshape(N, L, H, QK)
            k = k.reshape(N, L, H, QK)
            v = v.reshape(N, L, H, V)
            qp_h = qp.reshape(N, L, H, P * 3)
            kp_h = kp.reshape(N, L, H, P * 3)

            logits_node = jnp.einsum('nihc,njhc->nijh', q, k) / math.sqrt(QK)
            if pair_bias is None:
                pair_bias = bias_dense(z)                  # (Nc, L, L, H)
            sq_q = jnp.sum(qp_h * qp_h, axis=-1)
            sq_k = jnp.sum(kp_h * kp_h, axis=-1)
            cross = jnp.einsum('nihc,njhc->nijh', qp_h, kp_h)
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
            aggr = jnp.einsum('nijh,njhpx->nihpx', alpha,
                              vp_g.reshape(N, L, H, PV, 3))
            feat_points = global_to_local(R, t, aggr.reshape(N, L, H * PV, 3))
        else:
            q = q.reshape(N, L, H, QK)
            k = k.reshape(N, L, H, QK)
            v = v.reshape(N, L, H, V)
            qp_h = qp.reshape(N, L, H, P * 3)
            kp_h = kp.reshape(N, L, H, P * 3)

            logits_node = jnp.einsum('nihc,njhc->nijh', q, k) / math.sqrt(QK)
            if pair_bias is None:
                pair_bias = bias_dense(z)                  # (N, L, L, H)
            logits_pair = pair_bias

            sq_q = jnp.sum(qp_h * qp_h, axis=-1)           # (N, L, H)
            sq_k = jnp.sum(kp_h * kp_h, axis=-1)
            cross = jnp.einsum('nihc,njhc->nijh', qp_h, kp_h)
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
            aggr = jnp.einsum('nijh,njhpx->nihpx', alpha,
                              vp_g.reshape(N, L, H, PV, 3))      # (N,L,H,PV,3)
            feat_points = global_to_local(R, t, aggr.reshape(N, L, H * PV, 3))
        feat_points = feat_points.reshape(N, L, H, PV, 3)
        # Grad-safe norm: aggregated points are exactly zero on padded rows.
        feat_distance = jnp.sqrt(
            jnp.sum(feat_points * feat_points, axis=-1) + 1e-12)
        feat_direction = normalize_vector(feat_points, eps=1e-4)
        feat_spatial = jnp.concatenate([
            feat_points.reshape(N, L, -1),
            feat_distance.reshape(N, L, -1),
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
                 use_pallas=None, reps: int = 1):
        use_pallas = self.use_pallas if use_pallas is None else use_pallas
        opt = dict(self.ga_block_opt or {})
        for i in range(self.num_layers):
            bias_i = None if pair_biases is None else pair_biases[i]
            res_feat = GABlock(self.node_feat_dim, self.pair_feat_dim,
                               dtype=self.dtype, name=f'block_{i}',
                               use_pallas=self.use_pallas, **opt)(
                R, t, res_feat, pair_feat, mask, pair_bias=bias_i,
                use_pallas=use_pallas, reps=reps)
        return res_feat
