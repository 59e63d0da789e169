"""The denoiser network: sequence mix-in -> GAEncoder -> per-modality heads.

TPU-native rewrite of ``AbDock/src/modules/diffusion/dpm_full.py:35-112``
(EpsilonNet). Outputs, per call:

  v_next  — *updated* orientations (not an epsilon), (N, L, 3)
  R_next  — the same update as rotation matrices, (N, L, 3, 3)
  eps_pos — position noise / x0 prediction in the global frame, (N, L, 3)
  c_denoised — softmaxed 20-way sequence distribution, (N, L, 20)
  prmsd_logits — per-complex confidence logits, (N, num_bins)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry import (
    planar_apply_to_vector,
    planar_compose,
    planar_rotation_to_so3vec,
    planar_to_matrix,
    quaternion_1ijk_to_rotation_planar,
    so3vec_to_rotation_planar,
)
from .ipa import GAEncoder
from .layers import MLP, PerResiduePredictor

_HI_PREC = 'highest'


def precompute_head_weights(eps_params, dtype=jnp.bfloat16):
    """Stack the four per-step output heads into batched-GEMM operands.

    The heads — eps_crd/eps_rot/eps_seq MLPs plus the pRMSD predictor
    (ref dpm_full.py:60-66, each three Dense layers at output widths
    3/3/20/num_bins) — otherwise dispatch 12 narrow dots per diffusion
    step whose N dimension (3 or 20 lanes) wastes the 128-lane MXU tile.
    Stacked: layer 1 of the three in_feat heads becomes ONE (F+3, 3F)
    GEMM, layers 2/3 of all four heads become (4, M, F) batched dots with
    the final outputs zero-padded to a common width. Weights are constant
    across diffusion steps, so samplers build this once outside the
    reverse scan. The TPU training path uses it too (DiffAb.loss): the
    stacking is plain concat/pad, so autodiff carries gradients back to
    the per-head Dense kernels. CPU/parity paths use the flax modules.
    """
    def kb(sub, i):
        d = sub[f'Dense_{i}']
        return d['kernel'], d['bias']

    heads = [eps_params[n] for n in ('eps_crd_net', 'eps_rot_net',
                                     'eps_seq_net')]
    pr = eps_params['prmsd_predictor']
    l1 = [kb(h, 0) for h in heads]
    w1p, b1p = kb(pr, 0)
    l3 = [kb(h, 2) for h in heads] + [kb(pr, 2)]
    omax = max(k.shape[1] for k, _ in l3)
    pad_k = lambda k: jnp.pad(k, ((0, 0), (0, omax - k.shape[1])))
    pad_b = lambda b: jnp.pad(b, (0, omax - b.shape[0]))
    ln = pr['LayerNorm_0']
    return {
        'w1': jnp.concatenate([k for k, _ in l1], axis=1).astype(dtype),
        'b1': jnp.concatenate([b for _, b in l1]).astype(dtype),
        'w1p': w1p.astype(dtype), 'b1p': b1p.astype(dtype),
        'w2': jnp.stack([kb(h, 1)[0] for h in heads]
                        + [kb(pr, 1)[0]]).astype(dtype),
        'b2': jnp.stack([kb(h, 1)[1] for h in heads]
                        + [kb(pr, 1)[1]]).astype(dtype)[:, None, :],
        'w3': jnp.stack([pad_k(k) for k, _ in l3]).astype(dtype),
        'b3': jnp.stack([pad_b(b) for _, b in l3]).astype(dtype)[:, None, :],
        'ln_scale': ln['scale'].astype(jnp.float32),
        'ln_bias': ln['bias'].astype(jnp.float32),
    }


def _apply_fused_heads(in_feat, hw, F, num_bins, dtype):
    """Batched-GEMM evaluation of the four heads (see precompute above).

    Numerics mirror the module path: operands cast to ``dtype`` (flax
    Dense promote_dtype), dots accumulate f32 on the MXU, biases/relu in
    ``dtype``; the pRMSD LayerNorm stays f32 (layers.py:71).
    """
    N, L = in_feat.shape[:2]
    x = in_feat.reshape(N * L, -1).astype(jnp.float32)
    xc = x.astype(dtype)
    h1 = jax.nn.relu(jnp.dot(xc, hw['w1']) + hw['b1'])        # (M, 3F)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ln = ((x - mean) * jax.lax.rsqrt(var + 1e-10) * hw['ln_scale']
          + hw['ln_bias'])
    h1p = jax.nn.relu(jnp.dot(ln.astype(dtype), hw['w1p']) + hw['b1p'])
    h = jnp.stack([h1[:, :F], h1[:, F:2 * F], h1[:, 2 * F:], h1p])  # (4,M,F)
    bat = (((2,), (1,)), ((0,), (0,)))
    h = jax.nn.relu(jax.lax.dot_general(h, hw['w2'], bat) + hw['b2'])
    out = jax.lax.dot_general(h, hw['w3'], bat) + hw['b3']    # (4, M, omax)
    shp = lambda i, w: out[i, :, :w].reshape(N, L, w)
    return (shp(0, 3), shp(1, 3), shp(2, 20), shp(3, num_bins))


class EpsilonNet(nn.Module):
    res_feat_dim: int
    pair_feat_dim: int
    num_layers: int
    num_bins: int = 20
    encoder_opt: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, v_t, p_t, s_t, res_feat, pair_feat, beta,
                 mask_generate, mask_res, pair_biases=None, fast_weights=None,
                 use_pallas=None, reps: int = 1, fused_encoder_fn=None,
                 fuse_p2n: bool = False, head_weights=None):
        """
        Args:
          v_t: (N, L, 3) so3 orientations; p_t: (N, L, 3) normalized positions;
          s_t: (N, L) int aa codes; res_feat: (N, L, F); pair_feat:
            (N, L, L, C) — or (N // reps, L, L, C) under trajectory fan-out
            (replicas share their complex's pair tensor);
          beta: (N,) schedule value at t; mask_generate / mask_res: (N, L).
          fused_encoder_fn: optional ``(R, t, x, mask) -> x`` callable that
            replaces the GAEncoder stack — samplers pass the fully-fused
            per-layer kernel (ops/gablock_pallas.py) with weights/biases
            closed over (hoisted out of the reverse scan).
        """
        N, L = mask_res.shape
        F = self.res_feat_dim
        # Rotations stay PLANAR (tuple of 9 (N, L) components) through the
        # whole step: (N, L, 3, 3) tensors tile terribly on TPU (component
        # extraction + 3x3 matmuls measured ~0.37 ms/step; see PERF.md).
        R9 = so3vec_to_rotation_planar(v_t)

        # Mix the current (noisy) sequence into the static residue features.
        seq_embed = nn.Embed(25, F, dtype=self.dtype, name='seq_embed')(s_t)
        res_feat = MLP((F, F), dtype=self.dtype, name='res_feat_mixer')(
            jnp.concatenate([res_feat, seq_embed], axis=-1))

        if fused_encoder_fn is not None:
            res_feat = fused_encoder_fn(R9, p_t, res_feat, mask_res)
        else:
            res_feat = GAEncoder(F, self.pair_feat_dim, self.num_layers,
                                 ga_block_opt=self.encoder_opt,
                                 dtype=self.dtype,
                                 use_pallas=self.use_pallas,
                                 name='encoder')(R9, p_t, res_feat, pair_feat,
                                                 mask_res,
                                                 pair_biases=pair_biases,
                                                 fast_weights=fast_weights,
                                                 use_pallas=use_pallas,
                                                 reps=reps, fuse_p2n=fuse_p2n)

        t_embed = jnp.stack([beta, jnp.sin(beta), jnp.cos(beta)], axis=-1)
        t_embed = jnp.broadcast_to(t_embed[:, None, :], (N, L, 3))
        in_feat = jnp.concatenate([res_feat, t_embed], axis=-1)

        if head_weights is not None:
            # Sampling path: the four heads as batched GEMMs (weights hoisted
            # out of the reverse scan by precompute_head_weights above).
            eps_crd, eps_rot, seq_logits, prmsd_logits = _apply_fused_heads(
                in_feat, head_weights, F, self.num_bins, self.dtype)
        else:
            eps_crd = MLP((F, F, 3), dtype=self.dtype,
                          name='eps_crd_net')(in_feat)
            eps_rot = MLP((F, F, 3), dtype=self.dtype,
                          name='eps_rot_net')(in_feat)
            seq_logits = MLP((F, F, 20), dtype=self.dtype,
                             name='eps_seq_net')(in_feat)
            prmsd_logits = PerResiduePredictor(
                self.num_bins, F, dtype=self.dtype,
                name='prmsd_predictor')(in_feat)

        # Position head: local-frame output rotated into the global frame.
        eps_pos = planar_apply_to_vector(R9, eps_crd.astype(jnp.float32))
        eps_pos = jnp.where(mask_generate[..., None], eps_pos, 0.0)

        # Rotation head: quaternion update composed with the current rotation
        # (f32 components — orthogonality breaks in bf16).
        U9 = quaternion_1ijk_to_rotation_planar(eps_rot.astype(jnp.float32))
        Rn9 = planar_compose(R9, U9)
        v_next = planar_rotation_to_so3vec(Rn9)
        v_next = jnp.where(mask_generate[..., None], v_next, v_t)
        # Dense matrix only for the training loss path (DCE'd when sampling).
        R_next = planar_to_matrix(Rn9)

        # Sequence head (softmaxed) and per-complex pRMSD confidence logits.
        c_denoised = nn.softmax(seq_logits, axis=-1)
        # Per-complex score: mean over the residue axis (the reference averages
        # over all L incl. padding, dpm_full.py:110 — reproduced for parity).
        prmsd_logits = prmsd_logits.mean(axis=1)

        return v_next, R_next, eps_pos, c_denoised, prmsd_logits
