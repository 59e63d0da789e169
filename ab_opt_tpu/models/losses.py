"""Training losses for the diffusion model (ref dpm_full.py:15-32, 190-232,
369-399 and prmsd.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import distance_to_bins_onehot


def masked_mean(x, mask, eps=1e-8):
    """Mean of ``x`` over elements where ``mask`` (same shape) is set."""
    mask = mask.astype(x.dtype)
    return (x * mask).sum() / (mask.sum() + eps)


def rotation_matrix_cosine_loss(R_pred, R_true):
    """Sum over basis vectors of (1 - cosine similarity) (ref dpm_full.py:15).

    R_*: (..., 3, 3); returns (...,).
    """
    # Compare the three basis columns of each rotation.
    dot = jnp.sum(R_pred * R_true, axis=-2)                       # (..., 3)
    norm = (jnp.linalg.norm(R_pred, axis=-2) *
            jnp.linalg.norm(R_true, axis=-2))
    cos = dot / jnp.maximum(norm, 1e-8)
    return jnp.sum(1.0 - cos, axis=-1)


def smooth_l1(x, y, beta: float = 1.0):
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def pairwise_distance_loss(p_pred, p_true, mask_generate, mask_res):
    """Masked SmoothL1 between pairwise-distance maps (ref dpm_full.py:369).

    Pairs (i, j) count when residue i is generated and both are valid.
    """
    def cdist(p):
        sq = jnp.sum(p * p, axis=-1)
        cross = jnp.einsum('nix,njx->nij', p, p,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.sqrt(jnp.clip(sq[:, :, None] + sq[:, None, :] - 2 * cross,
                                 min=1e-12))

    mask_map = mask_res[:, :, None] & mask_res[:, None, :]
    mask_pair = mask_generate[:, :, None] & mask_map
    return masked_mean(smooth_l1(cdist(p_pred), cdist(p_true)), mask_pair)


def sequence_kl_loss(post_true, log_post_pred, mask_generate):
    """KL(post_true || post_pred) summed over classes, masked-mean over
    generated residues (ref dpm_full.py:223-231). Uses the x·log(x) convention
    0·log 0 = 0 (the torch version NaNs at t=0; this is the safe equivalent)."""
    xlogx = jnp.where(post_true > 0, post_true * jnp.log(jnp.clip(post_true, min=1e-30)), 0.0)
    kl = (xlogx - post_true * log_post_pred).sum(axis=-1)
    return masked_mean(kl, mask_generate)


def masked_rmsd(pred, target, mask):
    """Per-complex RMSD over masked residues (ref prmsd.py:88-111).

    pred/target: (N, L, 3); mask: (N, L) -> (N,).
    """
    m = mask.astype(pred.dtype)[..., None]
    sq = jnp.sum((pred * m - target * m) ** 2, axis=-1)          # (N, L)
    n = jnp.clip(mask.sum(axis=-1).astype(pred.dtype), min=1.0)
    return jnp.sqrt(sq.sum(axis=-1) / n)


def prmsd_loss(prmsd_logits, rmsd, mask, dist_min, dist_max, num_bins):
    """Binned cross-entropy confidence loss (ref prmsd.py:49-69).

    prmsd_logits: (N, num_bins); rmsd: (N,); mask: (N,).
    """
    target = distance_to_bins_onehot(rmsd, dist_min, dist_max, num_bins)
    errors = -(target * jax.nn.log_softmax(prmsd_logits, axis=-1)).sum(-1)
    return masked_mean(errors, mask, eps=1e-10)


def compute_prmsd(prmsd_logits, dist_min, dist_max):
    """Expected RMSD under the binned confidence head (ref prmsd.py:31-47)."""
    num_bins = prmsd_logits.shape[-1]
    bounds = jnp.linspace(dist_min, dist_max, num_bins)
    probs = jax.nn.softmax(prmsd_logits, axis=-1)
    return (probs * bounds).sum(axis=-1)


def sequence_perplexity(probs, mask_generate):
    """Mean max-probability over generated residues (ref dpm_full.py:380-399;
    despite its name this is a confidence score in (0, 1], higher = sharper).

    probs: (N, L, K) posterior probabilities; mask_generate: (N, L) -> (N,).
    """
    max_probs = jax.nn.softmax(probs, axis=-1).max(axis=-1)
    m = mask_generate.astype(max_probs.dtype)
    return (max_probs * m).sum(-1) / jnp.clip(m.sum(-1), min=1e-8)
