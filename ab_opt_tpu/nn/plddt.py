"""AlphaFold-style pLDDT confidence head (dormant in the reference too).

Rewrite of ``AbDock/src/modules/common/plddt.py:23-151``: per-residue binned
lddt-CA prediction with softmax-CE loss and expected-value decoding. The
reference keeps this head commented out of EpsilonNet (dpm_full.py:66-68,
111) in favor of the pRMSD head; it is provided here for completeness and
can be attached via ``EpsilonNet``-style wrappers.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import PerResiduePredictor


class PerResidueLDDTCaPredictor(PerResiduePredictor):
    """Same LN + 3-layer MLP head; semantic alias (ref plddt.py:23)."""


def lddt(pred_pos, true_pos, mask, cutoff: float = 15.0, eps: float = 1e-10):
    """lddt-CA score per residue (ref plddt.py:60-105).

    pred_pos/true_pos: (N, L, 3); mask: (N, L, 1). Returns (N, L) in [0, 1].
    """
    def dmat(p):
        d2 = jnp.sum((p[:, :, None, :] - p[:, None, :, :]) ** 2, axis=-1)
        return jnp.sqrt(d2 + eps)

    from .tensor_utils import permute_final_dims
    d_true = dmat(true_pos)
    d_pred = dmat(pred_pos)
    L = pred_pos.shape[1]
    pair_mask = (mask * permute_final_dims(mask, (1, 0))
                 * (d_true < cutoff) * (1.0 - jnp.eye(L)[None]))

    dist_l1 = jnp.abs(d_true - d_pred)
    f = jnp.float32
    score = 0.25 * ((dist_l1 < 0.5).astype(f) + (dist_l1 < 1.0).astype(f)
                    + (dist_l1 < 2.0).astype(f) + (dist_l1 < 4.0).astype(f))
    norm = 1.0 / (eps + pair_mask.sum(axis=2))
    return norm * (eps + (pair_mask * score).sum(axis=2))


def compute_plddt(logits):
    """Expected pLDDT in [0, 100] from binned logits (ref plddt.py:8-20)."""
    num_bins = logits.shape[-1]
    width = 1.0 / num_bins
    centers = jnp.arange(num_bins) * width + width / 2
    probs = jax.nn.softmax(logits, axis=-1)
    return (probs * centers).sum(-1) * 100.0


def lddt_loss(logits, pred_pos, true_pos, mask, resolution=None,
              cutoff: float = 15.0, eps: float = 1e-10):
    """Binned CE against the true lddt (ref plddt.py:108-151)."""
    num_bins = logits.shape[-1]
    score = jax.lax.stop_gradient(lddt(pred_pos, true_pos, mask, cutoff, eps))
    bin_index = jnp.clip(jnp.floor(score * num_bins).astype(jnp.int32),
                         0, num_bins - 1)
    target = jax.nn.one_hot(bin_index, num_bins)
    errors = -(target * jax.nn.log_softmax(logits, axis=-1)).sum(-1)
    m = mask[..., 0]
    return (errors * m).sum() / (eps + m.sum())
