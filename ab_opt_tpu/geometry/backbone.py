"""Backbone reconstruction from rigid frames.

TPU-native rewrite of ``AbDock/src/modules/common/geometry.py:404-481``:
given per-residue frames (R, t) and residue types, place idealized N/CA/C
coordinates and derive O from the psi dihedral.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import backbone_atom_coordinates, bb_oxygen_coordinate
from .dihedrals import get_backbone_dihedral_angles
from .frames import compose_rotation_and_translation, local_to_global


def reconstruct_backbone(R, t, aa, chain_nb, res_nb, mask):
    """Reconstruct N/CA/C/O positions from frames.

    Args:
      R: (..., L, 3, 3); t: (..., L, 3); aa/chain_nb/res_nb/mask: (..., L).
    Returns:
      (..., L, 4, 3) backbone atom positions.
    """
    aa = jnp.clip(aa, 0, 20)
    ideal_bb = jnp.asarray(backbone_atom_coordinates)[aa]    # (..., L, 3, 3)
    ideal_o = jnp.asarray(bb_oxygen_coordinate)[aa]          # (..., L, 3)

    bb_pos = local_to_global(R, t, ideal_bb)                 # N, CA, C

    bb_dihedral, _ = get_backbone_dihedral_angles(bb_pos, chain_nb, res_nb, mask)
    psi = bb_dihedral[..., 2]
    sin_psi, cos_psi = jnp.sin(psi), jnp.cos(psi)
    zero, one = jnp.zeros_like(psi), jnp.ones_like(psi)
    # Rotation about the local x-axis by psi.
    R_psi = jnp.stack([
        one, zero, zero,
        zero, cos_psi, -sin_psi,
        zero, sin_psi, cos_psi,
    ], axis=-1).reshape(psi.shape + (3, 3))

    R_o, t_o = compose_rotation_and_translation(R, t, R_psi, jnp.zeros_like(t))
    o_pos = local_to_global(R_o, t_o, ideal_o[..., None, :])  # (..., L, 1, 3)

    return jnp.concatenate([bb_pos, o_pos], axis=-2)


def reconstruct_backbone_partially(pos_ctx, R_new, t_new, aa, chain_nb, res_nb,
                                   mask_atoms, mask_recons):
    """Rebuild backbone only where ``mask_recons`` is set, keep context atoms.

    Args:
      pos_ctx: (..., L, A, 3) original atom positions.
      mask_atoms: (..., L, A) atom validity; mask_recons: (..., L) residues to
      rebuild from (R_new, t_new).
    Returns:
      (pos_new, mask_new): (..., L, A, 3) and (..., L, A).
    """
    A = mask_atoms.shape[-1]
    mask_res = mask_atoms[..., 1]    # CA-present flag
    pos_recons = reconstruct_backbone(R_new, t_new, aa, chain_nb, res_nb, mask_res)
    pos_recons = jnp.pad(
        pos_recons, [(0, 0)] * (pos_recons.ndim - 2) + [(0, A - 4), (0, 0)])

    sel = mask_recons[..., None, None]
    pos_new = jnp.where(sel, pos_recons, pos_ctx)

    bb_atom = jnp.arange(A) < 4
    mask_new = jnp.where(mask_recons[..., None], bb_atom, mask_atoms)
    return pos_new, mask_new
