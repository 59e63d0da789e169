"""Backbone dihedral angles and chain-topology flags.

TPU-native rewrite of ``AbDock/src/modules/common/geometry.py:254-376`` and
``topology.py``. Operates on (..., L, A, 3) atom tensors with leading batch
dims; the residue axis is second-to-last-but-one throughout.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import BBHeavyAtom


def dihedral_from_four_points(p0, p1, p2, p3):
    """Signed dihedral angle of four points (..., 3) -> (...,) radians."""
    v0 = p2 - p1
    v1 = p0 - p1
    v2 = p3 - p2
    u1 = jnp.cross(v0, v1)
    u2 = jnp.cross(v0, v2)
    # Guard the normalization: degenerate (collinear / padded) inputs give
    # zero-norm normals; the eps-floored *squared* sum keeps both the value
    # and the gradient finite (the reference relies on nan_to_num instead).
    n1 = u1 / jnp.sqrt(jnp.clip(jnp.sum(u1 * u1, axis=-1, keepdims=True),
                                min=1e-12))
    n2 = u2 / jnp.sqrt(jnp.clip(jnp.sum(u2 * u2, axis=-1, keepdims=True),
                                min=1e-12))
    sgn = jnp.sign(jnp.sum(jnp.cross(v1, v2) * v0, axis=-1))
    cosang = jnp.clip(jnp.sum(n1 * n2, axis=-1), -0.999999, 0.999999)
    return sgn * jnp.arccos(cosang)


def get_consecutive_flag(chain_nb, res_nb, mask):
    """Whether residue i is peptide-bonded to residue i+1. -> (..., L-1) bool."""
    d = jnp.abs(res_nb[..., 1:] - res_nb[..., :-1])
    same_chain = chain_nb[..., 1:] == chain_nb[..., :-1]
    return (d == 1) & same_chain & mask[..., :-1].astype(bool)


def get_terminus_flag(chain_nb, res_nb, mask):
    """N-/C-terminus flags, each (..., L) bool (ref topology.py:20)."""
    consec = get_consecutive_flag(chain_nb, res_nb, mask)
    pad = jnp.ones(consec.shape[:-1] + (1,), dtype=bool)
    n_term = jnp.concatenate([pad, ~consec], axis=-1)
    c_term = jnp.concatenate([~consec, pad], axis=-1)
    return n_term, c_term


def get_backbone_dihedral_angles(pos_atoms, chain_nb, res_nb, mask):
    """Omega/phi/psi per residue.

    Args:
      pos_atoms: (..., L, A, 3); chain_nb/res_nb/mask: (..., L).
    Returns:
      (bb_dihedral, mask_bb_dihed): both (..., L, 3); angles zeroed where
      masked (N-termini lack omega/phi, C-termini lack psi).
    """
    pos_n = pos_atoms[..., BBHeavyAtom.N, :]
    pos_ca = pos_atoms[..., BBHeavyAtom.CA, :]
    pos_c = pos_atoms[..., BBHeavyAtom.C, :]

    n_term, c_term = get_terminus_flag(chain_nb, res_nb, mask)

    zpad = lambda x, front: jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(1, 0) if front else (0, 1)])

    omega = zpad(dihedral_from_four_points(
        pos_ca[..., :-1, :], pos_c[..., :-1, :], pos_n[..., 1:, :], pos_ca[..., 1:, :]), True)
    phi = zpad(dihedral_from_four_points(
        pos_c[..., :-1, :], pos_n[..., 1:, :], pos_ca[..., 1:, :], pos_c[..., 1:, :]), True)
    psi = zpad(dihedral_from_four_points(
        pos_n[..., :-1, :], pos_ca[..., :-1, :], pos_c[..., :-1, :], pos_n[..., 1:, :]), False)

    mask_bb_dihed = jnp.stack([~n_term, ~n_term, ~c_term], axis=-1)
    bb_dihedral = jnp.stack([omega, phi, psi], axis=-1) * mask_bb_dihed
    return bb_dihedral, mask_bb_dihed


def pairwise_dihedrals(pos_atoms):
    """Inter-residue phi/psi angles (..., L, L, 2) (ref geometry.py:351).

    ir_phi[i, j] uses C(i), N(j), CA(j), C(j); ir_psi[i, j] uses
    N(i), CA(i), C(i), N(j).
    """
    pos_n = pos_atoms[..., BBHeavyAtom.N, :]
    pos_ca = pos_atoms[..., BBHeavyAtom.CA, :]
    pos_c = pos_atoms[..., BBHeavyAtom.C, :]

    row = lambda x: x[..., :, None, :]   # indexed by i
    col = lambda x: x[..., None, :, :]   # indexed by j

    ir_phi = dihedral_from_four_points(row(pos_c), col(pos_n), col(pos_ca), col(pos_c))
    ir_psi = dihedral_from_four_points(row(pos_n), row(pos_ca), row(pos_c), col(pos_n))
    return jnp.stack([ir_phi, ir_psi], axis=-1)
