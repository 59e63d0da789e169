"""Residue and pair feature embeddings.

TPU-native rewrite of ``AbDock/src/modules/encoders/residue.py`` and
``pair.py``. Differences from the torch reference are purely mechanical:

* the per-aa-type coordinate scatter uses a one-hot einsum instead of an
  (N, L, 22, A, 3) expand+where;
* all-atom pair distances are computed via the |x|^2 + |y|^2 - 2<x,y>
  expansion so the cross term is an MXU matmul and no (N, L, L, A, A, 3)
  broadcast tensor is materialized;
* the ``padding_idx=0`` embedding row is emulated by masking fragment type 0.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..constants import AA_UNK, MAX_AA_TYPES, BBHeavyAtom
from ..geometry import (
    construct_3d_basis,
    get_backbone_dihedral_angles,
    global_to_local,
    pairwise_dihedrals,
    angstrom_to_nm,
)
from .layers import AngularEncoding, MLP


class ResidueEmbedding(nn.Module):
    """Per-residue features (ref residue.py:9-92)."""

    feat_dim: int
    max_num_atoms: int
    max_aa_types: int = MAX_AA_TYPES
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, aa, res_nb, chain_nb, pos_atoms, mask_atoms, fragment_type,
                 structure_mask: Optional[jnp.ndarray] = None,
                 sequence_mask: Optional[jnp.ndarray] = None,
                 hotspot: Optional[jnp.ndarray] = None):
        """
        Args:
          aa: (N, L) int; pos_atoms: (N, L, A, 3); mask_atoms: (N, L, A);
          fragment_type: (N, L) int (0 = padding);
          structure_mask / sequence_mask: (N, L) — True where the native
          structure / sequence may be *seen* (False = to-be-generated, the
          embedding must not leak it).
        Returns: (N, L, feat_dim)
        """
        N, L = aa.shape
        A = self.max_num_atoms
        pos_atoms = pos_atoms[:, :, :A]
        mask_atoms = mask_atoms[:, :, :A]
        mask_residue = mask_atoms[:, :, BBHeavyAtom.CA]

        if sequence_mask is not None:
            aa = jnp.where(sequence_mask, aa, jnp.full_like(aa, AA_UNK))
        aa_feat = nn.Embed(self.max_aa_types, self.feat_dim, dtype=self.dtype)(aa)

        # Local-frame atom coordinates scattered over per-aa-type slots.
        R = construct_3d_basis(
            pos_atoms[:, :, BBHeavyAtom.CA],
            pos_atoms[:, :, BBHeavyAtom.C],
            pos_atoms[:, :, BBHeavyAtom.N],
        )
        t = pos_atoms[:, :, BBHeavyAtom.CA]
        crd = global_to_local(R, t, pos_atoms) * mask_atoms[..., None]   # (N, L, A, 3)
        aa_onehot = jax.nn.one_hot(jnp.clip(aa, 0, self.max_aa_types - 1),
                                   self.max_aa_types, dtype=crd.dtype)   # (N, L, 22)
        crd_feat = (aa_onehot[:, :, :, None, None] * crd[:, :, None, :, :]
                    ).reshape(N, L, self.max_aa_types * A * 3)
        if structure_mask is not None:
            crd_feat = crd_feat * structure_mask[:, :, None]

        # Backbone dihedral features.
        bb_dihedral, mask_bb_dihed = get_backbone_dihedral_angles(
            pos_atoms, chain_nb=chain_nb, res_nb=res_nb, mask=mask_residue)
        dihed_enc = AngularEncoding()
        dihed_feat = (dihed_enc(bb_dihedral[..., None]) *
                      mask_bb_dihed[..., None]).reshape(N, L, -1)
        if structure_mask is not None:
            # Neighbors' atoms contribute to this residue's dihedrals, so also
            # require both sequence-neighbors to be context (ref residue.py:76-85).
            prev_ok = jnp.roll(structure_mask, 1, axis=1)
            next_ok = jnp.roll(structure_mask, -1, axis=1)
            dihed_mask = structure_mask & prev_ok & next_ok
            dihed_feat = dihed_feat * dihed_mask[:, :, None]

        # Fragment type; row 0 is padding and contributes zero.
        type_feat = nn.Embed(10, self.feat_dim, dtype=self.dtype)(fragment_type)
        type_feat = type_feat * (fragment_type > 0)[..., None]

        feats = [aa_feat, crd_feat, dihed_feat, type_feat]
        if hotspot is not None:
            # AbDesign hotspot conditioning (AbDesign residue.py:19-21,97-101);
            # codes: 1 non-hotspot, 2 hotspot, 0 padding.
            hs_feat = nn.Embed(10, self.feat_dim, dtype=self.dtype)(hotspot)
            feats.append(hs_feat * (hotspot > 0)[..., None])

        out = MLP((self.feat_dim * 2, self.feat_dim, self.feat_dim, self.feat_dim),
                  dtype=self.dtype)(jnp.concatenate(feats, axis=-1))
        return out * mask_residue[:, :, None]


class PairEmbedding(nn.Module):
    """Pairwise features (N, L, L, feat_dim) (ref pair.py:10-101)."""

    feat_dim: int
    max_num_atoms: int
    max_aa_types: int = MAX_AA_TYPES
    max_relpos: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, aa, res_nb, chain_nb, pos_atoms, mask_atoms,
                 structure_mask: Optional[jnp.ndarray] = None,
                 sequence_mask: Optional[jnp.ndarray] = None):
        N, L = aa.shape
        A = self.max_num_atoms
        pos_atoms = pos_atoms[:, :, :A]
        mask_atoms = mask_atoms[:, :, :A]

        mask_residue = mask_atoms[:, :, BBHeavyAtom.CA]
        mask_pair = mask_residue[:, :, None] * mask_residue[:, None, :]
        pair_structure_mask = (
            structure_mask[:, :, None] * structure_mask[:, None, :]
            if structure_mask is not None else None)

        if sequence_mask is not None:
            aa = jnp.where(sequence_mask, aa, jnp.full_like(aa, AA_UNK))

        # Pair identity embedding, indexed by aa_i * 22 + aa_j.
        aa = jnp.clip(aa, 0, self.max_aa_types - 1)
        aa_pair = aa[:, :, None] * self.max_aa_types + aa[:, None, :]
        feat_aapair = nn.Embed(self.max_aa_types ** 2, self.feat_dim,
                               dtype=self.dtype)(aa_pair)

        # Relative sequential position (same-chain only).
        same_chain = chain_nb[:, :, None] == chain_nb[:, None, :]
        relpos = jnp.clip(res_nb[:, :, None] - res_nb[:, None, :],
                          -self.max_relpos, self.max_relpos)
        feat_relpos = nn.Embed(2 * self.max_relpos + 1, self.feat_dim,
                               dtype=self.dtype)(relpos + self.max_relpos)
        feat_relpos = feat_relpos * same_chain[..., None]

        # All-atom pair distances with learned per-aa-pair Gaussian widths.
        # d2[n,i,j,a,b] = |p_ia|^2 + |p_jb|^2 - 2 <p_ia, p_jb>  (MXU cross term)
        p = angstrom_to_nm(pos_atoms.astype(jnp.float32))        # (N, L, A, 3)
        sq = jnp.sum(p * p, axis=-1)                             # (N, L, A)
        # K=3 contraction on ~30A coordinates: full precision (TPU default
        # bf16 accumulation would corrupt the Gaussian distance features).
        cross = jnp.einsum('niax,njbx->nijab', p, p,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.clip(sq[:, :, None, :, None] + sq[:, None, :, None, :]
                      - 2.0 * cross, min=0.0)
        d2 = d2.reshape(N, L, L, A * A)
        coef_embed = nn.Embed(
            self.max_aa_types ** 2, A * A,
            embedding_init=nn.initializers.zeros, dtype=self.dtype)
        c = nn.softplus(coef_embed(aa_pair))                     # (N, L, L, A*A)
        d_gauss = jnp.exp(-c * d2)
        mask_atom_pair = (mask_atoms[:, :, None, :, None]
                          * mask_atoms[:, None, :, None, :]).reshape(N, L, L, A * A)
        dist_mlp_in = d_gauss * mask_atom_pair
        h = nn.relu(nn.Dense(self.feat_dim, dtype=self.dtype)(dist_mlp_in))
        feat_dist = nn.relu(nn.Dense(self.feat_dim, dtype=self.dtype)(h))
        if pair_structure_mask is not None:
            feat_dist = feat_dist * pair_structure_mask[..., None]

        # Inter-residue orientation dihedrals.
        dihed = pairwise_dihedrals(pos_atoms)                    # (N, L, L, 2)
        feat_dihed = AngularEncoding()(dihed)
        if pair_structure_mask is not None:
            feat_dihed = feat_dihed * pair_structure_mask[..., None]

        feat_all = jnp.concatenate(
            [feat_aapair, feat_relpos, feat_dist, feat_dihed], axis=-1)
        feat_all = MLP((self.feat_dim, self.feat_dim, self.feat_dim),
                       dtype=self.dtype)(feat_all)
        return feat_all * mask_pair[..., None]
