"""Benchmark / driver fixtures: a real cropped complex when the reference
example PDBs are available, a physically-plausible synthetic one otherwise.

The synthetic builder is also the test suite's shared batch factory
(tests/helpers.py delegates here).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

_EXAMPLE_PDB = '/root/reference/AbDock/data/examples/7DK2_AB_C_chothia.pdb'


def synthetic_batch(rng, N=2, L=24, n_ab=16, gen_lo=6, gen_hi=12,
                    num_atoms=15):
    """Build a physically-plausible synthetic complex batch.

    Residues [0, n_ab) are a heavy chain (fragment 1, chain 0); the rest are
    antigen (fragment 3, chain 1). Residues [gen_lo, gen_hi) are the CDR to
    generate.
    """
    from .. import geometry as G

    q = rng.normal(size=(N, L, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(G.quaternion_to_rotation_matrix(jnp.asarray(q)))
    # Chain-like CA trace: cumulative steps of ~3.8 A.
    steps = rng.normal(size=(N, L, 3)).astype(np.float32)
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    t = np.cumsum(3.8 * steps, axis=1).astype(np.float32)
    t -= t.mean(axis=1, keepdims=True)

    aa = rng.integers(0, 20, (N, L))
    chain_nb = np.where(np.arange(L) < n_ab, 0, 1)[None].repeat(N, 0)
    res_nb = np.where(np.arange(L) < n_ab, np.arange(L) + 1,
                      np.arange(L) - n_ab + 1)[None].repeat(N, 0)
    mask = np.ones((N, L), bool)

    bb = np.asarray(G.reconstruct_backbone(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(aa),
        jnp.asarray(chain_nb), jnp.asarray(res_nb), jnp.asarray(mask)))
    pos = np.zeros((N, L, num_atoms, 3), np.float32)
    pos[:, :, :4] = bb
    mask_atoms = np.zeros((N, L, num_atoms), bool)
    mask_atoms[:, :, :4] = True

    generate_flag = np.zeros((N, L), bool)
    generate_flag[:, gen_lo:gen_hi] = True
    fragment_type = np.where(np.arange(L) < n_ab, 1, 3)[None].repeat(N, 0)

    return {
        'aa': jnp.asarray(aa, jnp.int32),
        'res_nb': jnp.asarray(res_nb, jnp.int32),
        'chain_nb': jnp.asarray(chain_nb, jnp.int32),
        'pos_heavyatom': jnp.asarray(pos),
        'mask_heavyatom': jnp.asarray(mask_atoms),
        'generate_flag': jnp.asarray(generate_flag),
        'fragment_type': jnp.asarray(fragment_type, jnp.int32),
        'mask': jnp.asarray(mask),
    }


def real_complex_batch(L: int = 128, pdb_path: str = _EXAMPLE_PDB):
    """One real cropped antibody-antigen complex through the production
    pipeline (parse -> mask CDR-H3 -> merge -> patch crop -> collate), or
    None when the reference example PDBs are unavailable."""
    if not os.path.exists(pdb_path):
        return None
    from ..data.collate import PaddingCollate, to_device_batch
    from ..data.structures import preprocess_antibody_structure
    from ..data.transforms import get_transform

    structure = preprocess_antibody_structure(
        {'id': 'bench', 'pdb_path': pdb_path, 'heavy_id': 'A',
         'light_id': 'B'})
    if structure is None:
        return None
    tfm = get_transform([
        {'type': 'mask_single_cdr', 'selection': 'H_CDR3',
         'augmentation': False},
        {'type': 'merge_chains'},
        {'type': 'patch_around_anchor', 'initial_patch_size': L - 48,
         'antigen_size': 48},
        {'type': 'remove_native', 'remove_structure': True,
         'remove_sequence': True},
    ])
    item = tfm(structure, rng=np.random.default_rng(0))
    batch = PaddingCollate(buckets=(L,))([item])
    return to_device_batch(batch)
