"""Convert reference (pengzhangzhi/ab_opt) torch checkpoints to flax params.

The reference trains ``DiffusionAntibodyDesign`` (AbDock/src/models/diffab.py)
and saves ``{'model': state_dict, 'config': ...}``. This module maps that
state_dict onto the parameter tree of :class:`ab_opt_tpu.models.DiffAbNet`,
allowing released checkpoints to run on TPU without retraining. It only needs
numpy (pass tensors already converted via ``.numpy()`` or load with
``torch.load(..., map_location='cpu')``).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x):
    if hasattr(x, 'detach'):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {'kernel': _np(sd[f'{prefix}.weight']).T}
    if bias and f'{prefix}.bias' in sd:
        out['bias'] = _np(sd[f'{prefix}.bias'])
    return out


def _embed(sd: Mapping, key: str) -> Dict:
    return {'embedding': _np(sd[f'{key}.weight'])}


def _layernorm(sd: Mapping, prefix: str) -> Dict:
    return {'scale': _np(sd[f'{prefix}.gamma']),
            'bias': _np(sd[f'{prefix}.beta'])}


def _mlp(sd: Mapping, prefix: str, torch_indices) -> Dict:
    return {f'Dense_{i}': _linear(sd, f'{prefix}.{j}')
            for i, j in enumerate(torch_indices)}


def _point_planar_perm(H: int, P: int) -> np.ndarray:
    """Column permutation: reference interleaved point layout (h, p, xyz) ->
    the TPU rebuild's planar layout ([x | y | z] blocks, head-major inside);
    see nn/ipa.py GABlock (planar keeps point tensors wide in the lane dim).
    ``planar[i] = interleaved[perm[i]]``."""
    perm = np.empty(3 * H * P, np.int64)
    for c in range(3):
        for h in range(H):
            for p in range(P):
                perm[c * H * P + h * P + p] = (h * P + p) * 3 + c
    return perm


def _ga_block(sd: Mapping, prefix: str) -> Dict:
    H = _np(sd[f'{prefix}.spatial_coef']).reshape(-1).shape[0]
    P = _np(sd[f'{prefix}.proj_query_point.weight']).shape[0] // (3 * H)
    PV = _np(sd[f'{prefix}.proj_value_point.weight']).shape[0] // (3 * H)
    V = _np(sd[f'{prefix}.proj_value.weight']).shape[0] // H
    Cz = _np(sd[f'{prefix}.proj_pair_bias.weight']).shape[1]

    p = {}
    for name in ('proj_query', 'proj_key', 'proj_value', 'proj_pair_bias'):
        p[name] = _linear(sd, f'{prefix}.{name}')
    for name, np_ in (('proj_query_point', P), ('proj_key_point', P),
                      ('proj_value_point', PV)):
        lin = _linear(sd, f'{prefix}.{name}')
        perm = _point_planar_perm(H, np_)
        lin['kernel'] = lin['kernel'][:, perm]
        if 'bias' in lin:
            lin['bias'] = lin['bias'][perm]
        p[name] = lin

    # out_transform input rows: [p2n | node | points | dist | dir]; the
    # points and direction sections are planar in the rebuild.
    ot = _linear(sd, f'{prefix}.out_transform')
    kern = ot['kernel']
    perm_pv = _point_planar_perm(H, PV)
    o0 = H * Cz + H * V
    o1 = o0 + 3 * H * PV
    o2 = o1 + H * PV
    ot['kernel'] = np.concatenate([
        kern[:o0], kern[o0:o1][perm_pv], kern[o1:o2], kern[o2:][perm_pv],
    ], axis=0)
    p['out_transform'] = ot
    p['spatial_coef'] = _np(sd[f'{prefix}.spatial_coef'])
    p['LayerNorm_0'] = _layernorm(sd, f'{prefix}.layer_norm_1')
    p['LayerNorm_1'] = _layernorm(sd, f'{prefix}.layer_norm_2')
    p |= _mlp(sd, f'{prefix}.mlp_transition', (0, 2, 4))
    return p


def convert_residue_embed(sd: Mapping, prefix: str = 'residue_embed') -> Dict:
    return {
        'Embed_0': _embed(sd, f'{prefix}.aatype_embed'),
        'Embed_1': _embed(sd, f'{prefix}.type_embed'),
        'MLP_0': _mlp(sd, f'{prefix}.mlp', (0, 2, 4, 6)),
    }


def convert_pair_embed(sd: Mapping, prefix: str = 'pair_embed') -> Dict:
    return {
        'Embed_0': _embed(sd, f'{prefix}.aa_pair_embed'),
        'Embed_1': _embed(sd, f'{prefix}.relpos_embed'),
        'Embed_2': _embed(sd, f'{prefix}.aapair_to_distcoef'),
        'Dense_0': _linear(sd, f'{prefix}.distance_embed.0'),
        'Dense_1': _linear(sd, f'{prefix}.distance_embed.2'),
        'MLP_0': _mlp(sd, f'{prefix}.out_mlp', (0, 2, 4)),
    }


def convert_eps_net(sd: Mapping, num_layers: int,
                    prefix: str = 'diffusion.eps_net') -> Dict:
    p = {
        'seq_embed': _embed(sd, f'{prefix}.current_sequence_embedding'),
        'res_feat_mixer': _mlp(sd, f'{prefix}.res_feat_mixer', (0, 2)),
        'encoder': {
            f'block_{i}': _ga_block(sd, f'{prefix}.encoder.blocks.{i}')
            for i in range(num_layers)
        },
        'eps_crd_net': _mlp(sd, f'{prefix}.eps_crd_net', (0, 2, 4)),
        'eps_rot_net': _mlp(sd, f'{prefix}.eps_rot_net', (0, 2, 4)),
        'eps_seq_net': _mlp(sd, f'{prefix}.eps_seq_net', (0, 2, 4)),
        'prmsd_predictor': {
            'LayerNorm_0': _layernorm(sd, f'{prefix}.prmsd_predictor.layer_norm'),
            'Dense_0': _linear(sd, f'{prefix}.prmsd_predictor.linear_1'),
            'Dense_1': _linear(sd, f'{prefix}.prmsd_predictor.linear_2'),
            'Dense_2': _linear(sd, f'{prefix}.prmsd_predictor.linear_3'),
        },
    }
    return p


def convert_diffab_state_dict(sd: Mapping, num_layers: int = 6) -> Dict:
    """Full DiffusionAntibodyDesign state_dict -> DiffAbNet params pytree."""
    return {'params': {
        'residue_embed': convert_residue_embed(sd),
        'pair_embed': convert_pair_embed(sd),
        'eps_net': convert_eps_net(sd, num_layers),
    }}


# --------------------------------------------------------------------------- #
# AbDesign diff_gnn (MCAttEGNN / SeqGNN) -> DenseMCAttEGNN / DenseSeqGNN
# --------------------------------------------------------------------------- #


def _geom_perm(C: int) -> np.ndarray:
    """Row permutation mapping our geom layout onto the reference's.

    The reference concatenates radial/dist per channel row —
    cat([radial, dist], -1).reshape(E, 2C^2) interleaves as
    [rad_c1 (C), dist_c1 (C), rad_c2, ...] (mc_egnn.py:181-182) — while the
    dense rewrite lays out [radial (C^2) | dist (C^2)]. Returns ``perm`` with
    ours[i] = theirs[perm[i]].
    """
    perm = np.empty(2 * C * C, np.int64)
    for half in range(2):
        for c1 in range(C):
            for c2 in range(C):
                perm[half * C * C + c1 * C + c2] = c1 * 2 * C + half * C + c2
    return perm


def _linear_rows_permuted(sd: Mapping, prefix: str, sections, C: int) -> Dict:
    """Linear whose input rows contain a geom section needing permutation.

    ``sections``: list of (width, kind) with kind 'id' or 'geom'.
    """
    kernel = _np(sd[f'{prefix}.weight']).T            # (in, out)
    rows = []
    off = 0
    for width, kind in sections:
        block = kernel[off:off + width]
        if kind == 'geom':
            block = block[_geom_perm(C)]
        rows.append(block)
        off += width
    out = {'kernel': np.concatenate(rows, axis=0)}
    if f'{prefix}.bias' in sd:
        out['bias'] = _np(sd[f'{prefix}.bias'])
    return out


def _linear_kv_deinterleaved(sd: Mapping, prefix: str, sections, C: int) -> Dict:
    """The reference's fused k/v projection reads k = kv[..., 0::2],
    v = kv[..., 1::2] (mc_egnn.py:256); the dense rewrite splits contiguous
    halves — de-interleave the output columns (and permute geom input rows).
    """
    p = _linear_rows_permuted(sd, prefix, sections, C)
    k = p['kernel']
    p['kernel'] = np.concatenate([k[:, 0::2], k[:, 1::2]], axis=1)
    if 'bias' in p:
        b = p['bias']
        p['bias'] = np.concatenate([b[0::2], b[1::2]])
    return p


def _mc_egcl(sd: Mapping, prefix: str, F: int, C: int, E: int) -> Dict:
    """MC_E_GCL -> DenseMCEGCL (mc_egnn.py:21-192). The reference's unused
    per-layer ``time_mlp`` parameters (forward always gets time_emb=None,
    mc_egnn.py:186) are intentionally dropped."""
    geo = 2 * C * C
    edge_sections = [(F, 'id'), (F, 'id'), (geo, 'geom')] + \
                    ([(E, 'id')] if E else [])
    return {
        'Dense_0': _linear_rows_permuted(sd, f'{prefix}.edge_mlp.0',
                                         edge_sections, C),
        'Dense_1': _linear(sd, f'{prefix}.edge_mlp.2'),
        'Dense_2': _linear(sd, f'{prefix}.coord_mlp.0'),
        'Dense_3': _linear(sd, f'{prefix}.coord_mlp.2'),
        'Dense_4': _linear(sd, f'{prefix}.node_mlp.0'),
        'Dense_5': _linear(sd, f'{prefix}.node_mlp.2'),
    }


def _mc_att(sd: Mapping, prefix: str, F: int, C: int, E: int = 0) -> Dict:
    """MC_Att_L -> DenseMCAttention (mc_egnn.py:194-330)."""
    geo = 2 * C * C
    kv_sections = [(geo, 'geom'), (F, 'id')] + ([(E, 'id')] if E else [])
    return {
        'linear_q': _linear(sd, f'{prefix}.linear_q'),
        'linear_kv': _linear_kv_deinterleaved(sd, f'{prefix}.linear_kv',
                                              kv_sections, C),
        'Dense_0': _linear(sd, f'{prefix}.coord_mlp.0'),
        'Dense_1': _linear(sd, f'{prefix}.coord_mlp.2'),
    }


def convert_seqgnn(sd: Mapping, F: int, C: int,
                   prefix: str = 'seqgnn') -> Dict:
    """SeqGNN -> DenseSeqGNN (mc_egnn.py:345-432)."""
    geo = 2 * C * C
    return {
        'linear_q': _linear(sd, f'{prefix}.linear_q'),
        'linear_kv': _linear_kv_deinterleaved(
            sd, f'{prefix}.linear_kv', [(geo, 'geom'), (F, 'id')], C),
        'Embed_0': _embed(sd, f'{prefix}.hydropathy_embed'),
        'Embed_1': _embed(sd, f'{prefix}.charge_embed'),
        'Dense_0': _linear(sd, f'{prefix}.mlp.0'),
        'Dense_1': _linear(sd, f'{prefix}.mlp.2'),
        'Dense_2': _linear(sd, f'{prefix}.mlp.4'),
    }


def convert_mcatt_egnn(sd: Mapping, n_layers: int, F: int, C: int, E: int,
                       prefix: str = 'gnn') -> Dict:
    """MCAttEGNN -> DenseMCAttEGNN (mc_egnn.py:434-556)."""
    p = {
        'linear_in': _linear(sd, f'{prefix}.linear_in'),
        'time_embedding': _linear(sd, f'{prefix}.time_embedding'),
        'out_layer': _mc_egcl(sd, f'{prefix}.out_layer', F, C, E),
        'linear_out': _linear(sd, f'{prefix}.linear_out'),
    }
    for i in range(n_layers):
        p[f'gcl_{i}'] = _mc_egcl(sd, f'{prefix}.gcl_{i}', F, C, E)
        p[f'att_{i}'] = _mc_att(sd, f'{prefix}.att_{i}', F, C)
    return p


def convert_diff_gnn_state_dict(sd: Mapping, n_layers: int = 6,
                                hidden: int = 128, n_channel: int = 3,
                                edge_feat_dim: int = 128) -> Dict:
    """Full AbDesign DiffusionGNN state_dict -> DiffGNNNet params pytree
    (ref AbDesign/diffab/models/diff_gnn.py:27-80)."""
    res = convert_residue_embed(sd, 'embed.residue_embed')
    if 'embed.residue_embed.hotspot_embed.weight' in sd:
        res['Embed_2'] = _embed(sd, 'embed.residue_embed.hotspot_embed')
    return {'params': {
        'residue_embed': res,
        'pair_embed': convert_pair_embed(sd, 'embed.pair_embed'),
        'gnn': convert_mcatt_egnn(sd, n_layers, hidden, n_channel,
                                  edge_feat_dim),
        'seqgnn': convert_seqgnn(sd, hidden, n_channel),
    }}
