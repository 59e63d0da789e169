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


def _ga_block(sd: Mapping, prefix: str) -> Dict:
    p = {}
    for name in ('proj_query', 'proj_key', 'proj_value', 'proj_pair_bias',
                 'proj_query_point', 'proj_key_point', 'proj_value_point'):
        p[name] = _linear(sd, f'{prefix}.{name}')
    p['out_transform'] = _linear(sd, f'{prefix}.out_transform')
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
