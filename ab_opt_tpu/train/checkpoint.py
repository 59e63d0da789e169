"""Checkpoint save/restore with config-in-checkpoint semantics.

Mirrors the reference's ``torch.save({'config', 'model', 'optimizer',
'scheduler', 'iteration'})`` contract (AbDock/train.py:169-177): inference
rebuilds the exact architecture from the checkpoint's embedded config
(design_for_pdb.py:90-93). Storage is a pickle of numpy pytrees — portable,
dependency-free, and structurally validated on load against a template.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, config: Dict, params, opt_state=None,
                    iteration: int = 0, extra: Optional[Dict] = None) -> str:
    payload = {
        'config': config,
        'params': _to_numpy_tree(params),
        'opt_state': None if opt_state is None else _to_numpy_tree(opt_state),
        'iteration': iteration,
        'extra': extra or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        return pickle.load(f)


def restore_into(template, saved):
    """Restore saved leaves into a freshly-built template pytree (validates
    structure and shape)."""
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    s_leaves = jax.tree_util.tree_leaves(saved)
    if len(t_leaves) != len(s_leaves):
        raise ValueError(
            f'Checkpoint has {len(s_leaves)} leaves, template {len(t_leaves)}')
    out = []
    for t, s in zip(t_leaves, s_leaves):
        s = np.asarray(s)
        if hasattr(t, 'shape') and tuple(t.shape) != tuple(s.shape):
            raise ValueError(f'Shape mismatch: {t.shape} vs {s.shape}')
        out.append(s)
    return jax.tree_util.tree_unflatten(treedef, out)
