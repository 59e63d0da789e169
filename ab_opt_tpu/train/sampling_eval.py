"""Sampling-in-the-loop validation (AbDesign's eval strategy).

Rewrite of ``AbDesign/diffab/utils/train.py:302`` (eval_on_dataset) +
``val.py:115-201`` + ``misc.py:234-290``: every val period, design the val
structures and log per-CDR CA-RMSD and AAR; checkpoints are ranked by
H_CDR3 RMSD (AbDesign/train.py:150-184).
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..data.collate import PaddingCollate, to_device_batch
from ..metrics import amino_acid_recovery, ca_rmsd

logger = logging.getLogger(__name__)


_CDR_TAGS = {1: 'H_CDR1', 2: 'H_CDR2', 3: 'H_CDR3',
             4: 'L_CDR1', 5: 'L_CDR2', 6: 'L_CDR3'}


def _cdr_tag(cdr_flag: np.ndarray, gen: np.ndarray) -> str:
    """Name of the (single) CDR being generated, or 'region'."""
    vals, counts = np.unique(cdr_flag[gen], return_counts=True)
    vals = vals[vals > 0]
    if len(vals) == 0:
        return 'region'
    return _CDR_TAGS.get(int(vals[np.argmax(counts[-len(vals):])]), 'region')


def evaluate_samples(model, params, items: List[Dict], key,
                     num_samples: int = 1, batch_size: int = 8,
                     out_dir: Optional[str] = None) -> Dict[str, float]:
    """Sample each val item and compute CA-RMSD + AAR on the generate region.

    ``items`` are transformed (merged/cropped) structure dicts. Returns
    global means plus per-CDR breakdown (``rmsd/H_CDR3`` etc., mirroring the
    reference's per-variant eval, AbDesign/diffab/utils/train.py:302-360).
    With ``out_dir``, each sampled crop is dumped as a PDB and a per-sample
    ``results.csv`` is written (misc.py:234-290).
    """
    from ..utils.compile_cache import jit_sample
    collate = PaddingCollate()
    sample_fn = jit_sample(lambda p, b, k: model.sample(p, b, k))
    per_tag: Dict[str, Dict[str, list]] = {}
    rows = []
    for lo in range(0, len(items), batch_size):
        chunk = items[lo:lo + batch_size]
        reps = num_samples if num_samples > 1 else 1
        batch_np = collate(chunk * reps)
        batch = to_device_batch(batch_np)
        out = sample_fn(params, batch, jax.random.fold_in(key, lo))
        p = np.asarray(out['p'])
        s = np.asarray(out['s'])
        gen = np.asarray(batch_np['generate_flag']) & np.asarray(batch_np['mask'])
        cdr_flag = np.asarray(batch_np.get('cdr_flag', np.zeros(gen.shape, np.int32)))
        native_ca = np.asarray(batch_np['pos_heavyatom'][:, :, 1])
        native_aa = np.asarray(batch_np['aa'])
        for i in range(p.shape[0]):
            g = gen[i]
            if g.sum() == 0:
                continue
            tag = _cdr_tag(cdr_flag[i], g)
            rmsd = ca_rmsd(p[i][g], native_ca[i][g])
            aar = amino_acid_recovery(s[i][g], native_aa[i][g])
            acc = per_tag.setdefault(tag, {'rmsd': [], 'aar': []})
            acc['rmsd'].append(rmsd)
            acc['aar'].append(aar)
            rows.append({'item': lo + i, 'tag': tag,
                         'rmsd': round(float(rmsd), 4),
                         'aar': round(float(aar), 4)})
            if out_dir is not None:
                _dump_sample(out_dir, f'{lo + i:04d}_{tag}', batch_np, out, i)

    rmsds = [r for acc in per_tag.values() for r in acc['rmsd']]
    aars = [a for acc in per_tag.values() for a in acc['aar']]
    result = {
        'rmsd': float(np.mean(rmsds)) if rmsds else float('nan'),
        'aar': float(np.mean(aars)) if aars else float('nan'),
        'n': len(rmsds),
    }
    for tag, acc in sorted(per_tag.items()):
        result[f'rmsd/{tag}'] = float(np.mean(acc['rmsd']))
        result[f'aar/{tag}'] = float(np.mean(acc['aar']))
    if out_dir is not None and rows:
        import pandas as pd
        os.makedirs(out_dir, exist_ok=True)
        pd.DataFrame(rows).to_csv(os.path.join(out_dir, 'results.csv'),
                                  index=False)
    return result


def _dump_sample(out_dir: str, name: str, batch_np, out, i: int) -> None:
    """Write one sampled crop as a PDB (backbone rebuilt from v/p/s)."""
    from ..data.pdb import save_pdb
    from ..geometry import reconstruct_backbone_partially, so3vec_to_rotation
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    sl = slice(i, i + 1)
    pos_new, mask_new = reconstruct_backbone_partially(
        jnp.asarray(batch_np['pos_heavyatom'][sl]),
        so3vec_to_rotation(jnp.asarray(out['v'][sl])),
        jnp.asarray(out['p'][sl]), jnp.asarray(out['s'][sl]),
        jnp.asarray(batch_np['chain_nb'][sl]),
        jnp.asarray(batch_np['res_nb'][sl]),
        jnp.asarray(batch_np['mask_heavyatom'][sl]),
        jnp.asarray(batch_np['generate_flag'][sl]))
    L = np.asarray(batch_np['aa'][i]).shape[0]
    data = {
        'chain_nb': batch_np['chain_nb'][i],
        'chain_id': batch_np.get('chain_id', [['A'] * L] * (i + 1))[i],
        'resseq': batch_np.get('resseq', [np.arange(1, L + 1)] * (i + 1))[i],
        'icode': batch_np.get('icode', [[' '] * L] * (i + 1))[i],
        'aa': np.asarray(out['s'][i]),
        'pos_heavyatom': np.asarray(pos_new[0]),
        'mask_heavyatom': np.asarray(mask_new[0]),
    }
    try:
        save_pdb(data, os.path.join(out_dir, f'{name}.pdb'))
    except Exception as e:                      # pragma: no cover
        logger.warning('sample dump failed for %s: %s', name, e)


class BestCheckpointTracker:
    """Keep the best checkpoint by val RMSD (AbDesign/train.py:168-184)."""

    def __init__(self, ckpt_dir: str, metric: str = 'rmsd', minimize: bool = True):
        self.ckpt_dir = ckpt_dir
        self.metric = metric
        self.minimize = minimize
        self.best: Optional[float] = None
        self.best_path: Optional[str] = None

    def update(self, value: float, save_fn, iteration: int) -> bool:
        better = (self.best is None
                  or (value < self.best if self.minimize else value > self.best))
        if better and np.isfinite(value):
            self.best = value
            path = os.path.join(
                self.ckpt_dir, f'best_{self.metric}_{value:.3f}_it{iteration}.ckpt')
            save_fn(path)
            if self.best_path and os.path.exists(self.best_path):
                os.unlink(self.best_path)
            self.best_path = path
            logger.info('New best %s=%.4f at it %d', self.metric, value, iteration)
        return better
