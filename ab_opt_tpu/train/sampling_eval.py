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


def evaluate_samples(model, params, items: List[Dict], key,
                     num_samples: int = 1, batch_size: int = 8) -> Dict[str, float]:
    """Sample each val item and compute CA-RMSD + AAR on the generate region.

    ``items`` are transformed (merged/cropped) structure dicts.
    """
    collate = PaddingCollate()
    rmsds, aars = [], []
    sample_fn = jax.jit(lambda p, b, k: model.sample(p, b, k))
    for lo in range(0, len(items), batch_size):
        chunk = items[lo:lo + batch_size]
        batch_np = collate(chunk * num_samples if num_samples > 1 else chunk)
        batch = to_device_batch(batch_np)
        out = sample_fn(params, batch, jax.random.fold_in(key, lo))
        p = np.asarray(out['p'])
        s = np.asarray(out['s'])
        gen = np.asarray(batch_np['generate_flag']) & np.asarray(batch_np['mask'])
        native_ca = np.asarray(batch_np['pos_heavyatom'][:, :, 1])
        native_aa = np.asarray(batch_np['aa'])
        for i in range(p.shape[0]):
            g = gen[i]
            if g.sum() == 0:
                continue
            rmsds.append(ca_rmsd(p[i][g], native_ca[i][g]))
            aars.append(amino_acid_recovery(s[i][g], native_aa[i][g]))
    return {
        'rmsd': float(np.mean(rmsds)) if rmsds else float('nan'),
        'aar': float(np.mean(aars)) if aars else float('nan'),
        'n': len(rmsds),
    }


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
