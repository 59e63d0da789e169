"""Training loop: data-parallel optax training with the reference's
operational semantics (AbDock/train.py:19-179):

* weighted multi-loss objective + gradient clipping (global norm 100)
* validation every ``val_freq`` + plateau LR scheduling on the val loss
* NaN/Inf loss guard that dumps the offending batch then aborts
* checkpoints embedding the config, resumable with optimizer state
* wandb-style logging replaced by python-logging + optional CSV tape.
"""
from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.collate import to_device_batch
from ..parallel import sharded_train_step
from ..parallel.mesh import auto_mesh_for_batch
from .checkpoint import load_checkpoint, restore_into, save_checkpoint

logger = logging.getLogger(__name__)


def build_optimizer(cfg: Dict) -> optax.GradientTransformation:
    """Optimizer factory (ref src/utils/train.py:8-27)."""
    typ = cfg.get('type', 'adam')
    lr = float(cfg.get('lr', 1e-4))
    if typ == 'adam':
        wd = float(cfg.get('weight_decay', 0.0))
        b1 = float(cfg.get('beta1', 0.9))
        b2 = float(cfg.get('beta2', 0.999))
        if wd > 0:
            base = lambda learning_rate: optax.adamw(
                learning_rate, b1=b1, b2=b2, weight_decay=wd)
        else:
            base = lambda learning_rate: optax.adam(learning_rate, b1=b1, b2=b2)
        return optax.inject_hyperparams(base)(learning_rate=lr)
    raise ValueError(f'Unknown optimizer type {typ}')


class PlateauScheduler:
    """ReduceLROnPlateau (ref scheduler config: factor/patience/min_lr)."""

    def __init__(self, factor=0.8, patience=10, min_lr=5e-6, **_):
        self.factor = float(factor)
        self.patience = int(patience)
        self.min_lr = float(min_lr)
        self.best = float('inf')
        self.bad_epochs = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best - 1e-8:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.bad_epochs = 0
                return max(self.min_lr, lr * self.factor)
        return lr


class ExpScheduler:
    def __init__(self, factor=0.98, min_lr=1e-6, **_):
        self.factor, self.min_lr = float(factor), float(min_lr)

    def step(self, metric, lr):
        return max(self.min_lr, lr * self.factor)


def build_scheduler(cfg: Optional[Dict]):
    if not cfg:
        return None
    typ = cfg.get('type', 'plateau')
    if typ == 'plateau':
        return PlateauScheduler(**{k: v for k, v in cfg.items() if k != 'type'})
    if typ == 'exp':
        return ExpScheduler(**{k: v for k, v in cfg.items() if k != 'type'})
    raise ValueError(f'Unknown scheduler type {typ}')


class Trainer:
    def __init__(self, model, train_cfg: Dict, log_dir: Optional[str] = None,
                 n_devices: Optional[int] = None, full_config: Optional[Dict] = None):
        self.model = model
        self.cfg = train_cfg
        self.full_config = full_config or {}
        self.log_dir = log_dir
        self.ckpt_dir = os.path.join(log_dir, 'checkpoints') if log_dir else None
        if self.ckpt_dir:
            os.makedirs(self.ckpt_dir, exist_ok=True)

        batch_size = int(train_cfg.get('batch_size', 1))
        self.mesh = auto_mesh_for_batch(batch_size, n_devices)
        self.optimizer = build_optimizer(train_cfg.get('optimizer', {}))
        self.scheduler = build_scheduler(train_cfg.get('scheduler'))
        self.loss_weights = dict(train_cfg.get('loss_weights', {}))
        self.max_grad_norm = float(train_cfg.get('max_grad_norm', 100.0))
        self.lr = float(train_cfg.get('optimizer', {}).get('lr', 1e-4))

        self.step_fn = sharded_train_step(
            self.model.loss, self.optimizer, self.mesh,
            loss_weights=self.loss_weights, max_grad_norm=self.max_grad_norm)
        self._val_loss_fn = jax.jit(self.model.loss)

        self.params = None
        self.opt_state = None
        self.iteration = 0
        from collections import deque
        self._pending_checks = deque()

        # wandb gated on the `wandb` env var, like the reference
        # (AbDock/train.py:35-37,116-119).
        self._wandb = None
        if os.environ.get('wandb'):
            try:
                import wandb
                wandb.init(project='ab_opt_tpu',
                           config=dict(self.full_config))
                self._wandb = wandb
            except ImportError:
                logger.warning('wandb requested but not installed')

    # ------------------------------------------------------------------ setup

    def init_params(self, example_batch, seed: int = 0):
        batch = to_device_batch(example_batch)
        self.params = self.model.init(jax.random.key(seed), batch)
        self.opt_state = self.optimizer.init(self.params)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.params))
        logger.info('Initialized %d parameters', n_params)
        return self.params

    def resume(self, ckpt_path: str, finetune: bool = False):
        """--resume restores everything; --finetune only weights
        (ref train.py:80-93)."""
        saved = load_checkpoint(ckpt_path)
        if self.params is None:
            raise RuntimeError('call init_params() before resume()')
        self.params = restore_into(self.params, saved['params'])
        if not finetune:
            if saved.get('opt_state') is not None:
                self.opt_state = restore_into(self.opt_state, saved['opt_state'])
            self.iteration = int(saved.get('iteration', 0))
            self.lr = float(saved.get('extra', {}).get('lr', self.lr))
        logger.info('Restored checkpoint %s at iteration %d', ckpt_path,
                    self.iteration)

    def save(self, extra: Optional[Dict] = None) -> Optional[str]:
        if not self.ckpt_dir:
            return None
        path = os.path.join(self.ckpt_dir, f'{self.iteration}.ckpt')
        return save_checkpoint(
            path, config=self.full_config, params=self.params,
            opt_state=self.opt_state, iteration=self.iteration,
            extra=dict(extra or {}, lr=self.lr))

    # ------------------------------------------------------------------ steps

    def _set_lr(self, lr: float):
        self.lr = lr
        # inject_hyperparams keeps hyperparams in opt_state (InjectHyperparamsState)
        try:
            self.opt_state.hyperparams['learning_rate'] = jnp.asarray(lr)
        except (AttributeError, TypeError):
            logger.warning('Could not set learning rate dynamically')

    def train_step(self, batch_np: Dict, key) -> Dict:
        """One optimizer step; returns the loss dict as device scalars
        (callers ``float()`` them at log time)."""
        return self._train_step_device(batch_np, to_device_batch(batch_np), key)

    def _train_step_device(self, batch_np: Dict, batch: Dict, key,
                           defer_nan_check: bool = False) -> Dict:
        """One optimizer step. Losses stay device-side (callers format/float
        them at log time). The finite guard is a single device scalar; with
        ``defer_nan_check`` the host checks it one step late so dispatch of
        the next step is never blocked on the current one finishing (the
        reference's per-step host check serialized the pipeline)."""
        self.params, self.opt_state, losses = self.step_fn(
            self.params, self.opt_state, batch, key)
        finite = losses.pop('_finite')
        self._pending_checks.append(
            (self.iteration, finite, batch_np, losses))
        if not defer_nan_check:
            self.flush_nan_checks()
        else:
            while len(self._pending_checks) > 1:
                self._check_oldest()
        self.iteration += 1
        return losses

    def _check_oldest(self):
        it, finite, batch_np, losses = self._pending_checks.popleft()
        if not bool(finite):
            losses = {k: float(v) for k, v in losses.items()}
            self._dump_nan_state(batch_np, losses, iteration=it)
            raise FloatingPointError(f'Non-finite loss at it {it}: {losses}')
        if self._wandb is not None:
            # Logged when the step's check drains (one step late under
            # defer_nan_check) so float() never blocks the next dispatch.
            self._wandb.log({f'train/{k}': float(v) for k, v in losses.items()},
                            step=it)

    def flush_nan_checks(self):
        while self._pending_checks:
            self._check_oldest()

    def _dump_nan_state(self, batch_np, losses, iteration=None):
        """NaN guard: persist the offending batch + params (ref train.py:128-138)."""
        if not self.log_dir:
            return
        it = self.iteration if iteration is None else iteration
        path = os.path.join(self.log_dir, f'nan_dump_it{it}.pkl')
        with open(path, 'wb') as f:
            pickle.dump({'batch': batch_np, 'losses': losses,
                         'iteration': it}, f)
        logger.error('Non-finite loss; dumped state to %s', path)

    def validate(self, val_loader: Iterable, key) -> float:
        """Average weighted validation loss; feeds the plateau scheduler."""
        tape = []
        for i, batch_np in enumerate(val_loader):
            batch = to_device_batch(batch_np)
            losses = self._val_loss_fn(self.params, batch,
                                       jax.random.fold_in(key, i))
            keys = ([k for k in losses if k in self.loss_weights]
                    if self.loss_weights else list(losses))
            total = sum(float(losses[k]) * self.loss_weights.get(k, 1.0)
                        for k in keys)
            tape.append(total)
        avg = float(np.mean(tape)) if tape else float('nan')
        if self._wandb is not None and np.isfinite(avg):
            self._wandb.log({'val/loss': avg}, step=self.iteration)
        if self.scheduler is not None and np.isfinite(avg):
            new_lr = self.scheduler.step(avg, self.lr)
            if new_lr != self.lr:
                logger.info('Plateau: lr %.3g -> %.3g', self.lr, new_lr)
                self._set_lr(new_lr)
        return avg

    def _sampling_eval(self, items, num_samples, key, tracker) -> Dict:
        """Design the val items, log per-CDR RMSD/AAR, update best ckpt."""
        from .sampling_eval import evaluate_samples
        out_dir = (os.path.join(self.log_dir, 'sampling_eval',
                                f'it{self.iteration}')
                   if self.log_dir else None)
        metrics = evaluate_samples(self.model, self.params, items, key,
                                   num_samples=num_samples, out_dir=out_dir)
        logger.info('sampling eval it %d | %s', self.iteration,
                    ' '.join(f'{k}={v:.4f}' for k, v in metrics.items()
                             if isinstance(v, float) and np.isfinite(v)))
        if self._wandb is not None:
            self._wandb.log({f'eval/{k}': v for k, v in metrics.items()},
                            step=self.iteration)
        # Rank by H_CDR3 RMSD like the reference; global RMSD otherwise.
        rank = metrics.get('rmsd/H_CDR3', metrics.get('rmsd', float('nan')))
        tracker.update(rank, lambda path: save_checkpoint(
            path, config=self.full_config, params=self.params,
            opt_state=None, iteration=self.iteration,
            extra={'sampling_eval': metrics, 'lr': self.lr}),
            self.iteration)
        return metrics

    # ------------------------------------------------------------------- loop

    def train(self, train_iterator, val_loader=None,
              max_iters: Optional[int] = None, seed: int = 0,
              log_every: int = 50,
              on_step: Optional[Callable[[int, Dict], None]] = None,
              sampling_eval_items: Optional[list] = None,
              sampling_eval_samples: int = 1):
        """``sampling_eval_items``: transformed val structures for
        sampling-in-the-loop validation (AbDesign's eval strategy,
        AbDesign/train.py:150-184): every val period, design them and track
        the best checkpoint by CDR-H3 CA-RMSD (falling back to the global
        RMSD when no H3 items exist); per-CDR metrics and sample PDBs land
        under ``<log_dir>/sampling_eval/it<iteration>/``."""
        max_iters = max_iters or int(self.cfg.get('max_iters', 1000))
        val_freq = int(self.cfg.get('val_freq', 1000))
        key = jax.random.key(seed + 1)

        best_tracker = None
        if sampling_eval_items:
            from .sampling_eval import BestCheckpointTracker
            best_tracker = BestCheckpointTracker(
                self.ckpt_dir or (self.log_dir or '.'), metric='rmsd')

        # Device prefetch: keep the next batch's H2D transfer in flight
        # while the current step computes (async dispatch overlaps them).
        from collections import deque
        pending = deque()

        def fetch():
            b = next(train_iterator)
            pending.append((b, to_device_batch(b)))

        fetch()
        t_last = time.time()
        while self.iteration < max_iters:
            batch_np, batch_dev = pending.popleft()
            if self.iteration + 1 < max_iters:
                fetch()
            losses = self._train_step_device(
                batch_np, batch_dev, jax.random.fold_in(key, self.iteration),
                defer_nan_check=True)
            if on_step is not None:
                on_step(self.iteration, losses)
            if self.iteration % log_every == 0:
                dt = time.time() - t_last
                t_last = time.time()
                logger.info('it %d | %s | lr %.2e | %.2f s/%d it',
                            self.iteration,
                            ' '.join(f'{k}={float(v):.4f}'
                                     for k, v in losses.items()),
                            self.lr, dt, log_every)
            if val_loader is not None and self.iteration % val_freq == 0:
                self.flush_nan_checks()
                avg = self.validate(
                    val_loader, jax.random.fold_in(key, 2 ** 30 + self.iteration))
                logger.info('val it %d | loss %.4f', self.iteration, avg)
                self.save(extra={'avg_val_loss': avg})
                if best_tracker is not None:
                    self._sampling_eval(sampling_eval_items,
                                        sampling_eval_samples,
                                        jax.random.fold_in(key, self.iteration),
                                        best_tracker)
        self.flush_nan_checks()
        if val_loader is None:
            self.save()
        return self.params
