"""Trainer tests: loss decreases, checkpoints roundtrip, NaN guard, loader."""
import numpy as np
import pytest

import jax

from ab_opt_tpu.data.collate import PaddingCollate
from ab_opt_tpu.data.loader import DataLoader, TransformedDataset, inf_iterator
from ab_opt_tpu.models import DiffAb, DiffAbConfig
from ab_opt_tpu.train import Trainer, load_checkpoint
from helpers import make_batch


CFG = DiffAbConfig(res_feat_dim=16, pair_feat_dim=8, num_steps=8,
                   num_layers=1, num_bins=8)
TRAIN_CFG = {
    'loss_weights': {'rot': 1.0, 'pos': 1.0, 'seq': 1.0, 'dist': 1.0,
                     'prmsd': 0.1},
    'max_iters': 30,
    'val_freq': 10,
    'batch_size': 4,
    'max_grad_norm': 100.0,
    'optimizer': {'type': 'adam', 'lr': 1e-3},
    'scheduler': {'type': 'plateau', 'factor': 0.5, 'patience': 2,
                  'min_lr': 1e-5},
}


def _unbatch(batch, i):
    return {k: np.asarray(v[i]) for k, v in batch.items()}


@pytest.fixture(scope='module')
def data():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, N=8, L=16)
    items = [_unbatch(batch, i % 8) for i in range(8)]
    return items


def test_loader_shapes(data):
    loader = DataLoader(TransformedDataset(data, None), batch_size=4,
                        collate_fn=PaddingCollate(buckets=(16, 32)))
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]['aa'].shape == (4, 16)
    assert 'mask' in batches[0]


def test_loader_pad_partial(data):
    """pad_partial wraps a trailing short batch to the full batch_size so
    every global batch stays divisible by the dp mesh (train_cli loader)."""
    ds = TransformedDataset(data[:5], None)
    kw = dict(batch_size=4, collate_fn=PaddingCollate(buckets=(16, 32)),
              shuffle=False, prefetch=0)
    plain = list(DataLoader(ds, **kw))
    assert [b['aa'].shape[0] for b in plain] == [4, 1]
    padded = list(DataLoader(ds, pad_partial=True, **kw))
    assert [b['aa'].shape[0] for b in padded] == [4, 4]
    # Wrapped rows re-use the epoch head (items 0-2 after item 4).
    np.testing.assert_array_equal(padded[1]['aa'][1:], padded[0]['aa'][:3])
    # Dataset smaller than batch_size still fills a whole batch.
    tiny = list(DataLoader(TransformedDataset(data[:1], None),
                           pad_partial=True, **kw))
    assert [b['aa'].shape[0] for b in tiny] == [4]


class _Flaky:
    """Module-level (picklable for the forkserver pool) flaky dataset."""

    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        from ab_opt_tpu.data.transforms import DISTVIOLATION
        if i % 2 == 1:
            raise DISTVIOLATION('synthetic')
        return self.items[i]


def test_loader_process_pool_matches_inline(data):
    """num_workers>0 (forkserver pool, reference num_workers=8 analog) yields
    the same batches as the inline path for deterministic datasets."""
    kw = dict(batch_size=4, collate_fn=PaddingCollate(buckets=(16, 32)),
              shuffle=False, seed=7)
    inline = list(DataLoader(TransformedDataset(data, None), **kw))
    pooled_loader = DataLoader(TransformedDataset(data, None),
                               num_workers=2, **kw)
    pooled = list(pooled_loader)
    pooled_loader.close()
    assert len(pooled) == len(inline)
    for a, b in zip(pooled, inline):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_loader_process_pool_resamples_violations(data):
    """Worker-side DISTVIOLATION resampling (ref sabdab.py:502-512)."""
    loader = DataLoader(_Flaky(data), batch_size=4, shuffle=False,
                        collate_fn=PaddingCollate(buckets=(16, 32)),
                        num_workers=2)
    batches = list(loader)
    loader.close()
    assert len(batches) == 2 and batches[0]['aa'].shape[0] == 4


@pytest.mark.nightly
def test_overfit_small(tmp_path, data):
    model = DiffAb(CFG)
    trainer = Trainer(model, TRAIN_CFG, log_dir=str(tmp_path),
                      full_config={'model': {'type': 'diffab'}})
    collate = PaddingCollate(buckets=(16,))
    loader = DataLoader(TransformedDataset(data, None), batch_size=4,
                        collate_fn=collate, prefetch=0)
    fixed_batch = next(iter(loader))
    trainer.init_params(fixed_batch)

    def eval_loss(params):
        from ab_opt_tpu.data.collate import to_device_batch
        d = trainer.model.loss(params, to_device_batch(fixed_batch),
                               jax.random.key(42))
        return sum(float(v) * TRAIN_CFG['loss_weights'][k] for k, v in d.items())

    before = eval_loss(trainer.params)
    trainer.train(inf_iterator(loader), val_loader=loader, max_iters=30,
                  log_every=1000)
    assert trainer.iteration == 30
    # Training reduces the (fixed-key, deterministic) loss on the overfit set.
    after = eval_loss(trainer.params)
    assert after < before

    # Checkpoint written at val_freq; reload and verify params restore.
    import glob
    ckpts = glob.glob(str(tmp_path / 'checkpoints' / '*.ckpt'))
    assert ckpts
    saved = load_checkpoint(sorted(ckpts)[-1])
    assert saved['config'] == {'model': {'type': 'diffab'}}
    assert saved['iteration'] > 0

    # Resume into a fresh trainer.
    t2 = Trainer(DiffAb(CFG), TRAIN_CFG, log_dir=None)
    t2.init_params(next(iter(loader)))
    t2.resume(sorted(ckpts)[-1])
    assert t2.iteration == saved['iteration']
    a = jax.tree_util.tree_leaves(trainer.params)
    # fresh params differ from trained, restored match saved
    s = jax.tree_util.tree_leaves(saved['params'])
    r = jax.tree_util.tree_leaves(t2.params)
    assert all(np.allclose(x, y) for x, y in zip(s, r))


def test_nan_guard(tmp_path, data):
    model = DiffAb(CFG)
    trainer = Trainer(model, TRAIN_CFG, log_dir=str(tmp_path))
    collate = PaddingCollate(buckets=(16,))
    loader = DataLoader(TransformedDataset(data, None), batch_size=4,
                        collate_fn=collate, prefetch=0)
    batch = next(iter(loader))
    trainer.init_params(batch)
    bad = dict(batch)
    bad['pos_heavyatom'] = np.full_like(batch['pos_heavyatom'], np.nan)
    with pytest.raises(FloatingPointError):
        trainer.train_step(bad, jax.random.key(0))
    import glob
    assert glob.glob(str(tmp_path / 'nan_dump_*.pkl'))


def test_sampling_eval(tmp_path, data):
    """Per-CDR sampling eval + best-ckpt tracking + sample dumps
    (AbDesign/diffab/utils/train.py:302-360 analog)."""
    from ab_opt_tpu.train.sampling_eval import (BestCheckpointTracker,
                                                evaluate_samples)

    model = DiffAb(CFG)
    trainer = Trainer(model, TRAIN_CFG, log_dir=str(tmp_path))
    collate = PaddingCollate(buckets=(16,))
    loader = DataLoader(TransformedDataset(data, None), batch_size=4,
                        collate_fn=collate, prefetch=0)
    trainer.init_params(next(iter(loader)))

    items = [dict(d, cdr_flag=np.where(d['generate_flag'], 3, 0)
                  .astype(np.int32)) for d in data[:2]]
    out_dir = tmp_path / 'se'
    metrics = evaluate_samples(model, trainer.params, items,
                               jax.random.key(0), num_samples=2,
                               batch_size=4, out_dir=str(out_dir))
    assert np.isfinite(metrics['rmsd']) and 0 <= metrics['aar'] <= 1
    assert metrics['n'] == 4                       # 2 items x 2 samples
    assert np.isfinite(metrics['rmsd/H_CDR3'])     # per-CDR breakdown
    assert (out_dir / 'results.csv').exists()
    pdbs = list(out_dir.glob('*.pdb'))
    assert len(pdbs) == 4 and 'H_CDR3' in pdbs[0].name

    # Best tracker keeps exactly one best checkpoint.
    tracker = BestCheckpointTracker(str(tmp_path), metric='rmsd')
    assert tracker.update(5.0, lambda p: open(p, 'w').write('x'), 1)
    assert tracker.update(2.0, lambda p: open(p, 'w').write('x'), 2)
    assert not tracker.update(3.0, lambda p: open(p, 'w').write('x'), 3)
    import glob as _g
    assert len(_g.glob(str(tmp_path / 'best_rmsd_*.ckpt'))) == 1


def test_trainer_sampling_eval_integration(tmp_path, data):
    """trainer.train with sampling_eval_items writes eval dirs + best ckpt."""
    model = DiffAb(CFG)
    cfg = dict(TRAIN_CFG, max_iters=12, val_freq=10)
    trainer = Trainer(model, cfg, log_dir=str(tmp_path),
                      full_config={'model': {'type': 'diffab'}})
    collate = PaddingCollate(buckets=(16,))
    loader = DataLoader(TransformedDataset(data, None), batch_size=4,
                        collate_fn=collate, prefetch=0)
    trainer.init_params(next(iter(loader)))
    trainer.train(inf_iterator(loader), val_loader=loader, max_iters=12,
                  sampling_eval_items=data[:2])
    import glob as _g
    assert _g.glob(str(tmp_path / 'sampling_eval' / 'it*' / 'results.csv'))
    assert _g.glob(str(tmp_path / 'checkpoints' / 'best_rmsd_*.ckpt'))


def test_resolve_max_iters():
    """--finetune_iters caps the finetune schedule (ref AbDesign/train.py:162:
    ``max_iters = it_first + args.finetune_iters``); --max_iters overrides."""
    import argparse

    from ab_opt_tpu.runners.train_cli import resolve_max_iters

    ns = lambda **kw: argparse.Namespace(**{
        **dict(max_iters=None, finetune=None, finetune_iters=200_000), **kw})
    config = {'train': {'max_iters': 500}}
    # Plain run: config wins.
    assert resolve_max_iters(ns(), config, 0) == 500
    # Finetune: restored point + finetune_iters (restored iteration is 0
    # after a weights-only restore, so this is the extra-iterations count).
    assert resolve_max_iters(
        ns(finetune='x.ckpt', finetune_iters=7), config, 0) == 7
    assert resolve_max_iters(
        ns(finetune='x.ckpt', finetune_iters=7), config, 3) == 10
    # Explicit --max_iters always wins.
    assert resolve_max_iters(
        ns(finetune='x.ckpt', finetune_iters=7, max_iters=2), config, 3) == 2


def test_finetune_iters_cli_flow(tmp_path, data):
    """Full CLI flow: checkpoint -> --finetune --finetune_iters N trains
    exactly N iterations from the restored weights."""
    model = DiffAb(CFG)
    trainer = Trainer(model, TRAIN_CFG, log_dir=str(tmp_path),
                      full_config={'model': {'type': 'diffab'}})
    collate = PaddingCollate(buckets=(16,))
    loader = DataLoader(TransformedDataset(data, None), batch_size=4,
                        collate_fn=collate, prefetch=0)
    trainer.init_params(next(iter(loader)))
    trainer.iteration = 5
    ckpt = trainer.save()
    assert ckpt

    t2 = Trainer(DiffAb(CFG), TRAIN_CFG, log_dir=None)
    t2.init_params(next(iter(loader)))
    t2.resume(ckpt, finetune=True)
    assert t2.iteration == 0                    # weights-only restore
    import argparse

    from ab_opt_tpu.runners.train_cli import resolve_max_iters
    args = argparse.Namespace(max_iters=None, finetune=ckpt, finetune_iters=3)
    max_iters = resolve_max_iters(args, {'train': {'max_iters': 999}},
                                  t2.iteration)
    t2.train(inf_iterator(loader), max_iters=max_iters, log_every=1000)
    assert t2.iteration == 3
