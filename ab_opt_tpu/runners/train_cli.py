"""Training CLI (ref AbDock/train.py / AbDesign/train.py).

Usage: python train.py --config configs/train/dock_single.yml [--logdir ...]
"""
from __future__ import annotations

import argparse
import logging
import os
import shutil
import time

from ..data import PaddingCollate, get_dataset
from ..data.loader import DataLoader, inf_iterator
from ..models import get_model
from ..train import Trainer
from ..utils import load_config

logger = logging.getLogger('train')


def resolve_max_iters(args, config, restored_iteration: int) -> int:
    """Final training iteration for this invocation.

    Explicit --max_iters always wins; --finetune runs exactly
    ``finetune_iters`` iterations past the restored point (ref
    AbDesign/train.py:162 ``max_iters = it_first + args.finetune_iters``);
    otherwise the config's train.max_iters.
    """
    if args.max_iters is not None:
        return args.max_iters
    if args.finetune:
        return restored_iteration + args.finetune_iters
    return config['train']['max_iters']


def setup_logging(log_dir=None):
    handlers = [logging.StreamHandler()]
    if log_dir:
        handlers.append(logging.FileHandler(os.path.join(log_dir, 'train.log')))
    logging.basicConfig(level=logging.INFO, handlers=handlers,
                        format='[%(asctime)s] %(levelname)s %(name)s: %(message)s',
                        force=True)


def main(argv=None):
    from ..utils import enable_compile_cache
    enable_compile_cache()  # skip recompiles across processes
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True)
    parser.add_argument('--logdir', type=str, default='./logs')
    parser.add_argument('--tag', type=str, default='')
    parser.add_argument('--resume', type=str, default=None)
    parser.add_argument('--finetune', type=str, default=None,
                        help='ckpt path: restore weights only, then train '
                             'for --finetune_iters extra iterations')
    parser.add_argument('--finetune_iters', type=int, default=200_000,
                        help='finite finetune schedule: with --finetune, '
                             'train this many iterations past the restored '
                             'point (ref AbDesign/train.py:29-30,162)')
    parser.add_argument('--max_iters', type=int, default=None)
    parser.add_argument('--num_devices', type=int, default=None)
    parser.add_argument('--seed', type=int, default=None)
    args = parser.parse_args(argv)

    config, config_name = load_config(args.config)
    seed = args.seed if args.seed is not None else config['train'].get('seed', 2022)

    if args.resume:
        log_dir = os.path.dirname(os.path.dirname(args.resume))
    else:
        stamp = time.strftime('%Y_%m_%d__%H_%M_%S')
        name = f'{config_name}_{args.tag}_{stamp}' if args.tag else f'{config_name}_{stamp}'
        log_dir = os.path.join(args.logdir, name)
    os.makedirs(log_dir, exist_ok=True)
    setup_logging(log_dir)
    if not os.path.exists(os.path.join(log_dir, os.path.basename(args.config))):
        shutil.copyfile(args.config,
                        os.path.join(log_dir, os.path.basename(args.config)))
    logger.info('config: %s | log_dir: %s', args.config, log_dir)

    train_dataset = get_dataset(config['dataset']['train'])
    val_dataset = get_dataset(config['dataset']['val'])
    logger.info('train %d | val %d', len(train_dataset), len(val_dataset))

    collate = PaddingCollate()
    batch_size = config['train']['batch_size']
    num_workers = int(config['train'].get('num_workers', 0))
    train_loader = DataLoader(train_dataset, batch_size, collate_fn=collate,
                              shuffle=True, seed=seed,
                              num_workers=num_workers, pad_partial=True)
    val_loader = DataLoader(val_dataset, batch_size, collate_fn=collate,
                            shuffle=False, seed=seed, prefetch=0)

    model = get_model(config['model'])
    trainer = Trainer(model, config['train'], log_dir=log_dir,
                      n_devices=args.num_devices, full_config=dict(config))
    trainer.init_params(next(iter(train_loader)), seed=seed)
    if args.resume:
        trainer.resume(args.resume)
    elif args.finetune:
        trainer.resume(args.finetune, finetune=True)
    max_iters = resolve_max_iters(args, config, trainer.iteration)

    # AbDesign-style sampling-in-the-loop validation: design the first
    # `sampling_eval.num_items` val structures every val period and track
    # the best checkpoint by CDR-H3 RMSD (AbDesign/train.py:150-184).
    eval_cfg = config['train'].get('sampling_eval') or {}
    eval_items = None
    if eval_cfg.get('enabled'):
        n_items = int(eval_cfg.get('num_items', 4))
        eval_items = [val_dataset[i]
                      for i in range(min(n_items, len(val_dataset)))]

    trainer.train(inf_iterator(train_loader), val_loader=val_loader,
                  max_iters=max_iters,
                  seed=seed, sampling_eval_items=eval_items,
                  sampling_eval_samples=int(eval_cfg.get('num_samples', 1)))
    return trainer


if __name__ == '__main__':
    main()
