"""Multi-complex training validation on real antibody structures.

Environment constraint: the SAbDab dataset and reference checkpoints are not
available here (zero egress), so the paper-scale split (BASELINE.md) cannot
be trained against. This run is the strongest available stand-in: train the
small diffab config from scratch on the THREE real antibody-antigen
complexes bundled with the reference (7DK2, 5mes, 7bsd — Chothia-numbered),
with the production data pipeline (merge -> single-CDR masking over all six
CDRs with shrink/extend augmentation -> patch crop) and AbDesign-style
sampling-in-the-loop validation (per-CDR RMSD/AAR + best-checkpoint
tracking, ref AbDesign/train.py:150-184).

Writes <out>/metrics.jsonl (train losses + eval points) and prints a final
summary line.

Usage: python scripts/validation_train.py [--steps 3000] [--out /tmp/val_run]
"""
import argparse
import copy
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

EXAMPLES = '/root/reference/AbDock/data/examples'
COMPLEXES = [
    ('7DK2', f'{EXAMPLES}/7DK2_AB_C_chothia.pdb', 'A', 'B'),
    ('5mes', f'{EXAMPLES}/5mes_H_L_A_chothia.pdb', 'H', 'L'),
    ('7bsd', f'{EXAMPLES}/7bsd_A_B_G_chothia.pdb', 'A', 'B'),
    # Antibody-only Fv (no antigen) — exercises the antigen-free path.
    ('3QHF', f'{EXAMPLES}/3QHF_Fv.pdb', 'H', 'L'),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=3000)
    ap.add_argument('--out', default='/tmp/val_run')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--eval_every', type=int, default=500)
    ap.add_argument('--dims', choices=('small', 'production'), default='small',
                    help='production = 128/64 feats, 6 IPA layers, 100 '
                         'diffusion steps (the reference training config, '
                         'AbDock/configs/train/dock_single.yml)')
    ap.add_argument('--overfit', action='store_true',
                    help='memorization check: train on ONE complex with a '
                         'fixed CDR-H3 mask (no augmentation); AAR must '
                         'approach 1.0')
    ap.add_argument('--model', choices=('diffab', 'diff_gnn'),
                    default='diffab',
                    help='diff_gnn = the AbDesign graph path (hotspot patch '
                         '+ hydropathy/charge labels, EGNN denoiser)')
    ap.add_argument('--holdout', default=None,
                    help='leave-one-complex-out generalization protocol '
                         '(the antigen-held-out split in miniature, ref '
                         'AbDesign/diffab/utils/train.py:302): train on the '
                         'OTHER bundled complexes, run the sampling eval '
                         'ONLY on this held-out id (e.g. 7DK2)')
    args = ap.parse_args()

    import jax
    from ab_opt_tpu.data.collate import PaddingCollate
    from ab_opt_tpu.data.structures import preprocess_antibody_structure
    from ab_opt_tpu.data.transforms import get_transform
    from ab_opt_tpu.models import DiffAb, DiffAbConfig, get_model
    from ab_opt_tpu.train import Trainer

    os.makedirs(args.out, exist_ok=True)
    complexes = COMPLEXES[:1] if args.overfit else COMPLEXES
    if args.model == 'diff_gnn':
        # The hotspot patch crop needs an antigen; drop the bare Fv.
        complexes = [c for c in complexes if c[0] != '3QHF']
    if args.holdout:
        ids = [c[0] for c in complexes]
        assert args.holdout in ids, f'{args.holdout} not in {ids}'
        assert not args.overfit, '--holdout and --overfit are exclusive'
    structures = []
    holdout_structures = []
    for sid, path, h, l in complexes:
        s = preprocess_antibody_structure(
            {'id': sid, 'pdb_path': path, 'heavy_id': h, 'light_id': l})
        assert s is not None, sid
        (holdout_structures if sid == args.holdout else structures).append(s)
    print(f'parsed {len(structures)} train complexes'
          + (f' + held-out {args.holdout}' if args.holdout else ''),
          flush=True)

    if args.model == 'diff_gnn':
        # AbDesign graph-path pipeline (ref configs/train/codesign_single_gnn
        # .yml): hotspot-labelled patch crop + hydropathy/charge labels.
        def gnn_tfms(mask_tfm, drop_prob):
            return get_transform([
                mask_tfm,
                {'type': 'merge_chains'},
                {'type': 'patch_around_anchor_hotspot',
                 'initial_patch_size': 96, 'antigen_size': 64,
                 'max_nb_hotspots': 3},
                {'type': 'aa_label', 'hydropathy': True, 'charge': True,
                 'drop_prob': drop_prob},
            ])
        train_tfm = gnn_tfms(
            {'type': 'mask_single_cdr', 'selection': 'CDR3',
             'augmentation': False} if args.overfit else
            {'type': 'mask_single_cdr', 'augmentation': True}, 0.3)
        eval_tfm = gnn_tfms({'type': 'mask_single_cdr', 'selection': 'CDR3',
                             'augmentation': False}, 0.0)
    else:
        train_tfm = get_transform([
            ({'type': 'mask_single_cdr', 'selection': 'CDR3',
              'augmentation': False} if args.overfit else
             {'type': 'mask_single_cdr', 'augmentation': True}),
            {'type': 'merge_chains'},
            {'type': 'patch_around_anchor', 'initial_patch_size': 96,
             'antigen_size': 64},
        ])
        eval_tfm = get_transform([
            {'type': 'mask_single_cdr', 'selection': 'CDR3',
             'augmentation': False},
            {'type': 'merge_chains'},
            {'type': 'patch_around_anchor', 'initial_patch_size': 96,
             'antigen_size': 64},
        ])

    rng = np.random.default_rng(0)
    collate = PaddingCollate(buckets=(96, 128, 160, 192))

    def make_batch(r):
        items = []
        for _ in range(args.batch):
            s = structures[int(r.integers(len(structures)))]
            items.append(train_tfm(copy.deepcopy(s), rng=r))
        return collate(items)

    eval_items = [eval_tfm(copy.deepcopy(s), rng=np.random.default_rng(1))
                  for s in (holdout_structures if args.holdout
                            else structures)]

    if args.model == 'diff_gnn':
        if args.dims == 'production':
            # Reference: AbDesign/configs/train/codesign_single_gnn.yml
            # (128-dim embeddings, 128 hidden, 6 EGNN layers, 100 steps).
            model = get_model({'type': 'diff_gnn', 'res_feat_dim': 128,
                               'edge_feat_dim': 64, 'hidden_size': 128,
                               'num_steps': 100, 'n_layers': 6})
        else:
            model = get_model({'type': 'diff_gnn', 'res_feat_dim': 64,
                               'edge_feat_dim': 32, 'hidden_size': 64,
                               'num_steps': 50, 'n_layers': 3})
        weights = {'rot': 1.0, 'pos': 1.0, 'bb_pos': 1.0, 'seq': 1.0}
    elif args.dims == 'production':
        # Reference training config: AbDock/configs/train/dock_single.yml
        # (res 128 / pair 64, 6 IPA layers, 100 diffusion steps).
        model = DiffAb(DiffAbConfig(dtype='bfloat16'))
        weights = {'rot': 1.0, 'pos': 1.0, 'seq': 1.0, 'dist': 1.0,
                   'prmsd': 0.1}
    else:
        model = DiffAb(DiffAbConfig(
            res_feat_dim=64, pair_feat_dim=32, num_layers=3, num_steps=50,
            num_bins=16, dtype='bfloat16'))
        weights = {'rot': 1.0, 'pos': 1.0, 'seq': 1.0, 'dist': 1.0,
                   'prmsd': 0.1}
    train_cfg = {
        'loss_weights': weights,
        'max_iters': args.steps, 'val_freq': args.eval_every,
        'batch_size': args.batch, 'max_grad_norm': 100.0,
        'optimizer': {'type': 'adam', 'lr': 1e-4},
        'scheduler': {'type': 'plateau', 'factor': 0.8, 'patience': 8,
                      'min_lr': 1e-5},
    }
    trainer = Trainer(model, train_cfg, log_dir=args.out,
                      full_config={'model': {'type': args.model}})
    trainer.init_params(make_batch(rng), seed=0)

    metrics_path = os.path.join(args.out, 'metrics.jsonl')
    t0 = time.time()
    with open(metrics_path, 'w') as mf:
        def train_iter():
            r = np.random.default_rng(7)
            while True:
                yield make_batch(r)

        step_times = []
        last_t = [time.time()]

        def on_step(it, losses):
            now = time.time()
            step_times.append(now - last_t[0])
            last_t[0] = now
            if it % 100 == 0:
                rec = {'it': it, 'wall_s': round(now - t0, 1),
                       **{k: round(float(v), 4) for k, v in losses.items()}}
                mf.write(json.dumps(rec) + '\n')
                mf.flush()
                print(rec, flush=True)

        val_batches = [collate([it]) for it in eval_items]
        trainer.train(train_iter(), val_loader=val_batches,
                      max_iters=args.steps, on_step=on_step,
                      sampling_eval_items=eval_items,
                      sampling_eval_samples=4)

    # Train throughput: median per-step wall time is robust to the compile
    # outliers (first step + each new padding bucket) and eval pauses.
    med = float(np.median(step_times)) if step_times else float('nan')
    print('THROUGHPUT', json.dumps({
        'model': args.model, 'dims': args.dims, 'batch': args.batch,
        'holdout': args.holdout,
        'median_step_s': round(med, 4),
        'train_steps_per_s': round(1.0 / med, 2),
        'train_samples_per_s': round(args.batch / med, 2)}), flush=True)

    # Final sampling eval with more samples.
    from ab_opt_tpu.train.sampling_eval import evaluate_samples
    final = evaluate_samples(model, trainer.params, eval_items,
                             jax.random.key(123), num_samples=8,
                             out_dir=os.path.join(args.out, 'final_eval'))
    print('FINAL', json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                               for k, v in final.items()}), flush=True)


if __name__ == '__main__':
    main()
