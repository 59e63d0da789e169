"""Measure the reference PyTorch sampler's throughput on this host's CPU.

BASELINE.md's A100 figure for the reference (pengzhangzhi/ab_opt) was an
estimate — the reference publishes no throughput numbers. This script
replaces the hand-wave with a measurement: it instantiates the actual
reference model (AbDock/src/models/diffab.py, production dims 128/64,
6 IPA layers, 100 diffusion steps) with random weights and times
``model.sample`` on CPU for the same synthetic L=128 cropped-complex
workload ``bench.py`` uses.

CPU->A100 scaling argument (documented in BASELINE.md): the reference's
eager torch sampler is memory-bandwidth-bound (its per-step (N, L, L, H)
logit/alpha materializations dominate, ~3.6 GB/step at B=32). Scaling
measured CPU throughput by the DRAM->HBM bandwidth ratio bounds the A100
number from above; compute-bound scaling would be far larger but eager
torch at these shapes does not reach it.

Usage: python scripts/measure_torch_baseline.py [BATCH] [L] [ITERS]
       python scripts/measure_torch_baseline.py --train [BATCH] [L] [ITERS]
Prints one JSON line with samples/s.

``--train`` times one reference TRAINING step instead (forward loss dict +
sum_weighted_losses + backward + grad-clip + Adam step, mirroring
AbDock/train.py:96-126), giving the repo's measured TPU train throughput
(PERF.md) a torch divisor on identical shapes.
"""
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path('/root/reference/AbDock')

MODEL_CFG = {
    'type': 'diffab',
    'res_feat_dim': 128,
    'pair_feat_dim': 64,
    'num_bins': 40,
    'dist_min': 0.5,
    'dist_max': 19.5,
    'train_structure': True,
    'train_sequence': True,
    'diffusion': {'num_steps': 100, 'eps_net_opt': {'num_layers': 6},
                  'obj': 'pred_x0'},
}


def main():
    args = [a for a in sys.argv[1:] if a != '--train']
    train_mode = '--train' in sys.argv[1:]
    B = int(args[0]) if len(args) > 0 else 8
    L = int(args[1]) if len(args) > 1 else 128
    iters = int(args[2]) if len(args) > 2 else 1

    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / 'tests'))
    sys.path.insert(0, str(REF))
    # helpers imports jax; keep it off the TPU (the site customization
    # force-selects the axon platform regardless of JAX_PLATFORMS).
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import torch

    from helpers import make_batch
    from ab_opt_tpu.utils.config import ConfigDict
    from src.models.diffab import DiffusionAntibodyDesign

    torch.manual_seed(0)
    model = DiffusionAntibodyDesign(ConfigDict.wrap(MODEL_CFG)).eval()

    np_batch = make_batch(np.random.default_rng(0), N=B, L=L,
                          n_ab=int(L * 0.7), gen_lo=L // 4, gen_hi=L // 4 + 8)
    batch = {}
    for k, v in np_batch.items():
        a = np.asarray(v)
        if a.dtype == np.bool_:
            batch[k] = torch.from_numpy(a)
        elif np.issubdtype(a.dtype, np.integer):
            batch[k] = torch.from_numpy(a.astype(np.int64))
        else:
            batch[k] = torch.from_numpy(a.astype(np.float32))

    mode = 'train' if train_mode else 'sample'
    print(f'reference torch {mode}: B={B} L={L} '
          f'threads={torch.get_num_threads()}', file=sys.stderr, flush=True)

    if train_mode:
        # One reference training step (AbDock/train.py:96-126): forward loss
        # dict -> weighted sum -> backward -> clip -> Adam step. Weights per
        # configs/train/dock_single.yml (rot/pos/seq/distogram 1.0).
        from torch.nn.utils import clip_grad_norm_
        model = model.train()
        optimizer = torch.optim.Adam(model.parameters(), lr=1e-4)
        # Warm one step outside the timer (allocator + autograd graph init).
        for timed in (False, True):
            if timed:
                t0 = time.perf_counter()
            for _ in range(iters if timed else 1):
                loss_dict = model(batch)
                loss = sum(v for v in loss_dict.values() if v.requires_grad)
                loss.backward()
                clip_grad_norm_(model.parameters(), 100.0)
                optimizer.step()
                optimizer.zero_grad()
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            'metric': f'reference torch CPU train-step samples/s (L={L}, B={B})',
            'value': round(B / dt, 4),
            'seconds_per_step': round(dt, 2),
            'torch_threads': torch.get_num_threads(),
        }), flush=True)
        return

    with torch.no_grad():
        t0 = time.perf_counter()
        for _ in range(iters):
            traj = model.sample(batch, sample_opt={
                'sample_structure': True, 'sample_sequence': True,
                'contig': ''})
        dt = (time.perf_counter() - t0) / iters

    sps = B / dt
    print(json.dumps({
        'metric': f'reference torch CPU 100-step samples/s (L={L}, B={B})',
        'value': round(sps, 4),
        'seconds_per_batch': round(dt, 2),
        'torch_threads': torch.get_num_threads(),
        'traj_steps': len(traj),
    }), flush=True)


if __name__ == '__main__':
    main()
