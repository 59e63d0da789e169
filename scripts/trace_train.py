"""Trace one production-dims TRAIN step (fwd+bwd+adam) and print top device ops.

Same perfetto aggregation as trace_step.py, but over the shipped
sharded_train_step (1-device mesh) at batch 8, L=128, f32 — the judge-r4 #2
workload (train throughput vs A100_TRAIN_EST).

Usage: python scripts/trace_train.py [N] [L] [dtype]
"""
import glob
import gzip
import json
import pathlib
import re
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from __graft_entry__ import _make_batch
from ab_opt_tpu.models import DiffAb, DiffAbConfig


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    dtype = sys.argv[3] if len(sys.argv) > 3 else 'float32'

    import optax

    from ab_opt_tpu.parallel import make_mesh, sharded_train_step

    model = DiffAb(DiffAbConfig(dtype=dtype))
    batch = _make_batch(N=N, L=L)
    params = model.init(jax.random.key(0), batch)
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    step = sharded_train_step(
        model.loss, optimizer, make_mesh(1),
        loss_weights={'rot': 1.0, 'pos': 1.0, 'seq': 1.0, 'dist': 1.0,
                      'prmsd': 0.1},
        max_grad_norm=100.0)

    import time
    p, s = params, opt_state
    for i in range(3):
        p, s, losses = step(p, s, batch, jax.random.key(i))
        jax.block_until_ready(losses['overall'])
    t0 = time.perf_counter()
    iters = 5
    for i in range(iters):
        p, s, losses = step(p, s, batch, jax.random.key(10 + i))
        jax.block_until_ready(losses['overall'])
    dt = (time.perf_counter() - t0) / iters
    print(f'train step: {dt * 1e3:.2f} ms -> {N / dt:.1f} samples/s/chip '
          f'(N={N}, L={L}, {dtype})', flush=True)

    tdir = '/tmp/jax_trace_train'
    calls = 3
    with jax.profiler.trace(tdir):
        for i in range(calls):
            p, s, losses = step(p, s, batch, jax.random.key(50 + i))
        jax.block_until_ready(losses['overall'])

    files = sorted(glob.glob(tdir + '/**/*.trace.json.gz', recursive=True))
    if not files:
        print('no trace file found under', tdir)
        sys.exit(1)
    with gzip.open(files[-1], 'rt') as fh:
        trace = json.load(fh)

    pid_names = {}
    for ev in trace['traceEvents']:
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            pid_names[ev['pid']] = ev['args'].get('name', '')
    device_pids = {pid for pid, n in pid_names.items()
                   if 'TPU' in n or 'tpu' in n or 'Device' in n
                   or '/device' in n}

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in trace['traceEvents']:
        if ev.get('ph') != 'X' or ev.get('pid') not in device_pids:
            continue
        name = ev.get('name', '?')
        if name.startswith('jit_'):
            continue
        base = re.sub(r'[.\d]+$', '', name)
        dur = ev.get('dur', 0) / 1e3
        agg[base] += dur
        cnt[base] += 1
        total += dur
    print(f'total device op time per train step: {total / calls:.3f} ms',
          flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f'{dur / calls:9.4f} ms  x{cnt[name] // calls:<4d} {name[:100]}',
              flush=True)


if __name__ == '__main__':
    main()
