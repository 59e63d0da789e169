"""Trace one denoise forward with jax.profiler and print top device ops.

Parses the perfetto trace JSON that jax.profiler writes, aggregates device
slice durations by op name, prints the top entries.

Usage: python scripts/trace_step.py [pallas|einsum] [N] [L]
"""
import glob
import gzip
import json
import pathlib
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_batch
from ab_opt_tpu.models import DiffAb, DiffAbConfig
from ab_opt_tpu.models.diffab import DiffAbNet
from ab_opt_tpu.nn.ipa import precompute_encoder_pair_biases
from ab_opt_tpu.geometry import rotation_to_so3vec


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'pallas'
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    # reps > 1: trajectory fan-out (bench workload) — N replicas of ONE
    # complex sharing its pair tensor, instead of N independent complexes.
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    cfg = DiffAbConfig(dtype='bfloat16')
    model = DiffAb(cfg)
    batch = _make_batch(N=N // reps if reps > 1 else N, L=L)
    params = model.init(jax.random.key(0), batch)
    res_feat, pair_feat, R0, p0 = model.encode(params, batch, True, True)
    v = rotation_to_so3vec(R0)
    p = model.normalize_position(p0)
    s = batch['aa']
    mg, mr = batch['generate_flag'], batch['mask']
    if reps > 1:
        rep = lambda x: jnp.repeat(x, reps, axis=0)
        v, p, s, res_feat, mg, mr = map(rep, (v, p, s, res_feat, mg, mr))
    beta = model.trans_pos.sched.betas[jnp.full((N,), 50)]
    use_pallas = variant == 'pallas'
    biases = fast_weights = None
    if use_pallas:
        from ab_opt_tpu.nn.ipa import precompute_encoder_fast_weights
        biases = precompute_encoder_pair_biases(
            params['params']['eps_net']['encoder'], pair_feat, mr[::reps],
            cfg.num_layers, dtype=cfg.compute_dtype)
        fast_weights = precompute_encoder_fast_weights(
            params['params']['eps_net']['encoder'], cfg.num_layers,
            dtype=cfg.compute_dtype)

    if variant == 'sample':
        # Trace the FULL 100-step sampling call (one trace, costs /= steps).
        # jit_sample = the shipped compiler config (scoped-VMEM raise).
        from ab_opt_tpu.utils.compile_cache import jit_sample
        f = jit_sample(lambda pa, b, k: model.sample(
            pa, b, k, num_replicas=max(reps, 1)))
        calls, divisor = 1, cfg.num_steps
        run = lambda: f(params, batch, jax.random.key(1))
    else:
        f = jax.jit(lambda pa, vv, pp, ss: model.net.apply(
            pa, vv, pp, ss, res_feat, pair_feat, beta, mg, mr, biases,
            fast_weights, use_pallas, reps, method=DiffAbNet.denoise_step))
        calls, divisor = 3, 3
        run = lambda: f(params, v, p, s)
    for _ in range(2):
        out = run()
    jax.block_until_ready(out)

    tdir = '/tmp/jax_trace'
    with jax.profiler.trace(tdir):
        for _ in range(calls):
            out = run()
        jax.block_until_ready(out)

    files = sorted(glob.glob(tdir + '/**/*.trace.json.gz', recursive=True))
    if not files:
        print('no trace file found under', tdir)
        sys.exit(1)
    with gzip.open(files[-1], 'rt') as fh:
        trace = json.load(fh)

    # Device track pids: look for TPU/device process names.
    pid_names = {}
    for ev in trace['traceEvents']:
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            pid_names[ev['pid']] = ev['args'].get('name', '')
    device_pids = {p for p, n in pid_names.items()
                   if 'TPU' in n or 'tpu' in n or 'Device' in n or '/device' in n}

    import re
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in trace['traceEvents']:
        if ev.get('ph') != 'X' or ev.get('pid') not in device_pids:
            continue
        name = ev.get('name', '?')
        if name.startswith('jit_'):
            continue                       # parent span double-counts
        base = re.sub(r'[.\d]+$', '', name)
        dur = ev.get('dur', 0) / 1e3   # us -> ms
        agg[base] += dur
        cnt[base] += 1
        total += dur
    print(f'process names: {sorted(set(pid_names.values()))}', flush=True)
    print(f'total device op time per step: {total/divisor:.3f} ms', flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f'{dur/divisor:9.4f} ms  x{cnt[name]//divisor:<4d} {name[:100]}', flush=True)

    print('--- top individual ops ---', flush=True)
    ind = defaultdict(float)
    for ev in trace['traceEvents']:
        if ev.get('ph') != 'X' or ev.get('pid') not in device_pids:
            continue
        name = ev.get('name', '?')
        if name.startswith('jit_'):
            continue
        ind[name] += ev.get('dur', 0) / 1e3
    for name, dur in sorted(ind.items(), key=lambda kv: -kv[1])[:25]:
        print(f'{dur/divisor:9.4f} ms  {name[:110]}', flush=True)


if __name__ == '__main__':
    main()
