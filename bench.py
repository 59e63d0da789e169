"""Benchmark: 100-step CDR-H3 co-design sampling throughput per chip.

Matches the driver's north-star metric (BASELINE.json): 100-step reverse
diffusion of the flagship DiffAb model (128/64 dims, 6 IPA layers) on a
cropped complex (L=128 bucket), batched trajectories on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); ``vs_baseline``
is measured against A100_EST_SAMPLES_PER_SEC, a documented estimate of the
PyTorch reference's A100 throughput for the same workload (100 denoiser
forwards/sample at L=128; the reference runs `-n 1000 -b 1000` batches on one
GPU, AbDock/README.md:61).
"""
import json
import os
import sys
import time

import numpy as np

# Rough PyTorch-on-A100 estimate for 100-step sampling at L=128 with the
# 6-layer IPA denoiser (unfused torch ops, fp32): ~30 samples/s.
A100_EST_SAMPLES_PER_SEC = 30.0

L = 128           # padded crop length (CDR + context + antigen epitope)
BATCH = 32        # trajectories per chip per call
WARMUP = 1
ITERS = 3


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    from __graft_entry__ import _make_batch
    from ab_opt_tpu.models import DiffAb, DiffAbConfig

    # Production serving config: bf16 compute, fused pallas IPA on TPU.
    model = DiffAb(DiffAbConfig(dtype='bfloat16'))
    batch = _make_batch(N=BATCH, L=L)
    params = model.init(jax.random.key(0), batch)

    fn = jax.jit(lambda p, b, k: model.sample(p, b, k))

    def run(key):
        out = fn(params, batch, key)
        jax.block_until_ready(out['p'])
        return out

    for i in range(WARMUP):
        run(jax.random.key(i))

    t0 = time.perf_counter()
    for i in range(ITERS):
        run(jax.random.key(100 + i))
    dt = time.perf_counter() - t0

    samples_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        'metric': f'100-step CDR-H3 samples/sec/chip (L={L}, batch={BATCH})',
        'value': round(samples_per_sec, 3),
        'unit': 'samples/s',
        'vs_baseline': round(samples_per_sec / A100_EST_SAMPLES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
