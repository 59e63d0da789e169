"""Microbench: chained whole-encoder kernel vs per-layer fused kernels.

The round-4 trace shows 11.6 of 12.2 ms/step inside the 6 per-layer fused
GABlock kernels; the chained kernel (ops/gablock_pallas.py::
fused_encoder_chained) runs all 6 layers per grid cell with every layer's
weights VMEM-resident, so the grid machinery and x HBM round trips are paid
once instead of 6x per step.

Usage:
  python scripts/micro_chain.py parity            # interpret-mode parity
  python scripts/micro_chain.py bench [reps] [rt ...]   # on-chip timing
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from ab_opt_tpu.ops.gablock_pallas import (fused_encoder_apply,
                                           fused_encoder_chained,
                                           merged_x_weights,
                                           stack_encoder_weights,
                                           _planar_pool_np, _DA, _DV)

L, F, H, QK, V, P, PV, Cz, NL = 128, 128, 12, 32, 32, 8, 8, 64, 6
ITERS = 20


def make_inputs(reps, nl=NL, key=0, L=L):
    ks = jax.random.split(jax.random.key(key), 8 + 16 * nl)
    f32, bf = jnp.float32, jnp.bfloat16
    nrm = lambda k, s, d=bf: (jax.random.normal(k, s, f32) * 0.1).astype(d)
    HP, HPV = H * P, H * PV
    n_tot = 2 * HP + HPV
    rest_rows = H * (V + 7 * PV)
    bundles = []
    for i in range(nl):
        kk = ks[8 + 16 * i:8 + 16 * (i + 1)]
        bundles.append({
            'w_pts': nrm(kk[0], (F, 3 * n_tot)),
            's_q': nrm(kk[1], (F + 3 * HP + H, H * _DA)),
            's_k': nrm(kk[2], (F + 3 * HP + H, H * _DA)),
            's_v': nrm(kk[3], (F + 3 * HPV, H * _DV)),
            'b_q': nrm(kk[4], (1, H * _DA)),
            'b_k': nrm(kk[5], (1, H * _DA)),
            'pool': jnp.asarray(_planar_pool_np(H, 3 * P), bf),
            'wp2n': nrm(kk[6], (H, Cz, F)),
            'wrest': nrm(kk[7], (rest_rows, F)),
            'bout': nrm(kk[8], (1, F), f32),
            'ln1': nrm(kk[9], (2, F), f32) + 1.0,
            'wm1': nrm(kk[10], (F, F)),
            'wm2': nrm(kk[11], (F, F)),
            'wm3': nrm(kk[12], (F, F)),
            'bm': nrm(kk[13], (3, F), f32),
            'ln2': nrm(kk[14], (2, F), f32) + 1.0,
            'dims': (H, QK, V, P, PV),
        })
        bundles[-1]['w_mx'] = merged_x_weights(bundles[-1])
        bundles[-1]['wp2n_cat'] = bundles[-1]['wp2n'].reshape(H * Cz, F)
    N = reps
    x = jax.random.normal(ks[0], (N, L, F), f32)
    R9 = jax.random.normal(ks[1], (N, L, 9), f32)
    t = jax.random.normal(ks[2], (N, L, 3), f32)
    z = nrm(ks[3], (1, L, Cz, L))                      # transposed layout
    biases = [nrm(ks[4 + (i % 4)], (1, H, L, L)) for i in range(nl)]
    mask = jnp.ones((N, L, 1), f32)
    return bundles, x, R9, t, z, biases, mask


def parity():
    reps, nl = 4, 2
    bundles, x, R9, t, z, biases, mask = make_inputs(reps, nl, L=16)
    seq = fused_encoder_apply(bundles, R9, t, x, z, biases, mask,
                              reps=reps, rt=2, interpret=True)
    stacked = stack_encoder_weights(bundles)
    bst = jnp.stack(biases, axis=1)                    # (Nc, NL, H, L, L)
    ch = fused_encoder_chained(stacked, nl, R9, t, x, z, bst, mask,
                               reps=reps, rt=2, interpret=True)
    import numpy as np
    err = float(jnp.max(jnp.abs(seq - ch)))
    print(f'max |seq - chained| = {err:.3e}')
    assert err < 1e-4, 'parity FAILED'
    print('parity OK')


def bench_1layer(reps, rts):
    """Per-layer cost via a scan over ONE layer (all 6 production layers
    are identical cost; 6x smaller Mosaic programs dodge the remote-compile
    flakiness the 6-layer scans kept hitting)."""
    import os
    os.environ['AB_OPT_SCOPED_VMEM_KIB'] = '65536'
    opts = {'xla_tpu_scoped_vmem_limit_kib': 65536}
    bundles, x, R9, t, z, biases, mask = make_inputs(reps, nl=1)

    def timed(fn, label):
        def run(xx):
            c, _ = jax.lax.scan(lambda c, _: (fn(c), 0), xx, None,
                                length=ITERS)
            return c
        runj = jax.jit(run, compiler_options=opts)
        for attempt in range(2):
            try:
                out = runj(x)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                out = runj(x)
                jax.block_until_ready(out)
                ms = (time.perf_counter() - t0) / ITERS * 1e3
                print(f'{label:34s} {ms:8.3f} ms/layer', flush=True)
                return ms
            except Exception as e:
                if attempt == 0 and 'remote_compile' in str(e):
                    time.sleep(20)
                    continue
                print(f'{label:34s} FAILED {type(e).__name__}: '
                      f'{str(e)[:160]}', flush=True)
                return None

    combo = {'dual': True, 'merged_x': True, 'fast_softmax': True}
    variants = [(None, 'base'),
                ({'split_gemm': True}, 'split_gemm'),
                ({'stacked_logits': True}, 'stacked_lg'),
                ({'merged_x': True}, 'merged_x'),
                ({'fast_softmax': True}, 'fast_sm'),
                ({'merged_x': True, 'fast_softmax': True}, 'merged+fsm'),
                ({'merged_x': True, 'fast_softmax': True,
                  'stacked_logits': True}, 'mx+fsm+stk'),
                ({'dual': True}, 'dual'),
                (combo, 'dual+mx+fsm'),
                # round-5b candidates on top of the shipped combo
                # (defer_norm measured a loss 3.37-3.47 vs 3.10; p2n_mc is
                # rejected by Mosaic — multi-dim contraction unsupported)
                (dict(combo, stacked_logits=True), 'combo+stk'),
                (dict(combo, dual=False, quad=True), 'combo-quad'),
                (dict(combo, lhl=True), 'combo+lhl'),
                (dict(combo, p2n_cat=True), 'combo+p2ncat'),
                (dict(combo, lhl=True, stacked_logits=True),
                 'combo+lhl+stk'),
                (dict(combo, lhl=True, p2n_cat=True), 'combo+lhl+cat'),
                (dict(combo, lhl=True, stacked_logits=True, p2n_cat=True),
                 'combo+lhl+stk+cat')]
    bias_lhl = [jnp.swapaxes(b, 1, 2) for b in biases]
    for rt in rts:
        for o, label in variants:
            bb = bias_lhl if (o and o.get('lhl')) else biases
            timed(lambda xx, o=o, r=rt, bb=bb: fused_encoder_apply(
                bundles, R9, t, xx, z, bb, mask, reps=reps, rt=r,
                body_opts=o),
                f'1layer {label:15s} rt={rt}')


def bench(reps, rts):
    import os
    os.environ['AB_OPT_SCOPED_VMEM_KIB'] = '65536'   # _pick_rt guard budget
    opts = {'xla_tpu_scoped_vmem_limit_kib': 65536}
    bundles, x, R9, t, z, biases, mask = make_inputs(reps)
    stacked = stack_encoder_weights(bundles)
    bst = jnp.stack(biases, axis=1)

    def timed(fn, label):
        @jax.jit
        def run(xx):
            def body(c, _):
                return fn(c), 0
            c, _ = jax.lax.scan(body, xx, None, length=ITERS)
            return c
        runj = jax.jit(run, compiler_options=opts)
        # The axon remote-compile pool intermittently 500s under
        # back-to-back compiles; retry once before reporting failure.
        for attempt in range(2):
            try:
                out = runj(x)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                out = runj(x)
                jax.block_until_ready(out)
                ms = (time.perf_counter() - t0) / ITERS * 1e3
                print(f'{label:34s} {ms:8.3f} ms/encoder-pass '
                      f'({ms / NL:6.3f} ms/layer)', flush=True)
                break
            except Exception as e:
                if attempt == 0 and 'remote_compile' in str(e):
                    time.sleep(20)
                    continue
                print(f'{label:34s} FAILED {type(e).__name__}: '
                      f'{str(e)[:160]}', flush=True)
                break

    for rt in rts:
        timed(lambda xx, r=rt: fused_encoder_apply(
            bundles, R9, t, xx, z, biases, mask, reps=reps, rt=r),
            f'per-layer x6      rt={rt}')
        timed(lambda xx, r=rt: fused_encoder_chained(
            stacked, NL, R9, t, xx, z, bst, mask, reps=reps, rt=r),
            f'chained 6-layer   rt={rt}')

    # Body variants on the PER-LAYER kernel (first rt only) — the chained
    # kernel's dynamic weight indexing + row slicing crashed the remote
    # Mosaic compile for these, and chaining itself measured ~3%.
    # softmax_bf16 measured 0.44 max abs err in interpret parity; dot_bf16
    # is rejected by Mosaic (matmul acc must be f32) — both excluded.
    variants = [({'split_gemm': True}, 'layer+split_gemm'),
                ({'stacked_logits': True}, 'layer+stacked_lg'),
                ({'split_gemm': True, 'stacked_logits': True},
                 'layer+split+stacked')]
    for opts, label in variants:
        timed(lambda xx, o=opts: fused_encoder_apply(
            bundles, R9, t, xx, z, biases, mask, reps=reps, rt=rts[0],
            body_opts=o),
            f'{label:18s} rt={rts[0]}')


def bench_rt(reps, rts):
    """Deep replica tiles under a raised (64 MB) scoped-VMEM budget: the
    phase ablation's GEMM-skeleton floor fell 1.41 -> 1.17 ms going rt 4 -> 8,
    so deeper tiles (more rows per latency-bound dot) are the remaining
    in-kernel lever. Benches base and the best measured body variant only."""
    import os
    os.environ['AB_OPT_SCOPED_VMEM_KIB'] = '65536'
    opts = {'xla_tpu_scoped_vmem_limit_kib': 65536}
    bundles, x, R9, t, z, biases, mask = make_inputs(reps, nl=1)

    def timed(fn, label):
        def run(xx):
            c, _ = jax.lax.scan(lambda c, _: (fn(c), 0), xx, None,
                                length=ITERS)
            return c
        runj = jax.jit(run, compiler_options=opts)
        for attempt in range(2):
            try:
                out = runj(x)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                out = runj(x)
                jax.block_until_ready(out)
                ms = (time.perf_counter() - t0) / ITERS * 1e3
                print(f'{label:34s} {ms:8.3f} ms/layer', flush=True)
                return ms
            except Exception as e:
                if attempt == 0 and 'remote_compile' in str(e):
                    time.sleep(20)
                    continue
                print(f'{label:34s} FAILED {type(e).__name__}: '
                      f'{str(e)[:160]}', flush=True)
                return None

    best = {'dual': True, 'merged_x': True, 'fast_softmax': True}
    for rt in rts:
        for o, lbl in [(None, 'base'), (best, 'dual+mx+fsm')]:
            timed(lambda xx, o=o, r=rt: fused_encoder_apply(
                bundles, R9, t, xx, z, biases, mask, reps=reps, rt=r,
                body_opts=o),
                f'reps={reps} {lbl:12s} rt={rt}')


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'parity'
    if mode == 'parity':
        parity()
    elif mode == 'rt':
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
        rts = [int(a) for a in sys.argv[3:]] or [4, 8, 16]
        bench_rt(reps, rts)
    elif mode == '1layer':
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        rts = [int(a) for a in sys.argv[3:]] or [4, 8]
        bench_1layer(reps, rts)
    else:
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        rts = [int(a) for a in sys.argv[3:]] or [2, 4, 8]
        bench(reps, rts)
