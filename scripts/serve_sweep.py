"""Serving-config sweep at the headline operating point (reps=256, L=128).

Measures the SHIPPED sampling path (model.sample under jit_sample) across
candidate serving configurations: scoped-VMEM budget x replica tile x
kernel-body variant x PRNG impl. This is the round-5 decision procedure for
the bench.py defaults — the micro kernel sweeps (micro_chain.py) rank
variants, but only the end-to-end 100-step program says what ships.

Usage: python scripts/serve_sweep.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 128
WARMUP = 1
ITERS = 3


def main():
    import jax

    from ab_opt_tpu.models import DiffAb, DiffAbConfig
    from ab_opt_tpu.utils.bench_fixture import real_complex_batch

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = real_complex_batch(L=L)
    model = DiffAb(DiffAbConfig(dtype='bfloat16'))
    params = model.init(jax.random.key(0), batch)

    # (label, env overrides, prng impl)
    # Deep replica tiles are dead (micro_chain rt mode, round 5: rt=8 at a
    # 64 MB budget is 16% SLOWER than rt=4 — fewer grid cells pipeline
    # worse); the candidates left are the kernel-body combo and the rbg PRNG.
    best_body = 'dual,merged_x,fast_softmax'
    configs = [
        ('body (shipped combo)', {'AB_OPT_FUSED_BODY': best_body}, None),
        ('combo+lhl', {'AB_OPT_FUSED_BODY': best_body + ',lhl'}, None),
        ('combo+stk', {'AB_OPT_FUSED_BODY': best_body + ',stacked_logits'},
         None),
        ('combo+lhl+stk',
         {'AB_OPT_FUSED_BODY': best_body + ',lhl,stacked_logits'}, None),
        ('quad+mx+fsm',
         {'AB_OPT_FUSED_BODY': 'quad,merged_x,fast_softmax'}, None),
        ('combo rt=2', {'AB_OPT_FUSED_RT': '2',
                        'AB_OPT_FUSED_BODY': best_body}, None),
    ]
    knobs = ('AB_OPT_SCOPED_VMEM_KIB', 'AB_OPT_FUSED_RT', 'AB_OPT_FUSED_BODY')

    for label, env, prng in configs:
        for k in knobs:
            os.environ.pop(k, None)
        os.environ.update(env)
        make_key = ((lambda i: jax.random.key(i, impl=prng)) if prng
                    else jax.random.key)
        try:
            from ab_opt_tpu.utils.compile_cache import jit_sample
            fn = jit_sample(lambda p, b, k, r=reps: model.sample(
                p, b, k, num_replicas=r))
            t_c0 = time.perf_counter()
            for i in range(WARMUP):
                jax.block_until_ready(fn(params, batch, make_key(i))['p'])
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            for i in range(ITERS):
                jax.block_until_ready(fn(params, batch, make_key(100 + i))['p'])
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — sweep survives OOMs
            print(f'{label:22s} reps={reps}: FAILED '
                  f'({type(e).__name__}: {str(e)[:140]})', flush=True)
            continue
        print(f'{label:22s} reps={reps}: {reps * ITERS / dt:8.2f} samples/s '
              f'({dt / ITERS * 1e3:7.1f} ms/call, compile {compile_s:.0f}s)',
              flush=True)


if __name__ == '__main__':
    main()
