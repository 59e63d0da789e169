"""Head-to-head: composable pallas IPA vs the fused GABlock kernel.

Runs the bench.py workload (100-step sampling, L=128, replica fan-out)
once per ipa_impl and prints samples/s for each, at several fan-out sizes.
Usage: python scripts/bench_fused.py [impl ...]   (default: pallas pallas_fused)
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

    impls = sys.argv[1:] or ['pallas', 'pallas_fused']
    batch = real_complex_batch(L=L)
    # Replica-tile sweep for the fused kernel (AB_OPT_FUSED_RT plumb).
    rts = [None]
    if os.environ.get('AB_OPT_RT_SWEEP'):
        rts = [None, 1, 2, 4, 8]
    for impl in impls:
        model = DiffAb(DiffAbConfig(dtype='bfloat16', ipa_impl=impl))
        params = model.init(jax.random.key(0), batch)
        for rt in (rts if impl == 'pallas_fused' else [None]):
            if rt is None:
                os.environ.pop('AB_OPT_FUSED_RT', None)
            else:
                os.environ['AB_OPT_FUSED_RT'] = str(rt)
            for reps in (32, 256, 1024):
                if rt is not None and reps % rt:
                    continue
                tag = f'{impl}' + (f'/rt={rt}' if rt is not None else '')
                try:
                    from ab_opt_tpu.utils.compile_cache import jit_sample
                    fn = jit_sample(lambda p, b, k, m=model, r=reps: m.sample(
                        p, b, k, num_replicas=r))
                    t_c0 = time.perf_counter()
                    for i in range(WARMUP):
                        jax.block_until_ready(
                            fn(params, batch, jax.random.key(i))['p'])
                    compile_s = time.perf_counter() - t_c0
                    t0 = time.perf_counter()
                    for i in range(ITERS):
                        jax.block_until_ready(
                            fn(params, batch, jax.random.key(100 + i))['p'])
                    dt = time.perf_counter() - t0
                except Exception as e:  # noqa: BLE001 — sweep survives OOMs
                    print(f'{tag:18s} reps={reps:4d}: FAILED '
                          f'({type(e).__name__}: {str(e)[:120]})', flush=True)
                    continue
                print(f'{tag:18s} reps={reps:4d}: '
                      f'{reps * ITERS / dt:8.2f} samples/s '
                      f'({dt / ITERS * 1e3:7.1f} ms/call, '
                      f'compile {compile_s:.0f}s)',
                      flush=True)


if __name__ == '__main__':
    main()
