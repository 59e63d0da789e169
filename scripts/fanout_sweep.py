"""On-chip sweep: sampling throughput vs trajectory fan-out (and PRNG impl).

Measures the production 100-step sampler at several ``num_replicas`` to pick
the operational headline point for bench.py. The reference's production mode
is ``design_pdb.py -n 1000 -b 1000`` (AbDock/README.md:61), so large fan-outs
are the honest serving shape.

Usage: python scripts/fanout_sweep.py [reps ...]   (default: 256 512 1024)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps_list = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    import jax

    from ab_opt_tpu.models import DiffAb, DiffAbConfig
    from ab_opt_tpu.utils.bench_fixture import real_complex_batch

    model = DiffAb(DiffAbConfig(dtype='bfloat16'))
    batch = real_complex_batch(L=128)
    params = model.init(jax.random.key(0), batch)

    # (An AB_OPT_PRNG=rbg sweep knob lived here rounds 3-5; measured a
    # wash at every fan-out — scripts/serve_sweep.py, PERF.md round 5 — so
    # the default threefry keys stand and the knob is gone.)
    make_key = jax.random.key
    print(f'backend={jax.default_backend()}', flush=True)

    # jit_sample = jax.jit + the scoped-VMEM raise every shipped sampling
    # entry point uses — this script picks bench.py's headline point, so it
    # must measure the same compiler configuration (advisor r4).
    from ab_opt_tpu.utils.compile_cache import jit_sample

    for reps in reps_list:
        fn = jit_sample(lambda p, b, k, r=reps: model.sample(
            p, b, k, num_replicas=r))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, batch, make_key(0))['p'])
        compile_s = time.perf_counter() - t0
        iters = max(1, 512 // reps)
        t0 = time.perf_counter()
        for i in range(iters):
            jax.block_until_ready(fn(params, batch, make_key(100 + i))['p'])
        dt = time.perf_counter() - t0
        sps = reps * iters / dt
        print(f'reps={reps:5d}  {sps:8.2f} samples/s  '
              f'({dt / iters * 1e3:8.1f} ms/call, compile+warm {compile_s:.0f}s)',
              flush=True)


if __name__ == '__main__':
    main()
