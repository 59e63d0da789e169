"""Two-process CPU dryrun of the multi-host training path.

Spawns two local processes (4 virtual CPU devices each -> 8 global), joins
them with jax.distributed, builds the global dp mesh, shards a synthetic
batch per host (each host materializes ONLY its own rows), runs two jitted
sharded train steps on the tiny DiffAb config, and asserts params stay
identical across hosts.

Usage:  python scripts/dryrun_multihost.py            # launcher
        (internal) ... --worker <pid> --port <p>      # worker process
"""
import argparse
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def worker(process_id: int, num_processes: int, port: int):
    import numpy as np
    import jax
    # Cross-process CPU collectives (the CPU analog of the ICI transport);
    # without this each CPU process is its own world (process_count()==1).
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')

    from ab_opt_tpu.parallel.distributed import (
        init_distributed, global_mesh, host_batch_slice,
        global_batch_from_host_shards, assert_replicated_params_equal)
    from ab_opt_tpu.parallel.mesh import sharded_train_step

    ok = init_distributed(coordinator_address=f'127.0.0.1:{port}',
                          num_processes=num_processes, process_id=process_id)
    assert ok and jax.process_count() == num_processes, jax.process_count()
    mesh = global_mesh()
    n_dev = len(jax.devices())
    print(f'[proc {process_id}] {jax.local_device_count()} local / '
          f'{n_dev} global devices', flush=True)

    from ab_opt_tpu.models import DiffAb, DiffAbConfig
    from ab_opt_tpu.utils.bench_fixture import synthetic_batch
    import optax

    GLOBAL_B, L = 8, 32
    cfg = DiffAbConfig(res_feat_dim=32, pair_feat_dim=16, num_layers=2,
                       num_steps=4, num_bins=8)
    model = DiffAb(cfg)

    # Each host materializes only its own rows (same seed -> same global
    # batch; the slice differs per host).
    full = synthetic_batch(np.random.default_rng(0), N=GLOBAL_B, L=L,
                           n_ab=int(L * 0.7), gen_lo=L // 4, gen_hi=L // 4 + 4)
    sl = host_batch_slice(GLOBAL_B)
    local = {k: np.asarray(v)[sl] for k, v in full.items()}
    batch = global_batch_from_host_shards(local, mesh)

    params = model.init(jax.random.key(0), full)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = sharded_train_step(model.loss, opt, mesh,
                              loss_weights={'rot': 1.0, 'pos': 1.0,
                                            'seq': 1.0})
    for i in range(2):
        params, opt_state, losses = step(params, opt_state, batch,
                                         jax.random.key(i))
    total = float(jax.device_get(losses['overall']))
    assert np.isfinite(total), total
    assert_replicated_params_equal(params)
    print(f'[proc {process_id}] 2 steps ok, loss {total:.4f}', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--worker', type=int, default=None)
    ap.add_argument('--nproc', type=int, default=2)
    ap.add_argument('--port', type=int, default=0,
                    help='coordinator port; 0 = pick a free one (launcher)')
    args = ap.parse_args()

    if args.worker is not None:
        sys.path.insert(0, str(ROOT))
        worker(args.worker, args.nproc, args.port)
        return

    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=4')
    # TPU-terminal sitecustomize hooks (axon relay) force-register a device
    # plugin via jax.config.update, outranking JAX_PLATFORMS — strip their
    # trigger vars so workers are plain CPU processes (same workaround as
    # __graft_entry__.dryrun_multichip).
    for trigger in ('PALLAS_AXON_POOL_IPS', 'TPU_WORKER_HOSTNAMES'):
        env.pop(trigger, None)
    port = args.port
    if not port:
        # A stale fixed port breaks the next rendezvous if a prior run left
        # a worker behind; grab a fresh ephemeral one instead.
        import socket
        with socket.socket() as s:
            s.bind(('127.0.0.1', 0))
            port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, __file__, '--worker', str(i),
         '--nproc', str(args.nproc), '--port', str(port)],
        env=env, cwd=ROOT) for i in range(args.nproc)]
    try:
        import time
        deadline = time.monotonic() + 600   # shared budget across workers
        rcs = [p.wait(timeout=max(1.0, deadline - time.monotonic()))
               for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:          # no orphaned workers holding the port
            if p.poll() is None:
                p.kill()
        sys.exit('worker wait timed out; killed remaining workers')
    if any(rcs):
        sys.exit(f'worker exit codes: {rcs}')
    print('MULTIHOST DRYRUN OK')


if __name__ == '__main__':
    main()
