"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import optax
import pytest

from ab_opt_tpu.models import DiffAb, DiffAbConfig
from ab_opt_tpu.parallel import (
    make_mesh,
    replicate_batch,
    sharded_sample_fn,
    sharded_train_step,
)
from helpers import make_batch

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason='needs 8 virtual devices')

CFG = DiffAbConfig(res_feat_dim=16, pair_feat_dim=8, num_steps=4,
                   num_layers=1, num_bins=8)


@pytest.fixture(scope='module')
def setup():
    model = DiffAb(CFG)
    batch = make_batch(np.random.default_rng(0), N=8, L=16)
    params = model.init(jax.random.key(0), batch)
    return model, batch, params


def test_dp_train_step(setup):
    model, batch, params = setup
    mesh = make_mesh(8)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    step = sharded_train_step(
        model.loss, opt, mesh,
        loss_weights={'rot': 1.0, 'pos': 1.0, 'seq': 1.0, 'dist': 1.0,
                      'prmsd': 0.1},
        max_grad_norm=100.0)
    # The step donates params/opt_state buffers — work on fresh copies so
    # the module-scoped fixture's params survive for later tests.
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    params = jax.tree_util.tree_map(jax.numpy.array, params)
    opt_state = jax.tree_util.tree_map(jax.numpy.array, opt_state)
    p2, opt_state, losses = step(params, opt_state, batch, jax.random.key(1))
    assert np.isfinite(float(losses['overall']))
    assert bool(losses['_finite'])
    # Params actually changed.
    diff = jax.tree_util.tree_map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).sum()),
                                  p0, p2)
    assert sum(jax.tree_util.tree_leaves(diff)) > 0


def test_dp_matches_single_device(setup):
    """Sharded loss equals single-device loss for the same batch and key."""
    model, batch, params = setup
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharded = {k: jax.device_put(v, NamedSharding(mesh, P('dp')))
               for k, v in batch.items()}
    loss_sharded = jax.jit(model.loss)(params, sharded, jax.random.key(3))
    loss_local = jax.jit(model.loss)(params, batch, jax.random.key(3))
    for k in loss_local:
        np.testing.assert_allclose(float(loss_sharded[k]), float(loss_local[k]),
                                   rtol=2e-4, atol=1e-5)


def test_sharded_sampling_fanout(setup):
    model, _, params = setup
    mesh = make_mesh(8)
    one = make_batch(np.random.default_rng(1), N=1, L=16)
    batch = replicate_batch(one, 8)
    sample = sharded_sample_fn(model.sample, mesh)
    out = sample(params, batch, jax.random.key(2))
    assert out['p'].shape[0] == 8
    assert np.isfinite(np.asarray(out['p'])).all()
    # Trajectories are independent (different noise per shard).
    p = np.asarray(out['p'])
    gen = np.asarray(batch['generate_flag'][0])
    assert not np.allclose(p[0][gen], p[1][gen])


@pytest.mark.nightly
def test_sharded_sampling_production_shape_no_collectives():
    """Per-device work isolation at production shapes (VERDICT r2 #8).

    Shards a production-dims (128/64, 6-layer, L=128) sampling fan-out over
    the 8-device mesh, executes it, and asserts from the compiled HLO that
    the reverse scan contains NO cross-chip collectives — the trajectory
    axis is embarrassingly parallel, so per-chip throughput must multiply
    across ICI. num_steps is cut to 10 (scan trip count only; the per-step
    HLO whose collectives we assert about is identical at 100).
    """
    cfg = DiffAbConfig(num_steps=10)
    model = DiffAb(cfg)
    mesh = make_mesh(8)
    one = make_batch(np.random.default_rng(5), N=1, L=128)
    batch = replicate_batch(one, 8)
    params = model.init(jax.random.key(0), batch)
    sample = sharded_sample_fn(model.sample, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P
    sharded = {k: jax.device_put(v, NamedSharding(mesh, P('dp')))
               for k, v in batch.items()}
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    compiled = sample.jitted.lower(params_r, sharded,
                                   jax.random.key(2)).compile()
    hlo = compiled.as_text()
    for op in ('all-reduce', 'all-gather', 'reduce-scatter',
               'collective-permute', 'all-to-all'):
        assert op not in hlo, f'unexpected collective {op} in sampling HLO'

    out = compiled(params_r, sharded, jax.random.key(2))
    p = np.asarray(out['p'])
    assert p.shape[0] == 8 and np.isfinite(p).all()
    # Each device's trajectory differs (independent noise per shard).
    gen = np.asarray(batch['generate_flag'][0])
    assert not np.allclose(p[0][gen], p[4][gen])


@pytest.mark.nightly
def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_host_batch_slice_single_process():
    from ab_opt_tpu.parallel import host_batch_slice
    assert host_batch_slice(8) == slice(0, 8)
    assert host_batch_slice(7) == slice(0, 7)   # 1 process divides anything


def test_global_batch_from_host_shards_single_process():
    """Single-process degenerate case: global == local, sharded over dp."""
    from ab_opt_tpu.parallel import global_batch_from_host_shards, global_mesh
    mesh = global_mesh()
    local = {'x': np.arange(len(jax.devices()) * 3, dtype=np.float32
                            ).reshape(len(jax.devices()), 3)}
    out = global_batch_from_host_shards(local, mesh)
    assert out['x'].shape == local['x'].shape
    np.testing.assert_array_equal(np.asarray(out['x']), local['x'])


@pytest.mark.nightly
def test_multihost_dryrun_two_processes():
    """Two CPU processes + gloo collectives: the pod-scale wiring
    (jax.distributed + per-host shards) compiles and steps (VERDICT r2 #10)."""
    import pathlib
    import subprocess
    import sys
    script = pathlib.Path(__file__).resolve().parents[1] / 'scripts' / 'dryrun_multihost.py'
    # Timeout must exceed the launcher's own 600s worker wait so a hung
    # worker surfaces as the launcher's error (which kills its workers),
    # not a TimeoutExpired here that would orphan them.
    proc = subprocess.run([sys.executable, str(script)], capture_output=True,
                          text=True, timeout=700)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'MULTIHOST DRYRUN OK' in proc.stdout
