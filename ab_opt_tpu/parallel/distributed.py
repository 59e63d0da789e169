"""Multi-host (pod-scale) training scaffolding.

The reference is strictly single-host (one GPU + Ray for host-side job
fan-out; SURVEY.md §2.7). On TPU pods, JAX runs one process per host, each
seeing only its local chips; ``jax.distributed.initialize`` joins them into
one global runtime, and jitted computations over a global mesh communicate
over ICI without any user-level NCCL/MPI analog.

The pieces here keep that wiring explicit and testable without a pod:

* :func:`init_distributed` — process bootstrap (no-op for single process).
* :func:`global_mesh` — 1-D dp mesh over ALL devices in the job.
* :func:`global_batch_from_host_shards` — each host loads only its own
  rows (``host_batch_slice``); the returned global jax.Arrays are sharded
  over the mesh with no cross-host data movement.

Dry-runnable with two local CPU processes (scripts/dryrun_multihost.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> bool:
    """Join this process into a multi-host JAX job.

    Returns True if distributed mode was initialized, False for the
    single-process fallback (no coordinator given and no TPU pod env).
    Safe to call twice (second call is a no-op).
    """
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, 'client', None) is not None:
        return True                                    # already initialized
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def global_mesh(axis_name: str = 'dp') -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_batch_slice(global_batch_size: int) -> slice:
    """The row range of the global batch this host is responsible for.

    Rows are assigned contiguously by process index; the global batch size
    must divide evenly (the loaders pad batches to fixed sizes already).
    """
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        raise ValueError(f'global batch {global_batch_size} not divisible by '
                         f'{n_proc} processes')
    per = global_batch_size // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch_from_host_shards(local_batch: Dict, mesh: Mesh,
                                  axis_name: str = 'dp') -> Dict:
    """Assemble global sharded arrays from per-host local rows.

    ``local_batch``: this host's rows only (numpy), identical keys/shapes
    across hosts except the leading axis. The result is a dict of global
    jax.Arrays sharded over ``axis_name``; each host's rows land on its own
    local devices — no host<->host transfer happens here.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return out


def assert_replicated_params_equal(params) -> None:
    """Cross-host agreement check on a params pytree (debug aid): every
    process contributes a checksum; mismatch raises on all hosts."""
    from jax.experimental import multihost_utils
    leaves = jax.tree_util.tree_leaves(params)
    checksum = np.array([float(jax.device_get(l.sum())) for l in leaves],
                        np.float64)
    gathered = multihost_utils.process_allgather(checksum)
    if not np.allclose(gathered, gathered[0], rtol=1e-6, atol=1e-6):
        raise AssertionError('params diverged across hosts')
