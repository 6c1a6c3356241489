"""Device mesh + sharding helpers (the framework's distributed backend).

TPU-native replacement for the reference's NCCL/DDP stack (SURVEY.md §2d:
``torch.distributed.launch`` + ``MMDistributedDataParallel`` + NCCL
all-reduce).  Here parallelism is declarative: a 1-D ``data`` mesh axis (the
only parallelism the reference has) plus an optional ``model`` axis for
future tensor sharding; batches are sharded over ``data`` via NamedSharding
and a single ``jax.jit`` train step lets XLA/GSPMD insert the gradient
all-reduce over ICI — there is no hand-written collective in the hot path.

Multi-host: call :func:`init_distributed` (``jax.distributed.initialize``)
before any jax op; everything else is unchanged (SPMD is global-view).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host process-group setup (NCCL ``init_dist`` equivalent).

    Resolution order per field: explicit argument -> ``JAX_COORDINATOR_
    ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars (what a
    pod launcher exports on every worker; see docs/MULTIHOST.md) -> JAX
    auto-detection (TPU-VM metadata / SLURM), mirroring how mmcv
    ``init_dist`` reads the torch.distributed.launch env.
    """
    import os
    if coordinator_address is None:
        coordinator_address = os.environ.get('JAX_COORDINATOR_ADDRESS')
    if num_processes is None and os.environ.get('JAX_NUM_PROCESSES'):
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and os.environ.get('JAX_PROCESS_ID'):
        process_id = int(os.environ['JAX_PROCESS_ID'])
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(devices=None, data_axis='data', model_axis=None,
              model_parallel=1):
    """Build a device mesh. Defaults to pure data parallel over all devices.

    Args:
        devices: explicit device list (default: ``jax.devices()``).
        model_parallel: size of the model axis (1 = DP only, the reference's
            regime per SURVEY.md §2d).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_axis is None or model_parallel == 1:
        return Mesh(np.asarray(devices), (data_axis,))
    assert n % model_parallel == 0
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def make_mesh_for_batch(batch_size, devices=None, data_axis='data'):
    """DP mesh over the largest device count that divides the batch size."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(devices[:n], data_axis=data_axis)


def data_sharding(mesh, data_axis='data'):
    """NamedSharding placing the leading (batch) dim on the data axis."""
    return NamedSharding(mesh, P(data_axis))


def _put_global(x, sharding):
    """Place one GLOBAL host array onto a (possibly multi-process) sharding.

    Single process: plain ``device_put``.  Multi-process (the mesh spans
    devices this process cannot address): every process holds the same
    global array and contributes only its addressable shards via
    ``make_array_from_callback`` — the jax-native equivalent of DDP's
    per-rank scatter (each rank feeds its slice of the global batch).
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def shard_batch(batch, mesh, data_axis='data'):
    """Place a host batch dict onto the mesh, batch-dim sharded.

    The batch is GLOBAL: under multi-process each process must pass the
    same (deterministically loaded) global batch and only its local rows
    are materialized on its devices.
    """
    sharding = data_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(
        lambda x: _put_global(x, sharding), batch)


def replicate(tree, mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: _put_global(x, sharding), tree)
