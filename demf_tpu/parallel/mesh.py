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


def _expand_slurm_nodelist(nodelist):
    """First hostname of a SLURM nodelist (plain, comma, or ``n[01-04]``).

    Only the FIRST entry is needed (it hosts the coordinator), so bracket
    ranges are resolved to their first element; mirrors what mmcv's slurm
    launcher does via ``scontrol show hostname | head -n1``.
    """
    import re
    first = nodelist.split(',')[0].strip()
    m = re.match(r'^([^\[]*)\[([^\]\-,]+)', first)
    if m:
        return m.group(1) + m.group(2)
    return first


def resolve_launcher_env(launcher, environ):
    """Map a launcher's env vars to jax.distributed.initialize kwargs.

    Pure (testable) counterpart of mmcv ``init_dist``'s per-launcher env
    discovery (reference ``demf/engine/default.py:54-58`` offers
    {pytorch, slurm, mpi}; collectives there are NCCL, here ICI/GSPMD):

    - ``pytorch``: torch.distributed.launch exports RANK / WORLD_SIZE /
      MASTER_ADDR / MASTER_PORT.
    - ``slurm``: SLURM_PROCID / SLURM_NTASKS / SLURM_STEP_NODELIST (or
      SLURM_JOB_NODELIST / SLURM_NODELIST); coordinator = first node.
      Port: MASTER_PORT env or 29500.
    - ``mpi`` (Open MPI): OMPI_COMM_WORLD_RANK / OMPI_COMM_WORLD_SIZE;
      coordinator from MASTER_ADDR/MASTER_PORT (as mmcv's mpi launcher
      requires).
    - ``jax``: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
      JAX_PROCESS_ID, or {} to let JAX auto-detect (TPU-VM metadata).

    Raises RuntimeError with guidance when the launcher's required env is
    absent — never silently falls back to single-process.
    """
    def need(*names):
        missing = [n for n in names if n not in environ]
        if missing:
            raise RuntimeError(
                f'--launcher {launcher}: missing env var(s) '
                f'{missing}; launch via the matching job launcher or use '
                f'--launcher jax with JAX_COORDINATOR_ADDRESS/'
                f'JAX_NUM_PROCESSES/JAX_PROCESS_ID (docs/MULTIHOST.md)')
        return [environ[n] for n in names]

    if launcher == 'pytorch':
        rank, world, addr, port = need('RANK', 'WORLD_SIZE', 'MASTER_ADDR',
                                       'MASTER_PORT')
        return dict(coordinator_address=f'{addr}:{port}',
                    num_processes=int(world), process_id=int(rank))
    if launcher == 'slurm':
        rank, world = need('SLURM_PROCID', 'SLURM_NTASKS')
        nodelist = (environ.get('SLURM_STEP_NODELIST')
                    or environ.get('SLURM_JOB_NODELIST')
                    or environ.get('SLURM_NODELIST'))
        if not nodelist:
            raise RuntimeError(
                '--launcher slurm: no SLURM_*_NODELIST env var; cannot '
                'locate the coordinator node')
        addr = _expand_slurm_nodelist(nodelist)
        port = environ.get('MASTER_PORT', '29500')
        return dict(coordinator_address=f'{addr}:{port}',
                    num_processes=int(world), process_id=int(rank))
    if launcher == 'mpi':
        rank, world = need('OMPI_COMM_WORLD_RANK', 'OMPI_COMM_WORLD_SIZE')
        addr, port = need('MASTER_ADDR', 'MASTER_PORT')
        return dict(coordinator_address=f'{addr}:{port}',
                    num_processes=int(world), process_id=int(rank))
    # 'jax' (and the default path): explicit env or JAX auto-detection
    kwargs = {}
    if environ.get('JAX_COORDINATOR_ADDRESS'):
        kwargs = dict(
            coordinator_address=environ['JAX_COORDINATOR_ADDRESS'],
            num_processes=int(environ['JAX_NUM_PROCESSES'])
            if environ.get('JAX_NUM_PROCESSES') else None,
            process_id=int(environ['JAX_PROCESS_ID'])
            if environ.get('JAX_PROCESS_ID') else None)
    return kwargs


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, launcher='jax'):
    """Multi-host process-group setup (NCCL ``init_dist`` equivalent).

    Resolution order per field: explicit argument -> launcher-specific env
    vars via :func:`resolve_launcher_env` (what the job launcher exports on
    every worker; see docs/MULTIHOST.md) -> JAX auto-detection (TPU-VM
    metadata / SLURM), mirroring how mmcv ``init_dist`` reads each
    launcher's env (``demf/engine/default.py:54-58``).
    """
    import os
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    else:
        kwargs = resolve_launcher_env(launcher, os.environ)
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
