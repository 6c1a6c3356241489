"""Worker for the real multi-process DP equivalence test.

Usage: python _dist_worker.py <coordinator> <num_processes> <process_id>
           <local_devices> <out_npz>

Each process joins the jax.distributed coordinator, builds the tiny
VoteNet from configs/synthetic/votenet_tiny.py, loads the SAME
deterministic global batch, runs 2 DP train steps over the global
(num_processes * local_devices)-device mesh and dumps its local copy of
the (fully replicated) params.  The parent test asserts the 2-process
run's params match the 1-process run's — the jax-native analogue of the
reference's 8-process torch.distributed.launch DDP contract
(reference tools/dist_train.sh:8).
"""
import sys


def main():
    coordinator, nproc, pid, ndev, out = sys.argv[1:6]
    nproc, pid, ndev = int(nproc), int(pid), int(ndev)

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', ndev)

    from demf_tpu.parallel.mesh import (init_distributed, make_mesh,
                                        replicate, shard_batch)
    init_distributed(coordinator, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == ndev
    assert jax.device_count() == nproc * ndev

    import numpy as np
    import jax.numpy as jnp
    import demf_tpu.models  # noqa: F401
    from demf_tpu.engine import (build_optimizer, create_train_state,
                                 make_train_step)
    from demf_tpu.engine.torch_port import flatten_params
    from demf_tpu.utils.config import Config
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg
    from demf_tpu.zoo import synth_points_batch

    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(
        os.path.join(repo, 'configs/synthetic/votenet_tiny.py'))
    model = build_from_cfg(cfg.model, DETECTORS)

    # the GLOBAL batch: every process loads the same deterministic data
    # and shard_batch materializes only its local rows (parallel/mesh.py)
    batch = {k: np.asarray(v)
             for k, v in synth_points_batch(8, 256, 8, seed=0).items()}

    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), {'points': jnp.asarray(batch['points'])})
    tx = build_optimizer(dict(type='AdamW', lr=0.01, weight_decay=0.01),
                         variables['params'])
    state = create_train_state(model, tx, variables)

    mesh = make_mesh()
    state = replicate(state, mesh)
    step = make_train_step(model, tx)
    sbatch = shard_batch(batch, mesh)
    losses = []
    for i in range(2):
        state, metrics = step(state, sbatch, jax.random.PRNGKey(i))
        losses.append(float(metrics['loss']))

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_data(0)), state.params)
    np.savez(out, **flatten_params(params))
    print(f'DIST_WORKER_OK pid={pid}/{nproc} losses={losses}', flush=True)


if __name__ == '__main__':
    main()
