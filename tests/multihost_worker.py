"""Worker process for the multi-process runtime test.

Launched (2×) by ``test_multihost.py``: initialises the multi-process JAX
runtime via ``parallel.initialize_distributed`` (coordinator on
localhost), builds the hybrid mesh over the processes' combined CPU
devices, and runs ONE exact-DP train step on a deterministic batch.
Prints ``MULTIHOST loss=<v> procs=<n> devices=<d>`` — the parent asserts
both processes report the same finite loss.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> [dp|gp]

``gp`` mode instead partitions ONE giant graph over the combined devices
(mesh ``{data: 1, graph: N}``) and runs one graph-parallel train step —
the halo all_to_all exchanges ride the cross-process transport.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend use

import numpy as np  # noqa: E402


def main():
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"
    sys.path.insert(0, __file__.rsplit("/", 2)[0])

    from graphs4cfd_tpu.parallel import initialize_distributed
    got = initialize_distributed(coordinator_address=coord,
                                 num_processes=nprocs, process_id=pid)
    assert got == nprocs, (got, nprocs)
    devices = jax.devices()          # global: all processes' CPU devices
    local = jax.local_devices()
    assert len(devices) == nprocs * len(local)

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    import graphs4cfd_tpu as g4c
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu.loader import collate_sharded
    from graphs4cfd_tpu.nn.losses import GraphLoss
    from graphs4cfd_tpu.parallel import make_hybrid_mesh, make_dp_train_step
    from graphs4cfd_tpu.training.trainer import _adam_opt

    D = len(devices)
    if mode == "gp":
        _run_gp(pid, nprocs, devices, local)
        return
    mesh = make_hybrid_mesh(dcn_data=nprocs, ici_data=len(local))
    assert dict(mesh.shape) == {"data": D, "graph": 1}

    # deterministic batch, identical in every process
    W = 16
    mp = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))
    arch = {"edge_encoder": (2, (W, W), False),
            "node_encoder": (4, (W, W), False),
            "mp111": mp, "mp112": mp,
            "decoder": (W, (W, 1), False)}
    model = g4c.nn.MuSGNN(arch=arch, seed=0)
    pipeline = [T.ConnectKNN(k=4), T.ScaleEdgeAttr(0.02)]
    rng = np.random.default_rng(7)
    gs = []
    for i in range(D):
        g = Graph()
        n = 40 + i
        g.pos = rng.random((n, 2)).astype(np.float32)
        g.loc = rng.normal(size=(n, 2)).astype(np.float32)
        g.field = rng.normal(size=(n, 1)).astype(np.float32)
        g.target = rng.normal(size=(n, 2)).astype(np.float32)
        g.omega = (rng.random((n, 1)) < 0.1).astype(np.float32)
        g.bound = np.zeros(n, np.uint8)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    batch = collate_sharded(gs, D, node_bucket=16, edge_bucket=64)

    # build GLOBAL arrays from process-local shards: shard i of the leading
    # axis lives on global device i; this process owns rows for its local
    # devices only
    def to_global(v):
        if not isinstance(v, np.ndarray):
            return v
        sh = NamedSharding(mesh, P("data"))
        rows = [i for i, d in enumerate(devices) if d.process_index == pid]
        return jax.make_array_from_process_local_data(sh, v[rows])

    arrays = {k: to_global(v) for k, v in batch.arrays().items()}
    gshard = Graph(data={**arrays, **batch.statics()})

    repl = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl,
                                                         np.asarray(x)),
        model.params)
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x)), _adam_opt().init(model.params))

    step = make_dp_train_step(model.apply, GraphLoss(lambda_d=0.25),
                              model.num_fields, n_out=2,
                              grad_clip_limit=1.0, mesh=mesh)
    params, opt_state, loss, gnorm = step(params, opt_state, gshard,
                                          jnp.float32(1e-3),
                                          jnp.bool_(True))
    loss = float(loss)   # replicated output: addressable everywhere
    assert np.isfinite(loss)
    print(f"MULTIHOST loss={loss:.8e} procs={nprocs} devices={D}",
          flush=True)


def _run_gp(pid, nprocs, devices, local):
    """One edge-partitioned graph across the processes' combined devices:
    halo all_to_all + distributed-criterion psums cross the process
    boundary (graph axis spans both processes)."""
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    import graphs4cfd_tpu as g4c
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu.loader import collate
    from graphs4cfd_tpu.nn.losses import GraphLoss
    from graphs4cfd_tpu.parallel import (make_mesh, make_gp_train_step,
                                         partition_graph)

    D = len(devices)
    mesh = make_mesh(num_data=1, num_graph=D)

    W = 16
    mp = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))
    arch = {"edge_encoder": (2, (W, W), False),
            "node_encoder": (4, (W, W), False),
            "mp111": mp, "mp112": mp,
            "decoder": (W, (W, 1), False)}
    model = g4c.nn.MuSGNN(arch=arch, seed=0)
    rng = np.random.default_rng(11)
    g = Graph()
    n = 430
    g.pos = rng.random((n, 2)).astype(np.float32)
    g.loc = rng.normal(size=(n, 2)).astype(np.float32)
    g.field = rng.normal(size=(n, 1)).astype(np.float32)
    g.target = rng.normal(size=(n, 2)).astype(np.float32)
    g.omega = (rng.random((n, 1)) < 0.1).astype(np.float32)
    g.bound = np.zeros(n, np.uint8)
    for t in (T.ConnectKNN(k=4), T.ScaleEdgeAttr(0.02)):
        g = t(g)
    batch = collate([g], node_bucket=64, edge_bucket=128)
    sharded, _ = partition_graph(batch, D)   # deterministic: same each proc

    def to_global(v):
        if not isinstance(v, np.ndarray):
            return v
        sh = NamedSharding(mesh, P("graph"))
        rows = [i for i, d in enumerate(devices) if d.process_index == pid]
        return jax.make_array_from_process_local_data(sh, v[rows])

    arrays = {k: to_global(v) for k, v in sharded.arrays().items()}
    gshard = Graph(data={**arrays, **sharded.statics()})

    repl = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl,
                                                         np.asarray(x)),
        model.params)
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x)),
        optax.scale_by_adam().init(model.params))

    step = make_gp_train_step(model, GraphLoss(lambda_d=0.25), mesh,
                              n_out=2, grad_clip_limit=1.0)
    params, opt_state, loss, gnorm = step(params, opt_state, gshard,
                                          jnp.float32(1e-3),
                                          jnp.bool_(True))
    loss = float(loss)
    assert np.isfinite(loss)
    print(f"MULTIHOST-GP loss={loss:.8e} procs={nprocs} devices={D}",
          flush=True)


if __name__ == "__main__":
    main()
