"""Worker process for tests/test_launcher_multiprocess.py.

Runs under `parallel.launcher.launch_distributed` with a localhost
coordinator: 2 processes x 4 virtual CPU devices = one 8-device global mesh
spanning a process (DCN-analogue) boundary. Executes a psum and a small
dp-sharded batch NMPC solve, and writes results as JSON for the test to
assert against the single-process reference.

Usage: python launcher_worker.py <coordinator> <n_proc> <pid> <out.json>
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coordinator, n_proc, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from iterative_learning_nmpc_tpu.parallel.launcher import launch_distributed

    launch_distributed(coordinator=coordinator, num_processes=n_proc,
                       process_id=pid)

    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import multihost_utils
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    assert jax.process_count() == n_proc
    assert jax.local_device_count() == 4
    n_glob = jax.device_count()
    assert n_glob == 4 * n_proc

    mesh = Mesh(np.asarray(jax.devices()).reshape(n_glob), ("dp",))

    # --- psum across the process boundary ---
    local = np.arange(4, dtype=np.float32) + 4.0 * pid  # global 0..7
    x = multihost_utils.host_local_array_to_global_array(local, mesh, P("dp"))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P())
    def total(v):
        return jax.lax.psum(jnp.sum(v), "dp")

    psum_val = float(np.asarray(jax.device_get(total(x))))

    # --- small dp-sharded batch NMPC solve (N=8 toy horizon) ---
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge

    solver, X, U, params = ge._flagship(n_nodes=8)
    B = n_glob  # one instance per global device
    rng = np.random.default_rng(0)
    noise = 0.01 * rng.normal(size=(B, X.shape[-1])).astype(np.float32)

    Xb = jnp.tile(X[None], (B, 1, 1))
    Ub = jnp.tile(U[None], (B, 1, 1))
    pb = jax.tree.map(lambda t: jnp.tile(t[None], (B,) + (1,) * t.ndim), params)
    pb = pb.__class__(**{**{f: getattr(pb, f) for f in pb.__dataclass_fields__},
                         "x0": pb.x0 + noise})
    Xb = Xb.at[:, 0].set(pb.x0)

    solve_fn = jax.vmap(lambda a, b, p: solver.solve(a, b, p, 1).U)

    # single-process reference: the SAME shard_map program on a local
    # 4-device mesh over this process's rows (per-device batch 1, identical
    # to the global layout) — the assertion is that the process/DCN boundary
    # changes nothing.
    my = slice(pid * (B // n_proc), (pid + 1) * (B // n_proc))
    local_mesh = Mesh(np.asarray(jax.local_devices()), ("dp",))
    ref_solve = jax.jit(shard_map(
        solve_fn, mesh=local_mesh, in_specs=P("dp"), out_specs=P("dp"),
        check_rep=False))
    ref_U = np.asarray(jax.device_get(ref_solve(
        Xb[my], Ub[my], jax.tree.map(lambda t: t[my], pb))))

    # global-mesh sharded solve: build global arrays from per-process shards
    def to_global(t):
        shard = np.asarray(jax.device_get(t))[my]
        return multihost_utils.host_local_array_to_global_array(
            shard, mesh, P("dp"))

    Xg = to_global(Xb)
    Ug = to_global(Ub)
    pg = jax.tree.map(to_global, pb)

    solve = jax.jit(
        shard_map(
            solve_fn,
            mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
            check_rep=False,
        )
    )
    Ug_out = solve(Xg, Ug, pg)
    U_all = np.asarray(multihost_utils.process_allgather(Ug_out, tiled=True))
    max_du = float(np.abs(U_all[my] - ref_U).max())

    with open(out_path, "w") as f:
        json.dump(dict(pid=pid, n_processes=jax.process_count(),
                       n_devices=n_glob, psum=psum_val, max_du=max_du), f)
    print(f"[worker {pid}] psum={psum_val} max_du={max_du:.2e}")


if __name__ == "__main__":
    main()
