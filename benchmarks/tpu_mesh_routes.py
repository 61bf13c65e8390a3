"""Validate the sharded executor routes on REAL TPU hardware (VERDICT r03
task 1c, adapted: the box exposes ONE v5e chip, so multi-device sharding
itself is exercised on the 8-device virtual CPU mesh by
``__graft_entry__.dryrun_multichip``; what single-chip hardware CAN
validate is that the two mesh code paths — shard_map (paths axis) and
GSPMD annotations (combined paths×dim mesh) — compile and execute on the
real TPU toolchain and reproduce the unsharded results — success mask
and fit iterations exactly, draws to allclose atol=1e-6; bit-identity
of the float trajectories is only asserted on the CPU dryrun, since
sharded XLA lowering may regroup FMAs at the last ulp).

Prints one JSON line per route.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    extra = bench.ensure_backend_reachable()
    bd = bench.device_breakdown()
    print(f"# platform={bd['platform']} rtt_s={bd['rtt_s']}",
          file=sys.stderr, flush=True)

    from pathfinder_tpu.models.zoo import HierarchicalGaussian
    from pathfinder_tpu.parallel.sharding import (
        make_path_executor,
        paths_dim_mesh,
        paths_mesh,
    )
    from pathfinder_tpu.singlepath import PathfinderConfig

    d, n_paths = 1000, 100
    target = HierarchicalGaussian(d, seed=0)
    config = PathfinderConfig(
        maxiters=64, history_length=6, ndraws_elbo=5, ndraws=10,
        elbo_chunk=8,
    )

    def run(executor, mesh=None):
        # (bench._make_full_run builds its own unsharded executor, so
        # build a step around the requested executor directly)
        def step(key):
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(n_paths)
            )
            x0s = jax.vmap(
                lambda k: jax.random.uniform(
                    k, (d,), jnp.float32, minval=-2.0, maxval=2.0
                )
            )(keys)
            states = executor(keys, x0s, target, config)
            return states.success, states.fit_iteration, states.draws

        fn = jax.jit(step)
        if mesh is not None:
            with mesh:
                out = fn(jax.random.key(1))
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                out = fn(jax.random.key(1))
                jax.block_until_ready(out)
                np.asarray(out[2]).ravel()[0]
                dt = time.perf_counter() - t0
        else:
            out = fn(jax.random.key(1))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = fn(jax.random.key(1))
            jax.block_until_ready(out)
            np.asarray(out[2]).ravel()[0]
            dt = time.perf_counter() - t0
        return out, dt

    dev = jax.devices()[:1]
    out_u, t_u = run(make_path_executor(mesh=None))

    mesh_p = paths_mesh(dev)
    out_p, t_p = run(make_path_executor(mesh_p), mesh_p)

    mesh_pd = paths_dim_mesh(1, dev)
    out_pd, t_pd = run(make_path_executor(mesh_pd), mesh_pd)

    def same(a, b):
        return all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(a[:2], b[:2])
        ) and bool(
            np.allclose(np.asarray(a[2]), np.asarray(b[2]), atol=1e-6)
        )

    print(json.dumps({
        "metric": "tpu_mesh_routes_d1000_100paths",
        "unsharded_s": round(t_u, 4),
        "shard_map_paths_1dev_s": round(t_p, 4),
        "gspmd_paths_dim_1x1_s": round(t_pd, 4),
        "shard_map_matches_unsharded": same(out_p, out_u),
        "gspmd_matches_unsharded": same(out_pd, out_u),
        "n_success": int(np.asarray(out_u[0]).sum()),
        **extra,
    }), flush=True)


if __name__ == "__main__":
    main()
