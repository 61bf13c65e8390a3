"""Paths-axis scaling on ONE chip: K=100 → 10,000 at d=1000.

Companion to the d-scaling artifact (`BIG_D_r04.jsonl`): the reference's
"parallel" axis is the number of single-path runs K (`src/multipath.jl`,
SURVEY §2c), and the TPU design batches K as a vmapped leading axis of
one program. This measures how far one v5e chip carries that axis at the
headline dimension before HBM (the (K, maxiters+1, d) trajectory trace is
the largest buffer) or compute becomes the wall — the single-chip half of
the serving-scale story (the multi-chip half is `parallel/sharding.py`
over a mesh, validated in `__graft_entry__.dryrun_multichip`).

Pipeline measured = the full headline bench pipeline (optimizer → fits →
ELBO → PSIS → resample), steady-state, min of 3 warm repeats with a
one-element host fetch (tunnel convention, ~25 ms of each measurement).

Usage: python benchmarks/paths_scaling.py [--out FILE.jsonl] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def make_chunked_run(d, n_paths, cap, config, target, init_scale=2.0,
                     slim=False):
    """The K>compiler-limit path (VERDICT r04 task 6): the optimizer stage
    runs as sequential launches of ONE compiled ``cap``-lane program via
    the product ``chunk_launches`` wrapper; the pooled PSIS/resample tail
    is a second (small) program. Semantically the same pipeline as
    ``bench._make_full_run`` — keys depend only on the path id."""
    from pathfinder_tpu.multipath import (
        _compute_psis_result,
        _select_component_fits,
    )
    from pathfinder_tpu.ops.resample import resample_draws
    from pathfinder_tpu.parallel.sharding import (
        chunk_launches,
        make_path_executor,
    )

    base = make_path_executor(mesh=None)
    launch = jax.jit(lambda keys, x0s: base(keys, x0s, target, config))
    if slim:
        # keep_traces=False (the serving-scale HBM lever): drop each
        # launch's trajectory buffers before the next chunk runs
        from pathfinder_tpu.multipath import _slim_traces

        inner = lambda keys, x0s, _t, _c: _slim_traces(launch(keys, x0s))  # noqa: E731
    else:
        inner = lambda keys, x0s, _t, _c: launch(keys, x0s)  # noqa: E731
    executor = chunk_launches(inner, cap)
    ndraws = config.ndraws * n_paths

    @jax.jit
    def make_inputs(key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(n_paths)
        )
        x0s = jax.vmap(
            lambda k: jax.random.uniform(
                k, (d,), jnp.float32, minval=-init_scale, maxval=init_scale
            )
        )(keys)
        return keys, x0s

    @jax.jit
    def tail(key, states):
        components = _select_component_fits(states)
        draws_knd = jnp.swapaxes(states.draws, 1, 2)
        psis_result = _compute_psis_result(
            target.logp, components, draws_knd
        )
        draws, ids = resample_draws(
            jax.random.fold_in(key, 0x5E5A), draws_knd, psis_result, ndraws
        )
        n_elbo_evals = (
            jnp.sum(states.trace.num_valid - 1) * config.ndraws_elbo
            + draws_knd.shape[0] * draws_knd.shape[1]
        )
        return (
            draws,
            psis_result.pareto_shape,
            states.success,
            states.num_fn_evals,
            n_elbo_evals,
            states.trace.num_valid,
            states.trace.num_ls_exhausted,
            components.mean,
        )

    def full_run(key):
        keys, x0s = make_inputs(key)
        states = executor(keys, x0s, None, None)
        if slim:
            # chunked tail (the serving-scale shape): per-block ratio
            # programs + one tiny pooled psis fit + a small resample
            # program — at K=32768 the monolithic tail program is what
            # hit the relay's compile limit
            components = _select_component_fits(states)
            draws_knd = jnp.swapaxes(states.draws, 1, 2)
            psis_result = _compute_psis_result(
                target.logp, components, draws_knd, chunk=cap
            )
            draws, _ = resample_draws(
                jax.random.fold_in(key, 0x5E5A), draws_knd, psis_result,
                ndraws,
            )
            return (
                draws,
                psis_result.pareto_shape,
                states.success,
                states.num_fn_evals,
                jnp.sum(states.trace.num_valid - 1) * config.ndraws_elbo
                + draws_knd.shape[0] * draws_knd.shape[1],
                states.trace.num_valid,
                states.trace.num_ls_exhausted,
                components.mean,
            )
        return tail(key, states)

    return full_run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--d", type=int, default=1000)
    ap.add_argument(
        "--ks", type=int, nargs="*", default=[100, 1000, 4000, 10000]
    )
    ap.add_argument(
        "--chunk", type=int, default=None,
        help="cap lanes per launch (chunk_launches); measures the "
        "sequential-launch fallback for K beyond compiler limits",
    )
    ap.add_argument(
        "--slim", action="store_true",
        help="keep_traces=False: drop each chunk's trajectory buffers "
        "(requires --chunk); lifts the single-chip HBM ceiling",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}", file=sys.stderr)

    import bench
    from pathfinder_tpu.models.zoo import HierarchicalGaussian
    from pathfinder_tpu.singlepath import PathfinderConfig

    d = args.d
    target = HierarchicalGaussian(d, seed=0)
    rows = []
    for k_paths in args.ks:
        config = PathfinderConfig(
            maxiters=64, history_length=6, ndraws_elbo=5,
            ndraws=5,  # fixed 5 draws/path: the pool scales with K
            elbo_chunk=8,
        )
        if args.chunk:
            run = make_chunked_run(
                d, k_paths, args.chunk, config, target, slim=args.slim
            )
        else:
            run = jax.jit(bench._make_full_run(d, k_paths, config, target))
        try:
            t0 = time.perf_counter()
            out = run(jax.random.key(0))
            bench._sync(out)
            compile_s = time.perf_counter() - t0
            times = []
            for r in range(3):
                t0 = time.perf_counter()
                out = run(jax.random.key(r + 1))
                bench._sync(out)
                times.append(time.perf_counter() - t0)
        except Exception as e:  # OOM is a valid measured boundary
            rows.append({
                "k_paths": k_paths, "d": d, "failed": type(e).__name__,
                "message": str(e).splitlines()[0][:200],
            })
            print(json.dumps(rows[-1]))
            break
        steady = min(times)
        # trace xs+gradients dominate HBM: 2 * K * (maxiters+1) * d * 4B
        trace_gb = 2 * k_paths * (config.maxiters + 1) * d * 4 / 2**30
        rows.append({
            "k_paths": k_paths, "d": d,
            **({"chunk": args.chunk} if args.chunk else {}),
            **({"slim": True} if args.slim else {}),
            "steady_s": round(steady, 4),
            "times_s": [round(t, 4) for t in times],
            "compile_plus_first_s": round(compile_s, 2),
            "paths_per_sec": round(k_paths / steady, 1),
            "khat": round(float(out[1]), 3),
            "n_success": int(np.asarray(out[2]).sum()),
            "trace_buffers_gb": round(trace_gb, 2),
        })
        print(json.dumps(rows[-1]))
        print(
            f"K={k_paths}: {steady:.3f}s = {k_paths / steady:.0f} paths/s "
            f"({rows[-1]['n_success']}/{k_paths} ok, khat {rows[-1]['khat']})",
            file=sys.stderr,
        )
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
