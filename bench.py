"""Benchmark: 100-path multipathfinder on a 1000-D posterior (BASELINE.json
headline config; north star < 1 s on one TPU v5e chip → 100 paths/sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 100 paths/sec (the driver-provided target).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench runs skip the (minutes-long)
# XLA compile of the big while-loop program
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def run_bench(d=1000, n_paths=100, maxiters=64, ndraws=1000, repeats=3):
    from pathfinder_tpu.models.zoo import HierarchicalGaussian
    from pathfinder_tpu.multipath import (
        _compute_psis_result,
        _select_component_fits,
    )
    from pathfinder_tpu.ops.resample import resample_draws
    from pathfinder_tpu.parallel.sharding import make_path_executor
    from pathfinder_tpu.singlepath import PathfinderConfig

    target = HierarchicalGaussian(d, seed=0)
    config = PathfinderConfig(
        maxiters=maxiters,
        history_length=6,
        ndraws_elbo=5,
        ndraws=max(5, ndraws // n_paths),
        elbo_chunk=8,
    )
    executor = make_path_executor(mesh=None)

    @jax.jit
    def full_run(key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(n_paths)
        )
        x0s = jax.vmap(
            lambda k: jax.random.uniform(
                k, (d,), jnp.float32, minval=-2.0, maxval=2.0
            )
        )(keys)
        states = executor(keys, x0s, target, config)
        components = _select_component_fits(states)
        draws_knd = jnp.swapaxes(states.draws, 1, 2)
        psis_result = _compute_psis_result(target.logp, components, draws_knd)
        draws, ids = resample_draws(
            jax.random.fold_in(key, 0x5E5A), draws_knd, psis_result, ndraws
        )
        # ELBO-stage log-density evaluations: ndraws_elbo per valid
        # candidate, plus the K*N importance-weighting evals (the
        # "ELBO log-density evals/sec" metric of BASELINE.json)
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
        )

    # compile (not timed: the reference's Julia session pays compilation too,
    # and the driver measures steady-state throughput)
    _log("compiling...")
    t0 = time.perf_counter()
    out = full_run(jax.random.key(0))
    jax.block_until_ready(out)
    _log(f"compile+first-run: {time.perf_counter() - t0:.1f}s")

    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        out = full_run(jax.random.key(r + 1))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    _log(f"times: {[round(t, 4) for t in times]}")
    draws, khat, success, nevals, n_elbo = out
    elapsed = min(times)
    paths_per_sec = n_paths / elapsed
    return {
        "elapsed_s": elapsed,
        "paths_per_sec": paths_per_sec,
        "khat": float(khat),
        "n_success": int(success.sum()),
        "logp_grad_evals": int(nevals.sum()),
        "elbo_evals_per_sec": float(n_elbo) / elapsed,
        "finite_draws": bool(jnp.all(jnp.isfinite(draws))),
    }


def _time_call(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def run_all_configs():
    """The five BASELINE.md configs, each as one JSON line (steady-state
    timings; compile excluded)."""
    import numpy as np

    from pathfinder_tpu import multipathfinder, pathfinder
    from pathfinder_tpu.models.zoo import (
        CorrelatedGaussian,
        LogisticRegression,
        NealsFunnel,
        StandardNormal,
        german_credit_synthetic,
    )

    results = []

    # config 1: single-path 5-D diagonal Gaussian, ndraws=100
    target1 = StandardNormal(5)
    t, res = _time_call(
        lambda k: pathfinder(target1, key=k, ndraws=100, maxiters=32),
        jax.random.key(1),
    )
    results.append(("singlepath_5d_diag_gaussian_s", t, "s", res.success))

    # config 2: single-path 100-D correlated Gaussian (dense Woodbury path)
    target2 = CorrelatedGaussian(100, seed=0)
    t, res = _time_call(
        lambda k: pathfinder(
            target2, key=k, ndraws=100, maxiters=128, history_length=20
        ),
        jax.random.key(2),
    )
    results.append(("singlepath_100d_correlated_gaussian_s", t, "s", res.success))

    # config 3: multipath 8 paths + PSIS on 101-D Neal's funnel
    target3 = NealsFunnel(101)
    t, res = _time_call(
        lambda k: multipathfinder(
            target3, 400, key=k, nruns=8, maxiters=128, ntries=4
        ),
        jax.random.key(3),
    )
    results.append(
        ("multipath_8paths_funnel101_s", t, "s", float(res.psis_result.pareto_shape))
    )

    # config 4: Bayesian logistic regression d=25, 32 paths
    X, y, _ = german_credit_synthetic(n=1000, d=25, seed=0)
    target4 = LogisticRegression(X.astype(np.float32), y.astype(np.float32))
    t, res = _time_call(
        lambda k: multipathfinder(target4, 1000, key=k, nruns=32, maxiters=64),
        jax.random.key(4),
    )
    results.append(
        ("multipath_32paths_logreg25_s", t, "s", float(res.psis_result.pareto_shape))
    )

    # config 5: 1000-path multipathfinder on 1000-D hierarchical posterior
    stats5 = run_bench(d=1000, n_paths=1000, maxiters=64, ndraws=10_000, repeats=2)
    results.append(
        ("multipath_1000paths_hierarchical1000d_s", stats5["elapsed_s"], "s",
         stats5["khat"])
    )

    for name, t, unit, extra in results:
        print(
            json.dumps(
                {"metric": name, "value": round(t, 4), "unit": unit,
                 "extra": extra}
            )
        )
    return results


def main():
    if "--profile" in sys.argv:
        # tracing/profiling hook (SURVEY §5: new, not ported — the reference
        # has no profiler integration)
        with jax.profiler.trace("/tmp/pathfinder_tpu_trace"):
            stats = run_bench(repeats=1)
        _log("profiler trace written to /tmp/pathfinder_tpu_trace")
        _log(str(stats))
        return
    if "--all" in sys.argv:
        run_all_configs()
        return
    stats = run_bench()
    result = {
        "metric": "multipathfinder_paths_per_sec_d1000_100paths",
        "value": round(stats["paths_per_sec"], 2),
        "unit": "paths/sec",
        "vs_baseline": round(stats["paths_per_sec"] / 100.0, 3),
    }
    print(json.dumps(result))
    print(
        f"# details: elapsed={stats['elapsed_s']:.3f}s "
        f"success={stats['n_success']}/100 khat={stats['khat']:.2f} "
        f"logp+grad_evals={stats['logp_grad_evals']} "
        f"elbo_evals_per_sec={stats['elbo_evals_per_sec']:.3g} "
        f"finite={stats['finite_draws']}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
