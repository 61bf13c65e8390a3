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


def hierarchical_truth(d, seed=0):
    """Exact posterior moments of the HierarchicalGaussian bench target by
    1-D quadrature: θ is conditionally Gaussian given log_tau, and the
    log_tau marginal is one-dimensional, so every moment reduces to an
    integral over log_tau — machine-precision ground truth for the bench's
    moment-error column (no MCMC referee needed).

    Returns (mean (d,), sd (d,)) ordered [log_tau, theta...].
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    obs = rng.standard_normal(d - 1)  # matches models.zoo.HierarchicalGaussian
    S = float(np.sum(obs**2))
    lt = np.linspace(-10.0, 10.0, 40001)
    s2 = np.exp(lt)  # sigma^2
    logw = (
        -0.5 * lt**2
        - 0.5 * ((d - 1) * np.log(2 * np.pi * (1.0 + s2)) + S / (1.0 + s2))
    )
    logw -= logw.max()
    w = np.exp(logw)
    w /= w.sum()
    sig = np.sqrt(s2)
    mean_lt = float(np.sum(w * lt))
    var_lt = float(np.sum(w * (lt - mean_lt) ** 2))
    A = float(np.sum(w * sig / (1.0 + s2)))  # E[sigma/(1+sigma^2)]
    B = float(np.sum(w / (1.0 + s2)))  # E[1/(1+sigma^2)]
    C = float(np.sum(w * s2 / (1.0 + s2) ** 2))  # E[sigma^2/(1+sigma^2)^2]
    mean_theta = obs * A
    var_theta = B + obs**2 * C - (obs * A) ** 2
    mean = np.concatenate([[mean_lt], mean_theta])
    sd = np.sqrt(np.concatenate([[var_lt], var_theta]))
    return mean, sd


def _moment_errors(draws, mean_true, sd_true):
    """Max standardized moment errors of a (d, N) draw matrix vs truth."""
    import numpy as np

    x = np.asarray(draws)
    mean_err = float(np.max(np.abs(x.mean(axis=1) - mean_true) / sd_true))
    sd_err = float(np.max(np.abs(x.std(axis=1) - sd_true) / sd_true))
    return mean_err, sd_err


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
            states.trace.num_valid,
            states.trace.num_ls_exhausted,
        )

    import numpy as _np

    def _sync(out):
        # force full completion: block_until_ready alone can return early
        # through the remote-device tunnel, so fetch one element to the host
        # (all outputs come from one executable, so one fetch covers all)
        jax.block_until_ready(out)
        _np.asarray(out[0].ravel()[0])

    # compile (not timed: the reference's Julia session pays compilation too,
    # and the driver measures steady-state throughput)
    _log("compiling...")
    t0 = time.perf_counter()
    out = full_run(jax.random.key(0))
    _sync(out)
    compile_s = time.perf_counter() - t0
    _log(f"compile+first-run: {compile_s:.1f}s")

    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        out = full_run(jax.random.key(r + 1))
        _sync(out)
        times.append(time.perf_counter() - t0)
    _log(f"times: {[round(t, 4) for t in times]}")
    import numpy as np

    draws, khat, success, nevals, n_elbo, num_valid, num_exh = out
    elapsed = min(times)
    paths_per_sec = n_paths / elapsed
    # quality columns (VERDICT round-1 item 2): capped-vs-converged paths,
    # line-search exhaustions, and exact moment errors vs quadrature truth
    nv = np.asarray(num_valid)
    frac_capped = float(np.mean(nv - 1 >= maxiters))
    mean_true, sd_true = hierarchical_truth(d, seed=0)
    mean_err, sd_err = _moment_errors(draws, mean_true, sd_true)
    return {
        "elapsed_s": elapsed,
        "compile_s": compile_s,
        "paths_per_sec": paths_per_sec,
        "khat": float(khat),
        "n_success": int(success.sum()),
        "logp_grad_evals": int(nevals.sum()),
        "elbo_evals_per_sec": float(n_elbo) / elapsed,
        "finite_draws": bool(jnp.all(jnp.isfinite(draws))),
        "frac_paths_capped": frac_capped,
        "ls_exhaustions": int(np.asarray(num_exh).sum()),
        "moment_err_mean_sd_units": mean_err,
        "moment_err_sd_rel": sd_err,
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
    """The five BASELINE.md configs, each as one JSON line with quality
    columns (steady-state timings; compile excluded): khat where PSIS runs,
    and standardized moment errors vs ground truth — analytic for the
    Gaussian/funnel configs, long in-repo NUTS for logistic regression
    (``benchmarks/logreg25_truth.npz``), quadrature for the hierarchical
    target."""
    import os

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
    me, se = _moment_errors(res.draws, np.zeros(5), np.ones(5))
    results.append(
        ("singlepath_5d_diag_gaussian_s", t,
         {"success": bool(res.success), "moment_err_mean": round(me, 3),
          "moment_err_sd": round(se, 3)})
    )

    # config 2: single-path 100-D correlated Gaussian (dense Woodbury path)
    target2 = CorrelatedGaussian(100, seed=0)
    t, res = _time_call(
        lambda k: pathfinder(
            target2, key=k, ndraws=2000, maxiters=128, history_length=20,
            ndraws_elbo=100,
        ),
        jax.random.key(2),
    )
    me, se = _moment_errors(
        res.draws, target2.mean, np.sqrt(np.diag(target2.cov))
    )
    results.append(
        ("singlepath_100d_correlated_gaussian_s", t,
         {"success": bool(res.success), "moment_err_mean": round(me, 3),
          "moment_err_sd": round(se, 3)})
    )

    # config 3: multipath 8 paths + PSIS on 101-D Neal's funnel
    # marginal truth: v ~ N(0, 3^2); x_i marginally mean 0, var E[e^v]=e^{4.5}
    target3 = NealsFunnel(101)
    t, res = _time_call(
        lambda k: multipathfinder(
            target3, 400, key=k, nruns=8, maxiters=128, ntries=4
        ),
        jax.random.key(3),
    )
    sd3 = np.concatenate([[3.0], np.full(100, np.exp(4.5 / 2))])
    me, se = _moment_errors(res.draws, np.zeros(101), sd3)
    from pathfinder_tpu.multipath import _compute_psis_result

    def _khat_mixture(r):
        # khat depends only on the stored K*N log-ratios — no need to
        # resample draws to read it
        return float(
            _compute_psis_result(
                r.logp, r.fit_distribution.components,
                r.draws_per_component, denominator="mixture",
            ).pareto_shape
        )

    khat_mix3 = _khat_mixture(res)
    results.append(
        ("multipath_8paths_funnel101_s", t,
         {"khat": round(float(res.psis_result.pareto_shape), 3),
          "khat_mixture_denom": round(khat_mix3, 3),
          "moment_err_mean": round(me, 3), "moment_err_sd": round(se, 3)})
    )

    # config 4: Bayesian logistic regression d=25, 32 paths
    X, y, _ = german_credit_synthetic(n=1000, d=25, seed=0)
    target4 = LogisticRegression(X.astype(np.float32), y.astype(np.float32))
    t, res = _time_call(
        lambda k: multipathfinder(target4, 1000, key=k, nruns=32, maxiters=64),
        jax.random.key(4),
    )
    extra4 = {"khat": round(float(res.psis_result.pareto_shape), 3)}
    extra4["khat_mixture_denom"] = round(_khat_mixture(res), 3)
    truth_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "logreg25_truth.npz",
    )
    if os.path.exists(truth_path):  # long in-repo NUTS referee (see
        # benchmarks/compute_logreg_truth.py)
        truth = np.load(truth_path)
        me, se = _moment_errors(res.draws, truth["mean"], truth["sd"])
        extra4["moment_err_mean"] = round(me, 3)
        extra4["moment_err_sd"] = round(se, 3)
    results.append(("multipath_32paths_logreg25_s", t, extra4))

    # config 5: 1000-path multipathfinder on 1000-D hierarchical posterior
    stats5 = run_bench(d=1000, n_paths=1000, maxiters=64, ndraws=10_000, repeats=2)
    results.append(
        ("multipath_1000paths_hierarchical1000d_s", stats5["elapsed_s"],
         {"khat": round(stats5["khat"], 3),
          "frac_paths_capped": stats5["frac_paths_capped"],
          "moment_err_mean": round(stats5["moment_err_mean_sd_units"], 3),
          "moment_err_sd": round(stats5["moment_err_sd_rel"], 3)})
    )

    for name, t, extra in results:
        print(
            json.dumps(
                {"metric": name, "value": round(t, 4), "unit": "s",
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
        f"compile={stats['compile_s']:.1f}s "
        f"success={stats['n_success']}/100 khat={stats['khat']:.2f} "
        f"logp+grad_evals={stats['logp_grad_evals']} "
        f"elbo_evals_per_sec={stats['elbo_evals_per_sec']:.3g} "
        f"finite={stats['finite_draws']} "
        f"capped={stats['frac_paths_capped']:.2f} "
        f"ls_exhausted={stats['ls_exhaustions']} "
        f"moment_err_mean={stats['moment_err_mean_sd_units']:.3f}sd "
        f"moment_err_sd={stats['moment_err_sd_rel']:.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
