"""Warm-start value: Pathfinder-warm-started NUTS vs standalone NUTS.

The reference's primary use case is MCMC warm-start — initial position +
metric from the fit covariance — with the paper's headline claim of
"usually with many fewer gradient evaluations" than NUTS Phase-I warmup
(reference ``docs/src/index.md:9-37``, ``README.md:12-17``). This script
measures that claim end-to-end on TPU with EXACT gradient-eval ledgers:

- arm "standalone": C NUTS chains from scratch — identity metric, Stan's
  windowed mass-matrix adaptation (``adapt_mass_matrix=True``), a full
  warmup, then sampling. Warmup cost = sum of per-transition leapfrog
  counts (``NUTSResult.warmup_n_leapfrogs``, exact — each leapfrog is one
  logp+grad evaluation).
- arm "warmstart": multipathfinder -> PSIS draws as chain inits + the fit
  covariance as the (fixed) metric -> short step-size-only warmup ->
  sampling. Warmup cost = Pathfinder's optimizer evals (logp+grad, per
  path) + ELBO/PSIS logp-only evals + the short NUTS warmup.

Both arms then sample the same number of post-warmup draws; quality is
compared on moment errors vs ground truth and bulk/tail ESS, so the eval
comparison is at matched output quality, not just matched draw count.

Usage: python benchmarks/warmstart_value.py [--out FILE.jsonl]
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

N_CHAINS = 4
N_SAMPLES = 1000


def _sync(out):
    # block_until_ready can return early through the axon tunnel; force a
    # one-element host fetch (bench.py convention)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def _time_warm(fn, n=3):
    """First call compiles; report min of n warm repeats."""
    out = fn()
    _sync(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def _quality(chains_samples, mean_true, sd_true):
    """(C, N, d) sampling draws -> moment errors vs truth + ESS/R-hat."""
    from pathfinder_tpu.utils.diagnostics import (
        ess_bulk,
        ess_tail,
        split_rhat,
    )

    xs = np.asarray(chains_samples)
    flat = xs.reshape(-1, xs.shape[-1])
    n = flat.shape[0]
    err_mean = np.abs(flat.mean(0) - mean_true) / (sd_true / np.sqrt(n))
    # standardized in units of the POSTERIOR sd (not the MC SE) for the
    # sd error, matching bench.py's `_moment_errors` convention
    err_mean_sd_units = float(np.max(np.abs(flat.mean(0) - mean_true) / sd_true))
    err_sd_rel = float(np.max(np.abs(flat.std(0) - sd_true) / sd_true))
    s = jnp.asarray(xs)
    return {
        "moment_err_mean_sd_units": round(err_mean_sd_units, 4),
        "moment_err_sd_rel": round(err_sd_rel, 4),
        "moment_err_mean_se_units": round(float(err_mean.max()), 2),
        "min_ess_bulk": round(float(np.min(np.asarray(ess_bulk(s)))), 1),
        "min_ess_tail": round(float(np.min(np.asarray(ess_tail(s)))), 1),
        "max_split_rhat": round(float(np.max(np.asarray(split_rhat(s)))), 4),
    }


def _nuts_eval_ledger(out):
    """Exact logp+grad evals across all chains per ``nuts_chains`` call:
    every leapfrog, plus TWO non-leapfrog evals per chain — the
    host-boundary Stan-style init validation batch (nuts.py
    ``nuts_chains``) and the initial-point eval inside ``nuts()``."""
    C = out.samples.shape[0]
    warm = int(np.asarray(out.warmup_n_leapfrogs).sum())
    samp = int(np.asarray(out.n_leapfrogs).sum())
    return {
        "nuts_warmup_vg_evals": warm + 2 * C,
        "nuts_sampling_vg_evals": samp,
        "mean_tree_depth": round(float(np.asarray(out.tree_depths).mean()), 2),
        "frac_diverging": round(float(np.asarray(out.diverging).mean()), 4),
        "step_size": [round(float(e), 4) for e in np.asarray(out.step_size)],
    }


def _ess_per_eval(row):
    """ESS-normalized value columns (VERDICT r04 task 5): ESS delivered
    per 1000 logp+grad evaluations, bulk and tail — the honest
    cross-arm comparison when the arms deliver different ESS at the
    chosen budgets."""
    tot = max(row["total_vg_evals"], 1)
    row["ess_bulk_per_1k_vg"] = round(row["min_ess_bulk"] / tot * 1000, 2)
    row["ess_tail_per_1k_vg"] = round(row["min_ess_tail"] / tot * 1000, 2)
    return row


def run_target(name, target, mean_true, sd_true, key, *, nruns,
               pf_maxiters, standalone_warmup, warmstart_warmup,
               init_scale=2.0, matched_factor=None):
    from pathfinder_tpu.integrations.nuts import (
        nuts_chains,
        warm_start_chains,
    )
    from pathfinder_tpu.multipath import multipathfinder

    d = mean_true.shape[0]
    vg = target.value_and_grad
    rows = []

    # ---- arm A: standalone NUTS (identity metric + windowed adaptation)
    k_a = jax.random.fold_in(key, 0)
    x0s = jax.random.uniform(
        jax.random.fold_in(k_a, 1), (N_CHAINS, d),
        minval=-init_scale, maxval=init_scale,
    )
    run_a = lambda: nuts_chains(  # noqa: E731
        jax.random.fold_in(k_a, 2), vg, None, x0s,
        num_samples=N_SAMPLES, num_warmup=standalone_warmup,
        adapt_mass_matrix=True,
    )[0]
    t_a, out_a = _time_warm(run_a)
    ledger_a = _nuts_eval_ledger(out_a)
    rows.append(_ess_per_eval({
        "target": name, "arm": "standalone_nuts",
        "num_warmup": standalone_warmup, "chains": N_CHAINS,
        "wall_s": round(t_a, 4),
        "warmup_vg_evals": ledger_a["nuts_warmup_vg_evals"],
        "total_vg_evals": (
            ledger_a["nuts_warmup_vg_evals"]
            + ledger_a["nuts_sampling_vg_evals"]
        ),
        "logp_only_evals": 0,
        **ledger_a,
        **_quality(out_a.samples, mean_true, sd_true),
    }))

    # ---- arm B: Pathfinder warm start (fit metric + PSIS-draw inits)
    k_b = jax.random.fold_in(key, 1)
    t0 = time.perf_counter()
    res = multipathfinder(
        target, max(N_CHAINS * 8, 64), key=jax.random.fold_in(k_b, 0),
        nruns=nruns, maxiters=pf_maxiters,
    )
    _sync(res.draws)
    pf_compile_s = time.perf_counter() - t0
    # warm wall time on a fresh key (first call above paid the compile)
    t0 = time.perf_counter()
    res2 = multipathfinder(
        target, max(N_CHAINS * 8, 64), key=jax.random.fold_in(k_b, 7),
        nruns=nruns, maxiters=pf_maxiters,
    )
    _sync(res2.draws)
    pf_wall_s = time.perf_counter() - t0

    # exact Pathfinder eval ledger (bench.py convention):
    # optimizer evals are logp+grad; ELBO-candidate draws and the K*N
    # PSIS denominators are logp-only
    pf_vg = int(np.asarray(res.states.num_fn_evals).sum())
    num_valid = np.asarray(res.states.trace.num_valid)
    kN = res.draws_per_component.shape[0] * res.draws_per_component.shape[1]
    pf_logp_only = int(
        (num_valid - 1).sum() * res.config.ndraws_elbo + kN
    )

    vg_b, metric, x0s_b = warm_start_chains(res, N_CHAINS)

    def arm_b(num_samples, arm_name):
        run_b = lambda: nuts_chains(  # noqa: E731
            jax.random.fold_in(k_b, 2), vg_b, metric, x0s_b,
            num_samples=num_samples, num_warmup=warmstart_warmup,
            adapt_mass_matrix=False,
        )[0]
        t_b, out_b = _time_warm(run_b)
        ledger_b = _nuts_eval_ledger(out_b)
        return _ess_per_eval({
            "target": name, "arm": arm_name,
            "num_warmup": warmstart_warmup, "chains": N_CHAINS,
            "num_samples": num_samples,
            "pf_nruns": nruns, "pf_khat": round(
                float(res.psis_result.pareto_shape), 3
            ) if res.psis_result is not None else None,
            "wall_s": round(pf_wall_s + t_b, 4),
            "pf_wall_s": round(pf_wall_s, 4),
            "pf_compile_s": round(pf_compile_s, 2),
            "nuts_wall_s": round(t_b, 4),
            "pf_vg_evals": pf_vg,
            "warmup_vg_evals": pf_vg + ledger_b["nuts_warmup_vg_evals"],
            "total_vg_evals": (
                pf_vg + ledger_b["nuts_warmup_vg_evals"]
                + ledger_b["nuts_sampling_vg_evals"]
            ),
            "logp_only_evals": pf_logp_only,
            **ledger_b,
            **_quality(out_b.samples, mean_true, sd_true),
        })

    rows.append(arm_b(N_SAMPLES, "pathfinder_warmstart"))
    if matched_factor is not None:
        # ESS-matched arm (VERDICT r04 task 5): extend warm-started
        # sampling until delivered ESS is comparable to standalone's,
        # so the total-eval comparison is at matched output quality
        rows.append(
            arm_b(N_SAMPLES * matched_factor, "pathfinder_warmstart_matched")
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke testing; the "
                    "JAX_PLATFORMS env var is ignored under the axon "
                    "plugin, so this must be a config update)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny chains/warmup for a fast smoke run")
    ap.add_argument("--targets", nargs="*", default=None,
                    help="subset of {logreg25, corrgauss100, funnel101} "
                    "to run (default: all)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        global N_SAMPLES
        N_SAMPLES = 100

    from pathfinder_tpu.models.zoo import (
        CorrelatedGaussian,
        LogisticRegression,
        NealsFunnel,
        german_credit_synthetic,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    sw = 100 if args.quick else 1000  # standalone warmup length
    ww = 20 if args.quick else 100    # warm-started warmup length
    rows = []

    def want(name):
        return args.targets is None or name in args.targets

    # target 1: Bayesian logistic regression d=25 (long-NUTS truth on
    # disk; the reference integration tests' realistic-model role)
    if want("logreg25"):
        X, y, _ = german_credit_synthetic(n=1000, d=25, seed=0)
        t1 = LogisticRegression(X.astype(np.float32), y.astype(np.float32))
        truth = np.load(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "logreg25_truth.npz"
        ))
        rows += run_target(
            "logreg25", t1, truth["mean"], truth["sd"], jax.random.key(0),
            nruns=8, pf_maxiters=64,
            standalone_warmup=sw, warmstart_warmup=ww,
        )

    # target 2: 100-D correlated Gaussian (analytic truth; ill-conditioned
    # enough that the metric choice dominates NUTS cost). matched_factor=4:
    # r04 measured warm-started min bulk ESS 852 vs 3089 standalone at
    # equal draw counts — the matched arm extends sampling ~4x so the
    # total-eval comparison is at matched delivered ESS (VERDICT task 5)
    if want("corrgauss100"):
        t2 = CorrelatedGaussian(100, seed=11)
        rows += run_target(
            "corrgauss100", t2, np.asarray(t2.mean),
            np.sqrt(np.diag(np.asarray(t2.cov))), jax.random.key(1),
            nruns=8, pf_maxiters=128,
            standalone_warmup=sw, warmstart_warmup=ww,
            matched_factor=4,
        )

    # target 3: 101-D Neal's funnel — the config where importance
    # sampling is measured hopeless (bench --all config 3: fit khat 1.09
    # seed-unstable, laplace negative, cg 4.56, mixture-denom 1.06;
    # LAPLACE_OTHER_r04). The principled remedy the repo ships is
    # warm-started NUTS (VERDICT r04 task 4) — this measures it vs
    # standalone NUTS. Marginal truth: v ~ N(0, 3²); x_i mean 0,
    # sd = exp(4.5/2) (scale mixture — heavy-tailed, so ESS/moment
    # errors converge slowly; same convention as bench config 3).
    if want("funnel101"):
        t3 = NealsFunnel(101)
        sd3 = np.concatenate(
            [[3.0], np.full(100, np.exp(4.5 / 2))]
        ).astype(np.float64)
        # matched_factor=8: at 1000 samples neither arm converges the
        # funnel (r05: rhat 1.71 standalone / 1.37 warm-started) — the
        # extended arm measures where warm-started sampling actually
        # lands with an 8x budget (still far fewer total evals than
        # standalone's warmup alone)
        rows += run_target(
            "funnel101", t3, np.zeros(101), sd3, jax.random.key(2),
            nruns=8, pf_maxiters=128,
            standalone_warmup=sw, warmstart_warmup=ww,
            matched_factor=8,
        )

    out_lines = [json.dumps(r) for r in rows]
    for ln in out_lines:
        print(ln)
    # headline ratios (stderr, human-readable)
    for tname in ("logreg25", "corrgauss100", "funnel101"):
        if not want(tname):
            continue
        a = next(r for r in rows if r["target"] == tname
                 and r["arm"] == "standalone_nuts")
        b = next(r for r in rows if r["target"] == tname
                 and r["arm"] == "pathfinder_warmstart")
        print(
            f"{tname}: warmup evals {a['warmup_vg_evals']} -> "
            f"{b['warmup_vg_evals']} "
            f"({a['warmup_vg_evals'] / max(b['warmup_vg_evals'], 1):.1f}x "
            "fewer), total vg evals "
            f"{a['total_vg_evals']} -> {b['total_vg_evals']}, wall "
            f"{a['wall_s']:.3f}s -> {b['wall_s']:.3f}s, min tail ESS "
            f"{a['min_ess_tail']} -> {b['min_ess_tail']}, "
            f"tail ESS/1k evals {a['ess_tail_per_1k_vg']} -> "
            f"{b['ess_tail_per_1k_vg']}",
            file=sys.stderr,
        )
        m = next((r for r in rows if r["target"] == tname
                  and r["arm"] == "pathfinder_warmstart_matched"), None)
        if m is not None:
            print(
                f"{tname} (ESS-matched arm, {m['num_samples']} draws): "
                f"min bulk ESS {m['min_ess_bulk']} vs standalone "
                f"{a['min_ess_bulk']}, total vg evals "
                f"{m['total_vg_evals']} vs {a['total_vg_evals']}",
                file=sys.stderr,
            )
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(out_lines) + "\n")


if __name__ == "__main__":
    main()
