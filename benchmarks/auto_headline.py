"""auto / auto_laplace at the headline config through the PUBLIC API.

VERDICT r04 task 3: the r04 flagship quality claims were single-key
("auto's winner is cg at khat 0.937", AUTO_COST_r04 key 1) or came from
bench's pipeline builder rather than the driver users call (the 0.855
remedy chain, BENCH_headline_r04_laplace). This measures, for >= 5 keys,
``multipathfinder(...)`` itself at d=1000 / nruns=100 (BASELINE headline):

- default            (optimizer="lbfgs")
- auto               (optimizer="auto", early exit 0.7)
- auto_laplace_diag  (optimizer="auto", auto_laplace="diag")
- auto_laplace_full  (optimizer="auto", auto_laplace="full")

Per key: khat + verdict + winning optimizer + steady wall (one warm call
per variant pays compile; each timed call fetches one element — tunnel
convention). Summary rows: median [min-max] khat, verdict stability,
median wall.

Run: python benchmarks/auto_headline.py [--out FILE] [--keys N] [--cpu]
"""

import argparse
import os
import sys
import time
import warnings

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402
import jax  # noqa: E402

D = 1000
NRUNS = 100
NDRAWS = 1000

VARIANTS = (
    ("default", dict(optimizer="lbfgs"), None),
    ("auto", dict(optimizer="auto"), None),
    ("auto_laplace_diag", dict(optimizer="auto", auto_laplace="diag"), None),
    ("auto_laplace_full", dict(optimizer="auto", auto_laplace="full"), None),
    # the strongest bench-measured remedy chain (khat_cg_laplace 0.855
    # [0.72-1.01] via bench's pipeline builder), exactly as users call
    # it: multipathfinder(optimizer="cg") then
    # laplace_resample(res, ndraws, method="diag")
    ("cg_laplace_diag", dict(optimizer="cg"), "diag"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--keys", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--d", type=int, default=D)
    ap.add_argument("--nruns", type=int, default=NRUNS)
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of variant names to run (default: all)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from benchmarks.jsonl_util import dump_row
    from pathfinder_tpu.models.zoo import HierarchicalGaussian
    from pathfinder_tpu.multipath import laplace_resample, multipathfinder
    from pathfinder_tpu.ops.psis import pareto_k_verdict

    extra = bench.ensure_backend_reachable()
    print(f"# backend: {extra}", file=sys.stderr, flush=True)
    d, nruns = args.d, args.nruns
    target = HierarchicalGaussian(d, seed=0)
    mean_true, sd_true = bench.hierarchical_truth(d, seed=0)

    rows = []
    out_path = args.out or "benchmarks/AUTO_HEADLINE_r05.jsonl"
    with open(out_path, "w") as fh:

        def record(**row):
            rows.append(row)
            fh.write(dump_row(row) + "\n")
            fh.flush()
            print(row, flush=True)

        for name, kw, post in VARIANTS:
            if args.variants is not None and name not in args.variants:
                continue

            def run(key):
                with warnings.catch_warnings():
                    # the new bad-khat hint is expected here; keep the
                    # measurement log clean
                    warnings.simplefilter("ignore")
                    res = multipathfinder(
                        target, NDRAWS, key=key, nruns=nruns,
                        maxiters=64, ndraws_elbo=5, elbo_chunk=8, **kw,
                    )
                    if post is not None:
                        res = laplace_resample(res, NDRAWS, method=post)
                    return res

            res = run(jax.random.key(0))  # compile warm-up, off the clock
            np.asarray(res.draws).ravel()[0]
            for s in range(1, 1 + args.keys):
                t0 = time.perf_counter()
                res = run(jax.random.key(s))
                np.asarray(res.draws).ravel()[0]  # forced host fetch
                t = time.perf_counter() - t0
                khat = float(res.psis_result.pareto_shape)
                me, se = bench._moment_errors(res.draws, mean_true, sd_true)
                record(
                    variant=name, key=s, khat=round(khat, 3),
                    verdict=pareto_k_verdict(khat),
                    winner=str(getattr(res.config, "optimizer", "lbfgs")),
                    corrected=bool(
                        res.fit_distribution.components.cov.B.shape[-1] == 0
                    ),
                    wall_s=round(t, 4),
                    moment_err_mean=round(me, 3),
                    moment_err_sd=round(se, 3),
                    n_success=int(np.asarray(res.states.success).sum()),
                )

        for name, _, _ in VARIANTS:
            sel = [r for r in rows if r.get("variant") == name
                   and not r.get("summary")]
            if not sel:
                continue
            ks = [r["khat"] for r in sel if np.isfinite(r["khat"])]
            verdicts = {r["verdict"] for r in sel}
            record(
                summary=True, variant=name,
                khat_median=round(float(np.median(ks)), 3) if ks else None,
                khat_range=[round(min(ks), 3), round(max(ks), 3)]
                if ks else None,
                verdict_median=pareto_k_verdict(float(np.median(ks)))
                if ks else "not computed",
                verdict_stable=len(verdicts) == 1,
                wall_median_s=round(
                    float(np.median([r["wall_s"] for r in sel])), 4
                ),
                moment_err_sd_median=round(float(np.median(
                    [r["moment_err_sd"] for r in sel]
                )), 3),
                winners=sorted({r["winner"] for r in sel}),
            )


if __name__ == "__main__":
    main()
