"""laplace_resample on the non-headline bench configs (round 4).

LAPLACE_COV_r04 measured the correction on the d=1000 hierarchical
headline (khat 2.0 -> 0.85-1.3 depending on trajectory). Two open
questions on the other multipath bench configs:

1. **funnel-101** (``multipath_8paths_funnel101``): the fitted khat sits
   ON the bad/very-bad verdict boundary (0.91-1.09 across r03/r04
   artifacts). The funnel's conditionals ARE Gaussian given v
   (x_i | v ~ N(0, e^v)), so the diagonal Hessian at a component mean is
   the exact conditional precision for the x block — does the correction
   settle the verdict?
2. **logreg-25** (``multipath_32paths_logreg25``): the fitted khat is
   already good (~0.30). The d=200 hierarchical drive measured the
   correction as a slight NEGATIVE on already-good fits (0.65 -> 1.02) —
   does that reproduce here (supporting the "apply when bad, keep only
   if k-hat improves" guidance and auto_laplace's keep-rule)?

Same config shapes and keys as ``bench.py --all`` (keys 3..7 funnel,
4..8 logreg). Each row: fitted control khat (reproduces the --all
artifact), then laplace diag/full khat + moment errors on fresh draws.

Run: python benchmarks/laplace_other_configs.py [--out FILE]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.jsonl_util import dump_row

NKEYS = int(os.environ.get("LAPLACE_OC_KEYS", "5"))


def main(out_path):
    from bench import _moment_errors
    from pathfinder_tpu import laplace_resample, multipathfinder
    from pathfinder_tpu.models.zoo import (
        LogisticRegression,
        NealsFunnel,
        german_credit_synthetic,
    )

    # ----- config 3: funnel-101, 8 paths ---------------------------------
    target3 = NealsFunnel(101)
    sd3 = np.concatenate([[3.0], np.full(100, np.exp(4.5 / 2))])
    mean3 = np.zeros(101)

    # ----- config 4: logreg-25, 32 paths ----------------------------------
    X, y, _ = german_credit_synthetic(n=1000, d=25, seed=0)
    target4 = LogisticRegression(X.astype(np.float32), y.astype(np.float32))
    truth_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "logreg25_truth.npz")
    truth = np.load(truth_path)

    configs = [
        ("funnel101_8paths", target3,
         dict(ndraws=400, nruns=8, maxiters=128, ntries=4),
         mean3, sd3, range(3, 3 + NKEYS)),
        ("logreg25_32paths", target4,
         dict(ndraws=1000, nruns=32, maxiters=64),
         truth["mean"], truth["sd"], range(4, 4 + NKEYS)),
    ]

    rows = []

    def record(fh, **row):
        rows.append(row)
        fh.write(dump_row(row) + "\n")
        fh.flush()
        print(row, flush=True)

    with open(out_path, "w") as fh:
        for name, target, kw, mean_true, sd_true, keys in configs:
            ndraws = kw.pop("ndraws")
            for s in keys:
                res = multipathfinder(
                    target, ndraws, key=jax.random.key(s), **kw
                )
                me, se = _moment_errors(res.draws, mean_true, sd_true)
                record(fh, config=name, variant="fit", key=s,
                       khat=round(float(res.psis_result.pareto_shape), 3),
                       moment_err_mean=round(me, 3),
                       moment_err_sd=round(se, 3))
                for method in ("diag", "full"):
                    r2 = laplace_resample(res, ndraws, method=method)
                    me, se = _moment_errors(r2.draws, mean_true, sd_true)
                    record(fh, config=name, variant=f"laplace_{method}",
                           key=s,
                           khat=round(
                               float(r2.psis_result.pareto_shape), 3),
                           moment_err_mean=round(me, 3),
                           moment_err_sd=round(se, 3))

        for name, *_ in configs:
            for variant in ("fit", "laplace_diag", "laplace_full"):
                sel = [r for r in rows
                       if r.get("config") == name and r["variant"] == variant]
                if not sel:
                    continue
                ks = [r["khat"] for r in sel if np.isfinite(r["khat"])]
                mes = [r["moment_err_mean"] for r in sel
                       if np.isfinite(r["moment_err_mean"])]
                record(
                    fh, summary=True, config=name, variant=variant,
                    khat_median=round(float(np.median(ks)), 3)
                    if ks else float("nan"),
                    khat_range=[round(min(ks), 3), round(max(ks), 3)]
                    if ks else None,
                    moment_err_mean_median=round(float(np.median(mes)), 3)
                    if mes else float("nan"),
                )


if __name__ == "__main__":
    out = "benchmarks/LAPLACE_OTHER_r04.jsonl"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    main(out)
