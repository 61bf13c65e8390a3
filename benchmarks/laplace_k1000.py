"""Laplace correction at the K=1000 production config (round 4).

``bench.py --all`` config 5 (1000 paths x d=1000 hierarchical,
ndraws=10k) measures fitted khat 1.66 [1.48-1.80]. This runs the same
config through bench's own pipeline builder with and without the
``laplace="diag"`` stage: does the remedy scale to K=1000 — the Hessian
batch is (1000, 1000, 1000) f32 = 4 GB of HBM — and does it fix the
verdict at production path counts?

Run: python benchmarks/laplace_k1000.py [--out FILE]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from benchmarks.jsonl_util import dump_row  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

D = 1000
K = 1000
NDRAWS = 10_000
KEYS = range(1, 1 + int(os.environ.get("LAPLACE_K1000_KEYS", "5")))


def main(out_path):
    from pathfinder_tpu.models.zoo import HierarchicalGaussian
    from pathfinder_tpu.singlepath import PathfinderConfig

    extra = bench.ensure_backend_reachable()
    print(f"# backend: {extra}", file=sys.stderr, flush=True)
    target = HierarchicalGaussian(D, seed=0)
    config = PathfinderConfig(
        maxiters=64, history_length=6, ndraws_elbo=5,
        ndraws=max(5, NDRAWS // K), elbo_chunk=8,
    )
    mean_true, sd_true = bench.hierarchical_truth(D, seed=0)

    rows = []
    with open(out_path, "w") as fh:

        def record(**row):
            rows.append(row)
            fh.write(dump_row(row) + "\n")
            fh.flush()
            print(row, flush=True)

        variants = [("fit", None, "lbfgs"), ("laplace_diag", "diag", "lbfgs")]
        if "--cg" in sys.argv:
            # the full r04 headline remedy chain (cg trajectories + diag
            # Laplace) at production path count
            variants += [
                ("cg", None, "cg"), ("cg_laplace_diag", "diag", "cg"),
            ]
        for variant, laplace, opt in variants:
            cfg = config._replace(optimizer=opt)
            run = jax.jit(
                bench._make_full_run(D, K, cfg, target, laplace=laplace)
            )
            out = run(jax.random.key(0))
            bench._sync(out)  # compile + first run off the clock
            for s in KEYS:
                t0 = time.perf_counter()
                out = run(jax.random.key(s))
                bench._sync(out)
                t = time.perf_counter() - t0
                me, se = bench._moment_errors(out[0], mean_true, sd_true)
                record(variant=variant, key=s,
                       khat=round(float(out[1]), 3),
                       moment_err_mean=round(me, 3),
                       moment_err_sd=round(se, 3),
                       elapsed_s=round(t, 4),
                       n_success=int(np.asarray(out[2]).sum()))

        for variant, _, _ in variants:
            sel = [r for r in rows if r.get("variant") == variant]
            ks = [r["khat"] for r in sel if np.isfinite(r["khat"])]
            mes = [r["moment_err_mean"] for r in sel
                   if np.isfinite(r["moment_err_mean"])]
            record(summary=True, variant=variant,
                   khat_median=round(float(np.median(ks)), 3)
                   if ks else float("nan"),
                   khat_range=[round(min(ks), 3), round(max(ks), 3)]
                   if ks else None,
                   moment_err_mean_median=round(float(np.median(mes)), 3)
                   if mes else float("nan"),
                   elapsed_median_s=round(
                       float(np.median([r["elapsed_s"] for r in sel])), 4))


if __name__ == "__main__":
    out = "benchmarks/LAPLACE_K1000_r04.jsonl"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    main(out)
