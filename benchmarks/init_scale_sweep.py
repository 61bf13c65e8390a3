"""Init-scale sweep at the d=1000 headline config (VERDICT r03 task 2).

Round-3 root-cause analysis (NOTES.md "khat ≈ 2.0 at d=1000"): the
"very bad" headline verdict comes from candidate *locations* — with the
default ``init_scale=2`` (the reference's ``UniformSampler(init_scale=2)``,
``src/singlepath.jl:332-344``), ``‖θ₀‖² ≈ 1332 ≫ E‖obs‖² ≈ 999`` drives a
steep initial dive of the global log-scale coordinate to ``log_tau ≈ −8``
(posterior mass: −2.92 ± 0.46), and the ELBO then picks a wide-covariance
candidate parked on the dive. Smaller inits start closer to the data scale,
so the trajectory should approach the mass region without the dive.

This script measures that hypothesis: khat + moment errors (median and
range over keys) for init_scale × optimizer grids, one JSON line each.

Usage::

    python benchmarks/init_scale_sweep.py [scales...] [--opt lbfgs cg] [--keys N]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from benchmarks.jsonl_util import dump_row  # noqa: E402
import jax  # noqa: E402


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scales", type=float, nargs="*",
                    default=[2.0, 1.0, 0.5, 0.25])
    ap.add_argument("--opt", nargs="+", default=["lbfgs", "cg"])
    ap.add_argument("--keys", type=int, default=3)
    ns = ap.parse_args()
    scales = ns.scales or [2.0, 1.0, 0.5, 0.25]
    opts = tuple(ns.opt)
    nkeys = ns.keys

    extra = bench.ensure_backend_reachable()
    bd = bench.device_breakdown()
    print(f"# platform={bd['platform']} rtt_s={bd['rtt_s']}",
          file=sys.stderr, flush=True)

    from pathfinder_tpu.models.zoo import HierarchicalGaussian
    from pathfinder_tpu.singlepath import PathfinderConfig

    d, n_paths, ndraws = 1000, 100, 1000
    target = HierarchicalGaussian(d, seed=0)
    mean_true, sd_true = bench.hierarchical_truth(d, seed=0)

    for opt in opts:
        config = PathfinderConfig(
            maxiters=64, history_length=6, ndraws_elbo=5,
            ndraws=max(5, ndraws // n_paths), elbo_chunk=8, optimizer=opt,
        )
        for scale in scales:
            full_run = bench._make_full_run(
                d, n_paths, config, target, init_scale=scale
            )
            fn = jax.jit(full_run)
            times, rows = [], []
            for s in range(1, 1 + nkeys):
                t0 = time.perf_counter()
                out = fn(jax.random.key(s))
                bench._sync(out)
                times.append(time.perf_counter() - t0)
                me, se = bench._moment_errors(out[0], mean_true, sd_true)
                rows.append(
                    {"khat": float(out[1]), "moment_err_mean_sd_units": me,
                     "moment_err_sd_rel": se}
                )
            out_rec = {
                "optimizer": opt,
                "init_scale": scale,
                "elapsed_s": round(min(times[1:]) if len(times) > 1
                                   else times[0], 4),
                **bench._quality_spread(rows),
                "n_success": int(np.asarray(out[2]).sum()),
                "mean_trajectory_len": round(
                    float(np.asarray(out[5]).mean() - 1), 1
                ),
                **extra,
            }
            print(dump_row(out_rec), flush=True)


if __name__ == "__main__":
    main()
