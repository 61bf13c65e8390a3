"""Headline-config optimizer comparison on real TPU (round-4 worklist b).

Runs the full multipathfinder pipeline (d=1000 HierarchicalGaussian,
100 paths, ndraws=1000 — BASELINE.json headline) once per trajectory
optimizer and prints one JSON line per optimizer with steady-state time,
khat, moment errors, and eval counts. Reuses bench.py's pipeline builder
so the measurement convention matches the official artifact.

Motivation (NOTES.md round-4 worklist): on every small-d CPU target the
Newton trajectory's candidate locations beat both quasi-Newton
trajectories on funnel-like geometry (khat 0.15-0.20); this measures
whether that holds at the d=1000 headline, where Newton costs d
hessian-vector products per iteration.

Usage: python benchmarks/optimizer_comparison.py [opt ...]
  (default: lbfgs cg bfgs; newton must be requested explicitly — at
  d=1000 its derived-Hessian path is O(d) JVPs per iteration and may
  take minutes to compile/run)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from benchmarks.jsonl_util import dump_row  # noqa: E402


def main():
    import jax

    opts = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "lbfgs", "cg", "bfgs"
    ]
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
            maxiters=64,
            history_length=6,
            ndraws_elbo=5,
            ndraws=max(5, ndraws // n_paths),
            elbo_chunk=8,
            optimizer=opt,
        )
        full_run = bench._make_full_run(d, n_paths, config, target)
        # decompose trace / XLA-compile / first-run like bench.py so a
        # persistent-cache hit is distinguishable from a real compile
        # when comparing across optimizers (ADVICE r03)
        t0 = time.perf_counter()
        lowered = jax.jit(full_run).lower(jax.random.key(0))
        trace_s = time.perf_counter() - t0
        n_cache_before = bench._cache_file_count()
        t0 = time.perf_counter()
        fn = lowered.compile()
        xla_s = time.perf_counter() - t0
        new_cache_files = bench._cache_file_count() - n_cache_before
        t0 = time.perf_counter()
        out = fn(jax.random.key(0))
        bench._sync(out)
        first_run_s = time.perf_counter() - t0
        compile_s = trace_s + xla_s + first_run_s
        times, khats, quality_rows = [], [], []
        for r in range(3):
            t0 = time.perf_counter()
            out = fn(jax.random.key(r + 1))
            bench._sync(out)
            times.append(time.perf_counter() - t0)
            khats.append(round(float(out[1]), 3))
            me_r, se_r = bench._moment_errors(out[0], mean_true, sd_true)
            quality_rows.append(
                {"khat": float(out[1]), "moment_err_mean_sd_units": me_r,
                 "moment_err_sd_rel": se_r}
            )
        (draws, khat, success, nevals, n_elbo, num_valid, num_exh,
         comp_means) = out
        rec = {
            "optimizer": opt,
            "elapsed_s": round(min(times), 4),
            "times_s": [round(t, 4) for t in times],
            "compile_plus_first_s": round(compile_s, 1),
            "trace_lower_s": round(trace_s, 2),
            "xla_compile_s": round(xla_s, 2),
            "first_run_s": round(first_run_s, 2),
            # 0 = persistent-cache hit (the compile column is then not a
            # real compile); >0 = fresh XLA compile
            "new_cache_files": new_cache_files,
            "paths_per_sec": round(n_paths / min(times), 1),
            "khat_per_repeat": khats,
            # khat / moment errors as median + range over the repeat keys
            **bench._quality_spread(quality_rows),
            "n_success": int(np.asarray(success).sum()),
            "logp_grad_evals": int(np.asarray(nevals).sum()),
            "mean_trajectory_len": round(
                float(np.asarray(num_valid).mean() - 1), 1
            ),
            **extra,
        }
        print(dump_row(rec), flush=True)


if __name__ == "__main__":
    main()
