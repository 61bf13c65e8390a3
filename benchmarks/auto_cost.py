"""Measure optimizer='auto' cost vs a single run (VERDICT r03 task 4).

Two regimes, both at real configs:

- EASY (BASELINE config 4, logreg d=25, 32 paths — measured khat ≈ 0.26):
  the first candidate (lbfgs) lands under the 0.7 early-exit boundary, so
  auto should cost ≈ 1 single run (+ the khat host read).
- HARD (headline d=1000 hierarchical, 100 paths — khat ≈ 2.0 for lbfgs,
  ≥ 1 for cg): no candidate exits early, auto pays the full candidate sum.
  This is the honest negative result: early exit cannot help when every
  candidate is above the boundary (and arbitration is exactly the point
  on such targets).

Prints one JSON line per regime with steady-state single / auto timings.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
import jax  # noqa: E402


def _steady(fn, repeats=3):
    fn()  # compile / warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = fn()
        # force one device->host fetch in EVERY arm (auto's khat read
        # already pays it; without this the single arm under-measures by
        # one tunnel RTT + pipeline drain)
        np.asarray(res.draws).ravel()[0]
        times.append(time.perf_counter() - t0)
    return min(times)


def _steady_nofetch(fn, repeats=3):
    """The async-dispatch timing (no final fetch) — reported alongside so
    the fetch share of the auto overhead is visible."""
    fn()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    extra = bench.ensure_backend_reachable()
    bd = bench.device_breakdown()
    print(f"# platform={bd['platform']} rtt_s={bd['rtt_s']}",
          file=sys.stderr, flush=True)

    from pathfinder_tpu import multipathfinder
    from pathfinder_tpu.models.zoo import (
        HierarchicalGaussian,
        LogisticRegression,
        german_credit_synthetic,
    )

    # EASY regime: BASELINE config 4
    X, y, _ = german_credit_synthetic(n=1000, d=25, seed=0)
    target4 = LogisticRegression(X.astype(np.float32), y.astype(np.float32))

    def run4(opt):
        return multipathfinder(
            target4, 1000, key=jax.random.key(4), nruns=32, maxiters=64,
            optimizer=opt,
        )

    t_single = _steady(lambda: run4("lbfgs"))
    t_auto = _steady(lambda: run4("auto"))
    t_auto_exh = _steady(
        lambda: multipathfinder(
            target4, 1000, key=jax.random.key(4), nruns=32, maxiters=64,
            optimizer="auto", auto_khat_early_exit=None,
        )
    )
    t_single_nofetch = _steady_nofetch(lambda: run4("lbfgs"))
    res = run4("auto")
    print(json.dumps({
        "regime": "easy_logreg25_32paths",
        "single_lbfgs_s": round(t_single, 4),
        "auto_s": round(t_auto, 4),
        "auto_exhaustive_s": round(t_auto_exh, 4),
        "single_lbfgs_nofetch_s": round(t_single_nofetch, 4),
        "auto_over_single": round(t_auto / t_single, 2),
        "winner": str(res.config.optimizer),
        "khat": round(float(res.psis_result.pareto_shape), 3),
        **extra,
    }), flush=True)

    # HARD regime: headline config
    target5 = HierarchicalGaussian(1000, seed=0)

    def run5(opt, **kw):
        return multipathfinder(
            target5, 1000, key=jax.random.key(1), nruns=100, maxiters=64,
            ndraws_elbo=5, elbo_chunk=8, optimizer=opt, **kw,
        )

    t_single5 = _steady(lambda: run5("lbfgs"))
    t_auto5 = _steady(lambda: run5("auto"))
    res5 = run5("auto")
    print(json.dumps({
        "regime": "hard_hierarchical1000d_100paths",
        "single_lbfgs_s": round(t_single5, 4),
        "auto_s": round(t_auto5, 4),
        "auto_over_single": round(t_auto5 / t_single5, 2),
        "winner": str(res5.config.optimizer),
        "khat": round(float(res5.psis_result.pareto_shape), 3),
        **extra,
    }), flush=True)


if __name__ == "__main__":
    main()
