"""Host-offloaded paths-axis ceiling on ONE chip, through the PUBLIC API.

`PATHS_SLIM_r05.jsonl` measured `keep_traces=False` + chunked launches to
K=16384 on one 16 GB v5e at d=1000; K=32768 RESOURCE_EXHAUSTEDs
(`PATHS_SLIM32_r05.jsonl`) because completed chunks' slim states
(~130 KB/path) still accumulate in HBM. `offload_launches` streams each
chunk's output to host RAM as it completes, so only one in-flight chunk
lives on device and host memory becomes the paths-axis ceiling. This
measures that third serving-scale lever end to end through
`multipathfinder` itself (driver warnings, retry machinery, PSIS tail,
resample — the product path, not a bench pipeline).

Usage: python benchmarks/paths_offload.py [--out F.jsonl] [--cpu]
       [--ks 16384 32768] [--no-offload]
"""

import argparse
import json
import os
import sys
import time
import warnings

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--d", type=int, default=1000)
    ap.add_argument("--ks", type=int, nargs="*", default=[16384, 32768])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--no-offload", action="store_true",
        help="force offload_launches=False (measures the on-device "
        "accumulation boundary for contrast)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    t0 = time.perf_counter()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"device probe: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    from pathfinder_tpu.models.zoo import HierarchicalGaussian
    from pathfinder_tpu.multipath import multipathfinder

    d = args.d
    target = HierarchicalGaussian(d, seed=0)
    offload = False if args.no_offload else True
    rows = []
    for k_paths in args.ks:
        def run(key_int):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                res = multipathfinder(
                    target, 5 * k_paths, key=jax.random.key(key_int),
                    nruns=k_paths, ndraws_per_run=5, ndraws_elbo=5,
                    maxiters=64, history_length=6, elbo_chunk=8,
                    keep_traces=False, offload_launches=offload,
                )
            # force completion: host fetch of one element of every output
            float(np.asarray(res.draws[0, 0]))
            float(res.psis_result.pareto_shape)
            return res

        try:
            t0 = time.perf_counter()
            res = run(0)
            first_s = time.perf_counter() - t0
            times = []
            for r in range(args.repeats):
                t0 = time.perf_counter()
                res = run(r + 1)
                times.append(time.perf_counter() - t0)
        except Exception as e:  # OOM is a valid measured boundary
            rows.append({
                "k_paths": k_paths, "d": d, "offload": offload,
                "failed": type(e).__name__,
                "message": str(e).splitlines()[0][:200],
            })
            print(json.dumps(rows[-1]))
            break
        steady = min(times)
        rows.append({
            "k_paths": k_paths, "d": d, "offload": offload,
            "cap": res.max_paths_per_launch,
            "steady_s": round(steady, 4),
            "times_s": [round(t, 4) for t in times],
            "first_incl_compile_s": round(first_s, 2),
            "paths_per_sec": round(k_paths / steady, 1),
            "khat": round(float(res.psis_result.pareto_shape), 3),
            "n_success": int(np.asarray(res.states.success).sum()),
            "states_on_host": isinstance(res.states.draws, np.ndarray),
            "slim_state_gb": round(
                sum(
                    leaf.size * leaf.dtype.itemsize
                    for leaf in jax.tree_util.tree_leaves(res.states)
                    if hasattr(leaf, "dtype")
                ) / 2**30, 2,
            ),
        })
        print(json.dumps(rows[-1]))
        print(
            f"K={k_paths}: {steady:.2f}s = {k_paths / steady:.0f} paths/s "
            f"(khat {rows[-1]['khat']}, host={rows[-1]['states_on_host']})",
            file=sys.stderr,
        )
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
