"""Smoke coverage for the driver benchmark entry (bench.py): the headline
pipeline + oracle-khat experiment must run end-to-end at toy scale, emit
every artifact column, and show the oracle ordering the round-3 analysis
rests on (exact-moment Gaussians beat the fitted mixture through the
identical PSIS+resample pipeline)."""

import sys
from pathlib import Path

import numpy as np
import pytest

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)


@pytest.fixture(scope="module")
def bench_module():
    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    import bench

    return bench


def test_run_bench_smoke_with_oracle(bench_module):
    stats = bench_module.run_bench(
        d=50, n_paths=8, maxiters=16, ndraws=80, repeats=1, oracle=True
    )
    for key in (
        "elapsed_s", "paths_per_sec", "trace_lower_s", "xla_compile_s",
        "first_run_s", "compile_total_s", "khat", "khat_oracle_mixture",
        "khat_oracle_moment", "n_success", "logp_grad_evals",
        "frac_paths_capped", "moment_err_mean_sd_units",
        "moment_err_mean_oracle_moment",
    ):
        assert key in stats, key
    assert stats["n_success"] == 8
    assert stats["finite_draws"]
    # the oracle ordering that substantiates the khat analysis: an exact
    # moment-matched Gaussian must beat the fitted mixture (measured
    # margins at d=50: ~0.19 vs ~0.54)
    assert stats["khat_oracle_moment"] < stats["khat"]
    assert (
        stats["moment_err_mean_oracle_moment"]
        < stats["moment_err_mean_sd_units"]
    )


def test_hierarchical_truth_matches_zoo(bench_module):
    """bench's truth wrapper and the zoo helper agree (one source of
    truth for the moment-error columns)."""
    from pathfinder_tpu.models.zoo import hierarchical_gaussian_truth

    m1, s1 = bench_module.hierarchical_truth(40, seed=0)
    m2, s2 = hierarchical_gaussian_truth(40, seed=0)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(s1, s2)
    assert m1.shape == (40,)
    assert np.all(s1 > 0)


def test_run_nuts_bench_smoke(bench_module, capsys):
    """--nuts mode: one JSON line with the throughput metric + sampler
    health columns."""
    import json

    bench_module.run_nuts_bench(d=8, num_samples=50, num_warmup=30)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "nuts_transitions_per_sec_d8"
    assert d["value"] > 0
    for k in ("elapsed_s", "step_size", "mean_tree_depth", "divergences"):
        assert k in d["extra"]
