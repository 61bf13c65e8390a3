"""ESS / R-hat diagnostics tests against known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from pathfinder_tpu.utils.diagnostics import ess_bulk, split_rhat, summarize


def test_rhat_iid_chains_near_one():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 2000, 3))
    r = np.asarray(split_rhat(jnp.asarray(x)))
    assert np.all(r < 1.02)


def test_rhat_detects_disagreement():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 1000, 2))
    x[0, :, 0] += 3.0  # one chain shifted in dim 0
    r = np.asarray(split_rhat(jnp.asarray(x)))
    # rank normalization compresses the scale vs plain split-Rhat; 1.47 here
    assert r[0] > 1.3
    assert r[1] < 1.05


def test_ess_iid_near_total():
    rng = np.random.default_rng(2)
    C, N = 4, 4000
    x = rng.standard_normal((C, N, 2))
    ess = np.asarray(ess_bulk(jnp.asarray(x)))
    total = C * N
    assert np.all(ess > 0.75 * total)
    assert np.all(ess < 1.35 * total)


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient φ has ESS/N = (1−φ)/(1+φ)."""
    rng = np.random.default_rng(3)
    phi = 0.7
    C, N = 4, 20000
    eps = rng.standard_normal((C, N + 500))
    x = np.zeros_like(eps)
    for t in range(1, eps.shape[1]):
        x[:, t] = phi * x[:, t - 1] + eps[:, t] * np.sqrt(1 - phi**2)
    x = x[:, 500:][:, :, None]
    ess = float(np.asarray(ess_bulk(jnp.asarray(x)))[0])
    expected = C * N * (1 - phi) / (1 + phi)
    assert abs(ess - expected) / expected < 0.25, (ess, expected)


def test_summarize_shapes():
    rng = np.random.default_rng(4)
    s = summarize(jnp.asarray(rng.standard_normal((2, 500, 3))))
    assert s["mean"].shape == (3,)
    assert s["rhat"].shape == (3,)
    s1 = summarize(jnp.asarray(rng.standard_normal((500, 3))))
    assert s1["ess_bulk"].shape == (3,)


def test_ess_tail_iid_vs_autocorrelated():
    """iid chains: tail ESS near the sample count; AR(1) chains: far less
    (the indicator inherits the autocorrelation)."""
    import numpy as np
    from pathfinder_tpu.utils.diagnostics import ess_tail

    rng = np.random.default_rng(0)
    C, N = 4, 2000
    iid = rng.standard_normal((C, N, 1))
    tail_iid = float(np.asarray(ess_tail(jnp.asarray(iid)))[0])
    assert 0.5 * C * N < tail_iid < 1.5 * C * N

    rho = 0.95
    ar = np.zeros((C, N, 1))
    z = rng.standard_normal((C, N))
    for t in range(1, N):
        ar[:, t, 0] = rho * ar[:, t - 1, 0] + np.sqrt(1 - rho**2) * z[:, t]
    tail_ar = float(np.asarray(ess_tail(jnp.asarray(ar)))[0])
    assert tail_ar < 0.25 * tail_iid


def test_ess_tail_in_summarize():
    import numpy as np
    from pathfinder_tpu.utils.diagnostics import summarize

    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 500, 3)))
    s = summarize(x)
    assert s["ess_tail"].shape == (3,)
    assert np.all(np.asarray(s["ess_tail"]) > 100)


def test_throttled_progress_contract():
    """The multipath progress reporter honors its throttle contract
    (<= 1 line per min_fraction of progress) and always emits the final
    100% line (reference: src/multipath.jl:164-214 throttle)."""
    import io

    from pathfinder_tpu.utils.progress import ThrottledProgress

    buf = io.StringIO()
    p = ThrottledProgress(1000, min_seconds=0.0, min_fraction=0.1, stream=buf)
    for i in range(0, 1001, 10):
        p.update(i)
    p.close()
    out = buf.getvalue()
    # throttled: ~10 updates (every 10%), not 100
    assert out.count("/1000") <= 15
    assert "1000/1000 (100.0%)" in out


def test_throttled_progress_final_state_visible_when_incomplete():
    """close() must emit the last reported state even when it was
    throttled away (completed < total, e.g. permanently failed paths) —
    the terminal line must not show a stale earlier count."""
    import io

    from pathfinder_tpu.utils.progress import ThrottledProgress

    buf = io.StringIO()
    p = ThrottledProgress(100, min_seconds=1e9, min_fraction=0.5, stream=buf)
    p.update(10, extra="(round 1, long tail here)")
    p.update(97, extra="done")  # throttled: below step AND inside window
    p.close()
    lines = buf.getvalue().split("\r")
    assert any("97/100" in ln for ln in lines)
    # a shorter final line fully overwrites the longer previous one
    final = lines[-1].rstrip("\n")
    assert "long tail" not in final


def test_rank_normalize_bool_and_bf16_chains():
    """Rank arithmetic happens in float32+, not the sample dtype: a bool
    indicator chain must yield finite diagnostics (ranks would all round
    to one value in bool/bf16 arithmetic)."""
    import ml_dtypes

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 500, 1))
    ind = jnp.asarray(x > 0.3)  # bool indicator chains
    r = np.asarray(split_rhat(ind))
    assert np.isfinite(r).all() and np.all(r < 1.1)
    e = np.asarray(ess_bulk(ind))
    assert np.isfinite(e).all() and np.all(e > 100)
    xb = jnp.asarray(x, ml_dtypes.bfloat16)
    rb = np.asarray(split_rhat(xb))
    assert np.isfinite(rb).all() and np.all(rb < 1.1)
