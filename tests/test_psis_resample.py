"""PSIS + resampling tests (porting ``test/resample.jl`` and validating the
from-scratch GPD fit against scipy ground truth)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from pathfinder_tpu.ops.psis import PSISResult, gpdfit, psis, tail_length
from pathfinder_tpu.ops.resample import resample_draws, resample_indices


def test_gpdfit_recovers_shape_and_scale():
    rng = np.random.default_rng(0)
    for k_true, sigma_true in [(0.2, 1.0), (0.5, 2.0), (0.05, 0.5)]:
        x = np.sort(stats.genpareto.rvs(k_true, scale=sigma_true, size=4000, random_state=rng))
        k_hat, sigma_hat = gpdfit(jnp.asarray(x))
        assert abs(float(k_hat) - k_true) < 0.08, (k_true, float(k_hat))
        assert abs(float(sigma_hat) - sigma_true) / sigma_true < 0.15


def test_psis_weights_normalized_and_finite():
    rng = np.random.default_rng(1)
    logr = rng.standard_normal(1000)
    res = psis(jnp.asarray(logr))
    w = np.asarray(res.weights)
    assert np.all(np.isfinite(w))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-10)
    np.testing.assert_allclose(
        np.exp(np.asarray(res.log_weights)).sum(), 1.0, rtol=1e-10
    )
    assert res.tail_length == tail_length(1.0, 1000)


def test_psis_khat_estimates_tail_index():
    """Ratios with a Pareto(α) right tail must give k̂ ≈ 1/α."""
    for alpha in [2.5, 5.0]:
        ks = []
        for seed in range(4):
            ratios = stats.pareto.rvs(
                alpha, size=8000, random_state=np.random.default_rng(seed)
            )
            ks.append(float(psis(jnp.asarray(np.log(ratios))).pareto_shape))
        # estimator sd ≈ 0.06 at this size; mean of 4 seeds within 0.1
        assert abs(np.mean(ks) - 1 / alpha) < 0.1, (alpha, ks)


def test_psis_smoothing_shrinks_extremes():
    rng = np.random.default_rng(3)
    logr = rng.standard_normal(2000)
    logr[0] = 15.0  # one huge weight
    raw = np.exp(logr - logr.max())
    raw /= raw.sum()
    res = psis(jnp.asarray(logr))
    w = np.asarray(res.weights)
    assert w[0] < raw[0]  # extreme weight shrunk
    assert w[0] == w.max()  # but still the largest


def test_psis_handles_nan_and_degenerate():
    # NaN ratios get zero weight instead of poisoning the result
    logr = np.array([0.0, 1.0, np.nan, -1.0] * 10)
    res = psis(jnp.asarray(logr))
    w = np.asarray(res.weights)
    assert np.all(np.isfinite(w))
    assert np.all(w[2::4] == 0)
    # all-equal ratios: uniform weights, no crash
    res2 = psis(jnp.zeros(100))
    np.testing.assert_allclose(np.asarray(res2.weights), np.full(100, 0.01), rtol=1e-9)


def test_psis_short_input_skips_smoothing():
    res = psis(jnp.asarray(np.random.default_rng(4).standard_normal(10)))
    assert np.isnan(float(res.pareto_shape))
    np.testing.assert_allclose(np.asarray(res.weights).sum(), 1.0, rtol=1e-9)


def test_diagnosis_thresholds():
    base = psis(jnp.zeros(100))
    for k, verdict in [(0.3, "good"), (0.6, "ok"), (0.9, "bad"), (1.5, "very bad")]:
        r = PSISResult(base.log_weights, base.weights, jnp.asarray(k), 20, 1.0)
        assert r.diagnosis == verdict


def test_diagnosis_nan_is_not_a_verdict():
    """A NaN shape must never read as a quality verdict (regression: NaN
    fell through every threshold comparison and reported "good")."""
    base = psis(jnp.zeros(100))
    r = PSISResult(
        base.log_weights, base.weights, jnp.asarray(jnp.nan), 20, 1.0
    )
    assert r.diagnosis == "not computed"
    short = psis(jnp.asarray(np.random.default_rng(4).standard_normal(10)))
    assert short.diagnosis == "not computed"


def test_psis_inf_ratio_does_not_poison_weights():
    """A +inf log-ratio (zero-density proposal draw / broken target) used
    to NaN every weight, after which resampling silently collapsed to one
    index; it must instead carry the top weight with everything finite."""
    rng = np.random.default_rng(11)
    lr = rng.standard_normal(100)
    lr[7] = np.inf
    res = psis(jnp.asarray(lr))
    w = np.asarray(res.weights)
    assert np.all(np.isfinite(w))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # capped at the max finite ratio, the +inf draw TIES with the true max;
    # tail smoothing then assigns the top two order statistics to the pair
    # in platform-dependent sort order — assert top-2, not strict max
    assert w[7] >= np.sort(w)[-2]
    idx = np.asarray(resample_indices(jax.random.key(0), 100, 50, res.log_weights))
    assert len(set(idx.tolist())) > 1  # no silent collapse to one draw


def test_psis_all_degenerate_ratios_fall_back_to_uniform():
    """All-NaN / all--inf ratios: uniform weights + NaN shape, not NaN
    weights."""
    for bad in (np.full(50, np.nan), np.full(50, -np.inf), np.full(50, np.inf)):
        res = psis(jnp.asarray(bad))
        np.testing.assert_allclose(
            np.asarray(res.weights), np.full(50, 1 / 50), rtol=1e-6
        )
        assert np.isnan(float(res.pareto_shape))
        assert res.diagnosis == "not computed"


def test_resample_indices_without_replacement_unique():
    key = jax.random.key(0)
    lw = jnp.asarray(np.random.default_rng(5).standard_normal(50))
    idx = np.asarray(resample_indices(key, 50, 30, lw, replace=False))
    assert len(set(idx.tolist())) == 30
    idx_u = np.asarray(resample_indices(key, 50, 30, None, replace=False))
    assert len(set(idx_u.tolist())) == 30


def test_resample_without_replacement_refuses_zero_weight_fill():
    """Gumbel-top-k must not pad the selection with zero-weight entries
    (e.g. NaN-target draws mapped to -inf by PSIS) once the positive-
    weight support is exhausted — refuse with a clear error instead."""
    import pytest

    lw = jnp.asarray(
        np.concatenate([np.zeros(10), np.full(40, -np.inf)]), jnp.float32
    )
    # within support: fine, and only support indices are returned
    idx = np.asarray(
        resample_indices(jax.random.key(1), 50, 10, lw, replace=False)
    )
    assert set(idx.tolist()) <= set(range(10))
    with pytest.raises(ValueError, match="only 10 of 50"):
        resample_indices(jax.random.key(1), 50, 11, lw, replace=False)


def test_gpdfit_survives_quartile_tie():
    """≥25% of the tail tying the cutoff zeroes the first-quartile
    exceedance; the b-grid anchor must fall back to the smallest positive
    exceedance so the fit (and the k-hat diagnostic) still happens."""
    rng = np.random.default_rng(13)
    # tail_length(1.0, 200) = 40; put 25 ties straddling the cutoff so the
    # cutoff itself is the tied value: 15/40 tail exceedances are exactly 0
    # (37.5% >= 25% -> the first-quartile exceedance is 0) while the top 25
    # tail entries keep positive exceedances for a perfectly usable fit
    lr = np.sort(rng.uniform(0.0, 1.5, 200))
    lr[150:175] = 2.0
    lr[175:] = 2.0 + rng.exponential(0.5, 25)
    res = psis(jnp.asarray(lr))
    w = np.asarray(res.weights)
    assert np.all(np.isfinite(w))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert np.isfinite(float(res.pareto_shape))  # diagnostic not lost
    # fully-degenerate tail (every exceedance 0) still reports NaN — a GPD
    # genuinely cannot be fit to a zero-variance tail
    all_tied = np.asarray(lr)
    all_tied[150:] = 2.0
    assert np.isnan(float(psis(jnp.asarray(all_tied)).pareto_shape))


def test_resample_degenerate_weights_selects_one_component():
    """One-hot weights select only that component (reference
    ``test/resample.jl`` degenerate-weights case)."""
    K, N, d = 4, 10, 3
    rng = np.random.default_rng(6)
    draws = rng.standard_normal((K, N, d))
    lw = np.full(K * N, -np.inf)
    lw[2 * N : 3 * N] = 0.0  # all mass on component 2
    psis_like = PSISResult(
        log_weights=jnp.asarray(lw - np.log(N)),
        weights=jnp.exp(jnp.asarray(lw - np.log(N))),
        pareto_shape=jnp.asarray(0.1),
        tail_length=5,
        reff=1.0,
    )
    out, ids = resample_draws(jax.random.key(1), jnp.asarray(draws), psis_like, 25)
    assert out.shape == (d, 25)
    assert np.all(np.asarray(ids) == 2)
    # every drawn column is actually a component-2 draw
    for col in np.asarray(out).T:
        assert np.any(np.all(np.isclose(draws[2], col), axis=1))


def test_resample_uniform_statistics():
    K, N, d = 3, 1000, 2
    draws = np.random.default_rng(7).standard_normal((K, N, d))
    out, ids = resample_draws(jax.random.key(2), jnp.asarray(draws), None, 3000)
    counts = np.bincount(np.asarray(ids), minlength=K)
    assert np.all(np.abs(counts - 1000) < 150)  # ≈ uniform across components


def test_resample_weighted_statistics():
    """Categorical resampling reproduces the weight distribution."""
    K, N, d = 2, 500, 1
    draws = np.zeros((K, N, d))
    draws[1] += 1.0
    lw = np.concatenate([np.full(N, np.log(0.2 / N)), np.full(N, np.log(0.8 / N))])
    pr = PSISResult(jnp.asarray(lw), jnp.exp(jnp.asarray(lw)), jnp.asarray(0.1), 5, 1.0)
    out, ids = resample_draws(jax.random.key(3), jnp.asarray(draws), pr, 20000)
    frac1 = np.mean(np.asarray(ids) == 1)
    assert abs(frac1 - 0.8) < 0.02
