"""ELBO estimator tests (porting ``test/elbo.jl`` and ``test/utils.jl``).

The closed-form check: for target N(0, σ²) and candidate N(0, σ_t²) in 1-D,
ELBO = (1 − r²)/2 + log r with r = σ_t/σ (reference ``test/elbo.jl:13-27``),
verified to 3·SE with many draws; the argmax must pick the known-best σ_t
(``:41``); NaN-skipping semantics from ``src/utils.jl:51-72``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathfinder_tpu.ops.elbo import elbo_and_samples, maximize_elbo
from pathfinder_tpu.ops.mvnormal import MvNormal
from pathfinder_tpu.ops.woodbury import WoodburyPDMat
from pathfinder_tpu.utils.misc import findmax_skipnan


def normal_1d(sigma):
    cov = WoodburyPDMat.from_parts(
        jnp.asarray([sigma**2]), jnp.zeros((1, 0)), jnp.zeros((0, 0))
    )
    return MvNormal(jnp.zeros(1), cov)


def target_logp(sigma):
    def logp(x):
        return -0.5 * jnp.sum((x / sigma) ** 2) - jnp.log(sigma) - 0.5 * jnp.log(
            2 * jnp.pi
        )

    return logp


def closed_form_elbo(sigma_target, sigma_cand):
    r = sigma_cand / sigma_target
    return (1 - r**2) / 2 + np.log(r)


def test_elbo_closed_form():
    sigma = 2.0
    logp = target_logp(sigma)
    ndraws = 1_000_000
    for sigma_t in [0.5, 1.0, 2.0, 3.0]:
        est = elbo_and_samples(
            jax.random.key(0), logp, normal_1d(sigma_t), ndraws
        )
        expected = closed_form_elbo(sigma, sigma_t)
        assert abs(float(est.value) - expected) < 3 * float(est.std_err) + 1e-8, (
            sigma_t,
            float(est.value),
            expected,
        )


def test_maximize_elbo_picks_best_sigma():
    sigma = 2.0
    logp = target_logp(sigma)
    sigmas = [0.5, 1.0, 2.0, 3.0]
    dists = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *[normal_1d(s) for s in sigmas]
    )
    idx, ests, best = maximize_elbo(
        jax.random.key(1), logp, dists, 100, jnp.ones(4, bool)
    )
    assert int(idx) == 2  # σ_t = 2.0 == σ is the exact match (ELBO = 0)
    assert abs(float(best)) < 0.05


def test_maximize_elbo_respects_mask():
    sigma = 2.0
    logp = target_logp(sigma)
    sigmas = [0.5, 1.0, 2.0, 3.0]
    dists = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *[normal_1d(s) for s in sigmas]
    )
    # the true best (index 2) is masked out; next best must win
    mask = jnp.asarray([True, True, False, True])
    idx, ests, best = maximize_elbo(jax.random.key(2), logp, dists, 200, mask)
    assert int(idx) in (1, 3)
    # all masked -> NaN best, index 0
    idx2, _, best2 = maximize_elbo(
        jax.random.key(3), logp, dists, 10, jnp.zeros(4, bool)
    )
    assert np.isnan(float(best2))
    assert int(idx2) == 0  # all-masked index contract (findmax_skipnan)


class TestFindmaxSkipnan:
    """Reference semantics table (``src/utils.jl:51-72``)."""

    def check(self, values, exp_val, exp_idx, mask=None):
        v, i = findmax_skipnan(
            jnp.asarray(values), None if mask is None else jnp.asarray(mask)
        )
        if np.isnan(exp_val):
            assert np.isnan(float(v))
        else:
            assert float(v) == exp_val
        assert int(i) == exp_idx

    def test_plain_max(self):
        self.check([1.0, 3.0, 2.0], 3.0, 1)

    def test_ties_first(self):
        self.check([1.0, 3.0, 3.0], 3.0, 1)

    def test_nan_skipped(self):
        self.check([1.0, np.nan, 2.0], 2.0, 2)
        self.check([np.nan, 1.0, np.nan], 1.0, 1)

    def test_all_nan(self):
        self.check([np.nan, np.nan], np.nan, 0)

    def test_neg_inf_is_a_value(self):
        self.check([-np.inf, np.nan], -np.inf, 0)
        self.check([np.nan, -np.inf], -np.inf, 1)

    def test_mask_behaves_like_nan(self):
        self.check([5.0, 1.0, 2.0], 2.0, 2, mask=[False, False, True])
        self.check([5.0, 1.0], np.nan, 0, mask=[False, False])


def test_maximize_elbo_chunked_non_prefix_mask():
    """Early exit must key off the LAST valid candidate, not the count —
    scattered validity masks are part of the public contract."""
    from pathfinder_tpu.ops.elbo import maximize_elbo_chunked

    sigma = 2.0
    logp = target_logp(sigma)
    sigmas = [0.5, 1.0, 2.0, 3.0, 0.7, 1.5, 2.5, 4.0]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *[normal_1d(s) for s in sigmas]
    )

    def make_chunk(idxs):
        safe = jnp.clip(idxs, 0, 7)
        return jax.tree_util.tree_map(lambda leaf: leaf[safe], stacked)

    # only candidates 6 (σ=2.5) and 2 (σ=2.0) are valid — 2 wins (exact)
    mask = jnp.asarray([False, False, True, False, False, False, True, False])
    idx, vals, ses, best = maximize_elbo_chunked(
        jax.random.key(0), logp, make_chunk, num_candidates=8, chunk_size=2,
        ndraws=500, valid_mask=mask, dtype=jnp.float64,
    )
    assert int(idx) == 2
    assert abs(float(best)) < 0.05
    assert np.isnan(float(vals[0])) and np.isnan(float(vals[7]))
    # NaN == invalid for the SEs too, matching the values contract
    assert np.isnan(np.asarray(ses)[~np.asarray(mask)]).all()
    assert np.isfinite(np.asarray(ses)[np.asarray(mask)]).all()


def test_invalid_candidates_are_nan_in_both_outputs():
    """maximize_elbo NaN-masks value AND std_err at invalid slots (same
    contract as maximize_elbo_chunked): a consumer reading per-candidate
    stats must never see finite garbage at a masked candidate."""
    sigma = 2.0
    logp = target_logp(sigma)
    dists = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves),
        *[normal_1d(s) for s in [0.5, 1.0, 2.0, 3.0]],
    )
    mask = jnp.asarray([True, True, False, True])
    _, ests, _ = maximize_elbo(jax.random.key(2), logp, dists, 50, mask)
    assert np.isnan(float(ests.value[2])) and np.isnan(float(ests.std_err[2]))
    assert np.isfinite(np.asarray(ests.value)[np.asarray(mask)]).all()


def test_single_draw_elbo_se_is_nan():
    """ndraws=1 carries no variance information: std_err is NaN (the
    reference's std of one draw), never a claimed-perfect 0.0."""
    from pathfinder_tpu.ops.elbo import elbo_and_samples

    est = elbo_and_samples(
        jax.random.key(0), target_logp(2.0), normal_1d(1.0), 1
    )
    assert np.isfinite(float(est.value))
    assert np.isnan(float(est.std_err))
