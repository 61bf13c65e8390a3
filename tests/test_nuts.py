"""Dynamic NUTS tests: posterior recovery, termination behavior, and the
Pathfinder warm-start workflow (the reference's integration-test role,
``test/integration/*/runtests.jl``)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathfinder_tpu.integrations.hmc import WoodburyMetric
from pathfinder_tpu.integrations.nuts import nuts, nuts_warm_start
from pathfinder_tpu.models import CorrelatedGaussian, NealsFunnel
from pathfinder_tpu.ops.woodbury import WoodburyPDMat
from pathfinder_tpu.singlepath import pathfinder
from pathfinder_tpu.utils.diagnostics import ess_bulk, split_rhat


def identity_metric(d):
    return WoodburyMetric(
        WoodburyPDMat.from_parts(jnp.ones(d), jnp.zeros((d, 0)), jnp.zeros((0, 0)))
    )


def test_nuts_standard_normal():
    d = 4
    vg = jax.value_and_grad(lambda x: -0.5 * jnp.sum(x * x))
    out = nuts(
        jax.random.key(0), vg, identity_metric(d), jnp.ones(d),
        num_samples=3000, num_warmup=400,
    )
    xs = np.asarray(out.samples)
    assert not np.any(np.asarray(out.diverging))
    assert np.abs(xs.mean(axis=0)).max() < 0.12
    np.testing.assert_allclose(xs.var(axis=0), np.ones(d), rtol=0.15)
    # step size adapted to something sensible for a unit Gaussian
    assert 0.3 < float(out.step_size) < 2.5


def test_nuts_correlated_vs_truth():
    d = 5
    target = CorrelatedGaussian(d, seed=11)
    vg = target.value_and_grad
    out = nuts(
        jax.random.key(1), vg, identity_metric(d),
        jnp.asarray(target.mean, jnp.float64),
        num_samples=5000, num_warmup=500,
    )
    xs = np.asarray(out.samples)
    np.testing.assert_allclose(xs.mean(axis=0), target.mean, atol=0.15)
    np.testing.assert_allclose(np.cov(xs.T), target.cov, atol=0.3, rtol=0.35)


def test_nuts_preconditioned_depth_small():
    """With metric == target covariance the trajectory U-turns fast: tree
    depths should be small and sampling near-iid."""
    d = 6
    target = CorrelatedGaussian(d, seed=3)
    # exact covariance as a Woodbury matrix: A = small diag + full-rank B D Bᵀ
    cov = target.cov
    A = np.full(d, 1e-3)
    metric = WoodburyMetric(
        WoodburyPDMat.from_parts(jnp.asarray(A), jnp.eye(d), jnp.asarray(cov - np.diag(A)))
    )
    out = nuts(
        jax.random.key(2), target.value_and_grad, metric,
        jnp.asarray(target.mean), num_samples=3000, num_warmup=400,
    )
    xs = np.asarray(out.samples)
    depths = np.asarray(out.tree_depths)
    assert depths.mean() <= 3.0
    np.testing.assert_allclose(xs.mean(axis=0), target.mean, atol=0.1)
    ess = np.asarray(ess_bulk(jnp.asarray(xs[None])))
    assert ess.min() > 1000  # near-iid given perfect preconditioning


def test_nuts_warm_start_from_pathfinder():
    d = 5
    target = CorrelatedGaussian(d, seed=4)
    res = pathfinder(
        target, key=jax.random.key(0), ndraws=10, maxiters=80, history_length=d
    )
    assert res.success
    out = nuts_warm_start(
        jax.random.key(1), res, num_samples=3000, num_warmup=300
    )
    xs = np.asarray(out.samples)
    assert not np.any(np.asarray(out.diverging))
    np.testing.assert_allclose(xs.mean(axis=0), target.mean, atol=0.15)
    np.testing.assert_allclose(np.cov(xs.T), target.cov, atol=0.3, rtol=0.35)
    # multi-chain R-hat
    chains = jax.vmap(
        lambda k, x0: nuts(
            k, target.value_and_grad, WoodburyMetric.from_result(res), x0,
            num_samples=1000, num_warmup=300,
        ).samples
    )(jax.random.split(jax.random.key(2), 4), res.draws[:, :4].T)
    r = np.asarray(split_rhat(jnp.asarray(chains)))
    assert np.all(r < 1.05)


def test_nuts_windowed_mass_matrix_adaptation():
    """Stan-style windowed adaptation learns a badly-scaled target's
    variances from the identity start: the adapted diagonal M⁻¹ must match
    the true marginal variances and moments must recover — the
    standalone-sampler completeness path (no Pathfinder metric needed)."""
    scales = jnp.asarray([0.05, 1.0, 20.0, 5.0])  # sd spread 400:1
    d = scales.shape[0]
    vg = jax.value_and_grad(lambda x: -0.5 * jnp.sum((x / scales) ** 2))
    out = nuts(
        jax.random.key(5), vg, None, jnp.zeros(d),
        num_samples=4000, num_warmup=800, adapt_mass_matrix=True,
    )
    assert out.inv_mass_diag is not None
    np.testing.assert_allclose(
        np.asarray(out.inv_mass_diag), np.asarray(scales) ** 2, rtol=0.5
    )
    xs = np.asarray(out.samples)
    np.testing.assert_allclose(
        xs.std(axis=0), np.asarray(scales), rtol=0.15
    )
    assert np.abs(xs.mean(axis=0) / np.asarray(scales)).max() < 0.15
    # without adaptation the identity metric needs deep trees on this target;
    # with it the average depth must drop
    out_fixed = nuts(
        jax.random.key(5), vg, None, jnp.zeros(d),
        num_samples=1000, num_warmup=800,
    )
    assert float(np.asarray(out.tree_depths).mean()) < float(
        np.asarray(out_fixed.tree_depths).mean()
    )


def test_nuts_adaptation_keeps_lowrank_structure():
    """Adaptation must also run when the initial metric is a low-rank
    Pathfinder fit (the metric pytree carries zero-masked B/D columns)."""
    d = 5
    target = CorrelatedGaussian(d, seed=4)
    res = pathfinder(
        target, key=jax.random.key(0), ndraws=10, maxiters=80, history_length=d
    )
    out = nuts(
        jax.random.key(6), target.value_and_grad,
        WoodburyMetric.from_result(res), res.draws[:, 0],
        num_samples=2000, num_warmup=500, adapt_mass_matrix=True,
    )
    xs = np.asarray(out.samples)
    np.testing.assert_allclose(xs.mean(axis=0), target.mean, atol=0.2)
    np.testing.assert_allclose(
        np.asarray(out.inv_mass_diag), np.diag(target.cov), rtol=0.6
    )


def test_nuts_funnel_mixes_into_neck():
    """The funnel is hard for unit-metric NUTS, but the chain must at least
    explore negative v without diverging wholesale."""
    target = NealsFunnel(11)
    out = nuts(
        jax.random.key(3), target.value_and_grad, identity_metric(11),
        jnp.zeros(11), num_samples=4000, num_warmup=600,
    )
    v = np.asarray(out.samples)[:, 0]
    assert v.min() < -2.0 and v.max() > 2.0
    assert np.asarray(out.diverging).mean() < 0.2


def test_warmup_schedule_validation():
    """Degenerate window parameters raise instead of hanging the host in
    an infinite schedule loop (code-review regression)."""
    vg = jax.value_and_grad(lambda x: -0.5 * jnp.sum(x * x))
    with pytest.raises(ValueError, match="base_window"):
        nuts(jax.random.key(0), vg, None, jnp.zeros(2),
             num_samples=10, num_warmup=500, adapt_mass_matrix=True,
             base_window=0)
    with pytest.raises(ValueError, match="base_window"):
        nuts(jax.random.key(0), vg, None, jnp.zeros(2),
             num_samples=10, num_warmup=500, adapt_mass_matrix=True,
             init_buffer=-1)


def test_nuts_chains_with_summary():
    """nuts_chains stacks C chains and returns the diagnostics summary;
    warm-started chains on a well-conditioned target mix (rhat ~ 1,
    healthy bulk and tail ESS)."""
    d = 4
    target = CorrelatedGaussian(d, seed=9)
    res = pathfinder(target, key=jax.random.key(0), ndraws=8, maxiters=60,
                     history_length=d)
    from pathfinder_tpu.integrations.nuts import nuts_chains

    out, summary = nuts_chains(
        jax.random.key(1), target.value_and_grad,
        WoodburyMetric.from_result(res), res.draws[:, :4].T,
        num_samples=1000, num_warmup=300,
    )
    assert out.samples.shape == (4, 1000, d)
    assert summary["rhat"].shape == (d,)
    assert np.all(np.asarray(summary["rhat"]) < 1.05)
    assert np.all(np.asarray(summary["ess_bulk"]) > 300)
    assert np.all(np.asarray(summary["ess_tail"]) > 200)
    np.testing.assert_allclose(
        np.asarray(summary["mean"]), target.mean, atol=0.2
    )
