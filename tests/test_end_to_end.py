"""End-to-end posterior agreement: Pathfinder vs in-repo NUTS.

The SURVEY §4 porting note (f): validate against a NUTS reference playing
the role of the reference's DynamicHMC/AdvancedHMC integration tests —
posterior means/covariances from PSIS-resampled multipath draws must agree
with long NUTS runs on a real (non-Gaussian) posterior.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathfinder_tpu.integrations.hmc import WoodburyMetric
from pathfinder_tpu.integrations.nuts import nuts
from pathfinder_tpu.models import LogisticRegression, german_credit_synthetic
from pathfinder_tpu.multipath import multipathfinder
from pathfinder_tpu.utils.diagnostics import ess_bulk, split_rhat


@pytest.fixture(scope="module")
def logreg_setup():
    X, y, beta_true = german_credit_synthetic(n=400, d=8, seed=0)
    target = LogisticRegression(X, y, prior_scale=5.0)
    mres = multipathfinder(
        target, 2000, key=jax.random.key(0), nruns=8, maxiters=100,
        ndraws_per_run=400,
    )
    return target, mres


def test_pathfinder_vs_nuts_on_logistic_regression(logreg_setup):
    target, mres = logreg_setup
    assert np.all(np.asarray(mres.states.success))
    k = float(mres.psis_result.pareto_shape)
    assert k < 0.7, f"PSIS khat {k} should be good/ok on a logreg posterior"

    # NUTS ground truth: 4 chains warm-started from pathfinder draws with
    # the pathfinder metric
    metric = WoodburyMetric(mres.fit_distribution.component(0).cov)
    chains = jax.vmap(
        lambda key, x0: nuts(
            key, target.value_and_grad, metric, x0,
            num_samples=1500, num_warmup=400,
        ).samples
    )(jax.random.split(jax.random.key(1), 4), mres.draws[:, :4].T)
    r = np.asarray(split_rhat(jnp.asarray(chains)))
    assert np.all(r < 1.05), f"NUTS chains not mixed: {r}"
    nuts_draws = np.asarray(chains).reshape(-1, target.dim)

    pf_draws = np.asarray(mres.draws).T
    # posterior mean agreement (the reference's rtol-0.1 NUTS-agreement
    # tests, test/integration/Turing/runtests.jl:148,171)
    scale = np.abs(nuts_draws.mean(axis=0)) + nuts_draws.std(axis=0)
    mean_err = np.abs(pf_draws.mean(axis=0) - nuts_draws.mean(axis=0)) / scale
    assert mean_err.max() < 0.1, mean_err
    # posterior sd agreement within 25%
    sd_ratio = pf_draws.std(axis=0) / nuts_draws.std(axis=0)
    assert np.all(sd_ratio > 0.7) and np.all(sd_ratio < 1.3), sd_ratio


def test_pathfinder_warmstart_reduces_nuts_warmup(logreg_setup):
    """Paper claim sanity check: the Pathfinder metric lets NUTS mix with a
    short warmup; count the gradient evaluations Pathfinder itself used."""
    target, mres = logreg_setup
    evals_per_path = np.asarray(mres.states.num_fn_evals)
    assert evals_per_path.mean() < 400  # far fewer than NUTS warmup would use
    metric = WoodburyMetric(mres.fit_distribution.component(0).cov)
    out = nuts(
        jax.random.key(2), target.value_and_grad, metric,
        mres.draws[:, 0], num_samples=800, num_warmup=100,
    )
    ess = np.asarray(ess_bulk(jnp.asarray(out.samples[None])))
    assert ess.min() > 150  # healthy mixing despite the tiny warmup
