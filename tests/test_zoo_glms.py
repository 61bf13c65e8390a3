"""GLM model-family tests: Pathfinder fits on Poisson and robust
(Student-t) regression posteriors validated against the truth-anchored
in-repo NUTS referee (the methodology of the reference's integration
suites, ``test/integration/Turing/runtests.jl:111-176`` — posterior-mean
agreement within generous MCSE-scaled tolerances)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathfinder_tpu.integrations.nuts import nuts
from pathfinder_tpu.models import (
    PoissonRegression,
    StudentTRegression,
    poisson_synthetic,
    student_t_synthetic,
)
from pathfinder_tpu.multipath import multipathfinder
from pathfinder_tpu.utils.diagnostics import ess_bulk


def _nuts_truth(target, d, key, num_samples=3000, num_warmup=600):
    out = nuts(
        key, target.value_and_grad, None, jnp.zeros(d),
        num_samples=num_samples, num_warmup=num_warmup,
        adapt_mass_matrix=True,
    )
    xs = np.asarray(out.samples)
    ess = np.asarray(ess_bulk(xs[None]))
    assert np.all(ess > 100)
    return xs.mean(axis=0), xs.std(axis=0)


@pytest.mark.parametrize(
    "family", ["poisson", "student_t"], ids=["poisson", "student_t"]
)
def test_glm_posterior_recovery(family):
    d = 8
    if family == "poisson":
        X, y, _ = poisson_synthetic(n=500, d=d, seed=0)
        target = PoissonRegression(X.astype(np.float32), y.astype(np.float32))
    else:
        X, y, _ = student_t_synthetic(n=400, d=d, seed=0)
        target = StudentTRegression(
            X.astype(np.float32), y.astype(np.float32)
        )

    mean_ref, sd_ref = _nuts_truth(target, d, jax.random.key(10))

    res = multipathfinder(
        target, 2000, key=jax.random.key(11), nruns=8, maxiters=64,
        ndraws_per_run=400,
    )
    assert np.all(np.asarray(res.states.success))
    k = float(res.psis_result.pareto_shape)
    assert k < 0.7, f"{family}: khat {k} should be good/ok on a log-concave GLM"
    x = np.asarray(res.draws)
    # posterior-mean agreement in posterior-sd units (IS bias + MC error;
    # the reference's NUTS-agreement tests use rtol 0.1 on the same scale)
    assert np.max(np.abs(x.mean(axis=1) - mean_ref) / sd_ref) < 0.35, family
    # posterior sds within 35% (both estimators carry error)
    np.testing.assert_allclose(x.std(axis=1), sd_ref, rtol=0.35)


def test_ordered_logistic_full_pipeline():
    """Ordinal (cumulative-logit) regression: the Ordered bijector
    (Stacked with Identity for β) carried through the FULL pipeline —
    optimization in unconstrained space, constrained draws strictly
    increasing cutpoints — validated against the NUTS referee on the
    linked density (same methodology as the other GLM families)."""
    from pathfinder_tpu.models import (
        OrderedLogisticRegression,
        ordered_logistic_synthetic,
    )
    from pathfinder_tpu.singlepath import pathfinder

    d, K = 4, 4
    X, y, _, _ = ordered_logistic_synthetic(n=600, d=d, n_cats=K, seed=0)
    tld = OrderedLogisticRegression(X.astype(np.float32), y, K)
    dim = tld.dim

    # NUTS referee on the linked (unconstrained) density
    mean_ref, sd_ref = _nuts_truth(tld.unconstrained, dim, jax.random.key(20))

    res = multipathfinder(
        tld, 2000, key=jax.random.key(21), nruns=8, maxiters=80,
        ndraws_per_run=400,
    )
    assert np.all(np.asarray(res.states.success))
    k = float(res.psis_result.pareto_shape)
    assert k < 0.7, f"khat {k} should be good/ok on this log-concave target"
    z = np.asarray(res.draws)  # unconstrained draws
    assert np.max(np.abs(z.mean(axis=1) - mean_ref) / sd_ref) < 0.35
    np.testing.assert_allclose(z.std(axis=1), sd_ref, rtol=0.35)
    # constrained draws: cutpoints strictly increasing in EVERY draw
    xc = np.asarray(res.draws_transformed)
    cut = xc[: K - 1]
    assert np.all(np.diff(cut, axis=0) > 0), "Ordered constraint violated"


def test_negative_binomial_full_pipeline():
    """NB2 regression with LEARNED dispersion: mixed Identity+Exp block
    transform ([beta (d), phi (1, positive)]) through the full pipeline,
    NUTS-referee agreement, and the dispersion posterior concentrated
    near the generating phi."""
    from pathfinder_tpu.models import (
        NegativeBinomialRegression,
        negative_binomial_synthetic,
    )

    d, phi_true = 6, 3.0
    X, y, _ = negative_binomial_synthetic(n=500, d=d, phi=phi_true, seed=0)
    tld = NegativeBinomialRegression(X.astype(np.float32), y)
    dim = tld.dim

    mean_ref, sd_ref = _nuts_truth(tld.unconstrained, dim, jax.random.key(30))

    res = multipathfinder(
        tld, 2000, key=jax.random.key(31), nruns=8, maxiters=80,
        ndraws_per_run=400,
    )
    assert np.all(np.asarray(res.states.success))
    k = float(res.psis_result.pareto_shape)
    assert k < 0.7, f"khat {k} should be good/ok"
    z = np.asarray(res.draws)
    assert np.max(np.abs(z.mean(axis=1) - mean_ref) / sd_ref) < 0.35
    np.testing.assert_allclose(z.std(axis=1), sd_ref, rtol=0.35)
    # constrained view: phi strictly positive in every draw, posterior
    # mean in the right ballpark of the generating value
    xc = np.asarray(res.draws_transformed)
    phi_draws = xc[d]
    assert np.all(phi_draws > 0)
    assert 1.0 < phi_draws.mean() < 9.0, phi_draws.mean()


def test_glm_densities_vs_independent_implementations():
    """Direct density cross-checks against naive scipy/numpy
    implementations — an INDEPENDENT referee for the likelihood algebra
    (the NUTS-agreement tests share the model's own density on both
    sides, so they cannot catch a wrong likelihood)."""
    from scipy.special import gammaln as sp_gammaln
    from scipy.special import expit

    from pathfinder_tpu.models import (
        NegativeBinomialRegression,
        OrderedLogisticRegression,
        negative_binomial_synthetic,
        ordered_logistic_synthetic,
    )

    rng = np.random.default_rng(0)

    # NB2: model logp vs scipy gammaln formula (+ the same priors)
    d = 6
    X, y, _ = negative_binomial_synthetic(n=200, d=d, phi=3.0, seed=0)
    tld = NegativeBinomialRegression(X, y, prior_scale=5.0)
    for _ in range(5):
        beta = rng.standard_normal(d) * 0.3
        phi = float(rng.uniform(0.5, 5.0))
        theta = jnp.asarray(np.concatenate([beta, [phi]]))
        eta = np.clip(X @ beta, -20, 20)
        mu = np.exp(eta)
        ll = np.sum(
            sp_gammaln(y + phi) - sp_gammaln(phi) - sp_gammaln(y + 1.0)
            + phi * (np.log(phi) - np.log(phi + mu))
            + y * (eta - np.log(phi + mu))
        )
        lp = ll - 0.5 * np.sum((beta / 5.0) ** 2) - 0.5 * (np.log(phi) / 5.0) ** 2
        np.testing.assert_allclose(
            float(tld.logp_constrained(theta)), lp, rtol=1e-9
        )

    # ordered logistic: model logp vs naive sigmoid-difference sum
    dK, K = 4, 4
    Xo, yo, c_true, _ = ordered_logistic_synthetic(n=200, d=dK, n_cats=K, seed=0)
    tldo = OrderedLogisticRegression(Xo, yo, K, prior_scale=5.0)
    for _ in range(5):
        c = np.sort(rng.uniform(-1.5, 1.5, K - 1))
        beta = rng.standard_normal(dK) * 0.3
        theta = jnp.asarray(np.concatenate([c, beta]))
        eta = Xo @ beta
        c_pad = np.concatenate([[-np.inf], c, [np.inf]])
        p = expit(c_pad[yo + 1] - eta) - expit(c_pad[yo] - eta)
        lp = np.sum(np.log(p)) - 0.5 * np.sum((theta / 5.0) ** 2)
        np.testing.assert_allclose(
            float(tldo.logp_constrained(theta)), lp, rtol=1e-6
        )


def test_unconstrained_glm_densities_vs_numpy():
    """Same independent-referee check for the plain-LogDensity families
    (logistic / Poisson / Student-t)."""
    from pathfinder_tpu.models import LogisticRegression
    from pathfinder_tpu.models.zoo import german_credit_synthetic

    rng = np.random.default_rng(1)

    Xg, yg = german_credit_synthetic(n=150, d=10, seed=0)[:2]
    t1 = LogisticRegression(Xg, yg, prior_scale=10.0)
    X2, y2, _ = poisson_synthetic(n=150, d=5, seed=0)
    t2 = PoissonRegression(X2, y2, prior_scale=5.0)
    X3, y3, _ = student_t_synthetic(n=150, d=5, seed=0)
    t3 = StudentTRegression(X3, y3, df=4.0, prior_scale=5.0)

    for _ in range(5):
        b1 = rng.standard_normal(10) * 0.3
        logits = Xg @ b1
        lp1 = np.sum(yg * logits - np.logaddexp(0.0, logits)) - 0.5 * np.sum(
            (b1 / 10.0) ** 2
        )
        np.testing.assert_allclose(float(t1.logp(jnp.asarray(b1))), lp1, rtol=1e-9)

        b2 = rng.standard_normal(5) * 0.3
        eta = X2 @ b2
        lp2 = np.sum(y2 * eta - np.exp(eta)) - 0.5 * np.sum((b2 / 5.0) ** 2)
        np.testing.assert_allclose(float(t2.logp(jnp.asarray(b2))), lp2, rtol=1e-9)

        b3 = rng.standard_normal(5) * 0.3
        z = y3 - X3 @ b3
        lp3 = -0.5 * 5.0 * np.sum(np.log1p(z * z / 4.0)) - 0.5 * np.sum(
            (b3 / 5.0) ** 2
        )
        np.testing.assert_allclose(float(t3.logp(jnp.asarray(b3))), lp3, rtol=1e-9)
