"""MvNormal tests, porting reference ``test/mvnormal.jl``.

Covers: fused ``rand_and_logpdf`` equals independent sample + logpdf under the
same key (``test/mvnormal.jl:31-123``), logpdf vs dense ground truth, and the
300k-draw statistical consistency test of Woodbury sampling with
Bonferroni-corrected asymptotic tolerances (``test/mvnormal.jl:71-107``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from pathfinder_tpu.ops.mvnormal import MvNormal, UniformMixture, fit_mvnormal
from pathfinder_tpu.ops.woodbury import WoodburyPDMat


def make_mvnormal(rng, n, m, dtype=np.float64):
    mu = rng.standard_normal(n).astype(dtype)
    A = rng.uniform(0.5, 2.0, n).astype(dtype)
    B = (rng.standard_normal((n, m)) / np.sqrt(n)).astype(dtype)
    U = np.linalg.qr(rng.standard_normal((m, m)))[0]
    D = (U @ np.diag(rng.uniform(0.5, 2.0, m)) @ U.T).astype(dtype)
    cov = WoodburyPDMat.from_parts(A, B, D)
    return MvNormal(jnp.asarray(mu), cov), np.diag(A) + B @ D @ B.T, mu


def test_logpdf_matches_dense():
    rng = np.random.default_rng(0)
    dist, cov_dense, mu = make_mvnormal(rng, 8, 4)
    x = rng.standard_normal((8, 10))
    expected = stats.multivariate_normal(mu, cov_dense).logpdf(x.T)
    np.testing.assert_allclose(dist.logpdf(jnp.asarray(x)), expected, rtol=1e-9)
    np.testing.assert_allclose(dist.logpdf(jnp.asarray(x[:, 0])), expected[0], rtol=1e-9)


def test_rand_and_logpdf_consistency():
    """Fused draw+logpdf must agree with sample() then logpdf() under the same
    key (reference seeded-equality check, ``test/mvnormal.jl:31-65``)."""
    rng = np.random.default_rng(1)
    dist, _, _ = make_mvnormal(rng, 6, 4)
    key = jax.random.key(42)
    x, logq = dist.rand_and_logpdf(key, 20)
    x2 = dist.sample(key, 20)
    np.testing.assert_allclose(x, x2, rtol=1e-12)
    np.testing.assert_allclose(logq, dist.logpdf(x), rtol=1e-9)


def test_entropy_matches_formula():
    rng = np.random.default_rng(2)
    dist, cov_dense, _ = make_mvnormal(rng, 5, 3)
    n = 5
    expected = 0.5 * (n * (np.log(2 * np.pi) + 1) + np.linalg.slogdet(cov_dense)[1])
    np.testing.assert_allclose(dist.entropy(), expected, rtol=1e-9)


def test_sampling_statistical_consistency():
    """300k-draw mean/variance/correlation consistency (reference
    ``test/mvnormal.jl:71-107``): each marginal mean within z*SE, variances
    via asymptotic normality, atanh-correlations via Fisher z, all with a
    Bonferroni-style multiplier."""
    rng = np.random.default_rng(3)
    n, m, ndraws = 6, 4, 300_000
    dist, cov_dense, mu = make_mvnormal(rng, n, m)
    x = np.asarray(dist.sample(jax.random.key(7), ndraws))

    # number of tests: n means + n vars + n(n-1)/2 correlations
    ntests = n + n + n * (n - 1) // 2
    z = stats.norm.ppf(1 - 0.01 / (2 * ntests))  # Bonferroni at alpha=0.01

    mean_est = x.mean(axis=1)
    se_mean = np.sqrt(np.diag(cov_dense) / ndraws)
    assert np.all(np.abs(mean_est - mu) < z * se_mean)

    var_est = x.var(axis=1)
    var_true = np.diag(cov_dense)
    se_var = var_true * np.sqrt(2.0 / (ndraws - 1))
    assert np.all(np.abs(var_est - var_true) < z * se_var)

    corr_est = np.corrcoef(x)
    dinv = 1.0 / np.sqrt(var_true)
    corr_true = cov_dense * dinv[:, None] * dinv[None, :]
    iu = np.triu_indices(n, 1)
    fisher_diff = np.arctanh(corr_est[iu]) - np.arctanh(corr_true[iu])
    se_fisher = 1.0 / np.sqrt(ndraws - 3)
    assert np.all(np.abs(fisher_diff) < z * se_fisher)


def test_fit_mvnormal_mean_formula():
    """μ = θ + Σ ∇logp (reference ``src/mvnormal.jl:17``)."""
    rng = np.random.default_rng(4)
    n, m = 7, 4
    A = rng.uniform(0.5, 2.0, n)
    B = rng.standard_normal((n, m)) / np.sqrt(n)
    D = np.eye(m)
    cov = WoodburyPDMat.from_parts(A, B, D)
    theta = jnp.asarray(rng.standard_normal(n))
    grad = jnp.asarray(rng.standard_normal(n))
    dist = fit_mvnormal(theta, grad, cov)
    expected = np.asarray(theta) + (np.diag(A) + B @ D @ B.T) @ np.asarray(grad)
    np.testing.assert_allclose(dist.mean, expected, rtol=1e-10)


def test_uniform_mixture_logpdf_and_sample():
    rng = np.random.default_rng(5)
    n, m, K = 4, 2, 3
    dists, denses, mus = zip(*[make_mvnormal(rng, n, m) for _ in range(K)])
    stacked = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *dists)
    mix = UniformMixture(stacked)
    assert mix.ncomponents == K

    x = rng.standard_normal((n, 8))
    expected = np.log(
        np.mean(
            [np.exp(stats.multivariate_normal(mu, cd).logpdf(x.T))
             for mu, cd in zip(mus, denses)],
            axis=0,
        )
    )
    np.testing.assert_allclose(mix.logpdf(jnp.asarray(x)), expected, rtol=1e-7)

    # component extraction round trips
    comp0 = mix.component(0)
    np.testing.assert_allclose(comp0.logpdf(jnp.asarray(x)),
                               stats.multivariate_normal(mus[0], denses[0]).logpdf(x.T),
                               rtol=1e-9)

    draws, ks = mix.sample(jax.random.key(0), 5000)
    assert draws.shape == (n, 5000)
    assert ks.shape == (5000,)
    assert set(np.unique(np.asarray(ks))) <= set(range(K))
    # mixture mean recovered
    mix_mean = np.mean(mus, axis=0)
    np.testing.assert_allclose(draws.mean(axis=1), mix_mean, atol=0.15)
