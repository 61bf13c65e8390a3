"""Pytree-parameterized targets (the PPL-style model interface)."""

import numpy as np
import jax
import jax.numpy as jnp

from pathfinder_tpu.models import from_pytree_logp
from pathfinder_tpu.multipath import multipathfinder
from pathfinder_tpu.singlepath import pathfinder


def test_pytree_target_roundtrip_and_fit():
    # a model with structured parameters: {"mu": (3,), "log_sigma": ()}
    data = jnp.asarray([1.1, 0.9, 1.3, 0.8, 1.0])

    def logp_tree(params):
        mu, log_sigma = params["mu"], params["log_sigma"]
        sigma = jnp.exp(log_sigma)
        loglik = -0.5 * jnp.sum(
            ((data[:, None] - mu[None, :]) / sigma) ** 2
        ) - data.size * 3 * log_sigma
        logprior = -0.5 * jnp.sum(mu**2) / 100.0 - 0.5 * log_sigma**2
        return loglik + logprior

    example = {"mu": jnp.zeros(3), "log_sigma": jnp.asarray(0.0)}
    pt = from_pytree_logp(logp_tree, example)
    assert pt.target.dim == 4
    # flat/tree consistency
    x = jnp.asarray([0.1, -0.2, 0.3, 0.05])
    np.testing.assert_allclose(
        pt.target.logp(x), logp_tree(pt.unravel(x)), rtol=1e-12
    )
    np.testing.assert_allclose(pt.ravel(pt.unravel(x)), x, rtol=1e-12)

    res = pathfinder(pt.target, key=jax.random.key(0), ndraws=50, maxiters=60)
    assert res.success
    tree_draws = pt.unravel_draws(res.draws)
    assert tree_draws["mu"].shape == (50, 3)
    assert tree_draws["log_sigma"].shape == (50,)
    # posterior for mu concentrates near the data mean
    np.testing.assert_allclose(
        np.asarray(tree_draws["mu"]).mean(axis=0),
        np.full(3, float(data.mean())),
        atol=0.3,
    )


def test_pytree_target_multipath():
    def logp_tree(p):
        return -0.5 * jnp.sum(p["a"] ** 2) - 0.5 * jnp.sum(p["b"] ** 2)

    pt = from_pytree_logp(logp_tree, {"a": jnp.zeros((2, 2)), "b": jnp.zeros(3)})
    assert pt.target.dim == 7
    res = multipathfinder(pt.target, 100, key=jax.random.key(1), nruns=4, maxiters=30)
    assert res.draws.shape == (7, 100)
    td = pt.unravel_draws(res.draws)
    assert td["a"].shape == (100, 2, 2)
