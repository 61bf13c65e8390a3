"""Robustness sweep: pathological densities must produce a result object —
success with finite draws, or a graceful failure — never a crash, hang, or
silent NaN leak. Extends the reference's numerical-failure strategy
(``test/singlepath.jl:116-137``) across the standard failure geometries.
"""

import warnings

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathfinder_tpu.singlepath import pathfinder


CASES = {
    # flat plateau: zero gradient everywhere, no progress possible
    "plateau": lambda x: jnp.zeros(()),
    # heavy tails (Cauchy): gradients vanish far out
    "cauchy": lambda x: -jnp.sum(jnp.log1p(x * x)),
    # extreme scales in both directions
    "tiny_curvature": lambda x: -0.5 * jnp.sum((x / 1e6) ** 2),
    "huge_curvature": lambda x: -0.5 * jnp.sum((x * 1e4) ** 2),
    # non-smooth at the optimum
    "abs": lambda x: -jnp.sum(jnp.abs(x)),
    # curved narrow valley
    "rosenbrock": lambda x: -jnp.sum(
        100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
    ),
    # log of a bounded density: -inf outside the unit ball
    "bounded_support": lambda x: jnp.where(
        jnp.sum(x * x) < 1.0, -0.5 * jnp.sum(x * x), -jnp.inf
    ),
    # NaN pocket inside an otherwise fine Gaussian
    "nan_pocket": lambda x: jnp.where(
        jnp.abs(x[0] - 0.5) < 0.05, jnp.nan, -0.5 * jnp.sum(x * x)
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_pathological_targets_never_crash(name):
    logp = CASES[name]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # failure warnings are expected
        res = pathfinder(
            logp, dim=4, key=jax.random.key(0), ndraws=16, maxiters=30,
            ntries=3,
        )
    assert res.draws.shape == (4, 16)
    if bool(res.success):
        assert np.all(np.isfinite(np.asarray(res.draws))), name
        assert np.isfinite(float(res.elbo_values[res.fit_iteration - 1]))
    # the trace never contains non-finite points (finite-trajectory
    # invariant, whatever the target does)
    n = int(res.optim_trace.num_valid)
    assert np.all(np.isfinite(np.asarray(res.optim_trace.xs[:n]))), name


def test_quadratic_extreme_scales_recover():
    """The scale extremes are not just survivable — they converge."""
    for scale in [1e-6, 1.0, 1e4]:
        res = pathfinder(
            lambda x, s=scale: -0.5 * jnp.sum((x / s) ** 2),
            dim=3, key=jax.random.key(1), ndraws=8, maxiters=60,
        )
        assert res.success, scale
        assert (
            np.abs(np.asarray(res.fit_distribution.mean)).max() < 1e-3 * scale
            + 1e-6
        ), scale


@pytest.mark.parametrize("optimizer", ["cg", "bfgs", "newton"])
@pytest.mark.parametrize("name", ["nan_pocket", "bounded_support", "plateau"])
def test_pathological_targets_never_crash_cg(name, optimizer):
    """The CG, dense-BFGS, and Newton optimizers share the
    abort/retry/mask machinery — the key failure geometries must be
    equally survivable (newton additionally exercises jax.hessian of a
    NaN/-inf-returning target and the non-finite-direction fallback)."""
    logp = CASES[name]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = pathfinder(
            logp, dim=4, key=jax.random.key(0), ndraws=16, maxiters=30,
            ntries=3, optimizer=optimizer,
        )
    assert res.draws.shape == (4, 16)
    if bool(res.success):
        assert np.all(np.isfinite(np.asarray(res.draws))), name
    n = int(res.optim_trace.num_valid)
    assert np.all(np.isfinite(np.asarray(res.optim_trace.xs[:n]))), name
