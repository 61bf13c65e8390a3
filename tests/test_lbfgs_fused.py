"""Eval-driven L-BFGS must match the nested implementation exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from pathfinder_tpu.ops.lbfgs import lbfgs_inverse_hessians, minimize_lbfgs_trace
from pathfinder_tpu.ops.lbfgs_fused import minimize_lbfgs_trace_fused


def _compare(vg, x0, **kw):
    # the fused optimizer embeds the strong-Wolfe search; pin the nested
    # one to the same search (its default is now hager_zhang)
    a = minimize_lbfgs_trace(vg, x0, line_search="wolfe", **kw)
    b = minimize_lbfgs_trace_fused(vg, x0, **kw)
    assert int(a.num_valid) == int(b.num_valid)
    n = int(a.num_valid)
    np.testing.assert_allclose(a.xs[:n], b.xs[:n], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        a.log_densities[:n], b.log_densities[:n], rtol=1e-10
    )
    assert int(a.num_bfgs_updates_rejected) == int(b.num_bfgs_updates_rejected)
    return b


def test_fused_matches_nested_quadratic():
    rng = np.random.default_rng(0)
    d = 10
    prec = jnp.asarray(rng.uniform(0.5, 3.0, d))
    vg = jax.value_and_grad(lambda x: -0.5 * jnp.sum(prec * x * x))
    _compare(vg, jnp.asarray(rng.standard_normal(d)), maxiters=100)


def test_fused_matches_nested_rosenbrock():
    vg = jax.value_and_grad(
        lambda x: -(100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2)
    )
    tr = _compare(vg, jnp.asarray([-1.2, 1.0]), maxiters=200, gtol=1e-10)
    n = int(tr.num_valid)
    np.testing.assert_allclose(tr.xs[n - 1], [1.0, 1.0], atol=1e-5)


def test_fused_nan_abort_semantics():
    vg = jax.value_and_grad(
        lambda x: jnp.where(x[0] < 1.0, jnp.nan, -0.5 * jnp.sum(x * x))
    )
    tr = minimize_lbfgs_trace_fused(vg, jnp.asarray([0.5, 0.5]), maxiters=50)
    assert int(tr.num_valid) == 1
    tr2 = minimize_lbfgs_trace_fused(vg, jnp.asarray([3.0, 0.0]), maxiters=50)
    n = int(tr2.num_valid)
    assert bool(jnp.all(jnp.isfinite(tr2.xs[:n])))


def test_fused_vmaps():
    rng = np.random.default_rng(1)
    d = 5
    prec = jnp.asarray(rng.uniform(0.5, 2.0, d))
    vg = jax.value_and_grad(lambda x: -0.5 * jnp.sum(prec * x * x))
    x0s = jnp.asarray(rng.standard_normal((4, d)))
    traces = jax.jit(
        jax.vmap(lambda x: minimize_lbfgs_trace_fused(vg, x, maxiters=50))
    )(x0s)
    for i in range(4):
        n = int(traces.num_valid[i])
        np.testing.assert_allclose(traces.xs[i, n - 1], np.zeros(d), atol=1e-5)
