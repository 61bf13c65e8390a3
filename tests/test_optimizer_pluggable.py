"""The optimizer loop structure is pluggable through PathfinderConfig
(the reference's pluggable-optimizer axis, ``src/singlepath.jl:120-123``)."""

import numpy as np
import pytest
import jax

from pathfinder_tpu.models import StandardNormal
from pathfinder_tpu.singlepath import pathfinder


def test_eval_driven_optimizer_option():
    target = StandardNormal(4)
    # the fused optimizer embeds the strong-Wolfe search; pin the nested one
    # to the same search for the trajectory-equality check
    r1 = pathfinder(
        target, key=jax.random.key(0), maxiters=30, line_search="wolfe"
    )
    r2 = pathfinder(
        target, key=jax.random.key(0), maxiters=30,
        optimizer="lbfgs_eval_driven", line_search="wolfe",
    )
    assert r1.success and r2.success
    np.testing.assert_allclose(
        r1.fit_distribution.mean, np.zeros(4), atol=1e-6
    )
    np.testing.assert_allclose(
        r2.fit_distribution.mean, np.zeros(4), atol=1e-6
    )
    # both optimizers traverse the same trajectory on this target
    n1, n2 = int(r1.optim_trace.num_valid), int(r2.optim_trace.num_valid)
    assert n1 == n2
    np.testing.assert_allclose(
        r1.optim_trace.xs[:n1], r2.optim_trace.xs[:n2], rtol=1e-8, atol=1e-10
    )


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError, match="unknown optimizer"):
        pathfinder(
            StandardNormal(2), key=jax.random.key(0), maxiters=10,
            optimizer="adam",
        )


def test_backtracking_line_search_option():
    target = StandardNormal(4)
    res = pathfinder(
        target, key=jax.random.key(1), maxiters=60, line_search="backtracking"
    )
    assert res.success
    np.testing.assert_allclose(
        res.fit_distribution.mean, np.zeros(4), atol=1e-4
    )


def test_unknown_line_search_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown line_search"):
        pathfinder(
            StandardNormal(2), key=jax.random.key(0), maxiters=10,
            line_search="exact",
        )
