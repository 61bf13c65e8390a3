"""The optimizer loop structure is pluggable through PathfinderConfig
(the reference's pluggable-optimizer axis, ``src/singlepath.jl:120-123``)."""

import numpy as np
import pytest
import jax

from pathfinder_tpu.models import StandardNormal
from pathfinder_tpu.singlepath import pathfinder


def test_line_search_variants_reach_same_optimum():
    target = StandardNormal(4)
    for ls in ["hager_zhang", "more_thuente", "wolfe"]:
        res = pathfinder(
            target, key=jax.random.key(0), maxiters=30, line_search=ls
        )
        assert res.success, ls
        np.testing.assert_allclose(
            res.fit_distribution.mean, np.zeros(4), atol=1e-6, err_msg=ls
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
