"""Result serialization round-trip tests (checkpoint/resume subsystem)."""

import numpy as np
import jax
import jax.numpy as jnp

from pathfinder_tpu.models import StandardNormal
from pathfinder_tpu.multipath import multipathfinder, resample
from pathfinder_tpu.singlepath import pathfinder
from pathfinder_tpu.utils.serialize import load_result, save_result


def test_singlepath_roundtrip(tmp_path):
    target = StandardNormal(4)
    res = pathfinder(target, key=jax.random.key(0), ndraws=20, maxiters=30)
    p = str(tmp_path / "single")
    save_result(p, res)
    loaded = load_result(p, fn=target)
    np.testing.assert_array_equal(np.asarray(loaded.draws), np.asarray(res.draws))
    assert loaded.fit_iteration == res.fit_iteration
    np.testing.assert_allclose(
        loaded.fit_distribution.mean, res.fit_distribution.mean
    )
    np.testing.assert_allclose(
        loaded.fit_distribution.cov.to_dense(),
        res.fit_distribution.cov.to_dense(),
    )
    # rebound log density works
    np.testing.assert_allclose(
        loaded.logp(jnp.zeros(4)), target.logp(jnp.zeros(4))
    )


def test_multipath_roundtrip_and_resample(tmp_path):
    target = StandardNormal(3)
    res = multipathfinder(
        target, 60, key=jax.random.key(1), nruns=4, maxiters=30
    )
    p = str(tmp_path / "multi")
    save_result(p, res)
    loaded = load_result(p, fn=target)
    np.testing.assert_array_equal(np.asarray(loaded.draws), np.asarray(res.draws))
    np.testing.assert_allclose(
        np.asarray(loaded.psis_result.weights),
        np.asarray(res.psis_result.weights),
    )
    # post-hoc resample works on the loaded result (the reference's
    # resample-on-stored-result feature, now across sessions)
    r2 = resample(loaded, 40, key=jax.random.key(2))
    assert r2.draws.shape == (3, 40)
    r2b = resample(res, 40, key=jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(r2.draws), np.asarray(r2b.draws))
