"""PPL bridge tests (NumPyro parts skip when NumPyro is absent)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathfinder_tpu.integrations.ppl import (
    draws_to_dict,
    from_numpyro,
    to_inference_data,
)
from pathfinder_tpu.integrations.transforms import Exp, TransformedLogDensity
from pathfinder_tpu.models import StandardNormal
from pathfinder_tpu.singlepath import pathfinder

numpyro = pytest.importorskip("numpyro", reason="NumPyro not installed")


def test_from_numpyro_end_to_end():
    import numpyro.distributions as dist
    import numpyro as npy

    data = jnp.asarray([1.2, 0.8, 1.1, 0.9, 1.0, 1.3])

    def model(y):
        mu = npy.sample("mu", dist.Normal(0.0, 10.0))
        sigma = npy.sample("sigma", dist.HalfNormal(2.0))
        npy.sample("y", dist.Normal(mu, sigma), obs=y)

    nt = from_numpyro(model, data)
    assert nt.target.dim == 2
    res = pathfinder(nt.target, key=jax.random.key(0), ndraws=500, maxiters=60)
    assert res.success
    con = nt.constrain_draws(res.draws)
    assert set(con) >= {"mu", "sigma"}
    assert np.all(np.asarray(con["sigma"]) > 0)
    assert abs(float(jnp.mean(con["mu"])) - float(data.mean())) < 0.3
