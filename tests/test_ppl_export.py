"""Draw-export helpers (always available, no optional deps needed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathfinder_tpu.integrations.ppl import draws_to_dict, to_inference_data
from pathfinder_tpu.integrations.transforms import Exp, TransformedLogDensity
from pathfinder_tpu.models import StandardNormal
from pathfinder_tpu.singlepath import pathfinder


def test_draws_to_dict_default_names():
    res = pathfinder(StandardNormal(3), key=jax.random.key(0), ndraws=20, maxiters=30)
    d = draws_to_dict(res)
    assert set(d) == {"x0", "x1", "x2"}
    np.testing.assert_array_equal(np.asarray(d["x1"]), np.asarray(res.draws[1]))
    d2 = draws_to_dict(res, names=["a", "b", "c"])
    assert set(d2) == {"a", "b", "c"}


def test_draws_to_dict_with_transform():
    mu, sigma = 0.3, 0.4

    def logp_constrained(x):
        return jnp.sum(
            -0.5 * ((jnp.log(x) - mu) / sigma) ** 2 - jnp.log(x)
        )

    tld = TransformedLogDensity(
        logp_constrained=logp_constrained, bijector=Exp(), dim=2
    )
    res = pathfinder(tld.unconstrained, key=jax.random.key(1), ndraws=50, maxiters=40)
    d = draws_to_dict(res, transform=tld)
    assert all(np.all(np.asarray(v) > 0) for v in d.values())


def test_draws_to_dict_short_names_raise():
    """A names list shorter than the parameter dimension must raise, not
    silently drop the trailing parameter rows."""
    import pytest

    target = StandardNormal(3)
    res = pathfinder(target, key=jax.random.key(0), ndraws=10, maxiters=20)
    with pytest.raises(ValueError, match="2 entries for 3"):
        draws_to_dict(res, names=["a", "b"])


def test_to_inference_data_fallback():
    res = pathfinder(StandardNormal(2), key=jax.random.key(2), ndraws=10, maxiters=20)
    out = to_inference_data(res)
    # arviz absent in this env -> plain dict; present -> InferenceData
    if isinstance(out, dict):
        assert set(out) == {"x0", "x1"}
    else:  # pragma: no cover
        assert hasattr(out, "posterior")


@pytest.mark.realpkgs
def test_to_inference_data_real():
    """With real ArviZ installed, the export is an InferenceData whose
    posterior carries the draws with (chain, draw) leading axes."""
    pytest.importorskip("arviz", reason="ArviZ not installed")
    res = pathfinder(
        StandardNormal(2), key=jax.random.key(2), ndraws=10, maxiters=20
    )
    out = to_inference_data(res)
    assert hasattr(out, "posterior")
    post = out.posterior
    assert set(post.data_vars) == {"x0", "x1"}
    assert post["x0"].values.shape[-1] == 10
