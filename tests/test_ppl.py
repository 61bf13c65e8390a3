"""PPL-integration tests — the executable port of the reference's Turing
extension test strategy (``test/integration/Turing/runtests.jl``):

* Jacobian correctness of the linked density vs an autodiff determinant
  (``:43-64``);
* chain conversion with constraint satisfaction + per-draw
  logprior/loglikelihood/logjoint stats (``:66-97``);
* posterior recovery on a conjugate model;
* init-strategy plumbing (``:242-331``);
* ``resample`` re-transformation round trip
  (``ext/PathfinderTuringExt.jl:280-286``).

The model object is the in-repo :class:`BayesModel` (the DynamicPPL-model
analog), so everything executes without an external PPL. ``from_numpyro``
is exercised against a minimal mock implementing the exact
``initialize_model`` contract the adapter relies on (and against real
NumPyro when installed).
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathfinder_tpu import multipathfinder, pathfinder
from pathfinder_tpu.integrations.transforms import (
    Exp,
    Interval,
    Stacked,
    TransformedDistribution,
    TransformedLogDensity,
)
from pathfinder_tpu.models.bayes import (
    BayesModel,
    Beta,
    Exponential,
    HalfNormal,
    LogNormal,
    Normal,
    StudentT,
    Uniform,
)
from pathfinder_tpu.multipath import resample


@pytest.fixture(scope="module")
def gauss_model():
    """Conjugate-ish location/scale model with observed data."""
    data = jnp.asarray([1.2, 0.8, 1.1, 0.9, 1.0, 1.3])

    def loglik(p):
        return jnp.sum(
            -0.5 * ((data - p["mu"]) / p["sigma"]) ** 2 - jnp.log(p["sigma"])
        )

    return BayesModel({"mu": Normal(0.0, 10.0), "sigma": HalfNormal(2.0)}, loglik), data


def test_prior_log_probs_match_scipy():
    """Elementwise prior densities vs scipy (the numerical ground truth)."""
    import scipy.stats as st

    x = np.asarray([0.3, 1.7, 0.9])
    checks = [
        (Normal(0.5, 2.0), st.norm(0.5, 2.0)),
        (HalfNormal(1.5), st.halfnorm(scale=1.5)),
        (LogNormal(0.2, 0.7), st.lognorm(s=0.7, scale=np.exp(0.2))),
        (Exponential(1.3), st.expon(scale=1 / 1.3)),
        (Uniform(0.0, 2.0), st.uniform(0.0, 2.0)),
        (StudentT(4.0, 0.1, 1.2), st.t(4.0, loc=0.1, scale=1.2)),
    ]
    for dist, ref in checks:
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(jnp.asarray(x))),
            ref.logpdf(x),
            rtol=1e-6,
            err_msg=repr(dist),
        )
    xb = np.asarray([0.2, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(Beta(2.0, 3.0).log_prob(jnp.asarray(xb))),
        st.beta(2.0, 3.0).logpdf(xb),
        rtol=1e-6,
    )


def test_linked_density_jacobian_correctness():
    """Unconstrained logp == constrained logp + log|det J| with the
    Jacobian determinant computed by autodiff (reference Jacobian test,
    ``test/integration/Turing/runtests.jl:43-64``)."""
    model = BayesModel(
        {
            "a": Normal(1.0, 2.0),
            "b": HalfNormal(1.5),
            "c": (Uniform(-1.0, 3.0), 2),
            "d": Beta(2.0, 2.0),
        }
    )
    tld = model.transformed
    z = jnp.asarray([0.3, -0.7, 0.2, 1.1, -0.4])
    J = jax.jacobian(model.bijector.forward)(z)
    logdet_ad = jnp.linalg.slogdet(J)[1]
    lp_unc = tld.unconstrained.logp(z)
    lp_con = model.constrained_logp(model.bijector.forward(z))
    np.testing.assert_allclose(
        float(lp_unc), float(lp_con + logdet_ad), rtol=1e-10
    )
    # round trip
    x = model.bijector.forward(z)
    np.testing.assert_allclose(
        np.asarray(model.bijector.inverse(x)), np.asarray(z), rtol=1e-8
    )


def test_pathfinder_on_model_end_to_end(gauss_model):
    model, data = gauss_model
    res = pathfinder(model, key=jax.random.key(0), ndraws=500, maxiters=60)
    assert res.success
    assert res.transform is not None
    ch = res.draws_transformed
    # named constrained draws + per-draw stats (ParamsWithStats analog)
    assert set(ch) == {"mu", "sigma", "logprior", "loglikelihood", "logjoint"}
    assert np.all(np.asarray(ch["sigma"]) > 0)
    assert abs(float(jnp.mean(ch["mu"])) - float(data.mean())) < 0.3
    np.testing.assert_allclose(
        np.asarray(ch["logjoint"]),
        np.asarray(ch["logprior"] + ch["loglikelihood"]),
        rtol=1e-6,
    )
    # stats recompute correctly for one draw
    z0 = res.draws[:, 0]
    params = model.split(model.bijector.forward(z0))
    np.testing.assert_allclose(
        float(ch["logprior"][0]), float(model.logprior(params)), rtol=1e-6
    )


def test_fit_distribution_transformed_is_consistent(gauss_model):
    """Pushforward logpdf satisfies the change of variables and sampling
    lands in the constrained support."""
    model, _ = gauss_model
    res = pathfinder(model, key=jax.random.key(1), ndraws=50, maxiters=60)
    ft = res.fit_distribution_transformed
    assert isinstance(ft, TransformedDistribution)
    x = ft.sample(jax.random.key(2), 64)
    assert x.shape == (2, 64)
    assert np.all(np.asarray(x[1]) > 0)  # sigma support
    # change of variables: logpdf_x(x) = logpdf_z(z) - log|det J(z)|
    z = jax.vmap(model.bijector.inverse, in_axes=1, out_axes=1)(x)
    ld = jax.vmap(lambda zc: jnp.sum(model.bijector.forward_log_det(zc)), in_axes=1)(z)
    np.testing.assert_allclose(
        np.asarray(ft.logpdf(x)),
        np.asarray(res.fit_distribution.logpdf(z) - ld),
        rtol=1e-6,
    )


def test_multipath_and_resample_retransform(gauss_model):
    """Transformed multipath → resample round trip: resample re-derives the
    constrained chain on the fresh draws (parity:
    ``ext/PathfinderTuringExt.jl:280-286``)."""
    model, _ = gauss_model
    res = multipathfinder(
        model, 400, key=jax.random.key(3), nruns=4, maxiters=60, ntries=8
    )
    assert res.transform is not None
    assert np.all(np.asarray(res.draws_transformed["sigma"]) > 0)
    r2 = resample(res, 120)
    ch2 = r2.draws_transformed
    assert ch2["mu"].shape == (120,)
    assert set(ch2) == {"mu", "sigma", "logprior", "loglikelihood", "logjoint"}
    # the constrained draws correspond to the new unconstrained draws
    np.testing.assert_allclose(
        np.asarray(ch2["sigma"]),
        np.asarray(jnp.exp(r2.draws[1])),
        rtol=1e-6,
    )
    # per-path views are transformed too (ext/PathfinderTuringExt.jl:269-277)
    pr = res.path_result(0)
    assert set(pr.draws_transformed) >= {"mu", "sigma"}


def test_posterior_recovery_conjugate():
    """Known-sigma normal model: posterior of mu is analytic; Pathfinder
    must recover it (the reference's exact-recovery strategy,
    ``test/integration/Turing/runtests.jl:179-204``)."""
    data = np.asarray([0.5, 1.5, 1.0, 0.7, 1.3, 0.9, 1.1, 1.0])
    sigma = 1.0
    tau0 = 3.0  # prior sd of mu

    def loglik(p):
        return jnp.sum(-0.5 * ((jnp.asarray(data) - p["mu"]) / sigma) ** 2)

    model = BayesModel({"mu": Normal(0.0, tau0)}, loglik)
    n = len(data)
    post_var = 1.0 / (1.0 / tau0**2 + n / sigma**2)
    post_mean = post_var * (data.sum() / sigma**2)
    res = pathfinder(model, key=jax.random.key(4), ndraws=4000, maxiters=50)
    mu_draws = np.asarray(res.draws_transformed["mu"])
    assert abs(mu_draws.mean() - post_mean) < 4 * np.sqrt(post_var / 4000) + 0.02
    np.testing.assert_allclose(mu_draws.var(), post_var, rtol=0.15)


def test_init_strategies(gauss_model):
    """init_from_params / init_from_prior plumbing (parity:
    ``ext/PathfinderTuringExt.jl:50-96``)."""
    model, _ = gauss_model
    # fixed mu, sigma drawn from the prior; result is an unconstrained point
    z = model.init_from_params({"mu": 0.5}, key=jax.random.key(5))
    assert z.shape == (2,)
    x = model.bijector.forward(z)
    np.testing.assert_allclose(float(x[0]), 0.5, rtol=1e-6)
    assert float(x[1]) > 0
    # fully fixed init is deterministic w.r.t. the named params
    z2 = model.init_from_params({"mu": 0.5, "sigma": 1.7})
    np.testing.assert_allclose(
        np.asarray(model.bijector.forward(z2)), [0.5, 1.7], rtol=1e-6
    )
    res = pathfinder(model, key=jax.random.key(6), init=z2, maxiters=50)
    assert res.success
    # prior init sampler drives the retry machinery
    res2 = pathfinder(
        model,
        key=jax.random.key(7),
        init_sampler=model.init_from_prior(),
        maxiters=50,
    )
    assert res2.success
    # multipath accepts explicit per-run unconstrained inits
    inits = jnp.stack(
        [model.init_from_params({"mu": m}, key=jax.random.key(8)) for m in (-1.0, 0.0, 1.0)]
    )
    res3 = multipathfinder(
        model, 100, key=jax.random.key(9), init=inits, maxiters=50, ntries=4
    )
    assert res3.nruns == 3


def test_transform_kwarg_with_bare_bijector():
    """pathfinder(fn_constrained, transform=bijector): fn is the
    constrained-space density, linked internally."""

    def logp_constrained(x):  # Gamma-ish positive-support density
        return jnp.sum(2.0 * jnp.log(x) - x)

    res = pathfinder(
        logp_constrained,
        key=jax.random.key(10),
        dim=3,
        transform=Stacked(((Exp(), 3),)),
        ndraws=200,
        maxiters=60,
    )
    assert res.success
    assert np.all(np.asarray(res.draws_transformed) > 0)
    # mode of Gamma(3, 1) is 2; draws center near mean 3
    assert abs(float(res.draws_transformed.mean()) - 3.0) < 1.0


def test_transform_bijector_with_init_and_no_dim():
    """The documented 'init or dim' contract holds on the bijector
    transform= path too: dim is derivable from init (both drivers)."""
    from pathfinder_tpu.multipath import multipathfinder

    def logp_constrained(x):
        return jnp.sum(2.0 * jnp.log(x) - x)

    res = pathfinder(
        logp_constrained,
        key=jax.random.key(3),
        init=jnp.zeros(3),  # unconstrained-space init; no dim=
        transform=Stacked(((Exp(), 3),)),
        ndraws=50,
        maxiters=50,
    )
    assert res.success
    assert np.all(np.asarray(res.draws_transformed) > 0)
    mres = multipathfinder(
        logp_constrained,
        40,
        key=jax.random.key(4),
        init=jnp.zeros((2, 3)),
        transform=Stacked(((Exp(), 3),)),
        maxiters=50,
    )
    assert np.all(np.asarray(mres.draws_transformed) > 0)


def test_explicit_transform_overrides_model_chain_conversion():
    """With an explicit transform= differing from the model's own link,
    draws_transformed must come from THAT transform (not the model's
    draws_to_chain) so it stays consistent with
    fit_distribution_transformed."""
    from pathfinder_tpu.integrations.transforms import (
        Identity,
        transformed_outputs,
    )
    from pathfinder_tpu.models.bayes import BayesModel, Normal

    m = BayesModel(priors={"mu": (Normal(), 2)}, loglikelihood=None)
    # the model's OWN link: chain dict via draws_to_chain
    res_own = pathfinder(m, key=jax.random.key(0), ndraws=10, maxiters=30)
    assert isinstance(res_own.draws_transformed, dict)
    # an explicit different transform: plain forward-mapped matrix, same
    # bijector as the pushforward fit
    other = TransformedLogDensity(
        logp_constrained=lambda x: -0.5 * jnp.sum(x * x),
        bijector=Stacked(((Identity(), 2),)),
        dim=2,
    )
    draws = jnp.ones((2, 5))
    draws_t, fit_t = transformed_outputs(
        other, m, draws, res_own.fit_distribution
    )
    assert not isinstance(draws_t, dict)
    np.testing.assert_array_equal(np.asarray(draws_t), np.asarray(draws))
    assert fit_t.bijector == other.bijector


def test_grad_kwarg_chain_rules_through_bijector():
    """pathfinder(fn_constrained, grad=..., transform=bijector) must USE
    the supplied constrained-space gradient (chain-ruled through the
    bijector), never autodiff the user's logp. The target's value path
    blocks autodiff with stop_gradient, so only the analytic grad can
    drive the optimizer."""
    import pytest

    def logp_c(x):  # Gamma(3,1)-ish; autodiff sees a constant
        return jax.lax.stop_gradient(jnp.sum(2.0 * jnp.log(x) - x))

    def grad_c(x):
        return 2.0 / x - 1.0

    res = pathfinder(
        logp_c,
        key=jax.random.key(5),
        dim=3,
        grad=grad_c,
        transform=Stacked(((Exp(), 3),)),
        ndraws=100,
        maxiters=60,
    )
    assert res.success
    # converged toward mean 3 of Gamma(3,1) — impossible with the zero
    # autodiff gradient of the stop_gradient'd value
    assert abs(float(res.draws_transformed.mean()) - 3.0) < 1.0

    # model / TLD inputs reject grad= loudly (which space would it be in?)
    from pathfinder_tpu.models.bayes import BayesModel, Normal

    m = BayesModel(priors={"mu": (Normal(), 2)}, loglikelihood=None)
    with pytest.raises(ValueError, match="grad= cannot be combined"):
        pathfinder(m, key=jax.random.key(0), grad=lambda x: -x)


def test_interval_swapped_bounds_raise():
    from pathfinder_tpu.integrations.transforms import Interval

    import pytest

    with pytest.raises(ValueError, match="high must exceed low"):
        Interval(2.0, 1.0)


def test_transformed_distribution_logpdf_out_of_support():
    """logpdf outside / at the bijector's support boundary is -inf,
    never NaN (inf - inf at the boundary, log(negative) outside)."""
    from pathfinder_tpu.integrations.transforms import (
        TransformedDistribution,
    )
    from pathfinder_tpu.ops.mvnormal import MvNormal
    from pathfinder_tpu.ops.woodbury import WoodburyPDMat

    d = 2
    base = MvNormal(
        jnp.zeros(d),
        WoodburyPDMat.from_parts(
            jnp.ones(d), jnp.zeros((d, 2)), jnp.zeros((2, 2))
        ),
    )
    td = TransformedDistribution(base, Stacked(((Exp(), d),)))
    vals = np.asarray(
        td.logpdf(jnp.asarray([[1.0, 0.0, -1.0], [1.0, 1.0, 1.0]]))
    )
    assert np.isfinite(vals[0])
    assert vals[1] == -np.inf and vals[2] == -np.inf


def test_uniform_array_bounds_and_dirichlet_boundary():
    """Array-valued Uniform bounds evaluate elementwise; Dirichlet
    log_prob stays non-NaN when f32 rounding pushes sum(x) past 1."""
    from pathfinder_tpu.models.bayes import Dirichlet, Uniform

    u = Uniform(jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 5.0]))
    lp = np.asarray(u.log_prob(jnp.asarray([0.5, 2.0])))
    np.testing.assert_allclose(lp, [0.0, -np.log(4.0)], rtol=1e-6)
    d = Dirichlet([2.0, 2.0, 3.0])
    x = jnp.asarray([0.7, 0.3 + 1e-7], jnp.float32)  # sums past 1 in f32
    v = float(d.log_prob(x))
    assert not np.isnan(v)  # -inf is the correct boundary limit


def test_transformed_log_density_direct():
    """Passing a TransformedLogDensity as fn works and sets the hook."""

    def logp_constrained(x):
        return jnp.sum(-x + jnp.log(x))

    tld = TransformedLogDensity(
        logp_constrained=logp_constrained, bijector=Stacked(((Exp(), 2),)), dim=2
    )
    res = pathfinder(tld, key=jax.random.key(11), ndraws=100, maxiters=50)
    assert res.transform is tld
    assert np.all(np.asarray(res.draws_transformed) > 0)


# ---------------------------------------------------------------------------
# from_numpyro adapter
# ---------------------------------------------------------------------------


def _install_fake_numpyro(monkeypatch):
    """A minimal stand-in for ``numpyro.infer.util.initialize_model``
    implementing exactly the contract the adapter relies on (ModelInfo with
    ``param_info.z`` unconstrained dict, ``potential_fn`` over that dict,
    ``postprocess_fn`` mapping it to constrained sites; ``dynamic_args=False``).
    This pins the adapter's *plumbing*; the real-NumPyro test below runs when
    the package is installed."""
    from collections import namedtuple

    ModelInfo = namedtuple(
        "ModelInfo", ["param_info", "potential_fn", "postprocess_fn", "model_trace"]
    )
    ParamInfo = namedtuple("ParamInfo", ["z", "potential_energy", "z_grad"])

    data = jnp.asarray([1.2, 0.8, 1.1, 0.9, 1.0, 1.3])

    def initialize_model(rng_key, model, model_args=(), model_kwargs=None,
                         dynamic_args=False):
        assert not dynamic_args
        # the "model" callable is ignored by the fake; the linked density of
        # the location/scale model is hard-wired
        z0 = {"mu": jnp.asarray(0.1), "log_sigma": jnp.asarray(0.0)}

        def potential_fn(z):
            mu, ls = z["mu"], z["log_sigma"]
            sigma = jnp.exp(ls)
            lp = (
                -0.5 * (mu / 10.0) ** 2
                - 0.5 * (sigma / 2.0) ** 2
                + ls  # Jacobian of exp link
                + jnp.sum(-0.5 * ((data - mu) / sigma) ** 2 - ls)
            )
            return -lp

        def postprocess_fn(z):
            return {"mu": z["mu"], "sigma": jnp.exp(z["log_sigma"])}

        return ModelInfo(ParamInfo(z0, None, None), potential_fn, postprocess_fn, {})

    fake_util = types.ModuleType("numpyro.infer.util")
    fake_util.initialize_model = initialize_model
    fake_infer = types.ModuleType("numpyro.infer")
    fake_infer.util = fake_util
    fake_numpyro = types.ModuleType("numpyro")
    fake_numpyro.infer = fake_infer
    monkeypatch.setitem(sys.modules, "numpyro", fake_numpyro)
    monkeypatch.setitem(sys.modules, "numpyro.infer", fake_infer)
    monkeypatch.setitem(sys.modules, "numpyro.infer.util", fake_util)
    return data


def test_from_numpyro_plumbing_with_mock(monkeypatch):
    try:
        import numpyro  # noqa: F401

        pytest.skip("real NumPyro installed; mock test unnecessary")
    except ImportError:
        pass
    data = _install_fake_numpyro(monkeypatch)
    from pathfinder_tpu.integrations.ppl import from_numpyro

    nt = from_numpyro(lambda: None)
    assert nt.target.dim == 2
    res = pathfinder(nt.target, key=jax.random.key(0), ndraws=300, maxiters=60)
    assert res.success
    con = nt.constrain_draws(res.draws)
    assert set(con) == {"mu", "sigma"}
    assert con["mu"].shape == (300,)
    assert np.all(np.asarray(con["sigma"]) > 0)
    assert abs(float(jnp.mean(con["mu"])) - float(data.mean())) < 0.3


def _install_fake_numpyro_full(monkeypatch):
    """Strict stand-in for ``initialize_model`` covering the FULL contract
    the adapter depends on (VERDICT r02 task 3 — NumPyro cannot be
    installed in this zero-egress environment, so the mock is the contract
    documentation):

    - ``ModelInfo(param_info, potential_fn, postprocess_fn, model_trace)``
      and ``ParamInfo(z, potential_energy, z_grad)`` namedtuple layouts;
    - ``param_info.z``: dict of *unconstrained* site arrays with real
      shapes — here a vector site (3,) plus a scalar, so ``ravel_pytree``
      ordering and round-tripping is actually exercised;
    - ``potential_fn``/``postprocess_fn`` receive ONE unbatched sample dict
      (NumPyro applies them per-sample; callers vmap for batches) — the
      fake asserts the unbatched shapes, so batched misuse fails loudly;
    - ``postprocess_fn`` returns constrained sites PLUS deterministic
      sites (NumPyro includes ``numpyro.deterministic`` values);
    - ``initialize_model`` receives a typed PRNG key and the
      ``model_args``/``model_kwargs`` keywords.
    """
    from collections import namedtuple

    ModelInfo = namedtuple(
        "ModelInfo",
        ["param_info", "potential_fn", "postprocess_fn", "model_trace"],
    )
    ParamInfo = namedtuple("ParamInfo", ["z", "potential_energy", "z_grad"])

    data = jnp.asarray([[1.0, 0.6], [0.8, 1.1], [1.2, 0.9]])  # (3 obs, 2)
    seen = {}

    def initialize_model(rng_key, model, model_args=(), model_kwargs=None,
                         dynamic_args=False):
        assert not dynamic_args
        assert jnp.issubdtype(rng_key.dtype, jax.dtypes.prng_key), (
            "initialize_model must receive a typed PRNG key"
        )
        seen["model_args"] = model_args
        seen["model_kwargs"] = model_kwargs
        # sites: beta (3,) with identity link, log_tau scalar with exp link
        z0 = {
            "beta": jnp.asarray([0.1, -0.1, 0.2]),
            "log_tau": jnp.asarray(0.3),
        }

        def potential_fn(z):
            assert set(z) == {"beta", "log_tau"}
            assert z["beta"].shape == (3,), "potential_fn is per-sample"
            assert z["log_tau"].shape == ()
            beta, lt = z["beta"], z["log_tau"]
            tau = jnp.exp(lt)
            lp = (
                -0.5 * jnp.sum(beta**2)
                - 0.5 * (tau / 2.0) ** 2
                + lt  # Jacobian of the exp link
                - 0.5 * jnp.sum((data - beta[:2].sum() * tau) ** 2)
            )
            return -lp

        def postprocess_fn(z):
            assert z["beta"].shape == (3,), (
                "postprocess_fn is per-sample (vmap for batches)"
            )
            tau = jnp.exp(z["log_tau"])
            return {
                "beta": z["beta"],
                "tau": tau,
                # deterministic site, as numpyro.deterministic would add
                "tau_sq": tau**2,
            }

        trace = {
            "beta": {"type": "sample", "value": z0["beta"]},
            "log_tau": {"type": "sample", "value": z0["log_tau"]},
        }
        return ModelInfo(
            ParamInfo(z0, None, None), potential_fn, postprocess_fn, trace
        )

    fake_util = types.ModuleType("numpyro.infer.util")
    fake_util.initialize_model = initialize_model
    fake_infer = types.ModuleType("numpyro.infer")
    fake_infer.util = fake_util
    fake_numpyro = types.ModuleType("numpyro")
    fake_numpyro.infer = fake_infer
    monkeypatch.setitem(sys.modules, "numpyro", fake_numpyro)
    monkeypatch.setitem(sys.modules, "numpyro.infer", fake_infer)
    monkeypatch.setitem(sys.modules, "numpyro.infer.util", fake_util)
    return seen


def test_from_numpyro_mock_full_contract(monkeypatch):
    try:
        import numpyro  # noqa: F401

        pytest.skip("real NumPyro installed; mock test unnecessary")
    except ImportError:
        pass
    seen = _install_fake_numpyro_full(monkeypatch)
    from pathfinder_tpu.integrations.ppl import from_numpyro

    nt = from_numpyro(lambda: None, "posarg", extra=7)
    assert seen["model_args"] == ("posarg",)
    assert seen["model_kwargs"] == {"extra": 7}
    assert nt.target.dim == 4  # beta (3,) + log_tau ()
    assert nt.init_point.shape == (4,)
    # logp round-trips through ravel/unravel with the vector site intact
    lp0 = float(nt.target.logp(nt.init_point))
    assert np.isfinite(lp0)

    res = pathfinder(nt.target, key=jax.random.key(0), ndraws=200,
                     maxiters=60)
    assert res.success
    con = nt.constrain_draws(res.draws)
    assert set(con) == {"beta", "tau", "tau_sq"}
    assert con["beta"].shape == (200, 3)  # leading draws axis, site shape kept
    assert con["tau"].shape == (200,)
    assert np.all(np.asarray(con["tau"]) > 0)
    np.testing.assert_allclose(
        np.asarray(con["tau_sq"]), np.asarray(con["tau"]) ** 2, rtol=1e-5
    )


@pytest.mark.realpkgs
def test_from_numpyro_real():
    numpyro = pytest.importorskip("numpyro", reason="NumPyro not installed")
    import numpyro.distributions as dist

    from pathfinder_tpu.integrations.ppl import from_numpyro

    data = jnp.asarray([1.2, 0.8, 1.1, 0.9, 1.0, 1.3])

    def model(y):
        mu = numpyro.sample("mu", dist.Normal(0.0, 10.0))
        sigma = numpyro.sample("sigma", dist.HalfNormal(2.0))
        numpyro.sample("y", dist.Normal(mu, sigma), obs=y)

    nt = from_numpyro(model, data)
    assert nt.target.dim == 2
    res = pathfinder(nt.target, key=jax.random.key(0), ndraws=500, maxiters=60)
    assert res.success
    con = nt.constrain_draws(res.draws)
    assert set(con) >= {"mu", "sigma"}
    assert np.all(np.asarray(con["sigma"]) > 0)
    assert abs(float(jnp.mean(con["mu"])) - float(data.mean())) < 0.3


def test_eight_schools_noncentered_end_to_end():
    """The classic hierarchical benchmark as a BayesModel: vector-sized
    prior blocks + hierarchical coupling through the likelihood
    (non-centered parameterization). Validates multipath + transforms +
    per-draw stats on a model shaped like real PPL workloads, checked
    against the analytically-known posterior-mean pull toward the pooled
    effect."""
    y = jnp.asarray([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = jnp.asarray([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])

    def loglik(p):
        theta = p["mu"] + p["tau"] * p["theta_raw"]  # non-centered
        return jnp.sum(-0.5 * ((y - theta) / sigma) ** 2)

    model = BayesModel(
        {
            "mu": Normal(0.0, 5.0),
            "tau": HalfNormal(5.0),
            "theta_raw": (Normal(0.0, 1.0), 8),
        },
        loglik,
    )
    assert model.dim == 10

    res = multipathfinder(
        model, 2000, key=jax.random.key(0), nruns=16, maxiters=200,
        importance_denominator="mixture",
    )
    ch = res.draws_transformed
    assert set(ch) >= {"mu", "tau", "theta_raw", "logjoint"}
    assert ch["theta_raw"].shape == (2000, 8)  # (ndraws, block size)
    assert np.all(np.asarray(ch["tau"]) > 0)
    mu = float(np.mean(np.asarray(ch["mu"])))
    tau = float(np.mean(np.asarray(ch["tau"])))
    # NUTS reference values for this data: E[mu]≈4.4, E[tau]≈3.6 — generous
    # bands since Pathfinder is an approximation
    assert 1.0 < mu < 8.0, mu
    assert 0.5 < tau < 8.0, tau
    # partial pooling: per-school posterior means pulled toward mu relative
    # to the raw observations
    theta = (
        np.asarray(ch["mu"])[:, None]
        + np.asarray(ch["tau"])[:, None] * np.asarray(ch["theta_raw"])
    )  # (ndraws, 8)
    theta_mean = theta.mean(axis=0)
    pull = np.abs(theta_mean - mu) / np.maximum(np.abs(np.asarray(y) - mu), 1e-9)
    assert np.all(pull < 1.0), pull  # every school shrinks toward the pooled mean


def test_ordered_and_simplex_bijectors():
    """Block bijectors: round-trip exactness and log-det-Jacobian vs the
    autodiff determinant (the same contract the Stacked/Interval test
    checks, extended to the non-elementwise transforms)."""
    from pathfinder_tpu.integrations.transforms import Ordered, Simplex

    z = jnp.asarray([0.3, -1.2, 0.5, 2.0, -0.7])
    for bij in [Ordered(), Simplex()]:
        x = bij.forward(z)
        # round trip
        np.testing.assert_allclose(
            np.asarray(bij.inverse(x)), np.asarray(z), rtol=1e-5, atol=1e-6
        )
        # log|det J| vs autodiff
        J = jax.jacobian(bij.forward)(z)
        _, logdet_ad = jnp.linalg.slogdet(J)
        np.testing.assert_allclose(
            float(jnp.sum(bij.forward_log_det(z))), float(logdet_ad),
            rtol=1e-5,
        )
    # constraint satisfaction
    xo = Ordered().forward(z)
    assert np.all(np.diff(np.asarray(xo)) > 0)
    xs = Simplex().forward(z)
    assert np.all(np.asarray(xs) > 0) and float(jnp.sum(xs)) < 1.0


def test_dirichlet_multinomial_conjugate_recovery():
    """Dirichlet prior + multinomial counts: the posterior is
    Dirichlet(alpha + n) in closed form — pathfinder on the BayesModel must
    recover its mean for every simplex coordinate."""
    from pathfinder_tpu.models.bayes import Dirichlet

    alpha = np.array([2.0, 3.0, 1.5, 4.0])
    counts = np.array([20.0, 5.0, 12.0, 40.0])

    def loglik(p):
        w_first = p["w"]  # first K-1 simplex coords
        w_last = 1.0 - jnp.sum(w_first)
        logw = jnp.concatenate([jnp.log(w_first), jnp.log(w_last)[None]])
        return jnp.sum(jnp.asarray(counts) * logw)

    model = BayesModel({"w": (Dirichlet(alpha), 3)}, loglik)
    res = multipathfinder(model, 4000, key=jax.random.key(0), nruns=8,
                          maxiters=100, importance_denominator="mixture")
    w = np.asarray(res.draws_transformed["w"])  # (ndraws, 3)
    w_full = np.concatenate([w, (1.0 - w.sum(axis=1))[:, None]], axis=1)
    post_alpha = alpha + counts
    mean_true = post_alpha / post_alpha.sum()
    sd_true = np.sqrt(
        mean_true * (1 - mean_true) / (post_alpha.sum() + 1.0)
    )
    err = np.abs(w_full.mean(axis=0) - mean_true) / sd_true
    assert np.all(err < 1.0), (w_full.mean(axis=0), mean_true, err)
    assert np.all(w_full > 0) and np.allclose(w_full.sum(axis=1), 1.0, atol=1e-5)


def test_gamma_cauchy_halfcauchy_log_probs_match_scipy():
    import scipy.stats as st
    from pathfinder_tpu.models.bayes import Cauchy, Gamma, HalfCauchy

    x = np.asarray([0.3, 1.7, 0.9])
    checks = [
        (Gamma(2.5, 1.7), st.gamma(2.5, scale=1 / 1.7)),
        (Cauchy(0.4, 1.2), st.cauchy(0.4, 1.2)),
        (HalfCauchy(2.0), st.halfcauchy(scale=2.0)),
    ]
    for dist, ref in checks:
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(jnp.asarray(x))),
            ref.logpdf(x),
            rtol=1e-6,
            err_msg=repr(dist),
        )
    # prior sampling sanity (supports + rough scale)
    for dist in [Gamma(2.5, 1.7), HalfCauchy(2.0)]:
        s = np.asarray(dist.sample(jax.random.key(0), (4000,)))
        assert np.all(s > 0)
    np.testing.assert_allclose(
        np.median(np.asarray(Cauchy(0.4, 1.2).sample(jax.random.key(1), (20000,)))),
        0.4, atol=0.05,
    )


def test_dirichlet_block_size_validation():
    from pathfinder_tpu.models.bayes import Dirichlet

    # auto-sizes without an explicit block size
    m = BayesModel({"w": Dirichlet([1.0, 2.0, 3.0])})
    assert m.dim == 2
    # wrong explicit size raises instead of silently mis-slicing
    with pytest.raises(ValueError, match="block size 2"):
        BayesModel({"w": (Dirichlet([1.0, 2.0, 3.0]), 3)})


def test_dirichlet_two_categories():
    """len(alpha)==2 gives a size-1 block whose constrained value reaches
    log_prob as a 0-d scalar — must not crash (code-review regression)."""
    from pathfinder_tpu.models.bayes import Dirichlet

    m = BayesModel({"w": Dirichlet([2.0, 3.0])})
    assert m.dim == 1
    lp = float(m.constrained_logp(jnp.asarray([0.4])))
    # Dirichlet(2,3) density at (0.4, 0.6): Beta(2,3) pdf at 0.4
    import scipy.stats as st
    np.testing.assert_allclose(lp, st.beta(2.0, 3.0).logpdf(0.4), rtol=1e-6)
    res = pathfinder(m, key=jax.random.key(0), ndraws=100, maxiters=40)
    assert res.success


def test_prior_parameter_validation():
    """Invalid distribution parameters raise named errors at construction,
    not NaN deep inside the jitted optimizer."""
    from pathfinder_tpu.models.bayes import Dirichlet, Gamma

    with pytest.raises(ValueError, match="Normal.*scale"):
        Normal(0.0, -1.0)
    with pytest.raises(ValueError, match="HalfNormal.*scale"):
        HalfNormal(0.0)
    with pytest.raises(ValueError, match="LogNormal.*scale"):
        LogNormal(0.0, -2.0)
    with pytest.raises(ValueError, match="Exponential.*rate"):
        Exponential(-1.0)
    with pytest.raises(ValueError, match="Beta"):
        Beta(-2.0, 1.0)
    with pytest.raises(ValueError, match="Uniform.*high"):
        Uniform(1.0, 0.0)
    with pytest.raises(ValueError, match="Dirichlet"):
        Dirichlet([1.0, -0.5])
    with pytest.raises(ValueError, match="Gamma"):
        Gamma(concentration=-1.0)


def test_boundary_log_prob_no_nan():
    """Unit-shape densities stay finite (and others -inf, never NaN) when
    the bijector output saturates to the support boundary in float32 —
    a line-search trial far into the tail must not poison the gradient."""
    from pathfinder_tpu.models.bayes import Dirichlet, Gamma

    zero = jnp.asarray(0.0, jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    # Gamma(1, b) at x=0 is Exponential(b): log b
    np.testing.assert_allclose(
        float(Gamma(1.0, 2.0).log_prob(zero)), np.log(2.0), rtol=1e-6
    )
    # Beta(1,1) is Uniform: log_prob = 0 at both corners
    assert float(Beta(1.0, 1.0).log_prob(zero)) == 0.0
    assert float(Beta(1.0, 1.0).log_prob(one)) == 0.0
    # LogNormal at x=0: the true limit is -inf, not NaN
    assert float(LogNormal().log_prob(zero)) == -np.inf
    # Dirichlet(1,1,1) at a simplex corner: log Beta-normalizer, finite
    d = Dirichlet([1.0, 1.0, 1.0])
    v = float(d.log_prob(jnp.asarray([1.0, 0.0], jnp.float32)))
    assert np.isfinite(v)
    # gradient through the linked density stays NaN-free at extreme z
    m = BayesModel(
        priors={"sigma": (Gamma(1.0, 1.0), 1)},
        loglikelihood=None,
    )
    vg = m.transformed.unconstrained.value_and_grad
    val, g = vg(jnp.asarray([-90.0], jnp.float32))  # exp(-90) -> 0 in f32
    assert not np.isnan(float(val))
    assert not np.isnan(float(g[0]))


def test_unit_shape_detection_accepts_int_and_numpy_params():
    """Unit shapes written as ints or numpy scalars (Gamma(1, 2),
    Beta(1, 3)) get the same static term drop as float 1.0 — otherwise
    the xlogy gradient is 0/0 = NaN at a saturated-bijector corner."""
    from pathfinder_tpu.models.bayes import Gamma

    zero = jnp.asarray(0.0, jnp.float32)
    for a_one in (1, 1.0, np.float32(1.0), np.int64(1)):
        g = Gamma(a_one, 2)  # int rate is fine either way
        assert np.isfinite(float(g.log_prob(zero)))
        b = Beta(a_one, 3)
        assert np.isfinite(float(b.log_prob(zero)))
    # gradient stays NaN-free through the linked density with int shapes
    m = BayesModel(
        priors={"sigma": (Gamma(1, 1), 1)},
        loglikelihood=None,
    )
    vg = m.transformed.unconstrained.value_and_grad
    val, g = vg(jnp.asarray([-90.0], jnp.float32))
    assert not np.isnan(float(val))
    assert not np.isnan(float(g[0]))
    # non-unit shapes keep the term (Gamma(2,1) at 0 is log 0 = -inf)
    from pathfinder_tpu.models.bayes import Gamma as G

    assert float(G(2, 1.0).log_prob(zero)) == -np.inf


def test_init_from_params_out_of_support_raises():
    """A fixed value outside its prior's support raises a ValueError naming
    the parameter (the reference InitFromParams validates support) instead
    of producing a NaN init that silently fails every try."""
    m = BayesModel(
        priors={"p": (Uniform(0.0, 1.0), 1), "mu": (Normal(), 1)},
        loglikelihood=None,
    )
    with pytest.raises(ValueError, match=r"\['p'\]"):
        m.init_from_params({"p": 1.5})
    # in-support values still work
    z = m.init_from_params({"p": 0.25, "mu": 2.0})
    assert np.isfinite(np.asarray(z)).all()


def test_log_density_hash_stable_across_paths():
    """LogDensity instances from different construction paths over the same
    logp must hash equal — the jitted core's static target key must not
    split (a split means a full recompile per call pattern)."""
    from pathfinder_tpu.models.protocol import LogDensity, as_log_density

    def logp(x):
        return -0.5 * jnp.sum(x * x)

    a = as_log_density(LogDensity(logp), dim=5)  # with_dim path
    b = LogDensity(logp, dim=5)  # direct path
    assert a == b and hash(a) == hash(b)

    # explicit grad: repeated calls produce equal targets (cached parts vg)
    def grad(x):
        return -x

    c1 = as_log_density(logp, dim=5, grad=grad)
    c2 = as_log_density(logp, dim=5, grad=grad)
    assert c1 == c2 and hash(c1) == hash(c2)

    # duck-typed object with a present-but-None dim honors the caller's dim
    class Obj:
        dim = None

        @staticmethod
        def logp(x):
            return -0.5 * jnp.sum(x * x)

    assert as_log_density(Obj(), dim=7).dim == 7

    # BOUND-METHOD logp/grad: every obj.method access creates a fresh
    # method object, so the vg cache must key on (instance, function) and
    # live on the instance — else the target hash splits and the jitted
    # core recompiles per call
    class MethObj:
        def logp(self, x):
            return -0.5 * jnp.sum(x * x)

        def grad(self, x):
            return -x

    o = MethObj()
    d1 = as_log_density(o.logp, dim=5, grad=o.grad)
    d2 = as_log_density(o.logp, dim=5, grad=o.grad)
    assert d1.value_and_grad is d2.value_and_grad
    # a different instance must NOT share the cache
    o2 = MethObj()
    d3 = as_log_density(o2.logp, dim=5, grad=o2.grad)
    assert d3.value_and_grad is not d1.value_and_grad
    v, g = d1.value_and_grad(jnp.ones(5))
    np.testing.assert_allclose(float(v), -2.5)
    np.testing.assert_allclose(np.asarray(g), -np.ones(5))
