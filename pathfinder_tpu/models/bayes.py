"""In-repo Bayesian model layer: named priors + likelihood, linked to
unconstrained space.

This is the executable analog of the reference's Turing/DynamicPPL extension
(``ext/PathfinderTuringExt.jl``) for environments without a PPL: a
:class:`BayesModel` plays the role of a ``DynamicPPL.Model`` —

* linking to unconstrained space with the change-of-variables Jacobian
  (parity: ``create_log_density_function``,
  ``ext/PathfinderTuringExt.jl:22-29``) via the package's bijectors;
* converting unconstrained draws back to named constrained parameters with
  per-draw ``logprior`` / ``loglikelihood`` / ``logjoint`` stats (parity:
  ``draws_to_chains`` + ``DynamicPPL.ParamsWithStats``,
  ``ext/PathfinderTuringExt.jl:43-48``);
* init strategies: from the prior, or from (partially) fixed parameter
  values (parity: ``InitStrategySampler`` / ``_format_init``,
  ``ext/PathfinderTuringExt.jl:50-96`` mapping ``InitFromPrior`` /
  ``InitFromParams``).

``pathfinder(model)`` / ``multipathfinder(model, n)`` accept a
:class:`BayesModel` directly and return results whose ``draws_transformed``
are constrained-space draws, re-transformed automatically by ``resample``.

Everything is elementwise JAX; the per-parameter distributions carry their
support bijector, so the stacked model link is assembled automatically.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import numbers
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pathfinder_tpu.integrations.transforms import (
    Bijector,
    Exp,
    Identity,
    Interval,
    Simplex,
    Stacked,
    TransformedLogDensity,
)

__all__ = [
    "Normal",
    "Cauchy",
    "HalfCauchy",
    "Gamma",
    "HalfNormal",
    "LogNormal",
    "Exponential",
    "Uniform",
    "Beta",
    "StudentT",
    "Dirichlet",
    "BayesModel",
]

_LOG_2PI = math.log(2.0 * math.pi)


class Distribution:
    """Scalar-elementwise prior distribution: ``log_prob`` in constrained
    space, a support ``bijector`` (unconstrained → support), and prior
    sampling for init strategies."""

    bijector: Bijector = Identity()

    def log_prob(self, x):  # elementwise
        raise NotImplementedError

    def sample(self, key, shape):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Normal(Distribution):
    loc: float = 0.0
    scale: float = 1.0
    bijector: Bijector = Identity()

    def __post_init__(self):
        _check_positive("Normal", scale=self.scale)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(jnp.asarray(self.scale, x.dtype))

    def sample(self, key, shape):
        return self.loc + self.scale * jax.random.normal(key, shape)


@dataclasses.dataclass(frozen=True)
class HalfNormal(Distribution):
    scale: float = 1.0
    bijector: Bijector = Exp()

    def __post_init__(self):
        _check_positive("HalfNormal", scale=self.scale)

    def log_prob(self, x):
        z = x / self.scale
        return (
            0.5 * math.log(2.0 / math.pi)
            - jnp.log(jnp.asarray(self.scale, x.dtype))
            - 0.5 * z * z
        )

    def sample(self, key, shape):
        return self.scale * jnp.abs(jax.random.normal(key, shape))


@dataclasses.dataclass(frozen=True)
class LogNormal(Distribution):
    loc: float = 0.0
    scale: float = 1.0
    bijector: Bijector = Exp()

    def __post_init__(self):
        _check_positive("LogNormal", scale=self.scale)

    def log_prob(self, x):
        # safe-where: at x = 0 (f32 underflow of Exp.forward during a line
        # search) the naive -z^2/2 - log(x) is -inf + inf = NaN; the true
        # limit is -inf, and the double-where keeps gradients NaN-free
        pos = x > 0
        lx = jnp.log(jnp.where(pos, x, 1.0))
        z = (lx - self.loc) / self.scale
        val = -0.5 * (z * z + _LOG_2PI) - jnp.log(
            jnp.asarray(self.scale, x.dtype)
        ) - lx
        return jnp.where(pos, val, -jnp.inf)

    def sample(self, key, shape):
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))


@dataclasses.dataclass(frozen=True)
class Exponential(Distribution):
    rate: float = 1.0
    bijector: Bijector = Exp()

    def __post_init__(self):
        _check_positive("Exponential", rate=self.rate)

    def log_prob(self, x):
        return jnp.log(jnp.asarray(self.rate, x.dtype)) - self.rate * x

    def sample(self, key, shape):
        return jax.random.exponential(key, shape) / self.rate


@dataclasses.dataclass(frozen=True)
class Uniform(Distribution):
    low: float = 0.0
    high: float = 1.0

    def __post_init__(self):
        if (
            isinstance(self.low, (int, float))
            and isinstance(self.high, (int, float))
            and not self.high > self.low
        ):
            raise ValueError(
                f"Uniform: high must exceed low, got ({self.low}, {self.high})"
            )

    @property
    def bijector(self) -> Bijector:
        return Interval(self.low, self.high)

    def log_prob(self, x):
        # jnp.log: array-valued bounds are accepted (validated elementwise),
        # matching the sibling distributions
        return jnp.zeros_like(x) - jnp.log(
            jnp.asarray(self.high, x.dtype) - jnp.asarray(self.low, x.dtype)
        )

    def sample(self, key, shape):
        return jax.random.uniform(key, shape, minval=self.low, maxval=self.high)


@dataclasses.dataclass(frozen=True)
class Beta(Distribution):
    a: float = 1.0
    b: float = 1.0

    @property
    def bijector(self) -> Bijector:
        return Interval(0.0, 1.0)

    def __post_init__(self):
        _check_positive("Beta", a=self.a, b=self.b)

    def log_prob(self, x):
        from jax.scipy.special import betaln, xlog1py, xlogy

        # unit shapes: drop the term statically (see _is_static_one —
        # covers int/numpy-typed shapes like Beta(1, 3), not just float)
        out = -betaln(self.a, self.b) + jnp.zeros_like(x)
        if not _is_static_one(self.a):
            out = out + xlogy(self.a - 1.0, x)
        if not _is_static_one(self.b):
            out = out + xlog1py(self.b - 1.0, -x)
        return out

    def sample(self, key, shape):
        return jax.random.beta(key, self.a, self.b, shape)


def _is_static_one(value) -> bool:
    """True when ``value`` is a concrete (non-traced) scalar equal to 1 —
    Python int/float or numpy scalar. Used to drop unit-shape xlogy terms
    statically: xlogy keeps the VALUE finite at a saturated-bijector
    corner (0*log(0)=0) but its gradient is 0/0 = NaN there. Traced
    values return False (the term is kept; dropping it would be wrong
    for a runtime-varying shape)."""
    return isinstance(value, numbers.Real) and float(value) == 1.0


def _check_positive(dist: str, **params) -> None:
    """Named validation for scalar distribution parameters (array-valued
    parameters are accepted and validated elementwise by ``jnp.log``)."""
    for name, value in params.items():
        if isinstance(value, (int, float)) and not value > 0:
            raise ValueError(
                f"{dist}: parameter {name!r} must be positive, got {value}"
            )


@dataclasses.dataclass(frozen=True)
class Gamma(Distribution):
    """Shape-rate parameterization (Stan's convention)."""

    concentration: float = 1.0
    rate: float = 1.0
    bijector: Bijector = Exp()

    def __post_init__(self):
        _check_positive(
            "Gamma", concentration=self.concentration, rate=self.rate
        )

    def log_prob(self, x):
        from jax.scipy.special import gammaln, xlogy

        a, b = self.concentration, self.rate
        out = a * jnp.log(b) - gammaln(a) - b * x
        # a == 1 (the default): drop the shape term statically — xlogy
        # keeps the VALUE finite when Exp.forward underflows to exactly 0
        # in float32 (0*log(0)=0) but its gradient is 0/0 = NaN there;
        # _is_static_one also catches int/numpy-typed Gamma(1, b)
        if not _is_static_one(a):
            out = out + xlogy(a - 1.0, x)
        return out

    def sample(self, key, shape):
        return jax.random.gamma(key, self.concentration, shape) / self.rate


@dataclasses.dataclass(frozen=True)
class Cauchy(Distribution):
    loc: float = 0.0
    scale: float = 1.0
    bijector: Bijector = Identity()

    def __post_init__(self):
        _check_positive("Cauchy", scale=self.scale)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -math.log(math.pi) - jnp.log(self.scale) - jnp.log1p(z * z)

    def sample(self, key, shape):
        return self.loc + self.scale * jax.random.cauchy(key, shape)


@dataclasses.dataclass(frozen=True)
class HalfCauchy(Distribution):
    """The weakly-informative scale prior of Gelman (2006)."""

    scale: float = 1.0
    bijector: Bijector = Exp()

    def __post_init__(self):
        _check_positive("HalfCauchy", scale=self.scale)

    def log_prob(self, x):
        z = x / self.scale
        return (
            math.log(2.0 / math.pi) - jnp.log(self.scale) - jnp.log1p(z * z)
        )

    def sample(self, key, shape):
        return self.scale * jnp.abs(jax.random.cauchy(key, shape))


@dataclasses.dataclass(frozen=True)
class StudentT(Distribution):
    df: float = 3.0
    loc: float = 0.0
    scale: float = 1.0
    bijector: Bijector = Identity()

    def __post_init__(self):
        _check_positive("StudentT", df=self.df, scale=self.scale)

    def log_prob(self, x):
        from jax.scipy.special import gammaln

        nu = self.df
        z = (x - self.loc) / self.scale
        return (
            gammaln((nu + 1.0) / 2.0)
            - gammaln(nu / 2.0)
            - 0.5 * jnp.log(nu * math.pi)
            - jnp.log(self.scale)
            - (nu + 1.0) / 2.0 * jnp.log1p(z * z / nu)
        )

    def sample(self, key, shape):
        return self.loc + self.scale * jax.random.t(key, self.df, shape)


class Dirichlet(Distribution):
    """Dirichlet(α) over the (len(α)−1)-dimensional representation of the
    simplex: the parameter block stores the **first len(α)−1 coordinates**
    (the last is ``1 − Σx``, the :class:`Simplex` bijector's convention).
    Declare with the matching block size:
    ``{"w": (Dirichlet([a1, ..., aK]), K - 1)}``."""

    def __init__(self, alpha):
        self.alpha = tuple(float(a) for a in alpha)
        _check_positive("Dirichlet", **{f"alpha[{i}]": a for i, a in enumerate(self.alpha)})

    def __hash__(self):
        return hash(("Dirichlet", self.alpha))

    def __eq__(self, other):
        return isinstance(other, Dirichlet) and self.alpha == other.alpha

    @property
    def size(self) -> int:
        return len(self.alpha) - 1

    @property
    def bijector(self) -> Bijector:
        return Simplex()

    def log_prob(self, x):
        # x: the first K-1 simplex coordinates; returns the BLOCK total
        # (BayesModel.logprior sums, so a scalar is fine)
        from jax.scipy.special import gammaln, xlogy

        x = jnp.atleast_1d(x)  # size-1 blocks arrive as 0-d scalars
        a = jnp.asarray(self.alpha, x.dtype)
        # f32 stick-breaking can round sum(x) a hair past 1; a negative
        # x_last would make xlogy NaN (not -inf) — clamp to the boundary,
        # where the density limit is -inf (a>1) / +inf (a<1), both correct
        x_last = jnp.maximum(1.0 - jnp.sum(x), 0.0)
        xs = jnp.concatenate([x, x_last[None]])
        log_beta = jnp.sum(gammaln(a)) - gammaln(jnp.sum(a))
        # unit-alpha components are dropped statically (value AND gradient
        # stay finite at simplex corners; xlogy alone fixes only the value)
        keep = [i for i, ai in enumerate(self.alpha) if ai != 1.0]
        if not keep:
            return -log_beta + jnp.zeros((), x.dtype)
        ki = jnp.asarray(keep)
        return jnp.sum(xlogy(a[ki] - 1.0, xs[ki])) - log_beta

    def sample(self, key, shape):
        if shape != (self.size,):
            raise ValueError(
                f"Dirichlet block must have size {self.size} "
                f"(= len(alpha) - 1), got shape {shape}"
            )
        full = jax.random.dirichlet(key, jnp.asarray(self.alpha))
        return full[: self.size]


def _normalize_priors(priors) -> Tuple[Tuple[str, Distribution, int], ...]:
    out = []
    items = priors.items() if isinstance(priors, dict) else priors
    for item in items:
        if isinstance(priors, dict):
            name, spec = item
        else:
            name, spec = item[0], item[1:] if len(item) > 2 else item[1]
        if isinstance(spec, tuple):
            dist, size = spec
        else:
            dist = spec
            size = getattr(dist, "size", 1)  # block dists auto-size
        # block distributions (Dirichlet, …) fix their own block size —
        # declaring a different one would silently mis-slice the flat vector
        required = getattr(dist, "size", None)
        if required is not None and int(size) != int(required):
            raise ValueError(
                f"prior {name!r} ({type(dist).__name__}) requires block "
                f"size {required}, got {size}"
            )
        out.append((name, dist, int(size)))
    return tuple(out)


@dataclasses.dataclass(frozen=True, eq=False)
class BayesModel:
    """``priors``: ``{name: dist}`` or ``{name: (dist, size)}`` (ordered);
    ``loglikelihood``: optional callable taking the named constrained
    parameter dict and returning a scalar log likelihood.

    Identity-hashed (like the callables it wraps) so one model instance maps
    to one jit cache entry.
    """

    priors: Tuple[Tuple[str, Distribution, int], ...]
    loglikelihood: Optional[Callable] = None

    def __init__(self, priors, loglikelihood=None):
        object.__setattr__(self, "priors", _normalize_priors(priors))
        object.__setattr__(self, "loglikelihood", loglikelihood)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # -- shapes ---------------------------------------------------------------
    @property
    def dim(self) -> int:
        return sum(size for _, _, size in self.priors)

    @property
    def names(self):
        return [name for name, _, _ in self.priors]

    def split(self, x: jax.Array) -> Dict[str, jax.Array]:
        """Flat constrained vector → named parameter dict (scalars for
        size-1 blocks)."""
        out, i = {}, 0
        for name, _, size in self.priors:
            block = x[i : i + size]
            out[name] = block[0] if size == 1 else block
            i += size
        return out

    def join(self, params: Dict[str, jax.Array]) -> jax.Array:
        """Named parameter dict → flat constrained vector."""
        parts = []
        for name, _, size in self.priors:
            parts.append(jnp.reshape(jnp.asarray(params[name]), (size,)))
        return jnp.concatenate(parts)

    # -- densities (constrained space) ---------------------------------------
    def logprior(self, params: Dict[str, jax.Array]) -> jax.Array:
        total = 0.0
        for name, dist, size in self.priors:
            total = total + jnp.sum(dist.log_prob(jnp.asarray(params[name])))
        return total

    def logjoint(self, params: Dict[str, jax.Array]) -> jax.Array:
        lp = self.logprior(params)
        if self.loglikelihood is not None:
            lp = lp + self.loglikelihood(params)
        return lp

    def constrained_logp(self, x: jax.Array) -> jax.Array:
        return self.logjoint(self.split(x))

    # -- linking (parity: create_log_density_function) ------------------------
    @functools.cached_property
    def bijector(self) -> Stacked:
        return Stacked(
            tuple((dist.bijector, size) for _, dist, size in self.priors)
        )

    @functools.cached_property
    def transformed(self) -> TransformedLogDensity:
        """The unconstrained linked density with Jacobian correction —
        hand ``.unconstrained`` to ``pathfinder`` (done automatically when a
        model is passed directly)."""
        return TransformedLogDensity(
            logp_constrained=self.constrained_logp,
            bijector=self.bijector,
            dim=self.dim,
        )

    # -- init strategies (parity: ext/PathfinderTuringExt.jl:50-96) -----------
    def init_from_prior(self) -> Callable:
        """An ``init_sampler`` drawing the initial point from the prior and
        linking it to unconstrained space (parity: ``InitFromPrior`` via
        ``InitStrategySampler``)."""

        def sampler(key, dim, dtype=jnp.float32):
            x = self.sample_prior(key)
            return self.bijector.inverse(x).astype(dtype)

        return sampler

    def sample_prior(self, key: jax.Array) -> jax.Array:
        """One flat constrained draw from the prior."""
        parts = []
        for i, (name, dist, size) in enumerate(self.priors):
            parts.append(
                jnp.reshape(dist.sample(jax.random.fold_in(key, i), (size,)), (size,))
            )
        return jnp.concatenate(parts)

    def init_from_params(self, params: Dict[str, jax.Array], key=None) -> jax.Array:
        """Unconstrained initial point from (possibly partial) constrained
        parameter values; unspecified parameters are drawn from their prior
        (parity: ``InitFromParams``, ``ext/PathfinderTuringExt.jl:74-96``)."""
        if key is None:
            key = jax.random.key(0)
        full = dict(self.split(self.sample_prior(key)))
        for name, val in params.items():
            if name not in full:
                raise KeyError(f"unknown parameter {name!r}")
            full[name] = jnp.asarray(val)
        z = self.bijector.inverse(self.join(full))
        if not bool(jnp.isfinite(z).all()):
            # name the offending parameter(s) instead of letting every
            # pathfinder try fail on a silent NaN init (the reference's
            # InitFromParams validates support)
            zf = jnp.isfinite(z)
            bad, i = [], 0
            for name, _, size in self.priors:
                if not bool(zf[i : i + size].all()):
                    bad.append(name)
                i += size
            raise ValueError(
                f"init_from_params: value(s) for {bad} are outside the "
                "support of their prior (unconstrained init is non-finite)"
            )
        return z

    # -- draw conversion (parity: draws_to_chains + ParamsWithStats) ----------
    def constrain_draws(self, draws: jax.Array) -> Dict[str, jax.Array]:
        """Unconstrained ``(dim, ndraws)`` → named constrained arrays with a
        leading draws axis."""
        con = jax.vmap(self.bijector.forward, in_axes=1)(draws)  # (N, dim)
        return self._split_constrained(con)

    def _split_constrained(self, con: jax.Array) -> Dict[str, jax.Array]:
        out, i = {}, 0
        for name, _, size in self.priors:
            block = con[:, i : i + size]
            out[name] = block[:, 0] if size == 1 else block
            i += size
        return out

    def pointwise_stats(
        self, draws: jax.Array, constrained: Optional[jax.Array] = None
    ) -> Dict[str, jax.Array]:
        """Per-draw ``logprior`` / ``loglikelihood`` / ``logjoint`` of the
        constrained draws (the reference chains' Extras,
        ``ext/PathfinderTuringExt.jl:43-48``). ``constrained``: optional
        already-transformed ``(N, dim)`` matrix, to skip re-running the
        bijector forward pass."""
        if constrained is None:
            constrained = jax.vmap(self.bijector.forward, in_axes=1)(draws)

        def one(x):
            params = self.split(x)
            lp = self.logprior(params)
            ll = (
                self.loglikelihood(params)
                if self.loglikelihood is not None
                else jnp.zeros_like(lp)
            )
            return lp, ll

        lp, ll = jax.vmap(one)(constrained)
        return {"logprior": lp, "loglikelihood": ll, "logjoint": lp + ll}

    def draws_to_chain(self, draws: jax.Array) -> Dict[str, jax.Array]:
        """Named constrained draws + per-draw stats in one dict — the
        chain-object analog used for ``draws_transformed``; the bijector
        forward pass over the draw matrix runs once."""
        con = jax.vmap(self.bijector.forward, in_axes=1)(draws)
        out = self._split_constrained(con)
        out.update(self.pointwise_stats(draws, constrained=con))
        return out
