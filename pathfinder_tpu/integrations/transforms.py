"""Constrained ↔ unconstrained transforms with change-of-variables Jacobian.

The JAX analog of the reference's Turing/DynamicPPL extension, which links a
model to unconstrained space and optimizes the Jacobian-corrected density
(``ext/PathfinderTuringExt.jl:22-29``), then maps draws back to constrained
space (``draws_to_chains``, ``:43-48``). Here the same machinery is exposed
as composable bijectors plus :class:`TransformedLogDensity`; any PPL (or
hand-written model) can use it directly.

Pathfinder runs on ``logp_unconstrained(z) = logp(T(z)) + log|det J_T(z)|``;
``forward_draws`` plays the role of the reference's chain conversion.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pathfinder_tpu.models.protocol import LogDensity

__all__ = [
    "Identity",
    "Exp",
    "Interval",
    "Ordered",
    "Simplex",
    "Stacked",
    "TransformedLogDensity",
    "TransformedDistribution",
    "resolve_transform",
]


def resolve_transform(fn, transform, dim=None, grad=None):
    """Resolve the (fn, transform) inputs of ``pathfinder`` /
    ``multipathfinder`` into ``(target_input, tld)`` where ``target_input``
    is what the optimizer should maximize and ``tld`` is the
    :class:`TransformedLogDensity` (or None for plain unconstrained runs).

    Accepted shapes (the driver-level analog of the reference's Turing
    method dispatch, ``ext/PathfinderTuringExt.jl:169-186``):

    * ``fn`` is a model object exposing ``.transformed`` (a
      :class:`TransformedLogDensity`), e.g. :class:`~pathfinder_tpu.models.bayes.BayesModel`;
    * ``fn`` IS a :class:`TransformedLogDensity`;
    * ``transform=`` is a :class:`TransformedLogDensity` (``fn`` ignored);
    * ``transform=`` is a bijector — then ``fn`` is interpreted as the
      **constrained-space** log density and is linked here; ``grad=``
      (the constrained-space gradient of ``fn``) is chain-ruled through
      the bijector so the unconstrained optimizer never differentiates
      the user's logp.

    For model / :class:`TransformedLogDensity` inputs a supplied ``grad``
    cannot be interpreted (which space is it in?) and is rejected loudly.
    """
    if transform is None:
        if isinstance(fn, TransformedLogDensity):
            _reject_grad(grad, "a TransformedLogDensity input")
            return fn.unconstrained, fn
        t = getattr(fn, "transformed", None)
        if isinstance(t, TransformedLogDensity):
            _reject_grad(grad, "a model input")
            return t.unconstrained, t
        return fn, None
    if isinstance(transform, TransformedLogDensity):
        _reject_grad(grad, "transform=<TransformedLogDensity>")
        return transform.unconstrained, transform
    if not isinstance(transform, Bijector):
        raise TypeError(
            "transform must be a Bijector or TransformedLogDensity, got "
            f"{type(transform)!r}"
        )
    logp_c = getattr(fn, "logp", fn)
    if not callable(logp_c):
        raise TypeError("fn must be a callable log density when transform= is a bijector")
    d = dim if dim is not None else getattr(fn, "dim", None)
    if d is None:
        raise ValueError("dim is required when transform= is a bijector")
    tld = _cached_tld(logp_c, transform, int(d), grad)
    return tld.unconstrained, tld


def _reject_grad(grad, what):
    if grad is not None:
        raise ValueError(
            f"grad= cannot be combined with {what}: the linked "
            "unconstrained density is built by the transform itself. Pass "
            "grad= only with a plain callable target, or with "
            "transform=<bijector> (where it is the constrained-space "
            "gradient)."
        )


def _cached_tld(logp_c, bijector, dim, grad=None) -> "TransformedLogDensity":
    # one TLD instance per (logp, bijector, dim), cached ON the callable
    # (its instance for a bound method) so retention is bounded by the
    # target's own lifetime — a module-level lru_cache would pin up to
    # maxsize user closures (and any datasets they capture) for the life
    # of the process. One slot per callable: repeated pathfinder calls
    # with the same transform reuse the cached unconstrained closure and
    # so hit the same pathfinder_core jit entry; alternating transforms
    # on one callable re-derive (rare, and correctness is unaffected).
    from pathfinder_tpu.models.protocol import _callable_key

    owner = getattr(logp_c, "__self__", logp_c)
    key = (
        _callable_key(logp_c),
        bijector,
        dim,
        None if grad is None else _callable_key(grad),
    )
    cache = getattr(owner, "_pf_tld_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1]
    tld = TransformedLogDensity(
        logp_constrained=logp_c,
        bijector=bijector,
        dim=dim,
        grad_constrained=grad,
    )
    try:
        owner._pf_tld_cache = (key, tld)
    except (AttributeError, TypeError):
        pass  # no __dict__: uncached
    return tld


def transformed_outputs(tld, input_obj, draws, fit_distribution):
    """Constrained-space result fields for a transform-aware run: the
    transformed draws (a named chain dict with per-draw stats when the input
    model provides ``draws_to_chain`` and its own link drove the run, else
    the forward-mapped draw matrix) and the pushforward fit distribution.
    Parity: ``draws_to_chains`` + ``Bijectors.transformed``
    (``ext/PathfinderTuringExt.jl:43-48,183-185``)."""
    if tld is None:
        return draws, fit_distribution
    # only use the model's own chain conversion when the model's own link
    # IS the transform that drove the optimization — with an explicit
    # different transform=, converting via the model's bijector would make
    # draws_transformed inconsistent with fit_distribution_transformed
    chainer = getattr(input_obj, "draws_to_chain", None)
    own_tld = getattr(input_obj, "transformed", None)
    if chainer is not None and own_tld == tld:
        draws_t = chainer(draws)
    else:
        draws_t = tld.forward_draws(draws)
    return draws_t, TransformedDistribution(fit_distribution, tld.bijector)


class Bijector:
    """Scalar-elementwise bijector: z (unconstrained) ↔ x (constrained)."""

    def forward(self, z):  # z -> x
        raise NotImplementedError

    def inverse(self, x):  # x -> z
        raise NotImplementedError

    def forward_log_det(self, z):  # log|dx/dz| elementwise
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Bijector):
    def forward(self, z):
        return z

    def inverse(self, x):
        return x

    def forward_log_det(self, z):
        return jnp.zeros_like(z)


@dataclasses.dataclass(frozen=True)
class Exp(Bijector):
    """Positive support: x = exp(z) (the standard link for scales)."""

    def forward(self, z):
        return jnp.exp(z)

    def inverse(self, x):
        return jnp.log(x)

    def forward_log_det(self, z):
        return z


@dataclasses.dataclass(frozen=True)
class Interval(Bijector):
    """Bounded support (a, b): x = a + (b−a)·sigmoid(z)."""

    low: float
    high: float

    def __post_init__(self):
        # swapped bounds would make every log-Jacobian log(negative) = NaN
        # with no pointer to the cause; validate concrete scalars here
        if (
            isinstance(self.low, (int, float))
            and isinstance(self.high, (int, float))
            and not self.high > self.low
        ):
            raise ValueError(
                f"Interval: high must exceed low, got ({self.low}, {self.high})"
            )

    def forward(self, z):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(z)

    def inverse(self, x):
        u = (x - self.low) / (self.high - self.low)
        return jnp.log(u) - jnp.log1p(-u)

    def forward_log_det(self, z):
        # log((b-a) σ(z) (1-σ(z)))
        return (
            jnp.log(self.high - self.low)
            + jax.nn.log_sigmoid(z)
            + jax.nn.log_sigmoid(-z)
        )


@dataclasses.dataclass(frozen=True)
class Ordered(Bijector):
    """Strictly increasing vectors (Stan's ``ordered`` type): ``x₁ = z₁``,
    ``x_k = x_{k−1} + exp(z_k)``. Block bijector — apply to a whole
    parameter block (e.g. ordered cutpoints), not elementwise; the
    ``forward_log_det`` vector sums to the true log-Jacobian
    ``Σ_{k≥2} z_k``."""

    def forward(self, z):
        return jnp.cumsum(
            jnp.concatenate([z[:1], jnp.exp(z[1:])])
        )

    def inverse(self, x):
        return jnp.concatenate([x[:1], jnp.log(jnp.diff(x))])

    def forward_log_det(self, z):
        return jnp.concatenate([jnp.zeros_like(z[:1]), z[1:]])


@dataclasses.dataclass(frozen=True)
class Simplex(Bijector):
    """Stick-breaking simplex transform (Stan reference manual §10.7):
    ``z`` of length m ↔ the **first m coordinates** of an (m+1)-simplex
    (the last coordinate is ``1 − Σx``, stored implicitly so the block
    keeps the same length in both spaces). ``w_k = σ(z_k − log(m+1−k))``,
    ``x_k = stick_k · w_k``, ``stick_{k+1} = stick_k(1 − w_k)``."""

    def _offsets(self, m, dtype):
        return jnp.log(jnp.arange(m, 0, -1).astype(dtype))

    def forward(self, z):
        u = z - self._offsets(z.shape[0], z.dtype)

        def step(stick, uk):
            xk = stick * jax.nn.sigmoid(uk)
            return stick - xk, xk

        _, x = jax.lax.scan(step, jnp.ones((), z.dtype), u)
        return x

    def inverse(self, x):
        m = x.shape[0]
        stick = 1.0 - jnp.concatenate(
            [jnp.zeros((1,), x.dtype), jnp.cumsum(x)[:-1]]
        )
        w = x / stick
        return (
            jnp.log(w) - jnp.log1p(-w) + self._offsets(m, x.dtype)
        )

    def forward_log_det(self, z):
        u = z - self._offsets(z.shape[0], z.dtype)

        def step(stick, uk):
            ld = (
                jax.nn.log_sigmoid(uk)
                + jax.nn.log_sigmoid(-uk)
                + jnp.log(stick)
            )
            return stick * jax.nn.sigmoid(-uk), ld

        _, lds = jax.lax.scan(step, jnp.ones((), z.dtype), u)
        return lds


@dataclasses.dataclass(frozen=True)
class Stacked(Bijector):
    """Apply per-block bijectors along the parameter vector:
    ``blocks = [(bijector, size), ...]`` in order."""

    blocks: Tuple[Tuple[Bijector, int], ...]

    def __post_init__(self):
        object.__setattr__(self, "blocks", tuple(self.blocks))
        for _, size in self.blocks:
            if size < 1:
                raise ValueError(f"Stacked block sizes must be >= 1; got {size}")

    def _split(self, v):
        total = sum(size for _, size in self.blocks)
        if v.shape[0] != total:
            raise ValueError(
                f"Stacked blocks cover {total} entries but the parameter "
                f"vector has {v.shape[0]} — block sizes must sum to the "
                "target dimension (a mismatch would silently truncate the "
                "vector and drop Jacobian terms)"
            )
        out, i = [], 0
        for b, size in self.blocks:
            out.append((b, v[i : i + size]))
            i += size
        return out

    def forward(self, z):
        return jnp.concatenate([b.forward(part) for b, part in self._split(z)])

    def inverse(self, x):
        return jnp.concatenate([b.inverse(part) for b, part in self._split(x)])

    def forward_log_det(self, z):
        return jnp.concatenate(
            [b.forward_log_det(part) for b, part in self._split(z)]
        )


@dataclasses.dataclass(frozen=True)
class TransformedLogDensity:
    """Wrap a constrained-space target for unconstrained optimization
    (parity: ``create_log_density_function``,
    ``ext/PathfinderTuringExt.jl:22-29``).

    ``logp_constrained`` takes x in the constrained space; ``bijector`` maps
    unconstrained z → constrained x. ``unconstrained`` is the
    :class:`LogDensity` to hand to ``pathfinder``; ``forward_draws`` converts
    a ``(dim, ndraws)`` unconstrained draw matrix back to constrained space
    (the chain-conversion analog)."""

    logp_constrained: Callable
    bijector: Bijector
    dim: int
    # optional constrained-space gradient of logp_constrained: when given,
    # the unconstrained density's value_and_grad chain-rules it through
    # the bijector (vjp of forward) instead of differentiating the user's
    # logp — so non-autodiff-able targets (host callbacks etc.) work
    grad_constrained: Optional[Callable] = None

    def __hash__(self):
        return hash(
            (
                self.logp_constrained,
                self.bijector,
                self.dim,
                self.grad_constrained,
            )
        )

    @functools.cached_property
    def unconstrained(self) -> LogDensity:
        # cached: a fresh closure per access would defeat the jit cache of
        # pathfinder_core (LogDensity hashes by its logp callable)
        b = self.bijector
        lp = self.logp_constrained
        gc = self.grad_constrained

        def logp(z):
            return lp(b.forward(z)) + jnp.sum(b.forward_log_det(z))

        vg = None
        if gc is not None:

            def vg(z):
                x, vjp_fn = jax.vjp(b.forward, z)
                ld_val, ld_grad = jax.value_and_grad(
                    lambda zz: jnp.sum(b.forward_log_det(zz))
                )(z)
                val = lp(x) + ld_val
                g = vjp_fn(gc(x))[0] + ld_grad
                return val, g

        return LogDensity(logp=logp, dim=self.dim, value_and_grad=vg)

    def forward_draws(self, draws_zd: jax.Array) -> jax.Array:
        """Map draws ``(dim, ndraws)`` from unconstrained to constrained."""
        return jax.vmap(self.bijector.forward, in_axes=1, out_axes=1)(draws_zd)

    def inverse_point(self, x: jax.Array) -> jax.Array:
        return self.bijector.inverse(x)


@dataclasses.dataclass(frozen=True)
class TransformedDistribution:
    """Pushforward of a fit distribution through a bijector — the analog of
    the reference's ``fit_distribution_transformed``
    (``Bijectors.transformed(dist)``, used by the Turing ext;
    ``PathfinderResult`` field at ``src/singlepath.jl:60``).

    ``base`` is an unconstrained-space distribution (:class:`MvNormal` or
    ``UniformMixture``) with ``sample``/``logpdf`` over ``(dim, N)``
    matrices; samples are mapped forward, densities get the inverse
    change-of-variables correction."""

    base: object
    bijector: Bijector

    def sample(self, key: jax.Array, ndraws: int):
        out = self.base.sample(key, ndraws)
        fwd = jax.vmap(self.bijector.forward, in_axes=1, out_axes=1)
        if isinstance(out, tuple):  # mixtures return (draws, component_ids)
            return (fwd(out[0]),) + out[1:]
        return fwd(out)

    def logpdf(self, x: jax.Array) -> jax.Array:
        """Log density at constrained ``x`` of shape ``(dim,)`` or
        ``(dim, N)``: ``logq(z) − log|det J(z)|`` with ``z = inverse(x)``."""
        single = x.ndim == 1
        xm = x[:, None] if single else x
        z = jax.vmap(self.bijector.inverse, in_axes=1, out_axes=1)(xm)
        ld = jax.vmap(
            lambda zc: jnp.sum(self.bijector.forward_log_det(zc)),
            in_axes=1,
        )(z)
        out = self.base.logpdf(z) - ld
        # outside the bijector's support the inverse is NaN or ±inf and
        # the arithmetic above yields NaN (e.g. inf − inf at a boundary);
        # the correct density there is 0 — report -inf, never NaN
        out = jnp.where(jnp.isnan(out), -jnp.inf, out)
        return out[0] if single else out
