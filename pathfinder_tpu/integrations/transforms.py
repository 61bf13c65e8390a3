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
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from pathfinder_tpu.models.protocol import LogDensity

__all__ = ["Identity", "Exp", "Interval", "Stacked", "TransformedLogDensity"]


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
class Stacked(Bijector):
    """Apply per-block bijectors along the parameter vector:
    ``blocks = [(bijector, size), ...]`` in order."""

    blocks: Tuple[Tuple[Bijector, int], ...]

    def __post_init__(self):
        object.__setattr__(self, "blocks", tuple(self.blocks))

    def _split(self, v):
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

    def __hash__(self):
        return hash((self.logp_constrained, self.bijector, self.dim))

    @functools.cached_property
    def unconstrained(self) -> LogDensity:
        # cached: a fresh closure per access would defeat the jit cache of
        # pathfinder_core (LogDensity hashes by its logp callable)
        b = self.bijector
        lp = self.logp_constrained

        def logp(z):
            return lp(b.forward(z)) + jnp.sum(b.forward_log_det(z))

        return LogDensity(logp=logp, dim=self.dim)

    def forward_draws(self, draws_zd: jax.Array) -> jax.Array:
        """Map draws ``(dim, ndraws)`` from unconstrained to constrained."""
        return jax.vmap(self.bijector.forward, in_axes=1, out_axes=1)(draws_zd)

    def inverse_point(self, x: jax.Array) -> jax.Array:
        return self.bijector.inverse(x)
