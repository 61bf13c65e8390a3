"""Wolfe-condition line search as a fixed-budget ``lax.while_loop``.

Plays the role of the reference's ``LineSearches.HagerZhang`` +
``InitialHagerZhang`` defaults (``src/Pathfinder.jl:25-35``). Exact
Hager-Zhang trajectory parity is impossible and not required (SURVEY §7);
what matters is that accepted steps satisfy the (strong) Wolfe conditions so
the L-BFGS curvature pairs are high quality. We implement the classic
bracket + zoom scheme (Nocedal & Wright, Algorithms 3.5/3.6) with cubic
interpolation, a bounded evaluation budget, and non-finite-objective
backtracking (the jit-safe analog of the reference's NaN/Inf handling,
``src/optimize.jl:103-105``).

Everything is a single ``lax.while_loop`` over a scalar state machine —
data-dependent iteration counts are expressed as masked fixed-budget control
flow, never Python control flow, so the search can sit inside a ``scan`` /
``vmap`` / ``shard_map`` tower.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "wolfe_line_search",
    "backtracking_line_search",
    "LineSearchResult",
    "initial_step_size",
]

# stages of the state machine
_BRACKET = 0
_ZOOM = 1
_DONE = 2


class LineSearchResult(NamedTuple):
    step_size: jax.Array  # () accepted step (0 means failure / no progress)
    f: jax.Array  # () objective at accepted point
    g: jax.Array  # (d,) gradient at accepted point
    num_evals: jax.Array  # () value_and_grad evaluations used
    ok: jax.Array  # () bool: made finite progress with sufficient decrease


class _State(NamedTuple):
    stage: jax.Array
    it: jax.Array
    nev: jax.Array
    # bracketing
    a_prev: jax.Array
    phi_prev: jax.Array
    dphi_prev: jax.Array
    a_cur: jax.Array
    # zoom interval: lo always satisfies sufficient decrease
    a_lo: jax.Array
    phi_lo: jax.Array
    dphi_lo: jax.Array
    g_lo: jax.Array
    a_hi: jax.Array
    phi_hi: jax.Array
    dphi_hi: jax.Array
    # accepted point
    a_acc: jax.Array
    phi_acc: jax.Array
    g_acc: jax.Array
    accepted: jax.Array


def _cubic_min(a, fa, dfa, b, fb, dfb):
    """Minimizer of the cubic interpolant on [a, b] (N&W eq. 3.59)."""
    d1 = dfa + dfb - 3.0 * (fa - fb) / (a - b)
    under = d1 * d1 - dfa * dfb
    d2 = jnp.sqrt(jnp.maximum(under, 0.0)) * jnp.sign(b - a)
    denom = dfb - dfa + 2.0 * d2
    cand = b - (b - a) * (dfb + d2 - d1) / denom
    ok = (under >= 0) & jnp.isfinite(cand) & (jnp.abs(denom) > 1e-32)
    mid = 0.5 * (a + b)
    return jnp.where(ok, cand, mid)


def initial_step_size(x0, f0, g0, psi0=0.01):
    """First-iteration step guess (the reference's ``InitialHagerZhang`` I0
    rule; later iterations use the natural quasi-Newton step 1)."""
    xinf = jnp.max(jnp.abs(x0))
    ginf = jnp.max(jnp.abs(g0))
    gnormsq = jnp.sum(g0 * g0)
    a_x = psi0 * xinf / jnp.maximum(ginf, 1e-32)
    a_f = psi0 * jnp.abs(f0) / jnp.maximum(gnormsq, 1e-32)
    one = jnp.ones_like(f0)
    a = jnp.where(xinf > 0, a_x, jnp.where(jnp.abs(f0) > 0, a_f, one))
    return jnp.where(jnp.isfinite(a) & (a > 0), a, one)


def backtracking_line_search(
    value_and_grad: Callable,
    x: jax.Array,
    f0: jax.Array,
    g0: jax.Array,
    direction: jax.Array,
    alpha0: jax.Array,
    c1: float = 1e-4,
    c2: float = 0.9,  # unused; signature parity with wolfe_line_search
    max_evals: int = 12,
    shrink: float = 0.5,
) -> LineSearchResult:
    """Armijo backtracking (SURVEY §7's simple fallback variant): halve the
    step until sufficient decrease holds. Cheaper per step than the Wolfe
    search but accepted steps may violate the curvature condition, so more
    BFGS updates get rejected by the positive-definiteness guard — exactly
    the trade the reference makes when run with non-Wolfe optimizers
    (``test/optimize.jl:104-135``)."""
    dtype = x.dtype
    p = direction
    dphi0 = jnp.vdot(g0, p).astype(dtype)

    def phi(a):
        fa, ga = value_and_grad(x + a * p)
        return fa.astype(dtype), ga.astype(dtype)

    def cond(s):
        a, fa, ga, nev, done = s
        return (~done) & (nev < max_evals)

    def body(s):
        a, _, _, nev, _ = s
        fa, ga = phi(a)
        ok = jnp.isfinite(fa) & (fa <= f0 + c1 * a * dphi0)
        a_next = jnp.where(ok, a, a * shrink)
        return (a_next, fa, ga, nev + 1, ok)

    a0 = jnp.asarray(alpha0, dtype)
    init = (a0, f0, g0, jnp.asarray(0), jnp.asarray(False))
    a, fa, ga, nev, ok = lax.while_loop(cond, body, init)
    return LineSearchResult(
        step_size=jnp.where(ok, a, 0.0),
        f=jnp.where(ok, fa, f0),
        g=jnp.where(ok, ga, g0),
        num_evals=nev,
        ok=ok,
    )


def wolfe_line_search(
    value_and_grad: Callable,
    x: jax.Array,
    f0: jax.Array,
    g0: jax.Array,
    direction: jax.Array,
    alpha0: jax.Array,
    c1: float = 1e-4,
    c2: float = 0.9,
    max_evals: int = 12,
    expand: float = 2.0,
) -> LineSearchResult:
    """Find ``a`` with ``f(x + a p) ≤ f0 + c1·a·p·g0`` and ``|p·g(x+ap)| ≤
    −c2·p·g0`` (strong Wolfe), within ``max_evals`` objective evaluations.

    ``value_and_grad`` must return ``(f, g)`` of the *minimization* objective.
    Non-finite trial values trigger geometric backtracking toward the last
    finite point, so the search is safe on densities with bounded support.
    """
    dtype = x.dtype
    p = direction
    dphi0 = jnp.vdot(g0, p).astype(dtype)
    zero = jnp.zeros((), dtype)

    def phi(a):
        fa, ga = value_and_grad(x + a * p)
        # cast to the state dtype: user targets may compute in higher
        # precision (e.g. f64 constants) than the optimization state
        ga = ga.astype(dtype)
        return fa.astype(dtype), ga, jnp.vdot(ga, p).astype(dtype)

    init = _State(
        stage=jnp.asarray(_BRACKET),
        it=jnp.asarray(0),
        nev=jnp.asarray(0),
        a_prev=zero,
        phi_prev=f0,
        dphi_prev=dphi0,
        a_cur=jnp.asarray(alpha0, dtype),
        a_lo=zero,
        phi_lo=f0,
        dphi_lo=dphi0,
        g_lo=g0,
        a_hi=zero,
        phi_hi=f0,
        dphi_hi=dphi0,
        a_acc=zero,
        phi_acc=f0,
        g_acc=g0,
        accepted=jnp.asarray(False),
    )

    def suff_decrease(a, phi_a):
        return phi_a <= f0 + c1 * a * dphi0

    def curvature_ok(dphi_a):
        return jnp.abs(dphi_a) <= -c2 * dphi0

    def cond(s: _State):
        return (s.stage != _DONE) & (s.nev < max_evals)

    def body(s: _State) -> _State:
        # One flag-driven pass instead of lax.switch over whole-state
        # branches: under vmap every switch branch executes anyway, and each
        # branch rebuilding the full state costs ~5× the kernels of a single
        # jointly-selected update (the optimizer loop is kernel-count bound).
        in_bracket = s.stage == _BRACKET
        # evaluation point: bracket evaluates a_cur; zoom evaluates the
        # safeguarded cubic minimizer of [lo, hi]
        width = jnp.abs(s.a_hi - s.a_lo)
        a_cub = _cubic_min(
            s.a_lo, s.phi_lo, s.dphi_lo, s.a_hi, s.phi_hi, s.dphi_hi
        )
        lo_b = jnp.minimum(s.a_lo, s.a_hi) + 0.1 * width
        hi_b = jnp.maximum(s.a_lo, s.a_hi) - 0.1 * width
        a = jnp.where(in_bracket, s.a_cur, jnp.clip(a_cub, lo_b, hi_b))

        phi_a, g_a, dphi_a = phi(a)
        nev = s.nev + 1
        bad = ~(jnp.isfinite(phi_a) & jnp.isfinite(dphi_a))
        suff = suff_decrease(a, phi_a)
        curv = curvature_ok(dphi_a)

        # bracket classification (N&W 3.5)
        br_zoom_hi = (~bad) & ((~suff) | ((s.it > 0) & (phi_a >= s.phi_prev)))
        br_accept = (~bad) & ~br_zoom_hi & curv
        br_zoom_lo = (~bad) & ~br_zoom_hi & ~br_accept & (dphi_a >= 0)
        br_expand = (~bad) & ~br_zoom_hi & ~br_accept & ~br_zoom_lo
        # zoom classification (N&W 3.6)
        zm_shrink = bad | (~suff) | (phi_a >= s.phi_lo)
        zm_accept = (~zm_shrink) & curv
        zm_move_lo = (~zm_shrink) & ~zm_accept
        flip = zm_move_lo & (dphi_a * (s.a_hi - s.a_lo) >= 0)

        accept = jnp.where(in_bracket, br_accept, zm_accept)
        b = in_bracket

        # lo triple: bracket keeps lo in sync with a_prev (expand / zoom_lo
        # set it to the evaluated point); zoom moves lo on zm_move_lo
        set_lo = jnp.where(b, br_expand | br_zoom_lo, zm_move_lo)
        a_lo = jnp.where(set_lo, a, jnp.where(b & br_zoom_hi, s.a_prev, s.a_lo))
        phi_lo = jnp.where(set_lo, phi_a, jnp.where(b & br_zoom_hi, s.phi_prev, s.phi_lo))
        dphi_lo = jnp.where(set_lo, dphi_a, jnp.where(b & br_zoom_hi, s.dphi_prev, s.dphi_lo))
        g_lo = jnp.where(set_lo, g_a, s.g_lo)

        # hi triple
        set_hi_a = jnp.where(b, br_zoom_hi, zm_shrink & ~bad)
        a_hi = jnp.where(
            jnp.where(b, br_zoom_hi, zm_shrink), a,
            jnp.where(b & br_zoom_lo, s.a_prev, jnp.where(flip, s.a_lo, s.a_hi)),
        )
        phi_hi = jnp.where(
            set_hi_a, phi_a,
            jnp.where(b & br_zoom_lo, s.phi_prev, jnp.where(flip, s.phi_lo, s.phi_hi)),
        )
        dphi_hi = jnp.where(
            set_hi_a, dphi_a,
            jnp.where(b & br_zoom_lo, s.dphi_prev, jnp.where(flip, s.dphi_lo, s.dphi_hi)),
        )

        # prev triple (bracket bookkeeping on expand)
        upd_prev = b & br_expand
        a_prev = jnp.where(upd_prev, a, s.a_prev)
        phi_prev = jnp.where(upd_prev, phi_a, s.phi_prev)
        dphi_prev = jnp.where(upd_prev, dphi_a, s.dphi_prev)

        # next bracket trial: backtrack on bad, expand otherwise
        a_cur = jnp.where(
            b & bad, s.a_prev + 0.3 * (a - s.a_prev), jnp.where(upd_prev, a * expand, s.a_cur)
        )

        to_zoom = b & (br_zoom_hi | br_zoom_lo)
        stage = jnp.where(
            accept, _DONE, jnp.where(to_zoom, _ZOOM, s.stage)
        )

        return _State(
            stage=stage,
            it=s.it + 1,
            nev=nev,
            a_prev=a_prev,
            phi_prev=phi_prev,
            dphi_prev=dphi_prev,
            a_cur=a_cur,
            a_lo=a_lo,
            phi_lo=phi_lo,
            dphi_lo=dphi_lo,
            g_lo=g_lo,
            a_hi=a_hi,
            phi_hi=phi_hi,
            dphi_hi=dphi_hi,
            a_acc=jnp.where(accept, a, s.a_acc),
            phi_acc=jnp.where(accept, phi_a, s.phi_acc),
            g_acc=jnp.where(accept[None] if accept.ndim else accept, g_a, s.g_acc),
            accepted=s.accepted | accept,
        )

    final = lax.while_loop(cond, body, init)

    # Exhausted budget: fall back to the best sufficient-decrease point (a_lo).
    fallback_ok = (final.a_lo > 0) & jnp.isfinite(final.phi_lo) & (final.phi_lo < f0)
    a = jnp.where(final.accepted, final.a_acc, jnp.where(fallback_ok, final.a_lo, 0.0))
    f = jnp.where(final.accepted, final.phi_acc, jnp.where(fallback_ok, final.phi_lo, f0))
    g = jnp.where(final.accepted, final.g_acc, jnp.where(fallback_ok, final.g_lo, g0))
    ok = final.accepted | fallback_ok
    return LineSearchResult(step_size=a, f=f, g=g, num_evals=final.nev, ok=ok)
