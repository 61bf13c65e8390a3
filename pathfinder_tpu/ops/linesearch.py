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

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "hager_zhang_line_search",
    "more_thuente_line_search",
    "wolfe_line_search",
    "backtracking_line_search",
    "LineSearchResult",
    "initial_step_size",
    "resolve_line_search",
]


def resolve_line_search(name: str):
    """The shared name → search-function dispatch of the three trajectory
    drivers (lbfgs / cg / bfgs). Their stopping/abort semantics are
    documented-identical; one mapping keeps the option set from drifting
    between copies."""
    table = {
        "hager_zhang": hager_zhang_line_search,
        "more_thuente": more_thuente_line_search,
        "wolfe": wolfe_line_search,
        "backtracking": backtracking_line_search,
    }
    if name not in table:
        raise ValueError(f"unknown line_search {name!r}")
    return table[name]

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
    # () bool: budget ran out and the fallback point was used instead of a
    # point satisfying the (approximate) Wolfe conditions — surfaced per
    # trajectory as OptimizationTrace.num_ls_exhausted
    exhausted: jax.Array = False


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



def resolve_c1(c1, line_search: str) -> float:
    """Per-search sufficient-decrease default: ``None`` maps to the
    canonical constant of each algorithm — Hager-Zhang's δ = 0.1 (the
    reference's ``LineSearches.HagerZhang()`` default; δ also sets the
    approximate-Wolfe band ``φ' ≤ (2δ−1)φ'(0)``, which 1e-4 would widen to
    accept near-full-slope overshoots) and the Armijo constant 1e-4 for
    the strong-Wolfe / Moré-Thuente / backtracking family."""
    if c1 is not None:
        return c1  # pass through unchanged (may be a traced scalar)
    return 0.1 if line_search == "hager_zhang" else 1e-4

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


# Hager-Zhang stage machine
_HZ_BRACKET = 0  # expansion phase (HZ "bracket")
_HZ_U3 = 1  # inner bisection of update rule U3
_HZ_SECANT1 = 2  # first secant of secant²
_HZ_SECANT2 = 3  # second secant of secant²
_HZ_BISECT_G = 4  # γ-safeguard bisection
_HZ_DONE = 5


class _HZState(NamedTuple):
    stage: jax.Array
    nev: jax.Array
    c: jax.Array  # next evaluation point
    # low endpoint (invariant: φ(a) ≤ φ0 + εk, φ'(a) < 0)
    a: jax.Array
    phi_a: jax.Array
    dphi_a: jax.Array
    g_a: jax.Array
    # high endpoint (invariant once bracketed: φ'(b) ≥ 0 or φ(b) > φ0 + εk)
    b: jax.Array
    phi_b: jax.Array
    dphi_b: jax.Array
    # endpoints saved at entry to SECANT1 (for secant² + the γ rule)
    a0: jax.Array
    b0: jax.Array
    phi_a0: jax.Array
    dphi_a0: jax.Array
    phi_b0: jax.Array
    dphi_b0: jax.Array
    # accepted point
    a_acc: jax.Array
    phi_acc: jax.Array
    g_acc: jax.Array
    accepted: jax.Array


def _secant(a, dphi_a, b, dphi_b):
    """Secant step for φ': root of the linear interpolant of φ' on [a, b]."""
    denom = dphi_b - dphi_a
    c = (a * dphi_b - b * dphi_a) / denom
    ok = jnp.isfinite(c) & (jnp.abs(denom) > 1e-32)
    return jnp.where(ok, c, 0.5 * (a + b))


def hager_zhang_line_search(
    value_and_grad: Callable,
    x: jax.Array,
    f0: jax.Array,
    g0: jax.Array,
    direction: jax.Array,
    alpha0: jax.Array,
    c1: float = 0.1,
    c2: float = 0.9,
    max_evals: int = 12,
    expand: float = 5.0,
    epsilon: float = 1e-6,
    gamma: float = 0.66,
    theta: float = 0.5,
) -> LineSearchResult:
    """Hager-Zhang line search (Hager & Zhang 2005, "Algorithm 851:
    CG_DESCENT"; the reference's default via ``LineSearches.HagerZhang``,
    ``src/Pathfinder.jl:25-35``), as a one-evaluation-per-iteration
    ``lax.while_loop`` state machine.

    Accepts ``a`` satisfying either the standard (weak) Wolfe conditions

        φ(a) ≤ φ(0) + δ·a·φ'(0)   and   φ'(a) ≥ σ·φ'(0)

    or the *approximate Wolfe* conditions (HZ eq. 4.1; immune to the
    floating-point noise floor of φ near the minimizer that defeats the
    sufficient-decrease test)

        (2δ−1)·φ'(0) ≥ φ'(a) ≥ σ·φ'(0)   when   φ(a) ≤ φ(0) + ε·|φ(0)|

    with δ=``c1`` (HZ default 0.1), σ=``c2`` (0.9). Interval management is
    HZ's: expansion by ρ=``expand`` (5.0) until a sign change of φ' brackets
    a minimizer, the U3 inner bisection for high-value/negative-slope
    points, repeated *secant²* double-secant steps, and a γ-rule bisection
    whenever an update fails to shrink the bracket by the factor γ=0.66.
    Non-finite trial values backtrack geometrically toward the low endpoint
    (matching the reference's NaN/Inf handling, ``src/optimize.jl:103-105``).

    ``value_and_grad`` is the *minimization* objective. Exhausted budgets
    fall back to the best sufficient-decrease point seen (flagged via
    ``exhausted``).
    """
    dtype = x.dtype
    p = direction
    dphi0 = jnp.vdot(g0, p).astype(dtype)
    zero = jnp.zeros((), dtype)
    eps_k = epsilon * jnp.abs(f0)
    delta, sigma = c1, c2

    def phi(a):
        fa, ga = value_and_grad(x + a * p)
        ga = ga.astype(dtype)
        return fa.astype(dtype), ga, jnp.vdot(ga, p).astype(dtype)

    init = _HZState(
        stage=jnp.asarray(_HZ_BRACKET),
        nev=jnp.asarray(0),
        c=jnp.asarray(alpha0, dtype),
        a=zero,
        phi_a=f0,
        dphi_a=dphi0,
        g_a=g0,
        b=zero,
        phi_b=f0,
        dphi_b=dphi0,
        a0=zero,
        b0=zero,
        phi_a0=f0,
        dphi_a0=dphi0,
        phi_b0=f0,
        dphi_b0=dphi0,
        a_acc=zero,
        phi_acc=f0,
        g_acc=g0,
        accepted=jnp.asarray(False),
    )

    def cond(s: _HZState):
        return (s.stage != _HZ_DONE) & (s.nev < max_evals)

    def body(s: _HZState) -> _HZState:
        c = s.c
        phi_c, g_c, dphi_c = phi(c)
        nev = s.nev + 1
        bad = ~(jnp.isfinite(phi_c) & jnp.isfinite(dphi_c))

        # acceptance: standard weak Wolfe OR approximate Wolfe (HZ eq. 4.1)
        wolfe = (phi_c <= f0 + delta * c * dphi0) & (dphi_c >= sigma * dphi0)
        approx = (
            (phi_c <= f0 + eps_k)
            & (dphi_c >= sigma * dphi0)
            & (dphi_c <= (2.0 * delta - 1.0) * dphi0)
        )
        accept = (~bad) & (c > 0) & (wolfe | approx)

        # interval update classification (HZ update rules U1-U3 entry)
        upd_b = (~bad) & (dphi_c >= 0)  # c is a valid high endpoint
        upd_a = (~bad) & (~upd_b) & (phi_c <= f0 + eps_k)  # valid low endpoint
        upd_u3 = (~bad) & (~upd_b) & (~upd_a)  # high value, negative slope

        in_bracket = s.stage == _HZ_BRACKET
        in_u3 = s.stage == _HZ_U3
        in_sec1 = s.stage == _HZ_SECANT1
        in_sec2 = (s.stage == _HZ_SECANT2) | (s.stage == _HZ_BISECT_G)

        # --- new interval [a, b] -------------------------------------------
        # a moves to c on upd_a (all stages); b moves to c on upd_b and on
        # upd_u3 (U3 shrinks [a, c], so c becomes the high endpoint)
        new_a = jnp.where(upd_a, c, s.a)
        new_phi_a = jnp.where(upd_a, phi_c, s.phi_a)
        new_dphi_a = jnp.where(upd_a, dphi_c, s.dphi_a)
        new_g_a = jnp.where(upd_a, g_c, s.g_a)
        move_b = upd_b | upd_u3
        new_b = jnp.where(move_b, c, s.b)
        new_phi_b = jnp.where(move_b, phi_c, s.phi_b)
        new_dphi_b = jnp.where(move_b, dphi_c, s.dphi_b)

        # --- successor stage ------------------------------------------------
        # BRACKET: upd_b → bracketed, go secant; upd_a → keep expanding;
        #          upd_u3 → U3 bisection on [a, c]
        # U3:      exits to secant only when a true high endpoint (dφ ≥ 0)
        #          appears (upd_b); otherwise keeps bisecting
        # SECANT1: interval updated → SECANT2 (second secant); upd_u3 → U3
        # SECANT2/BISECT_G: γ rule decides SECANT1 vs BISECT_G; upd_u3 → U3
        bracketed = in_bracket & upd_b
        width_new = jnp.abs(new_b - new_a)
        gamma_ok = width_new <= gamma * jnp.abs(s.b0 - s.a0)
        stage_next = jnp.where(
            bad,
            s.stage,  # retry same stage at a backtracked point
            jnp.where(
                in_bracket,
                jnp.where(upd_b, _HZ_SECANT1, jnp.where(upd_a, _HZ_BRACKET, _HZ_U3)),
                jnp.where(
                    in_u3,
                    jnp.where(upd_b, _HZ_SECANT1, _HZ_U3),
                    jnp.where(
                        upd_u3,
                        _HZ_U3,
                        jnp.where(
                            in_sec1,
                            _HZ_SECANT2,
                            jnp.where(gamma_ok, _HZ_SECANT1, _HZ_BISECT_G),
                        ),
                    ),
                ),
            ),
        )
        stage_next = jnp.where(accept, _HZ_DONE, stage_next)

        # --- next evaluation point -----------------------------------------
        mid = new_a + theta * (new_b - new_a)
        sec = _secant(new_a, new_dphi_a, new_b, new_dphi_b)
        # secant² second step: the side that moved defines the secant pair
        # (old endpoint, new endpoint) — HZ steps S2/S3
        sec2 = jnp.where(
            upd_b,
            _secant(s.b0, s.dphi_b0, new_b, new_dphi_b),
            _secant(s.a0, s.dphi_a0, new_a, new_dphi_a),
        )
        inside = lambda t: (t > jnp.minimum(new_a, new_b)) & (
            t < jnp.maximum(new_a, new_b)
        )
        sec_safe = jnp.where(inside(sec), sec, mid)
        sec2_safe = jnp.where(inside(sec2), sec2, mid)
        c_next = jnp.where(
            bad,
            s.a + 0.3 * (c - s.a),  # backtrack toward the low endpoint
            jnp.where(
                stage_next == _HZ_BRACKET,
                c * expand,
                jnp.where(
                    stage_next == _HZ_U3,
                    mid,
                    jnp.where(
                        stage_next == _HZ_SECANT2,
                        sec2_safe,
                        jnp.where(stage_next == _HZ_BISECT_G, mid, sec_safe),
                    ),
                ),
            ),
        )

        # snapshot the interval at entry to a secant² cycle
        enter_sec1 = (stage_next == _HZ_SECANT1) & ~in_sec1
        a0 = jnp.where(enter_sec1, new_a, s.a0)
        b0 = jnp.where(enter_sec1, new_b, s.b0)
        phi_a0 = jnp.where(enter_sec1, new_phi_a, s.phi_a0)
        dphi_a0 = jnp.where(enter_sec1, new_dphi_a, s.dphi_a0)
        phi_b0 = jnp.where(enter_sec1, new_phi_b, s.phi_b0)
        dphi_b0 = jnp.where(enter_sec1, new_dphi_b, s.dphi_b0)
        # ... and refresh it when a full secant² cycle restarts
        restart = in_sec2 & (stage_next == _HZ_SECANT1)
        a0 = jnp.where(restart, new_a, a0)
        b0 = jnp.where(restart, new_b, b0)
        phi_a0 = jnp.where(restart, new_phi_a, phi_a0)
        dphi_a0 = jnp.where(restart, new_dphi_a, dphi_a0)
        phi_b0 = jnp.where(restart, new_phi_b, phi_b0)
        dphi_b0 = jnp.where(restart, new_dphi_b, dphi_b0)

        return _HZState(
            stage=stage_next,
            nev=nev,
            c=c_next,
            a=new_a,
            phi_a=new_phi_a,
            dphi_a=new_dphi_a,
            g_a=new_g_a,
            b=new_b,
            phi_b=new_phi_b,
            dphi_b=new_dphi_b,
            a0=a0,
            b0=b0,
            phi_a0=phi_a0,
            dphi_a0=dphi_a0,
            phi_b0=phi_b0,
            dphi_b0=dphi_b0,
            a_acc=jnp.where(accept, c, s.a_acc),
            phi_acc=jnp.where(accept, phi_c, s.phi_acc),
            g_acc=jnp.where(accept, g_c, s.g_acc),
            accepted=s.accepted | accept,
        )

    final = lax.while_loop(cond, body, init)

    # exhausted budget: fall back to the low endpoint, which by invariant
    # satisfies φ(a) ≤ φ0 + εk with φ'(a) < 0 — require strict decrease so
    # the caller's progress accounting stays sound
    fallback_ok = (
        (final.a > 0) & jnp.isfinite(final.phi_a) & (final.phi_a < f0)
    )
    a = jnp.where(final.accepted, final.a_acc, jnp.where(fallback_ok, final.a, 0.0))
    f = jnp.where(final.accepted, final.phi_acc, jnp.where(fallback_ok, final.phi_a, f0))
    g = jnp.where(final.accepted, final.g_acc, jnp.where(fallback_ok, final.g_a, g0))
    ok = final.accepted | fallback_ok
    return LineSearchResult(
        step_size=a, f=f, g=g, num_evals=final.nev, ok=ok,
        exhausted=fallback_ok & ~final.accepted,
    )


def _mt_cubic_quad(stx, fx, dx, stp, fp, dp, clamp_disc):
    """Shared pieces of the MINPACK ``dcstep`` interpolants between the
    points ``stx`` and ``stp``: (cubic minimizer ingredients γ, p, q) with
    the discriminant clamped to ≥ 0 when ``clamp_disc`` (case 3's possibly
    minimizer-free cubic)."""
    # guard the (stp - stx) denominator: a trial landing exactly on stx
    # (e.g. both clipped to alpha_min) must not poison the interpolants
    # with inf/NaN — the safeguarded caller then just bisects
    dstep = stp - stx
    dstep = jnp.where(jnp.abs(dstep) > 0, dstep, 1e-32)
    theta = 3.0 * (fx - fp) / dstep + dx + dp
    s = jnp.maximum(jnp.maximum(jnp.abs(theta), jnp.abs(dx)), jnp.abs(dp))
    s = jnp.maximum(s, 1e-32)
    disc = (theta / s) ** 2 - (dx / s) * (dp / s)
    if clamp_disc:
        disc = jnp.maximum(disc, 0.0)
    gamma = s * jnp.sqrt(jnp.maximum(disc, 0.0))
    return theta, gamma


class _MTState(NamedTuple):
    nev: jax.Array
    stp: jax.Array  # current trial step
    brackt: jax.Array  # bool: minimizer bracketed in [stx, sty]
    stage1: jax.Array  # bool: still using the modified function ψ
    # best point so far (satisfies sufficient decrease of ψ/φ)
    stx: jax.Array
    fx: jax.Array
    dx: jax.Array
    g_x: jax.Array  # (d,) gradient vector at stx
    # other interval endpoint
    sty: jax.Array
    fy: jax.Array
    dy: jax.Array
    # bisection safeguard widths
    width: jax.Array
    width1: jax.Array
    # accepted point
    a_acc: jax.Array
    phi_acc: jax.Array
    g_acc: jax.Array
    accepted: jax.Array


def _dcstep(stx, fx, dx, sty, fy, dy, stp, fp, dp, brackt, stmin, stmax):
    """MINPACK-2 ``dcstep`` (Moré & Thuente 1994 §4): given the best point
    ``stx``, endpoint ``sty``, and a new trial ``stp`` with values/derivatives
    of the (possibly modified) objective, compute the next trial step via
    safeguarded cubic/quadratic interpolation and update the interval.

    All four cases are evaluated branchlessly and selected with ``where`` —
    scalars only, so the cost is negligible next to the ``value_and_grad``
    call. Returns ``(stx, fx, dx, sty, fy, dy, stp_next, brackt, moved_x)``
    where ``moved_x`` flags that the best point moved to ``stp`` (the caller
    must then save the gradient vector)."""
    sgnd = dp * jnp.sign(dx)

    # --- case 1: higher function value — minimum bracketed ----------------
    theta1, gamma1 = _mt_cubic_quad(stx, fx, dx, stp, fp, dp, clamp_disc=False)
    gamma1 = jnp.where(stp < stx, -gamma1, gamma1)
    p1 = (gamma1 - dx) + theta1
    q1 = ((gamma1 - dx) + gamma1) + dp
    r1 = p1 / jnp.where(jnp.abs(q1) > 0, q1, 1e-32)
    stpc1 = stx + r1 * (stp - stx)
    dstep1 = jnp.where(jnp.abs(stp - stx) > 0, stp - stx, 1e-32)
    denq1 = (fx - fp) / dstep1 + dx
    stpq1 = stx + (dx / jnp.where(jnp.abs(denq1) > 0, denq1, 1e-32)) / 2.0 * (
        stp - stx
    )
    case1_step = jnp.where(
        jnp.abs(stpc1 - stx) < jnp.abs(stpq1 - stx),
        stpc1,
        stpc1 + (stpq1 - stpc1) / 2.0,
    )

    # --- case 2: lower value, derivatives of opposite sign — bracketed ----
    theta2, gamma2 = _mt_cubic_quad(stp, fp, dp, stx, fx, dx, clamp_disc=False)
    gamma2 = jnp.where(stp > stx, -gamma2, gamma2)
    p2 = (gamma2 - dp) + theta2
    q2 = ((gamma2 - dp) + gamma2) + dx
    r2 = p2 / jnp.where(jnp.abs(q2) > 0, q2, 1e-32)
    stpc2 = stp + r2 * (stx - stp)
    den2 = dp - dx
    stpq2 = stp + (dp / jnp.where(jnp.abs(den2) > 0, den2, 1e-32)) * (stx - stp)
    case2_step = jnp.where(
        jnp.abs(stpc2 - stp) > jnp.abs(stpq2 - stp), stpc2, stpq2
    )

    # --- case 3: lower value, same sign, |dp| < |dx| -----------------------
    theta3, gamma3 = _mt_cubic_quad(stp, fp, dp, stx, fx, dx, clamp_disc=True)
    gamma3 = jnp.where(stp > stx, -gamma3, gamma3)
    p3 = (gamma3 - dp) + theta3
    q3 = (gamma3 + (dx - dp)) + gamma3
    r3 = p3 / jnp.where(jnp.abs(q3) > 0, q3, 1e-32)
    stpc3 = jnp.where(
        (r3 < 0.0) & (gamma3 != 0.0),
        stp + r3 * (stx - stp),
        jnp.where(stp > stx, stmax, stmin),
    )
    stpq3 = stp + (dp / jnp.where(jnp.abs(den2) > 0, den2, 1e-32)) * (stx - stp)
    c3_brackt = jnp.where(
        jnp.abs(stpc3 - stp) < jnp.abs(stpq3 - stp), stpc3, stpq3
    )
    c3_brackt = jnp.where(
        stp > stx,
        jnp.minimum(stp + 0.66 * (sty - stp), c3_brackt),
        jnp.maximum(stp + 0.66 * (sty - stp), c3_brackt),
    )
    c3_free = jnp.clip(
        jnp.where(jnp.abs(stpc3 - stp) > jnp.abs(stpq3 - stp), stpc3, stpq3),
        stmin,
        stmax,
    )
    case3_step = jnp.where(brackt, c3_brackt, c3_free)

    # --- case 4: lower value, same sign, |dp| ≥ |dx| ------------------------
    theta4, gamma4 = _mt_cubic_quad(sty, fy, dy, stp, fp, dp, clamp_disc=False)
    gamma4 = jnp.where(stp > sty, -gamma4, gamma4)
    p4 = (gamma4 - dp) + theta4
    q4 = ((gamma4 - dp) + gamma4) + dy
    r4 = p4 / jnp.where(jnp.abs(q4) > 0, q4, 1e-32)
    stpc4 = stp + r4 * (sty - stp)
    case4_step = jnp.where(
        brackt, stpc4, jnp.where(stp > stx, stmax, stmin)
    )

    is1 = fp > fx
    is2 = (~is1) & (sgnd < 0.0)
    is3 = (~is1) & (~is2) & (jnp.abs(dp) < jnp.abs(dx))
    stpf = jnp.where(
        is1, case1_step, jnp.where(is2, case2_step, jnp.where(is3, case3_step, case4_step))
    )
    brackt_new = brackt | is1 | is2

    # interval update (dcstep epilogue)
    move_y_to_x = (~is1) & (sgnd < 0.0)
    sty_n = jnp.where(is1, stp, jnp.where(move_y_to_x, stx, sty))
    fy_n = jnp.where(is1, fp, jnp.where(move_y_to_x, fx, fy))
    dy_n = jnp.where(is1, dp, jnp.where(move_y_to_x, dx, dy))
    moved_x = ~is1
    stx_n = jnp.where(moved_x, stp, stx)
    fx_n = jnp.where(moved_x, fp, fx)
    dx_n = jnp.where(moved_x, dp, dx)

    stp_next = jnp.clip(stpf, stmin, stmax)
    return stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stp_next, brackt_new, moved_x


def more_thuente_line_search(
    value_and_grad: Callable,
    x: jax.Array,
    f0: jax.Array,
    g0: jax.Array,
    direction: jax.Array,
    alpha0: jax.Array,
    c1: float = 1e-4,
    c2: float = 0.9,
    max_evals: int = 12,
    alpha_min: float = 1e-16,
    alpha_max: float = 65536.0,
    xtrapl: float = 1.1,
    xtrapu: float = 4.0,
) -> LineSearchResult:
    """Moré-Thuente line search (Moré & Thuente 1994, "Line search algorithms
    with guaranteed sufficient decrease"; MINPACK-2 ``dcsrch``/``dcstep``) —
    the alternative to Hager-Zhang that SURVEY §7 names, as the same
    one-evaluation-per-iteration ``lax.while_loop`` shape as the other
    searches here (plays the role of ``LineSearches.MoreThuente`` next to the
    reference's default ``LineSearches.HagerZhang``,
    ``src/Pathfinder.jl:25-35``).

    Finds ``a`` satisfying the strong Wolfe conditions

        φ(a) ≤ φ(0) + c1·a·φ'(0)   and   |φ'(a)| ≤ c2·|φ'(0)|

    via the two-stage scheme: stage 1 applies the interval updates to the
    *modified* function ψ(a) = φ(a) − φ(0) − c1·a·φ'(0) until a point with
    ψ(a) ≤ 0 and φ'(a) ≥ min(c1,c2)·φ'(0) appears, then switches to φ itself;
    trial steps come from the safeguarded cubic/quadratic selection of
    ``dcstep`` with the 0.66-width bisection fallback. Non-finite trial
    values backtrack geometrically toward the best point (the jit-safe analog
    of the reference's NaN/Inf handling, ``src/optimize.jl:103-105``).
    """
    dtype = x.dtype
    p = direction
    dphi0 = jnp.vdot(g0, p).astype(dtype)
    zero = jnp.zeros((), dtype)
    gtest = c1 * dphi0  # slope of the sufficient-decrease line

    def phi(a):
        fa, ga = value_and_grad(x + a * p)
        ga = ga.astype(dtype)
        return fa.astype(dtype), ga, jnp.vdot(ga, p).astype(dtype)

    width0 = jnp.asarray(alpha_max - alpha_min, dtype)
    init = _MTState(
        nev=jnp.asarray(0),
        stp=jnp.clip(jnp.asarray(alpha0, dtype), alpha_min, alpha_max),
        brackt=jnp.asarray(False),
        stage1=jnp.asarray(True),
        stx=zero,
        fx=f0,
        dx=dphi0,
        g_x=g0,
        sty=zero,
        fy=f0,
        dy=dphi0,
        width=width0,
        width1=2.0 * width0,
        a_acc=zero,
        phi_acc=f0,
        g_acc=g0,
        accepted=jnp.asarray(False),
    )

    def cond(s: _MTState):
        return (~s.accepted) & (s.nev < max_evals) & (
            (~s.brackt) | (jnp.abs(s.sty - s.stx) > 1e-12 * jnp.abs(s.stx))
        )

    def body(s: _MTState) -> _MTState:
        fp, g_p, dp = phi(s.stp)
        nev = s.nev + 1
        bad = ~(jnp.isfinite(fp) & jnp.isfinite(dp))

        ftest = f0 + s.stp * gtest
        suff = fp <= ftest
        curv = jnp.abs(dp) <= c2 * jnp.abs(dphi0)
        accept = (~bad) & suff & curv & (s.stp > 0)

        # stage switch: ψ(stp) ≤ 0 and φ'(stp) ≥ min(c1,c2)·φ'(0)
        stage1 = s.stage1 & ~(suff & (dp >= jnp.minimum(c1, c2) * dphi0))

        # interval-of-uncertainty bounds for the next trial
        stmin = jnp.where(
            s.brackt, jnp.minimum(s.stx, s.sty), s.stp + xtrapl * (s.stp - s.stx)
        )
        stmax = jnp.where(
            s.brackt, jnp.maximum(s.stx, s.sty), s.stp + xtrapu * (s.stp - s.stx)
        )

        # modified function ψ in stage 1 while ψ(stp) > 0 and φ(stp) ≤ φ(stx)
        use_mod = stage1 & (fp <= s.fx) & (~suff)
        fm = jnp.where(use_mod, fp - s.stp * gtest, fp)
        fxm = jnp.where(use_mod, s.fx - s.stx * gtest, s.fx)
        fym = jnp.where(use_mod, s.fy - s.sty * gtest, s.fy)
        dm = jnp.where(use_mod, dp - gtest, dp)
        dxm = jnp.where(use_mod, s.dx - gtest, s.dx)
        dym = jnp.where(use_mod, s.dy - gtest, s.dy)

        stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stp_n, brackt_n, moved_x = _dcstep(
            s.stx, fxm, dxm, s.sty, fym, dym, s.stp, fm, dm, s.brackt, stmin, stmax
        )
        # undo the ψ shift on the stored values
        fx_n = jnp.where(use_mod, fx_n + stx_n * gtest, fx_n)
        fy_n = jnp.where(use_mod, fy_n + sty_n * gtest, fy_n)
        dx_n = jnp.where(use_mod, dx_n + gtest, dx_n)
        dy_n = jnp.where(use_mod, dy_n + gtest, dy_n)
        g_x_n = jnp.where(moved_x, g_p, s.g_x)

        # 0.66 bisection safeguard on bracketed intervals
        wid = jnp.abs(sty_n - stx_n)
        force_bisect = brackt_n & (wid >= 0.66 * s.width1)
        stp_n = jnp.where(force_bisect, stx_n + 0.5 * (sty_n - stx_n), stp_n)
        width1_n = jnp.where(brackt_n, s.width, s.width1)
        width_n = jnp.where(brackt_n, wid, s.width)

        stp_n = jnp.clip(stp_n, alpha_min, alpha_max)

        # non-finite trial: discard, backtrack toward the best point
        stp_bad = s.stx + 0.3 * (s.stp - s.stx)
        return _MTState(
            nev=nev,
            stp=jnp.where(bad, stp_bad, stp_n),
            brackt=jnp.where(bad, s.brackt, brackt_n),
            stage1=jnp.where(bad, s.stage1, stage1),
            stx=jnp.where(bad, s.stx, stx_n),
            fx=jnp.where(bad, s.fx, fx_n),
            dx=jnp.where(bad, s.dx, dx_n),
            g_x=jnp.where(bad, s.g_x, g_x_n),
            sty=jnp.where(bad, s.sty, sty_n),
            fy=jnp.where(bad, s.fy, fy_n),
            dy=jnp.where(bad, s.dy, dy_n),
            width=jnp.where(bad, s.width, width_n),
            width1=jnp.where(bad, s.width1, width1_n),
            a_acc=jnp.where(accept, s.stp, s.a_acc),
            phi_acc=jnp.where(accept, fp, s.phi_acc),
            g_acc=jnp.where(accept, g_p, s.g_acc),
            accepted=s.accepted | accept,
        )

    final = lax.while_loop(cond, body, init)

    # exhausted budget: fall back to the best sufficient-decrease point (stx)
    fallback_ok = (
        (final.stx > 0)
        & jnp.isfinite(final.fx)
        & (final.fx < f0)
        & (final.fx <= f0 + final.stx * gtest)
    )
    a = jnp.where(
        final.accepted, final.a_acc, jnp.where(fallback_ok, final.stx, 0.0)
    )
    f = jnp.where(
        final.accepted, final.phi_acc, jnp.where(fallback_ok, final.fx, f0)
    )
    g = jnp.where(final.accepted, final.g_acc, jnp.where(fallback_ok, final.g_x, g0))
    ok = final.accepted | fallback_ok
    return LineSearchResult(
        step_size=a, f=f, g=g, num_evals=final.nev, ok=ok,
        exhausted=fallback_ok & ~final.accepted,
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
        # zoom interval-collapse exit (the Moré-Thuente cond has the
        # analogous |sty-stx| check): once [lo, hi] degenerates to fp
        # resolution the clipped cubic re-evaluates the same point, so
        # every remaining budget eval would be a full wasted
        # value_and_grad at an identical alpha. Threshold is dtype-aware
        # (a few ulps): an absolute 1e-12 would never fire in f32, where
        # a one-ulp interval is ~1e-7 relative.
        collapsed = (s.stage == _ZOOM) & (
            jnp.abs(s.a_hi - s.a_lo)
            <= 4 * jnp.finfo(dtype).eps
            * jnp.maximum(jnp.abs(s.a_lo), jnp.abs(s.a_hi))
        )
        return (s.stage != _DONE) & (s.nev < max_evals) & ~collapsed

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

        # hi triple. A non-finite zoom trial still moves a_hi to the trial
        # point but is recorded as φ=+inf, dφ=0 — a consistent "infinitely
        # high" endpoint: _cubic_min's finiteness guard then degrades to
        # bisection, shrinking the interval toward the support boundary
        # while a_lo keeps the last finite sufficient-decrease point.
        # (Previously a_hi moved while phi_hi/dphi_hi kept the OLD
        # endpoint's values — an inconsistent triple that fed the cubic
        # mismatched data for the rest of the zoom.)
        set_hi_a = jnp.where(b, br_zoom_hi, zm_shrink)
        phi_at_c = jnp.where(bad, jnp.asarray(jnp.inf, dtype), phi_a)
        dphi_at_c = jnp.where(bad, jnp.zeros((), dtype), dphi_a)
        a_hi = jnp.where(
            set_hi_a, a,
            jnp.where(b & br_zoom_lo, s.a_prev, jnp.where(flip, s.a_lo, s.a_hi)),
        )
        phi_hi = jnp.where(
            set_hi_a, phi_at_c,
            jnp.where(b & br_zoom_lo, s.phi_prev, jnp.where(flip, s.phi_lo, s.phi_hi)),
        )
        dphi_hi = jnp.where(
            set_hi_a, dphi_at_c,
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
            g_acc=jnp.where(accept, g_a, s.g_acc),
            accepted=s.accepted | accept,
        )

    final = lax.while_loop(cond, body, init)

    # Exhausted budget: fall back to the best sufficient-decrease point (a_lo).
    fallback_ok = (final.a_lo > 0) & jnp.isfinite(final.phi_lo) & (final.phi_lo < f0)
    a = jnp.where(final.accepted, final.a_acc, jnp.where(fallback_ok, final.a_lo, 0.0))
    f = jnp.where(final.accepted, final.phi_acc, jnp.where(fallback_ok, final.phi_lo, f0))
    g = jnp.where(final.accepted, final.g_acc, jnp.where(fallback_ok, final.g_lo, g0))
    ok = final.accepted | fallback_ok
    return LineSearchResult(
        step_size=a, f=f, g=g, num_evals=final.nev, ok=ok,
        exhausted=fallback_ok & ~final.accepted,
    )
