"""Eval-driven L-BFGS: one batched objective evaluation per loop step.

The classic nesting (outer L-BFGS iterations, inner line-search loop) is
hostile to SPMD batching: under ``vmap``, every outer iteration costs the
*maximum* line-search evaluation count over all lanes, so fast lanes idle in
the inner ``while_loop``. This module flattens the nest into a single
``lax.while_loop`` whose body performs exactly ONE ``value_and_grad``
evaluation for every lane and advances a per-lane state machine:

    phase BRACKET: process the trial point per Nocedal-Wright Alg 3.5 —
        expand, enter ZOOM, or accept;
    phase ZOOM:    Alg 3.6 with safeguarded cubic interpolation;
    on acceptance: curvature-guarded history update (the same recursion as
        ``lbfgs_inverse_hessians``), trace write, new two-loop direction,
        first trial of the next search — all in the same loop step.

Total loop steps = max over lanes of *total evaluations* (typically ~2.2 per
iteration) instead of iterations × max-line-search-evals, with identical
Wolfe-quality steps (verified: identical trajectories and eval counts to the
nested implementation on quadratic/Rosenbrock/NaN-wall tests).

**Measured outcome on TPU v5e** (100 paths × d=1000 hierarchical target):
0.108 s vs the nested implementation's 0.085 s — SLOWER, because the
two-loop direction computation (J sequential gather+dot pairs) must execute
in *every* loop step under SPMD (a ``lax.cond`` would still evaluate both
branches under ``vmap``), and that overhead exceeds the inner-loop slot
waste it removes. Kept as a documented alternative: for targets whose
``logp`` is expensive relative to the two-loop (real posteriors with data),
the eval-driven structure wins; for cheap closed-form targets the nested
structure does. ``pathfinder_core`` uses the nested version by default.

Wolfe-condition semantics match ``pathfinder_tpu.ops.linesearch`` (strong
Wolfe c1/c2, non-finite backtracking, sufficient-decrease fallback on
exhaustion); the external contract is the reference's trace driver
(``optimize_with_trace``, ``src/optimize.jl:35-59``) exactly as in
``minimize_lbfgs_trace``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pathfinder_tpu.ops.lbfgs import (
    OptimizationTrace,
    _two_loop_direction,
    gilbert_init,
)
from pathfinder_tpu.ops.linesearch import _cubic_min, initial_step_size

__all__ = ["minimize_lbfgs_trace_fused"]

_BRACKET = 0
_ZOOM = 1


class _Lane(NamedTuple):
    # accepted point
    it: jax.Array
    x: jax.Array
    f: jax.Array
    g: jax.Array
    # history
    alpha: jax.Array
    S: jax.Array
    Y: jax.Array
    pos: jax.Array
    hlen: jax.Array
    nrej: jax.Array
    # line-search state
    direction: jax.Array
    dphi0: jax.Array
    stage: jax.Array
    ls_evals: jax.Array
    a_prev: jax.Array
    phi_prev: jax.Array
    dphi_prev: jax.Array
    a_lo: jax.Array
    phi_lo: jax.Array
    dphi_lo: jax.Array
    g_lo: jax.Array
    a_hi: jax.Array
    phi_hi: jax.Array
    dphi_hi: jax.Array
    a_trial: jax.Array
    # bookkeeping
    nev: jax.Array
    done: jax.Array
    xs: jax.Array
    fs: jax.Array
    gs: jax.Array


def minimize_lbfgs_trace_fused(
    value_and_grad: Callable,
    x0: jax.Array,
    maxiters: int = 1000,
    history_length: int = 6,
    gtol: float = 1e-8,
    epsilon_curvature: float = 1e-12,
    max_ls_evals: int = 12,
    c1: float = 1e-4,
    c2: float = 0.9,
    fail_on_nonfinite: bool = True,
    progress_every: int = 0,  # accepted for signature parity; not emitted
    line_search: str = "wolfe",  # the eval-driven loop embeds the Wolfe search
) -> OptimizationTrace:
    """Drop-in replacement for ``minimize_lbfgs_trace`` with the eval-driven
    loop structure. Maximizes ``logp``; trace stores the logp view."""
    d = x0.shape[0]
    dtype = x0.dtype
    J = history_length
    # unreachable gradient tolerances in low precision waste a full failed
    # line search at the trajectory end — clamp to the dtype's resolution
    gtol_eff = max(gtol, float(25 * jnp.finfo(dtype).eps))

    def neg_vg(x):
        lp, glp = value_and_grad(x)
        # cast to the state dtype (user targets may compute in higher precision)
        return (-lp).astype(dtype), (-glp).astype(dtype)

    f0, g0 = neg_vg(x0)
    init_ok = jnp.isfinite(f0) & jnp.all(jnp.isfinite(g0))

    xs = jnp.zeros((maxiters + 1, d), dtype).at[0].set(x0)
    fs = jnp.zeros((maxiters + 1,), dtype).at[0].set(-f0)
    gs = jnp.zeros((maxiters + 1, d), dtype).at[0].set(-g0)

    zero = jnp.zeros((), dtype)
    dir0 = -g0  # empty history: steepest descent (alpha = 1)
    dphi0_init = jnp.vdot(g0, dir0)
    a0 = initial_step_size(x0, f0, g0)

    lane = _Lane(
        it=jnp.asarray(0),
        x=x0,
        f=f0,
        g=g0,
        alpha=jnp.ones((d,), dtype),
        S=jnp.zeros((J, d), dtype),
        Y=jnp.zeros((J, d), dtype),
        pos=jnp.asarray(0),
        hlen=jnp.asarray(0),
        nrej=jnp.asarray(0),
        direction=dir0,
        dphi0=dphi0_init,
        stage=jnp.asarray(_BRACKET),
        ls_evals=jnp.asarray(0),
        a_prev=zero,
        phi_prev=f0,
        dphi_prev=dphi0_init,
        a_lo=zero,
        phi_lo=f0,
        dphi_lo=dphi0_init,
        g_lo=g0,
        a_hi=zero,
        phi_hi=f0,
        dphi_hi=dphi0_init,
        a_trial=a0,
        nev=jnp.asarray(1),
        done=~init_ok,
        xs=xs,
        fs=fs,
        gs=gs,
    )

    def suff(a, phi_a, f_base, dphi_base):
        return phi_a <= f_base + c1 * a * dphi_base

    def cond(s: _Lane):
        return ~s.done

    def body(s: _Lane):
        # ---- the one batched evaluation ----------------------------------
        x_t = s.x + s.a_trial * s.direction
        phi_t, g_t = neg_vg(x_t)
        dphi_t = jnp.vdot(g_t, s.direction)
        nev = s.nev + 1
        ls_evals = s.ls_evals + 1
        bad = ~(jnp.isfinite(phi_t) & jnp.isfinite(dphi_t))

        in_bracket = s.stage == _BRACKET

        # ---- bracket-phase classification (N&W 3.5) -----------------------
        br_to_zoom_hi = (~suff(s.a_trial, phi_t, s.f, s.dphi0)) | (
            (ls_evals > 1) & (phi_t >= s.phi_prev)
        )
        wolfe_ok = (jnp.abs(dphi_t) <= -c2 * s.dphi0) & suff(
            s.a_trial, phi_t, s.f, s.dphi0
        )
        br_to_zoom_lo = dphi_t >= 0

        # ---- zoom-phase classification (N&W 3.6) --------------------------
        zm_shrink_hi = bad | (~suff(s.a_trial, phi_t, s.f, s.dphi0)) | (
            phi_t >= s.phi_lo
        )
        zm_accept = (~zm_shrink_hi) & (jnp.abs(dphi_t) <= -c2 * s.dphi0)

        accept_now = jnp.where(in_bracket, (~bad) & wolfe_ok, zm_accept)
        exhausted = ls_evals >= max_ls_evals

        # ---- next line-search state if we do NOT accept -------------------
        # bracket branches
        b_backtrack = bad
        a_bt = s.a_prev + 0.3 * (s.a_trial - s.a_prev)
        # expand: a_prev <- trial, lo <- trial (it satisfies suff decrease)
        a_expand = s.a_trial * 2.0

        # entering zoom: (lo, hi) assignment
        z_lo_from_trial = (~bad) & br_to_zoom_lo & ~br_to_zoom_hi
        new_stage_b = jnp.where(
            bad, _BRACKET, jnp.where(br_to_zoom_hi | br_to_zoom_lo, _ZOOM, _BRACKET)
        )
        # zoom branch: shrink hi or move lo
        flip = dphi_t * (s.a_hi - s.a_lo) >= 0

        def pick(bval, zval):
            return jnp.where(in_bracket, bval, zval)

        # lo triple update
        lo_new_a = pick(
            jnp.where(
                bad,
                s.a_lo,
                jnp.where(br_to_zoom_hi, s.a_prev, s.a_trial),
            ),
            jnp.where(zm_shrink_hi, s.a_lo, s.a_trial),
        )
        lo_new_phi = pick(
            jnp.where(
                bad, s.phi_lo, jnp.where(br_to_zoom_hi, s.phi_prev, phi_t)
            ),
            jnp.where(zm_shrink_hi, s.phi_lo, phi_t),
        )
        lo_new_dphi = pick(
            jnp.where(
                bad, s.dphi_lo, jnp.where(br_to_zoom_hi, s.dphi_prev, dphi_t)
            ),
            jnp.where(zm_shrink_hi, s.dphi_lo, dphi_t),
        )
        lo_keep = pick(bad | br_to_zoom_hi, zm_shrink_hi)
        g_lo_new = jnp.where(lo_keep[None] if lo_keep.ndim else lo_keep, s.g_lo, g_t)

        # hi triple update
        hi_new_a = pick(
            jnp.where(br_to_zoom_hi, s.a_trial, jnp.where(br_to_zoom_lo, s.a_prev, s.a_hi)),
            jnp.where(zm_shrink_hi, s.a_trial, jnp.where(flip, s.a_lo, s.a_hi)),
        )
        hi_new_phi = pick(
            jnp.where(br_to_zoom_hi, phi_t, jnp.where(br_to_zoom_lo, s.phi_prev, s.phi_hi)),
            jnp.where(
                zm_shrink_hi,
                jnp.where(bad, s.phi_hi, phi_t),
                jnp.where(flip, s.phi_lo, s.phi_hi),
            ),
        )
        hi_new_dphi = pick(
            jnp.where(br_to_zoom_hi, dphi_t, jnp.where(br_to_zoom_lo, s.dphi_prev, s.dphi_hi)),
            jnp.where(
                zm_shrink_hi,
                jnp.where(bad, s.dphi_hi, dphi_t),
                jnp.where(flip, s.dphi_lo, s.dphi_hi),
            ),
        )

        new_stage = pick(new_stage_b, jnp.asarray(_ZOOM))

        # next trial point
        width = jnp.abs(hi_new_a - lo_new_a)
        a_cubic = _cubic_min(
            lo_new_a, lo_new_phi, lo_new_dphi, hi_new_a, hi_new_phi, hi_new_dphi
        )
        lo_b = jnp.minimum(lo_new_a, hi_new_a) + 0.1 * width
        hi_b = jnp.maximum(lo_new_a, hi_new_a) - 0.1 * width
        a_zoom = jnp.clip(a_cubic, lo_b, hi_b)
        a_next_b = jnp.where(
            bad, a_bt, jnp.where(new_stage_b == _ZOOM, a_zoom, a_expand)
        )
        a_next = pick(a_next_b, a_zoom)

        # bracket bookkeeping (prev triple) — only when expanding
        expanding = in_bracket & ~bad & ~br_to_zoom_hi & ~br_to_zoom_lo
        a_prev_new = jnp.where(expanding, s.a_trial, s.a_prev)
        phi_prev_new = jnp.where(expanding, phi_t, s.phi_prev)
        dphi_prev_new = jnp.where(expanding, dphi_t, s.dphi_prev)

        # ---- finalize an iteration? ---------------------------------------
        fallback_ok = (lo_new_a > 0) & jnp.isfinite(lo_new_phi) & (
            lo_new_phi < s.f
        )
        finish = accept_now | exhausted
        ls_failed = finish & ~accept_now & ~fallback_ok

        a_acc = jnp.where(accept_now, s.a_trial, lo_new_a)
        f_acc = jnp.where(accept_now, phi_t, lo_new_phi)
        g_acc = jnp.where(accept_now, g_t, g_lo_new)
        x_acc = s.x + a_acc * s.direction

        progress = finish & ~ls_failed
        # curvature-guarded history update (src/inverse_hessian.jl:46-58)
        svec = x_acc - s.x
        yvec = g_acc - s.g
        curv = jnp.vdot(yvec, svec)
        accept_pair = progress & (
            curv > epsilon_curvature * jnp.sum(yvec * yvec)
        )
        write = (s.pos + 1) % J if J > 0 else s.pos
        S = (
            s.S.at[write].set(jnp.where(accept_pair, svec, s.S[write]))
            if J > 0
            else s.S
        )
        Y = (
            s.Y.at[write].set(jnp.where(accept_pair, yvec, s.Y[write]))
            if J > 0
            else s.Y
        )
        pos = jnp.where(accept_pair, write, s.pos)
        hlen = jnp.where(accept_pair, jnp.minimum(s.hlen + 1, J), s.hlen)
        alpha = jnp.where(accept_pair, gilbert_init(s.alpha, svec, yvec), s.alpha)
        nrej = s.nrej + jnp.where(progress & ~accept_pair, 1, 0)

        it_new = jnp.where(progress, s.it + 1, s.it)
        xs = s.xs.at[it_new].set(jnp.where(progress, x_acc, s.xs[it_new]))
        fs = s.fs.at[it_new].set(jnp.where(progress, -f_acc, s.fs[it_new]))
        gs = s.gs.at[it_new].set(jnp.where(progress, -g_acc, s.gs[it_new]))

        converged = jnp.max(jnp.abs(g_acc)) <= gtol_eff
        done = s.done | ls_failed | (progress & converged) | (it_new >= maxiters)

        # ---- new direction + first trial for the next iteration -----------
        new_dir = _two_loop_direction(g_acc, alpha, S, Y, pos, hlen)
        new_dphi0 = jnp.vdot(g_acc, new_dir)
        bad_dir = ~(new_dphi0 < 0)
        new_dir = jnp.where(bad_dir, -alpha * g_acc, new_dir)
        new_dphi0 = jnp.where(bad_dir, jnp.vdot(g_acc, -alpha * g_acc), new_dphi0)

        def sel(fin, a, b):
            # a when finishing the iteration, b when staying in line search
            return jnp.where(fin, a, b)

        x_new = sel(progress, x_acc, s.x)
        f_new = sel(progress, f_acc, s.f)
        g_new = jnp.where(progress, g_acc, s.g)

        one = jnp.ones((), dtype)
        return _Lane(
            it=it_new,
            x=x_new,
            f=f_new,
            g=g_new,
            alpha=jnp.where(progress, alpha, s.alpha),
            S=jnp.where(progress, S, s.S),
            Y=jnp.where(progress, Y, s.Y),
            pos=jnp.where(progress, pos, s.pos),
            hlen=jnp.where(progress, hlen, s.hlen),
            nrej=jnp.where(progress, nrej, s.nrej),
            direction=jnp.where(finish, new_dir, s.direction),
            dphi0=sel(finish, new_dphi0, s.dphi0),
            stage=jnp.where(finish, _BRACKET, new_stage),
            ls_evals=jnp.where(finish, 0, ls_evals),
            a_prev=sel(finish, zero, a_prev_new),
            phi_prev=sel(finish, f_new, phi_prev_new),
            dphi_prev=sel(finish, new_dphi0, dphi_prev_new),
            a_lo=sel(finish, zero, lo_new_a),
            phi_lo=sel(finish, f_new, lo_new_phi),
            dphi_lo=sel(finish, new_dphi0, lo_new_dphi),
            g_lo=jnp.where(finish, g_new, g_lo_new),
            a_hi=sel(finish, zero, hi_new_a),
            phi_hi=sel(finish, f_new, hi_new_phi),
            dphi_hi=sel(finish, new_dphi0, hi_new_dphi),
            a_trial=sel(finish, one, a_next),
            nev=nev,
            done=done,
            xs=xs,
            fs=fs,
            gs=gs,
        )

    final = lax.while_loop(cond, body, lane)
    return OptimizationTrace(
        xs=final.xs,
        log_densities=final.fs,
        gradients=final.gs,
        num_valid=final.it + 1,
        num_bfgs_updates_rejected=final.nrej,
        num_fn_evals=final.nev,
    )
