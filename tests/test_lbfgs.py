"""L-BFGS optimizer + inverse-Hessian reconstruction tests.

Ports the strategy of reference ``test/inverse_hessian.jl`` (explicit
textbook-formula checks including window rotation, and the semantic
direction-cosine property) and ``test/optimize.jl`` (trace correctness and
non-finite abort semantics).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathfinder_tpu.ops.lbfgs import (
    OptimizationTrace,
    gilbert_init,
    history_windows,
    lbfgs_inverse_hessian,
    lbfgs_inverse_hessians,
    minimize_lbfgs_trace,
)
from pathfinder_tpu.ops.linesearch import wolfe_line_search


def explicit_bfgs_inverse_hessian(alpha, S, Y):
    """Naive textbook recursion (reference
    ``lbfgs_inverse_hessian_explicit``, ``test/inverse_hessian.jl:8-14``):
    H = (I − ρ s yᵀ) H (I − ρ y sᵀ) + ρ s sᵀ from H₀ = diag(α), applying the
    window pairs oldest → newest."""
    d = alpha.shape[0]
    H = np.diag(alpha)
    I = np.eye(d)
    for s, y in zip(S, Y):
        rho = 1.0 / (y @ s)
        V = I - rho * np.outer(s, y)
        H = V @ H @ V.T + rho * np.outer(s, s)
    return H


def test_gilbert_init_formula():
    rng = np.random.default_rng(0)
    d = 7
    alpha = rng.uniform(0.5, 2.0, d)
    s = rng.standard_normal(d)
    y = rng.standard_normal(d)
    a = y @ np.diag(alpha) @ y
    b = y @ s
    c = s @ np.diag(1 / alpha) @ s
    expected = b / (a / alpha + y**2 - (a / c) * (s / alpha) ** 2)
    np.testing.assert_allclose(
        gilbert_init(jnp.asarray(alpha), jnp.asarray(s), jnp.asarray(y)),
        expected,
        rtol=1e-12,
    )


@pytest.mark.parametrize("nactive", [0, 1, 3, 5])
def test_inverse_hessian_matches_explicit(nactive):
    """Compact Woodbury form vs textbook recursion, incl. partial windows
    (reference ``test/inverse_hessian.jl:17-43``)."""
    rng = np.random.default_rng(1)
    d, J = 6, 5
    alpha = rng.uniform(0.5, 2.0, d)
    S = np.zeros((J, d))
    Y = np.zeros((J, d))
    mask = np.zeros(J)
    for i in range(nactive):
        s = rng.standard_normal(d)
        y = s * rng.uniform(0.5, 2.0, d) + 0.1 * rng.standard_normal(d)
        if y @ s <= 0:
            y = s  # ensure positive curvature
        S[i], Y[i], mask[i] = s, y, 1.0

    W = lbfgs_inverse_hessian(
        jnp.asarray(alpha), jnp.asarray(S), jnp.asarray(Y), jnp.asarray(mask)
    )
    H_expected = explicit_bfgs_inverse_hessian(alpha, S[:nactive], Y[:nactive])
    np.testing.assert_allclose(W.to_dense(), H_expected, rtol=1e-8, atol=1e-10)
    assert bool(W.is_finite_pd())
    # operator surface works on the reconstructed H
    v = rng.standard_normal(d)
    np.testing.assert_allclose(W.mul(v), H_expected @ v, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        W.logdet(), np.linalg.slogdet(H_expected)[1], rtol=1e-8
    )


def test_history_windows_with_rejections():
    # steps:    0  1  2  3  4  5
    # accepted: y  n  y  y  n  y
    accept = jnp.asarray([True, False, True, True, False, True])
    idx, mask = history_windows(accept, history_length=2)
    idx, mask = np.asarray(idx), np.asarray(mask)
    # point l uses the ≤2 most recent accepted steps among 0..l-1
    assert mask[0].sum() == 0
    assert mask[1].tolist() == [False, True] and idx[1, 1] == 0
    assert mask[2].tolist() == [False, True] and idx[2, 1] == 0
    assert idx[3].tolist() == [0, 2] and mask[3].all()
    assert idx[4].tolist() == [2, 3] and mask[4].all()
    assert idx[5].tolist() == [2, 3] and mask[5].all()
    assert idx[6].tolist() == [3, 5] and mask[6].all()


def _quad_logp(prec_diag):
    prec = jnp.asarray(prec_diag)

    def logp(x):
        return -0.5 * jnp.sum(prec * x * x)

    return logp


def test_minimize_quadratic_converges():
    d = 10
    rng = np.random.default_rng(2)
    prec = rng.uniform(0.5, 3.0, d)
    logp = _quad_logp(prec)
    vg = jax.value_and_grad(logp)
    x0 = jnp.asarray(rng.standard_normal(d))

    trace = jax.jit(
        lambda x: minimize_lbfgs_trace(vg, x, maxiters=100, history_length=6)
    )(x0)
    n = int(trace.num_valid)
    assert 2 <= n <= 101
    np.testing.assert_allclose(trace.xs[0], x0)
    np.testing.assert_allclose(trace.xs[n - 1], np.zeros(d), atol=1e-6)
    # trace stores logp and ∇logp (sign-flipped from minimizer view)
    np.testing.assert_allclose(trace.log_densities[0], logp(x0), rtol=1e-12)
    np.testing.assert_allclose(
        trace.gradients[0], -prec * np.asarray(x0), rtol=1e-10, atol=1e-12
    )
    # log densities non-decreasing along the trajectory (Wolfe decrease)
    lds = np.asarray(trace.log_densities[:n])
    assert np.all(np.diff(lds) > -1e-12)
    assert int(trace.num_bfgs_updates_rejected) == 0


def test_minimize_rosenbrock():
    def logp(x):
        return -(100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2)

    vg = jax.value_and_grad(logp)
    x0 = jnp.asarray([-1.2, 1.0])
    trace = minimize_lbfgs_trace(vg, x0, maxiters=200, history_length=6, gtol=1e-10)
    n = int(trace.num_valid)
    np.testing.assert_allclose(trace.xs[n - 1], [1.0, 1.0], atol=1e-5)


def test_direction_cosine_property():
    """The reconstructed H_l applied to ∇logp_l must be collinear with the
    actual step s_{l+1} (reference ``test/inverse_hessian.jl:63-75``) —
    exactly so here, since optimizer and reconstruction share the window."""
    d = 8
    rng = np.random.default_rng(3)
    Amat = rng.standard_normal((d, d)) / np.sqrt(d)
    prec = Amat @ Amat.T + np.eye(d)

    def logp(x):
        return -0.5 * x @ (jnp.asarray(prec) @ x)

    vg = jax.value_and_grad(logp)
    x0 = jnp.asarray(rng.standard_normal(d) * 3)
    trace = minimize_lbfgs_trace(vg, x0, maxiters=60, history_length=5)
    n = int(trace.num_valid)
    assert n > 3

    fits, mask, nrej = lbfgs_inverse_hessians(trace, history_length=5)
    xs = np.asarray(trace.xs)
    gs = np.asarray(trace.gradients)
    for l in range(n - 1):
        H_l = jax.tree_util.tree_map(lambda leaf: leaf[l], fits)
        step_dir = H_l.mul(jnp.asarray(gs[l]))  # = H ∇logp = −H ∇f
        s_actual = xs[l + 1] - xs[l]
        cos = (step_dir @ s_actual) / (
            np.linalg.norm(step_dir) * np.linalg.norm(s_actual)
        )
        assert cos > 1 - 1e-8, (l, cos)


def test_inverse_hessians_first_is_identity():
    """H₀ = I (reference ``src/inverse_hessian.jl:39-40``)."""
    d = 4
    logp = _quad_logp(np.ones(d))
    vg = jax.value_and_grad(logp)
    trace = minimize_lbfgs_trace(vg, jnp.ones(d), maxiters=20)
    fits, mask, _ = lbfgs_inverse_hessians(trace)
    H0 = jax.tree_util.tree_map(lambda leaf: leaf[0], fits)
    np.testing.assert_allclose(H0.to_dense(), np.eye(d), atol=1e-12)


def test_nonfinite_abort():
    """NaN log density aborts cleanly; trajectory keeps only finite points
    (reference abort semantics, ``src/optimize.jl:103-105``; divergence
    documented: the non-finite point itself is not recorded)."""

    def logp(x):
        clean = -0.5 * jnp.sum(x * x)
        return jnp.where(x[0] < 1.0, jnp.nan, clean)

    vg = jax.value_and_grad(logp)
    x0 = jnp.asarray([0.5, 0.5])  # starts inside the NaN region
    trace = minimize_lbfgs_trace(vg, x0, maxiters=50)
    assert int(trace.num_valid) == 1  # only the (bad) initial point
    # a start in the good region that would have to cross the NaN wall
    x1 = jnp.asarray([3.0, 0.0])
    trace1 = minimize_lbfgs_trace(vg, x1, maxiters=50)
    n1 = int(trace1.num_valid)
    assert n1 >= 1
    assert np.all(np.isfinite(np.asarray(trace1.xs[:n1]))), "trace has no NaNs"
    assert np.all(np.isfinite(np.asarray(trace1.log_densities[:n1])))


def test_should_abort_nonfinite_truth_table():
    """Truth table of the reference callback's abort rule
    (``test/optimize.jl:52-94``): abort iff ``fail_on_nonfinite`` and
    (isnan(logp) or logp == +Inf or any gradient entry non-finite);
    logp == -Inf does NOT abort."""
    from pathfinder_tpu.ops.lbfgs import should_abort_nonfinite

    check_vals = [0.0, np.nan, -np.inf, np.inf]
    for flag in [True, False]:
        for fval in check_vals:
            for gval in check_vals:
                g = jnp.asarray([1.0, -2.0, gval])
                expected = flag and (
                    np.isnan(fval) or fval == np.inf or not np.isfinite(gval)
                )
                got = bool(should_abort_nonfinite(jnp.asarray(fval), g, flag))
                assert got == expected, (flag, fval, gval)


def test_fail_on_nonfinite_flag_behavior():
    """fail_on_nonfinite=True stops at a NaN start after the single initial
    evaluation; False keeps trying (reference: the solve flounders on) but
    ends with the same 1-point trace."""

    def logp(x):
        clean = -0.5 * jnp.sum(x * x)
        return jnp.where(x[0] < 1.0, jnp.nan, clean)

    vg = jax.value_and_grad(logp)
    x0 = jnp.asarray([0.5, 0.5])  # NaN region
    tr_true = minimize_lbfgs_trace(vg, x0, maxiters=50, fail_on_nonfinite=True)
    tr_false = minimize_lbfgs_trace(vg, x0, maxiters=50, fail_on_nonfinite=False)
    assert int(tr_true.num_valid) == 1
    assert int(tr_false.num_valid) == 1
    assert int(tr_true.num_fn_evals) == 1  # aborted before any line search
    assert int(tr_false.num_fn_evals) > 1  # attempted a (futile) step


def test_neg_inf_logp_start_is_tolerated():
    """logp == -Inf at the start does not abort (reference rule: fval==-Inf
    is allowed) — the optimizer climbs out of the zero-density region."""

    def logp(x):
        lp = -0.5 * jnp.sum(x * x)
        return jnp.where(x[0] < 0.0, -jnp.inf, lp)

    def vg(x):
        lp = logp(x)
        # finite gradient pointing back into the support
        g = jnp.where(x[0] < 0.0, jnp.asarray([1.0, 0.0]), -x)
        return lp, g

    # start close enough to the boundary that the first trial step crosses
    # it (non-finite *trials* backtrack, in the reference's Hager-Zhang too,
    # so a deep -Inf start cannot escape — only a near-boundary one can)
    x0 = jnp.asarray([-0.001, 0.3])
    trace = minimize_lbfgs_trace(vg, x0, maxiters=50, fail_on_nonfinite=True)
    n = int(trace.num_valid)
    assert n > 1, "optimization should escape the -Inf region"
    assert np.isfinite(float(trace.log_densities[n - 1]))


def test_wolfe_line_search_conditions():
    def f_np(a):
        return a**4 - 3 * a**2 + a  # nonconvex 1-D

    def vg(x):
        val = x[0] ** 4 - 3 * x[0] ** 2 + x[0]
        grad = jnp.asarray([4 * x[0] ** 3 - 6 * x[0] + 1])
        return val, grad

    x = jnp.asarray([0.0])
    f0, g0 = vg(x)
    p = jnp.asarray([-1.0]) * jnp.sign(g0)  # descent
    res = wolfe_line_search(vg, x, f0, g0, p, jnp.asarray(1.0))
    assert bool(res.ok)
    a = float(res.step_size)
    dphi0 = float(g0 @ p)
    # strong Wolfe conditions
    assert f_np(-a * float(jnp.sign(g0[0]))) <= float(f0) + 1e-4 * a * dphi0
    fa, ga = vg(x + a * p)
    assert abs(float(ga @ p)) <= -0.9 * dphi0 + 1e-12


def test_wolfe_zoom_exits_on_interval_collapse():
    """When the curvature condition is unsatisfiable (kinked objective:
    |phi'| = 1 > c2 everywhere), the zoom interval collapses to fp
    resolution; the search must exit early via the collapse check and
    fall back to the best sufficient-decrease point instead of burning
    the whole budget re-evaluating one alpha."""
    def vg(x):
        a = x[0]
        return jnp.abs(a - 0.5), jnp.asarray([jnp.sign(a - 0.5)])

    x0 = jnp.zeros(1, jnp.float32)
    f0 = jnp.asarray(0.5, jnp.float32)
    g0 = jnp.asarray([-1.0], jnp.float32)
    res = wolfe_line_search(
        vg, x0, f0, g0, jnp.ones(1, jnp.float32),
        jnp.asarray(0.1, jnp.float32), max_evals=30,
    )
    assert bool(res.ok)
    assert int(res.num_evals) < 30  # exited early, budget not exhausted
    assert abs(float(res.step_size) - 0.5) < 1e-5  # at the kink minimum


def test_wolfe_zoom_keeps_consistent_interval_through_nan_pocket():
    """A non-finite zoom trial is recorded as a φ=+inf endpoint (interval
    stays self-consistent; regression: a_hi moved while phi_hi/dphi_hi kept
    the old endpoint's values, feeding the cubic mismatched data). The
    search must still return a point whose (f, g) match a real evaluation
    and satisfy sufficient decrease."""

    def vg(x):
        a = x[0]
        val = (a - 1.0) ** 2
        val = jnp.where((a > 1.5) & (a < 2.8), jnp.nan, val)
        grad = jnp.asarray([2.0 * (a - 1.0)])
        grad = jnp.where((a > 1.5) & (a < 2.8), jnp.full_like(grad, jnp.nan), grad)
        return val, grad

    x = jnp.asarray([0.0])
    f0, g0 = vg(x)
    p = jnp.asarray([1.0])  # descent (minimum at a=1, NaN pocket beyond)
    # alpha0=4: first trial overshoots past the pocket, φ(4)=9 > φ(0)=1
    # enters zoom on [0, 4]; interpolants repeatedly land in the pocket
    res = wolfe_line_search(vg, x, f0, g0, p, jnp.asarray(4.0), max_evals=20)
    assert bool(res.ok)
    a = float(res.step_size)
    assert 0 < a <= 1.5  # outside the NaN pocket
    fa, ga = vg(x + a * p)
    np.testing.assert_allclose(float(res.f), float(fa), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.g), np.asarray(ga), rtol=1e-6)
    dphi0 = float(g0 @ p)
    assert float(fa) <= float(f0) + 1e-4 * a * dphi0  # sufficient decrease


def test_hager_zhang_line_search_conditions():
    """Accepted HZ steps satisfy standard weak Wolfe OR approximate Wolfe
    (HZ 2005 eq. 4.1) with δ=0.1, σ=0.9 — the reference's default search
    (``src/Pathfinder.jl:25-35``)."""
    from pathfinder_tpu.ops.linesearch import hager_zhang_line_search

    def vg(x):
        val = x[0] ** 4 - 3 * x[0] ** 2 + x[0]
        grad = jnp.asarray([4 * x[0] ** 3 - 6 * x[0] + 1])
        return val, grad

    delta, sigma = 0.1, 0.9
    for start in [0.0, 0.4, -0.3]:
        x = jnp.asarray([start])
        f0, g0 = vg(x)
        p = -jnp.sign(g0) * jnp.ones(1)
        res = hager_zhang_line_search(
            vg, x, f0, g0, p, jnp.asarray(1.0), c1=delta, c2=sigma
        )
        assert bool(res.ok), start
        a = float(res.step_size)
        dphi0 = float(g0 @ p)
        fa, ga = vg(x + a * p)
        dphi_a = float(ga @ p)
        wolfe = (float(fa) <= float(f0) + delta * a * dphi0 + 1e-12) and (
            dphi_a >= sigma * dphi0 - 1e-12
        )
        approx = (
            float(fa) <= float(f0) + 1e-6 * abs(float(f0)) + 1e-12
            and sigma * dphi0 - 1e-12 <= dphi_a <= (2 * delta - 1) * dphi0 + 1e-12
        )
        assert wolfe or approx, (start, a, dphi_a, dphi0)


def test_more_thuente_line_search_conditions():
    """Accepted Moré-Thuente steps satisfy the strong Wolfe conditions —
    the guarantee of Moré & Thuente (1994) that makes it a valid alternative
    to the reference's default Hager-Zhang (``src/Pathfinder.jl:25-35``)."""
    from pathfinder_tpu.ops.linesearch import more_thuente_line_search

    def vg(x):
        val = x[0] ** 4 - 3 * x[0] ** 2 + x[0]
        grad = jnp.asarray([4 * x[0] ** 3 - 6 * x[0] + 1])
        return val, grad

    c1, c2 = 1e-4, 0.9
    for start, a0 in [(0.0, 1.0), (0.4, 1.0), (-0.3, 1.0), (0.0, 37.0), (2.0, 0.01)]:
        x = jnp.asarray([start])
        f0, g0 = vg(x)
        p = -jnp.sign(g0) * jnp.ones(1)
        res = more_thuente_line_search(
            vg, x, f0, g0, p, jnp.asarray(a0), c1=c1, c2=c2, max_evals=20
        )
        assert bool(res.ok), (start, a0)
        a = float(res.step_size)
        dphi0 = float(g0 @ p)
        fa, ga = vg(x + a * p)
        dphi_a = float(ga @ p)
        exhausted = bool(res.exhausted)
        suff = float(fa) <= float(f0) + c1 * a * dphi0 + 1e-12
        curv = abs(dphi_a) <= -c2 * dphi0 + 1e-12
        assert suff, (start, a0, a)
        if not exhausted:
            assert curv, (start, a0, a, dphi_a, dphi0)
        # the returned (f, g) must match the actual objective at the step
        np.testing.assert_allclose(float(res.f), float(fa), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(res.g), np.asarray(ga), rtol=1e-6)


def test_more_thuente_nonfinite_trials_backtrack():
    """Trial points in a zero-density region (-Inf/NaN) are discarded and the
    search backtracks to a finite accepted step."""
    from pathfinder_tpu.ops.linesearch import more_thuente_line_search

    def vg(x):
        val = jnp.where(x[0] > 1.0, jnp.nan, 0.5 * (x[0] - 0.9) ** 2)
        grad = jnp.asarray([jnp.where(x[0] > 1.0, jnp.nan, x[0] - 0.9)])
        return val, grad

    x = jnp.asarray([0.0])
    f0, g0 = vg(x)
    p = jnp.asarray([1.0])
    res = more_thuente_line_search(vg, x, f0, g0, p, jnp.asarray(8.0), max_evals=20)
    assert bool(res.ok)
    a = float(res.step_size)
    assert 0.0 < a <= 1.0
    assert np.isfinite(float(res.f))


@pytest.mark.parametrize("line_search", ["hager_zhang", "more_thuente", "wolfe"])
def test_line_search_trajectory_quality(line_search):
    """Both searches drive L-BFGS to the optimum of an ill-conditioned
    quadratic within the eval budget; curvature pairs are accepted (no
    PD-guard rejections) — the quality property that matters for the fits."""
    scales = jnp.asarray([1.0, 10.0, 100.0, 0.1, 5.0])

    def vg(x):
        return -0.5 * jnp.sum(scales * x * x), -scales * x

    x0 = jnp.ones(5)
    tr = minimize_lbfgs_trace(vg, x0, maxiters=100, line_search=line_search)
    n = int(tr.num_valid)
    assert float(tr.log_densities[n - 1]) > -1e-10
    assert int(tr.num_bfgs_updates_rejected) == 0
    assert int(tr.num_ls_exhausted) == 0


def test_batched_minimize_under_vmap():
    """The whole optimizer must vmap (path parallelism)."""
    d = 5
    prec = jnp.asarray(np.random.default_rng(5).uniform(0.5, 2.0, d))

    def logp(x):
        return -0.5 * jnp.sum(prec * x * x)

    vg = jax.value_and_grad(logp)
    x0s = jnp.asarray(np.random.default_rng(6).standard_normal((4, d)))
    traces = jax.jit(
        jax.vmap(lambda x: minimize_lbfgs_trace(vg, x, maxiters=50))
    )(x0s)
    for i in range(4):
        n = int(traces.num_valid[i])
        np.testing.assert_allclose(traces.xs[i, n - 1], np.zeros(d), atol=1e-5)


def test_progress_every_emits_iteration_lines(capsys):
    """progress_every > 0 emits a host-callback line per N iterations
    (the reference's per-iteration ProgressLogging events,
    ``src/optimize.jl:91-92``; sequence tested at
    ``test/optimize.jl:138-159``)."""

    def logp(x):
        return -0.5 * jnp.sum((x - 2.0) ** 2)

    trace = minimize_lbfgs_trace(
        jax.value_and_grad(logp), jnp.zeros(4, jnp.float32),
        maxiters=20, progress_every=1,
    )
    jax.block_until_ready(trace.xs)
    jax.effects_barrier()
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "L-BFGS iter" in ln]
    nv = int(trace.num_valid)
    assert len(lines) >= nv - 1, (len(lines), nv, out)
    assert f"/20" in lines[0]


def test_small_step_windows_stay_finite_pd():
    """Near-convergence windows (steps ~1e-3, f32) must factorize: the
    compact form's D scales like 1/(sᵀy) inversely to the Gram, so an
    absolute ridge floor (the pre-fix behavior) drove I + KᵀDK indefinite
    and every trajectory-end fit — usually the ELBO winner — NaN'd out.
    The ridge is now relative to the data Gram."""
    d, L = 20, 10
    rng = np.random.default_rng(0)
    H = np.diag(rng.uniform(0.5, 2.0, d))
    xstar = rng.standard_normal(d)
    xs = np.asarray(
        [xstar + (1e-3 * 0.8**k) * rng.standard_normal(d) for k in range(L)],
        np.float32,
    )
    grads = np.asarray([-(H @ (x - xstar)) for x in xs], np.float32)
    trace = OptimizationTrace(
        xs=jnp.asarray(xs),
        log_densities=jnp.asarray(
            [-0.5 * (x - xstar) @ H @ (x - xstar) for x in xs], jnp.float32
        ),
        gradients=jnp.asarray(grads),
        num_valid=jnp.asarray(L),
        num_bfgs_updates_rejected=jnp.asarray(0),
        num_fn_evals=jnp.asarray(L),
    )
    fits, mask, _ = lbfgs_inverse_hessians(trace, history_length=6)
    finite = np.asarray(jax.vmap(lambda c: c.is_finite_pd())(fits))
    valid = np.asarray(mask)
    assert finite[valid].all(), finite[valid]
    # the reconstructed W stays a faithful PD matrix (f64 check)
    last = int(np.nonzero(valid)[0][-1])
    W = np.asarray(
        jax.tree_util.tree_map(lambda l: l[last], fits).to_dense(), np.float64
    )
    assert np.allclose(W, W.T, atol=1e-5)
    assert np.linalg.eigvalsh(W).min() > 0


def test_small_scale_gradients_still_optimize():
    """A legitimately small-scaled target (max|∇logp| ~ 1e-7) must
    optimize, not spuriously 'converge' after one step: the gtol floor is
    the dtype resolution AT THE GRADIENT SCALE (eps is relative
    precision), so the old absolute 25·eps floor no longer applies."""
    scale = 1e-7

    def vg(x):
        return scale * (-0.5 * jnp.sum(x * x)), scale * (-x)

    x0 = jnp.full((5,), 2.0, jnp.float32)
    trace = minimize_lbfgs_trace(
        vg, x0, maxiters=50, history_length=5, gtol=1e-10
    )
    assert int(trace.num_valid) > 2  # actually iterated
    last = int(trace.num_valid) - 1
    x_end = np.asarray(trace.xs[last])
    assert np.abs(x_end).max() < 1e-2  # reached the optimum region


def test_small_scale_gradients_cg_matches_lbfgs_semantics():
    """The CG driver shares the gradient-scale-aware gtol clamp: a
    small-scaled target must optimize under optimizer='cg' too."""
    from pathfinder_tpu.ops.cg import minimize_cg_trace

    scale = 1e-7

    def vg(x):
        return scale * (-0.5 * jnp.sum(x * x)), scale * (-x)

    x0 = jnp.full((5,), 2.0, jnp.float32)
    trace = minimize_cg_trace(vg, x0, maxiters=50, gtol=1e-10)
    assert int(trace.num_valid) > 2
    last = int(trace.num_valid) - 1
    assert np.abs(np.asarray(trace.xs[last])).max() < 1e-2
