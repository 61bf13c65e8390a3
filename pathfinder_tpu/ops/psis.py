"""Pareto-smoothed importance sampling (PSIS), pure JAX.

From-scratch implementation of the reference's external ``PSIS.jl``
dependency (used at ``src/resample.jl:74-79``; diagnostics consumed at
``src/multipath.jl:53-63``), following Vehtari, Simpson, Gelman, Yao &
Gabry, *Pareto smoothed importance sampling*, JMLR 25(72), 2024:

1. tail length ``M = ceil(min(S/5, 3·√(S/r_eff)))``;
2. fit a generalized Pareto distribution to the ``M`` largest importance
   ratios (exceedances over the cutoff) with the Zhang & Stephens (2009)
   quantile-grid posterior-mean estimator, with the paper's weak prior
   regularization of the shape ``k̂``;
3. replace the tail ratios by the expected order statistics of the fitted
   GPD, truncate at the raw maximum, and normalize.

Everything is fixed-shape and jit-safe: the sample size is static, so the
tail length and estimator grid are Python-level constants; the smoothing is
a sort + scatter. NaN ratios (e.g. from failed paths) are treated as −∞
(zero weight) rather than poisoning the fit — a strictly-defensive
divergence from PSIS.jl, documented here.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["PSISResult", "psis", "gpdfit", "pareto_k_verdict"]


def pareto_k_verdict(k: float) -> str:
    """Quality verdict for a Pareto-k̂ with the reference's thresholds
    (``src/multipath.jl:54-63``). NaN means the diagnostic could not be
    computed (tail too short, degenerate ratios, failed GPD fit) — reported
    as ``"not computed"``, never as a quality verdict."""
    k = float(k)
    if k != k:  # NaN: falls through every comparison below
        return "not computed"
    if k > 1:
        return "very bad"
    if k > 0.7:
        return "bad"
    if k > 0.5:
        return "ok"
    return "good"


class PSISResult(NamedTuple):
    """Parity: ``PSIS.PSISResult`` (weights normalized to sum 1,
    ``pareto_shape`` = k̂ diagnostic)."""

    log_weights: jax.Array  # (S,) smoothed, normalized: logsumexp == 0
    weights: jax.Array  # (S,) exp(log_weights), sum == 1
    pareto_shape: jax.Array  # () k̂
    tail_length: int
    reff: float

    @property
    def ess(self) -> jax.Array:
        """Importance-sampling effective sample size ``1/Σ wᵢ²``."""
        return 1.0 / jnp.sum(self.weights**2)

    @property
    def diagnosis(self) -> str:
        """Quality verdict with the reference's thresholds
        (``src/multipath.jl:54-63``); see :func:`pareto_k_verdict`."""
        return pareto_k_verdict(self.pareto_shape)


def tail_length(reff: float, S: int) -> int:
    """PSIS paper / PSIS.jl tail-length rule."""
    return int(math.ceil(min(S / 5.0, 3.0 * math.sqrt(S / reff))))


def gpdfit(x: jax.Array, prior_bs: float = 3.0, prior_k: float = 10.0):
    """Generalized-Pareto (σ, k) fit to sorted-ascending exceedances ``x``
    via the Zhang & Stephens (2009) quantile-grid posterior mean, with the
    PSIS paper's prior regularization of k̂. Returns ``(k, sigma)``."""
    n = x.shape[0]
    dtype = x.dtype
    m = 30 + int(math.floor(math.sqrt(n)))
    j = jnp.arange(1, m + 1, dtype=dtype)
    xq = x[int(n / 4.0 + 0.5) - 1]  # first-quartile order statistic
    # ≥25% of the exceedances tying the cutoff makes xq exactly 0 (e.g.
    # duplicated ratios, or several +inf ratios capped to one value) and
    # the grid below would divide by it, NaN-ing the whole fit. Anchor the
    # grid at the smallest positive exceedance instead — the b-grid is a
    # scale heuristic, and bs < 1/xmax stays true for any positive anchor.
    pos_min = jnp.min(jnp.where(x > 0, x, jnp.inf))
    xq = jnp.where(
        xq > 0, xq, jnp.where(jnp.isfinite(pos_min), pos_min, 1.0)
    )
    xmax = x[-1]
    bs = 1.0 / xmax + (1.0 - jnp.sqrt(m / (j - 0.5))) / (prior_bs * xq)
    # profile log-likelihood over the grid
    ks = jnp.mean(jnp.log1p(-bs[:, None] * x[None, :]), axis=1)  # (m,)
    L = n * (jnp.log(-bs / ks) - ks - 1.0)
    w = 1.0 / jnp.sum(jnp.exp(L[None, :] - L[:, None]), axis=1)
    b_post = jnp.sum(bs * w)
    k_post = jnp.mean(jnp.log1p(-b_post * x))
    sigma = -k_post / b_post
    k_reg = (n * k_post + prior_k * 0.5) / (n + prior_k)
    return k_reg.astype(dtype), sigma.astype(dtype)


def _gpd_quantile(p, k, sigma):
    """Inverse CDF of GPD(σ, k) at probabilities ``p`` (location 0)."""
    safe_k = jnp.where(jnp.abs(k) < 1e-12, 1.0, k)
    q_k = sigma * jnp.expm1(-safe_k * jnp.log1p(-p)) / safe_k
    q_0 = -sigma * jnp.log1p(-p)
    return jnp.where(jnp.abs(k) < 1e-12, q_0, q_k)


def psis(log_ratios: jax.Array, reff: float = 1.0) -> PSISResult:
    """Smooth importance log-ratios; jit-safe for a static sample size.

    Returns normalized weights and the Pareto-shape diagnostic. With fewer
    than 5 tail draws the ratios are only normalized (PSIS.jl's "insufficient
    tail" path) and ``pareto_shape`` is NaN.
    """
    log_ratios = jnp.asarray(log_ratios)
    S = log_ratios.shape[0]
    dtype = log_ratios.dtype
    M = tail_length(reff, S)

    lw = jnp.where(jnp.isnan(log_ratios), -jnp.inf, log_ratios)
    # +inf ratios (zero-density proposal draws / broken targets) would make
    # the max-shift below NaN everywhere and silently collapse resampling;
    # cap them at the largest finite ratio (they then carry the top weight).
    finite_max = jnp.max(jnp.where(jnp.isfinite(lw), lw, -jnp.inf))
    has_finite = jnp.isfinite(finite_max)
    lw = jnp.minimum(lw, finite_max)
    # no finite ratio at all (every draw NaN/±inf): fall back to uniform
    # weights with a NaN shape diagnostic instead of NaN weights
    lw = jnp.where(has_finite, lw - finite_max, jnp.zeros_like(lw))
    x = lw  # shifted so max is 0 (stability)

    if M < 5:
        logZ = jax.nn.logsumexp(x)
        log_weights = x - logZ
        return PSISResult(
            log_weights=log_weights,
            weights=jnp.exp(log_weights),
            pareto_shape=jnp.asarray(jnp.nan, dtype),
            tail_length=M,
            reff=reff,
        )

    order = jnp.argsort(x)
    x_sorted = x[order]
    cutoff_log = x_sorted[S - M - 1]
    # exceedances on the ratio scale
    cut_w = jnp.exp(cutoff_log)
    tail_log = x_sorted[S - M :]
    exceed = jnp.exp(tail_log) - cut_w  # ascending, ≥ 0

    k, sigma = gpdfit(exceed)

    # expected order statistics of the fitted GPD
    p = (jnp.arange(1, M + 1, dtype=dtype) - 0.5) / M
    smoothed_tail = jnp.log(_gpd_quantile(p, k, sigma) + cut_w)
    # truncate at the raw maximum (= 0 after shift)
    smoothed_tail = jnp.minimum(smoothed_tail, 0.0)

    # only smooth when the fit is usable (finite k and non-degenerate tail)
    fit_ok = (
        jnp.isfinite(k)
        & jnp.isfinite(sigma)
        & (sigma > 0)
        & jnp.all(jnp.isfinite(smoothed_tail))
    )
    new_tail = jnp.where(fit_ok, smoothed_tail, tail_log)
    x_smoothed = x.at[order[S - M :]].set(new_tail)

    logZ = jax.nn.logsumexp(x_smoothed)
    log_weights = x_smoothed - logZ
    return PSISResult(
        log_weights=log_weights,
        weights=jnp.exp(log_weights),
        pareto_shape=jnp.where(fit_ok, k, jnp.asarray(jnp.nan, dtype)),
        tail_length=M,
        reff=reff,
    )
