"""Sampling diagnostics: rank-normalized split-R̂ and bulk effective sample
size.

Definitions from Vehtari, Gelman, Simpson, Carpenter, Bürkner (2021):
*Rank-normalization, folding, and localization: An improved R̂*, implemented
in pure JAX over ``(num_chains, num_samples, dim)`` sample stacks:

* samples are rank-normalized (ranks → normal quantiles with the (r−3/8)/
  (S+1/4) rule) before both diagnostics, so heavy tails cannot mask
  mixing failures;
* ``split_rhat`` is the max of the rank-normalized split-R̂ and the folded
  (median-absolute-deviation) split-R̂;
* ``ess_bulk`` is the spectral ESS (FFT autocovariance + Geyer initial
  monotone sequence) of the rank-normalized samples, with
  ``var⁺ = mean-autocov₀ + var(chain means)``.

The reference package has no sampler of its own and relies on downstream
MCMC packages' diagnostics; since this framework ships HMC/NUTS samplers
(``integrations/``), it ships the matching diagnostics too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

__all__ = ["split_rhat", "ess_bulk", "ess_tail", "summarize"]


def _split_chains(x):
    """(C, N, d) -> (2C, N//2, d)."""
    C, N, d = x.shape
    half = N // 2
    x = x[:, : 2 * half, :]
    return x.reshape(C * 2, half, d)


def _rank_normalize(x):
    """Rank-normalize over ALL entries of ``x`` (any shape), preserving
    shape: rank r → Φ⁻¹((r − 3/8)/(S + 1/4)).

    Ties get *average* ranks (the Vehtari et al. / ArviZ convention), so the
    diagnostics are permutation-invariant for discrete or heavily tied
    chains: rank(x) = (#{< x} + #{≤ x} + 1) / 2 via two searchsorted passes.
    """
    shape = x.shape
    flat = x.reshape(-1)
    S = flat.shape[0]
    sorted_flat = jnp.sort(flat)
    lo = jnp.searchsorted(sorted_flat, flat, side="left")
    hi = jnp.searchsorted(sorted_flat, flat, side="right")
    # rank arithmetic in a float dtype of at least f32 precision: casting
    # to x.dtype would round integer ranks in bf16 (exact only to 256) or
    # degenerate entirely for bool indicator chains
    rank_dtype = jnp.promote_types(x.dtype, jnp.float32)
    ranks = 0.5 * (lo + hi + 1).astype(rank_dtype)
    z = ndtri((ranks - 0.375) / (S + 0.25))
    return z.reshape(shape)


def _basic_split_rhat(x):
    """Split-R̂ of (C, N, d) without any normalization."""
    x = _split_chains(x)
    C, N, d = x.shape
    chain_means = x.mean(axis=1)
    chain_vars = x.var(axis=1, ddof=1)
    W = chain_vars.mean(axis=0)
    B = N * chain_means.var(axis=0, ddof=1)
    var_plus = (N - 1) / N * W + B / N
    return jnp.sqrt(var_plus / W)


def split_rhat(samples: jax.Array) -> jax.Array:
    """Rank-normalized split-R̂, max of bulk and folded variants, per
    dimension for ``(chains, samples, dim)`` arrays."""
    x = jnp.asarray(samples)
    z = jax.vmap(_rank_normalize, in_axes=2, out_axes=2)(x)
    med = jnp.median(x, axis=(0, 1))
    zf = jax.vmap(_rank_normalize, in_axes=2, out_axes=2)(
        jnp.abs(x - med[None, None, :])
    )
    return jnp.maximum(_basic_split_rhat(z), _basic_split_rhat(zf))


def _autocov(x):
    """Autocovariance per chain via FFT: x (C, N) -> (C, N), biased (1/N)."""
    C, N = x.shape
    xc = x - x.mean(axis=1, keepdims=True)
    nfft = 2 * N
    f = jnp.fft.rfft(xc, n=nfft, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=1)[:, :N]
    return acov / N


def _ess_one(xd):
    """Spectral ESS of one dimension's (C, N) chains (already normalized)."""
    C, N = xd.shape
    acov = _autocov(xd)
    chain_var = acov[:, 0] * N / (N - 1)
    W = chain_var.mean()
    mean_acov = acov.mean(axis=0)
    # var⁺ = (N−1)/N · W + B/N  =  mean_acov[0] + var(chain means)
    var_plus = mean_acov[0] + xd.mean(axis=1).var(ddof=1)
    rho = 1.0 - (W - mean_acov) / var_plus  # (N,)
    npairs = N // 2
    pair = rho[: 2 * npairs].reshape(npairs, 2).sum(axis=1)
    pos = jnp.cumprod(pair > 0) > 0  # stop at first non-positive pair
    pair_mon = jax.lax.associative_scan(jnp.minimum, pair)  # monotone cap
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(pos, pair_mon, 0.0))
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(N * C))))
    return C * N / tau


def ess_bulk(samples: jax.Array) -> jax.Array:
    """Bulk ESS (rank-normalized spectral ESS on split chains) per dimension
    for ``(chains, samples, dim)``."""
    x = _split_chains(jnp.asarray(samples))

    def one(xd):  # (C, N)
        return _ess_one(_rank_normalize(xd))

    return jax.vmap(one, in_axes=2)(x)


def _ess_quantile(xd, prob):
    """ESS of the indicator I(x ≤ q_prob) over (C, N) split chains — the
    tail-resolution measure of Vehtari et al. (2021) §4.3."""
    q = jnp.quantile(xd, prob)
    ind = (xd <= q).astype(jnp.result_type(float))
    # a constant indicator (all/none below q) carries no tail-resolution
    # information; report NaN (the ArviZ/posterior convention) rather than
    # a spuriously maximal ESS for heavily tied or near-constant chains
    degenerate = (ind.std() == 0)
    return jnp.where(degenerate, jnp.nan, _ess_one(ind))


def ess_tail(samples: jax.Array) -> jax.Array:
    """Tail ESS: min of the 5%- and 95%-quantile indicator ESS per
    dimension for ``(chains, samples, dim)`` (Vehtari et al. 2021; the
    ArviZ ``ess_tail`` convention). Low tail ESS with fine bulk ESS means
    the chains resolve the center but not the tails. NaN when a quantile
    indicator is constant (heavily tied / near-constant draws — tail
    resolution is undefined there)."""
    x = _split_chains(jnp.asarray(samples))

    def one(xd):  # (C, N)
        return jnp.minimum(_ess_quantile(xd, 0.05), _ess_quantile(xd, 0.95))

    return jax.vmap(one, in_axes=2)(x)


def summarize(samples: jax.Array) -> dict:
    """Mean/sd/ESS/R̂ summary for ``(chains, samples, dim)`` (or
    ``(samples, dim)``, treated as one chain)."""
    x = jnp.asarray(samples)
    if x.ndim == 2:
        x = x[None]
    return {
        "mean": x.mean(axis=(0, 1)),
        "sd": x.std(axis=(0, 1), ddof=1),
        "ess_bulk": ess_bulk(x),
        "ess_tail": ess_tail(x),
        "rhat": split_rhat(x),
    }
