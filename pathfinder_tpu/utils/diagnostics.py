"""Sampling diagnostics: split-R̂ and bulk effective sample size.

Standard definitions (Vehtari, Gelman, Simpson, Carpenter, Bürkner, 2021:
*Rank-normalization, folding, and localization: An improved R̂*), implemented
in pure JAX over ``(num_chains, num_samples, dim)`` sample stacks. The
reference package has no sampler of its own and relies on downstream MCMC
packages' diagnostics; since this framework ships an HMC sampler
(``integrations/hmc.py``), it ships the matching diagnostics too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["split_rhat", "ess_bulk", "summarize"]


def _split_chains(x):
    """(C, N, d) -> (2C, N//2, d)."""
    C, N, d = x.shape
    half = N // 2
    x = x[:, : 2 * half, :]
    return x.reshape(C * 2, half, d)


def split_rhat(samples: jax.Array) -> jax.Array:
    """Split-R̂ per dimension for ``(chains, samples, dim)`` arrays."""
    x = _split_chains(jnp.asarray(samples))
    C, N, d = x.shape
    chain_means = x.mean(axis=1)  # (C, d)
    chain_vars = x.var(axis=1, ddof=1)  # (C, d)
    W = chain_vars.mean(axis=0)
    B = N * chain_means.var(axis=0, ddof=1)
    var_plus = (N - 1) / N * W + B / N
    return jnp.sqrt(var_plus / W)


def _autocov(x):
    """Autocovariance per chain via FFT: x (C, N) -> (C, N)."""
    C, N = x.shape
    xc = x - x.mean(axis=1, keepdims=True)
    nfft = 2 * N
    f = jnp.fft.rfft(xc, n=nfft, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=1)[:, :N]
    return acov / N


def ess_bulk(samples: jax.Array) -> jax.Array:
    """Bulk ESS per dimension (Geyer initial monotone sequence over
    chain-combined autocorrelations) for ``(chains, samples, dim)``."""
    x = _split_chains(jnp.asarray(samples))
    C, N, d = x.shape

    def one_dim(xd):  # (C, N)
        acov = _autocov(xd)  # (C, N)
        chain_var = acov[:, 0] * N / (N - 1)
        W = chain_var.mean()
        mean_acov = acov.mean(axis=0)
        var_plus = mean_acov[0] * N / (N - 1) + xd.mean(axis=1).var(ddof=1)
        rho = 1.0 - (W - mean_acov) / var_plus  # (N,)
        # Geyer: sum over pairs while the pair sums stay positive & monotone
        npairs = N // 2
        pair = rho[: 2 * npairs].reshape(npairs, 2).sum(axis=1)
        pos = pair > 0
        pos = jnp.cumprod(pos) > 0  # stop at first non-positive pair
        pair_mon = jax.lax.associative_scan(jnp.minimum, pair)  # monotone cap
        tau = -1.0 + 2.0 * jnp.sum(jnp.where(pos, pair_mon, 0.0))
        tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(N * C))))
        return C * N / tau

    return jax.vmap(one_dim, in_axes=2)(x)


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
        "rhat": split_rhat(x),
    }
