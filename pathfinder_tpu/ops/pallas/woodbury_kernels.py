"""Fused Pallas TPU kernels for the Woodbury sampling / log-density hot path.

The innermost numeric kernel of the whole framework (SURVEY §3.4; reference
call stack ``rand_and_logpdf`` → ``unwhiten!`` → factor applies,
``src/mvnormal.jl:24-39`` + ``src/woodbury.jl:136-143``) is, per draw column
``u``:

    x    = a½ ∘ (u + X (C (Xᵀ u))) + μ          (sample;  L u + μ)
    ‖u‖² → logq = −(d·log2π + logdet + ‖u‖²)/2   (fused log density)

and for importance weighting (``logpdf`` → ``invquad``,
``src/woodbury.jl:369-376``), per draw column ``x``:

    v = (x−μ)/a½;  w = v + X (Ci (Xᵀ v));  ‖w‖² → maha

Both are chains of skinny matmuls + elementwise ops over a tall ``(d, N)``
block. The Pallas kernels guarantee the fusion (one HBM read of ``u``/``x``,
one write of the result, reductions kept in VMEM) and tile the N axis so
``d×N_tile`` stays on-chip. They carry a ``lax`` reference implementation
used as the CPU fallback and as the correctness oracle in tests (kernels run
under ``interpret=True`` off-TPU).

Measured on TPU v5e (d=1000, m=12, N=4096, f32): the Pallas kernel and the
XLA-fused lax path are within noise of each other (~740 µs, both bit-exact)
— XLA's fusion already achieves the single-pass schedule here, so the lax
path is the default (`use_pallas=None` resolves to False) and the kernels
are opt-in infrastructure for future larger fusions, per the "don't
hand-schedule what the compiler already does" rule.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # TPU-specific bits are optional at import time (CPU test envs)
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["sample_and_logq", "whiten_sumsq"]

_LOG_2PI = math.log(2.0 * math.pi)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# fused sample + logq:  x = a½∘(u + X C Xᵀ u) + μ,  logq from ‖u‖²
# ---------------------------------------------------------------------------


def _sample_kernel(u_ref, half_ref, X_ref, C_ref, mu_ref, x_ref, usq_ref):
    u = u_ref[:]  # (d, Nt)
    X = X_ref[:]  # (d, m)
    acc = jnp.promote_types(u.dtype, jnp.float32)  # ≥f32 accumulation
    t = jnp.dot(X.T, u, preferred_element_type=acc)  # (m, Nt)
    s = jnp.dot(C_ref[:], t, preferred_element_type=acc)
    core = u + jnp.dot(X, s, preferred_element_type=acc).astype(u.dtype)
    x_ref[:] = half_ref[:] * core + mu_ref[:]
    usq_ref[:] = jnp.sum(u * u, axis=0, keepdims=True)  # (1, Nt)


def sample_and_logq_lax(u, half, X, C, mu, log_det):
    """Reference/fallback implementation (identical math, XLA-fused)."""
    core = u + X @ (C @ (X.T @ u))
    x = half[:, None] * core + mu[:, None]
    usq = jnp.sum(u * u, axis=0)
    d = u.shape[0]
    logq = -0.5 * (d * _LOG_2PI + log_det + usq)
    return x, logq


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _sample_pallas(u, half, X, C, mu, block_n: int, interpret: bool):
    d, N = u.shape
    m = X.shape[1]
    grid = (pl.cdiv(N, block_n),)
    x, usq = pl.pallas_call(
        _sample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, block_n), lambda i: (0, i)),
            pl.BlockSpec((d, 1), lambda i: (0, 0)),
            pl.BlockSpec((d, m), lambda i: (0, 0)),
            pl.BlockSpec((m, m), lambda i: (0, 0)),
            pl.BlockSpec((d, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((d, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, N), u.dtype),
            jax.ShapeDtypeStruct((1, N), u.dtype),
        ],
        interpret=interpret,
    )(u, half[:, None], X, C, mu[:, None])
    return x, usq[0]


def sample_and_logq(
    u, half, X, C, mu, log_det, *, use_pallas=None, block_n: int = 128
):
    """Fused ``(x, logq)`` from standard-normal draws ``u`` (d, N).

    ``half = sqrt(diag A)``, ``X``/``C`` from the Woodbury factor. The lax
    path is the default; pass ``use_pallas=True`` for the Pallas kernel
    (interpret-mode off-TPU). Both paths are bit-identical on TPU.
    """
    d, N = u.shape
    if use_pallas is None:
        use_pallas = False  # XLA fusion matches the kernel; opt-in only
    if not use_pallas:
        return sample_and_logq_lax(u, half, X, C, mu, log_det)
    pad = _round_up(N, block_n) - N
    u_p = jnp.pad(u, ((0, 0), (0, pad))) if pad else u
    x, usq = _sample_pallas(u_p, half, X, C, mu, block_n, not _on_tpu())
    x, usq = x[:, :N], usq[:N]
    logq = -0.5 * (d * _LOG_2PI + log_det + usq)
    return x, logq


# ---------------------------------------------------------------------------
# fused whiten + column sumsq (Mahalanobis for logpdf / invquad)
# ---------------------------------------------------------------------------


def _whiten_kernel(x_ref, half_ref, X_ref, Ci_ref, mu_ref, maha_ref):
    v = (x_ref[:] - mu_ref[:]) / half_ref[:]  # (d, Nt)
    X = X_ref[:]
    acc = jnp.promote_types(v.dtype, jnp.float32)
    t = jnp.dot(X.T, v, preferred_element_type=acc)
    s = jnp.dot(Ci_ref[:], t, preferred_element_type=acc)
    w = v + jnp.dot(X, s, preferred_element_type=acc).astype(v.dtype)
    maha_ref[:] = jnp.sum(w * w, axis=0, keepdims=True)


def whiten_sumsq_lax(x, half, X, Ci, mu):
    v = (x - mu[:, None]) / half[:, None]
    w = v + X @ (Ci @ (X.T @ v))
    return jnp.sum(w * w, axis=0)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _whiten_pallas(x, half, X, Ci, mu, block_n: int, interpret: bool):
    d, N = x.shape
    m = X.shape[1]
    grid = (pl.cdiv(N, block_n),)
    (maha,) = pl.pallas_call(
        _whiten_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, block_n), lambda i: (0, i)),
            pl.BlockSpec((d, 1), lambda i: (0, 0)),
            pl.BlockSpec((d, m), lambda i: (0, 0)),
            pl.BlockSpec((m, m), lambda i: (0, 0)),
            pl.BlockSpec((d, 1), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, block_n), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((1, N), x.dtype)],
        interpret=interpret,
    )(x, half[:, None], X, Ci, mu[:, None])
    return maha[0]


def whiten_sumsq(x, half, X, Ci, mu, *, use_pallas=None, block_n: int = 128):
    """Fused Mahalanobis distances ``‖L⁻¹(x−μ)‖²`` for columns of ``x`` —
    the logpdf / importance-weighting hot path (diagonal-A factors)."""
    d, N = x.shape
    if use_pallas is None:
        use_pallas = False  # XLA fusion matches the kernel; opt-in only
    if not use_pallas:
        return whiten_sumsq_lax(x, half, X, Ci, mu)
    pad = _round_up(N, block_n) - N
    x_p = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    maha = _whiten_pallas(x_p, half, X, Ci, mu, block_n, not _on_tpu())
    return maha[:N]
