"""Weighted resampling of pooled multi-path draws.

Replaces the reference's ``StatsBase.sample`` usage (``src/resample.jl:
58-72``): sampling *with* replacement is a categorical over the (smoothed)
weights; *without* replacement uses Gumbel-top-k (Efraimidis–Spirakis), which
draws exactly the successive weighted-without-replacement distribution.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pathfinder_tpu.ops.psis import PSISResult

__all__ = ["resample_indices", "resample_draws"]


def resample_indices(
    key: jax.Array,
    total: int,
    ndraws: int,
    log_weights: Optional[jax.Array] = None,
    replace: bool = True,
) -> jax.Array:
    """Sample ``ndraws`` indices from ``0..total-1``; uniform when
    ``log_weights`` is None."""
    if replace:
        if log_weights is None:
            return jax.random.randint(key, (ndraws,), 0, total)
        # inverse-CDF sampling: O(total + ndraws) memory. (categorical would
        # materialize an (ndraws, total) Gumbel matrix — 100k draws from a
        # 100k pool is ~10^10 elements.)
        w = jax.nn.softmax(log_weights)
        cdf = jnp.cumsum(w)
        u = jax.random.uniform(key, (ndraws,), dtype=cdf.dtype)
        idx = jnp.searchsorted(cdf, u * cdf[-1], side="right")
        return jnp.clip(idx, 0, total - 1)
    if ndraws > total:
        raise ValueError(
            f"cannot draw {ndraws} from {total} without replacement"
        )
    if log_weights is None:
        return jax.random.permutation(key, total)[:ndraws]
    # Gumbel-top-k can only fill ndraws slots from positive-weight entries:
    # -inf + gumbel = -inf, so once the support is exhausted top_k would
    # return arbitrary zero-probability indices (e.g. draws whose target
    # density was NaN, mapped to weight 0 by PSIS). The with-replacement
    # inverse-CDF path can never select such an entry; keep the two
    # branches' guarantees consistent by refusing instead. (Host-side
    # check — this is the public resample path, not a jitted core.)
    n_support = int(jnp.sum(log_weights > -jnp.inf))
    if ndraws > n_support:
        raise ValueError(
            f"cannot draw {ndraws} without replacement: only {n_support} "
            f"of {total} pooled draws have nonzero importance weight "
            "(use replace=True, or fewer draws)"
        )
    g = jax.random.gumbel(key, (total,), dtype=log_weights.dtype)
    _, idx = jax.lax.top_k(log_weights + g, ndraws)
    return idx


def resample_draws(
    key: jax.Array,
    draws_per_component: jax.Array,  # (K, N, d)
    psis_result: Optional[PSISResult],
    ndraws: int,
    replace: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Parity: ``_resample`` (``src/resample.jl:58-72``).

    Pools the ``(K, N, d)`` per-component draws (component-major order,
    matching the reference's column-major ``vec``), samples ``ndraws`` of
    them by PSIS weight (or uniformly when ``psis_result`` is None), and
    returns ``(draws (d, ndraws), component_ids (ndraws,))``.
    """
    K, N, d = draws_per_component.shape
    lw = None if psis_result is None else psis_result.log_weights
    idx = resample_indices(key, K * N, ndraws, lw, replace=replace)
    if isinstance(draws_per_component, np.ndarray):
        # host-offloaded pool (multipathfinder offload_launches): indices
        # come from the device weights as usual, the gather runs on host
        # so the K-scale pool is never re-uploaded — only the selected
        # draws go back to the device. The pool is usually a swapaxes
        # VIEW; a (rows, cols) fancy-index gathers straight from it
        # (reshape would silently copy the whole K·N·d pool first).
        # Identical values by construction.
        idx_np = np.asarray(idx)
        sel = draws_per_component[idx_np // N, idx_np % N]  # (ndraws, d)
        draws = jnp.asarray(np.ascontiguousarray(sel.T))
    else:
        flat = draws_per_component.reshape(K * N, d)
        draws = flat[idx].T
    component_ids = idx // N
    return draws, component_ids
