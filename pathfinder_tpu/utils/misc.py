"""Small shared utilities (parity: ``src/utils.jl``).

The reference's concurrency helpers (``_chunk_tmap`` etc., ``src/utils.jl:
15-49``) have no JAX analog — task parallelism becomes ``vmap``/``shard_map``
and the determinism-by-seeding idiom becomes per-item ``fold_in`` keys — but
the NaN-skipping argmax semantics (``_findmax_skipnan``,
``src/utils.jl:51-72``) are load-bearing for the ELBO success predicate and
are reproduced exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["findmax_skipnan"]


def findmax_skipnan(values, valid_mask=None):
    """``(max, argmax)`` of ``values``, skipping NaNs.

    Semantics match reference ``_findmax_skipnan`` (``src/utils.jl:51-72``):
    NaN entries are skipped; ties resolve to the first index; if every entry
    is NaN the result is ``(NaN, 0)``. ``valid_mask`` marks entries that
    exist at all (masked entries behave like NaN) — the fixed-shape analog of
    the reference's variable-length candidate list.
    """
    values = jnp.asarray(values)
    isnan = jnp.isnan(values)
    if valid_mask is not None:
        isnan = isnan | ~valid_mask
    keyed = jnp.where(isnan, -jnp.inf, values)
    # argmax returns the first index among ties; an all-(-inf) row gives 0,
    # matching the reference's "first entry retained even if NaN" rule.
    idx = jnp.argmax(keyed)
    # reference subtlety: genuine -Inf values are *not* skipped — if the best
    # non-NaN value is -Inf, argmax may land on a NaN/masked slot; force it
    # to the first genuinely non-NaN slot instead.
    has_valid = ~jnp.all(isnan)
    first_valid = jnp.argmax(~isnan)
    idx = jnp.where(has_valid & (keyed[idx] == -jnp.inf), first_valid, idx)
    value = jnp.where(has_valid, values[idx], jnp.nan)
    return value, idx
