"""PPL bridges: run Pathfinder on models from probabilistic programming
languages.

The reference's deepest integration is its Turing/DynamicPPL extension
(``ext/PathfinderTuringExt.jl``): link the model to unconstrained space with
the change-of-variables Jacobian, run Pathfinder there, and convert draws
back to constrained space. The JAX-ecosystem analog is NumPyro; this module
provides the same three steps through NumPyro's ``initialize_model`` when
NumPyro is installed (it is an optional dependency — the adapter raises a
clear ImportError otherwise, everything else in the package works without
it).

Always-available helpers: :func:`draws_to_dict` (named constrained draws)
and :func:`to_inference_data` (ArviZ export, also gated on availability).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from pathfinder_tpu.models.protocol import LogDensity

__all__ = ["from_numpyro", "NumPyroTarget", "draws_to_dict", "to_inference_data"]


class NumPyroTarget:
    """A NumPyro model linked to unconstrained space (parity:
    ``create_log_density_function`` + ``draws_to_chains``,
    ``ext/PathfinderTuringExt.jl:22-48``).

    ``target`` is the unconstrained :class:`LogDensity` to hand to
    ``pathfinder``/``multipathfinder``; ``constrain_draws`` maps a
    ``(dim, ndraws)`` unconstrained draw matrix to a dict of named
    constrained parameter arrays (leading draws axis)."""

    def __init__(self, model, model_args=(), model_kwargs=None, seed=0):
        try:
            from numpyro.infer.util import initialize_model
        except ImportError as e:  # pragma: no cover - env without numpyro
            raise ImportError(
                "NumPyro is not installed; the from_numpyro adapter requires "
                "it. Every other pathfinder_tpu feature works without it."
            ) from e
        from jax.flatten_util import ravel_pytree

        model_kwargs = model_kwargs or {}
        init = initialize_model(
            jax.random.key(seed), model,
            model_args=model_args, model_kwargs=model_kwargs,
            dynamic_args=False,
        )
        params0 = init.param_info.z
        potential_fn = init.potential_fn
        self._postprocess = init.postprocess_fn
        flat0, unravel = ravel_pytree(params0)
        self._unravel = unravel

        def logp(x):
            return -potential_fn(unravel(x))

        self.target = LogDensity(logp=logp, dim=int(flat0.shape[0]))
        self.init_point = flat0

    def constrain_draws(self, draws: jax.Array) -> Dict[str, jax.Array]:
        """Unconstrained ``(dim, ndraws)`` → named constrained arrays."""
        post = self._postprocess

        def one(x):
            return post(self._unravel(x))

        return jax.vmap(one, in_axes=1)(draws)


def from_numpyro(model, *model_args, seed: int = 0, **model_kwargs) -> NumPyroTarget:
    """Build a :class:`NumPyroTarget` from a NumPyro model callable."""
    return NumPyroTarget(
        model, model_args=model_args, model_kwargs=model_kwargs, seed=seed
    )


def draws_to_dict(result, names=None, transform=None) -> Dict[str, Any]:
    """Named draw export (the chain-conversion analog for plain targets).

    ``result`` is a Pathfinder result; ``names`` optionally labels the
    parameter axis (default ``x0..x{d-1}``); ``transform`` (a bijector or
    :class:`TransformedLogDensity`) maps draws to constrained space first.
    Returns ``{name: (ndraws,) array}``."""
    draws = result.draws
    if transform is not None:
        fwd = getattr(transform, "forward_draws", None) or (
            lambda dz: jax.vmap(transform.forward, in_axes=1, out_axes=1)(dz)
        )
        draws = fwd(draws)
    d = draws.shape[0]
    if names is None:
        names = [f"x{i}" for i in range(d)]
    elif len(names) != d:
        # iterating a short names list would silently discard the
        # trailing parameter rows
        raise ValueError(
            f"names has {len(names)} entries for {d} parameters"
        )
    return {name: draws[i] for i, name in enumerate(names)}


def to_inference_data(result, names=None, transform=None):
    """Export draws as an ArviZ ``InferenceData`` when ArviZ is installed;
    otherwise return the plain dict from :func:`draws_to_dict`."""
    data = draws_to_dict(result, names=names, transform=transform)
    try:
        import arviz  # optional

        import numpy as np

        return arviz.from_dict(
            posterior={k: np.asarray(v)[None, :] for k, v in data.items()}
        )
    except ImportError:
        return data
