"""HMC warm-start integration: low-rank Euclidean metric + sampler.

Parity targets: the reference's AdvancedHMC extension (builds a
``RankUpdateEuclideanMetric`` from the Woodbury fit covariance, reusing its
factorization — ``ext/PathfinderAdvancedHMCExt.jl:17-23``) and DynamicHMC
extension (``GaussianKineticEnergy(M⁻¹::WoodburyPDMat)`` with kinetic energy
``quad(M⁻¹, p)/2`` and momentum square root from the factor —
``ext/PathfinderDynamicHMCExt.jl:7-15``).

Because neither BlackJAX nor NumPyro is assumed present, this module ships a
self-contained jitted HMC with dual-averaging step-size adaptation that
consumes the metric directly — playing the role the reference delegates to
AdvancedHMC/DynamicHMC in its integration tests
(``test/integration/*/runtests.jl``). The whole sampler is ``lax.scan``-based
and vmaps over chains.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from pathfinder_tpu.ops.mvnormal import MvNormal
from pathfinder_tpu.ops.woodbury import WoodburyPDMat

__all__ = ["WoodburyMetric", "leapfrog", "hmc", "hmc_warm_start"]


def _tree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    return jax.tree_util.register_dataclass(cls)


@_tree_dataclass
class WoodburyMetric:
    """Euclidean metric with inverse mass matrix ``M⁻¹ = W`` (the Pathfinder
    fit covariance), all operations in low-rank form via the cached
    factorization — nothing n×n is ever formed.

    * kinetic energy:  ``K(p) = pᵀ M⁻¹ p / 2 = quad(W, p)/2``
      (ref ``ext/PathfinderDynamicHMCExt.jl:11-15``)
    * its gradient:    ``∇K(p) = W p``
    * momentum draws:  ``p = L⁻ᵀ z``, ``z ~ N(0, I)`` so ``cov(p) = L⁻ᵀL⁻¹ =
      W⁻¹ = M`` (the reference's ``W_sqrt = inv(F.R)``,
      ``ext/PathfinderDynamicHMCExt.jl:7-9``)
    """

    minv: WoodburyPDMat

    @property
    def dim(self) -> int:
        return self.minv.dim

    def kinetic_energy(self, p: jax.Array) -> jax.Array:
        return 0.5 * self.minv.quad(p)

    def grad_kinetic(self, p: jax.Array) -> jax.Array:
        return self.minv.mul(p)

    def sample_momentum(self, key: jax.Array) -> jax.Array:
        z = jax.random.normal(key, (self.dim,), dtype=self.minv.dtype)
        return self.minv.inv_unwhiten(z)  # L⁻ᵀ z

    @staticmethod
    def from_fit(fit: MvNormal) -> "WoodburyMetric":
        return WoodburyMetric(fit.cov)

    @staticmethod
    def diag(inv_mass_diag: jax.Array, rank: int = 0) -> "WoodburyMetric":
        """Pure-diagonal metric ``M⁻¹ = diag(inv_mass_diag)`` as a degenerate
        Woodbury matrix (``rank`` zero-masked low-rank columns, so the pytree
        structure matches fits of history length ``rank/2`` — required when a
        diagonal update must replace a low-rank metric inside ``lax.scan``).

        The factorization is written in closed form (``a_half = sqrt(diag)``,
        zero low-rank cores) instead of calling ``pdfactorize`` — windowed
        adaptation constructs this every warmup step inside the scan, and
        the general path's rank-by-rank Cholesky work is pure waste for an
        all-masked B."""
        from pathfinder_tpu.ops.woodbury import WoodburyFactor

        d = inv_mass_diag.shape[0]
        dtype = inv_mass_diag.dtype
        Z = jnp.zeros((d, rank), dtype)
        Zm = jnp.zeros((rank, rank), dtype)
        F = WoodburyFactor(
            a_half=jnp.sqrt(inv_mass_diag),
            X=Z,
            C=Zm,
            Ci=Zm,
            log_det=jnp.sum(jnp.log(inv_mass_diag)),
        )
        return WoodburyMetric(WoodburyPDMat(inv_mass_diag, Z, Zm, F))

    @staticmethod
    def from_result(result, draw_index: int = 0) -> "WoodburyMetric":
        """From a :class:`PathfinderResult` (single path: the fit covariance)
        or a :class:`MultiPathfinderResult` (mixture fit: the covariance of
        the component that produced draw ``draw_index`` — the analog of the
        reference's per-path ``RankUpdateEuclideanMetric`` construction,
        since no single Woodbury matrix represents a mixture)."""
        # Validate the index up front — JAX gather semantics would
        # silently clamp an out-of-range draw_index to the last draw
        # (both here and in the warm starts' `draws[:, draw_index]`).
        ndraws = result.draws.shape[1]
        if not -ndraws <= draw_index < ndraws:
            raise IndexError(
                f"draw_index {draw_index} out of range for a result with "
                f"{ndraws} draws"
            )
        fd = result.fit_distribution
        if hasattr(fd, "cov"):
            return WoodburyMetric(fd.cov)
        # UniformMixture (multipath): pick the selected draw's component
        k = int(result.draw_component_ids[draw_index])
        return WoodburyMetric(fd.component(k).cov)

    # -- warm-start exports to external samplers ------------------------------
    # (the role of the reference's AdvancedHMC/DynamicHMC extensions,
    # ext/PathfinderAdvancedHMCExt.jl:17-23 / ext/PathfinderDynamicHMCExt.jl:7-15)

    def to_inverse_mass_matrix(self) -> jax.Array:
        """Dense ``M⁻¹ = W`` (the fit covariance) — the universal exchange
        format every HMC implementation accepts. O(d²) memory: only for
        export at moderate ``d``; the in-repo samplers use the factor form."""
        return self.minv.to_dense()

    def to_numpyro_mass_matrix(self) -> jax.Array:
        """NumPyro warm-start: ``numpyro.infer.HMC/NUTS(...,
        inverse_mass_matrix=<this>, adapt_mass_matrix=False)``. NumPyro's
        dense-mass API takes the *inverse* mass matrix = our ``W``; no
        NumPyro import is needed to build the array itself."""
        return self.to_inverse_mass_matrix()

    def to_blackjax(self):
        """BlackJAX warm-start: a ``blackjax.mcmc.metrics.Metric`` whose
        momentum sampling / kinetic energy run in O(d·m) low-rank form via
        the cached factorization (momentum ``p = L⁻ᵀ z`` ⇒ ``cov(p) = W⁻¹ =
        M``, the reference's RankUpdateEuclideanMetric trick). Requires
        blackjax; use :meth:`to_inverse_mass_matrix` as the dense fallback:
        ``blackjax.nuts(logdensity, step_size,
        inverse_mass_matrix=metric.to_inverse_mass_matrix())``."""
        try:
            from blackjax.mcmc.metrics import Metric
        except ImportError as e:  # pragma: no cover - env without blackjax
            raise ImportError(
                "BlackJAX is not installed; use to_inverse_mass_matrix() for "
                "the dense warm-start instead."
            ) from e

        # BlackJAX kernels call these with trailing position arguments
        # (sample_momentum(key, position), kinetic_energy(momentum,
        # position)) — accept and ignore them, as the dense Gaussian
        # metric does.
        def sample_momentum(key, position=None):
            return self.sample_momentum(key)

        def kinetic_energy(momentum, position=None):
            return self.kinetic_energy(momentum)

        def check_turning(p_left, p_right, p_sum):
            # BlackJAX's convention (gaussian_euclidean.is_turning):
            # rho = p_sum − (p_left + p_right)/2, turning when
            # ⟨M⁻¹p_end, ρ⟩ ≤ 0 on either end. Matching it exactly keeps
            # this Metric a drop-in for blackjax kernels — the raw-ρ Stan
            # variant would terminate trees at different depths than every
            # blackjax-built metric. One matvec: M⁻¹ρ dotted with each
            # endpoint is the same bilinear form (M⁻¹ symmetric).
            rho = p_sum - 0.5 * (p_left + p_right)
            minv_rho = self.minv.mul(rho)
            return (jnp.vdot(minv_rho, p_left) <= 0) | (
                jnp.vdot(minv_rho, p_right) <= 0
            )

        return Metric(sample_momentum, kinetic_energy, check_turning)


def resolve_result_value_and_grad(result) -> Callable:
    """``value_and_grad`` of the density a Pathfinder result's draws live
    in. Transform-aware results (BayesModel / ``transform=`` runs) sample in
    *unconstrained* space — their draws, metric, and stored ``logp`` all live
    there — so warm-started samplers must target the linked density, never
    the raw model input; plain results honor a user-supplied gradient via
    ``as_log_density``."""
    from pathfinder_tpu.models.protocol import as_log_density, cached_value_and_grad

    tld = getattr(result, "transform", None)
    if tld is not None:
        return tld.unconstrained.value_and_grad
    try:
        if result.input is not None:
            return as_log_density(result.input).value_and_grad
    except TypeError:
        pass
    return cached_value_and_grad(result.logp)


def leapfrog_step(value_and_grad: Callable, metric: WoodburyMetric, x, p, g, eps):
    """One leapfrog step; ``g = ∇logp(x)`` (= −∇U). Returns
    ``(x, p, g, logp)`` at the new point. The single integration kernel
    shared by :func:`leapfrog`/:func:`hmc` and the NUTS tree builder."""
    p_half = p + 0.5 * eps * g
    x_new = x + eps * metric.grad_kinetic(p_half)
    logp_new, g_new = value_and_grad(x_new)
    p_new = p_half + 0.5 * eps * g_new
    return x_new, p_new, g_new, logp_new


def leapfrog(value_and_grad: Callable, metric: WoodburyMetric, x, p, grad_x, eps, n_steps: int):
    """``n_steps`` leapfrog steps; returns ``(x, p, logp, grad)`` at the end.

    ``value_and_grad(x) -> (logp, ∇logp)``; potential U = −logp.
    """

    if n_steps < 1:
        # a zero-length scan would make logps[-1] an out-of-bounds gather
        # on an empty axis — undefined values under jit, not an error
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")

    def step(carry, _):
        x, p, g = carry
        x, p, g, logp = leapfrog_step(value_and_grad, metric, x, p, g, eps)
        return (x, p, g), logp

    (x, p, g), logps = lax.scan(step, (x, p, grad_x), None, length=n_steps)
    return x, p, logps[-1], g


def da_init(init_step_size, dtype):
    """Dual-averaging state ``(mu, log_eps, log_eps_bar, h_acc, t)``
    (Hoffman & Gelman 2014, sec. 3.2). ``log_eps_bar`` is seeded with
    ``init_step_size`` so a zero-length warmup samples at the requested
    step size; the first update (weight ``w = 1^{-κ} = 1``) overwrites it
    entirely."""
    le = jnp.asarray(jnp.log(init_step_size), dtype)
    return (
        jnp.asarray(jnp.log(10.0 * init_step_size), dtype),
        le,
        le,
        jnp.zeros((), dtype),
        jnp.zeros((), dtype),
    )


def da_update(da, astat, target_accept):
    """One dual-averaging step (Hoffman & Gelman 2014, eq. 6) — the single
    copy shared by :func:`hmc` and :func:`~pathfinder_tpu.integrations.nuts.nuts`."""
    mu, log_eps, log_eps_bar, h_acc, t_prev = da
    t = t_prev + 1.0
    kappa, gamma, t0 = 0.75, 0.05, 10.0
    h_acc = (1.0 - 1.0 / (t + t0)) * h_acc + (target_accept - astat) / (
        t + t0
    )
    log_eps = mu - jnp.sqrt(t) / gamma * h_acc
    w = t ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
    return (mu, log_eps, log_eps_bar, h_acc, t)


class HMCResult(NamedTuple):
    samples: jax.Array  # (num_samples, d)
    accept_prob: jax.Array  # (num_samples,)
    step_size: jax.Array  # () adapted step size
    log_densities: jax.Array  # (num_samples,)


@partial(
    jax.jit,
    static_argnames=(
        "value_and_grad",
        "num_samples",
        "num_warmup",
        "num_leapfrog",
    ),
)
def hmc(
    key: jax.Array,
    value_and_grad: Callable,
    metric: WoodburyMetric,
    x0: jax.Array,
    num_samples: int = 1000,
    num_warmup: int = 300,
    num_leapfrog: int = 16,
    init_step_size: float = 0.1,
    target_accept: float = 0.8,
) -> HMCResult:
    """Self-contained HMC with dual-averaging warmup, using the low-rank
    Woodbury metric. One chain; ``vmap`` for many."""
    dtype = x0.dtype
    logp0, grad0 = value_and_grad(x0)

    def mh_step(x, logp, g, eps_base, k):
        """One Metropolis-Hastings HMC transition at base step size
        ``eps_base`` (jittered ±20% to break resonances on near-Gaussian
        targets)."""
        k_mom, k_acc, k_jit = jax.random.split(k, 3)
        eps = eps_base * jax.random.uniform(
            k_jit, dtype=dtype, minval=0.8, maxval=1.2
        )
        p = metric.sample_momentum(k_mom)
        ke0 = metric.kinetic_energy(p)
        x_new, p_new, logp_new, g_new = leapfrog(
            value_and_grad, metric, x, p, g, eps, num_leapfrog
        )
        ke1 = metric.kinetic_energy(p_new)
        log_accept = (logp_new - ke1) - (logp - ke0)
        log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
        accept = jax.random.uniform(k_acc, dtype=dtype) < accept_prob
        x = jnp.where(accept, x_new, x)
        logp = jnp.where(accept, logp_new, logp)
        g = jnp.where(accept, g_new, g)
        return x, logp, g, accept_prob

    def transition(carry, k):
        x, logp, g, da = carry
        x, logp, g, accept_prob = mh_step(x, logp, g, jnp.exp(da[1]), k)
        da = da_update(da, accept_prob, target_accept)
        return (x, logp, g, da), (x, accept_prob, logp)

    keys_w = jax.random.split(jax.random.fold_in(key, 0), num_warmup)
    carry = (x0, logp0, grad0, da_init(init_step_size, dtype))
    carry, _ = lax.scan(transition, carry, keys_w)

    # freeze the adapted (averaged) step size for sampling
    x, logp, g, da = carry
    eps_final = jnp.exp(da[2])

    def sample_transition(carry, k):
        x, logp, g = carry
        x, logp, g, accept_prob = mh_step(x, logp, g, eps_final, k)
        return (x, logp, g), (x, accept_prob, logp)

    keys_s = jax.random.split(jax.random.fold_in(key, 1), num_samples)
    _, (xs, aps, lps) = lax.scan(sample_transition, (x, logp, g), keys_s)
    return HMCResult(samples=xs, accept_prob=aps, step_size=eps_final, log_densities=lps)


def hmc_warm_start(
    key: jax.Array,
    result,
    *,
    num_samples: int = 1000,
    num_warmup: int = 300,
    num_leapfrog: int = 16,
    draw_index: int = 0,
    **kwargs,
) -> HMCResult:
    """Run HMC initialized from a Pathfinder result: initial position = a
    Pathfinder draw, metric = the fit's Woodbury covariance (the reference's
    primary use case, ``docs/src/index.md:21-37`` /
    ``docs/src/examples/initializing-hmc.md``)."""
    vg = resolve_result_value_and_grad(result)
    metric = WoodburyMetric.from_result(result, draw_index)
    x0 = result.draws[:, draw_index]
    return hmc(
        key,
        vg,
        metric,
        x0,
        num_samples=num_samples,
        num_warmup=num_warmup,
        num_leapfrog=num_leapfrog,
        **kwargs,
    )
