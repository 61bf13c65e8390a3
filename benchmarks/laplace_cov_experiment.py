"""Laplace covariance correction at the selected means (round 4).

The r03 oracle decomposition (NOTES.md) isolated the headline khat~2 to
the component *covariances* given the algorithm's own chosen locations:
"diagonal-oracle-at-same-means" (exact conditional variances at the
selected means) reached khat 0.95 through the same PSIS pipeline. That
oracle is computable: for a target with Gaussian conditionals, the
per-coordinate conditional precision at a point IS the diagonal of the
negative log-density Hessian there. This measures replacing each
selected component's L-BFGS covariance with a Laplace covariance AT THE
SAME MEAN:

- ``laplace_diag``: Sigma = diag(1 / diag(-H(mu))), per-coordinate
  fallback to the fitted Woodbury diagonal wherever diag(-H) <= 0
  (mu is not a stationary point, so -H need not be PD).
- ``laplace_full``: Sigma = (-H(mu))^-1 with an eigenvalue clamp
  (spectrum floored at eps * max-eig, the modified-Newton treatment,
  N&W sec 3.4) — captures the theta/log_tau cross-correlations the
  diagonal cannot.

Paired on the same optimizer states per key as TEMPER_r04 /
BENCH_headline_r04 (the ``fit`` control row reproduces the headline
khats bit-for-bit). Fresh draws per component for the corrected
covariances (the stored draws belong to the fitted covariance; the
control uses them unchanged).

Cost note: the Hessian diag/full at d=1000 costs d JVPs-of-grad per
component (batched over K=100 on the MXU); the script reports the wall
cost next to quality so the remedy's price is part of the result.

Run:  python benchmarks/laplace_cov_experiment.py [--out FILE]
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.jsonl_util import dump_row

D = int(os.environ.get("LAPLACE_D", "1000"))
N_PATHS = int(os.environ.get("LAPLACE_PATHS", "100"))
NDRAWS_OUT = 1000
KEYS = [1, 2, 3, 4, 5][: int(os.environ.get("LAPLACE_KEYS", "5"))]
OPTIMIZERS = os.environ.get("LAPLACE_OPTS", "lbfgs,cg").split(",")
_LOG_2PI = math.log(2.0 * math.pi)


def main(out_path):
    from bench import _moment_errors, hierarchical_truth
    from pathfinder_tpu.models.zoo import HierarchicalGaussian
    from pathfinder_tpu.multipath import (
        _log_importance_ratios_fit,
        _select_component_fits,
    )
    from pathfinder_tpu.ops.psis import psis
    from pathfinder_tpu.ops.resample import resample_draws
    from pathfinder_tpu.parallel.sharding import make_path_executor
    from pathfinder_tpu.singlepath import PathfinderConfig

    target = HierarchicalGaussian(D, seed=0)
    executor = make_path_executor(mesh=None)
    mean_true, sd_true = hierarchical_truth(D, seed=0)
    N = max(5, NDRAWS_OUT // N_PATHS)

    def make_base(optimizer):
        config = PathfinderConfig(
            maxiters=64, history_length=6, ndraws_elbo=5,
            ndraws=N, elbo_chunk=8, optimizer=optimizer,
        )

        @jax.jit
        def base(key):
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(N_PATHS)
            )
            x0s = jax.vmap(
                lambda k: jax.random.uniform(
                    k, (D,), jnp.float32, minval=-2.0, maxval=2.0
                )
            )(keys)
            states = executor(keys, x0s, target, config)
            comp = _select_component_fits(states)
            draws_knd = jnp.swapaxes(states.draws, 1, 2)  # (K, N, d)
            logq_own = _log_importance_ratios_fit(comp, draws_knd)
            fit_diag = jax.vmap(lambda c: c.cov.diag())(comp)  # (K, d)
            return comp.mean, draws_knd, logq_own, fit_diag

        return base

    # negative Hessian of logp at each component mean, batched over K.
    # d JVPs of grad per component — one big batched program on the MXU.
    @jax.jit
    def neg_hessians(mean_kd):
        hess = jax.vmap(jax.hessian(target.logp))(mean_kd)  # (K, d, d)
        return -hess

    @jax.jit
    def psis_of(key, mean_kd, draws_knd, logq_own):
        log_p = jax.vmap(jax.vmap(target.logp))(draws_knd)
        pr = psis((log_p - logq_own).reshape(-1))
        dr, _ = resample_draws(
            jax.random.fold_in(key, 0x7E39), draws_knd, pr, NDRAWS_OUT
        )
        return dr, pr.pareto_shape

    @jax.jit
    def diag_variant(key, mean_kd, negH, fit_diag):
        """Fresh draws + own-component logq for diagonal covariances
        var = 1/diag(-H), falling back per-coordinate to the fitted
        Woodbury diagonal where diag(-H) <= 0."""
        hd = jax.vmap(jnp.diag)(negH)  # (K, d)
        var = jnp.where(hd > 0, 1.0 / jnp.maximum(hd, 1e-30), fit_diag)
        sd = jnp.sqrt(var)
        K = mean_kd.shape[0]
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.fold_in(key, 0xD1A6), i)
        )(jnp.arange(K))
        u = jax.vmap(lambda k: jax.random.normal(k, (N, D), jnp.float32))(
            keys
        )  # (K, N, d)
        x = mean_kd[:, None, :] + sd[:, None, :] * u
        logq = -0.5 * (
            D * _LOG_2PI
            + jnp.sum(jnp.log(var), axis=1)[:, None]
            + jnp.sum(u * u, axis=2)
        )
        return x, logq, jnp.mean(jnp.sum(hd <= 0, axis=1))

    @jax.jit
    def full_variant(key, mean_kd, negH, fit_diag):
        """Fresh draws + own-component logq for Sigma = (-H)^-1 with the
        saddle-free spectrum treatment (|lambda|, the repo's Newton
        decision — see design.md): mu off a stationary point can have
        negative curvature directions, and |lambda| keeps their SCALE
        (variance 1/|lambda|) where a small positive floor would blow the
        variance up to 1/floor (measured: the floored variant khat 4.4 at
        d=50 from ONE clamped direction)."""
        w, V = jnp.linalg.eigh(negH)  # (K, d), (K, d, d)
        aw = jnp.abs(w)
        floor = 1e-8 * jnp.max(aw, axis=1, keepdims=True)
        wc = jnp.maximum(aw, floor)
        n_clamped = jnp.mean(jnp.sum(w <= 0, axis=1))
        # Sigma^(1/2) = V diag(wc^-1/2) V^T ; logdet Sigma = -sum log wc
        K = mean_kd.shape[0]
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.fold_in(key, 0xF011), i)
        )(jnp.arange(K))
        u = jax.vmap(lambda k: jax.random.normal(k, (N, D), jnp.float32))(
            keys
        )  # (K, N, d)
        # x = mu + V wc^-1/2 V^T u  (einsum over the batch)
        vtu = jnp.einsum("kde,kne->knd", jnp.swapaxes(V, 1, 2), u)
        scaled = vtu * jax.lax.rsqrt(wc)[:, None, :]
        x = mean_kd[:, None, :] + jnp.einsum("kde,kne->knd", V, scaled)
        logdet = -jnp.sum(jnp.log(wc), axis=1)  # (K,)
        logq = -0.5 * (
            D * _LOG_2PI + logdet[:, None] + jnp.sum(u * u, axis=2)
        )
        return x, logq, n_clamped

    rows = []

    def record(fh, **row):
        rows.append(row)
        fh.write(dump_row(row) + "\n")
        fh.flush()
        print(row, flush=True)

    with open(out_path, "w") as fh:
        for optimizer in OPTIMIZERS:
            base = make_base(optimizer)
            for s in KEYS:
                key = jax.random.key(s)
                t0 = time.time()
                mean_kd, draws_knd, logq_own, fit_diag = (
                    jax.block_until_ready(base(key))
                )
                t_base = time.time() - t0

                # control: the fitted covariances, stored draws
                dr, k = psis_of(key, mean_kd, draws_knd, logq_own)
                me, se = _moment_errors(np.asarray(dr), mean_true, sd_true)
                record(fh, variant="fit", optimizer=optimizer, key=s,
                       khat=round(float(k), 3), moment_err_mean=round(me, 3),
                       moment_err_sd=round(se, 3),
                       wall_s=round(t_base, 3))

                t0 = time.time()
                negH = jax.block_until_ready(neg_hessians(mean_kd))
                t_hess = time.time() - t0

                for name, fn in (("laplace_diag", diag_variant),
                                 ("laplace_full", full_variant)):
                    t0 = time.time()
                    x, logq, n_bad = fn(key, mean_kd, negH, fit_diag)
                    dr, k = psis_of(key, mean_kd, x, logq)
                    jax.block_until_ready(dr)
                    t_var = time.time() - t0
                    me, se = _moment_errors(
                        np.asarray(dr), mean_true, sd_true
                    )
                    record(fh, variant=name, optimizer=optimizer, key=s,
                           khat=round(float(k), 3),
                           moment_err_mean=round(me, 3),
                           moment_err_sd=round(se, 3),
                           wall_s=round(t_var, 3),
                           hess_wall_s=round(t_hess, 3),
                           mean_nonpd_coords=round(float(n_bad), 1))

        # summaries
        for optimizer in OPTIMIZERS:
            for variant in ("fit", "laplace_diag", "laplace_full"):
                sel = [r for r in rows if r["variant"] == variant
                       and r["optimizer"] == optimizer]
                if not sel:
                    continue
                ks = [r["khat"] for r in sel if np.isfinite(r["khat"])]
                mes = [r["moment_err_mean"] for r in sel
                       if np.isfinite(r["moment_err_mean"])]
                record(
                    fh, summary=True, variant=variant, optimizer=optimizer,
                    khat_median=round(float(np.median(ks)), 3)
                    if ks else float("nan"),
                    khat_range=[round(min(ks), 3), round(max(ks), 3)]
                    if ks else None,
                    moment_err_mean_median=round(float(np.median(mes)), 3)
                    if mes else float("nan"),
                )


if __name__ == "__main__":
    out = "benchmarks/LAPLACE_COV_r04.jsonl"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    main(out)
