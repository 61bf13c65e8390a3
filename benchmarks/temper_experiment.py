"""Proposal-tempering experiment at the headline config (round 4).

The last unmeasured candidate-quality lever at d=1000: the r03 oracle
decomposition (NOTES.md) showed that at the algorithm's own chosen
component locations, a *better covariance* reaches khat ~= 0.95
("diagonal-oracle-at-same-means") while the fitted covariances give ~1.7-2.2.
Every lever that moves the *locations* is a measured negative
(OPTCOMP_r04, INIT_SCALE_r04, candidate-selection rules, trajectory
length, J, ndraws_elbo). This script measures the two classical IS
proposal-repair knobs that keep the locations fixed and only change the
proposal *shape*, through the exact headline pipeline on the same keys:

1. **Scalar tempering** ``beta``: component ``N(mu, Sigma)`` becomes
   ``N(mu, beta^2 Sigma)``. Tempered draws are an affine rescale of the
   stored draws about their component means (same underlying randomness):
   ``x' = mu + beta (x - mu)``, and the own-component log density shifts
   by ``-d log beta`` (the Mahalanobis term is invariant under the pair
   transform).
2. **Student-t tails** ``nu``: component becomes multivariate-t
   ``t_nu(mu, Sigma)`` via the scale-mixture representation
   ``x' = mu + (x - mu)/sqrt(g)``, ``g ~ ChiSq(nu)/nu`` per draw. Heavy
   tails are the textbook fix for unbounded importance weights; if the
   weight tail at the chosen locations is driven by the Gaussian
   proposal's thin tails, a small ``nu`` should pull khat below 1.

Both variants reuse the SAME optimizer states per key (one executor run
per key), so the comparison is paired. Output: JSONL rows
``{variant, param, key, khat, moment_err_mean, moment_err_sd}`` plus a
summary line per (variant, param) with median/range.

Run:  python benchmarks/temper_experiment.py [--out FILE]
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

D = int(os.environ.get("TEMPER_D", "1000"))
N_PATHS = int(os.environ.get("TEMPER_PATHS", "100"))
NDRAWS_OUT = 1000
KEYS = [1, 2, 3, 4, 5][: int(os.environ.get("TEMPER_KEYS", "5"))]
BETAS = [1.0, 1.25, 1.5, 2.0, 3.0, 5.0]
NUS = [2.0, 3.0, 5.0, 10.0, 30.0]
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
    config = PathfinderConfig(
        maxiters=64, history_length=6, ndraws_elbo=5,
        ndraws=max(5, NDRAWS_OUT // N_PATHS), elbo_chunk=8,
    )
    executor = make_path_executor(mesh=None)
    mean_true, sd_true = hierarchical_truth(D, seed=0)

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
        logq_own = _log_importance_ratios_fit(comp, draws_knd)  # (K, N)
        logdet = jax.vmap(lambda c: c.cov.logdet())(comp)  # (K,)
        return comp.mean, draws_knd, logq_own, logdet

    @jax.jit
    def gauss_temper(key, mean_kd, draws_knd, logq_own, beta):
        x = mean_kd[:, None, :] + beta * (draws_knd - mean_kd[:, None, :])
        log_p = jax.vmap(jax.vmap(target.logp))(x)
        log_q = logq_own - D * jnp.log(beta)
        pr = psis((log_p - log_q).reshape(-1))
        dr, _ = resample_draws(
            jax.random.fold_in(key, 0x7E39), x, pr, NDRAWS_OUT
        )
        return dr, pr.pareto_shape

    @jax.jit
    def t_temper(key, mean_kd, draws_knd, logq_own, logdet, nu):
        K, N, _ = draws_knd.shape
        # maha of the stored draws, recovered from the Gaussian logq
        maha = -2.0 * logq_own - D * _LOG_2PI - logdet[:, None]
        g = (
            2.0
            * jax.random.gamma(
                jax.random.fold_in(key, 0x70FF), nu / 2.0, (K, N)
            )
            / nu
        )
        scale = jax.lax.rsqrt(g)
        x = mean_kd[:, None, :] + scale[:, :, None] * (
            draws_knd - mean_kd[:, None, :]
        )
        maha_t = maha / g
        log_q = (
            jax.scipy.special.gammaln((nu + D) / 2.0)
            - jax.scipy.special.gammaln(nu / 2.0)
            - 0.5 * D * jnp.log(nu * jnp.pi)
            - 0.5 * logdet[:, None]
            - 0.5 * (nu + D) * jnp.log1p(maha_t / nu)
        )
        log_p = jax.vmap(jax.vmap(target.logp))(x)
        pr = psis((log_p - log_q).reshape(-1))
        dr, _ = resample_draws(
            jax.random.fold_in(key, 0x7E39), x, pr, NDRAWS_OUT
        )
        return dr, pr.pareto_shape

    rows = []
    with open(out_path, "w") as fh:
        for s in KEYS:
            key = jax.random.key(s)
            t0 = time.time()
            mean_kd, draws_knd, logq_own, logdet = jax.block_until_ready(
                base(key)
            )
            print(f"key {s}: base pipeline {time.time()-t0:.1f}s",
                  flush=True)
            for beta in BETAS:
                dr, k = gauss_temper(
                    key, mean_kd, draws_knd, logq_own, jnp.float32(beta)
                )
                me, se = _moment_errors(np.asarray(dr), mean_true, sd_true)
                row = dict(variant="gauss", param=beta, key=s,
                           khat=round(float(k), 3),
                           moment_err_mean=round(me, 3),
                           moment_err_sd=round(se, 3))
                rows.append(row)
                fh.write(dump_row(row) + "\n")
                fh.flush()
                print(row, flush=True)
            for nu in NUS:
                dr, k = t_temper(
                    key, mean_kd, draws_knd, logq_own, logdet,
                    jnp.float32(nu),
                )
                me, se = _moment_errors(np.asarray(dr), mean_true, sd_true)
                row = dict(variant="student_t", param=nu, key=s,
                           khat=round(float(k), 3),
                           moment_err_mean=round(me, 3),
                           moment_err_sd=round(se, 3))
                rows.append(row)
                fh.write(dump_row(row) + "\n")
                fh.flush()
                print(row, flush=True)

        # summaries
        for variant, params in (("gauss", BETAS), ("student_t", NUS)):
            for p in params:
                ks = [r["khat"] for r in rows
                      if r["variant"] == variant and r["param"] == p]
                mes = [r["moment_err_mean"] for r in rows
                       if r["variant"] == variant and r["param"] == p]
                finite = [k for k in ks if np.isfinite(k)]
                summary = dict(
                    summary=True, variant=variant, param=p,
                    khat_median=round(float(np.median(finite)), 3)
                    if finite else float("nan"),
                    khat_range=[round(min(finite), 3), round(max(finite), 3)]
                    if finite else None,
                    moment_err_mean_median=round(float(np.median(mes)), 3),
                )
                fh.write(dump_row(summary) + "\n")
                print(summary, flush=True)


if __name__ == "__main__":
    out = "benchmarks/TEMPER_r04.jsonl"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    main(out)
