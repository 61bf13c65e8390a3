"""Experiment: does selecting the trajectory candidate by IS effective
sample size (instead of ELBO) improve headline khat at d=1000?

Background (NOTES.md round-3 root-cause): on the hierarchical bench
target the ELBO genuinely ties between a far-from-mass component with
huge entropy and the well-located ones — mode-seeking KL cannot see what
matters for importance sampling. The per-candidate log ratios needed for
an IS-aware criterion are already computed by the ELBO loop, so a
different selection rule is nearly free.

Rules compared per path (same ndraws_elbo draws, same keys):
  - elbo:   argmax mean(logr)                       (the algorithm)
  - ess:    argmax ESS(w), w ∝ exp(logr)            (IS-aware)
  - lcb:    argmax elbo - 1*se                      (variance-penalized)

For each rule, the selected per-path fits feed the identical
PSIS+resample pipeline; khat + moment errors vs quadrature truth.

Run: python benchmarks/candidate_selection_experiment.py [ndraws_elbo]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pathfinder_tpu.models.zoo import HierarchicalGaussian, hierarchical_gaussian_truth
from pathfinder_tpu.multipath import _compute_psis_result, multipathfinder
from pathfinder_tpu.ops.elbo import elbo_and_samples
from pathfinder_tpu.ops.lbfgs import lbfgs_inverse_hessians
from pathfinder_tpu.ops.mvnormal import MvNormal
from pathfinder_tpu.ops.resample import resample_draws


def main(d=1000, K=100, ndraws_elbo=30, ndraws=1000):
    target = HierarchicalGaussian(d, seed=0)
    mean_true, sd_true = hierarchical_gaussian_truth(d, seed=0)

    res = multipathfinder(
        target, ndraws, key=jax.random.key(0), nruns=K, maxiters=256,
        ftol=10.0,
    )
    print(f"baseline (elbo, ndraws_elbo=5): khat={float(res.psis_result.pareto_shape):.2f}")

    cfg = res.config

    def per_path_scores(state):
        """Replay per-candidate estimates with ndraws_elbo draws; return
        (elbo, se, ess) arrays over candidates plus the batched fits."""
        fits, mask, _ = lbfgs_inverse_hessians(
            state.trace, history_length=cfg.history_length,
            epsilon_curvature=cfg.epsilon_curvature,
        )
        mus = jax.vmap(lambda c, g, x: x + c.mul(g))(
            fits, state.trace.gradients, state.trace.xs
        )
        dists = jax.tree_util.tree_map(lambda l: l[1:], MvNormal(mus, fits))
        key_elbo, _ = jax.random.split(state.key)
        L = cfg.maxiters

        def one(i, dst):
            est = elbo_and_samples(
                jax.random.fold_in(key_elbo, i), target.logp, dst, ndraws_elbo
            )
            logr = est.log_density_ratios
            lw = logr - jnp.max(logr)
            w = jnp.exp(lw)
            ess = jnp.sum(w) ** 2 / jnp.sum(w * w)
            return est.value, est.std_err, ess

        # evaluate candidates in chunks of 16 via lax.map (the core's
        # chunked-ELBO structure): a single flat 256-candidate vmap nested
        # inside the path vmap miscompiles on TPU at d=1000 (draws turn
        # non-finite only when the target-logp eval is fused in; see
        # NOTES.md round-3)
        C = 16
        idx_chunks = jnp.arange(L).reshape(L // C, C)

        def chunk_scores(idx):
            dst = jax.tree_util.tree_map(lambda l: l[idx], dists)
            return jax.vmap(one)(idx, dst)

        vals, ses, esss = jax.lax.map(chunk_scores, idx_chunks)
        vals = vals.reshape(L)
        ses = ses.reshape(L)
        esss = esss.reshape(L)
        valid = mask[1:] & (jnp.arange(L) < state.trace.num_valid - 1)
        neg = jnp.asarray(-jnp.inf, vals.dtype)
        vals = jnp.where(valid & jnp.isfinite(vals), vals, neg)
        esss = jnp.where(valid & jnp.isfinite(vals), esss, 0.0)
        return vals, ses, esss, dists

    @jax.jit
    def select_all():
        vals, ses, esss, dists = jax.vmap(per_path_scores)(res.states)
        out = {}
        for name, idx in (
            ("elbo", jnp.argmax(vals, axis=1)),
            ("ess", jnp.argmax(esss, axis=1)),
            ("lcb", jnp.argmax(jnp.where(jnp.isfinite(vals), vals - ses, -jnp.inf), axis=1)),
        ):
            sel = jax.vmap(
                lambda dst, i: jax.tree_util.tree_map(lambda l: l[i], dst)
            )(dists, idx)
            out[name] = (idx, sel)
        return out

    selections = select_all()
    N_per = res.draws_per_component.shape[1]
    for name, (idx, comps) in selections.items():
        key_d = jax.random.fold_in(jax.random.key(42), hash(name) % 1000)
        keys = jax.random.split(key_d, K)
        draws_knd = jax.vmap(lambda c, k: c.sample(k, N_per).T)(comps, keys)
        psis_res = _compute_psis_result(target.logp, comps, draws_knd)
        rd, _ = resample_draws(jax.random.key(7), draws_knd, psis_res, ndraws)
        x = np.asarray(rd)
        me = float(np.max(np.abs(x.mean(1) - mean_true) / sd_true))
        se_ = float(np.max(np.abs(x.std(1) - sd_true) / sd_true))
        print(
            f"{name:5s}: khat={float(psis_res.pareto_shape):.2f} "
            f"moment_err_mean={me:.2f}sd sd_err={se_:.2f} "
            f"median_sel_iter={int(np.median(np.asarray(idx)))}"
        )


if __name__ == "__main__":
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    main(ndraws_elbo=nd)
