"""Compute ground-truth posterior moments for bench config 4 (Bayesian
logistic regression, d=25, synthetic German-credit-scale data) with long
in-repo NUTS, and save them to ``benchmarks/logreg25_truth.npz``.

Run once (CPU, float64 for a clean referee):

    python benchmarks/compute_logreg_truth.py

The bench (``bench.py --all``) picks the file up automatically and reports
standardized moment errors against it. R-hat / ESS of the referee run are
printed and stored so the truth quality is auditable.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main(num_chains=8, num_samples=20_000, num_warmup=2_000):
    from pathfinder_tpu import pathfinder
    from pathfinder_tpu.integrations.nuts import nuts
    from pathfinder_tpu.integrations.hmc import WoodburyMetric
    from pathfinder_tpu.models.zoo import (
        LogisticRegression,
        german_credit_synthetic,
    )
    from pathfinder_tpu.utils.diagnostics import ess_bulk, split_rhat

    X, y, _ = german_credit_synthetic(n=1000, d=25, seed=0)
    target = LogisticRegression(X, y)  # float64 on CPU

    # warm start from Pathfinder (the package's own headline workflow)
    res = pathfinder(
        target, key=jax.random.key(0), ndraws=num_chains, maxiters=200,
        history_length=25, dtype=jnp.float64,
    )
    assert res.success
    metric = WoodburyMetric.from_result(res)
    vg = jax.value_and_grad(target.logp)

    keys = jax.random.split(jax.random.key(1), num_chains)
    x0s = res.draws[:, :num_chains].T  # (chains, d)
    out = jax.vmap(
        lambda k, x: nuts(
            k, vg, metric, x, num_samples=num_samples,
            num_warmup=num_warmup, max_depth=8,
        )
    )(keys, x0s)
    samples = np.asarray(out.samples)  # (chains, num_samples, d)

    rhat = np.asarray(split_rhat(jnp.asarray(samples)))
    ess = np.asarray(ess_bulk(jnp.asarray(samples)))
    print(f"max R-hat: {rhat.max():.4f}  min bulk ESS: {ess.min():.0f}")
    assert rhat.max() < 1.01, "referee chains did not mix"
    assert ess.min() > 1000, "referee ESS too low"

    flat = samples.reshape(-1, samples.shape[-1])
    mean = flat.mean(axis=0)
    sd = flat.std(axis=0, ddof=1)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "logreg25_truth.npz")
    np.savez(
        out_path, mean=mean, sd=sd, max_rhat=rhat.max(), min_ess=ess.min(),
        num_chains=num_chains, num_samples=num_samples,
    )
    print(f"saved {out_path}")
    print("mean[:5] =", mean[:5])
    print("sd[:5]   =", sd[:5])


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
