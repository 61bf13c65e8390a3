"""Parameter-dimension (d-axis) sharding tests on the virtual CPU mesh.

Validates SURVEY §5's "sequence-parallel analog": Woodbury operations and
the full single-path Pathfinder core run correctly with θ/B/draws sharded
over a ``dim`` mesh, with XLA inserting the m-length reduction collectives,
and produce results identical to the unsharded run.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pathfinder_tpu.models import StandardNormal
from pathfinder_tpu.ops.mvnormal import MvNormal
from pathfinder_tpu.ops.woodbury import WoodburyPDMat
from pathfinder_tpu.parallel.dim_sharding import dim_mesh, shard_dim
from pathfinder_tpu.singlepath import PathfinderConfig, pathfinder_core


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return dim_mesh(jax.devices()[:8])


def test_woodbury_ops_dim_sharded(mesh):
    rng = np.random.default_rng(0)
    d, m = 512, 8
    A = rng.uniform(0.5, 2.0, d)
    B = rng.standard_normal((d, m)) / np.sqrt(d)
    D = np.eye(m) * 0.5
    x = rng.standard_normal((d, 16))

    @jax.jit
    def compute(A, B, D, x):
        W = WoodburyPDMat.from_parts(A, B, D)
        return W.logdet(), W.solve(x), W.unwhiten(x), W.invquad(x)

    ref = compute(jnp.asarray(A), jnp.asarray(B), jnp.asarray(D), jnp.asarray(x))
    with mesh:
        A_s, B_s, x_s = shard_dim((jnp.asarray(A), jnp.asarray(B), jnp.asarray(x)), mesh, dim=d)
        out = compute(A_s, B_s, jnp.asarray(D), x_s)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-10)
    # the solve output really is sharded over the dim axis
    shard_shapes = [s.data.shape for s in out[1].addressable_shards]
    assert all(ss[0] == d // 8 for ss in shard_shapes)


def test_mvnormal_sampling_dim_sharded(mesh):
    rng = np.random.default_rng(1)
    d, m = 256, 4
    A = jnp.asarray(rng.uniform(0.5, 2.0, d))
    B = jnp.asarray(rng.standard_normal((d, m)) / np.sqrt(d))
    D = jnp.eye(m)
    mu = jnp.asarray(rng.standard_normal(d))

    @jax.jit
    def draw(A, B, D, mu, key):
        dist = MvNormal(mu, WoodburyPDMat.from_parts(A, B, D))
        return dist.rand_and_logpdf(key, 32)

    key = jax.random.key(0)
    x_ref, lq_ref = draw(A, B, D, mu, key)
    with mesh:
        A_s, B_s, mu_s = shard_dim((A, B, mu), mesh, dim=d)
        x_s, lq_s = draw(A_s, B_s, D, mu_s, key)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lq_s), np.asarray(lq_ref), rtol=1e-12)


def test_pathfinder_core_dim_sharded(mesh):
    """The full jitted core runs with the parameter axis sharded and matches
    the unsharded result."""
    d = 256
    target = StandardNormal(d)
    config = PathfinderConfig(maxiters=16, history_length=4, ndraws_elbo=4, ndraws=8)
    key = jax.random.key(3)
    x0 = jnp.asarray(np.random.default_rng(2).uniform(-2, 2, d).astype(np.float64))

    ref = pathfinder_core(key, x0, target, config)
    with mesh:
        x0_s = jax.device_put(
            x0, NamedSharding(mesh, P("dim"))
        )
        out = pathfinder_core(key, x0_s, target, config)
    assert bool(out.success) and bool(ref.success)
    assert int(out.fit_iteration) == int(ref.fit_iteration)
    np.testing.assert_allclose(
        np.asarray(out.fit_distribution.mean),
        np.asarray(ref.fit_distribution.mean),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out.draws), np.asarray(ref.draws), atol=1e-10
    )


def test_shard_dim_replicates_small_cores(mesh):
    """Default dim inference must only shard the largest leading axis —
    m-by-m cores stay replicated."""
    B = jnp.ones((512, 8))
    D = jnp.ones((8, 8))
    B_s, D_s = shard_dim((B, D), mesh)
    b_spec = B_s.sharding.spec
    d_spec = D_s.sharding.spec
    assert b_spec[0] == "dim"
    assert len(d_spec) == 0 or all(s is None for s in d_spec)


def test_shard_dim_rejects_indivisible_explicit_dim(mesh):
    """An explicit dim the mesh cannot divide must raise, not silently
    replicate every leaf."""
    x = jnp.zeros(1001)
    with pytest.raises(ValueError, match="not divisible"):
        shard_dim((x,), mesh, dim=1001)


def test_shard_dim_warns_when_nothing_shardable(mesh):
    """Default-dim discovery finding no divisible leading axis must warn
    that everything will be replicated."""
    with pytest.warns(UserWarning, match="REPLICATED"):
        shard_dim((jnp.zeros(7), jnp.zeros(3)), mesh)


def test_multipath_on_combined_paths_dim_mesh(mesh):
    """The combined 2-D ('paths', 'dim') layout (SURVEY §2c: paths over
    one mesh axis AND the parameter dimension over the other) runs the
    full multipath pipeline through GSPMD and agrees with the unsharded
    run; the discrete decisions (success, fit iterations) are identical
    and the numerics agree to reassociation level."""
    from pathfinder_tpu.multipath import multipathfinder
    from pathfinder_tpu.parallel.sharding import paths_dim_mesh

    d = 64
    target = StandardNormal(d)
    kw = dict(ndraws=64, nruns=4, maxiters=30, ndraws_elbo=8)
    res_u = multipathfinder(target, key=jax.random.key(3), **kw)
    mesh2 = paths_dim_mesh(4, jax.devices()[:8])
    assert dict(mesh2.shape) == {"paths": 4, "dim": 2}
    res_s = multipathfinder(target, key=jax.random.key(3), mesh=mesh2, **kw)
    np.testing.assert_array_equal(
        np.asarray(res_s.states.success), np.asarray(res_u.states.success)
    )
    np.testing.assert_array_equal(
        np.asarray(res_s.states.fit_iteration),
        np.asarray(res_u.states.fit_iteration),
    )
    np.testing.assert_allclose(
        np.asarray(res_s.draws), np.asarray(res_u.draws), atol=1e-8
    )
    # indivisible d errors with the axis named
    with pytest.raises(ValueError, match="'dim' mesh axis"):
        multipathfinder(
            StandardNormal(63), key=jax.random.key(3), mesh=mesh2,
            ndraws=16, nruns=4, maxiters=10,
        )


def test_shard_dim_rejects_explicit_dim_matching_no_leaf(mesh):
    """A mesh-divisible explicit dim that matches no leaf's leading axis
    must raise, not silently replicate everything (e.g. the user padded
    the arrays to d_pad but still passed the old d)."""
    x = jnp.zeros(1024)  # padded
    with pytest.raises(ValueError, match="matches no leaf"):
        shard_dim((x,), mesh, dim=1000 - 1000 % 8)  # stale divisible d
    # the matching dim still works
    out = shard_dim((x,), mesh, dim=1024)
    assert out[0].shape == (1024,)
