"""Time-axis context parallelism for DT (SURVEY §5.7): the sharded forward
must match the unsharded dt_apply to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.models import DTConfig, discriminator
from dvdgan_tpu.parallel import make_mesh
from dvdgan_tpu.parallel.time_shard import make_sharded_dt
from dvdgan_tpu.ops import resize

CFG = DTConfig(img_size=32, n_frames=8, ch=8, n_classes=5)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs multi-device")
def test_time_sharded_dt_matches_unsharded():
    n_time = 4
    mesh = make_mesh(shape=(n_time,), axis_names=("time",),
                     devices=jax.devices()[:n_time])
    params = discriminator.dt_init(jax.random.PRNGKey(0), CFG)
    # FULL-res clip: φ is folded into the stem on both paths
    clip = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32, 32, 3))
    y = jnp.array([0, 3])

    want = discriminator.dt_apply(params, clip, y, CFG)
    got = make_sharded_dt(params, CFG, mesh)(clip, y)
    assert np.allclose(np.asarray(want), np.asarray(got), rtol=1e-4,
                       atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device")
def test_time_sharded_dt_grads_match():
    n_time = 2
    mesh = make_mesh(shape=(n_time,), axis_names=("time",),
                     devices=jax.devices()[:n_time])
    params = discriminator.dt_init(jax.random.PRNGKey(0), CFG)
    clip = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32, 32, 3))
    y = jnp.array([2])

    def loss_unsharded(p):
        return discriminator.dt_apply(p, clip, y, CFG).sum()

    def loss_sharded(p):
        return make_sharded_dt(p, CFG, mesh)(clip, y).sum()

    g1 = jax.grad(loss_unsharded)(params)
    g2 = jax.grad(loss_sharded)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                           atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device")
def test_paired_halo_conv_matches_plain():
    """The cout>=64 temporal-pair halo conv (layers.conv3d_tpair_core with
    pre-halo'd input) == the plain SAME conv3d over the full clip — the
    production (TPAIR_ENABLED) code path the other tests' tiny channels
    never reach."""
    from jax.sharding import PartitionSpec as P

    from dvdgan_tpu.ops import layers, resblocks
    from dvdgan_tpu.parallel import time_shard

    assert resblocks.TPAIR_ENABLED   # shipped default engages the pair path
    n_time = 2
    mesh = make_mesh(shape=(n_time,), axis_names=("time",),
                     devices=jax.devices()[:n_time])
    p = layers.conv3d_init(jax.random.PRNGKey(5), (3, 3, 3), 8, 64)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 6, 6, 8))

    want = layers.conv3d(p, x)

    def fn(shard):
        return time_shard._conv3d_halo(p, shard, "time")

    got = jax.shard_map(fn, mesh=mesh, in_specs=P(None, "time"),
                        out_specs=P(None, "time"), check_vma=False)(x)
    assert np.allclose(np.asarray(want), np.asarray(got), rtol=1e-4,
                       atol=1e-4)
