"""Model-layer tests: shapes, conditioning, param golden counts
(SURVEY.md §4 'do better, cheaply': unit tests per model)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.models import discriminator, generator
from dvdgan_tpu.ops import resize
from dvdgan_tpu.ops import spectral_norm as sn

G_CFG = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                emb_dim=16, attn_res=16)
DS_CFG = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
DT_CFG = DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5)


def key(i=0):
    return jax.random.PRNGKey(i)


def test_generator_output_shape_and_range():
    p, stats = generator.init(key(0), G_CFG)
    z = jax.random.normal(key(1), (2, G_CFG.z_dim))
    y = jnp.array([0, 4])
    video, new_stats = generator.apply(p, stats, z, y, G_CFG, train=True)
    assert video.shape == (2, 4, 32, 32, 3)
    v = np.asarray(video)
    assert v.min() >= -1.0 and v.max() <= 1.0
    assert np.isfinite(v).all()
    # BN stats must have advanced in train mode
    before = jax.tree.leaves(stats)
    after = jax.tree.leaves(new_stats)
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_generator_eval_mode_uses_running_stats():
    p, stats = generator.init(key(0), G_CFG)
    z = jax.random.normal(key(1), (2, G_CFG.z_dim))
    y = jnp.array([1, 2])
    _, s1 = generator.apply(p, stats, z, y, G_CFG, train=False)
    # eval mode must not mutate stats
    for b, a in zip(jax.tree.leaves(stats), jax.tree.leaves(s1)):
        assert np.array_equal(np.asarray(b), np.asarray(a))


def test_generator_class_conditioning_changes_output():
    p, stats = generator.init(key(0), G_CFG)
    z = jax.random.normal(key(1), (1, G_CFG.z_dim))
    v0, _ = generator.apply(p, stats, z, jnp.array([0]), G_CFG, train=False)
    v1, _ = generator.apply(p, stats, z, jnp.array([3]), G_CFG, train=False)
    assert not np.allclose(np.asarray(v0), np.asarray(v1))


def test_generator_frames_differ_over_time():
    """The ConvGRU must make frames temporally distinct even though the
    per-frame conv stack is identical (the latent seed is constant in T)."""
    p, stats = generator.init(key(0), G_CFG)
    z = jax.random.normal(key(1), (1, G_CFG.z_dim))
    v, _ = generator.apply(p, stats, z, jnp.array([2]), G_CFG, train=False)
    v = np.asarray(v)
    assert not np.allclose(v[0, 0], v[0, -1])


def test_ds_shapes_and_projection():
    p = discriminator.ds_init(key(0), DS_CFG)
    frames = jax.random.normal(key(1), (3, DS_CFG.k_frames, 32, 32, 3))
    y = jnp.array([0, 1, 4])
    s = discriminator.ds_apply(p, frames, y, DS_CFG)
    assert s.shape == (3,)
    # class-conditional: same frames, different label → different score
    s2 = discriminator.ds_apply(p, frames, jnp.array([1, 0, 2]), DS_CFG)
    assert not np.allclose(np.asarray(s), np.asarray(s2))


def test_dt_shapes():
    p = discriminator.dt_init(key(0), DT_CFG)
    clip = jax.random.normal(key(1), (2, 4, 32, 32, 3))   # FULL res
    s = discriminator.dt_apply(p, clip, jnp.array([0, 3]), DT_CFG)
    assert s.shape == (2,)
    assert np.isfinite(np.asarray(s)).all()


def test_dt_applies_phi_internally():
    """dt_apply(full clip) == the pooled clip run through the blocks by
    hand (φ lives inside DT; callers never pre-pool)."""
    from dvdgan_tpu.ops import resblocks

    p = discriminator.dt_init(key(0), DT_CFG)
    clip = jax.random.normal(key(1), (2, 4, 32, 32, 3))
    x = resize.avg_pool_2x_video(clip)
    n_down = len(DT_CFG.mults) - 1
    for i, blk in enumerate(p["blocks"][:DT_CFG.n_3d_blocks]):
        x = resblocks.dblock3d(blk, x, down=(i < n_down), first=(i == 0))
    got = discriminator.dt_apply(p, clip, jnp.array([0, 3]), DT_CFG)
    assert got.shape == (2,) and np.isfinite(np.asarray(got)).all()


def test_dt_pooled_flag_bitwise():
    """dt_apply(clip) == dt_apply(φ(clip), pooled=True) BITWISE — the
    train step's D-phase pre-pooling (one φ per step instead of one per
    DT forward) relies on this exactness."""
    p = discriminator.dt_init(key(0), DT_CFG)
    clip = jax.random.normal(key(1), (2, 4, 32, 32, 3))
    y = jnp.array([0, 3])
    a = discriminator.dt_apply(p, clip, y, DT_CFG)
    b = discriminator.dt_apply(p, resize.avg_pool_2x_video(clip), y, DT_CFG,
                               pooled=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sn_covers_all_model_kernels():
    """Every conv/linear kernel and embedding in G, DS, DT opts into the SN
    pass (SURVEY §2.1: SN everywhere)."""
    for params in [generator.init(key(0), G_CFG)[0],
                   discriminator.ds_init(key(1), DS_CFG),
                   discriminator.dt_init(key(2), DT_CFG)]:
        u = sn.sn_init(key(3), params)
        from dvdgan_tpu.core import tree as tru
        flat = tru.flatten_with_paths(params)
        kernels = [p for p in flat
                   if p.rsplit("/", 1)[-1] in ("w", "emb")]
        assert set(kernels) == set(u.keys())
        assert len(kernels) > 0


def test_remat_gradients_match_nonremat():
    """GConfig.remat must be a pure memory/VJP-schedule change: gradients
    bitwise-close to the non-remat trace (SURVEY §5.7)."""
    import dataclasses
    cfg_r = dataclasses.replace(G_CFG, remat=True)
    p, stats = generator.init(key(0), G_CFG)
    z = jax.random.normal(key(1), (2, G_CFG.z_dim))
    y = jnp.array([0, 3])

    def loss(p, c):
        v, _ = generator.apply(p, stats, z, y, c, train=True)
        return (v ** 2).mean()

    g1 = jax.grad(lambda p: loss(p, G_CFG))(p)
    g2 = jax.grad(lambda p: loss(p, cfg_r))(p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_save_policies_bitwise(monkeypatch):
    """DVDGAN_REMAT_SAVE selects WHICH named intermediates remat keeps
    (gru_hs / ups_out) — a pure recompute-schedule change: the op graph is
    identical, so losses and gradients must be BITWISE equal to the
    default recompute-everything policy. Trace-time knob: each variant
    traces a fresh closure (layers._tphase_interleave caveat)."""
    import dataclasses
    cfg_r = dataclasses.replace(G_CFG, remat=True)
    p, stats = generator.init(key(0), G_CFG)
    z = jax.random.normal(key(1), (2, G_CFG.z_dim))
    y = jnp.array([0, 3])

    def run(save):
        monkeypatch.setenv("DVDGAN_REMAT_SAVE", save)

        def loss(p):
            v, _ = generator.apply(p, stats, z, y, cfg_r, train=True)
            return (v ** 2).mean()

        return jax.value_and_grad(loss)(p)

    l0, g0 = run("none")
    for save in ("gru", "ups", "gru+ups"):
        l1, g1 = run(save)
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    import pytest
    with pytest.raises(ValueError):
        run("typo")
