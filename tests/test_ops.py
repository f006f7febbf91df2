import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.core import init as winit
from dvdgan_tpu.ops import (attention, convgru, layers, losses, norm,
                            resblocks, resize)


def key(i=0):
    return jax.random.PRNGKey(i)


# ------------------------------------------------------------------ init ----

def test_orthogonal_init_is_orthogonal():
    w = winit.orthogonal(key(0), (64, 32))
    gram = w.T @ w
    assert np.allclose(np.asarray(gram), np.eye(32), atol=1e-5)


def test_orthogonal_conv_kernel():
    w = winit.orthogonal(key(1), (3, 3, 4, 16))
    m = w.reshape(-1, 16)
    assert np.allclose(np.asarray(m.T @ m), np.eye(16), atol=1e-5)


# ---------------------------------------------------------------- layers ----

def test_linear_shapes_and_dtype():
    p = layers.linear_init(key(0), 7, 11)
    x = jnp.ones((3, 7), jnp.bfloat16)
    y = layers.linear(p, x)
    assert y.shape == (3, 11) and y.dtype == jnp.bfloat16


def test_conv2d_matches_numpy_direct():
    p = layers.conv2d_init(key(1), 3, 2, 5)
    x = jax.random.normal(key(2), (2, 8, 8, 2))
    y = layers.conv2d(p, x)
    assert y.shape == (2, 8, 8, 5)
    # spot-check one output against an explicit dot over the padded window:
    # for output (i, j), the 3x3 window in padded coords is xp[i:i+3, j:j+3]
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    w = np.asarray(p["w"])
    got = float(y[0, 3, 4, 0])
    ref0 = float(np.sum(xp[0, 3:6, 4:7, :, None] * w[:, :, :, 0:1]) + p["b"][0])
    assert abs(got - ref0) < 1e-4, (got, ref0)


def test_conv3d_shape():
    p = layers.conv3d_init(key(3), (3, 3, 3), 3, 6)
    x = jnp.ones((2, 4, 8, 8, 3))
    y = layers.conv3d(p, x, stride=(1, 2, 2))
    assert y.shape == (2, 4, 4, 4, 6)


def test_embedding_lookup():
    p = layers.embedding_init(key(4), 10, 6)
    y = layers.embedding(p, jnp.array([0, 3, 9]))
    assert y.shape == (3, 6)
    assert np.allclose(np.asarray(y[1]), np.asarray(p["emb"][3]))


# ---------------------------------------------------------------- resize ----

def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = resize.upsample_nearest_2x(x)
    assert y.shape == (1, 4, 4, 1)
    assert float(y[0, 0, 0, 0]) == float(y[0, 1, 1, 0]) == 0.0
    assert float(y[0, 2, 1, 0]) == 2.0  # block (1,0) duplicates orig [1,0]=2
    assert float(y[0, 3, 3, 0]) == 3.0  # block (1,1) duplicates orig [1,1]=3


def test_avg_pool_roundtrip():
    x = jax.random.normal(key(5), (2, 4, 4, 3))
    y = resize.avg_pool_2x(x)
    assert y.shape == (2, 2, 2, 3)
    assert abs(float(y.mean() - x.mean())) < 1e-6


# ------------------------------------------------------------------ norm ----

def test_bn_normalizes_batch():
    p = norm.bn_init(None, 4)
    stats = norm.stats_init(4)
    x = 3.0 + 2.0 * jax.random.normal(key(6), (16, 5, 5, 4))
    y, new_stats = norm.bn(p, stats, x, train=True)
    assert abs(float(y.mean())) < 1e-4 and abs(float(y.std()) - 1.0) < 1e-2
    assert not np.allclose(np.asarray(new_stats["mean"]), 0.0)


def test_bn_eval_uses_running_stats():
    p = norm.bn_init(None, 2)
    stats = {"mean": jnp.array([1.0, -1.0]), "var": jnp.array([4.0, 0.25])}
    x = jnp.ones((2, 1, 1, 2))
    y, out_stats = norm.bn(p, stats, x, train=False)
    expect = (1.0 - np.array([1.0, -1.0])) / np.sqrt(np.array([4.0, 0.25]) + 1e-5)
    assert np.allclose(np.asarray(y[0, 0, 0]), expect, atol=1e-5)
    assert out_stats is stats


def test_cbn_per_sample_affine():
    p = norm.cbn_init(key(7), 3, 4)
    stats = norm.stats_init(4)
    x = jax.random.normal(key(8), (6, 2, 2, 4))
    cond = jax.random.normal(key(9), (6, 3))
    y, _ = norm.cbn(p, stats, x, cond, train=True)
    assert y.shape == x.shape
    # different cond rows -> different outputs for identical inputs
    x2 = jnp.broadcast_to(x[:1], x.shape)
    y2, _ = norm.cbn(p, stats, x2, cond, train=True)
    assert not np.allclose(np.asarray(y2[0]), np.asarray(y2[1]))


def test_cross_replica_bn_matches_global_batch():
    """pmean'd per-shard moments == single-device full-batch moments."""
    from jax.sharding import Mesh, PartitionSpec as P

    p = norm.bn_init(None, 4)
    stats = norm.stats_init(4)
    x = jax.random.normal(key(10), (16, 3, 3, 4)) * 2.0 + 1.0

    y_ref, st_ref = norm.bn(p, stats, x, train=True)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def shard_fn(x):
        y, st = norm.bn(p, stats, x, train=True, axis_name="data")
        return y, st["mean"], st["var"]

    y_sh, mean_sh, var_sh = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"),),
        out_specs=(P("data"), P(), P()))(x)
    assert np.allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5)
    assert np.allclose(np.asarray(mean_sh), np.asarray(st_ref["mean"]), atol=1e-6)
    assert np.allclose(np.asarray(var_sh), np.asarray(st_ref["var"]), atol=1e-5)


# --------------------------------------------------------------- convgru ----

def test_convgru_matches_python_loop():
    c = 4
    p = convgru.convgru_init(key(11), c)
    x = jax.random.normal(key(12), (2, 5, 6, 6, c))
    y = convgru.convgru(p, x)
    assert y.shape == x.shape
    # hand-rolled reference loop
    h = jnp.zeros((2, 6, 6, c))
    outs = []
    for t in range(5):
        h = convgru.convgru_cell(p, x[:, t], h)
        outs.append(h)
    ref = jnp.stack(outs, axis=1)
    assert np.allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_convgru_state_propagates():
    c = 2
    p = convgru.convgru_init(key(13), c)
    x = jax.random.normal(key(14), (1, 4, 4, 4, c))
    y = convgru.convgru(p, x)
    x_perm = x[:, ::-1]
    y_perm = convgru.convgru(p, x_perm)
    # temporal order matters (recurrence, not per-frame map)
    assert not np.allclose(np.asarray(y[:, -1]), np.asarray(y_perm[:, 0]))


# ------------------------------------------------------------- attention ----

def test_attention_identity_at_init():
    c = 16
    p = attention.separable_attn_init(key(15), c)
    x = jax.random.normal(key(16), (2, 3, 4, 4, c))
    y = attention.separable_attn(p, x)
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-6)  # gamma=0


def test_attention_nontrivial_when_gamma_set():
    c = 16
    p = attention.separable_attn_init(key(17), c)
    p["spatial"]["gamma"] = jnp.float32(1.0)
    p["temporal"]["gamma"] = jnp.float32(1.0)
    x = jax.random.normal(key(18), (1, 2, 4, 4, c))
    y = attention.separable_attn(p, x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_spatial_attention_matches_dense_einsum():
    """The folded/pooled implementation == explicit dense attention (no pool
    case: use odd H/W so pooling is skipped)."""
    c = 8
    p = attention.separable_attn_init(key(19), c)
    p["spatial"]["gamma"] = jnp.float32(0.7)
    x = jax.random.normal(key(20), (1, 1, 3, 3, c))
    y = attention.separable_attn(p, x)

    tok = x.reshape(1, 9, c)
    q = tok @ p["spatial"]["theta"]["w"]
    k = tok @ p["spatial"]["phi"]["w"]
    v = tok @ p["spatial"]["g"]["w"]
    a = jax.nn.softmax(q @ k.transpose(0, 2, 1), axis=-1)
    o = (a @ v) @ p["spatial"]["out"]["w"]
    ref = tok + 0.7 * o  # temporal pass with T=1: softmax over 1 token, but
    # gamma_t = 0 so it is identity.
    assert np.allclose(np.asarray(y.reshape(1, 9, c)), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------- blocks ----

def test_gresblock_upsample_shapes():
    p = resblocks.gresblock_init(key(21), 8, 4, cond_dim=5)
    st = resblocks.gresblock_stats_init(8, 4)
    x = jax.random.normal(key(22), (6, 4, 4, 8))
    cond = jax.random.normal(key(23), (6, 5))
    y, st2 = resblocks.gresblock(p, st, x, cond, train=True, upsample=True)
    assert y.shape == (6, 8, 8, 4)
    assert not np.allclose(np.asarray(st2["bn1"]["mean"]),
                           np.asarray(st["bn1"]["mean"]))


def test_dblock_shapes():
    p = resblocks.dblock_init(key(24), 3, 8, first=True)
    x = jax.random.normal(key(25), (2, 16, 16, 3))
    y = resblocks.dblock(p, x, down=True, first=True)
    assert y.shape == (2, 8, 8, 8)
    p2 = resblocks.dblock_init(key(26), 8, 8)
    y2 = resblocks.dblock(p2, y, down=False)
    assert y2.shape == (2, 8, 8, 8)


def test_dblock3d_shapes():
    p = resblocks.dblock3d_init(key(27), 3, 4, first=True)
    x = jax.random.normal(key(28), (2, 6, 16, 16, 3))
    y = resblocks.dblock3d(p, x, down=True, first=True)
    assert y.shape == (2, 6, 8, 8, 4)


# ---------------------------------------------------------------- losses ----

def test_hinge_losses():
    real = jnp.array([2.0, 0.5])
    fake = jnp.array([-2.0, 0.5])
    d = losses.d_hinge(real, fake)
    assert abs(float(d) - (0.25 + 0.75)) < 1e-6
    g = losses.g_hinge(fake)
    assert abs(float(g) - 0.75) < 1e-6


def test_grad_barrier_is_exact_identity():
    """layers.grad_barrier: forward identity, backward identity (the
    optimization barrier affects fusion only, never values) — checked
    through the dblock3d stem where it is wired."""
    from dvdgan_tpu.ops import layers, resblocks

    key = jax.random.PRNGKey(0)
    p = resblocks.dblock3d_init(key, 3, 8, first=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 3))

    def loss(p, x):
        return resblocks.dblock3d(p, x, down=True, first=True).sum()

    g_p, g_x = jax.jit(jax.grad(loss, argnums=(0, 1)))(p, x)

    # reference: same math with grad_barrier stubbed to identity
    orig = layers.grad_barrier
    try:
        layers.grad_barrier = lambda h: h
        r_p, r_x = jax.jit(jax.grad(loss, argnums=(0, 1)))(p, x)
    finally:
        layers.grad_barrier = orig

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), g_p, r_p)
    np.testing.assert_array_equal(g_x, r_x)


def test_upsample2x_conv3x3_matches_oracle():
    """Phase-decomposed up→conv (layers.upsample2x_conv3x3) is EXACTLY
    nearest-up-2× → SAME 3×3 conv — values and gradients (w, b, x) —
    including zero-pad boundaries and non-square inputs."""
    from dvdgan_tpu.ops import layers, resize

    key = jax.random.PRNGKey(0)
    p = layers.conv2d_init(key, 3, 5, 7)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6, 5))

    def oracle(p, x):
        return layers.conv2d(p, resize.upsample_nearest_2x(x))

    def fast(p, x):
        return layers.upsample2x_conv3x3(p, x)

    yo = oracle(p, x)
    yf = fast(p, x)
    assert yf.shape == yo.shape == (2, 8, 12, 7)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yo),
                               rtol=1e-5, atol=1e-5)

    go = jax.grad(lambda p, x: (oracle(p, x) ** 2).sum(), argnums=(0, 1))(p, x)
    gf = jax.grad(lambda p, x: (fast(p, x) ** 2).sum(), argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(go), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_gresblock_upsample_paths_match_previous_semantics():
    """gresblock's optimized upsample main/skip paths reproduce the plain
    up→conv formulation (skip 1×1 commutes with nearest-up exactly)."""
    from dvdgan_tpu.ops import layers, norm, resblocks, resize

    key = jax.random.PRNGKey(2)
    p = resblocks.gresblock_init(key, 6, 10, 12)
    stats = resblocks.gresblock_stats_init(6, 10)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 6))
    cond = jax.random.normal(jax.random.PRNGKey(4), (2, 12))

    y, _ = resblocks.gresblock(p, stats, x, cond, train=True, upsample=True)

    # reference formulation, inlined
    h, _ = norm.cbn(p["cbn1"], stats["bn1"], x, cond, True, None)
    h = jax.nn.relu(h)
    h = layers.conv2d(p["conv1"], resize.upsample_nearest_2x(h))
    h, _ = norm.cbn(p["cbn2"], stats["bn2"], h, cond, True, None)
    h = jax.nn.relu(h)
    h = layers.conv2d(p["conv2"], h)
    sc = layers.conv2d(p["skip"], resize.upsample_nearest_2x(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(h + sc),
                               rtol=1e-5, atol=1e-5)


def test_dblock_skip_pool_commute_exact():
    """avg-pool-2x commutes exactly with pointwise skip convs: the
    pool-first dblock/dblock3d skips reproduce conv-first (both linear);
    f32 equality to reassociation tolerance."""
    from dvdgan_tpu.ops import layers, resblocks, resize

    key = jax.random.PRNGKey(5)
    # 2-D, non-first with skip (the path whose order changed)
    p = resblocks.dblock_init(key, 6, 9)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 6))
    y = resblocks.dblock(p, x, down=True, first=False)
    # previous formulation of the skip: conv1x1 then pool
    h = jax.nn.relu(x)
    h = layers.conv2d(p["conv1"], h)
    h = jax.nn.relu(h)
    h = layers.conv2d(p["conv2"], h)
    h = resize.avg_pool_2x(h)
    sc = resize.avg_pool_2x(layers.conv2d(p["skip"], x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(h + sc),
                               rtol=1e-5, atol=1e-5)

    # 3-D
    p3 = resblocks.dblock3d_init(jax.random.PRNGKey(7), 6, 9)
    x3 = jax.random.normal(jax.random.PRNGKey(8), (2, 3, 8, 8, 6))
    y3 = resblocks.dblock3d(p3, x3, down=True, first=False)
    h3 = jax.nn.relu(x3)
    h3 = layers.conv3d(p3["conv1"], h3)
    h3 = jax.nn.relu(h3)
    h3 = layers.conv3d(p3["conv2"], h3)
    h3 = resize.avg_pool_2x_video(h3)
    sc3 = resize.avg_pool_2x_video(layers.conv3d(p3["skip"], x3))
    np.testing.assert_allclose(np.asarray(y3), np.asarray(h3 + sc3),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_tpair_matches_conv3d():
    """Temporal output-pair lowering (layers.conv3d_tpair): exact forward,
    reassociation-tolerance gradients, and the dblock3d TPAIR_ENABLED knob
    preserves the block's output."""
    p = layers.conv3d_init(jax.random.PRNGKey(40), (3, 3, 3), 5, 7)
    x = jax.random.normal(jax.random.PRNGKey(41), (2, 6, 4, 4, 5))
    np.testing.assert_allclose(np.asarray(layers.conv3d(p, x)),
                               np.asarray(layers.conv3d_tpair(p, x)),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, w, x):
        return (fn({"w": w, "b": p["b"]}, x) ** 2).sum()

    gw_a, gx_a = jax.grad(lambda w, x: loss(layers.conv3d, w, x),
                          argnums=(0, 1))(p["w"], x)
    gw_b, gx_b = jax.grad(lambda w, x: loss(layers.conv3d_tpair, w, x),
                          argnums=(0, 1))(p["w"], x)
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)

    # cout >= 64 so the knob's cout gate actually engages the paired path;
    # base MUST be computed with the knob off (the shipped default is ON)
    # and the prior value restored, not clobbered
    pb = resblocks.dblock3d_init(jax.random.PRNGKey(42), 5, 64, first=False)
    xb = jax.random.normal(jax.random.PRNGKey(43), (2, 4, 8, 8, 5))
    prev = resblocks.TPAIR_ENABLED
    try:
        resblocks.TPAIR_ENABLED = False
        base = resblocks.dblock3d(pb, xb, down=True)
        resblocks.TPAIR_ENABLED = True
        paired = resblocks.dblock3d(pb, xb, down=True)
    finally:
        resblocks.TPAIR_ENABLED = prev
    np.testing.assert_allclose(np.asarray(base), np.asarray(paired),
                               rtol=1e-5, atol=1e-5)


def test_conv2d_rowpair_matches_conv2d():
    """Output row-pair lowering (layers.conv2d_rowpair): exact forward,
    reassociation-tolerance gradients, odd widths fine (only H must be
    even), and the ROWPAIR_ENABLED knob preserves dblock/gresblock outputs."""
    p = layers.conv2d_init(jax.random.PRNGKey(50), 3, 5, 7)
    x = jax.random.normal(jax.random.PRNGKey(51), (2, 6, 7, 5))
    np.testing.assert_allclose(np.asarray(layers.conv2d(p, x)),
                               np.asarray(layers.conv2d_rowpair(p, x)),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, w, xx):
        return (fn({"w": w, "b": p["b"]}, xx) ** 2).sum()

    gw_a, gx_a = jax.grad(lambda w, xx: loss(layers.conv2d, w, xx),
                          argnums=(0, 1))(p["w"], x)
    gw_b, gx_b = jax.grad(lambda w, xx: loss(layers.conv2d_rowpair, w, xx),
                          argnums=(0, 1))(p["w"], x)
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)

    pb = resblocks.dblock_init(jax.random.PRNGKey(52), 5, 7, first=False)
    xb = jax.random.normal(jax.random.PRNGKey(53), (2, 8, 8, 5))
    prev = resblocks.ROWPAIR_ENABLED
    try:
        resblocks.ROWPAIR_ENABLED = False
        base = resblocks.dblock(pb, xb, down=True)
        resblocks.ROWPAIR_ENABLED = True
        paired = resblocks.dblock(pb, xb, down=True)
    finally:
        resblocks.ROWPAIR_ENABLED = prev
    np.testing.assert_allclose(np.asarray(base), np.asarray(paired),
                               rtol=1e-5, atol=1e-5)


def test_convgru_x_static_matches_broadcast_input():
    """x_static=True (input conv once + broadcast) == the full per-frame
    conv when all T frames are identical — the generator's level-0 case."""
    c, t, b = 6, 5, 2
    p = convgru.convgru_init(jax.random.PRNGKey(60), c)
    x0 = jax.random.normal(jax.random.PRNGKey(61), (b, 8, 8, c))
    x_seq = jnp.broadcast_to(x0[None], (t, b, 8, 8, c))
    base = convgru.convgru(p, x_seq, time_major=True)
    fast = convgru.convgru(p, x_seq, time_major=True, x_static=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fast),
                               rtol=1e-6, atol=1e-6)
    # and through a nonzero initial hidden state
    h0 = jax.random.normal(jax.random.PRNGKey(62), (b, 8, 8, c))
    base_h = convgru.convgru(p, x_seq, h0=h0, time_major=True)
    fast_h = convgru.convgru(p, x_seq, h0=h0, time_major=True, x_static=True)
    np.testing.assert_allclose(np.asarray(base_h), np.asarray(fast_h),
                               rtol=1e-6, atol=1e-6)


def test_conv3d_tphase_quad_matches_conv3d():
    """4-phase temporal lowering: exact forward and reassociation-tolerance
    gradients. Kept as available infrastructure — the dblock3d gate does
    NOT use it (measured a wash on-chip: 2× FLOPs cancel the 4× lane
    fill at the cout=32 stems; see _conv3d_main)."""
    p = layers.conv3d_init(jax.random.PRNGKey(70), (3, 3, 3), 5, 32)
    x = jax.random.normal(jax.random.PRNGKey(71), (2, 8, 4, 4, 5))
    want = layers.conv3d(p, x)
    got = layers.conv3d_tphase_core(p["w"], x, 4, (1, 1)) + p["b"]
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=1e-5, atol=1e-5)
    gw_a = jax.grad(lambda w: (layers.conv3d({"w": w}, x) ** 2).sum())(p["w"])
    gw_b = jax.grad(lambda w: (layers.conv3d_tphase_core(
        w, x, 4, (1, 1)) ** 2).sum())(p["w"])
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_b),
                               rtol=1e-4, atol=1e-4)


def test_tphase_interleave_variants_agree():
    """Both interleave lowerings ("moveaxis"/"stack") are the same math —
    forward and gradients bitwise on CPU (they reorder no arithmetic)."""
    p = layers.conv3d_init(jax.random.PRNGKey(80), (3, 3, 3), 6, 8)
    x = jax.random.normal(jax.random.PRNGKey(81), (2, 8, 4, 4, 6))

    def run():
        y, vjp = jax.vjp(
            lambda xx, ww: layers.conv3d_tphase_core(ww, xx, 2, (1, 1)),
            x, p["w"])
        return (y, *vjp(jnp.ones_like(y)))

    prev = os.environ.get("DVDGAN_TPHASE_INTERLEAVE")
    try:
        os.environ["DVDGAN_TPHASE_INTERLEAVE"] = "moveaxis"
        a = run()
        os.environ["DVDGAN_TPHASE_INTERLEAVE"] = "stack"
        b = run()
    finally:
        if prev is None:
            os.environ.pop("DVDGAN_TPHASE_INTERLEAVE", None)
        else:
            os.environ["DVDGAN_TPHASE_INTERLEAVE"] = prev
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_temporal_attention_modes_agree():
    """The folded-token and direct-einsum temporal passes compute the same
    attention (gradients to f32 reassociation tolerance)."""
    from dvdgan_tpu.ops import attention

    p = attention.separable_attn_init(jax.random.PRNGKey(82), 16)
    # nonzero gammas so both passes contribute
    p = jax.tree.map(lambda t: t + 0.1, p)
    x = jax.random.normal(jax.random.PRNGKey(83), (2, 4, 6, 6, 16))

    def run(tm):
        xx = jnp.moveaxis(x, 1, 0) if tm else x
        y, vjp = jax.vjp(
            lambda q: attention.separable_attn(p, q, time_major=tm), xx)
        return (y, *vjp(jnp.ones_like(xx)))

    prev = os.environ.get("DVDGAN_TEMPORAL_ATTN")
    try:
        for tm in (False, True):
            os.environ["DVDGAN_TEMPORAL_ATTN"] = "fold"
            a = run(tm)
            os.environ["DVDGAN_TEMPORAL_ATTN"] = "einsum"
            b = run(tm)
            for u, v in zip(a, b):
                np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                           rtol=1e-5, atol=1e-5)
    finally:
        if prev is None:
            os.environ.pop("DVDGAN_TEMPORAL_ATTN", None)
        else:
            os.environ["DVDGAN_TEMPORAL_ATTN"] = prev


def test_attention_proj_modes_agree(monkeypatch):
    """DVDGAN_ATTN_PROJ=fused (projections folded into the bmms as [C,C]
    weight products — the MXU-depth-friendly lowering) == pair (the literal
    SAGAN q/k/v graph), forward and all weight/input gradients, to f32
    reassociation tolerance. Also rejects typos (trace-time knob)."""
    from dvdgan_tpu.ops import attention

    p = attention.separable_attn_init(jax.random.PRNGKey(91), 16)
    p = jax.tree.map(lambda t: t + 0.1, p)
    x = jax.random.normal(jax.random.PRNGKey(92), (2, 4, 6, 6, 16))

    def run():
        def loss(pp, q):
            y = attention.separable_attn(pp, q)
            return (y * jnp.cos(y)).sum()
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
        return (l, *jax.tree.leaves(grads))

    monkeypatch.setenv("DVDGAN_ATTN_PROJ", "pair")
    a = run()
    monkeypatch.setenv("DVDGAN_ATTN_PROJ", "fused")
    b = run()
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=2e-4, atol=2e-4)
    monkeypatch.setenv("DVDGAN_ATTN_PROJ", "bogus")
    with pytest.raises(ValueError):
        attention.separable_attn(p, x)


def test_env_choice_rejects_typos(monkeypatch):
    """A/B env knobs must refuse unknown values instead of silently
    falling through to one lowering (review finding)."""
    from dvdgan_tpu.ops import layers

    monkeypatch.setenv("DVDGAN_KNOB_TEST", "stacked")
    with pytest.raises(ValueError, match="DVDGAN_KNOB_TEST"):
        layers.env_choice("DVDGAN_KNOB_TEST", "stack",
                          ("stack", "moveaxis"))
    monkeypatch.setenv("DVDGAN_KNOB_TEST", "moveaxis")
    assert layers.env_choice("DVDGAN_KNOB_TEST", "stack",
                             ("stack", "moveaxis")) == "moveaxis"
    monkeypatch.delenv("DVDGAN_KNOB_TEST")
    assert layers.env_choice("DVDGAN_KNOB_TEST", "stack",
                             ("stack", "moveaxis")) == "stack"


@pytest.mark.parametrize("t,hw,cin,cout", [
    (2, 4, 5, 7),    # minimal even T
    (4, 6, 2, 9),    # larger map, odd channels
    (8, 3, 8, 16),   # tiny spatial map
])
def test_conv3d_tpair_shape_sweep(t, hw, cin, cout):
    """The temporal output-pair lowering must be exact across (even)
    clip lengths, spatial sizes and channel counts; odd T is REFUSED by
    the core (the callers gate on evenness and fall back to conv3d) —
    a silent odd-T answer would be wrong, so the sweep pins the error
    too."""
    if t == 2:   # odd-T refusal checked once
        podd = layers.conv3d_init(jax.random.PRNGKey(0), (3, 3, 3), 3, 4)
        xodd = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 3))
        with pytest.raises(ValueError, match="phases"):
            layers.conv3d_tpair(podd, xodd)
    p = layers.conv3d_init(jax.random.PRNGKey(t * 100 + hw), (3, 3, 3),
                           cin, cout)
    x = jax.random.normal(jax.random.PRNGKey(hw), (2, t, hw, hw, cin))
    np.testing.assert_allclose(np.asarray(layers.conv3d(p, x)),
                               np.asarray(layers.conv3d_tpair(p, x)),
                               rtol=2e-5, atol=2e-5)
    g_a = jax.grad(lambda w: (layers.conv3d({"w": w, "b": p["b"]}, x)
                              ** 2).sum())(p["w"])
    g_b = jax.grad(lambda w: (layers.conv3d_tpair({"w": w, "b": p["b"]},
                                                  x) ** 2).sum())(p["w"])
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("hw,cin,cout", [(3, 2, 5), (5, 4, 4), (8, 7, 3)])
def test_upsample2x_conv3x3_shape_sweep(hw, cin, cout):
    """Phase-decomposed up->conv across odd/even map sizes and channel
    counts (boundary phases differ between odd and even sizes)."""
    p = layers.conv2d_init(jax.random.PRNGKey(hw), 3, cin, cout)
    x = jax.random.normal(jax.random.PRNGKey(cin), (2, hw, hw, cin))

    def oracle(pp, xx):
        up = jnp.repeat(jnp.repeat(xx, 2, axis=1), 2, axis=2)
        return layers.conv2d(pp, up)

    np.testing.assert_allclose(np.asarray(oracle(p, x)),
                               np.asarray(layers.upsample2x_conv3x3(p, x)),
                               rtol=2e-5, atol=2e-5)
    g_a = jax.grad(lambda w: (oracle({"w": w, "b": p["b"]}, x)
                              ** 2).sum())(p["w"])
    g_b = jax.grad(lambda w: (layers.upsample2x_conv3x3(
        {"w": w, "b": p["b"]}, x) ** 2).sum())(p["w"])
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["im2col", "tapdot"])
@pytest.mark.parametrize("nd", [2, 3])
def test_stem_dw_im2col_matches_conv(monkeypatch, nd, mode):
    """DVDGAN_STEM_DW=im2col (stem weight-grad as one tall im2col matmul)
    and =tapdot (one dot_general per tap, no cols concat) == conv (XLA's
    grad-conv): forward and dx BITWISE (identical lax ops), dW/db to f32
    reassociation tolerance. 2-D and 3-D stems."""
    rng = np.random.RandomState(7 + nd)
    shape = (2, 8, 8, 3) if nd == 2 else (2, 4, 8, 8, 3)
    conv = layers.conv2d if nd == 2 else layers.conv3d
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    cot = jnp.asarray(rng.randn(*shape[:-1], 5), jnp.float32)
    p = {"w": jnp.asarray(rng.randn(*(3,) * nd, 3, 5) * 0.2, jnp.float32),
         "b": jnp.asarray(rng.randn(5) * 0.1, jnp.float32)}

    def run():
        def loss(pp, q):
            return jnp.vdot(conv(pp, q), cot)
        y = conv(p, x)
        gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
        return y, gp["w"], gp["b"], gx

    monkeypatch.setenv("DVDGAN_STEM_DW", "conv")
    ref = run()
    monkeypatch.setenv("DVDGAN_STEM_DW", mode)
    new = run()
    for name, a, b in zip(("y", "dw", "db", "dx"), ref, new):
        if name == "dw":
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=5e-5)
        else:   # same lax ops on both paths — bitwise
            assert (np.asarray(a) == np.asarray(b)).all(), name


def test_stem_dw_routing_respects_gates(monkeypatch):
    """The im2col stem path must only engage at stride-1 SAME k=3 cin<=4:
    wide-cin, strided, and 1x1 convs keep the plain lowering (checked via
    the lowered HLO: the custom-vjp path lowers dW as dot, the plain path
    as conv)."""
    monkeypatch.setenv("DVDGAN_STEM_DW", "im2col")
    rng = np.random.RandomState(11)

    def dw_hlo(cin, stride, k):
        x = jnp.asarray(rng.randn(1, 8, 8, cin), jnp.float32)
        p = {"w": jnp.asarray(rng.randn(k, k, cin, 8) * 0.2, jnp.float32)}

        def loss(pp):
            return layers.conv2d(pp, x, stride=stride).sum()
        return jax.jit(jax.grad(loss)).lower(p).as_text()

    assert " dot(" in dw_hlo(3, 1, 3) or "dot_general" in dw_hlo(3, 1, 3)
    for cin, stride, k in ((8, 1, 3), (3, 2, 3), (3, 1, 1)):
        txt = dw_hlo(cin, stride, k)
        assert " dot(" not in txt and "dot_general" not in txt, \
            (cin, stride, k)


@pytest.mark.parametrize("variant,barrier",
                         [("scatter", "off"), ("stack", "on")])
def test_upsample_interleave_variants_agree(monkeypatch, variant, barrier):
    """DVDGAN_SPHASE_INTERLEAVE=scatter (strided .at sets; backward =
    strided gathers) and DVDGAN_UPS_GRAD_BARRIER=on (cotangent barrier at
    the upsample output) are the same math as the default stack lowering —
    forward bitwise (same phase convs), gradients to f32 tolerance."""

    key = jax.random.PRNGKey(21)
    p = layers.conv2d_init(key, 3, 5, 7)
    x = jax.random.normal(jax.random.PRNGKey(22), (2, 4, 6, 5))

    def run():
        y = layers.upsample2x_conv3x3(p, x)
        g = jax.grad(lambda p, x: (layers.upsample2x_conv3x3(p, x) ** 2)
                     .sum(), argnums=(0, 1))(p, x)
        return y, *jax.tree.leaves(g)

    ref = run()   # code defaults: stack, barrier off
    monkeypatch.setenv("DVDGAN_SPHASE_INTERLEAVE", variant)
    monkeypatch.setenv("DVDGAN_UPS_GRAD_BARRIER", barrier)
    new = run()
    assert (np.asarray(ref[0]) == np.asarray(new[0])).all()
    for a, b in zip(ref[1:], new[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_stem_dw_auto_gates_3d_large_only(monkeypatch):
    """Default "auto": tapdot engages ONLY for 3-D stems whose spatial
    map meets the boundary on BOTH axes (the measured-win class);
    2-D stems and small-map 3-D stems keep XLA's grad-conv (checked
    via lowered HLO as above)."""
    monkeypatch.delenv("DVDGAN_STEM_DW", raising=False)
    monkeypatch.setenv("DVDGAN_TAPDOT_MIN_HW", "8")
    rng = np.random.RandomState(13)

    def dw_hlo(conv, shape, k):
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        p = {"w": jnp.asarray(rng.randn(*k, 3, 8) * 0.2, jnp.float32)}

        def loss(pp):
            return conv(pp, x).sum()
        return jax.jit(jax.grad(loss)).lower(p).as_text()

    # 3-D at the boundary: dot lowering (tapdot)
    txt = dw_hlo(layers.conv3d, (2, 4, 8, 8, 3), (3, 3, 3))
    assert " dot(" in txt or "dot_general" in txt
    # 3-D below the boundary on one axis: plain grad-conv
    txt = dw_hlo(layers.conv3d, (2, 4, 8, 4, 3), (3, 3, 3))
    assert " dot(" not in txt and "dot_general" not in txt
    # 2-D, ANY size: plain grad-conv under auto
    txt = dw_hlo(layers.conv2d, (16, 8, 8, 3), (3, 3))
    assert " dot(" not in txt and "dot_general" not in txt
    # default boundary (128) keeps the 64-sq 128px-preset DT stem out
    monkeypatch.delenv("DVDGAN_TAPDOT_MIN_HW")
    txt = dw_hlo(layers.conv3d, (2, 4, 64, 64, 3), (3, 3, 3))
    assert " dot(" not in txt and "dot_general" not in txt
