"""Cross-framework parity: dvdgan_tpu vs an independent PyTorch twin.

The reference mount is empty, so reference parity cannot be checked against
the actual torch repo; instead tools/torch_twin.py implements the same
behavioral spec (SURVEY.md §2) a second time in PyTorch's native idiom, and
these tests load IDENTICAL weights into both frameworks and demand
agreement. This cross-checks every layout convention (HWIO↔OIHW,
channels-last↔NCHW, reshape/fold orders) and every algebraic rewrite the
TPU path makes (hoisted ConvGRU halves, phase-decomposed upsample convs,
pooled-skip commutes, folded-batch CBN).

All float32 on CPU (conftest pins highest matmul precision), tiny shapes.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig  # noqa: E402
from dvdgan_tpu.models import discriminator, generator  # noqa: E402
from dvdgan_tpu.ops import attention, convgru, layers, losses  # noqa: E402
from dvdgan_tpu.ops import norm, resblocks  # noqa: E402
from dvdgan_tpu.ops import spectral_norm as sn  # noqa: E402
from tools import torch_twin as tw  # noqa: E402

RNG = np.random.RandomState


def to_t(a):
    return torch.from_numpy(np.asarray(a, np.float32).copy())


def assert_close(ours, theirs, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               theirs.detach().numpy(), atol=atol, rtol=rtol)


# ----------------------------------------------------------- primitives -----


def test_conv2d_layout():
    rng = RNG(0)
    p = layers.conv2d_init(jax.random.PRNGKey(0), 3, 5, 7)
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    ours = layers.conv2d(p, jnp.asarray(x))
    m = torch.nn.Conv2d(5, 7, 3, padding=1)
    tw.set_conv2d(m, p)
    theirs = m(to_t(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    assert_close(ours, theirs)


def test_conv3d_layout():
    rng = RNG(1)
    p = layers.conv3d_init(jax.random.PRNGKey(1), (3, 3, 3), 4, 6)
    x = rng.randn(2, 3, 6, 6, 4).astype(np.float32)
    ours = layers.conv3d(p, jnp.asarray(x))
    m = torch.nn.Conv3d(4, 6, 3, padding=1)
    tw.set_conv3d(m, p)
    theirs = m(to_t(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1)
    assert_close(ours, theirs)


def test_linear_and_embedding():
    rng = RNG(2)
    p = layers.linear_init(jax.random.PRNGKey(2), 6, 9)
    x = rng.randn(4, 6).astype(np.float32)
    m = torch.nn.Linear(6, 9)
    tw.set_linear(m, p)
    assert_close(layers.linear(p, jnp.asarray(x)), m(to_t(x)))

    pe = layers.embedding_init(jax.random.PRNGKey(3), 10, 5)
    idx = rng.randint(0, 10, 7)
    me = torch.nn.Embedding(10, 5)
    me.weight.data = to_t(pe["emb"])
    assert_close(layers.embedding(pe, jnp.asarray(idx)),
                 me(torch.from_numpy(idx)))


def test_upsample_conv_phase_decomposition():
    """The 2.25×-fewer-MACs phase-decomposed upsample conv equals torch's
    naive F.interpolate(nearest 2×) → Conv2d(3×3, padding=1)."""
    rng = RNG(3)
    p = layers.conv2d_init(jax.random.PRNGKey(4), 3, 6, 8)
    x = rng.randn(2, 5, 7, 6).astype(np.float32)   # odd sizes too
    ours = layers.upsample2x_conv3x3(p, jnp.asarray(x))
    m = torch.nn.Conv2d(6, 8, 3, padding=1)
    tw.set_conv2d(m, p)
    up = torch.nn.functional.interpolate(
        to_t(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
    theirs = m(up).permute(0, 2, 3, 1)
    assert_close(ours, theirs, atol=2e-5)


def test_convgru_cell_vs_concat_kernel():
    """The hoisted x/h conv halves == the concat-kernel ConvGRU."""
    rng = RNG(4)
    c = 6
    p = convgru.convgru_init(jax.random.PRNGKey(5), c)
    x = rng.randn(3, 8, 8, c).astype(np.float32)
    h = rng.randn(3, 8, 8, c).astype(np.float32)
    ours = convgru.convgru_cell(p, jnp.asarray(x), jnp.asarray(h))
    m = tw.ConvGRUCell(c)
    tw.set_gru(m, p)
    theirs = m(to_t(x).permute(0, 3, 1, 2),
               to_t(h).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    assert_close(ours, theirs, atol=2e-5)


def test_convgru_sequence():
    """Whole-sequence unroll (scan + one fused input conv) vs the twin's
    python loop over frames."""
    rng = RNG(5)
    c, t, b = 5, 4, 2
    p = convgru.convgru_init(jax.random.PRNGKey(6), c)
    xs = rng.randn(b, t, 8, 8, c).astype(np.float32)
    ours = convgru.convgru(p, jnp.asarray(xs))            # (B, T, H, W, C)
    m = tw.ConvGRUCell(c)
    tw.set_gru(m, p)
    h = torch.zeros(b, c, 8, 8)
    outs = []
    for j in range(t):
        h = m(to_t(xs[:, j]).permute(0, 3, 1, 2), h)
        outs.append(h.permute(0, 2, 3, 1))
    theirs = torch.stack(outs, dim=1)
    assert_close(ours, theirs, atol=2e-5)


def test_cbn_train_and_eval():
    rng = RNG(6)
    c, cond_dim = 6, 4
    p = norm.cbn_init(jax.random.PRNGKey(7), cond_dim, c)
    stats = norm.stats_init(c)
    x = rng.randn(4, 8, 8, c).astype(np.float32)
    cond = rng.randn(4, cond_dim).astype(np.float32)
    m = tw.ConditionalNorm(cond_dim, c)
    tw.set_cbn(m, p, stats)

    m.train()
    ours, new_stats = norm.cbn(p, stats, jnp.asarray(x), jnp.asarray(cond),
                               train=True)
    theirs = m(to_t(x).permute(0, 3, 1, 2),
               to_t(cond)).permute(0, 2, 3, 1)
    assert_close(ours, theirs, atol=2e-5)
    # running means agree; running var differs by the documented biased
    # (ours) vs unbiased (torch) convention: torch stores var * n/(n-1)
    n = x.size // c
    np.testing.assert_allclose(np.asarray(new_stats["mean"]),
                               m.bn.running_mean.numpy(), atol=1e-5)
    # both started from running var 1.0 with momentum 0.1:
    #   ours  = 0.9 + 0.1·biased_var,  torch = 0.9 + 0.1·biased_var·n/(n−1)
    ours_var = np.asarray(new_stats["var"])
    np.testing.assert_allclose(0.9 + (ours_var - 0.9) * n / (n - 1),
                               m.bn.running_var.numpy(), atol=1e-5)

    m.eval()
    tw.set_cbn(m, p, stats)   # undo the in-place running-stat update above
    ours_e, _ = norm.cbn(p, stats, jnp.asarray(x), jnp.asarray(cond),
                         train=False)
    theirs_e = m(to_t(x).permute(0, 3, 1, 2),
                 to_t(cond)).permute(0, 2, 3, 1)
    assert_close(ours_e, theirs_e, atol=2e-5)


def test_gresblock_upsample():
    """CBN→ReLU→up→conv ×2 + skip, incl. the phase-decomposed upsample conv
    and the low-res-skip-conv commute vs the twin's naive order."""
    rng = RNG(7)
    cin, cout, cond_dim = 6, 4, 5
    p = resblocks.gresblock_init(jax.random.PRNGKey(8), cin, cout, cond_dim)
    stats = resblocks.gresblock_stats_init(cin, cout)
    x = rng.randn(3, 8, 8, cin).astype(np.float32)
    cond = rng.randn(3, cond_dim).astype(np.float32)
    ours, _ = resblocks.gresblock(p, stats, jnp.asarray(x),
                                  jnp.asarray(cond), train=True,
                                  upsample=True)
    m = tw.GResBlock(cin, cout, cond_dim, upsample=True)
    tw.set_gresblock(m, p, stats)
    m.train()
    theirs = m(to_t(x).permute(0, 3, 1, 2),
               to_t(cond)).permute(0, 2, 3, 1)
    assert_close(ours, theirs, atol=5e-5)


@pytest.mark.parametrize("first,down,cin", [(True, True, 3), (False, True, 6),
                                            (False, False, 6)])
def test_dblock(first, down, cin):
    """Pooled-below-skip-conv rewrite vs the twin's reference order."""
    rng = RNG(8)
    cout = 6
    p = resblocks.dblock_init(jax.random.PRNGKey(9), cin, cout, first=first)
    x = rng.randn(3, 8, 8, cin).astype(np.float32)
    ours = resblocks.dblock(p, jnp.asarray(x), down=down, first=first)
    m = tw.DBlock(cin, cout, down=down, first=first)
    tw.set_dblock(m, p)
    theirs = m(to_t(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    assert_close(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("first,down,cin", [(True, True, 3),
                                            (False, False, 6)])
def test_dblock3d(first, down, cin):
    rng = RNG(9)
    cout = 6
    p = resblocks.dblock3d_init(jax.random.PRNGKey(10), cin, cout,
                                first=first)
    x = rng.randn(2, 3, 8, 8, cin).astype(np.float32)
    ours = resblocks.dblock3d(p, jnp.asarray(x), down=down, first=first)
    m = tw.DBlock3d(cin, cout, down=down, first=first)
    tw.set_dblock3d(m, p)
    theirs = m(to_t(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1)
    assert_close(ours, theirs, atol=2e-5)


def test_separable_attn():
    rng = RNG(10)
    c, b, t, hw = 16, 2, 3, 8
    p = attention.separable_attn_init(jax.random.PRNGKey(11), c)
    # non-zero gammas so the attention path actually contributes
    p["spatial"]["gamma"] = jnp.float32(0.7)
    p["temporal"]["gamma"] = jnp.float32(-0.3)
    x = rng.randn(b, t, hw, hw, c).astype(np.float32)
    ours = attention.separable_attn(p, jnp.asarray(x))
    m = tw.SeparableAttn(c)
    tw.set_separable_attn(m, p)
    theirs = m(to_t(x).permute(0, 1, 4, 2, 3)).permute(0, 1, 3, 4, 2)
    assert_close(ours, theirs, atol=5e-5)


def test_hinge_losses():
    rng = RNG(11)
    r = jnp.asarray(rng.randn(16).astype(np.float32))
    f = jnp.asarray(rng.randn(16).astype(np.float32))
    tr, tf = to_t(np.asarray(r)), to_t(np.asarray(f))
    d_ref = (torch.relu(1.0 - tr).mean() + torch.relu(1.0 + tf).mean())
    g_ref = -tf.mean()
    np.testing.assert_allclose(float(losses.d_hinge(r, f)),
                               float(d_ref), rtol=1e-6)
    np.testing.assert_allclose(float(losses.g_hinge(f)),
                               float(g_ref), rtol=1e-6)


def test_spectral_norm_vs_torch():
    """σ estimation: same one-step u update as torch's spectral_norm
    (transposed convention), and both converge to the true top singular
    value."""
    rng = RNG(12)
    w = rng.randn(12, 7).astype(np.float32)          # ours: (in, out)
    u0 = rng.randn(7).astype(np.float32)
    u0 /= np.linalg.norm(u0)

    # one power-iteration step, torch convention: W_t = w.T (out, in),
    # v = normalize(W_tᵀ u) = normalize(w u), u' = normalize(W_t v)
    v_ref = w @ u0
    v_ref /= np.linalg.norm(v_ref) + 1e-12
    u_ref = w.T @ v_ref
    u_ref /= np.linalg.norm(u_ref) + 1e-12
    _, u1 = sn.sigma_and_update(jnp.asarray(w), jnp.asarray(u0), n_iter=1)
    np.testing.assert_allclose(np.asarray(u1), u_ref, atol=1e-6)

    # convergence to SVD σ, and agreement with torch's converged estimate
    sig_true = np.linalg.svd(w, compute_uv=False)[0]
    sig, _ = sn.sigma_and_update(jnp.asarray(w), jnp.asarray(u0), n_iter=50)
    np.testing.assert_allclose(float(sig), sig_true, rtol=1e-5)

    lin = torch.nn.Linear(12, 7, bias=False)
    lin.weight.data = to_t(w).T.contiguous()
    lin = torch.nn.utils.spectral_norm(lin, n_power_iterations=50)
    lin.train()
    lin(torch.eye(12))                                # triggers the hook
    # both frameworks' normalized weight has top singular value ≈ 1
    w_sn = lin.weight.detach().numpy()
    np.testing.assert_allclose(np.linalg.svd(w_sn, compute_uv=False)[0],
                               1.0, rtol=1e-3)
    ours_sn = np.asarray(w) / float(sig)
    np.testing.assert_allclose(
        np.linalg.svd(ours_sn, compute_uv=False)[0], 1.0, rtol=1e-5)


# ----------------------------------------------------------- full models ----


def _tiny_cfgs():
    g = GConfig(img_size=32, n_frames=4, ch=4, z_dim=12, n_classes=5,
                emb_dim=8, attn_res=16)
    ds = DSConfig(img_size=32, ch=4, n_classes=5, k_frames=3)
    dt = DTConfig(img_size=32, n_frames=4, ch=4, n_classes=5)
    return g, ds, dt


@pytest.mark.parametrize("train", [True, False])
def test_generator_full_forward(train):
    g_cfg, _, _ = _tiny_cfgs()
    rng = RNG(13)
    params, stats = generator.init(jax.random.PRNGKey(20), g_cfg)
    # non-zero attention gammas so that path is exercised
    params["attn"]["spatial"]["gamma"] = jnp.float32(0.5)
    params["attn"]["temporal"]["gamma"] = jnp.float32(0.25)
    z = rng.randn(2, g_cfg.z_dim).astype(np.float32)
    y = rng.randint(0, g_cfg.n_classes, 2)

    ours, _ = generator.apply(params, stats, jnp.asarray(z),
                              jnp.asarray(y), g_cfg, train=train)

    m = tw.Generator(g_cfg)
    tw.load_generator(m, jax.tree.map(np.asarray, params),
                      jax.tree.map(np.asarray, stats))
    m.train(train)
    with torch.no_grad():
        theirs = m(to_t(z), torch.from_numpy(y))
    assert ours.shape == (2, 4, 32, 32, 3)
    assert_close(ours, theirs, atol=1e-4, rtol=1e-4)


def test_ds_full_forward():
    _, ds_cfg, _ = _tiny_cfgs()
    rng = RNG(14)
    params = discriminator.ds_init(jax.random.PRNGKey(21), ds_cfg)
    frames = rng.randn(2, ds_cfg.k_frames, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, ds_cfg.n_classes, 2)
    ours = discriminator.ds_apply(params, jnp.asarray(frames),
                                  jnp.asarray(y), ds_cfg)
    m = tw.SpatialDiscriminator(ds_cfg)
    tw.load_ds(m, jax.tree.map(np.asarray, params))
    with torch.no_grad():
        theirs = m(to_t(frames), torch.from_numpy(y))
    # per-clip scalar: sums over k frames and the 4×4 grid amplify the conv
    # stack's float error; still far below any structural-mismatch scale
    assert_close(ours, theirs, atol=5e-3, rtol=1e-4)


def test_dt_full_forward():
    _, _, dt_cfg = _tiny_cfgs()
    rng = RNG(15)
    params = discriminator.dt_init(jax.random.PRNGKey(22), dt_cfg)
    clip = rng.randn(2, dt_cfg.n_frames, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, dt_cfg.n_classes, 2)
    ours = discriminator.dt_apply(params, jnp.asarray(clip),
                                  jnp.asarray(y), dt_cfg)
    m = tw.TemporalDiscriminator(dt_cfg)
    tw.load_dt(m, jax.tree.map(np.asarray, params), dt_cfg.n_3d_blocks)
    with torch.no_grad():
        theirs = m(to_t(clip), torch.from_numpy(y))
    assert_close(ours, theirs, atol=5e-3, rtol=1e-4)


def test_generator_sn_normalized_forward():
    """End-to-end sampling parity at spectrally-normalized weights — the
    weights a checkpoint's sampling path actually uses."""
    g_cfg, _, _ = _tiny_cfgs()
    rng = RNG(16)
    params, stats = generator.init(jax.random.PRNGKey(23), g_cfg)
    u = sn.sn_init(jax.random.PRNGKey(24), params)
    params_sn, _ = sn.sn_normalize(params, u, update=False)
    z = rng.randn(2, g_cfg.z_dim).astype(np.float32)
    y = rng.randint(0, g_cfg.n_classes, 2)
    ours, _ = generator.apply(params_sn, stats, jnp.asarray(z),
                              jnp.asarray(y), g_cfg, train=False)
    m = tw.Generator(g_cfg)
    tw.load_generator(m, jax.tree.map(np.asarray, params_sn),
                      jax.tree.map(np.asarray, stats))
    m.eval()
    with torch.no_grad():
        theirs = m(to_t(z), torch.from_numpy(y))
    assert_close(ours, theirs, atol=1e-4, rtol=1e-4)


def test_fp_generator_full_forward():
    """DVD-GAN-FP parity: frame-encoder pyramid (incl. XLA's asymmetric
    stride-2 SAME padding) + per-level GRU warm-up + generation unroll."""
    g_cfg = GConfig(img_size=32, n_frames=4, ch=4, z_dim=12, n_classes=5,
                    emb_dim=8, attn_res=16, cond_frames=2)
    rng = RNG(17)
    params, stats = generator.init(jax.random.PRNGKey(25), g_cfg)
    params["attn"]["spatial"]["gamma"] = jnp.float32(0.4)
    params["attn"]["temporal"]["gamma"] = jnp.float32(0.2)
    z = rng.randn(2, g_cfg.z_dim).astype(np.float32)
    y = rng.randint(0, g_cfg.n_classes, 2)
    cond = rng.rand(2, 2, 32, 32, 3).astype(np.float32) * 2.0 - 1.0

    ours, _ = generator.apply(params, stats, jnp.asarray(z),
                              jnp.asarray(y), g_cfg, train=False,
                              cond_video=jnp.asarray(cond))

    m = tw.Generator(g_cfg)
    tw.load_generator(m, jax.tree.map(np.asarray, params),
                      jax.tree.map(np.asarray, stats))
    m.eval()
    with torch.no_grad():
        theirs = m(to_t(z), torch.from_numpy(y), cond_video=to_t(cond))
    assert ours.shape == (2, 4, 32, 32, 3)
    assert_close(ours, theirs, atol=1e-4, rtol=1e-4)


# ------------------------------------------------- gradient parity ----------
# Forward parity (above) pins the layout contracts; these pin the BACKWARD:
# the full hinge-loss gradients of the D phase and the G phase, wrt every
# parameter, must agree between dvdgan_tpu and the torch twin at identical
# (raw, un-normalized) weights. This exercises every algebraic rewrite's
# custom VJP path in context: phase-decomposed upsample convs, pooled-skip
# commutes, hoisted GRU halves, folded-batch CBN batch-stat gradients.
# SN is deliberately absent here: the two frameworks' σ-gradient wrappers
# have different update-time contracts (documented in ops/spectral_norm.py)
# and SN-normalized forwards are covered above.


def _torch_d_hinge(r, f):
    return (torch.relu(1.0 - r).mean() + torch.relu(1.0 + f).mean())


def _grads_into_params(mod):
    """Overwrite every parameter with its gradient (zeros when a parameter
    got none) so the export_* readers emit the GRADIENT tree in dvdgan_tpu
    layout/structure."""
    with torch.no_grad():
        for p in mod.parameters():
            p.data = (p.grad.detach().clone() if p.grad is not None
                      else torch.zeros_like(p.data))


def test_gradient_parity_d_loss():
    chex = pytest.importorskip("chex")

    _, ds_cfg, dt_cfg = _tiny_cfgs()
    rng = RNG(31)
    ds_params = discriminator.ds_init(jax.random.PRNGKey(40), ds_cfg)
    dt_params = discriminator.dt_init(jax.random.PRNGKey(41), dt_cfg)
    rf = rng.randn(2, ds_cfg.k_frames, 32, 32, 3).astype(np.float32)
    ff = rng.randn(2, ds_cfg.k_frames, 32, 32, 3).astype(np.float32)
    rc = rng.randn(2, dt_cfg.n_frames, 32, 32, 3).astype(np.float32)
    fc = rng.randn(2, dt_cfg.n_frames, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, ds_cfg.n_classes, 2)

    def loss_j(p):
        s_r = discriminator.ds_apply(p["ds"], jnp.asarray(rf),
                                     jnp.asarray(y), ds_cfg)
        s_f = discriminator.ds_apply(p["ds"], jnp.asarray(ff),
                                     jnp.asarray(y), ds_cfg)
        t_r = discriminator.dt_apply(p["dt"], jnp.asarray(rc),
                                     jnp.asarray(y), dt_cfg)
        t_f = discriminator.dt_apply(p["dt"], jnp.asarray(fc),
                                     jnp.asarray(y), dt_cfg)
        return losses.d_hinge(s_r, s_f) + losses.d_hinge(t_r, t_f)

    lj, gj = jax.value_and_grad(loss_j)({"ds": ds_params, "dt": dt_params})

    mds = tw.SpatialDiscriminator(ds_cfg)
    tw.load_ds(mds, jax.tree.map(np.asarray, ds_params))
    mdt = tw.TemporalDiscriminator(dt_cfg)
    tw.load_dt(mdt, jax.tree.map(np.asarray, dt_params), dt_cfg.n_3d_blocks)
    ty = torch.from_numpy(y)
    lt = (_torch_d_hinge(mds(to_t(rf), ty), mds(to_t(ff), ty))
          + _torch_d_hinge(mdt(to_t(rc), ty), mdt(to_t(fc), ty)))
    lt.backward()
    np.testing.assert_allclose(float(lj), float(lt.detach()),
                               atol=1e-4, rtol=1e-5)
    _grads_into_params(mds)
    _grads_into_params(mdt)
    chex.assert_trees_all_close(
        jax.tree.map(np.asarray, gj),
        {"ds": tw.export_ds(mds), "dt": tw.export_dt(mdt)},
        atol=1e-4, rtol=1e-3)


def test_gradient_parity_g_loss():
    chex = pytest.importorskip("chex")

    from dvdgan_tpu.train.step import take_frames

    g_cfg, ds_cfg, dt_cfg = _tiny_cfgs()
    rng = RNG(32)
    params, stats = generator.init(jax.random.PRNGKey(50), g_cfg)
    params["attn"]["spatial"]["gamma"] = jnp.float32(0.5)
    params["attn"]["temporal"]["gamma"] = jnp.float32(0.25)
    ds_params = discriminator.ds_init(jax.random.PRNGKey(51), ds_cfg)
    dt_params = discriminator.dt_init(jax.random.PRNGKey(52), dt_cfg)
    z = rng.randn(2, g_cfg.z_dim).astype(np.float32)
    y = rng.randint(0, g_cfg.n_classes, 2)
    idx = np.stack([rng.permutation(g_cfg.n_frames)[:ds_cfg.k_frames]
                    for _ in range(2)]).astype(np.int32)

    def loss_j(gp):
        fake, _ = generator.apply(gp, stats, jnp.asarray(z), jnp.asarray(y),
                                  g_cfg, train=True)
        s = discriminator.ds_apply(ds_params,
                                   take_frames(fake, jnp.asarray(idx)),
                                   jnp.asarray(y), ds_cfg)
        t = discriminator.dt_apply(dt_params, fake, jnp.asarray(y), dt_cfg)
        return losses.g_hinge(s) + losses.g_hinge(t)

    lj, gj = jax.value_and_grad(loss_j)(params)

    mg = tw.Generator(g_cfg)
    tw.load_generator(mg, jax.tree.map(np.asarray, params),
                      jax.tree.map(np.asarray, stats))
    mg.train(True)
    mds = tw.SpatialDiscriminator(ds_cfg)
    tw.load_ds(mds, jax.tree.map(np.asarray, ds_params))
    mdt = tw.TemporalDiscriminator(dt_cfg)
    tw.load_dt(mdt, jax.tree.map(np.asarray, dt_params), dt_cfg.n_3d_blocks)
    ty = torch.from_numpy(y)
    fake_t = mg(to_t(z), ty)
    frames_t = fake_t[torch.arange(2)[:, None], torch.from_numpy(idx)]
    lt = -mds(frames_t, ty).mean() - mdt(fake_t, ty).mean()
    lt.backward()
    np.testing.assert_allclose(float(lj), float(lt.detach()),
                               atol=1e-4, rtol=1e-5)
    _grads_into_params(mg)
    gt, _ = tw.export_generator(mg)
    chex.assert_trees_all_close(jax.tree.map(np.asarray, gj), gt,
                                atol=1e-4, rtol=1e-3)


def test_gradient_parity_g_loss_fp():
    """FP variant of the G-phase gradient parity: the conditioning frame
    encoder and per-level GRU warm-up must produce matching gradients too
    (DS scores generated frames only; DT the full cond+generated clip —
    train/step.py's FP wiring)."""
    chex = pytest.importorskip("chex")

    from dvdgan_tpu.train.step import take_frames

    import dataclasses
    g_cfg0, ds_cfg, dt_cfg0 = _tiny_cfgs()
    cf = 2
    g_cfg = dataclasses.replace(g_cfg0, cond_frames=cf)
    dt_cfg = dataclasses.replace(dt_cfg0, n_frames=dt_cfg0.n_frames + cf)
    rng = RNG(33)
    params, stats = generator.init(jax.random.PRNGKey(60), g_cfg)
    params["attn"]["spatial"]["gamma"] = jnp.float32(0.5)
    params["attn"]["temporal"]["gamma"] = jnp.float32(0.25)
    ds_params = discriminator.ds_init(jax.random.PRNGKey(61), ds_cfg)
    dt_params = discriminator.dt_init(jax.random.PRNGKey(62), dt_cfg)
    z = rng.randn(2, g_cfg.z_dim).astype(np.float32)
    y = rng.randint(0, g_cfg.n_classes, 2)
    cond = rng.rand(2, cf, g_cfg.img_size, g_cfg.img_size,
                    3).astype(np.float32) * 2.0 - 1.0
    idx = np.stack([rng.permutation(g_cfg.n_frames)[:ds_cfg.k_frames]
                    for _ in range(2)]).astype(np.int32)

    def loss_j(gp):
        fake, _ = generator.apply(gp, stats, jnp.asarray(z), jnp.asarray(y),
                                  g_cfg, train=True,
                                  cond_video=jnp.asarray(cond))
        s = discriminator.ds_apply(ds_params,
                                   take_frames(fake, jnp.asarray(idx)),
                                   jnp.asarray(y), ds_cfg)
        full = jnp.concatenate([jnp.asarray(cond), fake], axis=1)
        t = discriminator.dt_apply(dt_params, full, jnp.asarray(y), dt_cfg)
        return losses.g_hinge(s) + losses.g_hinge(t)

    lj, gj = jax.value_and_grad(loss_j)(params)

    mg = tw.Generator(g_cfg)
    tw.load_generator(mg, jax.tree.map(np.asarray, params),
                      jax.tree.map(np.asarray, stats))
    mg.train(True)
    mds = tw.SpatialDiscriminator(ds_cfg)
    tw.load_ds(mds, jax.tree.map(np.asarray, ds_params))
    mdt = tw.TemporalDiscriminator(dt_cfg)
    tw.load_dt(mdt, jax.tree.map(np.asarray, dt_params), dt_cfg.n_3d_blocks)
    ty = torch.from_numpy(y)
    fake_t = mg(to_t(z), ty, cond_video=to_t(cond))
    frames_t = fake_t[torch.arange(2)[:, None], torch.from_numpy(idx)]
    full_t = torch.cat([to_t(cond), fake_t], dim=1)
    lt = -mds(frames_t, ty).mean() - mdt(full_t, ty).mean()
    lt.backward()
    np.testing.assert_allclose(float(lj), float(lt.detach()),
                               atol=1e-4, rtol=1e-5)
    _grads_into_params(mg)
    gt, _ = tw.export_generator(mg)
    chex.assert_trees_all_close(jax.tree.map(np.asarray, gj), gt,
                                atol=1e-4, rtol=1e-3)


def test_adam_update_parity_with_torch():
    """optax.adam(β=(0,0.999)) == torch.optim.Adam step-for-step on the
    same gradient stream (completes the migration story at the update
    rule: same grads ⇒ same trajectory). 5 steps, tolerance covers the
    eps-placement and bias-correction orderings."""
    import numpy as np
    import optax
    import torch

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    p0 = rng.randn(7, 5).astype(np.float32)
    grads = [rng.randn(7, 5).astype(np.float32) * 10 ** rng.uniform(-3, 1)
             for _ in range(5)]

    lr, b1, b2 = 1e-4, 0.0, 0.999
    opt = optax.adam(lr, b1=b1, b2=b2)
    pj = jnp.asarray(p0)
    st = opt.init(pj)
    for g in grads:
        upd, st = opt.update(jnp.asarray(g), st, pj)
        pj = pj + upd

    pt = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([pt], lr=lr, betas=(b1, b2), eps=1e-8)
    for g in grads:
        topt.zero_grad()
        pt.grad = torch.tensor(g)
        topt.step()

    np.testing.assert_allclose(np.asarray(pj), pt.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
