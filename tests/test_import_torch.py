"""Round-trip tests for the torch-checkpoint importer
(tools/import_torch_checkpoint.py + tools/torch_twin.py export functions)."""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig  # noqa: E402
from dvdgan_tpu.models import discriminator, generator  # noqa: E402
from dvdgan_tpu.train import checkpoint, state as train_state  # noqa: E402
from dvdgan_tpu.utils import config as config_mod  # noqa: E402
from tools import import_torch_checkpoint as imp  # noqa: E402
from tools import torch_twin as tw  # noqa: E402

TINY_FLAGS = ["--img_size", "32", "--n_frames", "4", "--ch", "4",
              "--d_ch", "4", "--z_dim", "12", "--emb_dim", "8",
              "--attn_res", "16", "--n_classes", "5", "--k_frames", "3",
              "--batch_size", "2", "--seed", "0"]


def _tiny_cfg(out_dir: str) -> config_mod.Config:
    return config_mod.parse_config(TINY_FLAGS + ["--out_dir", out_dir])


def _tree_equal(a, b, atol=0.0):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert [k for k, _ in fa] == [k for k, _ in fb]
    for (ka, va), (_, vb) in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(va, np.float32),
                                   np.asarray(vb, np.float32),
                                   atol=atol, rtol=0,
                                   err_msg=jax.tree_util.keystr(ka))


def test_export_roundtrip_exact():
    """our init -> twin (load_*) -> export_* == the original pytrees,
    bit-exact (pure layout transposes)."""
    g_cfg = GConfig(img_size=32, n_frames=4, ch=4, z_dim=12, n_classes=5,
                    emb_dim=8, attn_res=16)
    ds_cfg = DSConfig(img_size=32, ch=4, n_classes=5, k_frames=3)
    dt_cfg = DTConfig(img_size=32, n_frames=4, ch=4, n_classes=5)

    g_params, g_stats = generator.init(jax.random.PRNGKey(0), g_cfg)
    m = tw.Generator(g_cfg)
    tw.load_generator(m, jax.tree.map(np.asarray, g_params),
                      jax.tree.map(np.asarray, g_stats))
    out_params, out_stats = tw.export_generator(m)
    _tree_equal(g_params, out_params)
    _tree_equal(g_stats, out_stats)

    ds_params = discriminator.ds_init(jax.random.PRNGKey(1), ds_cfg)
    mds = tw.SpatialDiscriminator(ds_cfg)
    tw.load_ds(mds, jax.tree.map(np.asarray, ds_params))
    _tree_equal(ds_params, tw.export_ds(mds))

    dt_params = discriminator.dt_init(jax.random.PRNGKey(2), dt_cfg)
    mdt = tw.TemporalDiscriminator(dt_cfg)
    tw.load_dt(mdt, jax.tree.map(np.asarray, dt_params), dt_cfg.n_3d_blocks)
    _tree_equal(dt_params, tw.export_dt(mdt))


def test_sn_wrapper_key_unwrap(tmp_path):
    """torch spectral_norm-wrapped state dicts (weight_orig / weight_u)
    load as plain weights."""
    dt_cfg = DTConfig(img_size=32, n_frames=4, ch=4, n_classes=5)
    mdt = tw.TemporalDiscriminator(dt_cfg)
    sd = mdt.state_dict()
    w = sd.pop("blocks.0.conv1.weight")
    sd["blocks.0.conv1.weight_orig"] = w
    sd["blocks.0.conv1.weight_u"] = torch.randn(8)
    p = str(tmp_path / "dt.pth")
    torch.save(sd, p)
    loaded = imp._load_state_dict(p)
    assert "blocks.0.conv1.weight" in loaded
    assert not any(k.endswith("weight_u") for k in loaded)
    mdt2 = tw.TemporalDiscriminator(dt_cfg)
    mdt2.load_state_dict(loaded, strict=True)


def test_import_end_to_end(tmp_path):
    """Full CLI path: torch.save twin state dicts (.pth and .npz), run
    main(), restore the Orbax checkpoint against a create() template, and
    check the imported G samples identically to the source params."""
    out_dir = str(tmp_path / "run")
    cfg = _tiny_cfg(out_dir)
    g_cfg, ds_cfg, dt_cfg = cfg.g_config(), cfg.ds_config(), cfg.dt_config()

    g_params, g_stats = generator.init(jax.random.PRNGKey(3), g_cfg)
    ds_params = discriminator.ds_init(jax.random.PRNGKey(4), ds_cfg)
    dt_params = discriminator.dt_init(jax.random.PRNGKey(5), dt_cfg)

    mg = tw.Generator(g_cfg)
    tw.load_generator(mg, jax.tree.map(np.asarray, g_params),
                      jax.tree.map(np.asarray, g_stats))
    mds = tw.SpatialDiscriminator(ds_cfg)
    tw.load_ds(mds, jax.tree.map(np.asarray, ds_params))
    mdt = tw.TemporalDiscriminator(dt_cfg)
    tw.load_dt(mdt, jax.tree.map(np.asarray, dt_params), dt_cfg.n_3d_blocks)

    g_path = str(tmp_path / "G.pth")
    ds_path = str(tmp_path / "DS.npz")        # npz input path also covered
    dt_path = str(tmp_path / "DT.pth")
    torch.save(mg.state_dict(), g_path)
    np.savez(ds_path, **{k: v.numpy() for k, v in mds.state_dict().items()})
    torch.save(mdt.state_dict(), dt_path)

    ckpt_dir = imp.main(TINY_FLAGS + [
        "--out_dir", out_dir, "--g_ckpt", g_path, "--ds_ckpt", ds_path,
        "--dt_ckpt", dt_path, "--step", "7", "--sn_warmup", "3"])

    template = train_state.create(jax.random.PRNGKey(0), g_cfg, ds_cfg,
                                  dt_cfg, cfg.train_config())
    restored = checkpoint.restore(ckpt_dir, 7, template)
    assert int(restored["step"]) == 7
    _tree_equal(restored["g"]["params"], g_params)
    _tree_equal(restored["g_ema"], g_params)
    _tree_equal(restored["ds"]["params"], ds_params)
    _tree_equal(restored["dt"]["params"], dt_params)

    # imported checkpoint generates the same video as the source params
    z = jax.random.normal(jax.random.PRNGKey(9), (2, g_cfg.z_dim))
    y = jnp.zeros((2,), jnp.int32)
    v_src, _ = generator.apply(g_params, g_stats, z, y, g_cfg, train=False)
    v_imp, _ = generator.apply(restored["g"]["params"],
                               restored["g"]["stats"], z, y, g_cfg,
                               train=False)
    np.testing.assert_allclose(np.asarray(v_src), np.asarray(v_imp),
                               atol=0.0)


def test_export_then_import_roundtrip(tmp_path):
    """export_torch_checkpoint ∘ import conversion == identity on params."""
    from tools import export_torch_checkpoint as exp

    out_dir = str(tmp_path / "run")
    cfg = _tiny_cfg(out_dir)
    g_cfg, ds_cfg, dt_cfg = cfg.g_config(), cfg.ds_config(), cfg.dt_config()
    state = train_state.create(jax.random.PRNGKey(6), g_cfg, ds_cfg, dt_cfg,
                               cfg.train_config())
    checkpoint.save(os.path.join(out_dir, "checkpoints"), 3, state)

    exp_dir = str(tmp_path / "torch")
    written = exp.main(TINY_FLAGS + ["--out_dir", out_dir,
                                     "--export_dir", exp_dir,
                                     "--pretrained_model", "3"])
    assert sorted(os.path.basename(p) for p in written) == [
        "DS.pth", "DT.pth", "G.pth", "G_ema.pth"]

    g_sd = imp._load_state_dict(os.path.join(exp_dir, "G.pth"))
    ds_sd = imp._load_state_dict(os.path.join(exp_dir, "DS.pth"))
    dt_sd = imp._load_state_dict(os.path.join(exp_dir, "DT.pth"))
    g_params, g_stats, ds_params, dt_params = imp.convert(
        g_sd, ds_sd, dt_sd, g_cfg, ds_cfg, dt_cfg)
    _tree_equal(state["g"]["params"], g_params)
    _tree_equal(state["g"]["stats"], g_stats)
    _tree_equal(state["ds"]["params"], ds_params)
    _tree_equal(state["dt"]["params"], dt_params)


def test_fp_generator_roundtrip():
    """DVD-GAN-FP checkpoints (cond_frames > 0) round-trip through the
    twin: fp_enc included, bit-exact."""
    fp_cfg = GConfig(img_size=32, n_frames=4, ch=4, z_dim=12, n_classes=5,
                     emb_dim=8, attn_res=16, cond_frames=2)
    g_params, g_stats = generator.init(jax.random.PRNGKey(7), fp_cfg)
    assert "fp_enc" in g_params
    m = tw.Generator(fp_cfg)
    tw.load_generator(m, jax.tree.map(np.asarray, g_params),
                      jax.tree.map(np.asarray, g_stats))
    out_params, out_stats = tw.export_generator(m)
    _tree_equal(g_params, out_params)
    _tree_equal(g_stats, out_stats)
