"""Preset instantiation goldens (VERDICT r1 missing #3): the 128px and
256px/48f BASELINE configs must actually BUILD and RUN, not just pass
flag arithmetic — _G_MULTS[256], z_dim=112 chunking, attention at 32²
inside a 6-level G, and the D topologies are all exercised here.

The 48f-remat memory check needs the real chip (tools/validate_presets.py);
these tests pin topology + param counts + a full 128px train step on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.models import discriminator, generator
from dvdgan_tpu.utils.config import Config, PRESETS

# golden (G, DS, DT) parameter counts per preset — any topology drift fails
_GOLDEN = {
    "smoke": (2724341, 1225649, 123137),
    "ucf101_64": (10457053, 4939617, 491713),
    "kinetics_64": (10516933, 5195105, 523649),
    "kinetics_128": (41181893, 9914721, 5325857),
    "kinetics_256_48f": (46111429, 11094881, 10045473),
}


def _count(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


@pytest.mark.slow
def test_all_presets_init_with_golden_param_counts():
    assert set(_GOLDEN) == set(PRESETS)
    for name, pd in PRESETS.items():
        cfg = Config(**pd)
        gp, _ = generator.init(jax.random.PRNGKey(0), cfg.g_config())
        dsp = discriminator.ds_init(jax.random.PRNGKey(1), cfg.ds_config())
        dtp = discriminator.dt_init(jax.random.PRNGKey(2), cfg.dt_config())
        got = (_count(gp), _count(dsp), _count(dtp))
        assert got == _GOLDEN[name], f"{name}: {got} != {_GOLDEN[name]}"


@pytest.mark.slow
def test_kinetics_128_full_train_step():
    """One real G+D step through the 128px topology (5 levels, attention at
    32², 128px DS + 64px-input DT) — frames/batch shrunk, architecture not."""
    from dvdgan_tpu.train import TrainConfig, create, make_train_step

    pd = dict(PRESETS["kinetics_128"], n_frames=4, k_frames=2, batch_size=2,
              n_classes=7, d_steps=1, ema_start=0)
    cfg = Config(**pd)
    g_cfg, ds_cfg, dt_cfg = cfg.g_config(), cfg.ds_config(), cfg.dt_config()
    assert g_cfg.attn_res == 32 and g_cfg.n_levels == 5
    tc = TrainConfig(d_steps=1, batch_size=2, ema_start=0)
    st = create(jax.random.PRNGKey(0), g_cfg, ds_cfg, dt_cfg, tc)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(2, 4, 128, 128, 3), jnp.float32)
    y = jnp.asarray([0, 3], jnp.int32)
    st, m = make_train_step(g_cfg, ds_cfg, dt_cfg, tc, donate=False)(
        st, real, y, jax.random.PRNGKey(1))
    assert int(st["step"]) == 1
    for v in m.values():
        assert np.isfinite(float(v))


def test_kinetics_256_topology_forward():
    """The 256px/48f G (6 levels, z_dim=112 → 7 chunks of 16, attention at
    32², remat) and both Ds run forward at the real spatial resolution
    (T shrunk to 2; T only changes the scan length, not the topology)."""
    pd = dict(PRESETS["kinetics_256_48f"], n_frames=2, n_classes=5,
              batch_size=1, k_frames=2)
    cfg = Config(**pd)
    g_cfg = cfg.g_config()
    assert g_cfg.n_levels == 6 and g_cfg.chunk_dim == 16
    assert g_cfg.remat and g_cfg.attn_res == 32
    gp, gs = generator.init(jax.random.PRNGKey(0), g_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 112), jnp.float32)
    y = jnp.asarray([2], jnp.int32)
    video, _ = generator.apply(gp, gs, z, y, g_cfg, train=False)
    assert video.shape == (1, 2, 256, 256, 3)
    assert np.isfinite(np.asarray(video, np.float32)).all()

    ds_cfg, dt_cfg = cfg.ds_config(), cfg.dt_config()
    dsp = discriminator.ds_init(jax.random.PRNGKey(2), ds_cfg)
    dtp = discriminator.dt_init(jax.random.PRNGKey(3), dt_cfg)
    frames = video[:, :2].reshape(1, 2, 256, 256, 3)
    s_ds = discriminator.ds_apply(dsp, frames, y, ds_cfg)
    s_dt = discriminator.dt_apply(dtp, video, y, dt_cfg)
    assert s_ds.shape == (1,) and s_dt.shape == (1,)
    assert np.isfinite(float(s_ds[0])) and np.isfinite(float(s_dt[0]))


def test_grad_accum_preset_wiring():
    """Config.grad_accum flows into TrainConfig (preset 4's batch-512 path)."""
    cfg = dataclasses.replace(Config(**PRESETS["kinetics_256_48f"]),
                              grad_accum=8)
    assert cfg.train_config().grad_accum == 8
