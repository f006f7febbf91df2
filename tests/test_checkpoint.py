"""Checkpoint/resume must be bitwise (SURVEY.md §5.4): params, EMA, opt
states, SN u, BN stats, step all round-trip exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.train import TrainConfig, checkpoint as ckpt, create

G_CFG = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                emb_dim=16, attn_res=16)
DS_CFG = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
DT_CFG = DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5)
TC = TrainConfig(d_steps=1, batch_size=2)


def test_checkpoint_roundtrip_bitwise(tmp_path):
    st = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, TC)
    d = str(tmp_path / "ckpts")
    ckpt.save(d, 7, jax.device_get(st))
    assert ckpt.latest_step(d) == 7

    template = create(jax.random.PRNGKey(99), G_CFG, DS_CFG, DT_CFG, TC)
    restored = ckpt.restore(d, 7, template)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_restore_latest_none(tmp_path):
    step, st = ckpt.restore_latest(str(tmp_path / "nope"), {"x": jnp.ones(3)})
    assert step is None


def test_latest_picks_max(tmp_path):
    st = {"x": jnp.arange(4.0)}
    d = str(tmp_path / "c")
    ckpt.save(d, 3, st)
    ckpt.save(d, 10, {"x": jnp.arange(4.0) * 2})
    assert ckpt.latest_step(d) == 10
    step, restored = ckpt.restore_latest(d, st)
    assert step == 10
    assert np.allclose(np.asarray(restored["x"]), np.arange(4.0) * 2)
