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


def test_async_save_matches_sync_bitwise(tmp_path):
    """AsyncSaver must produce a checkpoint bitwise-indistinguishable
    from the synchronous path (the full-state snapshot is taken on the
    caller's thread at save() time; the write happens in background)."""
    st = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, TC)
    d_sync = str(tmp_path / "sync")
    d_async = str(tmp_path / "async")
    ckpt.save(d_sync, 5, jax.device_get(st))

    saver = ckpt.AsyncSaver()
    saver.save(d_async, 5, st)
    template = jax.tree.map(jnp.zeros_like, st)
    del st   # caller dropping its reference must not affect the write
    saver.wait()
    a = ckpt.restore(d_sync, 5, template)
    b = ckpt.restore(d_async, 5, template)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_async_save_prunes_and_orders(tmp_path):
    """Back-to-back async saves serialize (one in flight); retention
    pruning runs on the background thread and keeps the newest N."""
    saver = ckpt.AsyncSaver()
    d = str(tmp_path / "c")
    for s in (1, 2, 3):
        saver.save(d, s, {"x": jnp.full((4,), float(s))}, max_to_keep=2)
    saver.wait()
    steps = sorted(int(p.name) for p in (tmp_path / "c").iterdir())
    assert steps == [2, 3]
    assert ckpt.latest_step(d) == 3


def test_async_save_error_surfaces(tmp_path):
    """A failed background write must raise on the train thread (at the
    next save/wait), not vanish — silent checkpoint loss would break the
    auto-resume preemption contract."""
    blocker = tmp_path / "c"
    blocker.write_text("not a directory")
    saver = ckpt.AsyncSaver()
    saver.save(str(blocker), 1, {"x": jnp.ones(3)})
    import pytest
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        saver.wait()
    # the saver is reusable after the failure is surfaced
    ok = tmp_path / "ok"
    saver.save(str(ok), 2, {"x": jnp.ones(3)})
    saver.wait()
    assert ckpt.latest_step(str(ok)) == 2


def test_latest_picks_max(tmp_path):
    st = {"x": jnp.arange(4.0)}
    d = str(tmp_path / "c")
    ckpt.save(d, 3, st)
    ckpt.save(d, 10, {"x": jnp.arange(4.0) * 2})
    assert ckpt.latest_step(d) == 10
    step, restored = ckpt.restore_latest(d, st)
    assert step == 10
    assert np.allclose(np.asarray(restored["x"]), np.arange(4.0) * 2)
