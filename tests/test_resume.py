"""Preemption-safety test (SURVEY §5.3/§5.4): train N steps with a
checkpoint in the middle, restore, continue — the final state must be
BITWISE identical to an uninterrupted run (params, opt states, EMA, SN u,
BN stats), because per-step keys derive from (seed, step)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.train import TrainConfig, checkpoint as ckpt
from dvdgan_tpu.train import create, make_train_step

G_CFG = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                emb_dim=16, attn_res=16)
DS_CFG = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
DT_CFG = DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5)
TC = TrainConfig(d_steps=1, batch_size=2, ema_start=0)
SEED = 0


def _batch(i):
    rng = np.random.RandomState(100 + i)
    return (jnp.asarray(rng.randn(2, 4, 32, 32, 3), jnp.float32),
            jnp.asarray(rng.randint(0, 5, 2), jnp.int32))


def _key(i):
    return jax.random.fold_in(jax.random.PRNGKey(SEED), i)


def test_resume_is_bitwise(tmp_path):
    step = make_train_step(G_CFG, DS_CFG, DT_CFG, TC, donate=False)

    # uninterrupted: 4 steps
    st_a = create(jax.random.PRNGKey(SEED), G_CFG, DS_CFG, DT_CFG, TC)
    for i in range(4):
        real, y = _batch(i)
        st_a, _ = step(st_a, real, y, _key(i))

    # interrupted: 2 steps, checkpoint, fresh-template restore, 2 more
    st_b = create(jax.random.PRNGKey(SEED), G_CFG, DS_CFG, DT_CFG, TC)
    for i in range(2):
        real, y = _batch(i)
        st_b, _ = step(st_b, real, y, _key(i))
    d = str(tmp_path / "ck")
    ckpt.save(d, 2, jax.device_get(st_b))

    template = create(jax.random.PRNGKey(SEED + 999), G_CFG, DS_CFG,
                      DT_CFG, TC)
    resumed_step, st_c = ckpt.restore_latest(d, template)
    assert resumed_step == 2
    for i in range(2, 4):
        real, y = _batch(i)
        st_c, _ = step(st_c, real, y, _key(i))

    leaves_a = jax.tree.leaves(st_a)
    leaves_c = jax.tree.leaves(st_c)
    assert len(leaves_a) == len(leaves_c)
    for a, c in zip(leaves_a, leaves_c):
        assert np.array_equal(np.asarray(a), np.asarray(c))
