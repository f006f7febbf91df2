"""Training-step tests (SURVEY.md §4): one-step finite-loss/param-change,
determinism at matched seeds, EMA warmup semantics, SN update contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.train import TrainConfig, create, make_train_step

G_CFG = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                emb_dim=16, attn_res=16)
DS_CFG = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
DT_CFG = DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5)
TC = TrainConfig(d_steps=1, batch_size=2, ema_start=0)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    st = create(key, G_CFG, DS_CFG, DT_CFG, TC)
    real = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    y = jnp.array([0, 3])
    step = make_train_step(G_CFG, DS_CFG, DT_CFG, TC, donate=False)
    return st, real, y, step


def _l(tree):
    return jax.tree.leaves(tree)


def test_one_step_finite_and_params_change(setup):
    st, real, y, step = setup
    st2, m = step(st, real, y, jax.random.PRNGKey(2))
    for v in m.values():
        assert np.isfinite(float(v))
    assert int(st2["step"]) == 1
    for name in ("g", "ds", "dt"):
        before = _l(st[name]["params"])
        after = _l(st2[name]["params"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after)), name


def test_determinism_same_seed(setup):
    st, real, y, step = setup
    a, ma = step(st, real, y, jax.random.PRNGKey(7))
    b, mb = step(st, real, y, jax.random.PRNGKey(7))
    for la, lb in zip(_l(a), _l(b)):
        assert np.array_equal(np.asarray(la), np.asarray(lb))
    c, _ = step(st, real, y, jax.random.PRNGKey(8))
    assert any(not np.array_equal(np.asarray(x), np.asarray(z))
               for x, z in zip(_l(a["g"]["params"]), _l(c["g"]["params"])))


def test_sn_u_advances_once_per_owner_step(setup):
    st, real, y, step = setup
    st2, _ = step(st, real, y, jax.random.PRNGKey(3))
    for name in ("g", "ds", "dt"):
        before = st[name]["sn_u"]
        after = st2[name]["sn_u"]
        changed = [p for p in before
                   if not np.allclose(np.asarray(before[p]),
                                      np.asarray(after[p]), atol=1e-7)]
        assert changed, f"{name} sn_u never advanced"


def test_ema_tracks_params_during_warmup(setup):
    """ema_start=0 in TC means decay kicks in at step>=0; use a fresh state
    with a large ema_start to check copy-through."""
    tc = TrainConfig(d_steps=1, batch_size=2, ema_start=1000)
    st = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, tc)
    step = make_train_step(G_CFG, DS_CFG, DT_CFG, tc, donate=False)
    real = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    st2, _ = step(st, real, jnp.array([0, 3]), jax.random.PRNGKey(2))
    # during warmup EMA == params exactly
    for e, p in zip(_l(st2["g_ema"]), _l(st2["g"]["params"])):
        assert np.allclose(np.asarray(e), np.asarray(p))


def test_sampling_shapes_and_determinism(setup):
    from dvdgan_tpu.train import sample
    st, real, y, step = setup
    st2, _ = step(st, real, y, jax.random.PRNGKey(4))
    z = jax.random.normal(jax.random.PRNGKey(5), (2, G_CFG.z_dim))
    v1 = sample(st2["g_ema"], st2["g"]["stats"], st2["g"]["sn_u"], z, y, G_CFG)
    v2 = sample(st2["g_ema"], st2["g"]["stats"], st2["g"]["sn_u"], z, y, G_CFG)
    assert v1.shape == (2, 4, 32, 32, 3)
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
