"""DVD-GAN-FP (video prediction, [P] §3.2 / SURVEY §6 prediction-FVD row):
G conditioned on a real frame prefix via the strided-conv frame encoder +
per-level ConvGRU warm-up; DS samples generated frames only; DT scores the
full clip; the eval harness computes prediction-FVD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig, generator
from dvdgan_tpu.train import TrainConfig, create, make_train_step
from dvdgan_tpu.utils.config import Config

G_CFG = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                emb_dim=16, attn_res=16, cond_frames=2)
DS_CFG = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
DT_CFG = DTConfig(img_size=32, n_frames=6, ch=8, n_classes=5)  # full clip
TC = TrainConfig(d_steps=1, batch_size=2, ema_start=0)


def _cond(b=2, seed=0):
    return jnp.asarray(np.random.RandomState(seed).uniform(
        -1, 1, (b, 2, 32, 32, 3)), jnp.float32)


def test_fp_generator_conditions_on_prefix():
    params, stats = generator.init(jax.random.PRNGKey(0), G_CFG)
    assert "fp_enc" in params
    # encoder stages: stem + one stride-2 per level
    assert len(params["fp_enc"]["stages"]) == G_CFG.n_levels + 1
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 120))
    y = jnp.asarray([0, 3], jnp.int32)
    v1, _ = generator.apply(params, stats, z, y, G_CFG, train=False,
                            cond_video=_cond(seed=0))
    v2, _ = generator.apply(params, stats, z, y, G_CFG, train=False,
                            cond_video=_cond(seed=1))
    assert v1.shape == (2, 4, 32, 32, 3)   # generated frames only
    assert np.isfinite(np.asarray(v1)).all()
    # different prefixes must produce different continuations
    assert not np.allclose(np.asarray(v1), np.asarray(v2))
    # deterministic given (params, z, y, cond)
    v1b, _ = generator.apply(params, stats, z, y, G_CFG, train=False,
                             cond_video=_cond(seed=0))
    assert np.array_equal(np.asarray(v1), np.asarray(v1b))


def test_fp_generator_requires_cond():
    params, stats = generator.init(jax.random.PRNGKey(0), G_CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 120))
    y = jnp.zeros((1,), jnp.int32)
    try:
        generator.apply(params, stats, z, y, G_CFG, train=False)
        assert False, "expected ValueError"
    except ValueError:
        pass


@pytest.mark.slow
def test_fp_train_step_updates_encoder():
    st = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, TC)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.uniform(-1, 1, (2, 6, 32, 32, 3)), jnp.float32)
    y = jnp.asarray([1, 4], jnp.int32)
    step = make_train_step(G_CFG, DS_CFG, DT_CFG, TC, donate=False)
    st2, m = step(st, real, y, jax.random.PRNGKey(2))
    assert int(st2["step"]) == 1
    for v in m.values():
        assert np.isfinite(float(v))
    # the frame encoder receives gradient through the warm-up path
    before = jax.tree.leaves(st["g"]["params"]["fp_enc"])
    after = jax.tree.leaves(st2["g"]["params"]["fp_enc"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_fp_trainer_and_prediction_fvd(tmp_path):
    """End-to-end: FP trainer builds, samples conditioned on the fixed
    dataset prefix, and the eval harness runs the prediction-FVD protocol."""
    from dvdgan_tpu.eval import ClassifierProbs, I3DLikeFeatures
    from dvdgan_tpu.eval import evaluate_generator
    from dvdgan_tpu.train.trainer import Trainer

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=6,
                 cond_frames=2, ch=8, d_ch=8, k_frames=2, batch_size=2,
                 d_steps=1, total_step=0, bf16=False,
                 out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    assert tr.g_cfg.cond_frames == 2 and tr.g_cfg.n_frames == 4
    vids = np.asarray(jax.device_get(tr.sample()), np.float32)
    assert vids.shape[1] == 4   # generated continuation only
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    out = evaluate_generator(tr, fx, n_samples=4, batch_size=2,
                             classifier=ClassifierProbs(3, seed=1,
                                                        widths=(8, 16)))
    tr.close()
    assert np.isfinite(out["fvd"]) and out["fvd"] >= 0
