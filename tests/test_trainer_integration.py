"""End-to-end Trainer integration (BASELINE config 0 / SURVEY §4's
designated smoke: one G+D step + sample, scaled down for the 1-core CPU
runner): train a few steps on synthetic data through the full Trainer
orchestration — loader, jitted step, logging, sample dump, checkpoint —
then auto-resume from the checkpoint."""

import glob
import os

import numpy as np
import pytest

from dvdgan_tpu.train.trainer import Trainer
from dvdgan_tpu.utils.config import Config


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    return Config(dataset="synthetic", n_classes=4, img_size=32, n_frames=4,
                  ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                  total_step=2, log_step=1, sample_step=2,
                  model_save_step=2, ema_start=0, bf16=False, out_dir=out)


def test_trainer_end_to_end(cfg):
    tr = Trainer(cfg)
    metrics = tr.train()
    tr.close()
    assert all(np.isfinite(v) for v in metrics.values())
    # scalar log written
    logf = os.path.join(cfg.out_dir, "logs", "scalars.jsonl")
    assert os.path.getsize(logf) > 0
    # sample artifacts dumped at step 2
    assert glob.glob(os.path.join(cfg.out_dir, "samples", "2_grid.png"))
    assert glob.glob(os.path.join(cfg.out_dir, "samples", "2_sample*.gif"))
    # checkpoint written at step 2
    assert os.path.isdir(os.path.join(cfg.out_dir, "checkpoints", "2"))


def test_trainer_auto_resumes(cfg):
    tr2 = Trainer(cfg)  # same out_dir: must pick up the step-2 checkpoint
    assert tr2.start_step == 2
    m = tr2.train(total_step=3)  # one more step from the restored state
    tr2.close()
    assert all(np.isfinite(v) for v in m.values())


def test_trainer_sample_shape(cfg):
    tr = Trainer(cfg)
    v = np.asarray(tr.sample(), np.float32)
    tr.close()
    assert v.shape == (2, 4, 32, 32, 3)
    assert v.min() >= -1.0 and v.max() <= 1.0
