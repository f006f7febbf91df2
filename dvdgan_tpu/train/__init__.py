"""Training layer: state pytree, jitted alternating G/D step, EMA,
sampling — SURVEY.md §2.10–2.11, §3.1."""

from dvdgan_tpu.train.state import TrainConfig, create, ema_update  # noqa: F401
from dvdgan_tpu.train.step import (  # noqa: F401
    make_train_step, sample, sample_frame_indices, take_frames, train_step)
