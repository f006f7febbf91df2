"""Spatial resize / pooling primitives (channels-last).

Covers the reference's F.interpolate(scale=2, nearest), F.avg_pool2d(2) (the
paper's φ downsampling for DT, SURVEY.md §2.8) and the discriminators' global
sum-pool — all expressed as reshape/reduce ops XLA fuses into neighbours.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, 2H, 2W, C) by nearest-neighbor duplication.
    Implemented as broadcast+reshape (no gather): XLA lowers this to a cheap
    layout change feeding the following conv."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, C) 2×2 mean pooling (reshape-reduce).

    dtype=x.dtype keeps the 4-element accumulation in the activation dtype:
    jnp.mean's default f16/bf16→f32 upcast made XLA emit the preceding conv
    with an f32 output (a full-activation f32 round-trip fused into every
    pooled D conv — measured ~0.6 ms each on the flagship profile) for a
    mean of FOUR values, where bf16 accumulation is harmless."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4), dtype=x.dtype)


def avg_pool_2x_video(x: jax.Array) -> jax.Array:
    """(N, T, H, W, C) -> (N, T, H/2, W/2, C): the DT input transform φ.
    Activation-dtype accumulation — see avg_pool_2x."""
    n, t, h, w, c = x.shape
    x = x.reshape(n, t, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(3, 5), dtype=x.dtype)


def global_sum_pool(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, C) sum over the spatial grid (BigGAN D head)."""
    return x.sum(axis=(1, 2))
