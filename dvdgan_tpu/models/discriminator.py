"""Dual discriminators DS / DT (SURVEY.md §2.7–2.8, §3.3).

DS — spatial: scores k randomly-sampled full-resolution frames with a 2-D
BigGAN-D ResNet (pre-activation SN res-blocks downsampling to 4×4, a final
non-downsampling block, ReLU, global sum-pool, SNLinear head) plus Miyato
projection conditioning (+ embed(y)·features); the k per-frame scores are
SUMMED per clip. Frame sampling lives in the train step, not here — DS just
sees (B, k, H, W, 3).

DT — temporal: consumes the whole clip spatially downsampled 2× (the φ
avg-pool, applied by the caller), first `n_3d_blocks` res-blocks are 3×3×3
convs (spatial-only pooling), remaining blocks 2-D per-frame; same
sum-pool + projection head, scores summed over frames.

Both return one scalar score per clip: (B,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvdgan_tpu.models.config import DSConfig, DTConfig
from dvdgan_tpu.ops import layers, resblocks, resize


def _head_init(key, feat_dim: int, n_classes: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "psi": layers.linear_init(k1, feat_dim, 1),
        "proj": layers.embedding_init(k2, n_classes, feat_dim),
    }


def _head(p: dict, feats: jax.Array, y: jax.Array) -> jax.Array:
    """Projection-discriminator head. feats: (N, F); y: (N,) -> (N,)."""
    out = layers.linear(p["psi"], feats)[..., 0]
    emb = layers.embedding(p["proj"], y).astype(feats.dtype)
    return out + jnp.sum(emb * feats, axis=-1)


# ------------------------------------------------------------------- DS -----

def ds_init(key: jax.Array, cfg: DSConfig) -> dict:
    m = cfg.mults
    keys = jax.random.split(key, len(m) + 1)
    blocks = [resblocks.dblock_init(keys[0], 3, cfg.ch * m[0], first=True)]
    for i in range(1, len(m)):
        blocks.append(
            resblocks.dblock_init(keys[i], cfg.ch * m[i - 1], cfg.ch * m[i]))
    return {
        "blocks": blocks,
        "head": _head_init(keys[-1], cfg.feat_dim, cfg.n_classes),
    }


def ds_apply(params: dict, frames: jax.Array, y: jax.Array,
             cfg: DSConfig) -> jax.Array:
    """frames: (B, k, H, W, 3); y: (B,) -> per-clip score (B,)."""
    b, k = frames.shape[:2]
    x = frames.reshape(b * k, *frames.shape[2:])
    n_down = len(cfg.mults) - 1     # final block keeps resolution
    for i, blk in enumerate(params["blocks"]):
        x = resblocks.dblock(blk, x, down=(i < n_down), first=(i == 0))
    x = jax.nn.relu(x)
    feats = resize.global_sum_pool(x)                     # (B*k, F)
    scores = _head(params["head"], feats, jnp.repeat(y, k))
    return scores.reshape(b, k).sum(axis=1)


# ------------------------------------------------------------------- DT -----

def dt_init(key: jax.Array, cfg: DTConfig) -> dict:
    m = cfg.mults
    n3 = cfg.n_3d_blocks
    keys = jax.random.split(key, len(m) + 1)
    blocks = []
    for i in range(len(m)):
        cin = 3 if i == 0 else cfg.ch * m[i - 1]
        cout = cfg.ch * m[i]
        if i < n3:
            blocks.append(resblocks.dblock3d_init(keys[i], cin, cout,
                                                  first=(i == 0)))
        else:
            blocks.append(resblocks.dblock_init(keys[i], cin, cout,
                                                first=False))
    return {
        "blocks": blocks,
        "head": _head_init(keys[-1], cfg.feat_dim, cfg.n_classes),
    }


def dt_apply(params: dict, clip: jax.Array, y: jax.Array,
             cfg: DTConfig, pooled: bool = False) -> jax.Array:
    """clip: (B, T, H, W, 3) at FULL resolution; y: (B,) -> (B,).

    The paper's φ (spatial 2× mean pool) happens here, inside DT, so
    callers pass full-res clips and the pooled tensor is produced once
    per forward. (A space-to-depth stem folding φ into conv1 — cin 3→12
    for MXU lane fill — was tried and MEASURED SLOWER on v5e: 22.2 vs
    23.2 steps/s flagship; the transpose shuffle + a second full-res
    skip pass cost more than the lane-starved cin=3 conv. Keep the pool.)

    `pooled=True` means the caller already applied φ (clip is at H/2×W/2);
    the pool is skipped. φ is per-frame and linear, so pooling once and
    slicing/concatenating outside is exactly the in-forward pool — the
    train step uses this to pool the real clip once per step instead of
    once per D-step forward.
    """
    b, t = clip.shape[:2]
    n_down = len(cfg.mults) - 1
    x = clip if pooled else resize.avg_pool_2x_video(clip)
    i = 0
    for blk in params["blocks"][:cfg.n_3d_blocks]:
        x = resblocks.dblock3d(blk, x, down=(i < n_down), first=(i == 0))
        i += 1
    # fold time for the 2-D tail
    x = x.reshape(b * t, *x.shape[2:])
    for blk in params["blocks"][cfg.n_3d_blocks:]:
        x = resblocks.dblock(blk, x, down=(i < n_down), first=False)
        i += 1
    x = jax.nn.relu(x)
    feats = resize.global_sum_pool(x)                     # (B*T, F)
    scores = _head(params["head"], feats, jnp.repeat(y, t))
    return scores.reshape(b, t).sum(axis=1)
