"""Context parallelism over the clip's TIME axis (SURVEY.md §5.7 seam).

DVD-GAN's answer to long sequences is architectural (DS subsamples k frames,
DT runs at ½ resolution, G scans with O(1) state) — but at the 48-frame /
256px config the temporal discriminator's activations can still pressure
HBM. This module shards DT's input clip over a `time` mesh axis:

  * the first `n_3d_blocks` residual blocks use 3×3×3 convs → each shard
    needs ONE frame of halo per side per conv. `_halo_exchange` passes
    boundary frames between neighbor shards with `jax.lax.ppermute` (ICI
    neighbor traffic, no all-gather of the clip);
  * the 2-D per-frame tail and the per-frame score head are purely local;
  * the final per-clip score is a `lax.psum` of local frame-score sums.

Valid-region bookkeeping: rather than recomputing halo frames per conv, each
3-D block re-exchanges halos (2 ppermutes per conv) — for T_local ≫ 1 the
traffic is 2·(H·W·C) per step per conv, negligible against the conv FLOPs.

This gives bit-equal scores to the unsharded `dt_apply` (up to float
reassociation in the psum) — tested on the CPU mesh in
tests/test_time_shard.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dvdgan_tpu.models.config import DTConfig
from dvdgan_tpu.models.discriminator import _head
from dvdgan_tpu.ops import layers, resblocks, resize


def _halo_exchange(x: jax.Array, axis_name: str) -> jax.Array:
    """x: (B, T_local, H, W, C) -> (B, T_local+2, H, W, C) with neighbors'
    boundary frames (zero frames at the clip's two ends)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send my LAST frame to my right neighbor (it becomes their left halo)
    left_halo = jax.lax.ppermute(
        x[:, -1], axis_name, [(i, (i + 1) % n) for i in range(n)])
    # send my FIRST frame to my left neighbor (their right halo)
    right_halo = jax.lax.ppermute(
        x[:, 0], axis_name, [(i, (i - 1) % n) for i in range(n)])
    zero = jnp.zeros_like(left_halo)
    left_halo = jnp.where(idx == 0, zero, left_halo)
    right_halo = jnp.where(idx == n - 1, zero, right_halo)
    return jnp.concatenate(
        [left_halo[:, None], x, right_halo[:, None]], axis=1)


def _conv3d_halo(p, x: jax.Array, axis_name: str) -> jax.Array:
    """3×3×3 SAME conv over the time-sharded clip: exchange 1-frame halos,
    run the conv VALID over time, SAME over space.

    With resblocks.TPAIR_ENABLED and an even local T, the conv lowers as
    temporal output-pairs (layers.conv3d_tpair's widened kernel) directly
    over the halo'd window — the same exact-math MXU-lane-fill win the
    unsharded dblock3d gets (windows at stride 2 from the left halo cover
    exactly the T_local output frames)."""
    xh = _halo_exchange(x, axis_name)
    t_local = x.shape[1]
    if (resblocks.TPAIR_ENABLED and t_local % 2 == 0
            and 64 <= p["w"].shape[-1] < 128):  # same gate as _conv3d_main:
        # cout >= 128 pairs past the 128 lanes — pure FLOP overhead, and
        # the sharded lowering must match the unsharded one
        y = layers.conv3d_tpair_core(p["w"], xh, time_pad=(0, 0))
    else:
        w = p["w"].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            xh, w, window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _dblock3d_sharded(p, x, down: bool, first: bool, axis_name: str):
    """resblocks.dblock3d with halo-exchanged time-sharded convs."""
    h = x if first else jax.nn.relu(x)
    h = _conv3d_halo(p["conv1"], h, axis_name)
    h = jax.nn.relu(h)
    h = _conv3d_halo(p["conv2"], h, axis_name)
    if down:
        h = resize.avg_pool_2x_video(h)
    sc = x
    if first:
        if down:
            sc = resize.avg_pool_2x_video(sc)
        if "skip" in p:
            sc = layers.conv3d(p["skip"], sc)   # 1×1×1: no halo needed
    else:
        if "skip" in p:
            sc = layers.conv3d(p["skip"], sc)
        if down:
            sc = resize.avg_pool_2x_video(sc)
    return h + sc


def dt_apply_time_sharded(params: dict, clip_shard: jax.Array, y: jax.Array,
                          cfg: DTConfig, axis_name: str = "time"
                          ) -> jax.Array:
    """Time-sharded DT forward. Call INSIDE shard_map with the FULL-RES
    clip split over `axis_name`: clip_shard (B, T/n, H, W, 3) -> per-clip
    score (B,), identical on every time shard (psum-reduced). φ (spatial
    2× mean pool, per-frame, commutes with the time sharding) happens
    here, matching discriminator.dt_apply."""
    b, t_local = clip_shard.shape[:2]
    n_down = len(cfg.mults) - 1
    x = resize.avg_pool_2x_video(clip_shard)
    i = 0
    for blk in params["blocks"][:cfg.n_3d_blocks]:
        x = _dblock3d_sharded(blk, x, down=(i < n_down), first=(i == 0),
                              axis_name=axis_name)
        i += 1
    x = x.reshape(b * t_local, *x.shape[2:])
    for blk in params["blocks"][cfg.n_3d_blocks:]:
        x = resblocks.dblock(blk, x, down=(i < n_down), first=False)
        i += 1
    x = jax.nn.relu(x)
    feats = resize.global_sum_pool(x)                     # (B*T_local, F)
    scores = _head(params["head"], feats, jnp.repeat(y, t_local))
    local = scores.reshape(b, t_local).sum(axis=1)
    return jax.lax.psum(local, axis_name)


def make_sharded_dt(params, cfg: DTConfig, mesh, time_axis: str = "time"):
    """Convenience wrapper: full-clip (B, T, H/2, W/2, 3) in, scores out,
    sharding the time axis over `mesh`'s `time_axis`."""
    from jax.sharding import PartitionSpec as P

    def fn(params, clip, y):
        return dt_apply_time_sharded(params, clip, y, cfg, time_axis)

    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(None, time_axis), P()),
        out_specs=P(),
        check_vma=False)
    return functools.partial(mapped, params)
