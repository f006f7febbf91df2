"""Residual blocks: generator (GResBlock) and discriminator (DBlock 2D/3D).

GResBlock (SURVEY.md §2.4, BigGAN-style, applied per-frame with time folded
into batch):

    main: CBN → ReLU → [upsample 2×] → SNConv3×3 → CBN → ReLU → SNConv3×3
    skip: [upsample 2×] → SNConv1×1 (identity when shape-preserving)

DBlock (SURVEY.md §2.7/2.8, pre-activation ResNet-D):

    main: ReLU → SNConv3×3 → ReLU → SNConv3×3 → [avgpool 2×]
    skip: SNConv1×1 → [avgpool]          (conv only when channels change)
    first (from-RGB) variant: no leading ReLU; skip = avgpool → SNConv1×1.

DBlock3D is the same topology with 3×3×3 convs and spatial-only pooling —
DT's first two blocks (the time axis keeps full length; the paper downsamples
space via φ before DT and lets the 3D receptive field grow over time).
"""

from __future__ import annotations

from typing import Optional

import jax

from dvdgan_tpu.ops import layers, norm, resize

# Output row-pair lowering for narrow 2-D convs (layers.conv2d_rowpair):
# the 2-D analog of TPAIR_ENABLED below, applied where Cout ≤ 64 fills at
# most half the MXU lanes. MEASURED LOSER (v5e flagship bench, 2026-08-17):
# 24.0/20.7 steps/s ON vs 25.2 with tpair alone — XLA's 2-D conv lowering
# is not lane-bound at these widths, so the 4/3× FLOPs + row interleave
# only cost. Kept (exact, oracle-tested) for wider-map configs; do not
# flip without re-measuring.
ROWPAIR_ENABLED = False


def _conv2d_main(p: dict, x: jax.Array) -> jax.Array:
    if (ROWPAIR_ENABLED and p["w"].shape[-1] <= 64
            and x.shape[1] % 2 == 0):
        return layers.conv2d_rowpair(p, x)
    return layers.conv2d(p, x)


# ------------------------------------------------------------- GResBlock ----

def gresblock_init(key, cin: int, cout: int, cond_dim: int) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = {
        "cbn1": norm.cbn_init(k1, cond_dim, cin),
        "conv1": layers.conv2d_init(k2, 3, cin, cout),
        "cbn2": norm.cbn_init(k3, cond_dim, cout),
        "conv2": layers.conv2d_init(k4, 3, cout, cout),
    }
    if cin != cout:
        p["skip"] = layers.conv2d_init(k5, 1, cin, cout)
    return p


def gresblock_stats_init(cin: int, cout: int) -> dict:
    return {"bn1": norm.stats_init(cin), "bn2": norm.stats_init(cout)}


def gresblock(p: dict, stats: dict, x: jax.Array, cond: jax.Array,
              train: bool, upsample: bool,
              axis_name: Optional[str] = None):
    """x: (N, H, W, Cin), cond: (N, cond_dim) -> ((N, H', W', Cout), stats)."""
    h, s1 = norm.cbn(p["cbn1"], stats["bn1"], x, cond, train, axis_name)
    h = jax.nn.relu(h)
    if upsample:
        # exact phase-decomposed up→conv: 2.25× fewer MACs (see layers)
        h = layers.upsample2x_conv3x3(p["conv1"], h)
    else:
        h = layers.conv2d(p["conv1"], h)
    h, s2 = norm.cbn(p["cbn2"], stats["bn2"], h, cond, train, axis_name)
    h = jax.nn.relu(h)
    h = _conv2d_main(p["conv2"], h)

    sc = x
    if upsample:
        if "skip" in p:
            # 1×1 conv commutes with nearest-up exactly — conv at LOW
            # resolution (4× fewer MACs), then upsample
            sc = resize.upsample_nearest_2x(layers.conv2d(p["skip"], sc))
        else:
            sc = resize.upsample_nearest_2x(sc)
    elif "skip" in p:
        sc = layers.conv2d(p["skip"], sc)
    return h + sc, {"bn1": s1, "bn2": s2}


# ------------------------------------------------------------ DBlock (2D) ---

def dblock_init(key, cin: int, cout: int, first: bool = False) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": layers.conv2d_init(k1, 3, cin, cout),
        "conv2": layers.conv2d_init(k2, 3, cout, cout),
    }
    if first or cin != cout:
        p["skip"] = layers.conv2d_init(k3, 1, cin, cout)
    return p


def dblock(p: dict, x: jax.Array, down: bool, first: bool = False
           ) -> jax.Array:
    """x: (N, H, W, Cin) -> (N, H', W', Cout)."""
    h = x if first else jax.nn.relu(x)
    h = _conv2d_main(p["conv1"], h)
    h = jax.nn.relu(h)
    h = _conv2d_main(p["conv2"], h)
    if down:
        h = resize.avg_pool_2x(h)

    sc = x
    if down:
        # avg-pool commutes EXACTLY with the pointwise 1×1 skip conv
        # (both linear, conv is per-pixel) — pool first: 4× fewer MACs.
        # This also makes the first/non-first skip orders identical.
        sc = resize.avg_pool_2x(sc)
    if "skip" in p:
        sc = layers.conv2d(p["skip"], sc)
    return h + sc


# ------------------------------------------------------------ DBlock (3D) ---

# Temporal output-pair lowering for the 3-D convs (layers.conv3d_tpair):
# doubles MXU lane fill at Cout 32/64 for 4/3× nominal FLOPs — a win iff
# the conv is lane-bound, which DT's are. MEASURED (v5e flagship bench,
# scan-amortized, 2026-08-17): 25.20/25.18 steps/s ON vs 24.10 OFF (+4.5%).
# Exact math (oracle + grad test); odd-T inputs fall back to plain conv3d.
TPAIR_ENABLED = True


def _conv3d_main(p: dict, x: jax.Array) -> jax.Array:
    # cout in [64,128) only: pairing then fills the full 128 lanes. At the
    # cout=32 stems (128/256px DT) BOTH alternatives measured no better:
    # pairing (64 lanes, 4/3× FLOPs) was a net LOSS at 256px/48f (2.26 vs
    # 2.36 steps/s) and QUAD-phasing (128 lanes, 2× FLOPs,
    # layers.conv3d_tphase_core n=4) was a wash (128px 6.57 vs 6.64, 256px
    # 2.41 vs 2.39 — the extra FLOPs cancel the fill). Plain conv there.
    if (TPAIR_ENABLED and x.shape[1] % 2 == 0
            and 64 <= p["w"].shape[-1] < 128):
        return layers.conv3d_tpair(p, x)
    return layers.conv3d(p, x)


def dblock3d_init(key, cin: int, cout: int, first: bool = False) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": layers.conv3d_init(k1, (3, 3, 3), cin, cout),
        "conv2": layers.conv3d_init(k2, (3, 3, 3), cout, cout),
    }
    if first or cin != cout:
        p["skip"] = layers.conv3d_init(k3, (1, 1, 1), cin, cout)
    return p


def _avg_pool_2x_spatial_video(x: jax.Array) -> jax.Array:
    return resize.avg_pool_2x_video(x)


def dblock3d(p: dict, x: jax.Array, down: bool, first: bool = False
             ) -> jax.Array:
    """x: (N, T, H, W, Cin) -> (N, T, H', W', Cout); pooling is spatial-only."""
    h = x if first else jax.nn.relu(x)
    h = _conv3d_main(p["conv1"], h)
    if first:
        # split the backward fusion at the cin=3 stem (see grad_barrier)
        h = layers.grad_barrier(h)
    h = jax.nn.relu(h)
    h = _conv3d_main(p["conv2"], h)
    if down:
        h = _avg_pool_2x_spatial_video(h)

    sc = x
    if down:
        # spatial avg-pool commutes exactly with the 1×1×1 skip conv —
        # pool first (4× fewer MACs); see dblock
        sc = _avg_pool_2x_spatial_video(sc)
    if "skip" in p:
        sc = layers.conv3d(p["skip"], sc)
    return h + sc
