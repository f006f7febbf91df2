"""Batch normalization: plain and class-conditional, cross-replica capable.

Behavioral spec (SURVEY.md §2.2): G uses class-conditional BN whose per-sample
γ/β are linear maps of the conditioning vector (z-chunk ++ shared class
embedding, the BigGAN scheme); the output head uses plain BN. The original
TPU system used cross-replica BN — batch moments all-reduced over the data
axis — which the PyTorch reference cannot do in a single process; here it is
first-class: pass `axis_name` when running under shard_map and the moments
are `lax.pmean`ed over ICI.

State contract: running moments live in an explicit {path: {'mean','var'}}
state tree threaded through apply (reference: torch BN buffers). `train` is a
static Python bool. Moment math is always float32.

Framework contract (documented deviation from torch): the running variance
stores the biased batch variance (torch stores the unbiased one); both
normalize with biased variance, so train-mode behavior is identical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dvdgan_tpu.core import init as winit
from dvdgan_tpu.ops import layers


def _batch_moments(x: jax.Array, axis_name: Optional[str]):
    """Biased mean/var over all but the channel axis, float32, optionally
    pmean-reduced over the mesh data axis (cross-replica BN)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = x32.mean(axes)
    mean_sq = (x32 * x32).mean(axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    return mean, var


def _normalize(x, mean, var, eps):
    """Normalize in the ACTIVATION dtype (bf16 in production): moments are
    f32-exact, but the big (B·T, H, W, C) elementwise pass is HBM-bandwidth
    bound, so the per-element math runs at the activation width. mean/inv
    are per-channel scalars — rounding them to bf16 costs ~1e-3 relative,
    in line with bf16 conv outputs on either side of the BN."""
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


def stats_init(c: int) -> dict:
    return {"mean": winit.zeros((c,)), "var": winit.ones((c,))}


def _select_moments(stats, x, train, axis_name, momentum):
    if train:
        mean, var = _batch_moments(x, axis_name)
        new_stats = {
            "mean": (1.0 - momentum) * stats["mean"] + momentum * mean,
            "var": (1.0 - momentum) * stats["var"] + momentum * var,
        }
        return mean, var, new_stats
    return stats["mean"], stats["var"], stats


# ------------------------------------------------------------ plain BN ------

def bn_init(key, c: int) -> dict:
    del key
    return {"scale": winit.ones((c,)), "bias": winit.zeros((c,))}


def bn(p: dict, stats: dict, x: jax.Array, train: bool,
       axis_name: Optional[str] = None, momentum: float = 0.1,
       eps: float = 1e-5):
    """(y, new_stats). x: (..., C)."""
    mean, var, new_stats = _select_moments(stats, x, train, axis_name, momentum)
    y = _normalize(x, mean, var, eps)
    y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y.astype(x.dtype), new_stats


# ------------------------------------------------- class-conditional BN -----

def cbn_init(key, cond_dim: int, c: int) -> dict:
    k1, k2 = jax.random.split(key)
    # γ = 1 + W_g·cond, β = W_b·cond: zero-centered linear maps (no bias) so
    # init behaves like identity BN. Kernels are named 'w' → spectrally
    # normalized by the SN pass, matching BigGAN's SN-everywhere convention.
    return {
        "gamma": layers.linear_init(k1, cond_dim, c, use_bias=False),
        "beta": layers.linear_init(k2, cond_dim, c, use_bias=False),
    }


def cbn(p: dict, stats: dict, x: jax.Array, cond: jax.Array, train: bool,
        axis_name: Optional[str] = None, momentum: float = 0.1,
        eps: float = 1e-5):
    """(y, new_stats). x: (N, H, W, C); cond: (N, cond_dim) — per-sample
    affine. Callers with time folded into batch repeat cond over T first."""
    mean, var, new_stats = _select_moments(stats, x, train, axis_name, momentum)
    y = _normalize(x, mean, var, eps)
    one = jnp.ones((), x.dtype)
    gamma = one + layers.linear(p["gamma"], cond)      # (N, C) in x.dtype
    beta = layers.linear(p["beta"], cond)
    y = y * gamma[:, None, None, :] + beta[:, None, None, :]
    return y.astype(x.dtype), new_stats
