"""Fused spatial self-attention as a Pallas TPU kernel (SURVEY.md §2 native
obligation #2: separable spatio-temporal self-attention as fused kernels).

One kernel invocation = one frame's ENTIRE spatial attention block:

    q = x·Wq;  kv-tokens = 2×2 max-pool(x);  k = kv·Wk;  v = kv·Wv
    y = softmax(q kᵀ) v · Wo
    out = x + γ·y                (residual fused in)

vs the XLA path, this keeps the (HW × HW/4) logits matrix in VMEM instead
of round-tripping it (f32, the largest intermediate in the generator at
32×32: 1024×256×4B per frame) through HBM, and fuses five matmuls + softmax
+ residual into one launch. Grid = (B·T,) — one program per frame,
pipelined by the Pallas grid machinery.

Backward: custom VJP with plain-JAX recompute (same pattern as the fused
ConvGRU cell — forward speed from Pallas, gradients from jax.vjp of the
reference math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Same conservative per-block budget philosophy as the GRU kernels (see
# convgru_cell._VMEM_LIMIT_BYTES: Mosaic's scoped estimate undercounts ~2×
# once the grid pipelines). The known-good 32×32 c=64 frame holds ~2.3 MB
# here; a 64×64 frame needs 32 MB of f32 logits+attn alone and can NEVER
# fit un-tiled — maps beyond ~48² need a tiled (flash-style) kernel, not
# this one.
_VMEM_LIMIT_BYTES = 4 * 1024 * 1024


def fits_vmem(h: int, w: int, c: int, itemsize: int = 2,
              c8: int | None = None, c2: int | None = None) -> bool:
    """True when one frame's whole attention block fits the VMEM budget.
    ops/attention.py's auto-gate must check this — without it, larger
    attention maps compile an over-budget kernel and die in an opaque
    Mosaic OOM (HTTP 500 through the remote-compile tunnel)."""
    hw, kvn = h * w, (h // 2) * (w // 2)
    c8 = c8 if c8 is not None else max(c // 8, 1)
    c2 = c2 if c2 is not None else max(c // 2, 1)
    logits = 2 * hw * kvn * 4                      # f32 logits + attn
    # x and out frame blocks are grid-streamed -> double-buffered (same
    # 2x the GRU kernels' _seq_batch_block counts); pooled kv is scratch
    stream = 2 * (2 * hw * c) * itemsize
    kvtok = kvn * c * itemsize
    qkv = (hw * c8 + kvn * (c8 + c2) + hw * c2) * 4
    f32io = 2 * hw * c * 4                         # xt-as-f32 + y/out f32
    return logits + stream + kvtok + qkv + f32io < _VMEM_LIMIT_BYTES


def _attn_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, gamma_ref, out_ref):
    _, h, w, c = x_ref.shape
    x = x_ref[0]                                   # (H, W, C)
    xt = x.reshape(h * w, c)

    # 2×2 max-pooled key/value tokens (BigGAN's memory trick)
    pooled = x.reshape(h // 2, 2, w // 2, 2, c).max(axis=(1, 3))
    kv = pooled.reshape((h // 2) * (w // 2), c)

    q = jnp.dot(xt, wq_ref[:], preferred_element_type=jnp.float32)
    k = jnp.dot(kv, wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(kv, wv_ref[:], preferred_element_type=jnp.float32)

    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)         # f32, stays in VMEM

    o = jnp.dot(attn.astype(x.dtype), v.astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = jnp.dot(o.astype(x.dtype), wo_ref[:],
                preferred_element_type=jnp.float32)

    out = xt.astype(jnp.float32) + gamma_ref[0, 0] * y
    out_ref[0] = out.astype(out_ref.dtype).reshape(h, w, c)


def _spatial_attn_pallas(x: jax.Array, wq, wk, wv, wo, gamma,
                         interpret: bool = False) -> jax.Array:
    """x: (N, H, W, C) frames -> same shape (residual included)."""
    n, h, w, c = x.shape
    gamma2 = gamma.reshape(1, 1).astype(jnp.float32)

    frame_spec = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hw, kvn = h * w, (h // 2) * (w // 2)
    c8, c2 = wq.shape[-1], wv.shape[-1]
    if not (interpret
            or fits_vmem(h, w, c, x.dtype.itemsize, c8=c8, c2=c2)):
        # mirror convgru_seq: the explicit use_pallas=True override must
        # fail loudly here, not as an opaque Mosaic OOM (HTTP 500 through
        # the remote-compile tunnel)
        raise ValueError(
            f"spatial-attention frame ({h},{w},{c}) does not fit the "
            f"per-block VMEM budget — gate with attention_spatial."
            f"fits_vmem and fall back to the XLA path (maps beyond ~48^2 "
            f"need a tiled/flash kernel, not this one)")
    return pl.pallas_call(
        _attn_kernel,
        grid=(n,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[frame_spec, w_spec, w_spec, w_spec, w_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=frame_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (hw * c * c8 + 2 * kvn * c * (c8 + c2) // 2
                           + hw * kvn * c8 + hw * kvn * c2 + hw * c2 * c),
            bytes_accessed=2 * n * hw * c * x.dtype.itemsize,
            transcendentals=n * hw * kvn,
        ),
        interpret=interpret,
    )(x, wq.astype(x.dtype), wk.astype(x.dtype), wv.astype(x.dtype),
      wo.astype(x.dtype), gamma2)


# ------------------------------------------------- q-tiled (64²+) kernel ---
#
# The un-tiled kernel above can NEVER hold a 64² map (f32 logits alone are
# 33.6 MB > the 16 MB scoped-vmem hard limit). But the POOLED kv side stays
# tiny at every realistic map (64²: 1024 tokens × C), so no online-softmax
# flash machinery is needed — tiling the QUERY rows alone suffices: each
# grid step owns `bqr` image rows of queries, the whole frame rides VMEM
# resident for the kv pooling (constant index over q-blocks → fetched once
# per frame), and each q-block computes its full softmax row against the
# complete kv in one pass. kv/k/v are recomputed per q-block (~5 MFLOP —
# noise against the block's ~85 MFLOP of attention matmuls).

_TILED_VMEM_LIMIT_BYTES = int(12 * 1024 * 1024)


def _pad128(c: int) -> int:
    return ((c + 127) // 128) * 128


def _tiled_bytes(bqr: int, h: int, w: int, c: int, itemsize: int,
                 c8: int, c2: int) -> int:
    """Padded-allocation model (lane dims pad to 128; every block
    double-buffers — the ups2x_fused calibration, PERF s15)."""
    hwq, kvn = bqr * w, (h // 2) * (w // 2)
    frame = 2 * h * w * _pad128(c) * itemsize            # resident, 2×buf
    qblk = 2 * hwq * _pad128(c) * itemsize               # q rows, 2×buf
    out = 2 * hwq * _pad128(c) * itemsize
    logits = 2 * hwq * _pad128(kvn) * 4                  # logits + attn f32
    kv = kvn * _pad128(c) * itemsize
    qkv = (hwq + kvn) * _pad128(c8) * 4 + kvn * _pad128(c2) * 4
    yo = hwq * (_pad128(c2) + _pad128(c)) * 4
    return frame + qblk + out + logits + kv + qkv + yo


def plan_tiled(h: int, w: int, c: int, itemsize: int = 2,
               c8: int | None = None, c2: int | None = None):
    """-> bqr (query rows per block) or None. Requires even H, W."""
    c8 = c8 if c8 is not None else max(c // 8, 1)
    c2 = c2 if c2 is not None else max(c // 2, 1)
    for bqr in [d for d in range(h, 0, -1) if h % d == 0]:
        if bqr > 16:
            continue
        if _tiled_bytes(bqr, h, w, c, itemsize, c8,
                        c2) < _TILED_VMEM_LIMIT_BYTES:
            return bqr
    return None


def fits_tiled(h, w, c, itemsize: int = 2, c8=None, c2=None) -> bool:
    return (h % 2 == 0 and w % 2 == 0
            and plan_tiled(h, w, c, itemsize, c8, c2) is not None)


def _attn_tiled_kernel(x_ref, q_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                       gamma_ref, out_ref):
    _, h, w, c = x_ref.shape
    bqr = q_ref.shape[1]
    x = x_ref[0]                                   # (H, W, C) whole frame
    pooled = x.reshape(h // 2, 2, w // 2, 2, c).max(axis=(1, 3))
    kv = pooled.reshape((h // 2) * (w // 2), c)
    k = jnp.dot(kv, wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(kv, wv_ref[:], preferred_element_type=jnp.float32)

    xt_q = q_ref[0].reshape(bqr * w, c)            # this block's queries
    q = jnp.dot(xt_q, wq_ref[:], preferred_element_type=jnp.float32)
    logits = jax.lax.dot_general(                  # q·kᵀ without transpose
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    o = jnp.dot(attn.astype(x.dtype), v.astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = jnp.dot(o.astype(x.dtype), wo_ref[:],
                preferred_element_type=jnp.float32)
    out = xt_q.astype(jnp.float32) + gamma_ref[0, 0] * y
    out_ref[0] = out.astype(out_ref.dtype).reshape(bqr, w, c)


def _spatial_attn_tiled_pallas(x: jax.Array, wq, wk, wv, wo, gamma,
                               interpret: bool = False,
                               force_bqr=None) -> jax.Array:
    """Query-row-tiled fused spatial attention for maps the un-tiled
    kernel cannot hold. x: (N, H, W, C) -> same shape (residual in)."""
    n, h, w, c = x.shape
    c8, c2 = wq.shape[-1], wv.shape[-1]
    bqr = force_bqr or plan_tiled(h, w, c, x.dtype.itemsize, c8, c2)
    if bqr is None:
        raise ValueError(
            f"tiled spatial attention does not fit VMEM at ({h},{w},{c}) "
            f"— gate with attention_spatial.fits_tiled")
    gamma2 = gamma.reshape(1, 1).astype(jnp.float32)
    frame_spec = pl.BlockSpec((1, h, w, c), lambda i, qb: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, bqr, w, c), lambda i, qb: (i, qb, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hw, kvn = h * w, (h // 2) * (w // 2)
    return pl.pallas_call(
        _attn_tiled_kernel,
        grid=(n, h // bqr),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[frame_spec, q_spec, w_spec, w_spec, w_spec, w_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=q_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (hw * c * c8
                           + (h // bqr) * kvn * c * (c8 + c2)
                           + hw * kvn * (c8 + c2) + hw * c2 * c),
            bytes_accessed=2 * n * hw * c * x.dtype.itemsize,
            transcendentals=n * hw * kvn,
        ),
        interpret=interpret,
    )(x, x, wq.astype(x.dtype), wk.astype(x.dtype), wv.astype(x.dtype),
      wo.astype(x.dtype), gamma2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def spatial_attn_tiled(x, wq, wk, wv, wo, gamma, interpret=False,
                       force_bqr=None):
    """Tiled Pallas forward + recompute backward (same oracle as the
    un-tiled kernel). x: (N, H, W, C); H, W even."""
    return _spatial_attn_tiled_pallas(x, wq, wk, wv, wo, gamma,
                                      interpret=interpret,
                                      force_bqr=force_bqr)


def _tiled_fwd(x, wq, wk, wv, wo, gamma, interpret, force_bqr):
    out = _spatial_attn_tiled_pallas(x, wq, wk, wv, wo, gamma,
                                     interpret=interpret,
                                     force_bqr=force_bqr)
    return out, (x, wq, wk, wv, wo, gamma)


def _tiled_bwd(interpret, force_bqr, res, g):
    _, vjp = jax.vjp(_spatial_attn_reference, *res)
    return vjp(g)


spatial_attn_tiled.defvjp(_tiled_fwd, _tiled_bwd)


def _spatial_attn_reference(x, wq, wk, wv, wo, gamma):
    """Plain-JAX oracle / backward math (matches ops/attention semantics)."""
    n, h, w, c = x.shape
    xt = x.reshape(n, h * w, c)
    pooled = x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))
    kv = pooled.reshape(n, -1, c)
    q = jnp.einsum("nlc,cd->nld", xt, wq.astype(x.dtype))
    k = jnp.einsum("nmc,cd->nmd", kv, wk.astype(x.dtype))
    v = jnp.einsum("nmc,cd->nmd", kv, wv.astype(x.dtype))
    logits = jnp.einsum("nld,nmd->nlm", q, k).astype(jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("nlm,nmd->nld", attn, v)
    y = jnp.einsum("nld,dc->nlc", o, wo.astype(x.dtype))
    out = xt + gamma.astype(x.dtype) * y
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def spatial_attn_fused(x, wq, wk, wv, wo, gamma, interpret=False):
    """Fused Pallas forward + recompute backward. x: (N, H, W, C); H, W
    even. Returns x + γ·attention(x) (residual included)."""
    return _spatial_attn_pallas(x, wq, wk, wv, wo, gamma,
                                interpret=interpret)


def _fwd(x, wq, wk, wv, wo, gamma, interpret):
    out = _spatial_attn_pallas(x, wq, wk, wv, wo, gamma, interpret=interpret)
    return out, (x, wq, wk, wv, wo, gamma)


def _bwd(interpret, res, g):
    _, vjp = jax.vjp(_spatial_attn_reference, *res)
    return vjp(g)


spatial_attn_fused.defvjp(_fwd, _bwd)
