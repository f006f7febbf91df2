"""Convolutional GRU — the generator's temporal core (SURVEY.md §2.3).

One ConvGRU runs per generator resolution level, unrolled over the T frames
with `jax.lax.scan` (the sequential dependency the reference expresses as a
Python for-loop over time, [R module/ConvGRU.py]). The carried state is the
(B, H, W, C) hidden map at that level's resolution.

Cell (the classic ConvGRU update the reference implements with convs over
concatenated [x, h]):

       rz = σ(Conv3×3_x(x) + Conv3×3_h(h))
       c  = tanh(Conv3×3_x'(x) + Conv3×3_h'(r ⊙ h))
       h' = (1 − z) ⊙ h + z ⊙ c

TPU-first decomposition: a conv over concat([x, h]) is BY LINEARITY the sum
of two convs, so the input halves (`gates_x`, `cand_x`) are HOISTED OUT of
the time scan and computed for all T frames in one big (B·T)-batch conv —
MXU-friendly and fully parallel — leaving only the hidden-dependent halves
(`gates_h`, `cand_h`) inside the sequential scan. This halves the
latency-bound sequential conv work vs the reference's concat formulation
while computing the same function family (the two kernel halves are exactly
the row-blocks of the reference's concat kernel; under spectral norm each
half gets its own σ — framework contract, documented deviation).

All four kernels are named 'w' → spectrally normalized by the tree pass
(G applies SN everywhere). Gate math runs in float32; activations keep the
input dtype.

Framework RNG/init contract (documented; reference detail uncertain per
SURVEY): the initial hidden state is zeros at every level; the level-0 input
sequence is the 4×4 latent seed broadcast over T, so z still reaches the
recurrence through the inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvdgan_tpu import kernels
from dvdgan_tpu.ops import layers

# Global default for the fused-Pallas scan body (auto mode only). Flipped by
# benchmarks for A/B runs; per-call `use_pallas` always wins.
PALLAS_ENABLED = True


def convgru_init(key, c: int, k: int = 3) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "gates_x": layers.conv2d_init(k1, k, c, 2 * c),
        "gates_h": layers.conv2d_init(k2, k, c, 2 * c, use_bias=False),
        "cand_x": layers.conv2d_init(k3, k, c, c),
        "cand_h": layers.conv2d_init(k4, k, c, c, use_bias=False),
    }


def convgru_cell(p: dict, x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step from raw x. x, h: (B, H, W, C) -> (B, H, W, C)."""
    gx = layers.conv2d(p["gates_x"], x)
    cx = layers.conv2d(p["cand_x"], x)
    return _cell_from_hoisted(p, gx, cx, h)


def _cell_from_hoisted(p: dict, gx: jax.Array, cx: jax.Array, h: jax.Array
                       ) -> jax.Array:
    """GRU step given precomputed input contributions gx=(…,2C), cx=(…,C)."""
    gh = layers.conv2d(p["gates_h"], h)
    rz = jax.nn.sigmoid((gx + gh).astype(jnp.float32))
    r, z = jnp.split(rz, 2, axis=-1)
    ch = layers.conv2d(p["cand_h"], (r.astype(h.dtype) * h))
    c = jnp.tanh((cx + ch).astype(jnp.float32))
    h32 = h.astype(jnp.float32)
    h_new = (1.0 - z) * h32 + z * c
    return h_new.astype(h.dtype)


def convgru(p: dict, x_seq: jax.Array, h0: jax.Array | None = None,
            unroll: int = 2, use_pallas: bool | None = None,
            time_major: bool = False, x_static: bool = False) -> jax.Array:
    """Unroll over time. x_seq: (B, T, H, W, C) — or (T, B, H, W, C) with
    `time_major=True` — -> hidden sequence, same layout.

    The input-to-gates convs run OUTSIDE the scan over the folded (B·T)
    batch (see module docstring); `lax.scan` then carries only the O(1)
    hidden state. `unroll` trades compiled-code size for less loop overhead
    (the per-step convs at low resolutions are tiny and latency-bound).

    Time-major callers (the generator) avoid the two HBM transpose copies
    per level that batch-major input needs (scan consumes/produces leading-
    axis time natively).

    `use_pallas` selects the WHOLE-SEQUENCE fused kernel
    (kernels/convgru_seq.py — one pallas_call for the entire unroll, the
    recurrence carried in VMEM scratch; there is no scan on this path):
    None (default) auto-enables it on TPU backends when the sequence
    kernel's own working set fits VMEM; the plain-XLA scan is used
    otherwise (and on CPU, where the kernel would run interpreted). The
    per-step cell kernel (kernels/convgru_cell.py) shares its in-kernel
    math with the sequence kernel and remains as the tested single-step
    building block.

    `x_static=True` asserts all T input frames are IDENTICAL (the
    generator's level-0 input is the latent seed broadcast over time): the
    input conv then runs once on one frame and broadcasts — exactly the
    same values at 1/T of the conv FLOPs.
    """
    if time_major:
        t, b, h, w, c = x_seq.shape
    else:
        b, t, h, w, c = x_seq.shape
    if h0 is None:
        h0 = jnp.zeros((b, h, w, c), x_seq.dtype)

    # ONE fused input conv C -> 3C instead of two (2C and C): identical
    # math by output-channel concatenation (each output channel's dot
    # product is unchanged), but reads the input once and fills the MXU's
    # 128-wide output lanes better at the narrow tail levels (3C=96 vs
    # 64/32 at ch=32).
    wcat = jnp.concatenate([p["gates_x"]["w"], p["cand_x"]["w"]], axis=-1)
    bcat = jnp.concatenate([p["gates_x"]["b"], p["cand_x"]["b"]])
    if x_static:
        x0 = x_seq[0] if time_major else x_seq[:, 0]
        gcx0 = layers.conv2d({"w": wcat, "b": bcat}, x0)   # (B, H, W, 3C)
        gx = jnp.broadcast_to(gcx0[None, ..., :2 * c],
                              (t, b, h, w, 2 * c))
        cx = jnp.broadcast_to(gcx0[None, ..., 2 * c:], (t, b, h, w, c))
    else:
        xf = x_seq.reshape(b * t, h, w, c)   # fold order matches layout
        gcx = layers.conv2d({"w": wcat, "b": bcat}, xf)
        gx, cx = gcx[..., :2 * c], gcx[..., 2 * c:]
        if time_major:
            gx = gx.reshape(t, b, h, w, 2 * c)
            cx = cx.reshape(t, b, h, w, c)
        else:
            gx = jnp.moveaxis(gx.reshape(b, t, h, w, 2 * c), 1, 0)
            cx = jnp.moveaxis(cx.reshape(b, t, h, w, c), 1, 0)

    blocked = False
    if use_pallas is None:
        # bf16-only: the f32 variant both blows Mosaic's scoped-VMEM stack
        # at generator shapes (measured: 16.55M scoped at a 4MB estimate)
        # and differs from the XLA conv by MXU default-precision
        # reassociation; bf16 is the production training dtype and the
        # only one where the fusion wins.
        pallas_ok = (PALLAS_ENABLED
                     and jax.default_backend() not in ("cpu",)
                     and x_seq.dtype == jnp.bfloat16)
        # the SEQUENCE kernel's own estimate (carry scratch + pipelined
        # time windows), not the smaller cell one
        use_pallas = pallas_ok and kernels.convgru_seq.fits_vmem(
            b, h, w, c, x_seq.dtype.itemsize)
        # levels too big for the whole-plane kernel (64×64×64 at 128px and
        # everything larger at 256px) can use the SPATIALLY-BLOCKED kernel
        # (H-tiled grid, recurrence + halos in persistent VMEM planes).
        # MEASURED (v5e ab_inprocess r4): neutral at 128px/T=12 (7.298 vs
        # 7.325 steps/s) but a small win at 256px/T=48 (2.43 vs 2.40) —
        # the same long-clip boundary as the Pallas BPTT kernel, so the
        # default gates on T like PALLAS_BWD does. "on" forces it at any
        # T (A/B); "off" never.
        mode = layers.env_choice("DVDGAN_GRU_BLOCKED", "auto",
                                 ("auto", "on", "off"))
        blocked = (not use_pallas and pallas_ok and mode != "off"
                   and (mode == "on"
                        or t >= kernels.convgru_seq._PALLAS_BWD_MIN_T)
                   and kernels.convgru_blocked.fits(
                       b, h, w, c, x_seq.dtype.itemsize))

    if use_pallas or blocked:
        # ONE kernel for the whole unroll: grid over (batch-blocks, T) with
        # the recurrence carried in VMEM scratch — no scan, no per-step
        # kernel launches (kernels/convgru_seq.py); or the H-blocked
        # variant when the whole plane doesn't fit (convgru_blocked.py)
        wg = p["gates_h"]["w"].astype(x_seq.dtype)
        wc = p["cand_h"]["w"].astype(x_seq.dtype)
        if blocked:
            hs = kernels.gru_sequence_blocked(gx, cx, h0, wg, wc)
        else:
            hs = kernels.gru_sequence_fused(gx, cx, h0, wg, wc)
        return hs if time_major else jnp.moveaxis(hs, 0, 1)

    # Scan fallback with the kernel path's VJP policy (save only hs,
    # recompute gates in the backward — kernels.convgru_seq): plain
    # autodiff through the scan stacked the f32 gate intermediates as
    # residuals, ~6 ms/step + ~12 B/elem/step HBM at the 128px config's
    # 64×64×64 level (the shape the Pallas forward's VMEM gate rejects).
    # Forward math is bitwise _cell_from_hoisted's.
    hs = kernels.convgru_seq.gru_sequence_scan(
        gx, cx, h0, p["gates_h"]["w"], p["cand_h"]["w"], min(unroll, t))
    return hs if time_major else jnp.moveaxis(hs, 0, 1)
