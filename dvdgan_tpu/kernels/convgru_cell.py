"""Fused ConvGRU cell as a Pallas TPU kernel (SURVEY.md §2 native
obligation #1: "gate convs + sigmoid/tanh + blend in one Pallas kernel;
scanned over T").

One kernel invocation computes a full GRU timestep from the hoisted input
contributions (see ops/convgru.py for the hoisting):

    gh = Conv3×3(h, wg)          # 9 shifted MXU matmuls, f32 accumulate
    r, z = σ(gx + gh).split
    ch = Conv3×3(r ⊙ h, wc)
    h' = (1 − z) ⊙ h + z ⊙ tanh(cx + ch)

Everything — both 3×3 convs (as 9 shifted matmuls each), the gate
nonlinearities and the blend — happens in ONE kernel with h resident in
VMEM, eliminating the HBM round-trips between the ~10 XLA ops a scan step
otherwise lowers to. The carried state is at most (B, 32, 32, C) for the
64/128-px generators — comfortably inside the ~16 MB VMEM budget (the
pallas_call is only used when the block fits; ops/convgru.py falls back to
the XLA path otherwise).

Training integration: `gru_cell_fused` carries a custom VJP whose backward
recomputes the step with plain-JAX ops and differentiates that (flash-style
recompute — the forward saves only its inputs). Forward speed comes from
Pallas; gradient correctness comes from jax.vjp of the reference math.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget gate for one batch-block's working set. Kept WELL under the
# ~16MB/core VMEM: the grid pipeline double-buffers the in/out blocks on top
# of this, and Mosaic's scoped stack allocation holds several conv patches
# live at once (empirically: a 7MB estimate passed bf16 shapes but an f32
# run OOMed at 16.55M scoped — the estimate undercounts by ~2×, hence 4MB).
_VMEM_LIMIT_BYTES = 4 * 1024 * 1024


def _rowpack() -> bool:
    """Trace-time knob: pack each kernel ROW's 3 taps into one matmul with
    contraction depth 3C (vs 9 separate K=C matmuls). At C=64 the MXU is
    only half-fed by K=C; K=3C=192 lifts the depth fill to 75% for the
    price of materializing a (tokens, 3C) concat per row in VMEM.

    MEASURED default ON (v5e scan-bench via tools/ab_inprocess, 3 reps,
    2026-08-19): flagship 64px 25.66 vs 25.42 steps/s (+0.95%, rep ranges
    non-overlapping); 128px 7.326 vs 7.316 (neutral — only the 4/8/16px
    C>=256 levels run the Pallas kernel there, where K=C already fills
    the MXU). Neither preset's Pallas-fit set changes with the extra
    VMEM term."""
    v = os.environ.get("DVDGAN_GRU_ROWPACK", "on")
    if v not in ("on", "off"):
        raise ValueError(f"DVDGAN_GRU_ROWPACK must be on|off, got {v}")
    return v == "on"


def _conv3x3_from_padded(hp: jax.Array, w: jax.Array, b: int, h: int,
                         w_: int) -> jax.Array:
    """hp: (B, H+2, W+2, C) padded input; w: (3, 3, C, Cout) ->
    (B*H*W, Cout) f32 — a 3×3 SAME conv as shifted matmuls on the MXU
    (9 K=C taps, or 3 K=3C row-packed taps under DVDGAN_GRU_ROWPACK)."""
    c = hp.shape[-1]
    cout = w.shape[-1]
    acc = jnp.zeros((b * h * w_, cout), jnp.float32)
    if _rowpack():
        for dy in range(3):
            row = hp[:, dy:dy + h, :, :]
            # reshape each dx window to 2-D BEFORE the lane concat: the raw
            # 4-D windows carry distinct sublane offsets (dx=0/1/2) and
            # Mosaic's tpu.concatenate rejects offset mismatch off the
            # concat dim; the reshape re-materializes each at offset 0
            patch = jnp.concatenate(
                [row[:, :, dx:dx + w_, :].reshape(b * h * w_, c)
                 for dx in range(3)], axis=-1)
            acc += jnp.dot(patch, w[dy].reshape(3 * c, cout),
                           preferred_element_type=jnp.float32)
        return acc
    for dy in range(3):
        for dx in range(3):
            patch = hp[:, dy:dy + h, dx:dx + w_, :].reshape(b * h * w_, c)
            acc += jnp.dot(patch, w[dy, dx],
                           preferred_element_type=jnp.float32)
    return acc


def kernel_gru_step(h_block, gx_block, cx_block, wg, wc,
                    hp_ref, rhp_ref) -> jax.Array:
    """ONE GRU step on in-VMEM values — the shared kernel-body math for the
    per-step cell kernel AND the whole-sequence kernel (f32 gates, two
    3×3 convs as shifted matmuls using the caller's padded scratch refs).
    h_block/cx_block: (B, H, W, C); gx_block: (B, H, W, 2C) ->
    (B, H, W, C) in h_block's dtype. A change here changes BOTH kernels;
    their VJPs recompute with _cell_recompute_bwd/_seq_bwd_scan — keep the
    forward math in sync with those (oracle tests enforce it)."""
    b, h, w, c = h_block.shape

    # zero-padded hidden state in VMEM scratch (SAME-conv halo)
    hp_ref[:] = jnp.zeros_like(hp_ref)
    hp_ref[:, 1:h + 1, 1:w + 1, :] = h_block

    gh = _conv3x3_from_padded(hp_ref[:], wg, b, h, w)          # (BHW, 2C) f32
    gx = gx_block.reshape(b * h * w, 2 * c).astype(jnp.float32)
    rz = jax.nn.sigmoid(gx + gh)
    r, z = rz[:, :c], rz[:, c:]

    hflat = h_block.reshape(b * h * w, c).astype(jnp.float32)
    rh = (r * hflat).astype(h_block.dtype).reshape(b, h, w, c)
    rhp_ref[:] = jnp.zeros_like(rhp_ref)
    rhp_ref[:, 1:h + 1, 1:w + 1, :] = rh

    ch = _conv3x3_from_padded(rhp_ref[:], wc, b, h, w)         # (BHW, C) f32
    cx = cx_block.reshape(b * h * w, c).astype(jnp.float32)
    cand = jnp.tanh(cx + ch)

    out = (1.0 - z) * hflat + z * cand
    return out.astype(h_block.dtype).reshape(b, h, w, c)


def _gru_cell_kernel(gx_ref, cx_ref, h_ref, wg_ref, wc_ref, out_ref,
                     hp_ref, rhp_ref):
    out_ref[:] = kernel_gru_step(h_ref[:], gx_ref[:], cx_ref[:],
                                 wg_ref[:], wc_ref[:], hp_ref, rhp_ref)


def _batch_block(b: int, h: int, w: int, c: int, itemsize: int) -> int:
    """Largest batch-block size whose working set fits the VMEM budget.
    Biggest consumers per block: f32 gate intermediates (~3 × BHW×2C×4) and
    the two padded scratch planes."""
    for bb in range(b, 0, -1):
        if b % bb:
            continue
        gates = 3 * bb * h * w * 2 * c * 4
        pads = 2 * bb * (h + 2) * (w + 2) * c * itemsize
        io = bb * h * w * c * itemsize * 5
        # row-packed taps materialize a (tokens, 3C) concat per kernel row
        rowpack = 3 * bb * h * w * c * itemsize if _rowpack() else 0
        if gates + pads + io + rowpack < _VMEM_LIMIT_BYTES:
            return bb
    return 1


def _cell_pallas(gx: jax.Array, cx: jax.Array, h: jax.Array,
                 wg: jax.Array, wc: jax.Array,
                 interpret: bool = False) -> jax.Array:
    b, hh, ww, c = h.shape
    bb = _batch_block(b, hh, ww, c, h.dtype.itemsize)
    grid = (b // bb,)

    def im(i):
        return (i, 0, 0, 0)

    data_spec = lambda ch: pl.BlockSpec((bb, hh, ww, ch), im,  # noqa: E731
                                        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    pad_bytes = bb * (hh + 2) * (ww + 2) * c * h.dtype.itemsize
    return pl.pallas_call(
        _gru_cell_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(h.shape, h.dtype),
        in_specs=[data_spec(2 * c), data_spec(c), data_spec(c),
                  w_spec, w_spec],
        out_specs=data_spec(c),
        scratch_shapes=[
            pltpu.VMEM((bb, hh + 2, ww + 2, c), h.dtype),
            pltpu.VMEM((bb, hh + 2, ww + 2, c), h.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * hh * ww * c * 3 * c,
            bytes_accessed=(gx.size + cx.size + 2 * h.size) * h.dtype.itemsize
            + (wg.size + wc.size) * wg.dtype.itemsize
            + 2 * grid[0] * pad_bytes,
            transcendentals=3 * b * hh * ww * c,
        ),
        interpret=interpret,
    )(gx, cx, h, wg, wc)


def reference_cell(h, gx, cx, wg, wc, f32_gates: bool = True):
    """Plain-JAX GRU step from hoisted inputs — THE single reference cell
    shared by the oracles and the VJP recomputes of both the per-step and
    whole-sequence kernels (the math used to be hand-copied five times
    across this package; one copy prevents forward/backward drift).

    f32_gates=True matches the kernels' in-VMEM f32 gate math (the
    numerics oracle); f32_gates=False keeps gates in the activation dtype
    — the backward-recompute variant (under jax.vjp every f32 intermediate
    would materialize in HBM; measured ~5 ms/step of add+convert fusions).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    gh = jax.lax.conv_general_dilated(h, wg.astype(h.dtype), (1, 1), "SAME",
                                      dimension_numbers=dn)
    up = jnp.float32 if f32_gates else h.dtype
    rz = jax.nn.sigmoid((gx + gh).astype(up))
    r, z = jnp.split(rz, 2, axis=-1)
    rh = r.astype(h.dtype) * h
    ch = jax.lax.conv_general_dilated(rh, wc.astype(h.dtype), (1, 1), "SAME",
                                      dimension_numbers=dn)
    cand = jnp.tanh((cx + ch).astype(up))
    out = (1.0 - z) * h.astype(up) + z * cand
    return out.astype(h.dtype)


def _cell_reference(gx, cx, h, wg, wc):
    """Numerics oracle for the cell kernel tests (f32 gates)."""
    return reference_cell(h, gx, cx, wg, wc, f32_gates=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_cell_fused(gx, cx, h, wg, wc, interpret=False):
    """Fused Pallas forward + recompute backward. Shapes:
    gx (B,H,W,2C), cx (B,H,W,C), h (B,H,W,C), wg (3,3,C,2C), wc (3,3,C,C)."""
    return _cell_pallas(gx, cx, h, wg, wc, interpret=interpret)


def _fwd(gx, cx, h, wg, wc, interpret):
    return _cell_pallas(gx, cx, h, wg, wc, interpret=interpret), \
        (gx, cx, h, wg, wc)


def _cell_recompute_bwd(gx, cx, h, wg, wc):
    """Backward-only recompute: identical math to the oracle but gates stay
    in the ACTIVATION dtype (see reference_cell's f32_gates note). bf16
    gradients through range-bounded sigmoid/tanh are standard mixed-
    precision practice; the f32 master-weight update path is unchanged."""
    return reference_cell(h, gx, cx, wg, wc, f32_gates=False)


def _bwd(interpret, res, g):
    _, vjp = jax.vjp(_cell_recompute_bwd, *res)
    return vjp(g)


gru_cell_fused.defvjp(_fwd, _bwd)


def fits_vmem(b: int, h: int, w: int, c: int, itemsize: int = 2) -> bool:
    """True when the kernel can run (a batch-block of at least 1 sample
    fits the VMEM budget)."""
    gates = 3 * h * w * 2 * c * 4
    pads = 2 * (h + 2) * (w + 2) * c * itemsize
    io = h * w * c * itemsize * 5
    return gates + pads + io < _VMEM_LIMIT_BYTES
