"""Whole-sequence fused ConvGRU as a single Pallas TPU kernel.

The cell kernel (convgru_cell.py) still launches once per `lax.scan` step —
T kernel launches plus XLA while-loop overhead per level. This kernel runs
the ENTIRE unroll in ONE pallas_call: the grid is (batch-blocks, T); TPU
grids execute sequentially, so VMEM scratch persists across grid steps and
carries the hidden state from t to t+1 — the recurrence never touches HBM.
Per grid step the pipeline streams gx_t/cx_t blocks in and h_t blocks out
(double-buffered by the Pallas grid machinery), overlapping the next
timestep's input DMA with the current step's MXU work.

Layouts are TIME-MAJOR to match the generator's internal layout:
gx (T, B, H, W, 2C), cx (T, B, H, W, C), h0 (B, H, W, C) -> hs (T, B, H, W, C).

Custom VJP: the forward saves its inputs AND the hidden sequence `hs` it
produced; the backward is a plain-JAX reverse-time `lax.scan` that uses
hs[t-1] directly (no forward re-run), recomputes only the gates per step in
the activation dtype, and accumulates the weight gradients in f32 across
time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvdgan_tpu.kernels import convgru_cell as _cell
from dvdgan_tpu.kernels.convgru_cell import kernel_gru_step, reference_cell


def _gru_seq_kernel(h0_ref, gx_ref, cx_ref, wg_ref, wc_ref, out_ref,
                    hcar_ref, hp_ref, rhp_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hcar_ref[:] = h0_ref[:]

    # one GRU step from the carried state (the SHARED kernel-body math —
    # convgru_cell.kernel_gru_step — so the per-step and whole-sequence
    # kernels cannot drift)
    h_new = kernel_gru_step(hcar_ref[:], gx_ref[0], cx_ref[0],
                            wg_ref[:], wc_ref[:], hp_ref, rhp_ref)
    hcar_ref[:] = h_new
    out_ref[0] = h_new


def _seq_batch_block(b: int, h: int, w: int, c: int, itemsize: int) -> int:
    """Largest divisor of b whose SEQUENCE-kernel working set fits the VMEM
    budget; 0 when even one sample does not fit (callers must fall back —
    the forward previously borrowed the cell kernel's estimate, whose
    working set is strictly smaller: no carry scratch and no pipelined
    time-window double-buffering; review finding, mirrors the backward's
    ADVICE-r1 fix)."""
    for bb in range(b, 0, -1):
        if b % bb:
            continue
        gates = 3 * bb * h * w * 2 * c * 4          # f32 gate intermediates
        pads = 2 * bb * (h + 2) * (w + 2) * c * itemsize
        carry = bb * h * w * c * itemsize
        # gx(2C)+cx(C) in, h(C) out, double-buffered by the grid pipeline,
        # + the h0 block
        io = (2 * 4 + 1) * bb * h * w * c * itemsize
        # row-packed taps materialize a (tokens, 3C) concat per kernel row
        rowpack = 3 * bb * h * w * c * itemsize if _cell._rowpack() else 0
        if gates + pads + carry + io + rowpack < _cell._VMEM_LIMIT_BYTES:
            return bb
    return 0


def fits_vmem(b: int, h: int, w: int, c: int, itemsize: int = 2) -> bool:
    """True when the whole-sequence forward kernel can run at this shape;
    ops/convgru.py's auto-gate uses this."""
    return _seq_batch_block(b, h, w, c, itemsize) > 0


def _seq_pallas(gx: jax.Array, cx: jax.Array, h0: jax.Array,
                wg: jax.Array, wc: jax.Array,
                interpret: bool = False) -> jax.Array:
    t, b, hh, ww, c2 = gx.shape
    c = c2 // 2
    bb = _seq_batch_block(b, hh, ww, c, h0.dtype.itemsize)
    if bb == 0:
        raise ValueError(
            f"convgru sequence-kernel working set does not fit VMEM at "
            f"({b},{hh},{ww},{c}) — gate with convgru_seq.fits_vmem and "
            f"use the scan path")
    grid = (b // bb, t)   # batch-blocks outer, time inner: the carry
    #                       resets at t==0 of each batch block

    h0_spec = pl.BlockSpec((bb, hh, ww, c), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    def seq_spec(ch):
        return pl.BlockSpec((1, bb, hh, ww, ch),
                            lambda i, j: (j, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gru_seq_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((t, b, hh, ww, c), h0.dtype),
        in_specs=[h0_spec, seq_spec(2 * c), seq_spec(c), w_spec, w_spec],
        out_specs=seq_spec(c),
        scratch_shapes=[
            pltpu.VMEM((bb, hh, ww, c), h0.dtype),            # carry
            pltpu.VMEM((bb, hh + 2, ww + 2, c), h0.dtype),    # pad(h)
            pltpu.VMEM((bb, hh + 2, ww + 2, c), h0.dtype),    # pad(r*h)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * t * b * hh * ww * c * 3 * c,
            bytes_accessed=(gx.size + cx.size + h0.size) * gx.dtype.itemsize
            + (wg.size + wc.size) * wg.dtype.itemsize
            + 2 * t * b * hh * ww * c * h0.dtype.itemsize,
            transcendentals=3 * t * b * hh * ww * c,
        ),
        interpret=interpret,
    )(h0, gx, cx, wg, wc)


def _seq_reference(gx, cx, h0, wg, wc):
    """Plain-JAX oracle: scan of the shared reference cell (f32 gates,
    matching the kernel's in-VMEM gate math)."""

    def cell(h, inputs):
        gx_t, cx_t = inputs
        h_new = reference_cell(h, gx_t, cx_t, wg, wc, f32_gates=True)
        return h_new, h_new

    _, hs = jax.lax.scan(cell, h0, (gx, cx))
    return hs


def _seq_bwd_scan(gx, cx, h0, wg, wc, hs, g):
    """Reverse-time BPTT using the SAVED hidden sequence (no forward
    re-run): per step recompute only the gates from h_{t-1}, in the
    activation dtype (reference_cell f32_gates=False — the same shared
    recompute the cell kernel's VJP uses); weight grads accumulate f32."""
    h_prev_seq = jnp.concatenate([h0[None], hs[:-1]], axis=0)

    def step_bwd(carry, inputs):
        dh_next, dwg, dwc = carry
        gx_t, cx_t, h_prev, g_t = inputs

        def cell_t(h, gx_t, cx_t, wg, wc):
            return reference_cell(h, gx_t, cx_t, wg, wc, f32_gates=False)

        _, vjp = jax.vjp(cell_t, h_prev, gx_t, cx_t, wg, wc)
        dh, dgx_t, dcx_t, dwg_t, dwc_t = vjp(g_t + dh_next)
        return ((dh, dwg + dwg_t.astype(jnp.float32),
                 dwc + dwc_t.astype(jnp.float32)),
                (dgx_t, dcx_t))

    zeros = (jnp.zeros_like(h0),
             jnp.zeros(wg.shape, jnp.float32),
             jnp.zeros(wc.shape, jnp.float32))
    (dh0, dwg, dwc), (dgx, dcx) = jax.lax.scan(
        step_bwd, zeros, (gx, cx, h_prev_seq, g), reverse=True)
    return dgx, dcx, dh0, dwg.astype(wg.dtype), dwc.astype(wc.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_sequence_fused(gx, cx, h0, wg, wc, interpret=False):
    """Whole-sequence fused Pallas forward + saved-hs backward.
    gx (T,B,H,W,2C), cx (T,B,H,W,C), h0 (B,H,W,C) -> hs (T,B,H,W,C)."""
    return _seq_pallas(gx, cx, h0, wg, wc, interpret=interpret)


def _fwd(gx, cx, h0, wg, wc, interpret):
    hs = _seq_pallas(gx, cx, h0, wg, wc, interpret=interpret)
    return hs, (gx, cx, h0, wg, wc, hs)


# Selection of the native reverse-time Pallas backward (convgru_bwd.py).
# MEASURED (v5e, 2026-08-16):
#   * T=16 flagship (full-step scan-bench, 2 runs each): Pallas bwd
#     21.9-22.0 steps/s vs plain-JAX reverse scan 22.2-22.4 — the kernel's
#     rh/da HBM round-trips for the weight-grad convs offset the fused
#     carry at short T;
#   * T=48 (in-jit op A/B, 32×32 c=64): Pallas bwd 3.64 ms vs scan 4.62 ms
#     fwd+bwd — 21% faster once the reverse scan's per-step overhead
#     dominates.
# Hence: kernel for long clips, scan otherwise. None = auto by this rule;
# True/False force.
PALLAS_BWD: bool | None = None
_PALLAS_BWD_MIN_T = 32


def _bwd(interpret, res, g):
    t, b, hh, ww, c2 = res[0].shape
    use_kernel = (PALLAS_BWD if PALLAS_BWD is not None
                  else t >= _PALLAS_BWD_MIN_T)
    if (use_kernel and not interpret
            and jax.default_backend() not in ("cpu",)):
        from dvdgan_tpu.kernels import convgru_bwd
        # the backward's working set is ~3× the forward's; only take the
        # kernel when ITS estimate fits, else the scan path (ADVICE r1)
        if convgru_bwd.fits_vmem(b, hh, ww, c2 // 2,
                                 res[2].dtype.itemsize):
            return convgru_bwd.gru_sequence_bwd(*res, g)
    return _seq_bwd_scan(*res, g)


gru_sequence_fused.defvjp(_fwd, _bwd)


# --------------------------------------------------- scan-path custom VJP ----

def _seq_scan_impl(gx, cx, h0, wg, wc, unroll):
    """Plain-JAX whole-sequence forward — bitwise the math ops/convgru.py's
    scan fallback ran via _cell_from_hoisted (f32 gate math, no h-conv
    biases)."""

    def cell(h, inputs):
        gx_t, cx_t = inputs
        h_new = reference_cell(h, gx_t, cx_t, wg, wc, f32_gates=True)
        return h_new, h_new

    _, hs = jax.lax.scan(cell, h0, (gx, cx), unroll=unroll)
    return hs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_sequence_scan(gx, cx, h0, wg, wc, unroll=1):
    """Whole-sequence plain-JAX scan forward + saved-hs backward.

    The fallback for shapes the Pallas forward's VMEM estimate rejects
    (e.g. the 64×64×64 generator level at 128px+). Same signature and the
    SAME backward policy as gru_sequence_fused: save only the bf16 hidden
    sequence (which is the output anyway — zero extra residual memory) and
    recompute gates per step in the activation dtype. Plain autodiff
    through the scan instead saved the f32 sigmoid/tanh gate intermediates
    (3C·T per level): at the 128px config those stacked f32 buffers plus
    their backward dynamic-slice reads were ~6 ms/step of the trace's
    loop-fusion bucket and ~12 bytes/elem/step of HBM."""
    return _seq_scan_impl(gx, cx, h0, wg, wc, unroll)


def _scan_fwd(gx, cx, h0, wg, wc, unroll):
    hs = _seq_scan_impl(gx, cx, h0, wg, wc, unroll)
    return hs, (gx, cx, h0, wg, wc, hs)


def _scan_bwd(unroll, res, g):
    return _bwd(False, res, g)


gru_sequence_scan.defvjp(_scan_fwd, _scan_bwd)
