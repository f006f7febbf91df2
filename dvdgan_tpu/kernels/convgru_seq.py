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

from dvdgan_tpu.kernels.convgru_cell import (_batch_block,
                                             _conv3x3_from_padded)


def _gru_seq_kernel(h0_ref, gx_ref, cx_ref, wg_ref, wc_ref, out_ref,
                    hcar_ref, hp_ref, rhp_ref):
    t = pl.program_id(1)
    bb, h, w, c = h0_ref.shape

    @pl.when(t == 0)
    def _():
        hcar_ref[:] = h0_ref[:]

    # one GRU step from the carried state (same math as the cell kernel)
    hp_ref[:] = jnp.zeros_like(hp_ref)
    hp_ref[:, 1:h + 1, 1:w + 1, :] = hcar_ref[:]
    gh = _conv3x3_from_padded(hp_ref[:], wg_ref[:], bb, h, w)
    gx = gx_ref[0].reshape(bb * h * w, 2 * c).astype(jnp.float32)
    rz = jax.nn.sigmoid(gx + gh)
    r, z = rz[:, :c], rz[:, c:]

    hflat = hcar_ref[:].reshape(bb * h * w, c).astype(jnp.float32)
    rh = (r * hflat).astype(hcar_ref.dtype).reshape(bb, h, w, c)
    rhp_ref[:] = jnp.zeros_like(rhp_ref)
    rhp_ref[:, 1:h + 1, 1:w + 1, :] = rh
    ch = _conv3x3_from_padded(rhp_ref[:], wc_ref[:], bb, h, w)
    cx = cx_ref[0].reshape(bb * h * w, c).astype(jnp.float32)
    cand = jnp.tanh(cx + ch)

    out = (1.0 - z) * hflat + z * cand
    h_new = out.astype(hcar_ref.dtype).reshape(bb, h, w, c)
    hcar_ref[:] = h_new
    out_ref[0] = h_new


def _seq_pallas(gx: jax.Array, cx: jax.Array, h0: jax.Array,
                wg: jax.Array, wc: jax.Array,
                interpret: bool = False) -> jax.Array:
    t, b, hh, ww, c2 = gx.shape
    c = c2 // 2
    bb = _batch_block(b, hh, ww, c, h0.dtype.itemsize)
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
            bytes_accessed=(gx.size + cx.size) * gx.dtype.itemsize
            + 2 * t * b * hh * ww * c * h0.dtype.itemsize,
            transcendentals=3 * t * b * hh * ww * c,
        ),
        interpret=interpret,
    )(h0, gx, cx, wg, wc)


def _seq_reference(gx, cx, h0, wg, wc):
    """Plain-JAX oracle: scan of the activation-dtype cell math."""
    dn = ("NHWC", "HWIO", "NHWC")

    def cell(h, inputs):
        gx_t, cx_t = inputs
        gh = jax.lax.conv_general_dilated(h, wg.astype(h.dtype), (1, 1),
                                          "SAME", dimension_numbers=dn)
        rz = jax.nn.sigmoid((gx_t + gh).astype(jnp.float32))
        r, z = jnp.split(rz, 2, axis=-1)
        rh = r.astype(h.dtype) * h
        ch = jax.lax.conv_general_dilated(rh, wc.astype(h.dtype), (1, 1),
                                          "SAME", dimension_numbers=dn)
        cand = jnp.tanh((cx_t + ch).astype(jnp.float32))
        out = (1.0 - z) * h.astype(jnp.float32) + z * cand
        h_new = out.astype(h.dtype)
        return h_new, h_new

    _, hs = jax.lax.scan(cell, h0, (gx, cx))
    return hs


def _seq_bwd_scan(gx, cx, h0, wg, wc, hs, g):
    """Reverse-time BPTT using the SAVED hidden sequence (no forward
    re-run): per step recompute only the gates from h_{t-1}, in the
    activation dtype; weight grads accumulate f32."""
    dn = ("NHWC", "HWIO", "NHWC")
    t = gx.shape[0]
    h_prev_seq = jnp.concatenate([h0[None], hs[:-1]], axis=0)

    def step_bwd(carry, inputs):
        dh_next, dwg, dwc = carry
        gx_t, cx_t, h_prev, g_t = inputs
        dtype = h_prev.dtype

        def cell_t(h, gx_t, cx_t, wg, wc):
            gh = jax.lax.conv_general_dilated(
                h, wg.astype(dtype), (1, 1), "SAME", dimension_numbers=dn)
            rz = jax.nn.sigmoid(gx_t + gh)
            r, z = jnp.split(rz, 2, axis=-1)
            rh = r * h
            ch = jax.lax.conv_general_dilated(
                rh, wc.astype(dtype), (1, 1), "SAME", dimension_numbers=dn)
            cand = jnp.tanh(cx_t + ch)
            one = jnp.ones((), dtype)
            return ((one - z) * h + z * cand).astype(dtype)

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
