"""Reverse-time BPTT for the fused ConvGRU sequence as a Pallas TPU kernel.

Completes the native-kernel story for the generator's temporal core: forward
is kernels/convgru_seq.py (one launch, VMEM-resident carry); this module is
the matching backward. The sequential part of BPTT — the dh carry flowing
t+1 → t through two transposed convs and the gate derivatives — runs in ONE
Pallas kernel (grid = (batch-blocks, T) iterating time REVERSED, carry in
VMEM scratch). The kernel emits the per-step pre-activation cotangents
    da_rz (= dL/dgx)  and  da_c (= dL/dcx)
plus the recomputed rh = r⊙h sequence; the WEIGHT gradients are then two
standard conv weight-grad contractions over the whole folded (T·B) batch —
exactly the MXU-shaped op XLA already emits optimally — via jax.vjp of the
conv outside the kernel:

    dWg = conv-weight-grad(h_prev_seq, da_rz)
    dWc = conv-weight-grad(rh_seq,    da_c)

Transposed convs inside the kernel are expressed as 9 shifted matmuls with
the spatially-flipped, channel-transposed kernels (computed once outside).

Gate math mirrors the forward kernel: f32 in VMEM, bf16 on the wire.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvdgan_tpu.kernels.convgru_cell import _conv3x3_from_padded, _rowpack

# The backward's per-block working set is ~3× the forward cell's (five
# padded scratch planes incl. a 2C-wide one, plus ~15 live f32 (n,C)/(n,2C)
# intermediates vs the forward's 3 gate buffers), so it gets its OWN
# estimate + budget instead of borrowing the forward's _batch_block
# (ADVICE r1 medium). Budget calibrated on-chip AGAINST THE CURRENT
# ESTIMATOR: the measured-good T=48 32×32 c=64 bf16 config (PERF.md
# round-2 isolated win, 21% over scan) estimates 8.33 MB since the honest
# 2C-wide rowpack term landed (ADVICE r3), so the round-2 8 MB calibration
# moves to 9 MB to keep the measured boundary — a budget is only
# meaningful relative to the formula it gates. The one preset shape this
# newly admits, (1,16,16,256) at 256px/48f (8.42 MB), compiles and matches
# the scan backward on chip (verified 2026-08-20).
_BWD_VMEM_LIMIT_BYTES = 9 * 1024 * 1024


def _bwd_budget() -> int:
    """Calibrated budget, overridable per trace via DVDGAN_GRU_BWD_MB
    (float MB) so tools/ab_inprocess.py can A/B the admission boundary on
    chip without a code edit (lazy read; fresh-closure caveat as
    layers._tphase_interleave)."""
    v = os.environ.get("DVDGAN_GRU_BWD_MB")
    if v is None:
        return _BWD_VMEM_LIMIT_BYTES
    try:
        return int(float(v) * 1024 * 1024)
    except ValueError:
        raise ValueError(f"DVDGAN_GRU_BWD_MB={v!r}: must be a float (MB)")


def _bwd_batch_block(b: int, h: int, w: int, c: int, itemsize: int) -> int:
    """Largest divisor of b whose BACKWARD working set fits the budget;
    0 if even a single sample does not fit (caller must fall back)."""
    budget = _bwd_budget()
    for bb in range(b, 0, -1):
        if b % bb:
            continue
        n = bb * h * w
        # f32 intermediates: ~4 (n,2C) + ~14 (n,C) live planes
        f32 = 4 * n * (4 * 2 * c + 14 * c)
        pads = 5 * bb * (h + 2) * (w + 2) * c * itemsize  # hp,rhp,padc + 2C pad2c
        carry = n * c * itemsize
        io = 10 * n * c * itemsize  # 5 in + 5 out block C-equivalents
        # row-packed taps materialize a (tokens, 3·Cin) concat per kernel
        # row (shared _conv3x3_from_padded); the WIDEST rowpacked input on
        # this path is the transposed conv over the 2C-wide pad2c scratch —
        # model (n, 3·2C), not the forward's (n, 3C) (ADVICE r3)
        rowpack = 3 * n * 2 * c * itemsize if _rowpack() else 0
        if f32 + pads + carry + io + rowpack < budget:
            return bb
    return 0


def fits_vmem(b: int, h: int, w: int, c: int, itemsize: int = 2) -> bool:
    """True when the backward kernel can run at this shape (some batch-block
    fits); the convgru_seq auto-selection gates on this."""
    return _bwd_batch_block(b, h, w, c, itemsize) > 0


def _flip_t(w: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) -> the kernel computing the transposed conv:
    spatially flipped, in/out channels swapped."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


def _pad_into(ref, x, h, w):
    ref[:] = jnp.zeros_like(ref)
    ref[:, 1:h + 1, 1:w + 1, :] = x


def _gru_bwd_kernel(hprev_ref, gx_ref, cx_ref, g_ref,
                    wg_ref, wc_ref, wgt_ref, wct_ref,
                    darz_ref, dac_ref, rh_ref, dh0_ref,
                    dh_car, hp, rhp, pad2c, padc):
    j = pl.program_id(1)
    # sequence blocks arrive as (1, bb, H, W, C)
    _, bb, h, w, c = g_ref.shape
    n = bb * h * w
    h_prev = hprev_ref[0]

    # ---- forward recompute (same math as the forward kernel) --------------
    _pad_into(hp, h_prev, h, w)
    gh = _conv3x3_from_padded(hp[:], wg_ref[:], bb, h, w)        # (n,2C) f32
    gx = gx_ref[0].reshape(n, 2 * c).astype(jnp.float32)
    rz = jax.nn.sigmoid(gx + gh)
    r, z = rz[:, :c], rz[:, c:]
    hflat = h_prev.reshape(n, c).astype(jnp.float32)
    rh32 = r * hflat
    rh = rh32.astype(h_prev.dtype).reshape(bb, h, w, c)
    _pad_into(rhp, rh, h, w)
    ch = _conv3x3_from_padded(rhp[:], wc_ref[:], bb, h, w)       # (n,C) f32
    cx = cx_ref[0].reshape(n, c).astype(jnp.float32)
    cand = jnp.tanh(cx + ch)

    # ---- backward ----------------------------------------------------------
    gt = g_ref[0].reshape(n, c).astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        dh_car[:] = jnp.zeros_like(dh_car)

    gt = gt + dh_car[:].reshape(n, c).astype(jnp.float32)

    dcand = gt * z
    dz = gt * (cand - hflat)
    dh = gt * (1.0 - z)

    da_c = dcand * (1.0 - cand * cand)                           # (n,C)
    da_c_b = da_c.astype(h_prev.dtype).reshape(bb, h, w, c)
    _pad_into(padc, da_c_b, h, w)
    drh = _conv3x3_from_padded(padc[:], wct_ref[:], bb, h, w)    # (n,C) f32

    dr = drh * hflat
    dh = dh + drh * r

    da_r = dr * r * (1.0 - r)
    da_z = dz * z * (1.0 - z)
    da = jnp.concatenate([da_r, da_z], axis=-1)                  # (n,2C)
    da_b = da.astype(h_prev.dtype).reshape(bb, h, w, 2 * c)
    _pad_into(pad2c, da_b, h, w)
    dh = dh + _conv3x3_from_padded(pad2c[:], wgt_ref[:], bb, h, w)

    dh_b = dh.astype(h_prev.dtype).reshape(bb, h, w, c)
    dh_car[:] = dh_b

    darz_ref[0] = da_b
    dac_ref[0] = da_c_b
    rh_ref[0] = rh
    dh0_ref[:] = dh_b   # overwritten every step; the final (t=0) write wins


def gru_sequence_bwd(gx, cx, h0, wg, wc, hs, g, interpret: bool = False):
    """-> (dgx, dcx, dh0, dwg, dwc). Shapes as in gru_sequence_fused; `g` is
    the upstream cotangent of hs."""
    t, b, hh, ww, c2 = gx.shape
    c = c2 // 2
    dtype = h0.dtype
    bb = _bwd_batch_block(b, hh, ww, c, dtype.itemsize)
    if bb == 0:
        raise ValueError(
            f"convgru backward working set does not fit VMEM at "
            f"({b},{hh},{ww},{c}) — caller should use the scan backward")
    grid = (b // bb, t)

    h_prev_seq = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    wgb = wg.astype(dtype)
    wcb = wc.astype(dtype)
    wgt = _flip_t(wgb)
    wct = _flip_t(wcb)

    def rev_spec(ch):
        # time REVERSED: grid step j touches t = T-1-j
        return pl.BlockSpec((1, bb, hh, ww, ch),
                            lambda i, j: (t - 1 - j, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    dh0_spec = pl.BlockSpec((bb, hh, ww, c), lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    darz, dac, rh_seq, dh0 = pl.pallas_call(
        _gru_bwd_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((t, b, hh, ww, 2 * c), dtype),
            jax.ShapeDtypeStruct((t, b, hh, ww, c), dtype),
            jax.ShapeDtypeStruct((t, b, hh, ww, c), dtype),
            jax.ShapeDtypeStruct((b, hh, ww, c), dtype),
        ),
        in_specs=[rev_spec(c), rev_spec(2 * c), rev_spec(c), rev_spec(c),
                  w_spec, w_spec, w_spec, w_spec],
        out_specs=(rev_spec(2 * c), rev_spec(c), rev_spec(c), dh0_spec),
        scratch_shapes=[
            pltpu.VMEM((bb, hh, ww, c), dtype),          # dh carry
            pltpu.VMEM((bb, hh + 2, ww + 2, c), dtype),  # pad(h_prev)
            pltpu.VMEM((bb, hh + 2, ww + 2, c), dtype),  # pad(rh)
            pltpu.VMEM((bb, hh + 2, ww + 2, 2 * c), dtype),  # pad(da_rz)
            pltpu.VMEM((bb, hh + 2, ww + 2, c), dtype),      # pad(da_c)
        ],
        interpret=interpret,
    )(h_prev_seq, gx, cx, g, wgb, wcb, wgt, wct)

    # weight grads: one folded (T·B)-batch conv weight-grad each — the
    # MXU-shaped contraction XLA emits natively
    dn = ("NHWC", "HWIO", "NHWC")
    hp_flat = h_prev_seq.reshape(t * b, hh, ww, c)
    rh_flat = rh_seq.reshape(t * b, hh, ww, c)

    def conv_w(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    _, vjp_g = jax.vjp(lambda w: conv_w(hp_flat, w), wgb)
    dwg = vjp_g(darz.reshape(t * b, hh, ww, 2 * c))[0]
    _, vjp_c = jax.vjp(lambda w: conv_w(rh_flat, w), wcb)
    dwc = vjp_c(dac.reshape(t * b, hh, ww, c))[0]

    return (darz, dac, dh0, dwg.astype(wg.dtype), dwc.astype(wc.dtype))
