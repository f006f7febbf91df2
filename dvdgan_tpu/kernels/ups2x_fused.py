"""Fused phase-decomposed upsample conv — the 256px resblock-epilogue
kernel (VERDICT r4 next-round item #2 / SURVEY §2 native obligation #3).

ops/layers.upsample2x_conv3x3 computes nearest-up-2× → SAME-3×3 exactly as
one VALID 2×2-kernel conv with 4 phase outputs + an interleave. At
256px/48f the interleave glue is the profile's largest identified cluster
(~15 ms of [·,128,2,128,2,·] pad/copy chains, forward AND backward slice
grads — PERF.md session 13), and round 4 certified that XLA lowering
steering cannot remove it: the remaining move is a fused kernel.

This kernel computes the phase conv AND the interleave in one pass:

  forward   grid (N, H-blocks): the padded frame xp (H+2, W+2, Cin) rides
            VMEM whole (constant index over H-blocks → fetched once per
            frame); per block, an unrolled per-row sweep accumulates the
            4 tap matmuls row_tap (W+1, Cin) × wall_tap (Cin, 4·Cout)
            into per-phase scratches — every phase at every position,
            N=4·Cout full MXU lanes per tap matmul — and each output row
            pair writes as the lane-concat of its two phases into the
            4-D block (1, 2·bh, W, 2·Cout). The caller's reshape of
            (N, 2H, W, 2·Cout) → (N, 2H, 2W, Cout) is a free
            contiguous view: the 4·Cout conv tensor, the phase slices
            and the stack/reshape interleave copies never exist in HBM.

  backward  grid (N, H-blocks): dout arrives as the FREE view
            (N, 2H, W, 2·Cout); the phases land in 4 zero-padded
            per-phase scratches at their (row, col) offsets, and a
            per-row sweep lane-concats them to dyall_r (W+1, 4·Cout),
            then per TAP contracts dyall_r · wall_tap → that tap's dx row
            (K = 4·Cout) which scatter-ADDs into a persistent f32 dxp
            frame accumulator (the f32 OUTPUT ref itself — overlap rows
            between adjacent blocks compose by linearity), and
            xp_rowᵀ · dyall_r accumulates that tap's dwall rows
            (K = W+1). The backward's slice-grad pad fusions and their
            layout copies never exist in HBM.

  Mosaic constraints that shaped this (probed on v5e, 2026-08-20):
  value-level concats/reshapes of vector slices carrying sublane/lane
  offsets are rejected ("result/input offset mismatch", and collapsing
  reshapes need a 128-multiple minor dim) — hence per-row 2-D slices,
  dot_general instead of transposes, and scratch/ref writes (which
  normalize layouts) at every assembly point.

Same math as the lax path up to f32 accumulation order (oracle + gradient
equivalence tested in tests/test_kernels.py). Weight algebra (3×3 → 2×2
tap sums) stays OUTSIDE in ops/layers.py, so d(wall)→d(w) flows through
plain autodiff.

Gating: DVDGAN_UPS_PALLAS=off|fwd|full (ops/layers.py reads it; "fwd"
pairs the Pallas forward with the recompute lax backward; "full" uses the
Pallas backward when its plan fits, falling back to lax per level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# This kernel's whole-frame resident blocks made the NOMINAL-bytes
# budgeting of the sibling kernels too optimistic, so the estimators
# below model the actual Mosaic allocation observed on v5e (a 29.41M
# scoped-vmem OOM at the 256px top level matched this model to ~1%):
# the lane (minor) dim pads to a 128 multiple, and every pallas_call
# operand/output block is double-buffered — including constant-index
# whole-frame blocks. The hard scoped-vmem limit is 16 MB; budgets leave
# headroom for Mosaic stack temporaries (the unrolled per-row matmul
# accumulators). Shapes over budget fall back per level (forward: lax
# path; backward: lax recompute VJP) — the gate is the estimator.
_VMEM_LIMIT_BYTES = int(14.5 * 1024 * 1024)
_BWD_VMEM_LIMIT_BYTES = int(14.5 * 1024 * 1024)


def _pad128(c: int) -> int:
    return ((c + 127) // 128) * 128

_TAPS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _divisors_desc(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


# The per-row sweep is a static unroll of bh+1 row bodies — cap bh so the
# Mosaic program stays small (16 rows ≈ 64 fwd / 128 bwd dots per grid
# step, compiles fine; unbounded bh at small widths would not).
_MAX_BH = 16


def _fwd_bytes(bh: int, h: int, w: int, cin: int, cout: int,
               itemsize: int) -> int:
    frame = 2 * (h + 2) * (w + 2) * _pad128(cin) * itemsize   # xp, 2×buf
    out = 2 * (2 * bh) * w * _pad128(2 * cout) * itemsize     # 2×buf
    phases = 4 * bh * w * _pad128(cout) * 4                   # f32 scratch
    wall = 2 * 4 * cin * _pad128(4 * cout) * itemsize         # 2×buf
    acc = 2 * (w + 1) * _pad128(4 * cout) * 4                 # row temps
    return frame + out + phases + wall + acc


def _bwd_bytes(bh: int, h: int, w: int, cin: int, cout: int,
               itemsize: int) -> int:
    frame = 2 * (h + 2) * (w + 2) * _pad128(cin) * itemsize   # xp, 2×buf
    dxp = 2 * (h + 2) * (w + 2) * _pad128(cin) * 4            # f32, 2×buf
    dv = 2 * 2 * bh * w * _pad128(2 * cout) * itemsize        # 2×buf
    dphase = 4 * (bh + 1) * (w + 1) * _pad128(cout) * 4
    dwall = 2 * 4 * cin * _pad128(4 * cout) * 4               # f32 out, 2×buf
    wall = 2 * 4 * cin * _pad128(4 * cout) * itemsize         # operand, 2×buf
    temps = 2 * (w + 1) * (_pad128(4 * cout) + _pad128(cin)) * 4
    return frame + dxp + dv + dphase + dwall + wall + temps


def plan_fwd(h: int, w: int, cin: int, cout: int, itemsize: int = 2):
    """-> bh (H-block rows) or None when no block fits the budget."""
    for bh in _divisors_desc(h):
        if bh > _MAX_BH:
            continue
        if _fwd_bytes(bh, h, w, cin, cout, itemsize) < _VMEM_LIMIT_BYTES:
            return bh
    return None


def plan_bwd(h: int, w: int, cin: int, cout: int, itemsize: int = 2):
    for bh in _divisors_desc(h):
        if bh > _MAX_BH:
            continue
        if _bwd_bytes(bh, h, w, cin, cout, itemsize) < _BWD_VMEM_LIMIT_BYTES:
            return bh
    return None


def fits_fwd(h, w, cin, cout, itemsize: int = 2) -> bool:
    return plan_fwd(h, w, cin, cout, itemsize) is not None


def fits_bwd(h, w, cin, cout, itemsize: int = 2) -> bool:
    return plan_bwd(h, w, cin, cout, itemsize) is not None


def _fwd_pallas(wall, xp, interpret=False, force_bh=None):
    """wall (4·Cin, 4·Cout); xp (N, H+2, W+2, Cin) zero-padded input.
    -> out (N, 2H, W, 2·Cout); out.reshape(N, 2H, 2W, Cout) is the
    interleaved result (free contiguous view)."""
    n, hp2, wp2, cin = xp.shape
    h, w = hp2 - 2, wp2 - 2
    cout = wall.shape[1] // 4
    dtype = xp.dtype
    bh = force_bh or plan_fwd(h, w, cin, cout, dtype.itemsize)
    if bh is None:
        raise ValueError(
            f"ups2x fused forward does not fit VMEM at ({h},{w},{cin},"
            f"{cout}) — gate with fits_fwd")
    n_hb = h // bh

    def kernel(xp_ref, wall_ref, out_ref, y00, y01, y10, y11):
        hb = pl.program_id(1)
        start = hb * bh
        c = cout
        prev = xp_ref[0, start]                          # (W+2, Cin)
        for r in range(bh + 1):                          # static unroll
            nxt = xp_ref[0, start + r + 1]
            acc = jnp.zeros((w + 1, 4 * cout), jnp.float32)
            for k, (dr, dc) in enumerate(_TAPS):
                tap = (prev if dr == 0 else nxt)[dc:dc + w + 1]
                wk = wall_ref[k * cin:(k + 1) * cin, :]
                acc = acc + jax.lax.dot_general(
                    tap, wk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            # phase rows land in their own scratches (ref writes
            # normalize the sliced values' layouts)
            if r < bh:
                y00[r] = acc[0:w, 0 * c:1 * c]
                y01[r] = acc[1:w + 1, 1 * c:2 * c]
            if r >= 1:
                y10[r - 1] = acc[0:w, 2 * c:3 * c]
                y11[r - 1] = acc[1:w + 1, 3 * c:4 * c]
            prev = nxt
        # out rides the contiguous (N, 2H, W, 2·Cout) view: row 2r+p is
        # the lane-concat of phases (p,0) and (p,1) — offset-0 scratch
        # row loads concat cleanly
        for r in range(bh):
            out_ref[0, 2 * r, :, :] = jnp.concatenate(
                [y00[r], y01[r]], axis=-1).astype(dtype)
            out_ref[0, 2 * r + 1, :, :] = jnp.concatenate(
                [y10[r], y11[r]], axis=-1).astype(dtype)

    xp_spec = pl.BlockSpec((1, hp2, wp2, cin), lambda i, hb: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    wall_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 2 * bh, w, 2 * cout),
                            lambda i, hb: (i, hb, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, n_hb),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, w, 2 * cout), dtype),
        in_specs=[xp_spec, wall_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((bh, w, cout), jnp.float32)
                        for _ in range(4)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (h + 1) * (w + 1) * 4 * cin * 4 * cout,
            bytes_accessed=(xp.size + wall.size
                            + n * 4 * h * w * cout) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wall)


def _bwd_pallas(wall, xp, dview, interpret=False, force_bh=None):
    """wall (4·Cin, 4·Cout); xp (N, H+2, W+2, Cin); dview — the cotangent
    of the interleaved output as the free view (N, 2H, W, 2·Cout).
    -> (dwall (4·Cin, 4·Cout) f32, dxp (N, H+2, W+2, Cin) f32 — the
    in-kernel accumulator IS the output ref; the caller casts)."""
    n, hp2, wp2, cin = xp.shape
    h, w = hp2 - 2, wp2 - 2
    cout = wall.shape[1] // 4
    dtype = xp.dtype
    bh = force_bh or plan_bwd(h, w, cin, cout, dtype.itemsize)
    if bh is None:
        raise ValueError(
            f"ups2x fused backward does not fit VMEM at ({h},{w},{cin},"
            f"{cout}) — gate with fits_bwd")
    n_hb = h // bh

    def kernel(xp_ref, wall_ref, dv_ref, dwall_ref, dxp_ref,
               dy00, dy01, dy10, dy11):
        i = pl.program_id(0)
        hb = pl.program_id(1)
        start = hb * bh

        @pl.when((i == 0) & (hb == 0))
        def _():
            dwall_ref[:] = jnp.zeros(dwall_ref.shape, dwall_ref.dtype)

        @pl.when(hb == 0)
        def _():
            dxp_ref[:] = jnp.zeros(dxp_ref.shape, dxp_ref.dtype)

        # per-phase cotangents placed at their (row, col) offsets;
        # boundary rows/cols stay zero and the full dyall composes
        # across blocks by linearity. dv rides the (N, 2H, W, 2·Cout)
        # view: row 2r+p lane-splits into phases (p,0) | (p,1).
        for ref in (dy00, dy01, dy10, dy11):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)
        for r in range(bh):
            top = dv_ref[0, 2 * r].astype(jnp.float32)       # (W, 2C)
            bot = dv_ref[0, 2 * r + 1].astype(jnp.float32)
            dy00[r, 0:w, :] = top[:, 0:cout]
            dy01[r, 1:w + 1, :] = top[:, cout:2 * cout]
            dy10[r + 1, 0:w, :] = bot[:, 0:cout]
            dy11[r + 1, 1:w + 1, :] = bot[:, cout:2 * cout]

        prev = xp_ref[0, start]                          # (W+2, Cin)
        for r in range(bh + 1):                          # static unroll
            nxt = xp_ref[0, start + r + 1]
            # offset-0 full-row loads lane-concat cleanly
            flat = jnp.concatenate(
                [dy00[r], dy01[r], dy10[r], dy11[r]], axis=-1)
            for k, (dr, dc) in enumerate(_TAPS):
                wk = wall_ref[k * cin:(k + 1) * cin, :] \
                    .astype(jnp.float32)                 # (Cin, 4·Cout)
                # dx row: contract the 4·Cout lane dims -> (W+1, Cin)
                dtap = jax.lax.dot_general(
                    flat, wk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cur = dxp_ref[0, start + r + dr, dc:dc + w + 1, :]
                dxp_ref[0, start + r + dr, dc:dc + w + 1, :] = cur + dtap
                tap = (prev if dr == 0 else nxt)[dc:dc + w + 1] \
                    .astype(jnp.float32)                 # (W+1, Cin)
                # dwall rows k: tapᵀ·flat via dim-0 contraction
                dwall_ref[k * cin:(k + 1) * cin, :] += jax.lax.dot_general(
                    tap, flat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            prev = nxt

    xp_spec = pl.BlockSpec((1, hp2, wp2, cin), lambda i, hb: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    wall_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    dv_spec = pl.BlockSpec((1, 2 * bh, w, 2 * cout),
                           lambda i, hb: (i, hb, 0, 0),
                           memory_space=pltpu.VMEM)
    dwall_spec = pl.BlockSpec((4 * cin, 4 * cout), lambda i, hb: (0, 0),
                              memory_space=pltpu.VMEM)
    dxp_spec = pl.BlockSpec((1, hp2, wp2, cin), lambda i, hb: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, n_hb),
        out_shape=(jax.ShapeDtypeStruct((4 * cin, 4 * cout), jnp.float32),
                   jax.ShapeDtypeStruct((n, hp2, wp2, cin), jnp.float32)),
        in_specs=[xp_spec, wall_spec, dv_spec],
        out_specs=(dwall_spec, dxp_spec),
        scratch_shapes=[pltpu.VMEM((bh + 1, w + 1, cout), jnp.float32)
                        for _ in range(4)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * (h + 1) * (w + 1) * 4 * cin * 4 * cout,
            bytes_accessed=(2 * xp.size + dview.size) * dtype.itemsize
            + wall.size * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wall, dview)


def _lax_oracle(wall, xp):
    """Plain-lax reference of exactly what the forward kernel computes
    (the recompute backward for mode="fwd" and the test oracle)."""
    cout = wall.shape[1] // 4
    w4 = wall.reshape(2, 2, -1, 4 * cout)
    y = jax.lax.conv_general_dilated(
        xp, w4.astype(xp.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, hp1, wp1, _ = y.shape
    h, wd = hp1 - 1, wp1 - 1
    y00 = y[:, :h, :wd, 0 * cout:1 * cout]
    y01 = y[:, :h, 1:, 1 * cout:2 * cout]
    y10 = y[:, 1:, :wd, 2 * cout:3 * cout]
    y11 = y[:, 1:, 1:, 3 * cout:4 * cout]
    top = jnp.stack([y00, y01], axis=3)
    bot = jnp.stack([y10, y11], axis=3)
    out = jnp.stack([top, bot], axis=2)
    return out.reshape(n, 2 * h, 2 * wd, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ups2x(wall, xp, pallas_bwd: bool = True, interpret: bool = False,
          force_bh=None):
    """Fused phase conv + interleave. wall (4·Cin, 4·Cout) — the
    phase-decomposed 2×2 taps flattened tap-major; xp (N, H+2, W+2, Cin)
    zero-padded input. Returns (N, 2H, 2W, Cout). Differentiable in wall
    and xp; `pallas_bwd=False` (mode "fwd") backs through the lax oracle
    by recompute instead of the Pallas backward."""
    out4 = _fwd_pallas(wall, xp, interpret=interpret, force_bh=force_bh)
    n, h2, w, c2 = out4.shape
    return out4.reshape(n, h2, 2 * w, c2 // 2)


def _vjp_fwd(wall, xp, pallas_bwd, interpret, force_bh):
    out4 = _fwd_pallas(wall, xp, interpret=interpret, force_bh=force_bh)
    n, h2, w, c2 = out4.shape
    return out4.reshape(n, h2, 2 * w, c2 // 2), (wall, xp)


def _vjp_bwd(pallas_bwd, interpret, force_bh, res, g):
    wall, xp = res
    n, hp2, wp2, cin = xp.shape
    h, w = hp2 - 2, wp2 - 2
    cout = wall.shape[1] // 4
    if pallas_bwd and fits_bwd(h, w, cin, cout, xp.dtype.itemsize):
        dview = g.reshape(n, 2 * h, w, 2 * cout)        # free view
        dwall, dxp = _bwd_pallas(wall, xp, dview, interpret=interpret,
                                 force_bh=force_bh)
        return dwall.astype(wall.dtype), dxp.astype(xp.dtype)
    _, pull = jax.vjp(_lax_oracle, wall, xp)
    return pull(g)


ups2x.defvjp(_vjp_fwd, _vjp_bwd)
