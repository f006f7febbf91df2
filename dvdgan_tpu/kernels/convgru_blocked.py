"""Spatially-blocked whole-sequence ConvGRU Pallas kernel — kernel coverage
for the LARGE generator levels (VERDICT r3 missing #3 / SURVEY §2.3).

The unblocked sequence kernel (convgru_seq.py) holds one full (bb, H, W, C)
working set per grid step, which its VMEM gate rejects exactly where the GRU
is most expensive: the 64×64×64 level at 128px and everything bigger at
256px — those levels fell back to the plain `lax.scan`. This kernel tiles
the spatial H axis instead: the grid is (batch-blocks, T, 2, H-blocks), TPU
grids run sequentially, and three persistent VMEM scratch planes carry the
recurrence and the intra-step halo data:

  * `hplane`  (bb, H, W, C)  — h_{t-1} during step t's sweep; updated to h_t
    in place (phase 1 is pointwise in h, so overwriting block rows never
    clobbers data another block still needs);
  * `rhplane` (bb, H, W, C)  — r⊙h, written per block in phase 0, read WITH
    1-row halos in phase 1 (the candidate conv's stencil);
  * `zplane`  (bb, H, W, C) f32 — the update gate, phase 0 → phase 1.

Why two phases: the candidate conv needs HALO rows of r⊙h from neighbouring
H-blocks, and r depends on h through the gate conv — a one-pass sweep would
read halo rows the neighbouring block has not produced yet. Splitting each
timestep into a gate sweep (phase 0: all blocks compute r, z, r⊙h) and a
candidate/blend sweep (phase 1: conv over the now-complete rhplane) makes
every halo read see completed data; the grid iterates the phase axis OUTSIDE
the block axis, so phase 0 finishes everywhere before phase 1 starts. The
cost is that the gx/cx/out block DMAs run in both phases (the block index
re-cycles, so Pallas re-fetches) — ~2× input traffic, irrelevant here
because the 3×3 convs keep the kernel compute-bound.

Per-block edge handling reuses the padded-plane machinery of
convgru_cell.py: blocks at the image top/bottom leave their halo row
zeroed (the SAME-conv pad); interior blocks copy it from the plane.

Layouts/weights match convgru_seq exactly: gx (T,B,H,W,2C), cx (T,B,H,W,C),
h0 (B,H,W,C) -> hs (T,B,H,W,C); f32 gate math via the SHARED
_conv3x3_from_padded taps (rowpack-aware). Custom VJP: saved-hs reverse
scan — the same backward policy (and code) as convgru_seq.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvdgan_tpu.kernels import convgru_seq as _seq
from dvdgan_tpu.kernels.convgru_cell import _conv3x3_from_padded, _rowpack

# Separate budget from the cell kernel's conservative 4 MB: the persistent
# scratch planes here are explicit allocations (counted exactly below), not
# Mosaic stack temporaries, and the per-block working set is small. The
# backward kernel's 8 MB budget is on-chip-calibrated at a similar
# planes+block profile; start one notch under it.
_BLOCKED_VMEM_LIMIT_BYTES = 6 * 1024 * 1024


def _divisors_desc(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


def plan(b: int, h: int, w: int, c: int, itemsize: int = 2):
    """-> (bb, hbs) — batch-block and H-block sizes — or None when no
    blocking fits the budget. Requires ≥2 H-blocks (a single block is the
    unblocked kernel's job; callers try convgru_seq.fits_vmem first)."""
    best = None
    best_score = -1
    for bb in _divisors_desc(b):
        # persistent planes: hplane + rhplane (+ the h0 input block) in the
        # activation dtype, zplane in f32
        planes = bb * h * w * c * (3 * itemsize + 4)
        if planes >= _BLOCKED_VMEM_LIMIT_BYTES:
            continue
        for hbs in _divisors_desc(h):
            if hbs >= h:
                continue
            n = bb * hbs * w
            gates = 3 * n * 2 * c * 4            # f32 gate intermediates
            pads = 2 * bb * (hbs + 2) * (w + 2) * c * itemsize   # hp + rhp
            io = 2 * 4 * n * c * itemsize        # gx(2C)+cx(C)+out(C), 2×buf
            rowpack = 3 * n * c * itemsize if _rowpack() else 0
            if planes + gates + pads + io + rowpack \
                    < _BLOCKED_VMEM_LIMIT_BYTES:
                score = bb * hbs          # biggest tokens-per-block wins
                if score > best_score or (score == best_score
                                          and best and hbs > best[1]):
                    best, best_score = (bb, hbs), score
                break   # hbs descending: first fit is the largest for this bb
    return best


def fits(b: int, h: int, w: int, c: int, itemsize: int = 2) -> bool:
    """True when the blocked kernel can run at this shape; ops/convgru.py's
    auto-gate consults this AFTER convgru_seq.fits_vmem rejects."""
    return plan(b, h, w, c, itemsize) is not None


def _blocked_pallas(gx, cx, h0, wg, wc, interpret=False, force_plan=None):
    t_len, b, h, w, c2 = gx.shape
    c = c2 // 2
    p = force_plan or plan(b, h, w, c, h0.dtype.itemsize)
    if p is None:
        raise ValueError(
            f"blocked convgru kernel working set does not fit VMEM at "
            f"({b},{h},{w},{c}) — gate with convgru_blocked.fits")
    bb, hbs = p
    n_hb = h // hbs
    n = bb * hbs * w
    dtype = h0.dtype

    def kernel(h0_ref, gx_ref, cx_ref, wg_ref, wc_ref, out_ref,
               hplane, rhplane, zplane, hp, rhp):
        t = pl.program_id(1)
        ph = pl.program_id(2)
        hb = pl.program_id(3)
        start = hb * hbs

        @pl.when((t == 0) & (ph == 0) & (hb == 0))
        def _():
            # new batch-block: seed the carried plane from h0 (the grid
            # resets t to 0 whenever the batch index advances)
            hplane[:] = h0_ref[:]

        def fill(pref, plane):
            """pref (bb, hbs+2, w+2, c) <- plane rows [start-1, start+hbs]
            with zero SAME-pad at the image borders."""
            pref[:] = jnp.zeros_like(pref)
            pref[:, 1:hbs + 1, 1:w + 1, :] = plane[:, pl.ds(start, hbs), :, :]

            @pl.when(hb > 0)
            def _():
                pref[:, 0:1, 1:w + 1, :] = \
                    plane[:, pl.ds(start - 1, 1), :, :]

            @pl.when(hb < n_hb - 1)
            def _():
                pref[:, hbs + 1:hbs + 2, 1:w + 1, :] = \
                    plane[:, pl.ds(start + hbs, 1), :, :]

        @pl.when(ph == 0)
        def _gate_sweep():
            fill(hp, hplane)
            h_block = hplane[:, pl.ds(start, hbs), :, :]
            gh = _conv3x3_from_padded(hp[:], wg_ref[:], bb, hbs, w)
            gxf = gx_ref[0].reshape(n, 2 * c).astype(jnp.float32)
            rz = jax.nn.sigmoid(gxf + gh)
            r, z = rz[:, :c], rz[:, c:]
            hflat = h_block.reshape(n, c).astype(jnp.float32)
            rh = (r * hflat).astype(dtype).reshape(bb, hbs, w, c)
            rhplane[:, pl.ds(start, hbs), :, :] = rh
            zplane[:, pl.ds(start, hbs), :, :] = z.reshape(bb, hbs, w, c)
            # deterministic placeholder (this out index is revisited and
            # overwritten by phase 1; never flush uninitialized VMEM)
            out_ref[0] = h_block

        @pl.when(ph == 1)
        def _blend_sweep():
            fill(rhp, rhplane)
            h_block = hplane[:, pl.ds(start, hbs), :, :]
            ch = _conv3x3_from_padded(rhp[:], wc_ref[:], bb, hbs, w)
            cxf = cx_ref[0].reshape(n, c).astype(jnp.float32)
            cand = jnp.tanh(cxf + ch)
            z = zplane[:, pl.ds(start, hbs), :, :].reshape(n, c)
            hflat = h_block.reshape(n, c).astype(jnp.float32)
            h_new = ((1.0 - z) * hflat + z * cand).astype(dtype)
            h_new = h_new.reshape(bb, hbs, w, c)
            hplane[:, pl.ds(start, hbs), :, :] = h_new
            out_ref[0] = h_new

    grid = (b // bb, t_len, 2, n_hb)
    h0_spec = pl.BlockSpec((bb, h, w, c), lambda i, t, ph, hb: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    def seq_spec(ch):
        return pl.BlockSpec((1, bb, hbs, w, ch),
                            lambda i, t, ph, hb: (t, i, hb, 0, 0),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((t_len, b, h, w, c), dtype),
        in_specs=[h0_spec, seq_spec(2 * c), seq_spec(c), w_spec, w_spec],
        out_specs=seq_spec(c),
        scratch_shapes=[
            pltpu.VMEM((bb, h, w, c), dtype),              # hplane (carry)
            pltpu.VMEM((bb, h, w, c), dtype),              # rhplane
            pltpu.VMEM((bb, h, w, c), jnp.float32),        # zplane
            pltpu.VMEM((bb, hbs + 2, w + 2, c), dtype),    # hp
            pltpu.VMEM((bb, hbs + 2, w + 2, c), dtype),    # rhp
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * t_len * b * h * w * c * 3 * c,
            bytes_accessed=(2 * gx.size + 2 * cx.size + h0.size)
            * gx.dtype.itemsize
            + (wg.size + wc.size) * wg.dtype.itemsize
            + 3 * t_len * b * h * w * c * dtype.itemsize,
            transcendentals=3 * t_len * b * h * w * c,
        ),
        interpret=interpret,
    )(h0, gx, cx, wg, wc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gru_sequence_blocked(gx, cx, h0, wg, wc, interpret=False,
                         force_plan=None):
    """Spatially-blocked whole-sequence fused Pallas forward + the shared
    saved-hs backward (convgru_seq._bwd: reverse-time gate recompute, with
    the Pallas BPTT kernel auto-selected when ITS working set fits).
    gx (T,B,H,W,2C), cx (T,B,H,W,C), h0 (B,H,W,C) -> hs (T,B,H,W,C).
    `force_plan=(bb, hbs)` overrides the VMEM planner (tests)."""
    return _blocked_pallas(gx, cx, h0, wg, wc, interpret=interpret,
                           force_plan=force_plan)


def _fwd(gx, cx, h0, wg, wc, interpret, force_plan):
    hs = _blocked_pallas(gx, cx, h0, wg, wc, interpret=interpret,
                         force_plan=force_plan)
    return hs, (gx, cx, h0, wg, wc, hs)


def _bwd(interpret, force_plan, res, g):
    return _seq._bwd(interpret, res, g)


gru_sequence_blocked.defvjp(_fwd, _bwd)
