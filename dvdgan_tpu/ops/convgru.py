"""Convolutional GRU — the generator's temporal core (SURVEY.md §2.3).

One ConvGRU runs per generator resolution level, unrolled over the T frames
with `jax.lax.scan` (the sequential dependency the reference expresses as a
Python for-loop over time, [R module/ConvGRU.py]). The carried state is the
(B, H, W, C) hidden map at that level's resolution; everything inside a step
is conv+elementwise, which XLA fuses per scan iteration.

Cell:  rz = σ(Conv3×3([x, h]))            (one conv producing both gates)
       c  = tanh(Conv3×3([x, r ⊙ h]))
       h' = (1 − z) ⊙ h + z ⊙ c

Both convs' kernels are named 'w' → spectrally normalized by the tree pass
(G applies SN everywhere).

Framework RNG/init contract (documented; reference detail uncertain per
SURVEY): the initial hidden state is zeros at every level; the level-0 input
sequence is the 4×4 latent seed broadcast over T, so z still reaches the
recurrence through the inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvdgan_tpu.ops import layers


def convgru_init(key, c: int, k: int = 3) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "gates": layers.conv2d_init(k1, k, 2 * c, 2 * c),
        "cand": layers.conv2d_init(k2, k, 2 * c, c),
    }


def convgru_cell(p: dict, x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step. x, h: (B, H, W, C) -> h': (B, H, W, C)."""
    xh = jnp.concatenate([x, h], axis=-1)
    rz = jax.nn.sigmoid(layers.conv2d(p["gates"], xh).astype(jnp.float32))
    r, z = jnp.split(rz, 2, axis=-1)
    r = r.astype(x.dtype)
    cand_in = jnp.concatenate([x, (r * h.astype(r.dtype))], axis=-1)
    c = jnp.tanh(layers.conv2d(p["cand"], cand_in).astype(jnp.float32))
    h32 = h.astype(jnp.float32)
    h_new = (1.0 - z) * h32 + z * c
    return h_new.astype(x.dtype)


def convgru(p: dict, x_seq: jax.Array, h0: jax.Array | None = None
            ) -> jax.Array:
    """Unroll over time. x_seq: (B, T, H, W, C) -> hidden seq, same shape.

    lax.scan keeps the compiled program O(1) in T (single traced step), the
    TPU-idiomatic replacement for the reference's per-frame Python loop.
    """
    b, t, h, w, c = x_seq.shape
    if h0 is None:
        h0 = jnp.zeros((b, h, w, c), x_seq.dtype)
    xs = jnp.moveaxis(x_seq, 1, 0)  # time-major for scan

    def step(hid, x):
        hid = convgru_cell(p, x, hid)
        return hid, hid

    _, hs = jax.lax.scan(step, h0, xs)
    return jnp.moveaxis(hs, 0, 1)
