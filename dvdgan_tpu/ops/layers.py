"""Primitive parameterized layers: linear, conv2d, conv3d, embedding.

Pure functions over explicit param dicts. Conventions chosen for the TPU:

  * Activations are channels-last: images (N, H, W, C), videos
    (N, T, H, W, C) — the layout XLA:TPU tiles onto the (8,128)/(16,128)
    vector registers and the MXU without transposes.
  * Kernels are HWIO / DHWIO; linears are (in, out).
  * Compute dtype follows the activation dtype (bf16 in production);
    parameters are stored float32 and cast at use. Outputs keep the
    activation dtype: the MXU accumulates bf16 contractions in float32
    internally and rounds once on output (requesting a float32 output via
    preferred_element_type breaks the conv transpose rule under jax.grad
    when inputs are bf16 — verified on TPU v5e, jax 0.9).

Reference parity: these replace the reference's torch.nn.Conv2d/Conv3d/Linear
/Embedding uses ([R module/*.py], SURVEY.md §2) — there, lowered to cuDNN;
here, to XLA:TPU convolutions on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvdgan_tpu.core import init as winit

Params = dict


# ---------------------------------------------------------------- linear ----

def linear_init(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    p = {"w": winit.orthogonal(key, (in_dim, out_dim))}
    if use_bias:
        p["b"] = winit.zeros((out_dim,))
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    w = p["w"].astype(x.dtype)
    y = jnp.dot(x, w)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------- conv2d ----

def conv2d_init(key, k: int, cin: int, cout: int, use_bias: bool = True) -> Params:
    p = {"w": winit.orthogonal(key, (k, k, cin, cout))}
    if use_bias:
        p["b"] = winit.zeros((cout,))
    return p


def conv2d(p: Params, x: jax.Array, stride: int = 1, padding: str = "SAME"
           ) -> jax.Array:
    """x: (N, H, W, C) -> (N, H', W', C_out)."""
    w = p["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------- conv3d ----

def conv3d_init(key, k: tuple[int, int, int], cin: int, cout: int,
                use_bias: bool = True) -> Params:
    kt, kh, kw = k
    p = {"w": winit.orthogonal(key, (kt, kh, kw, cin, cout))}
    if use_bias:
        p["b"] = winit.zeros((cout,))
    return p


def conv3d(p: Params, x: jax.Array, stride: tuple[int, int, int] = (1, 1, 1),
           padding: str = "SAME") -> jax.Array:
    """x: (N, T, H, W, C) -> (N, T', H', W', C_out). Used by DT's first
    blocks (SURVEY.md §2.8): 3×3×3 kernels, NDHWC/DHWIO on the MXU."""
    w = p["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


@jax.custom_vjp
def grad_barrier(x: jax.Array) -> jax.Array:
    """Identity whose BACKWARD materializes the cotangent (optimization
    barrier on the gradient only; forward fuses freely).

    Use between a wide conv and a narrow-channel stem conv: without it XLA
    fuses both backward convs into one kOutput fusion whose output layout
    is dictated by the tiny cin-3 input-grad (batch-minor, 3-channel lanes),
    dragging the wide conv's input-grad to ~14% MXU (profiled 1.62 ms for
    27.9 GFLOP at the DT stem vs ~0.6 ms for the same-size weight-grad)."""
    return x


def _gb_fwd(x):
    return x, None


def _gb_bwd(_, g):
    return (jax.lax.optimization_barrier(g),)


grad_barrier.defvjp(_gb_fwd, _gb_bwd)


# ------------------------------------------------------------- embedding ----

def embedding_init(key, n: int, dim: int) -> Params:
    # BigGAN initializes embeddings orthogonally and spectrally normalizes
    # them; leaf name 'emb' opts into the SN pass (ops/spectral_norm.py).
    return {"emb": winit.orthogonal(key, (n, dim))}


def embedding(p: Params, idx: jax.Array) -> jax.Array:
    """idx: int array (...,) -> (..., dim). take() not one-hot matmul: the
    table is tiny and gather is cheaper than an (N × n_class) matmul."""
    return jnp.take(p["emb"], idx, axis=0)
