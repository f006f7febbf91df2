"""Weight initializers.

DVD-GAN / BigGAN convention (SURVEY.md §2.18): orthogonal init for all conv
and linear kernels, N(0, 0.02)-free — embeddings start orthogonal too in the
BigGAN codebase; we use orthogonal for matrices and normal for the shared
class embedding (configurable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def orthogonal(key: jax.Array, shape: tuple[int, ...], gain: float = 1.0,
               dtype=jnp.float32) -> jax.Array:
    """Orthogonal init for an arbitrary-rank kernel.

    The kernel is flattened to (prod(shape[:-1]), shape[-1]) — i.e. conv
    kernels HWIO/DHWIO collapse their receptive field+input dims — matching
    torch.nn.init.orthogonal_'s treatment of `weight.view(out, -1)` up to
    transpose (the distribution is invariant).
    """
    if len(shape) < 2:
        raise ValueError(f"orthogonal init needs rank>=2, got {shape}")
    n_rows = 1
    for d in shape[:-1]:
        n_rows *= d
    n_cols = shape[-1]
    flat_shape = (max(n_rows, n_cols), min(n_rows, n_cols))
    a = jax.random.normal(key, flat_shape, jnp.float32)
    q, r = jnp.linalg.qr(a)
    # Sign correction makes the distribution uniform over the orthogonal group.
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    if n_rows < n_cols:
        q = q.T
    return (gain * q.reshape(shape)).astype(dtype)


def normal(key: jax.Array, shape: tuple[int, ...], stddev: float = 0.02,
           dtype=jnp.float32) -> jax.Array:
    return (stddev * jax.random.normal(key, shape, jnp.float32)).astype(dtype)


def zeros(shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype)


def ones(shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    return jnp.ones(shape, dtype)
