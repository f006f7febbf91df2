"""Spectral normalization as a hoisted, jit-safe pass over a parameter tree.

Behavioral spec (SURVEY.md §2.1): every conv/linear kernel and class
embedding in G, DS and DT is divided by a power-iteration estimate of its top
singular value; the persistent left/right vector `u` advances by exactly one
power-iteration step per *owning model's* optimizer update.

TPU-first design, deliberately unlike the reference's per-module forward
hooks: normalization runs ONCE per train step over the whole tree
(`sn_normalize`), producing a normalized parameter pytree that the pure model
`apply` functions consume. This keeps the σ computation out of the per-frame
hot loop, gives XLA one fused elementwise pass, and makes the update count an
explicit, testable contract instead of a side effect of call order:

  * D-phase: DS/DT params normalized with `update=True` (u advances once per
    D step); G params normalized with `update=False` for fake generation.
  * G-phase: G params normalized with `update=True` (u advances once per G
    step); DS/DT with `update=False`.

Gradients flow through W both directly and through σ(W) (u, v are treated as
constants via stop_gradient), matching torch.nn.utils.spectral_norm's
backward semantics. All σ math is float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dvdgan_tpu.core import tree as tru

_EPS = 1e-12

# Parameter-leaf names subject to spectral normalization. 'w' = conv/linear
# kernels (HWIO / DHWIO / (in,out)); 'emb' = class-embedding matrices
# (BigGAN applies SN to the shared embedding and the projection embedding).
_SN_LEAF_NAMES = ("w", "emb")


def default_match(path: str) -> bool:
    leaf = path.rsplit("/", 1)[-1]
    return leaf in _SN_LEAF_NAMES


def _as_matrix(w: jax.Array) -> jax.Array:
    """Collapse a kernel to (in_flat, out): HWIO/DHWIO fold receptive field
    and input channels; linears (in,out) and embeddings (n, dim) pass
    through. σ is invariant to this transpose convention."""
    return w.reshape(-1, w.shape[-1])


def _l2norm(x: jax.Array) -> jax.Array:
    return x / (jnp.linalg.norm(x) + _EPS)


def sn_init(key: jax.Array, params, match: Callable[[str], bool] = default_match
            ) -> dict[str, jax.Array]:
    """Build {path: u} for every matching kernel. u lives in the OUT space
    (shape (out,)), drawn N(0,1) then normalized, per the usual convention."""
    flat = tru.flatten_with_paths(params)
    paths = sorted(p for p in flat if match(p))
    keys = jax.random.split(key, max(len(paths), 1))
    u = {}
    for p, k in zip(paths, keys):
        out_dim = flat[p].shape[-1]
        u[p] = _l2norm(jax.random.normal(k, (out_dim,), jnp.float32))
    return u


def _power_iteration(w_mat: jax.Array, u: jax.Array, n_iter: int):
    """n_iter power-iteration steps with gradients blocked; returns (u', v)."""
    w_sg = jax.lax.stop_gradient(w_mat)

    def body(_, u):
        v = _l2norm(w_sg @ u)          # (in_flat,)
        u = _l2norm(w_sg.T @ v)        # (out,)
        return u

    u = jax.lax.fori_loop(0, n_iter, body, u) if n_iter > 1 else body(0, u)
    v = _l2norm(w_sg @ u)
    return jax.lax.stop_gradient(u), jax.lax.stop_gradient(v)


def sigma_and_update(w: jax.Array, u: jax.Array, n_iter: int = 1):
    """Estimate σ(w) from persistent u; return (σ, u_next).

    σ = vᵀ W u with u, v held constant, so ∂σ/∂W = v uᵀ (the torch semantics).
    """
    w_mat = _as_matrix(w.astype(jnp.float32))
    u_next, v = _power_iteration(w_mat, u, n_iter)
    sigma = v @ (w_mat @ u_next)
    return sigma, u_next


def sn_sigmas(params, sn_u: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """{path: σ estimate} for every spectrally-normalized kernel, from the
    persistent u WITHOUT advancing it — the reference trainer's occasional
    σ telemetry (SURVEY §2.15). Cheap: one matvec pair per kernel."""
    flat = tru.flatten_with_paths(params)
    return {p: sigma_and_update(flat[p], u)[0] for p, u in sn_u.items()}


def sn_normalize(params, sn_u: dict[str, jax.Array], update: bool,
                 n_iter: int = 1, compute_dtype=None):
    """Return (params with matching kernels divided by σ, new {path: u}).

    `update` selects whether the returned u tree advances (train step of the
    owning model) or echoes the input (evaluation / the non-updating phase).
    `update` is a static Python bool — both variants are separate traces.

    `compute_dtype` (e.g. bf16): emit EVERY leaf of the normalized tree in
    that dtype, so the f32-master → compute-dtype conversion happens once
    here instead of at each of a parameter's several uses per step (the
    per-use casts showed up as ~5 ms/step of convert fusions in the profile).
    """
    new_u: dict[str, jax.Array] = {}
    out_dtype = compute_dtype

    def norm_leaf(path: str, w):
        if path not in sn_u:
            return w.astype(out_dtype) if out_dtype is not None else w
        sigma, u_next = sigma_and_update(w, sn_u[path], n_iter)
        new_u[path] = u_next if update else sn_u[path]
        w_sn = w.astype(jnp.float32) / sigma
        return w_sn.astype(out_dtype if out_dtype is not None else w.dtype)

    params_sn = tru.map_with_path(norm_leaf, params)
    return params_sn, new_u
