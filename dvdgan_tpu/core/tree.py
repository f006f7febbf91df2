"""Pytree path utilities.

Parameters and mutable state (spectral-norm `u` vectors, BatchNorm running
moments) live in *separate* pytrees keyed by slash-joined paths, so that model
`apply` functions stay pure and optimizers/EMA only ever see the parameter
tree. (The reference keeps this state implicitly on `nn.Module` buffers; in
JAX it must be explicit — SURVEY.md §7 "hard parts" #1.)
"""

from __future__ import annotations

from typing import Any, Callable

import jax


def path_str(path) -> str:
    """Render a jax key-path as 'a/b/0/c'."""
    parts = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            parts.append(str(k.key))
        elif isinstance(k, jax.tree_util.SequenceKey):
            parts.append(str(k.idx))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            parts.append(str(k.name))
        else:  # FlattenedIndexKey and friends
            parts.append(str(getattr(k, "key", k)))
    return "/".join(parts)


def flatten_with_paths(tree: Any) -> dict[str, Any]:
    """Flatten a pytree into {'a/b/c': leaf}."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {path_str(p): v for p, v in leaves}


def map_with_path(fn: Callable[[str, Any], Any], tree: Any) -> Any:
    """tree_map where fn also receives the slash-joined path of each leaf."""
    return jax.tree_util.tree_map_with_path(lambda p, v: fn(path_str(p), v), tree)


def get_path(tree: Any, path: str) -> Any:
    node = tree
    for part in path.split("/"):
        if isinstance(node, (list, tuple)):
            node = node[int(part)]
        else:
            node = node[part]
    return node
