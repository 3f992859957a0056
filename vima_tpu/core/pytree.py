"""Nested-structure utilities over plain pytrees.

Capability parity with the reference's 916-line ``vima/utils.py`` L0 layer
(any_concat/any_stack/any_slice :27-64,:880-889, any_to_torch_tensor
:67-122, any_transpose_first_two_axes :896-906, add_batch_dim :909-916,
get_batch_size :816-840, DataDict :228-646). JAX is tree-native, so ~90%
of that machinery dissolves into ``jax.tree_util`` one-liners (survey §7);
the rest lives here. Works uniformly over numpy arrays, JAX arrays, and
scalars nested in dicts/lists/tuples.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np


def _is_leaf(x) -> bool:
    return not isinstance(x, (dict, list, tuple))


def any_concat(xs: Sequence[Any], axis: int = 0):
    """Concatenate corresponding leaves of nested structures
    (reference vima/utils.py:27-44)."""
    return jax.tree_util.tree_map(lambda *leaves: _concat_leaves(leaves, axis), *xs)


def _concat_leaves(leaves, axis):
    first = leaves[0]
    if isinstance(first, jax.Array):
        import jax.numpy as jnp

        return jnp.concatenate(leaves, axis=axis)
    if np.isscalar(first) or (isinstance(first, np.ndarray) and first.ndim == 0):
        return np.array(leaves)
    return np.concatenate(leaves, axis=axis)


def any_stack(xs: Sequence[Any], axis: int = 0):
    """Stack corresponding leaves on a new axis (reference :47-64)."""
    return jax.tree_util.tree_map(lambda *leaves: _stack_leaves(leaves, axis), *xs)


def _stack_leaves(leaves, axis):
    first = leaves[0]
    if isinstance(first, jax.Array):
        import jax.numpy as jnp

        return jnp.stack(leaves, axis=axis)
    if np.isscalar(first):
        return np.array(leaves)
    return np.stack(leaves, axis=axis)


def any_slice(x: Any, slc):
    """Apply ``slc`` (e.g. ``np.s_[0, 0]``) to every array leaf
    (reference :880-889); non-indexable leaves pass through."""

    def f(leaf):
        if hasattr(leaf, "__getitem__") and hasattr(leaf, "ndim") and leaf.ndim > 0:
            return leaf[slc]
        return leaf

    return jax.tree_util.tree_map(f, x)


def any_transpose_first_two_axes(x: Any):
    """Swap the leading two axes of every leaf (reference :896-906)."""
    return jax.tree_util.tree_map(lambda leaf: np.swapaxes(leaf, 0, 1), x)


def add_batch_dim(x: Any):
    """Prepend a length-1 batch axis to every leaf (reference :909-916)."""
    return jax.tree_util.tree_map(lambda leaf: np.asarray(leaf)[None], x)


def get_batch_size(x: Any, strict: bool = False) -> int:
    """Leading-dim size of the structure (reference :816-840)."""
    leaves = jax.tree_util.tree_leaves(x)
    sizes = [leaf.shape[0] for leaf in leaves if hasattr(leaf, "shape") and leaf.ndim > 0]
    if not sizes:
        raise ValueError("no array leaves with a batch dim")
    if strict and len(set(sizes)) != 1:
        raise ValueError(f"inconsistent batch sizes: {sorted(set(sizes))}")
    return sizes[0]


def to_device(x: Any, dtype_map: Optional[dict] = None):
    """Host tree -> device arrays, with optional fnmatch dtype overrides —
    the capability of ``DataDict.to_torch_tensor`` (reference :228-646)."""
    import fnmatch

    import jax.numpy as jnp

    def f(path, leaf):
        arr = jnp.asarray(leaf)
        if dtype_map:
            name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            for pat, dt in dtype_map.items():
                if fnmatch.fnmatch(name, pat):
                    arr = arr.astype(dt)
                    break
        return arr

    return jax.tree_util.tree_map_with_path(f, x)


def to_numpy(x: Any):
    return jax.tree_util.tree_map(np.asarray, x)
