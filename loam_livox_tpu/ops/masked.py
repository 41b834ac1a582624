"""Masked-array utilities: the jit-compatible replacements for the
reference's dynamically sized vectors/sets.

Everything here operates on fixed-capacity arrays with boolean validity
masks and compiles to static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e30)


def masked_quantile_l1(values: jax.Array, mask: jax.Array, ratio: float) -> jax.Array:
    """Value at position ``floor(ratio * n_valid)`` of the ascending-sorted
    valid entries.

    Mirrors the reference's inlier threshold, which inserts per-block
    L1 residual sums into a ``std::set`` and dereferences
    ``std::next(begin(), ratio * size)``
    (reference: ``source/point_cloud_registration.hpp:153-161``).
    (The set's dedup of exactly-equal float residuals is dropped —
    duplicates are measure-zero for real residuals.)
    """
    vals = jnp.where(mask, values, BIG)
    svals = jnp.sort(vals)
    n = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.clip((ratio * n.astype(jnp.float32)).astype(jnp.int32), 0, values.shape[0] - 1)
    idx = jnp.minimum(idx, jnp.maximum(n - 1, 0))
    return svals[idx]


def compact(mask: jax.Array, *arrays: jax.Array, capacity: int | None = None):
    """Stable-compact valid rows to the front.

    Returns ``(new_mask, *compacted_arrays)`` where the first
    ``count(mask)`` slots hold the valid rows in their original order.
    If ``capacity`` is given, outputs are truncated/padded to it.
    """
    n = mask.shape[0]
    order = jnp.argsort(jnp.logical_not(mask), stable=True)
    new_mask = mask[order]
    outs = tuple(a[order] for a in arrays)
    if capacity is not None and capacity != n:
        if capacity < n:
            new_mask = new_mask[:capacity]
            outs = tuple(a[:capacity] for a in outs)
        else:
            pad = capacity - n
            new_mask = jnp.pad(new_mask, (0, pad))
            outs = tuple(
                jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in outs
            )
    return (new_mask,) + outs


def masked_mean(values: jax.Array, mask: jax.Array, axis=None):
    w = mask.astype(values.dtype)
    num = jnp.sum(values * w, axis=axis)
    den = jnp.maximum(jnp.sum(w, axis=axis), 1.0)
    return num / den


def masked_min(values: jax.Array, mask: jax.Array, axis=None, initial=BIG):
    return jnp.min(jnp.where(mask, values, initial), axis=axis)


def masked_max(values: jax.Array, mask: jax.Array, axis=None, initial=-BIG):
    return jnp.max(jnp.where(mask, values, initial), axis=axis)


def random_keep_mask(key: jax.Array, mask: jax.Array, budget: int) -> jax.Array:
    """Randomly thin `mask` so roughly `budget` entries survive when the
    valid count exceeds the budget; otherwise return `mask` unchanged.

    Mirrors the reference's residual-block subsampling, which keeps a
    block with probability budget/count
    (reference: ``source/point_cloud_registration.hpp:438-458``).
    """
    count = jnp.sum(mask.astype(jnp.int32))
    keep_prob = jnp.minimum(1.0, budget / jnp.maximum(count.astype(jnp.float32), 1.0))
    u = jax.random.uniform(key, mask.shape)
    return jnp.logical_and(mask, u < keep_prob)
