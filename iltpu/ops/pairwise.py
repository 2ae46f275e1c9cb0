"""Batched pairwise-distance / kernel primitives (GMMIL, RED, PWIL).

Semantics match the reference helpers (`/root/reference/models.py:25-44`)
but are written MXU-first: the O(B^2 d) pairwise squared distance is computed
via one matmul (Gram-matrix expansion) instead of materialising the
(B, B, d) broadcasted difference tensor, which keeps HBM traffic O(B^2 + Bd)
and routes the FLOPs through the systolic array. A fused Pallas kernel for
distance+kernel lives in `iltpu.ops.pallas.pairwise` for large atom pools.
"""

import jax
import jax.numpy as jnp


def squared_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean (over feature dim) squared distance between all pairs.

    Equivalent to reference `_squared_distance` (models.py:25-28):
    out[i, j] = mean_d (x[i, d] - y[j, d])^2, shape (n_x, n_y).
    """
    d = x.shape[-1]
    # Centering by a shared offset leaves all pairwise differences unchanged
    # but greatly improves f32 conditioning of the Gram expansion below.
    center = jax.lax.stop_gradient(0.5 * (jnp.mean(x, axis=0) + jnp.mean(y, axis=0)))
    x = x - center
    y = y - center
    # ||x - y||^2 = ||x||^2 + ||y||^2 - 2 <x, y>; the cross term is a matmul.
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (n_x, 1)
    y_sq = jnp.sum(y * y, axis=-1, keepdims=True).T  # (1, n_y)
    cross = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    sq = x_sq + y_sq - 2.0 * cross
    # Clamp tiny negatives from cancellation so kernels stay in [0, 1].
    return jnp.maximum(sq, 0.0) / d


def gaussian_kernel(sq_dist: jax.Array, gamma: jax.Array | float = 1.0) -> jax.Array:
    """exp(-gamma * d2) — reference `_gaussian_kernel` (models.py:32-33)."""
    return jnp.exp(-gamma * sq_dist)


def weighted_similarity(
    sq_dist: jax.Array,
    w_x: jax.Array,
    w_y: jax.Array,
    gamma: jax.Array | float = 1.0,
) -> jax.Array:
    """Per-row weighted kernel similarity.

    Reference `_weighted_similarity` (models.py:36-37):
    out[i] = w_x[i] * sum_j K(d2[i, j]) w_y[j].
    """
    return w_x * (gaussian_kernel(sq_dist, gamma) @ w_y)


def weighted_median(x: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted median of flattened `x` — reference `_weighted_median`
    (models.py:40-44): sort values, normalise weights, return the first value
    whose cumulative weight reaches 0.5.
    """
    x_flat = x.reshape(-1)
    w_flat = weights.reshape(-1)
    order = jnp.argsort(x_flat)
    x_sorted = x_flat[order]
    w_sorted = (w_flat / w_flat.sum())[order]
    cdf = jnp.cumsum(w_sorted)
    median_index = jnp.argmax(cdf >= 0.5)  # First index where cdf crosses 0.5
    return x_sorted[median_index]
