"""Tanh-Gaussian distribution math (hand-rolled, numerically stable).

Equivalent to the reference policy distribution
`TransformedDistribution(Independent(Normal(mean, std), 1), TanhTransform(cache_size=1))`
(models.py:93). The `cache_size=1` exactness is reproduced by computing
log-probs of self-sampled actions from the pre-tanh value directly.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0
_ACTION_EPS = 1e-6


def normal_log_prob(mean: jax.Array, log_std: jax.Array, z: jax.Array) -> jax.Array:
    """Diagonal Normal log density, summed over the action dimension."""
    var_term = 2.0 * log_std
    lp = -0.5 * ((z - mean) ** 2 * jnp.exp(-var_term) + var_term + jnp.log(2.0 * jnp.pi))
    return jnp.sum(lp, axis=-1)


def tanh_log_det_jacobian(z: jax.Array) -> jax.Array:
    """log |d tanh(z)/dz| summed over the last axis, in the stable form
    2 * (log 2 - z - softplus(-2z)) used by torch's TanhTransform."""
    return jnp.sum(2.0 * (jnp.log(2.0) - z - jax.nn.softplus(-2.0 * z)), axis=-1)


def sample_pretanh(
    key: jax.Array, mean: jax.Array, log_std: jax.Array
) -> jax.Array:
    """Reparameterised pre-tanh sample z = mean + std * eps."""
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + jnp.exp(log_std) * eps


def log_prob_from_pretanh(
    mean: jax.Array, log_std: jax.Array, z: jax.Array
) -> jax.Array:
    """Exact log pi(tanh(z)) using the cached pre-tanh value."""
    return normal_log_prob(mean, log_std, z) - tanh_log_det_jacobian(z)


def log_prob_of_action(
    mean: jax.Array, log_std: jax.Array, action: jax.Array
) -> jax.Array:
    """log pi(a) for an externally-given action; clamps to (-1, 1) to avoid
    NaNs in atanh (reference models.py:98)."""
    a = jnp.clip(action, -1.0 + _ACTION_EPS, 1.0 - _ACTION_EPS)
    z = jnp.arctanh(a)
    return log_prob_from_pretanh(mean, log_std, z)
