"""Unit tests for pairwise ops against NumPy and torch references."""

import jax
import jax.numpy as jnp
import numpy as np

from iltpu.ops import (
    gaussian_kernel,
    squared_distance,
    weighted_median,
    weighted_similarity,
)


def test_squared_distance_matches_broadcast_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 5)).astype(np.float32)
    y = rng.normal(size=(9, 5)).astype(np.float32)
    expected = ((x[:, None, :] - y[None, :, :]) ** 2).mean(axis=2)
    got = np.asarray(squared_distance(jnp.array(x), jnp.array(y)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_squared_distance_self_diagonal_zero():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    d = np.asarray(squared_distance(x, x))
    np.testing.assert_allclose(np.diag(d), np.zeros(16), atol=1e-5)
    assert (d >= 0).all()


def test_weighted_similarity_matches_einsum():
    rng = np.random.default_rng(2)
    d2 = np.abs(rng.normal(size=(6, 4))).astype(np.float32)
    wx = rng.uniform(0.5, 1.5, size=6).astype(np.float32)
    wy = rng.uniform(0.5, 1.5, size=4).astype(np.float32)
    gamma = 0.7
    expected = np.einsum("i,ij,j->i", wx, np.exp(-gamma * d2), wy)
    got = np.asarray(
        weighted_similarity(jnp.array(d2), jnp.array(wx), jnp.array(wy), gamma)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_weighted_median_uniform_weights_is_lower_median():
    x = jnp.array([3.0, 1.0, 2.0, 5.0, 4.0])
    w = jnp.ones(5)
    # cdf crosses 0.5 at the 3rd sorted element (cumsum 0.6) -> value 3.
    assert float(weighted_median(x, w)) == 3.0


def test_weighted_median_weighted():
    x = jnp.array([1.0, 2.0, 10.0])
    w = jnp.array([0.5, 0.1, 0.4])
    # cumulative normalised weights: 0.5, 0.6, 1.0 -> first >= 0.5 is x=1.
    assert float(weighted_median(x, w)) == 1.0


def test_gaussian_kernel():
    d2 = jnp.array([[0.0, 1.0], [2.0, 3.0]])
    np.testing.assert_allclose(
        np.asarray(gaussian_kernel(d2, 2.0)), np.exp(-2.0 * np.asarray(d2)), rtol=1e-6
    )
