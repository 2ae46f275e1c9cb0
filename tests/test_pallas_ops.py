"""Pallas fused pairwise-kernel ops vs the XLA reference path.

Runs the identical kernel body through the Pallas interpreter on CPU
(shapes kept tiny — the interpreter is slow); on TPU the same code
compiles via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iltpu.ops.pairwise import squared_distance, weighted_similarity
from iltpu.ops.pallas_pairwise import fused_gaussian_rowsum, gmmil_witness_reward


def _xla_reward(x, y, w, ew, g1, g2):
    wn, ewn = w / w.sum(), ew / ew.sum()
    d2_ae = squared_distance(x, y)
    d2_aa = squared_distance(x, x)
    return (
        weighted_similarity(d2_ae, wn, ewn, g1)
        + weighted_similarity(d2_ae, wn, ewn, g2)
        - weighted_similarity(d2_aa, wn, wn, g1)
        - weighted_similarity(d2_aa, wn, wn, g2)
    )


@pytest.mark.parametrize("shape", [(11, 23, 5), (16, 16, 15)])
def test_fused_rowsum_matches_dense(shape):
    B, E, d = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(E, d)), jnp.float32)
    wy = jnp.asarray(rng.uniform(0.5, 1.5, E), jnp.float32)
    g1, g2 = jnp.float32(0.9), jnp.float32(3.0)
    d2 = squared_distance(x, y)
    want = (jnp.exp(-g1 * d2) + jnp.exp(-g2 * d2)) @ wy
    got = fused_gaussian_rowsum(x, y, wy, g1, g2, block_x=8, block_y=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_gmmil_witness_reward_matches_xla_path():
    rng = np.random.default_rng(1)
    B, E, d = 13, 21, 7
    x = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(E, d)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, B), jnp.float32)
    ew = jnp.asarray(rng.uniform(0.5, 1.5, E), jnp.float32)
    g1, g2 = jnp.float32(0.7), jnp.float32(2.3)
    want = _xla_reward(x, y, w, ew, g1, g2)
    got = gmmil_witness_reward(x, y, w, ew, g1, g2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_gmmil_discriminator_pallas_flag_consistent():
    from iltpu.rewards.gmmil import GMMILDiscriminator

    rng = np.random.default_rng(2)
    B, E, S, A = 9, 17, 4, 2
    s = jnp.asarray(rng.normal(size=(B, S)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(B, A)), jnp.float32)
    es = jnp.asarray(rng.normal(size=(E, S)), jnp.float32)
    ea = jnp.asarray(rng.normal(size=(E, A)), jnp.float32)
    w = jnp.ones(B)
    ew = jnp.asarray(rng.uniform(0.5, 1.5, E), jnp.float32)
    rewards = {}
    for flag in (False, True):
        disc = GMMILDiscriminator(S, A, use_pallas=flag)
        carry = disc.init()
        carry, r1 = disc.predict_reward(carry, s, a, es, ea, w, ew)
        # second call exercises the initialized branch
        _, r2 = disc.predict_reward(carry, s, a, es, ea, w, ew)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
        rewards[flag] = np.asarray(r1)
    np.testing.assert_allclose(rewards[True], rewards[False], atol=1e-6)
