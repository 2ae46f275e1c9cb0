"""Fused Pallas TPU kernel for weighted two-bandwidth Gaussian-kernel row
sums — the GMMIL witness-reward hot op (reference models.py:25-37,196-201).

The XLA path (`iltpu.ops.pairwise`) materialises the (B, E) squared-distance
matrix in HBM, reads it back for each of the two kernel evaluations, and
reduces. This kernel tiles the computation over (B, E) blocks: each tile's
distances are produced on the MXU (centered Gram expansion), both Gaussian
kernels and the weighted row-sum reduction are applied in VMEM, and only the
(B,) result ever reaches HBM — O(B·d + E·d + B) HBM traffic instead of
O(B·E), which is what matters once the expert atom pool is large (full-
dataset GMMIL/PWIL variants, tens of thousands of atoms).

out[i] = sum_j (exp(-g1*d2[i,j]) + exp(-g2*d2[i,j])) * w_y[j]
d2[i,j] = mean_d (x[i,d] - y[j,d])^2

Feature padding to the 128-lane boundary is free (zero-padded features do
not change distances); row padding is masked via zero weights.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rowsum_kernel(g1_ref, g2_ref, invd_ref, x_ref, y_ref, wy_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]  # (BX, D)
    y = y_ref[:]  # (BY, D)
    # Centered-Gram squared distances on the MXU: ||x||^2 + ||y||^2 - 2<x,y>.
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (BX, 1)
    y_sq = jnp.sum(y * y, axis=-1, keepdims=True).T  # (1, BY)
    cross = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    d2 = jnp.maximum(x_sq + y_sq - 2.0 * cross, 0.0) * invd_ref[0, 0]
    k = jnp.exp(-g1_ref[0, 0] * d2) + jnp.exp(-g2_ref[0, 0] * d2)
    # Weighted row reduction; padded expert rows carry zero weight.
    out_ref[:] += jnp.dot(
        k, wy_ref[:].T, preferred_element_type=jnp.float32
    )  # (BX, 1)


def _pad_to(a: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(
    jax.jit, static_argnames=("block_x", "block_y", "interpret")
)
def fused_gaussian_rowsum(
    x: jax.Array,
    y: jax.Array,
    w_y: jax.Array,
    gamma_1: jax.Array,
    gamma_2: jax.Array,
    *,
    block_x: int = 256,
    block_y: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """out[i] = sum_j (K_g1 + K_g2)(mean-sq-dist(x_i, y_j)) * w_y[j].

    `interpret=None` auto-selects: compiled on TPU, interpreter elsewhere
    (so CPU tests exercise the identical kernel body).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_x, d = x.shape
    n_y = y.shape[0]
    # bx is a sublane dim (multiple of 8); by doubles as the lane dim of the
    # weight block (multiple of 128).
    bx = min(block_x, ((n_x + 7) // 8) * 8)
    by = min(block_y, ((n_y + 127) // 128) * 128)
    gx = pl.cdiv(n_x, bx)
    gy = pl.cdiv(n_y, by)
    d_pad = max(128, ((d + 127) // 128) * 128)

    # Shared centering offset: leaves pairwise differences unchanged but
    # conditions the f32 Gram expansion (same trick as ops.pairwise).
    center = jax.lax.stop_gradient(
        0.5 * (jnp.mean(x, axis=0) + jnp.mean(y, axis=0))
    ).astype(jnp.float32)
    xp = _pad_to(_pad_to(x.astype(jnp.float32) - center, gx * bx, 0), d_pad, 1)
    yp = _pad_to(_pad_to(y.astype(jnp.float32) - center, gy * by, 0), d_pad, 1)
    wp = _pad_to(w_y.astype(jnp.float32).reshape(1, -1), gy * by, 1)

    out = pl.pallas_call(
        _rowsum_kernel,
        grid=(gx, gy),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bx, d_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((by, d_pad), lambda i, j: (j, 0)),
            pl.BlockSpec((1, by), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bx, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((gx * bx, 1), jnp.float32),
        interpret=interpret,
    )(
        jnp.reshape(gamma_1.astype(jnp.float32), (1, 1)),
        jnp.reshape(gamma_2.astype(jnp.float32), (1, 1)),
        jnp.full((1, 1), 1.0 / d, jnp.float32),
        xp,
        yp,
        wp,
    )
    return out[:n_x, 0]


def gmmil_witness_reward(
    sa: jax.Array,
    esa: jax.Array,
    w: jax.Array,
    ew: jax.Array,
    gamma_1: jax.Array,
    gamma_2: jax.Array,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Full GMMIL reward via the fused kernel (reference models.py:196-201):
    w_i * [rowsum_expert(i) - rowsum_self(i)] with normalised weights and
    both bandwidths."""
    w_norm = w / w.sum()
    ew_norm = ew / ew.sum()
    sim = fused_gaussian_rowsum(sa, esa, ew_norm, gamma_1, gamma_2, interpret=interpret)
    self_sim = fused_gaussian_rowsum(sa, sa, w_norm, gamma_1, gamma_2, interpret=interpret)
    return w_norm * (sim - self_sim)
