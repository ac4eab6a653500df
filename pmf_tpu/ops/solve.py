"""Batched K x K positive-definite solves for the Gaussian CAVI blocks.

The reference inverts one K x K precision matrix per user/item inside a
Python loop (`/root/reference/src/models/gaussian_mf_cavi.py:139-144`).
Here all rows solve at once as a single batched Cholesky — one XLA op over
a (rows, K, K) tensor, which is how the TPU wants this shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batched_psd_solve(mats: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve ``mats[r] @ x[r] = rhs[r]`` for every row r.

    mats: (R, K, K) symmetric positive-definite; rhs: (R, K) -> (R, K).
    """
    chol = jnp.linalg.cholesky(mats)
    return jax.scipy.linalg.cho_solve((chol, True), rhs[..., None])[..., 0]


def batched_psd_inverse(mats: jax.Array) -> jax.Array:
    """Invert a batch of symmetric positive-definite matrices via Cholesky.

    mats: (R, K, K) -> (R, K, K).
    """
    chol = jnp.linalg.cholesky(mats)
    eye = jnp.broadcast_to(jnp.eye(mats.shape[-1], dtype=mats.dtype), mats.shape)
    return jax.scipy.linalg.cho_solve((chol, True), eye)


def batched_psd_inverse_fast(mats: jax.Array) -> jax.Array:
    """Invert a large batch of SMALL symmetric positive-definite matrices
    by Gauss-Jordan elimination unrolled over the K pivots, every step
    vectorized over the batch.

    XLA's batched ``cholesky`` + triangular solves lower to sequential
    While loops on TPU (~0.4 s for (162k, 20, 20) on v5e — measured), while
    this unrolled form is pure fused elementwise work over (R, K, 2K)
    (~2RK^3 VPU flops, bandwidth-bound): >10x faster at CAVI scales.
    No pivoting — valid for the positive-definite precision matrices of the
    Gaussian CAVI blocks (diagonal >= 1/eta^2 > 0 throughout elimination).

    mats: (R, K, K) -> (R, K, K).
    """
    R, K, _ = mats.shape
    dtype = mats.dtype
    eye = jnp.broadcast_to(jnp.eye(K, dtype=dtype), (R, K, K))
    aug = jnp.concatenate([mats, eye], axis=2)  # (R, K, 2K)
    for k in range(K):
        row_k = aug[:, k, :] / aug[:, k, k][:, None]  # (R, 2K)
        col = aug[:, :, k]  # (R, K)
        aug = aug - col[:, :, None] * row_k[:, None, :]
        aug = aug.at[:, k, :].set(row_k)
    return aug[:, :, K:]
