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
