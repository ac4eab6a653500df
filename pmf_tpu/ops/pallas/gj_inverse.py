"""Pallas batched Gauss-Jordan inverse for small PD matrices.

The Gaussian CAVI blocks invert one K x K precision matrix per user/item
row (K ~ 10-60, rows ~ 1e5-1e7).  XLA's batched Cholesky lowers to
sequential While loops on TPU (~0.4 s at (162k, 20, 20)); the unrolled
XLA Gauss-Jordan (`ops.solve.batched_psd_inverse_fast`) re-materializes
the (R, K, 2K) augmented tensor in HBM once per pivot (~0.06 s).  This
kernel keeps a 128-row batch resident in VMEM in a lane-major (K, K, R)
layout and runs all K pivots on-chip: HBM traffic is one read + one write
of the batch (~2 ms at the same shape).

No pivoting — valid for positive-definite matrices (every elimination
step keeps the trailing submatrix PD, so pivots stay positive).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gj_kernel(mat_ref, out_ref, *, k: int):
    a = mat_ref[...]  # (K, K, R) lane-major
    r = a.shape[2]
    inv = jnp.broadcast_to(
        jnp.eye(k, dtype=a.dtype)[:, :, None], (k, k, r)
    )
    # Row selection by iota mask — Mosaic has no scatter, and the pivot
    # index is static (unrolled), so a where-blend compiles to pure VPU ops.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1, r), 0)
    for p in range(k):
        pivot = a[p, p, :]  # (R,)
        arow = a[p] / pivot  # (K, R)
        irow = inv[p] / pivot
        acol = a[:, p, :]  # (K, R)
        is_p = row_ids == p  # (K, 1, R)
        a = jnp.where(is_p, arow[None, :, :],
                      a - acol[:, None, :] * arow[None, :, :])
        inv = jnp.where(is_p, irow[None, :, :],
                        inv - acol[:, None, :] * irow[None, :, :])
    out_ref[...] = inv


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_psd_inverse_pallas(mats: jax.Array, interpret: bool = False) -> jax.Array:
    """Invert (R, K, K) positive-definite matrices; returns (R, K, K)."""
    R, K, _ = mats.shape
    RB = 128
    n_pad = (-R) % RB
    if n_pad:
        # Pad with identity matrices so padded lanes run a valid (trivial)
        # elimination instead of dividing by zero.
        eye = jnp.broadcast_to(jnp.eye(K, dtype=mats.dtype), (n_pad, K, K))
        mats = jnp.concatenate([mats, eye], axis=0)
    lanes = jnp.transpose(mats, (1, 2, 0)).astype(jnp.float32)  # (K, K, R')

    out = pl.pallas_call(
        functools.partial(_gj_kernel, k=K),
        out_shape=jax.ShapeDtypeStruct(lanes.shape, jnp.float32),
        grid=(lanes.shape[2] // RB,),
        in_specs=[pl.BlockSpec((K, K, RB), lambda r: (0, 0, r))],
        out_specs=pl.BlockSpec((K, K, RB), lambda r: (0, 0, r)),
        interpret=interpret,
    )(lanes)
    inv = jnp.transpose(out, (2, 0, 1)).astype(mats.dtype)
    return inv[:R]
