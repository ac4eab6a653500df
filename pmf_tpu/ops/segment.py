"""Sharded segment-reduction primitives.

Every "sum over the observation set Omega" in the reference's CAVI updates
(per-user/per-item Python loops, e.g.
`/root/reference/src/models/poisson_mf_cavi.py:135-164`) compiles here to a
single sorted segment-sum over flat COO edges.  Sentinel segment ids equal
to ``num_segments`` (padding) fall out of range and are dropped by XLA's
scatter-add, so padded edges contribute zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sorted_segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Segment sum with sorted ids; out-of-range (padding) ids are dropped."""
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=True,
    )


def gather_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather factor rows by edge id.  Out-of-range (padding) ids clip to the
    last row; callers rely on downstream segment-sum dropping those edges."""
    return jnp.take(table, ids, axis=0, indices_are_sorted=False, mode="clip")


def edge_dot(a_rows: jax.Array, b_rows: jax.Array) -> jax.Array:
    """Per-edge inner product <a_e, b_e> over the factor axis: (nnz, K) x
    (nnz, K) -> (nnz,).  This is the reference's ``beta_subset @ theta_u``
    rate estimate, batched over all rows at once."""
    return jnp.sum(a_rows * b_rows, axis=-1)
