"""Padded dual-sorted COO rating shards — the framework's core data layout.

The reference keeps ragged per-user / per-item observation lists built by a
Python loop (`/root/reference/src/models/gaussian_mf_cavi.py:59-76` and
siblings) and iterates rows one at a time.  On TPU the same information is
kept as two flat, statically-shaped copies of the (user, item, rating)
triples — one sorted by user, one sorted by item — padded to a lane-friendly
multiple with out-of-range sentinel ids.  Every "sum over Omega_i" in a CAVI
update then compiles to a single sorted `segment_sum`, and every factor-row
gather is a single XLA gather.  Out-of-range sentinel ids are dropped by
XLA's scatter (segment_sum) and clipped by gather, so padding contributes
exactly zero to every sufficient statistic (padded ratings are 0 and all
per-edge terms are additionally masked where it matters).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PAD_MULTIPLE = 1024  # pad nnz to a multiple of this (8 sublanes x 128 lanes)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "u_by_u",
        "i_by_u",
        "x_by_u",
        "u_by_i",
        "i_by_i",
        "x_by_i",
        "user_counts",
        "item_counts",
    ],
    meta_fields=["n_users", "n_items", "nnz", "nnz_padded"],
)
@dataclasses.dataclass(frozen=True)
class RatingsCOO:
    """Training ratings in padded dual-sorted COO layout.

    ``*_by_u`` arrays are sorted by user id (stable), ``*_by_i`` by item id.
    Both are padded to ``nnz_padded`` with sentinel ids ``u = n_users``,
    ``i = n_items`` and rating 0.  ``user_counts`` / ``item_counts`` hold
    the number of observed ratings per row (float32, for precision terms
    and has-observations masks).
    """

    u_by_u: jax.Array  # (nnz_padded,) int32
    i_by_u: jax.Array  # (nnz_padded,) int32
    x_by_u: jax.Array  # (nnz_padded,) float32
    u_by_i: jax.Array  # (nnz_padded,) int32
    i_by_i: jax.Array  # (nnz_padded,) int32
    x_by_i: jax.Array  # (nnz_padded,) float32
    user_counts: jax.Array  # (n_users,) float32
    item_counts: jax.Array  # (n_items,) float32
    n_users: int
    n_items: int
    nnz: int
    nnz_padded: int


def build_ratings(
    u: np.ndarray,
    i: np.ndarray,
    x: np.ndarray,
    n_users: int | None = None,
    n_items: int | None = None,
    pad_multiple: int = PAD_MULTIPLE,
    dtype=np.float32,
) -> RatingsCOO:
    """Build a :class:`RatingsCOO` from raw triples (host-side).

    Dimensions default to ``max(id) + 1`` like the reference's
    ``_infer_dimensions`` (`/root/reference/src/models/hpf_cavi.py:60-64`).
    """
    u = np.asarray(u, dtype=np.int32)
    i = np.asarray(i, dtype=np.int32)
    x = np.asarray(x, dtype=dtype)
    nnz = int(u.shape[0])
    if n_users is None:
        n_users = int(u.max()) + 1
    if n_items is None:
        n_items = int(i.max()) + 1

    nnz_padded = max(_round_up(nnz, pad_multiple), pad_multiple)

    def pad(arr, sentinel):
        out = np.full((nnz_padded,), sentinel, dtype=arr.dtype)
        out[:nnz] = arr
        return out

    # Dual stable sorts + per-row counts through the native radix runtime
    # (numpy argsort fallback inside) — the host-side hot path at 25M+ edges.
    from pmf_tpu.data.native import radix_argsort

    order_u, user_counts64 = radix_argsort(u, n_users)
    order_i, item_counts64 = radix_argsort(i, n_items)
    user_counts = user_counts64.astype(dtype)
    item_counts = item_counts64.astype(dtype)

    return RatingsCOO(
        u_by_u=jnp.asarray(pad(u[order_u], n_users)),
        i_by_u=jnp.asarray(pad(i[order_u], n_items)),
        x_by_u=jnp.asarray(pad(x[order_u], 0.0)),
        u_by_i=jnp.asarray(pad(u[order_i], n_users)),
        i_by_i=jnp.asarray(pad(i[order_i], n_items)),
        x_by_i=jnp.asarray(pad(x[order_i], 0.0)),
        user_counts=jnp.asarray(user_counts),
        item_counts=jnp.asarray(item_counts),
        n_users=int(n_users),
        n_items=int(n_items),
        nnz=nnz,
        nnz_padded=nnz_padded,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["u", "i", "x", "real", "valid", "class_id", "class_value"],
    meta_fields=["n_rows", "n_rows_padded", "n_classes"],
)
@dataclasses.dataclass(frozen=True)
class EvalSet:
    """A padded evaluation split with precomputed rating-class structure.

    ``real`` marks non-padding rows; ``valid`` additionally requires ids in
    model range.  The Poisson/HPF reference models evaluate over ALL rows
    with out-of-range pairs predicted as 0
    (`/root/reference/src/models/poisson_mf_cavi.py:221-246`), while the
    Gaussian models drop out-of-range rows entirely
    (`/root/reference/src/models/gaussian_mf_cavi.py:226-240`) — the two
    masks support both semantics.  ``class_id`` maps each row to the index
    of its true-rating class among the unique values present in the split,
    so macro-MAE compiles to one segment mean per class
    (`/root/reference/src/evaluation/metrics.py:37-51`).
    """

    u: jax.Array  # (n_rows_padded,) int32
    i: jax.Array  # (n_rows_padded,) int32
    x: jax.Array  # (n_rows_padded,) float32
    real: jax.Array  # (n_rows_padded,) bool — non-padding row
    valid: jax.Array  # (n_rows_padded,) bool — real AND ids in model range
    class_id: jax.Array  # (n_rows_padded,) int32, n_classes for padding
    class_value: jax.Array  # (n_classes,) float32 — unique true ratings
    n_rows: int
    n_rows_padded: int
    n_classes: int


def build_eval_set(
    u: np.ndarray,
    i: np.ndarray,
    x: np.ndarray,
    n_users: int,
    n_items: int,
    class_values: np.ndarray | None = None,
    pad_multiple: int = PAD_MULTIPLE,
    dtype=np.float32,
) -> EvalSet:
    """Build an :class:`EvalSet`; class structure from the split's own
    unique true-rating values (matching ``np.unique(y_true)`` in the
    reference's ``macro_mae``)."""
    u = np.asarray(u, dtype=np.int32)
    i = np.asarray(i, dtype=np.int32)
    x = np.asarray(x, dtype=dtype)
    n_rows = int(u.shape[0])
    n_rows_padded = max(_round_up(n_rows, pad_multiple), pad_multiple)

    if class_values is None:
        class_values = np.unique(x)
    class_values = np.asarray(class_values, dtype=dtype)
    n_classes = int(class_values.shape[0])
    class_id = np.searchsorted(class_values, x).astype(np.int32)

    valid = (u < n_users) & (i < n_items)
    real = np.ones(n_rows, dtype=bool)

    def pad(arr, sentinel):
        out = np.full((n_rows_padded,), sentinel, dtype=arr.dtype)
        out[:n_rows] = arr
        return out

    return EvalSet(
        u=jnp.asarray(pad(u, n_users)),
        i=jnp.asarray(pad(i, n_items)),
        x=jnp.asarray(pad(x, 0.0)),
        real=jnp.asarray(pad(real, False)),
        valid=jnp.asarray(pad(valid, False)),
        class_id=jnp.asarray(pad(class_id, n_classes)),
        class_value=jnp.asarray(class_values),
        n_rows=n_rows,
        n_rows_padded=n_rows_padded,
        n_classes=n_classes,
    )
