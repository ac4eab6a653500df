"""Device-mesh sharding of COO rating shards and factor state.

The reference is single-process CPU with no parallelism of any kind
(sequential Python loops, `/root/reference/src/models/gaussian_mf_cavi.py:121,152`).
The TPU framework's scaling axis is the COO edge dimension: rating triples
shard contiguously across a 1-D ``data`` mesh axis.  Because both edge
copies are sorted, each device holds a contiguous range of users (resp.
items), segment ids stay sorted within every shard, and each segment is
split across at most two neighboring devices — so the partial per-row
segment sums that GSPMD builds combine with one all-reduce over ICI.

Factor states are replicated (they are small: rows x K); the row-wise
state updates (batched K x K solves, gamma ratio updates) are sharded
over rows via sharding constraints so each chip solves its slice.

Padding: ``PAD_MULTIPLE`` (1024) keeps nnz_padded divisible by any
power-of-two device count <= 1024, so contiguous equal shards always
exist.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pmf_tpu.data.coo import EvalSet, RatingsCOO

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(dp: int, tp: int, devices=None) -> Mesh:
    """A (dp, tp) mesh with axes ("data", "model") for hybrid-parallel
    training: edges shard over "data", factor-state rows over "model"
    (`fit(mesh=, state_sharding="rows")` detects the second axis and runs
    the ring sweeps with per-block edge-partial psums over "data")."""
    if devices is None:
        devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[: dp * tp]).reshape(dp, tp),
        (DATA_AXIS, MODEL_AXIS),
    )


def _edge_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ratings(data: RatingsCOO, mesh: Mesh) -> RatingsCOO:
    """Place edge arrays sharded on the data axis, counts replicated."""
    edge = _edge_sharding(mesh)
    rep = _replicated(mesh)
    n_dev = mesh.devices.size
    if data.nnz_padded % n_dev != 0:
        raise ValueError(
            f"nnz_padded={data.nnz_padded} not divisible by {n_dev} devices"
        )
    put = jax.device_put
    return dataclasses.replace(
        data,
        u_by_u=put(data.u_by_u, edge),
        i_by_u=put(data.i_by_u, edge),
        x_by_u=put(data.x_by_u, edge),
        u_by_i=put(data.u_by_i, edge),
        i_by_i=put(data.i_by_i, edge),
        x_by_i=put(data.x_by_i, edge),
        user_counts=put(data.user_counts, rep),
        item_counts=put(data.item_counts, rep),
    )


def shard_eval_set(ev: EvalSet, mesh: Mesh) -> EvalSet:
    """Shard evaluation rows on the data axis; class values replicated."""
    edge = _edge_sharding(mesh)
    rep = _replicated(mesh)
    put = jax.device_put
    return dataclasses.replace(
        ev,
        u=put(ev.u, edge),
        i=put(ev.i, edge),
        x=put(ev.x, edge),
        real=put(ev.real, edge),
        valid=put(ev.valid, edge),
        class_id=put(ev.class_id, edge),
        class_value=put(ev.class_value, rep),
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree of arrays across the mesh."""
    rep = _replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), tree)


def shard_state_rows(state: dict, mesh: Mesh) -> dict:
    """Shard factor-state arrays over their leading (row) dimension — the
    embedding-style model-parallel axis (SURVEY.md §2e TP): user/item rows
    split across devices, K kept whole.  Arrays whose leading dimension is
    not divisible by the mesh size stay replicated."""
    n_dev = mesh.devices.size
    row = NamedSharding(mesh, P(DATA_AXIS))
    rep = _replicated(mesh)

    def place(a):
        if a.ndim >= 1 and a.shape[0] % n_dev == 0:
            return jax.device_put(a, row)
        return jax.device_put(a, rep)

    return {k: place(v) for k, v in state.items()}
