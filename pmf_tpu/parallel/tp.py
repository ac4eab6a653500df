"""Tensor-parallel training: row-sharded factor state with ring sweeps.

The reference keeps every factor matrix whole in host memory
(`/root/reference/src/models/gaussian_mf_cavi.py:51-57`); the DP mode here
replicates state per chip.  For state that exceeds one chip's HBM — the
SURVEY §2e TP motivation, concretely the Gaussian full-covariance
``V_theta``/``V_beta`` at (rows, K, K) — this module shards state rows
across the mesh and keeps them sharded through the entire fit.

Design (TPU-native, not a translation):

* **Row-aligned D x D bucketed COO.**  Each device owns a contiguous row
  range of users AND of items (``users_per`` / ``items_per`` rows).  The
  edges are laid out twice as ``(D, D, max_e)`` tensors: axis 0 = the
  device that owns the edge's SELF row (user for the theta/b_user blocks,
  item for beta/b_item), axis 1 = the ring step at which the OTHER side's
  owning shard visits.  Bucket ``(d, s)`` holds the edges of device ``d``
  whose other-side row lives on device ``(d + s) % D``.  Padding uses a
  trash segment row (id ``rows_per``) so no masking is needed.

* **Ring visits instead of all-gathers.**  A CAVI factor block needs, per
  edge, the other side's sufficient-statistic rows (E[bb^T], means,
  biases).  Gathering those through GSPMD would all-gather the full other
  table to every chip — exactly the HBM blow-up TP is meant to avoid.
  Instead each block runs a `lax.scan` of D steps inside `shard_map`:
  the visiting tables rotate over ICI with `lax.ppermute` (bandwidth-
  optimal ring, like distributed matmul), each step consumes the one
  bucket whose rows are resident, and per-device peak memory stays at
  O((rows/D) * K^2) regardless of total model size.

* Per-edge math, update algebra, and keep-stale-when-empty semantics are
  shared with the flat sweeps (`pmf_tpu.models.gaussian_mf._factor_block`
  etc.), so the fixed point and per-iteration trajectory match the
  single-device engines to summation-order rounding (tested at 1e-10 in
  f64, `tests/test_tp_fit.py`).

* **Hybrid DP x TP** on a 2-D ("data", "model") mesh
  (`pmf_tpu.parallel.make_mesh_2d(dp, tp)`): state rows shard over
  "model" (ring length = tp), each bucket's edges round-robin split over
  "data" (`_dp_split`), and every ring pass's partial segment sums psum
  over the data axis before the row updates — composing edge-parallel
  throughput scaling with row-sharded state memory scaling, the standard
  2-D sharding recipe for embedding-style models.  The same sweep code
  serves both: `_mesh_info` maps mesh axes to ring/reduce roles.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pmf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _mesh_info(mesh) -> dict:
    """Axis roles for TP sweeps.  1-D ("data",) mesh: the ring rotates
    over "data" (pure TP, the historical mode).  2-D ("data", "model")
    mesh: hybrid parallelism — state rows ring-rotate over "model" while
    each bucket's edges split over "data", so each ring step's partial
    segment sums psum over the data axis (DP x TP)."""
    names = mesh.axis_names
    if names == (DATA_AXIS,):
        return dict(ring=DATA_AXIS, dp=None, row=P(DATA_AXIS),
                    bucket=P(DATA_AXIS))
    if names == (DATA_AXIS, MODEL_AXIS):
        return dict(ring=MODEL_AXIS, dp=DATA_AXIS, row=P(MODEL_AXIS),
                    bucket=P(MODEL_AXIS, DATA_AXIS))
    raise ValueError(
        f"TP sweeps support ('data',) or ('data', 'model') meshes, got {names}"
    )


def tp_degree(mesh) -> int:
    """Ring length: the number of row shards."""
    if MODEL_AXIS in mesh.axis_names:
        return mesh.shape[MODEL_AXIS]
    return mesh.devices.size


def dp_degree(mesh) -> int:
    """Edge-parallel replicas per row shard (1 on a 1-D mesh)."""
    if MODEL_AXIS in mesh.axis_names:
        return mesh.shape[DATA_AXIS]
    return 1


def describe_tp(mesh) -> str:
    """Human-readable mesh role string for the models' verbose prints."""
    dp = dp_degree(mesh)
    return (f"(TP ring {tp_degree(mesh)}"
            + (f" x DP {dp}" if dp > 1 else "") + ")")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "u_loc_by_u", "i_loc_by_u", "x_by_u",
        "i_loc_by_i", "u_loc_by_i", "x_by_i",
        "user_counts", "item_counts",
    ],
    meta_fields=["n_users", "n_items", "n_users_pad", "n_items_pad",
                 "users_per", "items_per", "n_devices", "nnz", "n_dp"],
)
@dataclasses.dataclass(frozen=True)
class TPLayout:
    """Row-aligned bucketed COO for ring sweeps (see module docstring).

    ``*_by_u``: (D, D, max_eu) — [device (user shard), ring step, edge];
    with ``n_dp > 1`` (hybrid DP x TP) the arrays gain a DP axis:
    (D, n_dp, D, max_eu / n_dp) — each bucket's edges round-robin split
    over the data-parallel replicas (strided split keeps self-sorted
    order within every part).
    ``u_loc``/``i_loc`` are LOCAL row ids: self ids in [0, rows_per]
    (rows_per = trash row), other ids in [0, other_per) relative to the
    visiting shard.  ``*_by_i`` mirrors with items as self.
    ``user_counts``/``item_counts``: (n_pad,) observation counts."""

    u_loc_by_u: jax.Array
    i_loc_by_u: jax.Array
    x_by_u: jax.Array
    i_loc_by_i: jax.Array
    u_loc_by_i: jax.Array
    x_by_i: jax.Array
    user_counts: jax.Array
    item_counts: jax.Array
    n_users: int
    n_items: int
    n_users_pad: int
    n_items_pad: int
    users_per: int
    items_per: int
    n_devices: int
    nnz: int
    n_dp: int = 1


def _bucketize(self_ids, other_ids, x, self_per, other_per, D, dtype):
    """Build one (D, D, max_e) bucketed direction (self-sorted)."""
    d = self_ids // self_per  # owning device
    v = other_ids // other_per  # other-side shard
    s = (v - d) % D  # ring step at which shard v visits device d
    key = d * D + s
    order = np.lexsort((self_ids, key))
    self_ids, other_ids, x = self_ids[order], other_ids[order], x[order]
    key = key[order]
    sizes = np.bincount(key, minlength=D * D)
    max_e = max(int(sizes.max()), 1)

    self_loc = np.full((D * D, max_e), self_per, dtype=np.int32)
    other_loc = np.zeros((D * D, max_e), dtype=np.int32)
    xs = np.zeros((D * D, max_e), dtype=dtype)
    starts = np.concatenate([[0], np.cumsum(sizes)])
    for b in range(D * D):
        lo, hi = starts[b], starts[b + 1]
        n = hi - lo
        if n == 0:
            continue
        self_loc[b, :n] = self_ids[lo:hi] - (b // D) * self_per
        other_loc[b, :n] = other_ids[lo:hi] % other_per
        xs[b, :n] = x[lo:hi]
    return (
        self_loc.reshape(D, D, max_e),
        other_loc.reshape(D, D, max_e),
        xs.reshape(D, D, max_e),
    )


def _dp_split(a: np.ndarray, dp: int, pad_val) -> np.ndarray:
    """(D, D, m) -> (D, dp, D, ceil(m/dp)): round-robin edge split over the
    data-parallel replicas.  Strided slices of a self-sorted bucket stay
    self-sorted, preserving the segment-sum sortedness invariant."""
    D, D2, m = a.shape
    m_dp = (m + dp - 1) // dp
    out = np.full((D, dp, D2, m_dp), pad_val, dtype=a.dtype)
    for p in range(dp):
        part = a[:, :, p::dp]
        out[:, p, :, : part.shape[2]] = part
    return out


def build_tp_layout(u, i, x, n_users: int, n_items: int, n_devices: int,
                    dtype=np.float32, dp: int = 1) -> TPLayout:
    """Host-side build of the bucketed dual layout.  ``dp > 1`` builds the
    hybrid DP x TP variant (see `TPLayout`)."""
    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    x = np.asarray(x, dtype=dtype)
    D = int(n_devices)
    users_per = _round_up(n_users, D) // D
    items_per = _round_up(n_items, D) // D
    n_users_pad, n_items_pad = users_per * D, items_per * D

    ul_u, il_u, x_u = _bucketize(u, i, x, users_per, items_per, D, dtype)
    il_i, ul_i, x_i = _bucketize(i, u, x, items_per, users_per, D, dtype)
    if dp > 1:
        ul_u = _dp_split(ul_u, dp, users_per)
        il_u = _dp_split(il_u, dp, 0)
        x_u = _dp_split(x_u, dp, 0)
        il_i = _dp_split(il_i, dp, items_per)
        ul_i = _dp_split(ul_i, dp, 0)
        x_i = _dp_split(x_i, dp, 0)

    uc = np.zeros(n_users_pad, dtype=np.float32)
    ic = np.zeros(n_items_pad, dtype=np.float32)
    np.add.at(uc, u, 1.0)
    np.add.at(ic, i, 1.0)

    # Arrays stay HOST-side (numpy) here; `place_tp` device_puts each
    # shard directly to its device — the full layout never materializes
    # on a single accelerator (TP's whole point is beyond-one-chip state).
    return TPLayout(
        u_loc_by_u=ul_u, i_loc_by_u=il_u,
        x_by_u=x_u,
        i_loc_by_i=il_i, u_loc_by_i=ul_i,
        x_by_i=x_i,
        user_counts=uc, item_counts=ic,
        n_users=n_users, n_items=n_items,
        n_users_pad=n_users_pad, n_items_pad=n_items_pad,
        users_per=users_per, items_per=items_per,
        n_devices=D, nnz=int(u.shape[0]), n_dp=int(dp),
    )


def host_staging():
    """Context manager staging array creation on the host CPU backend, so
    the padded FULL state from `init_state`/`pad_state_rows` never
    materializes on one accelerator before `place_tp` shards it (TP
    exists precisely for state larger than one chip's HBM).  No-op when
    no CPU backend is registered."""
    import contextlib

    try:
        dev = jax.local_devices(backend="cpu")[0]
    except Exception:
        return contextlib.nullcontext()
    return jax.default_device(dev)


@dataclasses.dataclass(frozen=True)
class BalancePerms:
    """Count-balanced GLOBAL row permutations for TP ownership.

    Contiguous row->device ownership is pathological when row ids
    correlate with popularity (ML-25M-like data sorted by count puts
    every hot user on device 0): bucket sizes then differ wildly, and
    both rings pad every bucket to the global max — measured 53.7%
    dummy-segment padding at D=2 on the 25M-edge Zipf shape
    (reports/tp_scaling/TP_SCALING_r04, naive row).  Dealing rows to
    devices ROUND-ROBIN IN DESCENDING COUNT ORDER balances per-device
    edge totals for ANY popularity distribution (each device receives
    every D-th rank), while staying a static bijection so state stays
    row-sharded: new_id = (rank % D) * per + rank // D.

    ``u_old_of_new[n]`` = original padded user row stored at balanced
    row n; ``u_new_of_old`` is the inverse (likewise items).  The perms
    are a pure function of (ids, n_pad, D), so checkpoint resume
    re-derives them; checkpoints themselves store BALANCED padded rows
    (pre-balance round-3 TP checkpoints are not compatible).
    """

    u_old_of_new: np.ndarray
    u_new_of_old: np.ndarray
    i_old_of_new: np.ndarray
    i_new_of_old: np.ndarray


def _balance_one(ids: np.ndarray, n_pad: int, D: int):
    per = n_pad // D
    counts = np.bincount(ids, minlength=n_pad)
    order = np.argsort(-counts, kind="stable").astype(np.int64)  # rank -> old
    rank = np.arange(n_pad, dtype=np.int64)
    new_ids = (rank % D) * per + rank // D                       # rank -> new
    new_of_old = np.empty(n_pad, np.int32)
    old_of_new = np.empty(n_pad, np.int32)
    new_of_old[order] = new_ids
    old_of_new[new_ids] = order
    return old_of_new, new_of_old


def balance_perms(u, i, n_users_pad: int, n_items_pad: int,
                  D: int) -> BalancePerms:
    """Derive the count-balanced global row permutations from the train
    edges (see :class:`BalancePerms`)."""
    uo, un = _balance_one(np.asarray(u), n_users_pad, D)
    io_, in_ = _balance_one(np.asarray(i), n_items_pad, D)
    return BalancePerms(u_old_of_new=uo, u_new_of_old=un,
                        i_old_of_new=io_, i_new_of_old=in_)


def permute_state_rows(state: dict, axis_of: dict, u_perm, i_perm) -> dict:
    """Row-gather every state array by the given permutation (old->new
    with ``*_old_of_new``; pass ``*_new_of_old`` to invert).  Shapes are
    already padded, so the perms are total."""
    return {k: v[u_perm if axis_of[k] == "u" else i_perm]
            for k, v in state.items()}


def remap_eval(ev, u_new_of_old, i_new_of_old):
    """Rewrite an EvalSet's row ids into the balanced row space (the
    sharded eval gathers rows from the balanced, row-sharded state).

    Ids at or beyond the padded row count (unseen eval users/items —
    legal: the reference predicts 0 for them, enforced by ``valid``)
    pass through unchanged; they stay out of range and stay masked."""

    def one(ids, perm):
        ids = np.asarray(ids)
        perm = np.asarray(perm)
        safe = np.minimum(ids, len(perm) - 1)
        return np.where(ids < len(perm), perm[safe], ids).astype(np.int32)

    return dataclasses.replace(
        ev,
        u=one(ev.u, u_new_of_old),
        i=one(ev.i, i_new_of_old),
    )


def pad_state_rows(state: dict, axis_of: dict, n_users_pad: int,
                   n_items_pad: int, ones_keys=()) -> dict:
    """Pad each state array's leading (row) dimension to the mesh-aligned
    size.  ``axis_of[key]`` is "u" or "i".  Keys in ``ones_keys`` pad with
    1.0 (rate denominators — zero padding would make the padded rows'
    expectations 0/0)."""
    out = {}
    for k, v in state.items():
        target = n_users_pad if axis_of[k] == "u" else n_items_pad
        pad = target - v.shape[0]
        if pad:
            fill = jnp.ones if k in ones_keys else jnp.zeros
            v = jnp.concatenate(
                [v, fill((pad,) + v.shape[1:], v.dtype)], axis=0)
        out[k] = v
    return out


def slice_state_rows(state: dict, axis_of: dict, n_users: int,
                     n_items: int) -> dict:
    return {k: v[: (n_users if axis_of[k] == "u" else n_items)]
            for k, v in state.items()}


def place_tp(layout: TPLayout, state: dict, mesh) -> tuple:
    """Device placement: edge buckets shard on axis 0 (one row shard's
    buckets per chip; hybrid meshes also shard the DP axis), counts and
    state rows shard on their leading row axis (replicated over "data"
    on a hybrid mesh)."""
    info = _mesh_info(mesh)
    row = NamedSharding(mesh, info["row"])
    bucket = NamedSharding(mesh, info["bucket"])
    put = jax.device_put
    layout = dataclasses.replace(
        layout,
        u_loc_by_u=put(layout.u_loc_by_u, bucket),
        i_loc_by_u=put(layout.i_loc_by_u, bucket),
        x_by_u=put(layout.x_by_u, bucket),
        i_loc_by_i=put(layout.i_loc_by_i, bucket),
        u_loc_by_i=put(layout.u_loc_by_i, bucket),
        x_by_i=put(layout.x_by_i, bucket),
        user_counts=put(layout.user_counts, row),
        item_counts=put(layout.item_counts, row),
    )
    state = {k: put(v, row) for k, v in state.items()}
    return layout, state


def _ring(tables: tuple, buckets: tuple, accs: tuple, body, D: int,
          axis: str = DATA_AXIS, reduce_axis: str | None = None):
    """Run D ring steps: consume bucket s against the visiting tables,
    then rotate the tables one hop (device d receives from d+1, so at
    step s it holds shard (d+s) % D — matching the bucket build).  The
    final step consumes WITHOUT rotating — the D-th rotation's output
    would be discarded, and on a real ring that is a full extra table
    hop over ICI per pass.  With ``reduce_axis`` (hybrid DP x TP), each
    replica consumed only its edge split, so the accumulators psum over
    that axis before returning."""
    perm = [(j, (j - 1) % D) for j in range(D)]

    def step(carry, xs):
        tabs, accs = carry
        accs = body(tabs, xs, accs)
        tabs = tuple(
            jax.lax.ppermute(t, axis, perm) for t in tabs
        )
        return (tabs, accs), None

    if D > 1:
        head = jax.tree_util.tree_map(lambda b: b[: D - 1], buckets)
        (tables, accs), _ = jax.lax.scan(step, (tables, accs), head)
    last = jax.tree_util.tree_map(lambda b: b[D - 1], buckets)
    accs = body(tables, last, accs)
    if reduce_axis is not None:
        accs = tuple(jax.lax.psum(a, reduce_axis) for a in accs)
    return accs


def _segsum(data, ids, n):
    return jax.ops.segment_sum(data, ids, num_segments=n,
                               indices_are_sorted=True)


def _pad_row(a):
    """Append one zero trash row along axis 0."""
    return jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)


def _tp_sweep_gaussian_impl(
    state: dict,
    layout: TPLayout,
    sigma2,
    eta_theta2,
    eta_beta2,
    eta_bias2,
    *,
    use_bias: bool,
    covariance: str,
    mesh,
):
    D = layout.n_devices
    info = _mesh_info(mesh)
    ring_ax, dp_ax = info["ring"], info["dp"]
    row = info["row"]
    rep = P()
    state_specs = {k: row for k in state}

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, (info["bucket"],) * 6, row, row,
                  rep, rep, rep, rep),
        out_specs=state_specs,
        check_vma=False,
    )
    def _sweep(st, buckets, counts_u, counts_i, s2, et2, eb2, ebias2):
        ul_u, il_u, x_u, il_i, ul_i, x_i = (
            b.reshape(b.shape[-2], b.shape[-1]) for b in buckets)
        users_per, items_per = counts_u.shape[0], counts_i.shape[0]
        m_t, V_t = st["m_theta"], st["V_theta"]
        m_b, V_b = st["m_beta"], st["V_beta"]
        b_u, b_i = st["b_user"], st["b_item"]
        dt = m_t.dtype
        K = m_t.shape[-1]
        full = covariance == "full"

        def factor_block(m_self, V_self, m_other, V_other, b_self, b_other,
                         self_loc, other_loc, xs, counts, eta2, n_self):
            b_self_pad = _pad_row(b_self) if use_bias else None
            m_self_pad = _pad_row(m_self)

            if full:
                A = (V_other + m_other[:, :, None] * m_other[:, None, :]
                     ).reshape(-1, K * K)
                tables = (A, m_other) + ((b_other,) if use_bias else ())

                def body(tabs, xs_s, accs):
                    A_vis, m_vis = tabs[0], tabs[1]
                    sl, ol, xv = xs_s
                    S, w = accs
                    S = S + _segsum(A_vis[ol], sl, n_self + 1)
                    resid = xv
                    if use_bias:
                        resid = resid - b_self_pad[sl] - tabs[2][ol]
                    w = w + _segsum(m_vis[ol] * resid[:, None], sl, n_self + 1)
                    return S, w

                S0 = jnp.zeros((n_self + 1, K * K), dt)
                w0 = jnp.zeros((n_self + 1, K), dt)
                S, w = _ring(tables, (self_loc, other_loc, xs), (S0, w0),
                             body, D, ring_ax, dp_ax)
                S = S[:n_self].reshape(n_self, K, K)
                w = w[:n_self]
                from pmf_tpu.ops.solve import batched_psd_inverse

                eye = jnp.eye(K, dtype=dt)
                precision = eye / jnp.asarray(eta2, dt) + S / jnp.asarray(s2, dt)
                V_new = batched_psd_inverse(precision)
                m_new = jnp.einsum("rkl,rl->rk", V_new, w) / jnp.asarray(s2, dt)
                has = (counts > 0)[:, None]
                return (jnp.where(has, m_new, m_self),
                        jnp.where(has[:, :, None], V_new, V_self))

            # Diagonal covariance (same math as _factor_block_diag).
            sq = V_other + m_other * m_other
            tables = (sq, m_other) + ((b_other,) if use_bias else ())

            def body(tabs, xs_s, accs):
                sq_vis, m_vis = tabs[0], tabs[1]
                sl, ol, xv = xs_s
                S_sq, S_mr, S_mm = accs
                m_e = m_vis[ol]
                resid = xv
                if use_bias:
                    resid = resid - b_self_pad[sl] - tabs[2][ol]
                pred = jnp.sum(m_self_pad[sl] * m_e, axis=-1)
                S_sq = S_sq + _segsum(sq_vis[ol], sl, n_self + 1)
                S_mr = S_mr + _segsum(m_e * (resid - pred)[:, None], sl,
                                      n_self + 1)
                S_mm = S_mm + _segsum(m_e * m_e, sl, n_self + 1)
                return S_sq, S_mr, S_mm

            z = jnp.zeros((n_self + 1, K), dt)
            S_sq, S_mr, S_mm = _ring(tables, (self_loc, other_loc, xs),
                                     (z, z, z), body, D, ring_ax, dp_ax)
            S_sq, S_mr, S_mm = S_sq[:n_self], S_mr[:n_self], S_mm[:n_self]
            prec = 1.0 / jnp.asarray(eta2, dt) + S_sq / jnp.asarray(s2, dt)
            v_new = 1.0 / prec
            m_new = (S_mr + m_self * S_mm) / (jnp.asarray(s2, dt) * prec)
            has = (counts > 0)[:, None]
            return (jnp.where(has, m_new, m_self),
                    jnp.where(has, v_new, V_self))

        def bias_block(b_self, b_other, m_self, m_other, self_loc, other_loc,
                       xs, counts, n_self):
            m_self_pad = _pad_row(m_self)

            def body(tabs, xs_s, accs):
                m_vis, b_vis = tabs
                sl, ol, xv = xs_s
                inter = jnp.sum(m_self_pad[sl] * m_vis[ol], axis=-1)
                resid = xv - b_vis[ol] - inter
                return (accs[0] + _segsum(resid, sl, n_self + 1),)

            (s,) = _ring((m_other, b_other), (self_loc, other_loc, xs),
                         (jnp.zeros(n_self + 1, dt),), body, D, ring_ax, dp_ax)
            s = s[:n_self]
            prec = 1.0 / jnp.asarray(ebias2, dt) + counts.astype(dt) / jnp.asarray(s2, dt)
            return jnp.where(counts > 0, s / (prec * jnp.asarray(s2, dt)),
                             b_self)

        m_t, V_t = factor_block(m_t, V_t, m_b, V_b, b_u, b_i,
                                ul_u, il_u, x_u, counts_u, et2, users_per)
        m_b, V_b = factor_block(m_b, V_b, m_t, V_t, b_i, b_u,
                                il_i, ul_i, x_i, counts_i, eb2, items_per)
        if use_bias:
            b_u = bias_block(b_u, b_i, m_t, m_b, ul_u, il_u, x_u,
                             counts_u, users_per)
            b_i = bias_block(b_i, b_u, m_b, m_t, il_i, ul_i, x_i,
                             counts_i, items_per)
        return {"m_theta": m_t, "V_theta": V_t, "m_beta": m_b,
                "V_beta": V_b, "b_user": b_u, "b_item": b_i}

    buckets = (layout.u_loc_by_u, layout.i_loc_by_u, layout.x_by_u,
               layout.i_loc_by_i, layout.u_loc_by_i, layout.x_by_i)
    dt = state["m_theta"].dtype
    return _sweep(state, buckets, layout.user_counts, layout.item_counts,
                  jnp.asarray(sigma2, dt), jnp.asarray(eta_theta2, dt),
                  jnp.asarray(eta_beta2, dt), jnp.asarray(eta_bias2, dt))


@partial(jax.jit, static_argnames=("use_bias", "covariance", "mesh"))
def _gaussian_flat_jit(state, layout, scal, *, use_bias, covariance, mesh):
    return _tp_sweep_gaussian_impl(state, layout, *scal, use_bias=use_bias,
                                   covariance=covariance, mesh=mesh)


def tp_sweep_gaussian(
    state: dict,
    layout: TPLayout,
    sigma2,
    eta_theta2,
    eta_beta2,
    eta_bias2,
    *,
    use_bias: bool,
    covariance: str,
    mesh,
):
    """One full Gaussian CAVI iteration with row-sharded state — the
    reference's exact block order (theta, beta, b_user, b_item,
    `gaussian_mf_cavi_bias.py:125-263`) as four ring passes.

    Dispatches through a module-level jitted entry (the impl builds a
    fresh `shard_map` closure, so an uncached direct call would re-trace
    every sweep — see `tp_blocked.tp_sweep_hpf_blocked`)."""
    dt = state["m_theta"].dtype
    scal = tuple(jnp.asarray(v, dt) for v in
                 (sigma2, eta_theta2, eta_beta2, eta_bias2))
    return _gaussian_flat_jit(state, layout, scal, use_bias=use_bias,
                              covariance=covariance, mesh=mesh)


GAUSSIAN_AXIS_OF = {"m_theta": "u", "V_theta": "u", "b_user": "u",
                    "m_beta": "i", "V_beta": "i", "b_item": "i"}

HPF_AXIS_OF = {"a_theta": "u", "b_theta": "u", "b_xi": "u",
               "a_beta": "i", "b_beta": "i", "b_eta": "i"}
HPF_PAD_ONES = ("b_theta", "b_beta", "b_xi", "b_eta")

POISSON_AXIS_OF = {"a_theta": "u", "b_theta": "u",
                   "a_beta": "i", "b_beta": "i"}
POISSON_EXT_AXIS_OF = {**POISSON_AXIS_OF, "a_phi": "u", "b_phi": "u",
                       "a_psi": "i", "b_psi": "i"}
POISSON_PAD_ONES = ("b_theta", "b_beta", "b_phi", "b_psi")


def _tp_sweep_poisson_impl(state: dict, layout: TPLayout, a0, b0, *,
                           extended: bool, mesh):
    from pmf_tpu.models.poisson_mf import RATE_FLOOR

    D = layout.n_devices
    info = _mesh_info(mesh)
    ring_ax, dp_ax = info["ring"], info["dp"]
    row = info["row"]
    rep = P()
    state_specs = {k: row for k in state}

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, (info["bucket"],) * 6, row, row, rep, rep),
        out_specs=state_specs,
        check_vma=False,
    )
    def _sweep(st, buckets, counts_u, counts_i, a0v, b0v):
        ul_u, il_u, x_u, il_i, ul_i, x_i = (
            b.reshape(b.shape[-2], b.shape[-1]) for b in buckets)
        users_per, items_per = counts_u.shape[0], counts_i.shape[0]
        dt = st["a_theta"].dtype
        K = st["a_theta"].shape[1]
        floor = jnp.asarray(RATE_FLOOR, dt)

        E_theta = st["a_theta"] / st["b_theta"]
        E_beta = st["a_beta"] / st["b_beta"]

        def plain_block(E_self, E_other, self_loc, other_loc, xs, counts,
                        n_self):
            E_self_pad = _pad_row(E_self)

            def body(tabs, xs_s, accs):
                (E_vis,) = tabs
                sl, ol, xv = xs_s
                s_alloc, s_other = accs
                self_rows = E_self_pad[sl]
                other_rows = E_vis[ol]
                rate = jnp.maximum(jnp.sum(self_rows * other_rows, -1), floor)
                alloc = (xv / rate)[:, None] * self_rows * other_rows
                return (s_alloc + _segsum(alloc, sl, n_self + 1),
                        s_other + _segsum(other_rows, sl, n_self + 1))

            z = jnp.zeros((n_self + 1, K), dt)
            s_alloc, s_other = _ring((E_other,), (self_loc, other_loc, xs),
                                     (z, z), body, D, ring_ax, dp_ax)
            has = (counts > 0)[:, None]
            a_out = jnp.where(has, a0v + s_alloc[:n_self], jnp.asarray(a0v, dt))
            b_out = jnp.where(has, b0v + s_other[:n_self], jnp.asarray(b0v, dt))
            return a_out, b_out

        if not extended:
            a_t, b_t = plain_block(E_theta, E_beta, ul_u, il_u, x_u,
                                   counts_u, users_per)
            E_theta = a_t / b_t
            a_b, b_b = plain_block(E_beta, E_theta, il_i, ul_i, x_i,
                                   counts_i, items_per)
            return {"a_theta": a_t, "b_theta": b_t,
                    "a_beta": a_b, "b_beta": b_b}

        # Only E_psi enters the user-side block; the user block's own
        # scalars (phi) update within it and the fresh E_phi feeds the
        # item block.
        E_psi = st["a_psi"] / st["b_psi"]

        def ext_block(E_self, E_other, s_other, self_loc, other_loc, xs,
                      counts, n_self):
            """Factor + scalar updates of one side.  Ring pass 1: factor
            allocation (unweighted dot — the scalars cancel), scalar-
            weighted rate, and the row-local rating sum; ring pass 2:
            scalar rate against the UPDATED factor rows."""
            E_self_pad = _pad_row(E_self)

            def body1(tabs, xs_s, accs):
                E_vis, s_vis = tabs
                sl, ol, xv = xs_s
                s_alloc, s_wother, s_x = accs
                self_rows = E_self_pad[sl]
                other_rows = E_vis[ol]
                dot = jnp.maximum(jnp.sum(self_rows * other_rows, -1), floor)
                alloc = (xv / dot)[:, None] * self_rows * other_rows
                w = s_vis[ol][:, None] * other_rows
                return (s_alloc + _segsum(alloc, sl, n_self + 1),
                        s_wother + _segsum(w, sl, n_self + 1),
                        s_x + _segsum(xv, sl, n_self + 1))

            z = jnp.zeros((n_self + 1, K), dt)
            z1 = jnp.zeros((n_self + 1,), dt)
            s_alloc, s_wother, s_x = _ring(
                (E_other, s_other), (self_loc, other_loc, xs),
                (z, z, z1), body1, D, ring_ax, dp_ax)
            has = (counts > 0)[:, None]
            a_fac = jnp.where(has, a0v + s_alloc[:n_self], jnp.asarray(a0v, dt))
            b_fac = jnp.where(has, b0v + s_wother[:n_self], jnp.asarray(b0v, dt))
            E_fac_pad = _pad_row(a_fac / b_fac)

            def body2(tabs, xs_s, accs):
                E_vis, s_vis = tabs
                sl, ol, xv = xs_s
                dot_new = jnp.sum(E_fac_pad[sl] * E_vis[ol], -1)
                return (accs[0] + _segsum(s_vis[ol] * dot_new, sl, n_self + 1),)

            (s_sdot,) = _ring((E_other, s_other), (self_loc, other_loc, xs),
                              (z1,), body2, D, ring_ax, dp_ax)
            has1 = counts > 0
            a_s = jnp.where(has1, a0v + s_x[:n_self], jnp.asarray(a0v, dt))
            b_s = jnp.where(has1, b0v + s_sdot[:n_self], jnp.asarray(b0v, dt))
            return a_fac, b_fac, a_s, b_s

        a_t, b_t, a_phi, b_phi = ext_block(E_theta, E_beta, E_psi,
                                           ul_u, il_u, x_u, counts_u,
                                           users_per)
        E_theta = a_t / b_t
        E_phi = a_phi / b_phi
        a_b, b_b, a_psi, b_psi = ext_block(E_beta, E_theta, E_phi,
                                           il_i, ul_i, x_i, counts_i,
                                           items_per)
        return {"a_theta": a_t, "b_theta": b_t, "a_beta": a_b, "b_beta": b_b,
                "a_phi": a_phi, "b_phi": b_phi, "a_psi": a_psi, "b_psi": b_psi}

    buckets = (layout.u_loc_by_u, layout.i_loc_by_u, layout.x_by_u,
               layout.i_loc_by_i, layout.u_loc_by_i, layout.x_by_i)
    dt = state["a_theta"].dtype
    return _sweep(state, buckets, layout.user_counts, layout.item_counts,
                  jnp.asarray(a0, dt), jnp.asarray(b0, dt))


@partial(jax.jit, static_argnames=("extended", "mesh"))
def _poisson_flat_jit(state, layout, a0, b0, *, extended, mesh):
    return _tp_sweep_poisson_impl(state, layout, a0, b0, extended=extended,
                                  mesh=mesh)


def tp_sweep_poisson(state: dict, layout: TPLayout, a0, b0, *,
                     extended: bool, mesh):
    """One full Poisson-MF CAVI iteration with row-sharded Gamma state —
    the reference's user-block -> refresh -> item-block order
    (`poisson_mf_cavi.py:86-219`); the extended variant additionally
    updates the scalar activity factors with the per-row Gauss-Seidel
    refresh (`poisson_mf_extended_cavi.py:110-164`) as a SECOND ring pass
    per side (the scalar rate needs the freshly updated factor rows, which
    exist only after the factor pass's full ring completes).  Jitted
    dispatch: see `tp_sweep_gaussian`."""
    dt = state["a_theta"].dtype
    return _poisson_flat_jit(state, layout, jnp.asarray(a0, dt),
                             jnp.asarray(b0, dt), extended=extended,
                             mesh=mesh)


def _tp_sweep_hpf_impl(state: dict, layout: TPLayout, a, a_prime, b_prime,
                       c, c_prime, d_prime, *, mesh):
    from pmf_tpu.models.hpf import RATE_FLOOR

    D = layout.n_devices
    info = _mesh_info(mesh)
    ring_ax, dp_ax = info["ring"], info["dp"]
    row = info["row"]
    rep = P()
    state_specs = {k: row for k in state}
    scal = (rep,) * 6

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, (info["bucket"],) * 6, row, row) + scal,
        out_specs=state_specs,
        check_vma=False,
    )
    def _sweep(st, buckets, counts_u, counts_i, av, apv, bpv, cv, cpv, dpv):
        ul_u, il_u, x_u, il_i, ul_i, x_i = (
            b.reshape(b.shape[-2], b.shape[-1]) for b in buckets)
        users_per, items_per = counts_u.shape[0], counts_i.shape[0]
        dt = st["a_theta"].dtype
        K = st["a_theta"].shape[1]
        a_xi = apv + K * av
        a_eta = cpv + K * cv

        E_theta = st["a_theta"] / st["b_theta"]
        E_beta = st["a_beta"] / st["b_beta"]
        E_xi = a_xi / st["b_xi"]
        E_eta = a_eta / st["b_eta"]
        floor = jnp.asarray(RATE_FLOOR, dt)

        def factor_block(E_self, E_other, E_rate_prior, self_loc, other_loc,
                         xs, counts, shape0, n_self):
            E_self_pad = _pad_row(E_self)

            def body(tabs, xs_s, accs):
                (E_vis,) = tabs
                sl, ol, xv = xs_s
                s_alloc, s_other = accs
                self_rows = E_self_pad[sl]
                other_rows = E_vis[ol]
                rate = jnp.maximum(jnp.sum(self_rows * other_rows, -1), floor)
                alloc = (xv / rate)[:, None] * self_rows * other_rows
                return (s_alloc + _segsum(alloc, sl, n_self + 1),
                        s_other + _segsum(other_rows, sl, n_self + 1))

            z = jnp.zeros((n_self + 1, K), dt)
            s_alloc, s_other = _ring((E_other,), (self_loc, other_loc, xs),
                                     (z, z), body, D, ring_ax, dp_ax)
            s_alloc, s_other = s_alloc[:n_self], s_other[:n_self]
            has = (counts > 0)[:, None]
            a_out = jnp.where(has, shape0 + s_alloc, jnp.asarray(shape0, dt))
            b_out = jnp.where(has, E_rate_prior[:, None] + s_other,
                              E_rate_prior[:, None])
            return a_out, b_out

        a_t, b_t = factor_block(E_theta, E_beta, E_xi, ul_u, il_u, x_u,
                                counts_u, av, users_per)
        E_theta = a_t / b_t
        b_xi = bpv + jnp.sum(E_theta, axis=1)
        a_b, b_b = factor_block(E_beta, E_theta, E_eta, il_i, ul_i, x_i,
                                counts_i, cv, items_per)
        E_beta = a_b / b_b
        b_eta = dpv + jnp.sum(E_beta, axis=1)
        return {"a_theta": a_t, "b_theta": b_t, "a_beta": a_b,
                "b_beta": b_b, "b_xi": b_xi, "b_eta": b_eta}

    buckets = (layout.u_loc_by_u, layout.i_loc_by_u, layout.x_by_u,
               layout.i_loc_by_i, layout.u_loc_by_i, layout.x_by_i)
    dt = state["a_theta"].dtype
    return _sweep(state, buckets, layout.user_counts, layout.item_counts,
                  jnp.asarray(a, dt), jnp.asarray(a_prime, dt),
                  jnp.asarray(b_prime, dt), jnp.asarray(c, dt),
                  jnp.asarray(c_prime, dt), jnp.asarray(d_prime, dt))


@partial(jax.jit, static_argnames=("mesh",))
def _hpf_flat_jit(state, layout, scal, *, mesh):
    return _tp_sweep_hpf_impl(state, layout, *scal, mesh=mesh)


def tp_sweep_hpf(state: dict, layout: TPLayout, a, a_prime, b_prime,
                 c, c_prime, d_prime, *, mesh):
    """One full HPF CAVI iteration with row-sharded Gamma state — the
    reference's exact theta -> xi -> beta -> eta block order with
    expectation refreshes between blocks (`hpf_cavi.py:121-193`) as two
    ring passes (the xi/eta blocks are row-local).  Jitted dispatch: see
    `tp_sweep_gaussian`."""
    dt = state["a_theta"].dtype
    scal = tuple(jnp.asarray(v, dt)
                 for v in (a, a_prime, b_prime, c, c_prime, d_prime))
    return _hpf_flat_jit(state, layout, scal, mesh=mesh)
