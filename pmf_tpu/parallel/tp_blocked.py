"""Blocked-engine ring sweeps for TP (row-sharded) training.

VERDICT r3 weak #1: the TP mode (`pmf_tpu.parallel.tp`) ran every ring
step with per-edge `segment_sum` — the flat formulation the blocked
Pallas engine exists to replace — so TP training paid a ~13x per-chip
throughput cliff at exactly the beyond-HBM scale it exists for.  This
module puts the blocked one-hot-MXU kernel (`pmf_tpu.ops.pallas.
cavi_edge`) INSIDE the ring:

* **Per-(device, step) bucket blocked passes.**  Row ownership is the
  same contiguous split as the flat TP layout (device d owns user rows
  [d*users_per, (d+1)*users_per) and likewise items), so state sharding,
  checkpoints, and eval are unchanged.  The edges of bucket (d, s) —
  device d's self rows against the item shard visiting at ring step s —
  are laid out as a `pmf_tpu.data.blocked._build_pass` blocked pass in
  LOCAL coordinates: self ids within [0, users_per), other ids within
  [0, items_per) of the visiting shard.

* **Uniform kernel geometry.**  Inside `shard_map` + `lax.scan`, every
  (device, step) bucket must share one static Pallas geometry: tile
  sizes come from the bucket density (identical to the global density —
  nnz/D^2 edges over (users_per x items_per) rows), the segment length
  is forced uniform (``seg_max_override``), and every bucket pads to the
  global maximum segment count with all-padding dummy segments (masked
  by their zero row count).

* **Local popularity reordering.**  The single-chip blocked engine
  relabels rows by descending rating count so hot rows cluster into
  dense tiles.  Per-device local permutations do the same here: device
  d sorts ITS user rows by count (one permutation per shard per side),
  permutes its own tables before the ring, and the stats unpermute
  after.  Bucket layouts are built in permuted-local coordinates, so the
  rotating tables arrive pre-permuted by their owner.

* **Ring + hybrid semantics are shared** with the flat TP sweeps
  (`pmf_tpu.parallel.tp._ring`): tables rotate with `lax.ppermute`
  (skipping the discarded final hop), and on a 2-D ("data", "model")
  mesh each bucket's SEGMENTS round-robin over the data axis with one
  psum per pass.

A DENSE HEAD rides the ring for the Poisson families (`TPHeadTier`,
`build_tp_blocked(head="auto")`): each bucket's dense corner — the
device's top local rows x the VISITING shard's top rows, Zipf-dense
again after the count-balanced deal + local popularity sort — is stored
as per-direction cell stacks and its statistics run as fused MXU
matmuls per ring step against the resident visiting table (zero extra
ICI; the single-chip hybrid's fast path, `pmf_tpu.ops.dense_head`).

Families: ALL FOUR — HPF, plain Poisson, extended Poisson (the extended
scalar refresh runs as a second ring pass with a pre-scaled table + the
kernel's "raw" product mode), and Gaussian full/diag with biases (the
augmented pass-through table ``[m | b | tri(V + mm^T)]`` rotates; PSD
solves stay local; ``bias_update="lagged"`` rides the factor payload
lanes and drops both bias ring passes).

Reference analogue: none (the reference is single-process CPU,
`/root/reference/src/models/hpf_cavi.py`); this is the TPU-native
scale-out of its update equations.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pmf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from pmf_tpu.parallel.tp import _mesh_info, _ring, _round_up


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["sb", "ob", "loc", "x", "seg_row0", "seg_nrows"],
    meta_fields=["bs_self", "bs_other", "chunk_size", "group", "seg_chunks",
                 "n_segments", "out_rows", "n_self_blocks", "n_other_blocks"],
)
@dataclasses.dataclass(frozen=True)
class TPBlockedDir:
    """One direction (self-major) of the TP blocked layout.

    Data arrays carry a leading (D_devices, [n_dp,] D_steps, n_segments)
    prefix; under `shard_map` the device (and DP) axes slice away and the
    sweeps scan (step, segment).

    sb / ob: chunk -> self/other block ids, (..., seg_chunks).
    loc: packed local row ids (self_loc << 16 | other_loc),
    (..., seg_chunks * chunk_size).
    x: ratings in chunk order, same trailing shape.
    seg_row0 / seg_nrows: per-segment first output ROW and row count
    (block metadata x block size); dummy padding segments carry
    seg_nrows == 0 and contribute nothing.
    """

    sb: jax.Array
    ob: jax.Array
    loc: jax.Array
    x: jax.Array
    seg_row0: jax.Array
    seg_nrows: jax.Array
    bs_self: int
    bs_other: int
    chunk_size: int
    group: int
    seg_chunks: int
    n_segments: int
    out_rows: int
    n_self_blocks: int
    n_other_blocks: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x_hi", "x_lo", "m"],
    meta_fields=["row_start", "hu", "hi", "hip", "r0"],
)
@dataclasses.dataclass(frozen=True)
class TPHeadTier:
    """One dense-head tier of the TP blocked layout, stacked per bucket.

    The TP counterpart of `pmf_tpu.data.blocked.DenseHead`: after the
    per-shard local popularity reordering, every (device, ring-step)
    bucket's dense corner — the device's top ``hu`` self rows against the
    VISITING shard's top ``hi`` rows — is stored as dense cell arrays and
    its CAVI statistics run as dense MXU matmuls per ring step
    (`pmf_tpu.ops.dense_head.fused_alloc_tier`); the visiting table's
    first ``hi`` rows ARE the tier's columns, so no extra communication
    is needed.  Cells are stored PER DIRECTION (by_user and by_item carve
    independent heads), because each side's statistics must run after the
    other side's refresh (the reference's theta -> beta order,
    `/root/reference/src/models/hpf_cavi.py:126-185`) with the cells
    resident on the consuming device.

    Data arrays carry the (D_devices, [n_dp,] D_steps) prefix of
    `TPBlockedDir`; with DP the tier's rows split contiguously over the
    replicas (``hu_r = hu / n_dp`` rows each — dense cells make the split
    perfectly work-balanced).  x_hi/x_lo/m are (..., hu_r, hip):
    bf16 rating-sum (+ optional bf16 remainder when ratings are not
    bf16-exact) and edge multiplicity (bf16 when every multiplicity is
    <= 256, else f32), exactly as the single-chip `DenseHead`.
    """

    x_hi: jax.Array
    x_lo: jax.Array | None
    m: jax.Array
    row_start: int
    hu: int
    hi: int
    hip: int
    r0: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["by_user", "by_item",
                 "u_old_of_new", "u_new_of_old",
                 "i_old_of_new", "i_new_of_old",
                 "user_counts", "item_counts",
                 "x_sum_user", "x_sum_item",
                 "head_user", "head_item"],
    meta_fields=["n_users", "n_items", "n_users_pad", "n_items_pad",
                 "users_per", "items_per", "n_devices", "nnz", "n_dp"],
)
@dataclasses.dataclass(frozen=True)
class TPBlockedLayout:
    """Blocked dual bucket layout + per-shard local popularity perms.

    ``u_old_of_new[d, n]`` = the local-old user row of device d at local
    popularity rank n (``u_new_of_old`` is the inverse); likewise items.
    Counts are in ORIGINAL (unpermuted) padded row order, as in
    `pmf_tpu.parallel.tp.TPLayout`.
    """

    by_user: TPBlockedDir
    by_item: TPBlockedDir
    u_old_of_new: jax.Array
    u_new_of_old: jax.Array
    i_old_of_new: jax.Array
    i_new_of_old: jax.Array
    user_counts: jax.Array
    item_counts: jax.Array
    # Per-row rating sums (iteration-invariant): the extended-Poisson
    # scalar SHAPE a0 + sum_i x_ui needs no allocation pass.
    x_sum_user: jax.Array
    x_sum_item: jax.Array
    n_users: int
    n_items: int
    n_users_pad: int
    n_items_pad: int
    users_per: int
    items_per: int
    n_devices: int
    nnz: int
    n_dp: int = 1
    # Dense-head tiers per direction (empty = pure edge layout).  The
    # HPF, plain-Poisson and extended-Poisson sweeps consume these; only
    # the Gaussian sweep rejects layouts carrying them.
    head_user: tuple = ()
    head_item: tuple = ()


def _local_perms(ids: np.ndarray, per: int, D: int):
    """Per-shard local popularity permutations: for each device, its
    ``per`` local rows sorted by descending global observation count
    (stable, so ties keep id order).  Returns (old_of_new, new_of_old),
    both (D, per) int32."""
    counts = np.bincount(ids, minlength=per * D).reshape(D, per)
    old_of_new = np.argsort(-counts, axis=1, kind="stable").astype(np.int32)
    new_of_old = np.empty_like(old_of_new)
    rng = np.arange(per, dtype=np.int32)
    for d in range(D):
        new_of_old[d, old_of_new[d]] = rng
    return old_of_new, new_of_old


def _head_stack_inputs(d_of, step, r_rel, c, xv, D, dp, hu_r, hip):
    """Per-device flat cell indices + ratings of one tier's head edges —
    the exact `_scatter_head_stack_from` inputs, and what the layout
    cache persists (8 B/edge instead of the multi-GiB dense stacks)."""
    per_dev = dp * D * hu_r * hip
    if per_dev >= 2**31:
        raise ValueError(
            f"TP head tier per-device stack ({dp}x{D}x{hu_r}x{hip} = "
            f"{per_dev} cells) exceeds int32 flat-index range; shrink "
            "head_bytes or the tier")
    p = r_rel // hu_r
    within = (((p * D + step) * hu_r + (r_rel - p * hu_r)) * hip + c)
    idx_per_dev, x_per_dev = [], []
    for dd in range(D):
        sel = d_of == dd
        idx_per_dev.append(within[sel].astype(np.int32))
        x_per_dev.append(np.asarray(xv[sel], np.float32))
    return idx_per_dev, x_per_dev


def _scatter_head_stack(d_of, step, r_rel, c, xv, D, dp, hu_r, hip):
    """Scatter one tier's head edges into the stacked per-bucket cell
    arrays ON DEVICE (as `pmf_tpu.data.blocked._build_head`: only the
    head edge triples cross the host->HBM link, not gigabytes of dense
    cells).  Returns (x_hi, x_lo|None, m) shaped (D, [dp,] D, hu_r, hip);
    dtypes follow the single-chip DenseHead rules, decided across ALL
    buckets so the stack is uniform."""
    idx_per_dev, x_per_dev = _head_stack_inputs(
        d_of, step, r_rel, c, xv, D, dp, hu_r, hip)
    return _scatter_head_stack_from(idx_per_dev, x_per_dev, D, dp, hu_r, hip)


def _scatter_head_stack_from(idx_per_dev, x_per_dev, D, dp, hu_r, hip):
    """Device-scatter half of `_scatter_head_stack` (fresh builds compute
    the inputs; cached loads replay them from disk)."""
    per_dev = dp * D * hu_r * hip
    import jax as _jax

    on_cpu = _jax.default_backend() == "cpu"
    x_his, x_los, ms = [], [], []
    any_rem = False
    m_exact = True
    for dd in range(D):
        if on_cpu:
            # np.bincount is ~10x jnp scatter-add on the host backend
            # (tests, geometry scripts); on accelerators the device
            # scatter keeps dense cells off the host->HBM link.
            idx_np = idx_per_dev[dd].astype(np.int64)
            X = jnp.asarray(np.bincount(idx_np, weights=x_per_dev[dd],
                                        minlength=per_dev)
                            .astype(np.float32))
            M = jnp.asarray(np.bincount(idx_np, minlength=per_dev)
                            .astype(np.float32))
        else:
            idx = jnp.asarray(idx_per_dev[dd])
            xs = jnp.asarray(x_per_dev[dd])
            X = jnp.zeros((per_dev,), jnp.float32).at[idx].add(xs)
            M = jnp.zeros((per_dev,), jnp.float32).at[idx].add(1.0)
        x_hi = X.astype(jnp.bfloat16)
        rem = X - x_hi.astype(jnp.float32)
        # Checked even for bf16-exact inputs: duplicate-cell SUMS can
        # exceed bf16's exact-integer range (single-chip `_build_head`
        # rule).
        any_rem = any_rem or bool(jnp.any(rem != 0))
        m_exact = m_exact and bool(jnp.max(M, initial=0.0) <= 256)
        x_his.append(x_hi)
        x_los.append(rem.astype(jnp.bfloat16))
        ms.append(M)
        del X, rem  # free the f32 (per_dev,) temporaries (GiB at 25M)

    shape = (dp, D, hu_r, hip) if dp > 1 else (D, hu_r, hip)

    def stack(parts, dt):
        return jnp.stack([a.astype(dt).reshape(shape) for a in parts])

    return (
        stack(x_his, jnp.bfloat16),
        stack(x_los, jnp.bfloat16) if any_rem else None,
        stack(ms, jnp.bfloat16 if m_exact else jnp.float32),
    )


def _build_dir(
    s_glob, o_glob, x, s_per, o_per, D, s_new_of_old, o_new_of_old,
    bs_self, bs_other, chunk_size, group, seg_for, dtype, dp,
    head_tiers=(), head_r0: int = 512,
):
    """Build one direction's (D, [dp,] D, n_seg, ...) stacked bucket
    passes (host numpy), carving ``head_tiers`` [(row_start, rows, hi)]
    into dense `TPHeadTier` stacks first; the edge passes hold only the
    residual tail, and segment sizing (``seg_for(s_per, resid_nnz)``)
    sees the residual count.  Returns (TPBlockedDir, tuple[TPHeadTier],
    head_triples) — the triples are the per-tier `_scatter_head_stack`
    inputs, kept for the layout cache."""
    from pmf_tpu.data.blocked import _build_pass

    d_of = s_glob // s_per
    v_of = o_glob // o_per
    step = (v_of - d_of) % D
    s_loc = s_new_of_old[d_of, s_glob % s_per]
    o_loc = o_new_of_old[v_of, o_glob % o_per]
    x = np.asarray(x)

    heads = []
    head_triples = []
    if head_tiers:
        x32 = x.astype(np.float32)
        tail = np.ones(len(s_glob), dtype=bool)
        for rs, rows, hi in head_tiers:
            hip = -(-hi // 512) * 512
            hu_r = rows // dp
            # Select against the REMAINING tail so an edge can only ever
            # land in one tier's stack (tiers_for also rejects overlapping
            # tiers up front; this keeps the build safe regardless).
            sel = tail & (s_loc >= rs) & (s_loc < rs + rows) & (o_loc < hi)
            tail &= ~sel
            idx_per_dev, x_per_dev = _head_stack_inputs(
                d_of[sel], step[sel], s_loc[sel] - rs, o_loc[sel],
                x32[sel], D, dp, hu_r, hip)
            x_hi, x_lo, m = _scatter_head_stack_from(
                idx_per_dev, x_per_dev, D, dp, hu_r, hip)
            tm = dict(row_start=int(rs), hu=int(rows), hi=int(hi),
                      hip=int(hip), r0=int(head_r0))
            head_triples.append((idx_per_dev, x_per_dev, tm))
            heads.append(TPHeadTier(x_hi=x_hi, x_lo=x_lo, m=m, **tm))
        d_of, step = d_of[tail], step[tail]
        s_loc, o_loc, x = s_loc[tail], o_loc[tail], x[tail]

    seg_override = seg_for(s_per, len(s_loc))
    passes = []
    max_nseg = 1
    max_blocks = 1
    for d in range(D):
        row = []
        for s in range(D):
            m = (d_of == d) & (step == s)
            # device=False: bucket passes stay HOST numpy end-to-end (the
            # implicit jnp.asarray h2d + np.asarray d2h round-trip per
            # bucket pass was the TP build's wall-clock hotspot on the
            # tunnel-attached chip — ~100 MB each way per direction at
            # 25M edges); place_tp_blocked does the one real h2d.
            p = _build_pass(
                s_loc[m], o_loc[m], np.asarray(x)[m], s_per, o_per,
                bs_self, bs_other, chunk_size, dtype,
                reorder=False, group=group, seg_max_override=seg_override,
                device=False,
            )
            nseg = p.n_chunks // p.seg_chunks
            max_nseg = max(max_nseg, nseg)
            max_blocks = max(max_blocks, max(p.seg_n_blocks))
            row.append(p)
        passes.append(row)

    SEG = passes[0][0].seg_chunks
    C = chunk_size
    pad_packed = np.int32((bs_self << 16) | bs_other)
    sb = np.zeros((D, D, max_nseg, SEG), np.int32)
    ob = np.zeros((D, D, max_nseg, SEG), np.int32)
    loc = np.full((D, D, max_nseg, SEG * C), pad_packed, np.int32)
    xs = np.zeros((D, D, max_nseg, SEG * C), np.float32)
    row0 = np.zeros((D, D, max_nseg), np.int32)
    nrows = np.zeros((D, D, max_nseg), np.int32)
    for d in range(D):
        for s in range(D):
            p = passes[d][s]
            nseg = p.n_chunks // p.seg_chunks
            sb[d, s, :nseg] = np.asarray(p.chunk_self_block).reshape(nseg, SEG)
            ob[d, s, :nseg] = np.asarray(p.chunk_other_block).reshape(nseg, SEG)
            loc[d, s, :nseg] = np.asarray(p.loc).reshape(nseg, SEG * C)
            xs[d, s, :nseg] = np.asarray(p.x, np.float32).reshape(nseg, SEG * C)
            row0[d, s, :nseg] = np.asarray(p.seg_first_block, np.int32) * bs_self
            nrows[d, s, :nseg] = np.asarray(p.seg_n_blocks, np.int32) * bs_self
            # Dummy segments keep row0 = 0, nrows = 0 (fully masked).

    if dp > 1:
        # Segments round-robin over the data-parallel replicas (each
        # replica scans a disjoint subset; partial accumulators psum once
        # per ring pass).
        nseg_dp = -(-max_nseg // dp)

        def split(a, fill):
            out = np.full((D, dp, D, nseg_dp) + a.shape[3:], fill, a.dtype)
            for p_ in range(dp):
                part = a[:, :, p_::dp]
                out[:, p_, :, : part.shape[2]] = part
            return out

        sb, ob = split(sb, 0), split(ob, 0)
        loc, xs = split(loc, pad_packed), split(xs, 0.0)
        row0, nrows = split(row0, 0), split(nrows, 0)
        max_nseg = nseg_dp

    return TPBlockedDir(
        sb=sb, ob=ob, loc=loc, x=xs, seg_row0=row0, seg_nrows=nrows,
        bs_self=bs_self, bs_other=bs_other, chunk_size=C, group=group,
        seg_chunks=SEG, n_segments=max_nseg,
        out_rows=int(max_blocks) * bs_self,
        n_self_blocks=-(-s_per // bs_self),
        n_other_blocks=-(-o_per // bs_other),
    ), tuple(heads), head_triples


def build_tp_blocked(
    u, i, x, n_users: int, n_items: int, n_devices: int,
    dtype=np.float32, dp: int = 1,
    block_users: int = 512, block_items: int = 512,
    chunk_size: int = 128, group: int = 16,
    head=None, head_bytes: int = 2 << 30, head_r0: int = 512,
    head_min_nnz: int = 4_000_000,
    cache_dir: str | None = None,
) -> TPBlockedLayout:
    """Host-side build.  Tile parameters should come from
    `pmf_tpu.data.blocked.auto_tiles` on the GLOBAL shape — each bucket's
    expected tile occupancy equals the global one (nnz/D^2 edges over
    (n_users/D x n_items/D) rows).

    ``head``: None = pure edge layout; "auto" = size a dense staircase
    per direction from the bucket-local edge profile
    (`pmf_tpu.data.blocked._pick_tiers` on the shard-local shape, byte
    budget ``head_bytes`` PER DEVICE across both directions' D resident
    buckets); a list of (row_start, rows, hi) = explicit tiers for both
    directions (rows/hi in shard-LOCAL coordinates; each ``rows`` must be
    a multiple of ``head_r0 * dp``).  With a head, the dense-corner edges
    of every (device, step) bucket are stored as `TPHeadTier` cell stacks
    and EXCLUDED from the edge passes; the HPF, plain-Poisson and
    extended-Poisson TP sweeps consume heads (only Gaussian rejects
    them).  Explicit tiers must cover disjoint row ranges.

    ``cache_dir`` (or PMF_TPU_LAYOUT_CACHE): persist/reload the built
    layout keyed by (edge data, geometry) — see
    `pmf_tpu.data.layout_cache` (edge buckets verbatim; head tiers as
    scatter triples, replayed on device at load)."""
    from pmf_tpu.data import layout_cache as lc

    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    x = np.asarray(x, dtype=dtype)
    D = int(n_devices)
    users_per = _round_up(n_users, D) // D
    items_per = _round_up(n_items, D) // D

    cdir = lc.resolve_cache_dir(cache_dir)
    cpath = None
    if cdir is not None:
        params = dict(
            n_users=n_users, n_items=n_items, n_devices=D, dp=dp,
            dtype=np.dtype(dtype).str, block_users=block_users,
            block_items=block_items, chunk_size=chunk_size, group=group,
            head=repr(head), head_bytes=head_bytes, head_r0=head_r0,
            head_min_nnz=head_min_nnz,
        )
        key = lc.make_key("tp_blocked", lc.data_fingerprint(u, i, x), params)
        cpath = lc.entry_path(cdir, "tp_blocked", key)
        hit = lc.load_entry(cpath)
        if hit is not None:
            return lc.unpack_tp(*hit)

    u_o2n, u_n2o = _local_perms(u, users_per, D)
    i_o2n, i_n2o = _local_perms(i, items_per, D)

    # Head tier selection per direction: the bucket-local edge profile is
    # the pair (self local rank, other local rank); `_pick_tiers`'s
    # coverage count over ALL edges is then exactly the sum of per-bucket
    # coverages, so its min_cover fraction gates the same way as on a
    # single chip.  Budget: each device holds D buckets per direction.
    def tiers_for(s_glob, o_glob, s_per, o_per, s_n2o, o_n2o):
        if head is None:
            return ()
        if isinstance(head, (list, tuple)):
            tiers = [(int(rs), int(rows), int(hi)) for rs, rows, hi in head]
            unit = head_r0 * max(dp, 1)
            for rs, rows, hi in tiers:
                if rows % unit or rs + rows > s_per or hi > o_per or hi < 1:
                    raise ValueError(
                        f"TP head tier ({rs}, {rows}, {hi}) invalid for "
                        f"shard shape ({s_per} x {o_per}), unit {unit}")
            # Overlapping row ranges would scatter the shared corner edges
            # (o < min(hi)) into BOTH tiers' stacks and double-count their
            # statistics in the ring (every hi >= 1, so any row overlap is
            # an edge overlap).  The "auto" path emits disjoint bands by
            # construction; explicit tiers must too.
            spans = sorted((rs, rs + rows, hi) for rs, rows, hi in tiers)
            for (a0, a1, ah), (b0, b1, bh) in zip(spans, spans[1:]):
                if b0 < a1:
                    raise ValueError(
                        f"TP head tiers overlap: rows [{a0},{a1}) x hi<{ah} "
                        f"and [{b0},{b1}) x hi<{bh} share edges; tiers must "
                        f"cover disjoint row ranges")
            return tuple(tiers)
        if head != "auto":
            raise ValueError(f"head must be None, 'auto' or a tier list, got {head!r}")
        from pmf_tpu.data.blocked import _pick_tiers

        s_loc = s_n2o[s_glob // s_per, s_glob % s_per]
        o_loc = o_n2o[o_glob // o_per, o_glob % o_per]
        x32 = x.astype(np.float32)
        exact = not bool(np.any(x32.view(np.uint32) & np.uint32(0xFFFF)))
        cell_bytes = 4 if exact else 6
        return tuple(_pick_tiers(
            s_loc, o_loc, s_per, o_per,
            head_bytes // (2 * D), cell_bytes, head_r0, row_mult=dp,
            min_nnz=head_min_nnz,
        ))

    # Uniform segment length across all buckets: the single-chip formula
    # (span x average chunks-per-block) evaluated on expected bucket
    # occupancy (RESIDUAL after head carving), rounded to the kernel
    # group.
    def seg_for(s_per, resid_nnz):
        blocks = -(-s_per // block_users)
        est_chunks = max((resid_nnz / max(D * D * dp, 1)) / chunk_size, 1.0)
        avg = max(est_chunks / blocks, 1.0)
        seg = min(4096, max(group, int(16 * avg)))
        # Segment-quantization guard: when a bucket only fills a couple
        # of segments, the ceil to whole segments wastes up to one
        # segment per bucket (measured at D=8 on the 25M layout: ~1.9
        # segments of the unguarded size -> by_item occupancy 0.470;
        # capping at a quarter of the expected bucket chunks restores
        # the chunk-padding floor, 0.676 — reports/tp_scaling/
        # TP_SCALING_r04.md).  Inactive at D=1 where est_chunks is huge.
        seg = min(seg, max(group, int(est_chunks / 4)))
        return max(group, (seg // group) * group)

    by_user, head_user, triples_user = _build_dir(
        u, i, x, users_per, items_per, D, u_n2o, i_n2o,
        block_users, block_items, chunk_size, group, seg_for,
        dtype, dp,
        head_tiers=tiers_for(u, i, users_per, items_per, u_n2o, i_n2o),
        head_r0=head_r0,
    )
    by_item, head_item, triples_item = _build_dir(
        i, u, x, items_per, users_per, D, i_n2o, u_n2o,
        block_items, block_users, chunk_size, group, seg_for,
        dtype, dp,
        head_tiers=tiers_for(i, u, items_per, users_per, i_n2o, u_n2o),
        head_r0=head_r0,
    )

    uc = np.bincount(u, minlength=users_per * D).astype(np.float32)
    ic = np.bincount(i, minlength=items_per * D).astype(np.float32)
    x64 = np.asarray(x, np.float64)
    sxu = np.bincount(u, weights=x64, minlength=users_per * D)
    sxi = np.bincount(i, weights=x64, minlength=items_per * D)
    layout = TPBlockedLayout(
        by_user=by_user, by_item=by_item,
        u_old_of_new=u_o2n, u_new_of_old=u_n2o,
        i_old_of_new=i_o2n, i_new_of_old=i_n2o,
        user_counts=uc, item_counts=ic,
        x_sum_user=sxu.astype(dtype), x_sum_item=sxi.astype(dtype),
        n_users=n_users, n_items=n_items,
        n_users_pad=users_per * D, n_items_pad=items_per * D,
        users_per=users_per, items_per=items_per,
        n_devices=D, nnz=int(len(u)), n_dp=int(dp),
        head_user=head_user, head_item=head_item,
    )
    if cpath is not None:
        arrays = {}
        meta = lc.pack_tp(layout, triples_user, triples_item, arrays)
        lc.save_entry(cpath, arrays, meta)
    return layout


def place_tp_blocked(layout: TPBlockedLayout, state: dict, mesh):
    """Shard bucket arrays over (ring[, data]) and state/counts/perms over
    the row axis, mirroring `pmf_tpu.parallel.tp.place_tp`."""
    info = _mesh_info(mesh)
    row = NamedSharding(mesh, info["row"])
    ring = NamedSharding(mesh, P(info["ring"]))
    bucket = NamedSharding(mesh, info["bucket"])
    put = jax.device_put

    def put_dir(d: TPBlockedDir) -> TPBlockedDir:
        return dataclasses.replace(
            d,
            sb=put(d.sb, bucket), ob=put(d.ob, bucket),
            loc=put(d.loc, bucket), x=put(d.x, bucket),
            seg_row0=put(d.seg_row0, bucket),
            seg_nrows=put(d.seg_nrows, bucket),
        )

    def put_head(tiers) -> tuple:
        return tuple(
            dataclasses.replace(
                t,
                x_hi=put(t.x_hi, bucket),
                x_lo=None if t.x_lo is None else put(t.x_lo, bucket),
                m=put(t.m, bucket),
            )
            for t in tiers
        )

    layout = dataclasses.replace(
        layout,
        by_user=put_dir(layout.by_user),
        by_item=put_dir(layout.by_item),
        head_user=put_head(layout.head_user),
        head_item=put_head(layout.head_item),
        u_old_of_new=put(layout.u_old_of_new, ring),
        u_new_of_old=put(layout.u_new_of_old, ring),
        i_old_of_new=put(layout.i_old_of_new, ring),
        i_new_of_old=put(layout.i_new_of_old, ring),
        user_counts=put(layout.user_counts, row),
        item_counts=put(layout.item_counts, row),
        x_sum_user=put(layout.x_sum_user, row),
        x_sum_item=put(layout.x_sum_item, row),
    )
    state = {k: put(v, row) for k, v in state.items()}
    return layout, state


def _segment_scan(contrib_fn, acc, seg_arrays, *, SEG, C, out_rows, w_out):
    """Scan one bucket's segments, accumulating masked window
    contributions into ``acc`` ((n_self_pad + out_rows, w_out)).
    ``contrib_fn(sb, ob, loc, x) -> (out_rows, w_out)`` wraps the
    segment-level Pallas call with its table arguments bound."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0)

    def seg_body(acc, seg):
        sbv, obv, lv, xv, r0, nr = seg
        contrib = contrib_fn(sbv, obv, lv.reshape(SEG * C, 1),
                             xv.reshape(SEG * C, 1))
        contrib = jnp.where(row_ids < nr, contrib, 0.0)
        zero = jnp.zeros((), r0.dtype)
        region = jax.lax.dynamic_slice(acc, (r0, zero), (out_rows, w_out))
        return jax.lax.dynamic_update_slice(
            acc, region + contrib, (r0, zero)), None

    acc, _ = jax.lax.scan(seg_body, acc, seg_arrays)
    return acc


def _make_generic_call(kernel, dirn: TPBlockedDir, *, w_out: int,
                       self_width: int | None, other_width: int,
                       interpret: bool):
    """Segment-level pallas_call for an arbitrary blocked edge kernel
    (mirrors `pmf_tpu.ops.pallas.segmented.run_segmented`'s construction
    with the TP bucket's static geometry).  ``self_width=None`` omits the
    self-table ref (pure pass-through kernels)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pmf_tpu.ops.pallas.cavi_edge import VMEM_LIMIT_BYTES

    G, C = dirn.group, dirn.chunk_size
    self_specs = (
        [] if self_width is None
        else [pl.BlockSpec((dirn.bs_self, self_width),
                           lambda c, sb, ob, G=G: (sb[G * c], 0))]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(dirn.seg_chunks // G,),
        in_specs=[
            pl.BlockSpec((G * C, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((G * C, 1), lambda c, sb, ob: (c, 0)),
            *self_specs,
            *[
                pl.BlockSpec(
                    (dirn.bs_other, other_width),
                    lambda c, sb, ob, G=G, g=g: (ob[G * c + g], 0),
                )
                for g in range(G)
            ],
        ],
        out_specs=pl.BlockSpec(
            (dirn.bs_self, w_out),
            lambda c, sb, ob, G=G: (sb[G * c] - sb[0], 0)),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dirn.out_rows, w_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )


def _blocked_ring_pass(
    dirn: TPBlockedDir, bucket_local, E_self_perm, T_own_perm,
    *, K, parts, highest, rate_floor, interpret, D, ring_ax, dp_ax,
    head=(), precision: str = "high",
):
    """Run one blocked ring pass: D steps, each consuming one bucket's
    segments with the resident visiting table through the shared Pallas
    segment call.  ``E_self_perm``/``T_own_perm`` are the device's own
    tables in LOCALLY PERMUTED order (f32).  Returns (S_alloc, S_other)
    in permuted-local row order, (s_per, K) each.

    ``head``: this direction's `TPHeadTier` tuple with shard-local cell
    stacks of shape (D_steps, hu_r, hip) — per ring step each tier adds
    its dense-corner statistics via one fused MXU kernel
    (`pmf_tpu.ops.dense_head.fused_alloc_tier`): the visiting table's
    first ``hi`` rows are the tier's columns, the device's own rows
    [row_start, row_start + hu) its rows (with DP, replica p owns the
    contiguous band starting at row_start + p * hu_r; the per-pass psum
    over the data axis combines the bands' disjoint contributions)."""
    from pmf_tpu.ops.dense_head import fused_alloc_tier
    from pmf_tpu.ops.pallas.cavi_edge import decompose_bf16, make_edge_stats_call

    sb, ob, loc, xs, row0, nrows = bucket_local
    SEG, C, G = dirn.seg_chunks, dirn.chunk_size, dirn.group
    n_self_pad = dirn.n_self_blocks * dirn.bs_self
    n_other_pad = dirn.n_other_blocks * dirn.bs_other
    out_rows = dirn.out_rows
    dt = jnp.float32

    e_self_t = (E_self_perm.astype(dt) if highest
                else decompose_bf16(E_self_perm, parts))
    e_self_pad = jnp.pad(
        e_self_t, ((0, n_self_pad - e_self_t.shape[0]), (0, 0)))
    KT = e_self_pad.shape[1]

    call = make_edge_stats_call(
        bs_self=dirn.bs_self, bs_other=dirn.bs_other, chunk_size=C,
        KT=KT, K=K, parts=parts, highest=highest, group=G,
        seg_chunks=SEG, out_rows=out_rows, rate_floor=rate_floor,
        interpret=interpret,
    )
    acc0 = jnp.zeros((n_self_pad + out_rows, 2 * K), dt)
    head_data = tuple((t.x_hi, t.x_lo, t.m) for t in head)
    p_rep = (jnp.zeros((), jnp.int32) if dp_ax is None
             else jax.lax.axis_index(dp_ax))

    # ICI bytes: decomposition commutes with rotation (it is per-row), so
    # when the bf16 planes are no wider than the f32 table (parts <= 2)
    # AND no dense head needs the raw f32 values back, rotate the planes
    # instead — halves the ppermute payload at parts=1, matches it at 2.
    pre_dec = (not highest) and parts <= 2 and not head
    T_rot = decompose_bf16(T_own_perm, parts) if pre_dec else T_own_perm

    def body(tabs, xs_s, accs):
        (T,) = tabs
        seg_s, head_s = xs_s
        if highest:
            T_t = T.astype(dt)
        elif pre_dec:
            T_t = T
        else:
            T_t = decompose_bf16(T, parts)
        T_pad = jnp.pad(T_t, ((0, n_other_pad - T_t.shape[0]), (0, 0)))
        (acc,) = accs
        acc = _segment_scan(
            lambda sb_, ob_, l_, x_: call(sb_, ob_, l_, x_, e_self_pad,
                                          *([T_pad] * G)),
            acc, seg_s, SEG=SEG, C=C, out_rows=out_rows, w_out=2 * K)
        for tier, (x_hi, x_lo, m) in zip(head, head_s):
            hu_r = x_hi.shape[-2]
            off = jnp.int32(tier.row_start) + p_rep * jnp.int32(hu_r)
            theta_h = jax.lax.dynamic_slice(
                E_self_perm, (off, jnp.int32(0)), (hu_r, K)).astype(dt)
            beta_h = jnp.pad(T[: tier.hi].astype(dt),
                             ((0, tier.hip - tier.hi), (0, 0)))
            out = fused_alloc_tier(
                theta_h, beta_h, x_hi, m, x_lo, r0=tier.r0,
                rate_floor=rate_floor, precision=precision,
                interpret=interpret)
            contrib = jnp.concatenate(
                [theta_h * out[:, :K], out[:, K:]], axis=1)
            region = jax.lax.dynamic_slice(acc, (off, jnp.int32(0)),
                                           (hu_r, 2 * K))
            acc = jax.lax.dynamic_update_slice(acc, region + contrib,
                                               (off, jnp.int32(0)))
        return (acc,)

    (acc,) = _ring((T_own_perm,),
                   ((sb, ob, loc, xs, row0, nrows), head_data),
                   (acc0,), body, D, ring_ax, dp_ax)
    s_per = E_self_perm.shape[0]
    return acc[:s_per, :K], acc[:s_per, K:]


def _tp_sweep_hpf_blocked_impl(
    state: dict, layout: TPBlockedLayout, a, a_prime, b_prime,
    c, c_prime, d_prime, *, mesh, precision: str = "high",
    interpret: bool = False,
):
    from pmf_tpu.models.hpf import RATE_FLOOR

    parts = {"fast": 1, "mid": 2, "high": 3, "highest": 1}[precision]
    highest = precision == "highest"
    D = layout.n_devices
    info = _mesh_info(mesh)
    ring_ax, dp_ax = info["ring"], info["dp"]
    row, ring = info["row"], P(info["ring"])
    rep = P()
    state_specs = {k: row for k in state}
    dir_specs = (info["bucket"],) * 6

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, dir_specs, dir_specs,
                  info["bucket"], info["bucket"],
                  (ring,) * 4, row, row, (rep,) * 6),
        out_specs=state_specs,
        check_vma=False,
    )
    def _sweep(st, bu, bi, head_u, head_i, perms, counts_u, counts_i, scal):
        av, apv, bpv, cv, cpv, dpv = scal
        head_u, head_i = _head_local(head_u), _head_local(head_i)
        u_o2n, u_n2o, i_o2n, i_n2o = (p.reshape(p.shape[-1]) for p in perms)
        K = st["a_theta"].shape[1]
        dt = st["a_theta"].dtype
        a_xi = apv + K * av
        a_eta = cpv + K * cv

        E_theta = st["a_theta"] / st["b_theta"]
        E_beta = st["a_beta"] / st["b_beta"]
        E_xi = a_xi / st["b_xi"]
        E_eta = a_eta / st["b_eta"]

        def factor_block(dirn, bucket, head_t, E_self, T_other_own,
                         perm_self_o2n, perm_self_n2o, perm_other_o2n,
                         E_rate_prior, counts, shape0):
            s_alloc_p, s_other_p = _blocked_ring_pass(
                dirn, bucket,
                E_self[perm_self_o2n].astype(jnp.float32),
                T_other_own[perm_other_o2n].astype(jnp.float32),
                K=K, parts=parts, highest=highest, rate_floor=RATE_FLOOR,
                interpret=interpret, D=D, ring_ax=ring_ax, dp_ax=dp_ax,
                head=head_t, precision=precision,
            )
            s_alloc = s_alloc_p[perm_self_n2o].astype(dt)
            s_other = s_other_p[perm_self_n2o].astype(dt)
            has = (counts > 0)[:, None]
            a_out = jnp.where(has, shape0 + s_alloc, jnp.asarray(shape0, dt))
            b_out = jnp.where(has, E_rate_prior[:, None] + s_other,
                              E_rate_prior[:, None])
            return a_out, b_out

        a_t, b_t = factor_block(layout.by_user, _dir_local_t(bu), head_u,
                                E_theta, E_beta, u_o2n, u_n2o, i_o2n,
                                E_xi, counts_u, av)
        E_theta = a_t / b_t
        b_xi = bpv + jnp.sum(E_theta, axis=1)
        a_b, b_b = factor_block(layout.by_item, _dir_local_t(bi), head_i,
                                E_beta, E_theta, i_o2n, i_n2o, u_o2n,
                                E_eta, counts_i, cv)
        E_beta = a_b / b_b
        b_eta = dpv + jnp.sum(E_beta, axis=1)
        return {"a_theta": a_t, "b_theta": b_t, "a_beta": a_b,
                "b_beta": b_b, "b_xi": b_xi, "b_eta": b_eta}

    dt = state["a_theta"].dtype
    bu = _dir_data(layout.by_user)
    bi = _dir_data(layout.by_item)
    perms = (layout.u_old_of_new, layout.u_new_of_old,
             layout.i_old_of_new, layout.i_new_of_old)
    scal = tuple(jnp.asarray(v, dt) for v in
                 (a, a_prime, b_prime, c, c_prime, d_prime))
    return _sweep(state, bu, bi, layout.head_user, layout.head_item,
                  perms, layout.user_counts, layout.item_counts, scal)


@partial(jax.jit, static_argnames=("mesh", "precision", "interpret"))
def _hpf_blocked_jit(state, layout, scal, *, mesh, precision, interpret):
    return _tp_sweep_hpf_blocked_impl(state, layout, *scal, mesh=mesh,
                                      precision=precision,
                                      interpret=interpret)


def tp_sweep_hpf_blocked(
    state: dict, layout: TPBlockedLayout, a, a_prime, b_prime,
    c, c_prime, d_prime, *, mesh, precision: str = "high",
    interpret: bool = False,
):
    """One full HPF CAVI iteration, row-sharded, with the blocked Pallas
    kernel inside the ring — the reference's exact theta -> xi -> beta ->
    eta order (`/root/reference/src/models/hpf_cavi.py:121-193`), same
    fixed point as `pmf_tpu.parallel.tp.tp_sweep_hpf` to kernel rounding.

    Dispatches through one module-level jitted entry per family (the
    impl builds a fresh `shard_map` closure, so an UNCACHED direct call
    would re-trace and re-lower the Mosaic kernels on every sweep —
    measured ~2 min/iteration through the remote-compile tunnel at
    ML-25M, work-independent.  The jit makes repeated direct calls —
    bench, notebooks — steady-state, exactly like the `fit(mesh=)`
    facades' per-fit jit wrapper; hyperparameters ride as traced scalars
    so they never retrace)."""
    dt = state["a_theta"].dtype
    scal = tuple(jnp.asarray(v, dt)
                 for v in (a, a_prime, b_prime, c, c_prime, d_prime))
    return _hpf_blocked_jit(state, layout, scal, mesh=mesh,
                            precision=precision, interpret=interpret)


def _tp_sweep_poisson_blocked_impl(
    state: dict, layout: TPBlockedLayout, a0, b0, *, mesh,
    precision: str = "high", interpret: bool = False,
):
    from pmf_tpu.models.poisson_mf import RATE_FLOOR

    parts = {"fast": 1, "mid": 2, "high": 3, "highest": 1}[precision]
    highest = precision == "highest"
    D = layout.n_devices
    info = _mesh_info(mesh)
    ring_ax, dp_ax = info["ring"], info["dp"]
    row, ring = info["row"], P(info["ring"])
    rep = P()
    state_specs = {k: row for k in state}
    dir_specs = (info["bucket"],) * 6

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, dir_specs, dir_specs,
                  info["bucket"], info["bucket"],
                  (ring,) * 4, row, row, rep, rep),
        out_specs=state_specs,
        check_vma=False,
    )
    def _sweep(st, bu, bi, head_u, head_i, perms, counts_u, counts_i,
               a0v, b0v):
        u_o2n, u_n2o, i_o2n, i_n2o = (p.reshape(p.shape[-1]) for p in perms)
        head_u, head_i = _head_local(head_u), _head_local(head_i)
        K = st["a_theta"].shape[1]
        dt = st["a_theta"].dtype
        E_theta = st["a_theta"] / st["b_theta"]
        E_beta = st["a_beta"] / st["b_beta"]

        def plain_block(dirn, bucket, head_t, E_self, T_other_own,
                        perm_self_o2n, perm_self_n2o, perm_other_o2n,
                        counts):
            s_alloc_p, s_other_p = _blocked_ring_pass(
                dirn, bucket,
                E_self[perm_self_o2n].astype(jnp.float32),
                T_other_own[perm_other_o2n].astype(jnp.float32),
                K=K, parts=parts, highest=highest, rate_floor=RATE_FLOOR,
                interpret=interpret, D=D, ring_ax=ring_ax, dp_ax=dp_ax,
                head=head_t, precision=precision,
            )
            s_alloc = s_alloc_p[perm_self_n2o].astype(dt)
            s_other = s_other_p[perm_self_n2o].astype(dt)
            has = (counts > 0)[:, None]
            a_out = jnp.where(has, a0v + s_alloc, jnp.asarray(a0v, dt))
            b_out = jnp.where(has, b0v + s_other, jnp.asarray(b0v, dt))
            return a_out, b_out

        a_t, b_t = plain_block(layout.by_user, _dir_local_t(bu), head_u,
                               E_theta, E_beta, u_o2n, u_n2o, i_o2n,
                               counts_u)
        E_theta = a_t / b_t
        a_b, b_b = plain_block(layout.by_item, _dir_local_t(bi), head_i,
                               E_beta, E_theta, i_o2n, i_n2o, u_o2n,
                               counts_i)
        return {"a_theta": a_t, "b_theta": b_t,
                "a_beta": a_b, "b_beta": b_b}

    dt = state["a_theta"].dtype
    bu = _dir_data(layout.by_user)
    bi = _dir_data(layout.by_item)
    perms = (layout.u_old_of_new, layout.u_new_of_old,
             layout.i_old_of_new, layout.i_new_of_old)
    return _sweep(state, bu, bi, layout.head_user, layout.head_item,
                  perms, layout.user_counts,
                  layout.item_counts, jnp.asarray(a0, dt),
                  jnp.asarray(b0, dt))


@partial(jax.jit, static_argnames=("mesh", "precision", "interpret"))
def _poisson_blocked_jit(state, layout, a0, b0, *, mesh, precision,
                         interpret):
    return _tp_sweep_poisson_blocked_impl(state, layout, a0, b0, mesh=mesh,
                                          precision=precision,
                                          interpret=interpret)


def tp_sweep_poisson_blocked(
    state: dict, layout: TPBlockedLayout, a0, b0, *, mesh,
    precision: str = "high", interpret: bool = False,
):
    """One full plain-Poisson-MF CAVI iteration, row-sharded, blocked
    kernel inside the ring — user block -> refresh -> item block
    (`/root/reference/src/models/poisson_mf_cavi.py:86-219`).  Jitted
    dispatch: see `tp_sweep_hpf_blocked`."""
    dt = state["a_theta"].dtype
    return _poisson_blocked_jit(state, layout, jnp.asarray(a0, dt),
                                jnp.asarray(b0, dt), mesh=mesh,
                                precision=precision, interpret=interpret)


def _tp_sweep_gaussian_blocked_impl(
    state: dict, layout: TPBlockedLayout, sigma2, eta_theta2, eta_beta2,
    eta_bias2, *, use_bias: bool, covariance: str, mesh,
    precision: str = "high", interpret: bool = False,
    bias_update: str = "exact",
):
    """One full Gaussian CAVI iteration, row-sharded, with the Gaussian
    blocked kernels inside the rings — the reference's exact block order
    theta -> beta -> b_user -> b_item
    (`/root/reference/src/models/gaussian_mf_cavi_bias.py:125-263`).

    The Gaussian edge kernels are pure pass-through over an AUGMENTED
    other-side table (`pmf_tpu.ops.pallas.gaussian_edge`): the factor
    pass rotates ``[m | b | triu(V + m m^T)]`` (or the diag moment
    table), the bias pass rotates ``[m | b]``, and every per-self-row
    term (b_self residual fold, the m_self contraction, the batched PSD
    inverses) applies locally after the ring — so the ring carries
    exactly one f32 table per pass, decomposed to bf16 parts per step.

    ``bias_update="lagged"`` (full covariance + biases) drops BOTH bias
    ring passes — 2 rings/iter instead of 4: the bias sufficient
    statistics ``(S_m, S_x, S_b)`` ride the factor kernels' payload
    lanes (`_factor_kernel(with_bias_stats=True)`), and the bias blocks
    become per-self-row closed forms applied locally after each factor
    ring, in the single-chip lagged order theta -> b_user -> beta ->
    b_item (same fixed point: `models/gaussian_mf.sweep`,
    tests/test_gaussian_lagged.py)."""
    if layout.head_user or layout.head_item:
        raise ValueError(
            "the Gaussian TP blocked ring does not consume a dense head; "
            "build the TP layout with head=None for this family")
    from pmf_tpu.ops.pallas.gaussian_edge import (
        _FACTOR_PARTS,
        _PARTS,
        _bias_kernel,
        _diag_kernel,
        _factor_kernel,
        _tri_size,
        pack_tri,
        unpack_tri,
    )
    from pmf_tpu.models.gaussian_mf import _bias_block_lagged
    from pmf_tpu.ops.solve import batched_psd_inverse

    import functools as _ft

    full = covariance == "full"
    lagged = use_bias and bias_update == "lagged"
    if bias_update not in ("exact", "lagged"):
        raise ValueError(f"unknown bias_update {bias_update!r}")
    if lagged and not full:
        raise ValueError(
            "bias_update='lagged' requires covariance='full' in the TP "
            "blocked engine (the diag kernel carries no bias-stat payload)"
        )
    p_mb, p_A = _FACTOR_PARTS[precision]
    d_parts = _PARTS[precision]
    highest = precision == "highest"
    d_parts = max(d_parts, 1)
    D = layout.n_devices
    info = _mesh_info(mesh)
    ring_ax, dp_ax = info["ring"], info["dp"]
    row, ring = info["row"], P(info["ring"])
    rep = P()
    state_specs = {k: row for k in state}
    dir_specs = (info["bucket"],) * 6
    f32 = jnp.float32

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, dir_specs, dir_specs,
                  (ring,) * 4, row, row, (rep,) * 4),
        out_specs=state_specs,
        check_vma=False,
    )
    def _sweep(st, bu, bi, perms, counts_u, counts_i, scal):
        s2, et2, eb2, ebias2 = scal
        u_o2n, u_n2o, i_o2n, i_n2o = (p.reshape(p.shape[-1]) for p in perms)
        m_t, V_t = st["m_theta"], st["V_theta"]
        m_b, V_b = st["m_beta"], st["V_beta"]
        b_u, b_i = st["b_user"], st["b_item"]
        dt = m_t.dtype
        K = m_t.shape[-1]
        T = _tri_size(K)

        from pmf_tpu.ops.pallas.cavi_edge import decompose_bf16

        def dec(t, parts):
            return t.astype(f32) if highest else decompose_bf16(t, parts)

        def ring_stats(dirn, bucket, kernel, w_out, T_rot, selftab=None):
            """Run one ring pass of a pass-through Gaussian kernel.
            ``T_rot`` is the owner's table ALREADY decomposed to the
            kernel's bf16 parts (f32 in "highest") — the decomposition is
            per-row, so doing it before the ring is exactly equivalent to
            per-step, and the ppermute payload shrinks to the bf16 planes
            (VERDICT r4 #6: the f32 231-lane augmented table made the
            Gaussian ring ICI-bound from D=2; "mid" rotates 1.83x fewer
            bytes, "fast" 2x).  Returns the accumulated (s_per-trimmed
            later) window accumulator."""
            SEG, C, G = dirn.seg_chunks, dirn.chunk_size, dirn.group
            n_self_pad = dirn.n_self_blocks * dirn.bs_self
            n_other_pad = dirn.n_other_blocks * dirn.bs_other
            out_rows = dirn.out_rows
            sb, ob, loc, xs, row0, nrows = bucket
            self_args = ()
            self_width = None
            if selftab is not None:
                spad = jnp.pad(
                    selftab, ((0, n_self_pad - selftab.shape[0]), (0, 0)))
                self_args = (spad,)
                self_width = spad.shape[1]

            call = _make_generic_call(
                kernel, dirn, w_out=w_out, self_width=self_width,
                other_width=T_rot.shape[1], interpret=interpret)
            acc0 = jnp.zeros((n_self_pad + out_rows, w_out), f32)

            def body(tabs, xs_s, accs):
                (Tt,) = tabs
                aug = jnp.pad(Tt, ((0, n_other_pad - Tt.shape[0]), (0, 0)))
                (acc,) = accs
                acc = _segment_scan(
                    lambda sb_, ob_, l_, x_: call(sb_, ob_, l_, x_,
                                                  *self_args,
                                                  *([aug] * G)),
                    acc, xs_s, SEG=SEG, C=C, out_rows=out_rows, w_out=w_out)
                return (acc,)

            (acc,) = _ring((T_rot,), (sb, ob, loc, xs, row0, nrows),
                           (acc0,), body, D, ring_ax, dp_ax)
            return acc

        def factor_block_full(dirn, bucket, m_self, V_self, m_other_own,
                              V_other_own, b_self, b_other_own,
                              perm_self_o2n, perm_self_n2o, perm_other_o2n,
                              counts, eta2):
            A_flat = (V_other_own
                      + m_other_own[:, :, None] * m_other_own[:, None, :]
                      ).reshape(-1, K * K)
            bcol = (b_other_own if use_bias
                    else jnp.zeros_like(m_other_own[:, 0]))
            T_own = jnp.concatenate(
                [m_other_own.astype(f32), bcol.astype(f32)[:, None],
                 pack_tri(A_flat, K).astype(f32)], axis=1
            )[perm_other_o2n]
            # Decompose the two payload sections to their bf16 parts
            # BEFORE the ring (exactly equivalent; fewer rotated bytes).
            T_rot = jnp.concatenate(
                [dec(T_own[:, : K + 1], p_mb), dec(T_own[:, K + 1 :], p_A)],
                axis=1)

            kernel = _ft.partial(
                _factor_kernel, bs_self=dirn.bs_self, bs_other=dirn.bs_other,
                chunk_size=dirn.chunk_size, p_mb=p_mb, p_A=p_A,
                highest=highest, k=K, use_bias=use_bias, group=dirn.group,
                with_bias_stats=lagged,
            )
            w_out = 2 * K + T + (2 if lagged else 0)
            acc = ring_stats(dirn, bucket, kernel, w_out, T_rot)
            s_per = m_self.shape[0]
            out = acc[:s_per][perm_self_n2o].astype(dt)
            S_w, S_m = out[:, :K], out[:, K : 2 * K]
            if use_bias:
                S_w = S_w - b_self[:, None] * S_m
            S_A = unpack_tri(out[:, 2 * K : 2 * K + T], K)
            eye = jnp.eye(K, dtype=dt)
            prec = eye / jnp.asarray(eta2, dt) + S_A / jnp.asarray(s2, dt)
            V_new = batched_psd_inverse(prec)
            m_new = jnp.einsum("rkl,rl->rk", V_new, S_w) / jnp.asarray(s2, dt)
            has = (counts > 0)[:, None]
            m_out = jnp.where(has, m_new, m_self)
            V_out = jnp.where(has[:, :, None], V_new, V_self)
            if lagged:
                # (S_m, S_x, S_b): the bias block's sufficient statistics,
                # collected on the factor payload lanes.
                return m_out, V_out, (S_m, out[:, 2 * K + T],
                                      out[:, 2 * K + T + 1])
            return m_out, V_out

        def factor_block_diag(dirn, bucket, m_self, v_self, m_other_own,
                              v_other_own, b_self, b_other_own,
                              perm_self_o2n, perm_self_n2o, perm_other_o2n,
                              counts, eta2):
            bcol = (b_other_own if use_bias
                    else jnp.zeros_like(m_other_own[:, 0]))
            T_own = jnp.concatenate(
                [m_other_own.astype(f32),
                 (v_other_own + m_other_own * m_other_own).astype(f32),
                 bcol.astype(f32)[:, None]], axis=1)[perm_other_o2n]
            selftab = dec(jnp.concatenate(
                [m_self.astype(f32), b_self.astype(f32)[:, None]],
                axis=1)[perm_self_o2n], d_parts)

            kernel = _ft.partial(
                _diag_kernel, bs_self=dirn.bs_self, bs_other=dirn.bs_other,
                chunk_size=dirn.chunk_size, parts=d_parts, highest=highest,
                k=K, use_bias=use_bias, group=dirn.group,
            )
            acc = ring_stats(dirn, bucket, kernel, 3 * K,
                             dec(T_own, d_parts), selftab=selftab)
            s_per = m_self.shape[0]
            out = acc[:s_per][perm_self_n2o].astype(dt)
            S_mr, S_sq, S_mm = out[:, :K], out[:, K : 2 * K], out[:, 2 * K :]
            prec = 1.0 / jnp.asarray(eta2, dt) + S_sq / jnp.asarray(s2, dt)
            v_new = 1.0 / prec
            m_new = (S_mr + m_self * S_mm) / (jnp.asarray(s2, dt) * prec)
            has = (counts > 0)[:, None]
            return (jnp.where(has, m_new, m_self),
                    jnp.where(has, v_new, v_self))

        def bias_block(dirn, bucket, b_self, b_other_own, m_self,
                       m_other_own, perm_self_o2n, perm_self_n2o,
                       perm_other_o2n, counts):
            T_own = jnp.concatenate(
                [m_other_own.astype(f32), b_other_own.astype(f32)[:, None]],
                axis=1)[perm_other_o2n]

            kernel = _ft.partial(
                _bias_kernel, bs_self=dirn.bs_self, bs_other=dirn.bs_other,
                chunk_size=dirn.chunk_size, parts=d_parts, highest=highest,
                k=K, group=dirn.group,
            )
            acc = ring_stats(dirn, bucket, kernel, K + 2,
                             dec(T_own, d_parts))
            s_per = b_self.shape[0]
            out = acc[:s_per][perm_self_n2o].astype(dt)
            S_m, S_b, S_x = out[:, :K], out[:, K], out[:, K + 1]
            s = S_x - S_b - jnp.sum(m_self * S_m, axis=1)
            prec = (1.0 / jnp.asarray(ebias2, dt)
                    + counts.astype(dt) / jnp.asarray(s2, dt))
            return jnp.where(counts > 0, s / (prec * jnp.asarray(s2, dt)),
                             b_self)

        factor_block = factor_block_full if full else factor_block_diag
        if lagged:
            # theta -> b_user -> beta -> b_item, 2 ring passes total: the
            # bias closed forms are local (stats rode the factor rings).
            m_t, V_t, (S_m_u, S_x_u, S_b_u) = factor_block(
                layout.by_user, _dir_local_t(bu), m_t, V_t, m_b, V_b,
                b_u, b_i, u_o2n, u_n2o, i_o2n, counts_u, et2)
            b_u = _bias_block_lagged(b_u, m_t, S_m_u, S_x_u, S_b_u,
                                     counts_u.astype(dt), ebias2, s2)
            m_b, V_b, (S_m_i, S_x_i, S_b_i) = factor_block(
                layout.by_item, _dir_local_t(bi), m_b, V_b, m_t, V_t,
                b_i, b_u, i_o2n, i_n2o, u_o2n, counts_i, eb2)
            b_i = _bias_block_lagged(b_i, m_b, S_m_i, S_x_i, S_b_i,
                                     counts_i.astype(dt), ebias2, s2)
            return {"m_theta": m_t, "V_theta": V_t, "m_beta": m_b,
                    "V_beta": V_b, "b_user": b_u, "b_item": b_i}
        m_t, V_t = factor_block(layout.by_user, _dir_local_t(bu),
                                m_t, V_t, m_b, V_b, b_u, b_i,
                                u_o2n, u_n2o, i_o2n, counts_u, et2)
        m_b, V_b = factor_block(layout.by_item, _dir_local_t(bi),
                                m_b, V_b, m_t, V_t, b_i, b_u,
                                i_o2n, i_n2o, u_o2n, counts_i, eb2)
        if use_bias:
            b_u = bias_block(layout.by_user, _dir_local_t(bu), b_u, b_i,
                             m_t, m_b, u_o2n, u_n2o, i_o2n, counts_u)
            b_i = bias_block(layout.by_item, _dir_local_t(bi), b_i, b_u,
                             m_b, m_t, i_o2n, i_n2o, u_o2n, counts_i)
        return {"m_theta": m_t, "V_theta": V_t, "m_beta": m_b,
                "V_beta": V_b, "b_user": b_u, "b_item": b_i}

    dt = state["m_theta"].dtype
    bu = _dir_data(layout.by_user)
    bi = _dir_data(layout.by_item)
    perms = (layout.u_old_of_new, layout.u_new_of_old,
             layout.i_old_of_new, layout.i_new_of_old)
    scal = tuple(jnp.asarray(v, dt) for v in
                 (sigma2, eta_theta2, eta_beta2, eta_bias2))
    return _sweep(state, bu, bi, perms, layout.user_counts,
                  layout.item_counts, scal)


@partial(jax.jit, static_argnames=("use_bias", "covariance", "mesh",
                                   "precision", "interpret", "bias_update"))
def _gaussian_blocked_jit(state, layout, scal, *, use_bias, covariance,
                          mesh, precision, interpret, bias_update):
    return _tp_sweep_gaussian_blocked_impl(
        state, layout, *scal, use_bias=use_bias, covariance=covariance,
        mesh=mesh, precision=precision, interpret=interpret,
        bias_update=bias_update)


def tp_sweep_gaussian_blocked(
    state: dict, layout: TPBlockedLayout, sigma2, eta_theta2, eta_beta2,
    eta_bias2, *, use_bias: bool, covariance: str, mesh,
    precision: str = "high", interpret: bool = False,
    bias_update: str = "exact",
):
    """One full Gaussian CAVI iteration, row-sharded, with the Gaussian
    blocked kernels inside the rings — the reference's exact block order
    theta -> beta -> b_user -> b_item
    (`/root/reference/src/models/gaussian_mf_cavi_bias.py:125-263`);
    `bias_update="lagged"` folds both bias blocks' statistics into the
    factor passes' payload lanes (2 ring passes/iter).  Jitted dispatch:
    see `tp_sweep_hpf_blocked`."""
    dt = state["m_theta"].dtype
    scal = tuple(jnp.asarray(v, dt) for v in
                 (sigma2, eta_theta2, eta_beta2, eta_bias2))
    return _gaussian_blocked_jit(state, layout, scal, use_bias=use_bias,
                                 covariance=covariance, mesh=mesh,
                                 precision=precision, interpret=interpret,
                                 bias_update=bias_update)


def _tp_sweep_poisson_ext_blocked_impl(
    state: dict, layout: TPBlockedLayout, a0, b0, *, mesh,
    precision: str = "high", interpret: bool = False,
):
    """One full EXTENDED Poisson-MF CAVI iteration, row-sharded, blocked
    kernels inside the rings.  Matches the flat two-ring structure
    (`pmf_tpu.parallel.tp.tp_sweep_poisson(extended=True)`): per side,
    ring pass 1 accumulates the factor allocation (unscaled tables — the
    scalars cancel in the multinomial allocation, docs/MODELS.md §4) and
    the scalar-weighted rate sum; ring pass 2 re-walks the edges against
    the UPDATED factor rows for the scalar's Gauss-Seidel rate.  The
    rotating table carries ``[E_factor | E_scalar]`` as K+1 columns; the
    scalar statistics come from a second kernel invocation on the
    pre-scaled table (its ``S_other`` output) and a ``mode="raw"``
    invocation (its row-summed ``S_alloc``).  The scalar SHAPE uses the
    precomputed per-row rating sums (`TPBlockedLayout.x_sum_*`).

    Dense head: per tier and ring step, pass 1 adds the allocation via
    the fused tier kernel (unscaled visiting factors — the scalars
    cancel in the allocation, docs/MODELS.md §4) and the psi-weighted
    rate sum as one dense ``M @ (s ∘ E_vis)`` matmul (the single-chip
    `ext_head_stats` form); pass 2 adds ``theta_new ∘ (M @ (s ∘
    E_vis))``, whose row-sum is exactly the head edges' scalar rate
    ``sum_e s_e <theta_new, E_vis>`` (the `ext_scalar_stats` identity:
    sum_i M_ui s_i <t_u, b_i> = <t_u, (M @ sb)_u>)."""
    from pmf_tpu.models.poisson_mf import RATE_FLOOR
    from pmf_tpu.ops.dense_head import _prec, fused_alloc_tier
    from pmf_tpu.ops.pallas.cavi_edge import decompose_bf16, make_edge_stats_call

    parts = {"fast": 1, "mid": 2, "high": 3, "highest": 1}[precision]
    highest = precision == "highest"
    D = layout.n_devices
    info = _mesh_info(mesh)
    ring_ax, dp_ax = info["ring"], info["dp"]
    row, ring = info["row"], P(info["ring"])
    rep = P()
    state_specs = {k: row for k in state}
    dir_specs = (info["bucket"],) * 6

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, dir_specs, dir_specs,
                  info["bucket"], info["bucket"],
                  (ring,) * 4, (row,) * 4, rep, rep),
        out_specs=state_specs,
        check_vma=False,
    )
    def _sweep(st, bu, bi, head_u, head_i, perms, rowstats, a0v, b0v):
        u_o2n, u_n2o, i_o2n, i_n2o = (p.reshape(p.shape[-1]) for p in perms)
        head_u, head_i = _head_local(head_u), _head_local(head_i)
        counts_u, counts_i, sx_u, sx_i = rowstats
        K = st["a_theta"].shape[1]
        dt = st["a_theta"].dtype
        f32 = jnp.float32
        p_rep = (jnp.zeros((), jnp.int32) if dp_ax is None
                 else jax.lax.axis_index(dp_ax))
        mprec = _prec(precision)

        E_theta = st["a_theta"] / st["b_theta"]
        E_beta = st["a_beta"] / st["b_beta"]
        E_phi = st["a_phi"] / st["b_phi"]
        E_psi = st["a_psi"] / st["b_psi"]

        def ext_block(dirn, bucket, head_t, E_self, E_other_own, s_other_own,
                      perm_self_o2n, perm_self_n2o, perm_other_o2n,
                      counts, sx):
            SEG, C, G = dirn.seg_chunks, dirn.chunk_size, dirn.group
            n_self_pad = dirn.n_self_blocks * dirn.bs_self
            n_other_pad = dirn.n_other_blocks * dirn.bs_other
            out_rows = dirn.out_rows
            s_per = E_self.shape[0]
            sb, ob, loc, xs, row0, nrows = bucket

            E_self_p = E_self[perm_self_o2n].astype(f32)
            e_self_t = (E_self_p if highest
                        else decompose_bf16(E_self_p, parts))
            e_self_pad = jnp.pad(
                e_self_t, ((0, n_self_pad - s_per), (0, 0)))
            KT = e_self_pad.shape[1]
            # Rotating table: [E_factor | E_scalar] of the OWN shard,
            # locally permuted (K+1 columns, one ppermute stream).
            T_own = jnp.concatenate(
                [E_other_own[perm_other_o2n].astype(f32),
                 s_other_own[perm_other_o2n].astype(f32)[:, None]], axis=1)

            call = make_edge_stats_call(
                bs_self=dirn.bs_self, bs_other=dirn.bs_other, chunk_size=C,
                KT=KT, K=K, parts=parts, highest=highest, group=G,
                seg_chunks=SEG, out_rows=out_rows, rate_floor=RATE_FLOOR,
                interpret=interpret,
            )
            call_raw = make_edge_stats_call(
                bs_self=dirn.bs_self, bs_other=dirn.bs_other, chunk_size=C,
                KT=KT, K=K, parts=parts, highest=highest, group=G,
                seg_chunks=SEG, out_rows=out_rows, rate_floor=RATE_FLOOR,
                interpret=interpret, mode="raw",
            )

            def split_tables(T):
                E_vis = T[:, :K]
                s_vis = T[:, K]
                scaled = s_vis[:, None] * E_vis

                def prep(t):
                    tt = t if highest else decompose_bf16(t, parts)
                    return jnp.pad(tt, ((0, n_other_pad - t.shape[0]), (0, 0)))

                return prep(E_vis), prep(scaled)

            head_data = tuple((t.x_hi, t.x_lo, t.m) for t in head_t)

            def tier_tables(tier, T):
                """One tier's f32 head tables from the resident visiting
                [E | s] table: (E_vis[:hi] padded to hip, (s ∘ E_vis)[:hi]
                padded to hip)."""
                E_vis = T[: tier.hi, :K].astype(f32)
                s_vis = T[: tier.hi, K].astype(f32)
                pad = ((0, tier.hip - tier.hi), (0, 0))
                return jnp.pad(E_vis, pad), jnp.pad(s_vis[:, None] * E_vis,
                                                    pad)

            def add_rows(acc, contrib, off):
                region = jax.lax.dynamic_slice(
                    acc, (off, jnp.int32(0)), contrib.shape)
                return jax.lax.dynamic_update_slice(
                    acc, region + contrib, (off, jnp.int32(0)))

            acc0 = jnp.zeros((n_self_pad + out_rows, 2 * K), f32)

            def body1(tabs, xs_s, accs):
                (T,) = tabs
                seg_s, head_s = xs_s
                E_pad, scaled_pad = split_tables(T)
                acc_a, acc_w = accs
                acc_a = _segment_scan(
                    lambda sb_, ob_, l_, x_: call(
                        sb_, ob_, l_, x_, e_self_pad, *([E_pad] * G)),
                    acc_a, seg_s, SEG=SEG, C=C, out_rows=out_rows,
                    w_out=2 * K)
                acc_w = _segment_scan(
                    lambda sb_, ob_, l_, x_: call(
                        sb_, ob_, l_, x_, e_self_pad, *([scaled_pad] * G)),
                    acc_w, seg_s, SEG=SEG, C=C, out_rows=out_rows,
                    w_out=2 * K)
                for tier, (x_hi, x_lo, m) in zip(head_t, head_s):
                    hu_r = x_hi.shape[-2]
                    off = (jnp.int32(tier.row_start)
                           + p_rep * jnp.int32(hu_r))
                    th = jax.lax.dynamic_slice(
                        E_self_p, (off, jnp.int32(0)), (hu_r, K))
                    bh, sbh = tier_tables(tier, T)
                    out = fused_alloc_tier(
                        th, bh, x_hi, m, x_lo, r0=tier.r0,
                        rate_floor=RATE_FLOOR, precision=precision,
                        interpret=interpret)
                    sa = th * out[:, :K]
                    sw = jax.lax.dot(m.astype(f32), sbh,
                                     preferred_element_type=f32,
                                     precision=mprec)
                    acc_a = add_rows(
                        acc_a, jnp.concatenate([sa, jnp.zeros_like(sa)], 1),
                        off)
                    acc_w = add_rows(
                        acc_w, jnp.concatenate([jnp.zeros_like(sw), sw], 1),
                        off)
                return acc_a, acc_w

            acc_a, acc_w = _ring((T_own,),
                                 ((sb, ob, loc, xs, row0, nrows), head_data),
                                 (acc0, acc0), body1, D, ring_ax, dp_ax)
            s_alloc = acc_a[:s_per, :K][perm_self_n2o].astype(dt)
            s_wother = acc_w[:s_per, K:][perm_self_n2o].astype(dt)
            has = (counts > 0)[:, None]
            a_fac = jnp.where(has, a0v + s_alloc, jnp.asarray(a0v, dt))
            b_fac = jnp.where(has, b0v + s_wother, jnp.asarray(b0v, dt))

            # Ring pass 2: scalar rate against the UPDATED factor rows.
            E_new_p = (a_fac / b_fac)[perm_self_o2n].astype(f32)
            e_new_t = E_new_p if highest else decompose_bf16(E_new_p, parts)
            e_new_pad = jnp.pad(e_new_t, ((0, n_self_pad - s_per), (0, 0)))

            def body2(tabs, xs_s, accs):
                (T,) = tabs
                seg_s, head_s = xs_s
                _, scaled_pad = split_tables(T)
                (acc,) = accs
                acc = _segment_scan(
                    lambda sb_, ob_, l_, x_: call_raw(
                        sb_, ob_, l_, x_, e_new_pad, *([scaled_pad] * G)),
                    acc, seg_s, SEG=SEG, C=C, out_rows=out_rows,
                    w_out=2 * K)
                for tier, (x_hi, x_lo, m) in zip(head_t, head_s):
                    hu_r = x_hi.shape[-2]
                    off = (jnp.int32(tier.row_start)
                           + p_rep * jnp.int32(hu_r))
                    th_new = jax.lax.dynamic_slice(
                        E_new_p, (off, jnp.int32(0)), (hu_r, K))
                    _, sbh = tier_tables(tier, T)
                    sw = jax.lax.dot(m.astype(f32), sbh,
                                     preferred_element_type=f32,
                                     precision=mprec)
                    contrib = th_new * sw  # row-sum = sum_e s_e <t, b>
                    acc = add_rows(
                        acc,
                        jnp.concatenate([contrib, jnp.zeros_like(contrib)],
                                        1),
                        off)
                return (acc,)

            (acc2,) = _ring((T_own,),
                            ((sb, ob, loc, xs, row0, nrows), head_data),
                            (acc0,), body2, D, ring_ax, dp_ax)
            s_sdot = jnp.sum(acc2[:s_per, :K], axis=1)[perm_self_n2o].astype(dt)
            has1 = counts > 0
            a_s = jnp.where(has1, a0v + sx.astype(dt), jnp.asarray(a0v, dt))
            b_s = jnp.where(has1, b0v + s_sdot, jnp.asarray(b0v, dt))
            return a_fac, b_fac, a_s, b_s

        a_t, b_t, a_phi, b_phi = ext_block(
            layout.by_user, _dir_local_t(bu), head_u, E_theta, E_beta, E_psi,
            u_o2n, u_n2o, i_o2n, counts_u, sx_u)
        E_theta_new = a_t / b_t
        E_phi_new = a_phi / b_phi
        a_b, b_b, a_psi, b_psi = ext_block(
            layout.by_item, _dir_local_t(bi), head_i, E_beta, E_theta_new,
            E_phi_new, i_o2n, i_n2o, u_o2n, counts_i, sx_i)
        return {"a_theta": a_t, "b_theta": b_t, "a_beta": a_b, "b_beta": b_b,
                "a_phi": a_phi, "b_phi": b_phi, "a_psi": a_psi,
                "b_psi": b_psi}

    dt = state["a_theta"].dtype
    bu = _dir_data(layout.by_user)
    bi = _dir_data(layout.by_item)
    perms = (layout.u_old_of_new, layout.u_new_of_old,
             layout.i_old_of_new, layout.i_new_of_old)
    rowstats = (layout.user_counts, layout.item_counts,
                layout.x_sum_user, layout.x_sum_item)
    return _sweep(state, bu, bi, layout.head_user, layout.head_item,
                  perms, rowstats, jnp.asarray(a0, dt), jnp.asarray(b0, dt))


@partial(jax.jit, static_argnames=("mesh", "precision", "interpret"))
def _poisson_ext_blocked_jit(state, layout, a0, b0, *, mesh, precision,
                             interpret):
    return _tp_sweep_poisson_ext_blocked_impl(
        state, layout, a0, b0, mesh=mesh, precision=precision,
        interpret=interpret)


def tp_sweep_poisson_ext_blocked(
    state: dict, layout: TPBlockedLayout, a0, b0, *, mesh,
    precision: str = "high", interpret: bool = False,
):
    """One full EXTENDED Poisson-MF CAVI iteration, row-sharded, blocked
    kernels inside the rings (two ring passes per side for the
    Gauss-Seidel scalar refresh).  Jitted dispatch: see
    `tp_sweep_hpf_blocked`."""
    dt = state["a_theta"].dtype
    return _poisson_ext_blocked_jit(state, layout, jnp.asarray(a0, dt),
                                    jnp.asarray(b0, dt), mesh=mesh,
                                    precision=precision,
                                    interpret=interpret)


def _dir_data(d: TPBlockedDir) -> tuple:
    """The six shard_map-carried data arrays of a direction."""
    return (d.sb, d.ob, d.loc, d.x, d.seg_row0, d.seg_nrows)


def _dir_local_t(bucket_tuple) -> tuple:
    """Strip sliced leading axes from the shard_map-local bucket arrays:
    each becomes (D_steps, n_segments, ...)."""
    sb, ob, loc, xs, row0, nrows = bucket_tuple

    def fix3(a):  # (1, [1,] D, n_seg, T) -> (D, n_seg, T)
        return a.reshape(a.shape[-3], a.shape[-2], a.shape[-1])

    def fix2(a):  # (1, [1,] D, n_seg) -> (D, n_seg)
        return a.reshape(a.shape[-2], a.shape[-1])

    return fix3(sb), fix3(ob), fix3(loc), fix3(xs), fix2(row0), fix2(nrows)


def _head_local(tiers) -> tuple:
    """Strip sliced leading axes from the shard_map-local head stacks:
    each cell array becomes (D_steps, hu_r, hip)."""

    def fix(a):
        return (None if a is None
                else a.reshape(a.shape[-3], a.shape[-2], a.shape[-1]))

    return tuple(
        dataclasses.replace(t, x_hi=fix(t.x_hi), x_lo=fix(t.x_lo),
                            m=fix(t.m))
        for t in tiers
    )
