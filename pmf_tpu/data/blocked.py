"""Blocked COO layout — the MXU-friendly edge representation.

XLA's gather/scatter on (nnz, K) arrays with K ~ 20 runs ~50-100x below
HBM bandwidth on TPU (narrow rows, random access).  This layout removes
random access entirely: edges are grouped into (self_block, other_block)
tiles of factor rows; within a chunk every edge addresses rows of ONE
self block and ONE other block by small local indices.  A Pallas kernel
then loads the two factor blocks into VMEM and performs per-edge gathers
and per-row segment sums as one-hot matmuls on the 128x128 MXU
(`pmf_tpu.ops.pallas.cavi_edge`).

Two copies are kept, mirroring the dual-sorted flat COO: one with user
blocks major (user-factor coordinate blocks) and one with item blocks
major.  Chunks are sorted self-block-major so the kernel can accumulate
each output block in VMEM across consecutive grid steps.

Every self block is guaranteed at least one chunk (all-padding if needed)
so every output block is initialized by the kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["loc", "x", "chunk_self_block", "chunk_other_block",
                 "self_old_of_new", "other_old_of_new", "self_new_of_old"],
    meta_fields=["n_chunks", "chunk_size", "bs_self", "bs_other", "n_self", "n_other",
                 "n_self_blocks", "n_other_blocks", "nnz", "seg_chunks",
                 "seg_first_block", "seg_n_blocks", "reordered", "group"],
)
@dataclasses.dataclass(frozen=True)
class BlockedPass:
    """One direction (self-major) of the blocked edge layout.

    loc: (n_chunks*chunk_size, 1) int32 packed local row indices
    (self << 16 | other) in column layout (one (chunk_size, 1) block per
    chunk); padding edges carry self_loc == bs_self (maps to no one-hot
    row).
    chunk_self_block / chunk_other_block: (n_chunks,) int32 block ids,
    self-block-major sorted.
    """

    # -- data fields (same order as register_dataclass data_fields) --
    # Packed local indices: loc = self_loc << 16 | other_loc (one DMA
    # stream instead of two; block sizes are <= 32768).
    loc: jax.Array
    x: jax.Array
    chunk_self_block: jax.Array
    chunk_other_block: jax.Array
    # Popularity reordering: rows relabeled by descending rating count so
    # head rows cluster into dense tiles (long-tail data would otherwise
    # pad chunks heavily).  Kernel wrappers permute factor tables with
    # old_of_new before the pass and map statistics back with new_of_old.
    # Identity arrays when ``reordered`` is False.
    self_old_of_new: jax.Array  # (n_self,) int32
    other_old_of_new: jax.Array  # (n_other,) int32
    self_new_of_old: jax.Array  # (n_self,) int32
    # -- static metadata (same order as meta_fields) --
    n_chunks: int
    chunk_size: int
    bs_self: int
    bs_other: int
    n_self: int
    n_other: int
    n_self_blocks: int
    n_other_blocks: int
    nnz: int
    # Segmentation for SMEM-bounded scalar prefetch: chunks are split into
    # uniform segments of exactly seg_chunks chunks (padded with dummy
    # all-padding chunks); segment s covers self blocks
    # [seg_first_block[s], seg_first_block[s] + seg_n_blocks[s]).  Segments
    # cut at block boundaries where possible; a block whose chunks straddle
    # a cut contributes partial sums from both segments (assembled by
    # addition).
    seg_chunks: int
    seg_first_block: tuple
    seg_n_blocks: tuple
    reordered: bool
    # Chunks per kernel grid step (every self block's chunk count is a
    # multiple of this).
    group: int


def _build_pass(
    s: np.ndarray,
    o: np.ndarray,
    x: np.ndarray,
    n_self: int,
    n_other: int,
    bs_self: int,
    bs_other: int,
    chunk_size: int,
    dtype,
    seg_chunks: int = 4096,
    reorder: bool = False,
    group: int = 16,
    seg_max_override: int | None = None,
    device: bool = True,
    seg_align_blocks: bool = True,
) -> BlockedPass:
    """``device=False`` keeps the data fields as HOST numpy arrays — the
    TP bucket builder consumes them host-side (its old np.asarray pulls
    round-tripped every pass through the tunnel-attached TPU: h2d in
    jnp.asarray, then d2h back — ~100 MB each way per direction at 25M
    edges), and the layout disk cache saves host arrays without a d2h.

    ``seg_align_blocks=False`` drops the prefer-block-boundary segment
    cuts: segments fill completely (the last excepted) and a block's
    chunks may straddle two segments, whose partial sums the consumer
    must ADD (the kernel geometry supports this; the CAVI sweeps and
    `hpf_map.train_epoch_blocked` accumulate windows).  The MAP SGD
    layout uses this — at ML-25M density (~600 chunks/block vs 512-chunk
    segments) boundary alignment padded ~41% of all slots with dummy
    chunks, pure kernel-time waste, and splitting a hot row band across
    segments is exactly the batch decorrelation the SGD path wants."""
    n_self_blocks = -(-n_self // bs_self)
    n_other_blocks = -(-n_other // bs_other)

    if reorder:
        s_counts = np.bincount(s, minlength=n_self)
        o_counts = np.bincount(o, minlength=n_other)
        self_old_of_new = np.argsort(-s_counts, kind="stable").astype(np.int32)
        other_old_of_new = np.argsort(-o_counts, kind="stable").astype(np.int32)
        self_new_of_old = np.empty(n_self, dtype=np.int32)
        self_new_of_old[self_old_of_new] = np.arange(n_self, dtype=np.int32)
        other_new_of_old = np.empty(n_other, dtype=np.int32)
        other_new_of_old[other_old_of_new] = np.arange(n_other, dtype=np.int32)
        s = self_new_of_old[s]
        o = other_new_of_old[o]
    else:
        self_old_of_new = np.arange(n_self, dtype=np.int32)
        other_old_of_new = np.arange(n_other, dtype=np.int32)
        self_new_of_old = np.arange(n_self, dtype=np.int32)

    sb = s // bs_self
    ob = o // bs_other

    # Tile-major edge sort through the native radix runtime on the combined
    # (sb, ob) key — np.lexsort + np.unique re-sorts 25M-edge arrays twice
    # and dominated the round-1 host build; counting passes over an int32
    # key space are ~10x faster (numpy fallback kept for huge key spaces).
    tile_key = sb.astype(np.int64) * n_other_blocks + ob
    n_tile_keys = n_self_blocks * n_other_blocks
    key_counts = None
    if n_tile_keys <= (1 << 26) and len(s):
        from pmf_tpu.data.native import radix_argsort

        # The radix counting passes produce per-key counts for free; for
        # modest key spaces take them and skip the tile_key permute +
        # run-boundary diff below (two fewer 25M-scale passes).  Above
        # ~4M keys the dense counts buffer itself gets expensive.
        want_counts = n_tile_keys <= (1 << 22)
        order, key_counts = radix_argsort(
            tile_key.astype(np.int32), int(n_tile_keys),
            return_counts=want_counts)
    else:
        order = np.lexsort((ob, sb))
    # s/o/x stay UNSORTED here: the native fused scatter reads them
    # through `order` in its single pass, and the numpy fallback permutes
    # them lazily at the scatter site.  (sb/ob are never consumed
    # per-edge after the sort at all.)

    # Tile runs: consecutive edges sharing (sb, ob).
    if key_counts is not None:
        # Stable ascending key sort: occupied keys in order ARE the runs.
        uniq = np.flatnonzero(key_counts)
        counts = key_counts[uniq]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    elif len(tile_key):
        # tile_key is sorted after the permute, so run boundaries come
        # from one diff pass instead of np.unique's re-sort.
        tile_key = tile_key[order]
        change = np.flatnonzero(tile_key[1:] != tile_key[:-1]) + 1
        starts = np.concatenate([[0], change])
        uniq = tile_key[starts]
        counts = np.diff(np.append(starts, len(tile_key)))
    else:
        uniq = np.array([], dtype=np.int64)
        starts = np.array([], dtype=np.int64)
        counts = np.array([], dtype=np.int64)
    n_chunks_per_tile = -(-counts // chunk_size)
    C = chunk_size
    n_tiles = len(uniq)
    tile_sb = (uniq // n_other_blocks).astype(np.int32)
    tile_ob = (uniq % n_other_blocks).astype(np.int32)

    # ---- Chunk bookkeeping on small (n_chunks-sized) arrays ONLY.  The
    # final slot of every real chunk is computed BEFORE touching the big
    # per-edge arrays, so edges scatter into the final layout exactly once
    # (the previous formulation permuted the (n_chunks, C) arrays four
    # times and dominated the 25M-edge host build).

    # Real chunks in (sb, ob)-sorted tile order.
    chunk_tile = np.repeat(np.arange(n_tiles), n_chunks_per_tile)
    rchunk_sb = tile_sb[chunk_tile]
    rchunk_ob = tile_ob[chunk_tile]
    n_real = len(chunk_tile)

    # Per-self-block padded counts: at least one group, rounded up to a
    # multiple of ``group`` (empty blocks still get one all-padding group
    # so every output block is initialized by the kernel).
    real_per_block = np.bincount(rchunk_sb, minlength=n_self_blocks)
    padded_per_block = np.maximum(real_per_block, 1)
    padded_per_block = ((padded_per_block + group - 1) // group) * group
    block_start = np.concatenate([[0], np.cumsum(padded_per_block)[:-1]])
    total_padded = int(padded_per_block.sum())

    # Position of each real chunk in the padded block-major sequence.
    first_idx_of_block = np.searchsorted(rchunk_sb, np.arange(n_self_blocks))
    rank_in_block = np.arange(n_real) - first_idx_of_block[rchunk_sb]
    padded_pos = block_start[rchunk_sb] + rank_in_block

    pseq_sb = np.repeat(
        np.arange(n_self_blocks, dtype=np.int32), padded_per_block
    )
    pseq_ob = np.zeros(total_padded, dtype=np.int32)
    pseq_ob[padded_pos] = rchunk_ob

    # Segmentation: uniform segments of seg_chunks chunks, preferring cuts
    # at self-block boundaries (straddling allowed for oversized blocks).
    # Block-padded counts are group multiples, so boundary cuts keep group
    # parity automatically.  The block SPAN per segment is also bounded:
    # the kernel's per-segment output window is max-span x bs_self rows,
    # and sparse tails (few chunks per block) would otherwise span dozens
    # of blocks per segment and blow the scoped-VMEM budget when XLA
    # places the window in VMEM.
    max_span = 16  # blocks per segment
    # Uniform segment length targets the span (seg length ~ span x average
    # chunks/block) so span-cut segments stay mostly full — otherwise
    # sparse layouts would pad every segment with dummy chunks.
    avg_per_block = max(total_padded / max(n_self_blocks, 1), 1.0)
    if seg_max_override is not None:
        # Forced uniform segment length (TP blocked ring: every (device,
        # step) bucket must share one static kernel geometry).
        seg_max = max(group, (int(seg_max_override) // group) * group)
    else:
        seg_max = min(seg_chunks, total_padded,
                      max(int(max_span * avg_per_block), group))
        seg_max = max(group, (seg_max // group) * group)
    ranges = []
    start = 0
    while start < total_padded:
        end = min(start + seg_max, total_padded)
        span_end = int(np.searchsorted(pseq_sb, pseq_sb[start] + max_span,
                                       side="left"))
        end = min(end, max(span_end, start + 1))
        if seg_align_blocks and end < total_padded:
            cut = end
            while cut > start + 1 and pseq_sb[cut] == pseq_sb[cut - 1]:
                cut -= 1
            if pseq_sb[cut] != pseq_sb[cut - 1]:
                end = cut
        ranges.append((start, end))
        start = end

    n_segments = len(ranges)
    final_chunks = n_segments * seg_max
    pos_to_slot = np.empty(total_padded, dtype=np.int64)
    f_sb = np.empty(final_chunks, dtype=np.int32)
    f_ob = np.zeros(final_chunks, dtype=np.int32)
    seg_first, seg_nblocks = [], []
    for k, (a, b) in enumerate(ranges):
        dst = slice(k * seg_max, k * seg_max + (b - a))
        pos_to_slot[a:b] = np.arange(k * seg_max, k * seg_max + (b - a))
        f_sb[dst] = pseq_sb[a:b]
        f_ob[dst] = pseq_ob[a:b]
        # Dummy padding chunks keep the segment's last block id.
        f_sb[k * seg_max + (b - a) : (k + 1) * seg_max] = pseq_sb[b - 1]
        seg_first.append(int(pseq_sb[a]))
        seg_nblocks.append(int(pseq_sb[b - 1]) - int(pseq_sb[a]) + 1)

    # ---- One-shot edge scatter into the final flat layout.
    # Column layout (n_chunks*C, 1): a (C, 1) block per grid step puts the
    # chunk's edges along sublanes, which is the layout the kernel's
    # one-hot compares want (and satisfies Mosaic block-shape rules).
    pad_packed = np.int32((bs_self << 16) | bs_other)
    total_slots = final_chunks * C
    native_out = None
    if len(s):
        chunk_base_per_tile = np.concatenate(
            [[0], np.cumsum(n_chunks_per_tile)[:-1]]
        )
        slot_of_chunk = pos_to_slot[padded_pos]
        if np.dtype(dtype) == np.float32:
            # Fused native pass: permute + pack + scatter in one loop
            # over edges (native/ingest.cpp:pmf_scatter_edges) — the
            # numpy formulation below makes ~15 full-array passes.
            from pmf_tpu.data.native import scatter_edges

            native_out = scatter_edges(
                s, o, x, order, starts, chunk_base_per_tile,
                slot_of_chunk, bs_self, bs_other, C, int(pad_packed),
                total_slots)
    if native_out is not None:
        packed, f_x = native_out
    else:
        packed = np.full(total_slots, pad_packed, dtype=np.int32)
        f_x = np.zeros(total_slots, dtype=dtype)
        if len(s):
            s, o, x = s[order], o[order], x[order]
            # Sequential repeats, not per-edge gathers: repeat(small,
            # counts) streams; small[edge_tile] random-gathers 25M-scale
            # indices.
            edge_rank = np.arange(len(s)) - np.repeat(starts, counts)
            edge_chunk = (
                np.repeat(chunk_base_per_tile, counts) + edge_rank // C
            )
            edge_final = slot_of_chunk[edge_chunk] * C + edge_rank % C
            packed[edge_final] = (
                ((s % bs_self).astype(np.int32) << 16)
                | (o % bs_other).astype(np.int32)
            )
            f_x[edge_final] = x.astype(dtype)
    arr = jnp.asarray if device else np.asarray
    return BlockedPass(
        loc=arr(packed[:, None]),
        x=arr(f_x[:, None]),
        chunk_self_block=arr(f_sb),
        chunk_other_block=arr(f_ob),
        n_chunks=final_chunks,
        chunk_size=C,
        bs_self=bs_self,
        bs_other=bs_other,
        n_self=n_self,
        n_other=n_other,
        n_self_blocks=n_self_blocks,
        n_other_blocks=n_other_blocks,
        nnz=len(s),
        seg_chunks=seg_max,
        seg_first_block=tuple(seg_first),
        seg_n_blocks=tuple(seg_nblocks),
        self_old_of_new=arr(self_old_of_new),
        other_old_of_new=arr(other_old_of_new),
        self_new_of_old=arr(self_new_of_old),
        reordered=reorder,
        group=group,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x_hi", "x_lo", "m", "x_sum_user", "x_sum_item"],
    meta_fields=["hu", "hi", "r0", "row_start"],
)
@dataclasses.dataclass(frozen=True)
class DenseHead:
    """Dense storage for the (top-hu users) x (top-hi items) corner of the
    COUNT-REORDERED rating matrix.

    Zipf-distributed rating data (the shape of every real rating dataset,
    ML-25M included) supersaturates this corner: after popularity
    reordering a few thousand head rows hold 30-50%+ of all edges at high
    fill.  For those edges the one-hot edge kernel's per-edge cost
    (~3*block*128 MXU MACs) is absurd overkill — every CAVI sufficient
    statistic over the head collapses into a handful of DENSE matmuls
    (`pmf_tpu.ops.dense_head`):

        R = Theta_head @ Beta_head^T          rate matrix
        W = where(M > 0, X / max(R, floor), 0)
        S_alloc = Theta ∘ (W @ Beta),  S_other = M @ Beta   (Poisson/HPF)

    at a few hundred MACs per CELL — orders of magnitude less work per
    edge.  The sparse tail keeps the Pallas edge engine; the layout
    builder splits edges between the two.

    X = sum of ratings per cell, M = edge multiplicity per cell (both
    handle duplicate (u, i) pairs exactly: every statistic is linear in
    x at fixed rate, and rate is identical across duplicates).  x_lo is
    the bf16 remainder of X when ratings are not bf16-exact (None when
    X == bf16(X), e.g. integer ratings).
    """

    x_hi: jax.Array  # (hu, hip) bf16 — sum of ratings per cell (hi part)
    x_lo: jax.Array | None  # (hu, hip) bf16 remainder, or None when exact
    m: jax.Array  # (hu, hip) bf16 — edge multiplicity per cell
    x_sum_user: jax.Array  # (hu,) f32 — static per-row rating sums
    x_sum_item: jax.Array  # (hip,) f32
    hu: int  # head user rows (multiple of r0)
    hi: int  # real head item columns (hip = padded to 128 lanes)
    r0: int  # scan chunk rows; divides hu
    # First NEW-space user row of this tier.  Zipf data rewards a
    # STAIRCASE of tiers — bands of progressively less-active users kept
    # dense on progressively fewer top items (each quartering of the item
    # width triples the affordable user band at constant bytes, and the
    # band still holds a large edge share) — so a hybrid layout carries a
    # tuple of DenseHead tiers with disjoint row bands.
    row_start: int = 0

    @property
    def hip(self) -> int:
        return self.m.shape[1]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["by_user", "by_item", "head"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class BlockedCOO:
    by_user: BlockedPass  # user blocks major -> user-factor coordinate blocks
    by_item: BlockedPass  # item blocks major -> item-factor coordinate blocks
    # Dense staircase tiers of the hybrid engine (disjoint user bands,
    # see DenseHead.row_start); None = pure edge layout.
    head: tuple | None = None


def auto_tiles(n_users: int, n_items: int, nnz: int, group_cap: int = 16,
               block: int = 512, tail: bool = False,
               step_edges: int = 2048) -> dict:
    """Pick blocked-layout tile parameters from expected tile occupancy.

    The only data-dependent hazard of the fixed layout is CHUNK padding:
    a (self_block, other_block) tile with e edges burns ceil(e/C)*C slots,
    so when the expected edges-per-tile e = nnz * B^2 / (n_users * n_items)
    falls below the chunk size (reference-density data: Food.com's 700k
    edges over 25k x 178k rows gives e ~ 41 at B=512), the chunk shrinks to
    the nearest power of two in [16, 128] and the group grows to keep
    per-grid-step work constant (G*C = 2048, G capped for Mosaic compile
    stability).  Dense ML-25M-like shapes keep the tuned C=128/G=16.

    ``tail``: size for a hybrid layout's residual edges, whose per-tile
    occupancy is skewed (the dense head removed the uniform mass): also
    shrink while e < 2*chunk, but only when the group cap lets the group
    double to keep per-grid-step edges (G*C) constant — measured: the
    ML-25M tail at e~137 runs 9% faster at C=64/G=32 than C=128/G=16,
    while the Gaussian kernels (G capped at 8) LOSE from sub-128 chunks
    (per-step table DMA amortizes worse: 292M -> 269M)."""
    e = nnz * block * block / max(n_users * n_items, 1)
    chunk = 128
    while chunk > 16:
        group_keeps_up = step_edges // (chunk // 2) <= group_cap
        if e < chunk or (tail and e < 2 * chunk and group_keeps_up):
            chunk //= 2
        else:
            break
    group = min(group_cap, max(1, step_edges // chunk))
    return dict(block_users=block, block_items=block, chunk_size=chunk,
                group=group)


def _pick_tiers(
    new_u: np.ndarray,
    new_i: np.ndarray,
    n_users: int,
    n_items: int,
    head_bytes: int,
    cell_bytes: int,
    r0: int,
    min_nnz: int = 4_000_000,
    min_cover: float = 0.02,
    max_tiers: int = 4,
    row_mult: int = 1,
) -> list:
    """Auto staircase sizing: tier 0 covers the top users across all items
    (<= 64k columns); each further tier quarters the item width and spends
    the freed bytes on a 3x-wider band of less-active users — on Zipf data
    every step of the stair still holds a large edge share, so coverage
    per byte is several times better than one flat rectangle.  Returns
    [(row_start, rows, hi), ...] (contiguous user bands from row 0), empty
    when the data is too small or the head would not pay."""
    nnz = len(new_u)
    if nnz < min_nnz:
        return []
    budget_cells = head_bytes // cell_bytes
    hi0 = min(n_items, 65536)
    # Row counts round to r0 * row_mult so a fit mesh of row_mult devices
    # can shard every tier's row chunks evenly (dense_head sharded path).
    unit = r0 * max(row_mult, 1)
    # (hi pads to 512 columns in _build_head; the estimate below ignores
    # the sub-2% padding.)  Equal-cells stair: tier t spends ~3/4 of
    # tier 0's cells.
    hu0 = int(budget_cells / (hi0 * (1 + 0.75 * (max_tiers - 1)))) // unit * unit
    if hu0 < unit:
        hu = min((budget_cells // max(hi0, 1)) // unit * unit,
                 (n_users // unit) * unit)
        tiers = [(0, hu, hi0)] if hu >= unit else []
    else:
        tiers = []
        row, band, hi = 0, hu0, hi0
        for t in range(max_tiers):
            rows = min(band, ((n_users - row) // unit) * unit)
            if rows < unit or hi < 128:
                break
            tiers.append((row, rows, hi))
            row += rows
            band = 3 * hu0 * (4 ** t)
            hi = hi // 4
    kept = []
    for rs, rows, hi in tiers:
        cover = np.count_nonzero(
            (new_u >= rs) & (new_u < rs + rows) & (new_i < hi)
        )
        if cover < min_cover * nnz:
            break
        kept.append((int(rs), int(rows), int(hi)))
    if kept:
        # The stair can exhaust max_tiers before the row space (measured:
        # the Gaussian head left the coldest 39% of users untiered and its
        # tail-kernel time dominated); extend the LAST tier through the
        # remaining users as far as the byte budget allows.
        rs, rows, hi = kept[-1]
        hip = -(-hi // 512) * 512
        used = sum(r * (-(-h // 512) * 512) for _, r, h in kept)
        extra = min(
            ((n_users - rs - rows) // unit) * unit,
            max(budget_cells - used, 0) // hip // unit * unit,
        )
        if extra > 0:
            kept[-1] = (rs, rows + int(extra), hi)
    return kept


def _head_cell_index(nu: np.ndarray, ni: np.ndarray, hip: int) -> np.ndarray:
    """Flat cell index of each head edge in the (hu, hip) dense arrays —
    the layout cache persists exactly these (plus ratings) per tier."""
    return nu.astype(np.int32) * np.int32(hip) + ni.astype(np.int32)


def _build_head(
    nu: np.ndarray, ni: np.ndarray, x: np.ndarray, hu: int, hi: int, r0: int,
    row_start: int = 0,
) -> DenseHead:
    hip = -(-hi // 512) * 512
    return _scatter_head(_head_cell_index(nu, ni, hip),
                         x.astype(np.float32), hu=hu, hi=hi, r0=r0,
                         row_start=row_start)


def _scatter_head(
    idx: np.ndarray, x: np.ndarray, hu: int, hi: int, r0: int,
    row_start: int = 0,
) -> DenseHead:
    """Scatter head edges (flat cell index + rating) into dense (hu, hip)
    cell arrays ON DEVICE — only the head edge triples cross the
    host->HBM link, not gigabytes of dense cells (the axon tunnel makes
    bulk host transfers the build bottleneck otherwise; the layout cache
    stores the triples and replays this scatter for the same reason).
    Duplicate (u, i) pairs sum into X and count into M.

    Columns pad to a 512 multiple so the fused allocation kernel can tile
    512-wide (128-wide tiles made the grid overhead-bound)."""
    hip = -(-hi // 512) * 512
    if hu * hip >= 2**31:
        raise ValueError(
            f"head tier ({hu} x {hip}) exceeds int32 flat-index range "
            f"({hu * hip} cells >= 2^31); shrink head_bytes or the tier"
        )
    idx = jnp.asarray(np.asarray(idx, np.int32))
    xs = jnp.asarray(np.asarray(x, np.float32))

    @jax.jit
    def scatter(idx, xs):
        X = jnp.zeros((hu * hip,), jnp.float32).at[idx].add(xs).reshape(hu, hip)
        M = (
            jnp.zeros((hu * hip,), jnp.float32)
            .at[idx]
            .add(1.0)
            .reshape(hu, hip)
        )
        x_hi = X.astype(jnp.bfloat16)
        rem = X - x_hi.astype(jnp.float32)
        return (
            x_hi,
            rem.astype(jnp.bfloat16),
            M,
            jnp.any(rem != 0),
            # Multiplicities <= 256 are bf16-exact; beyond that (heavily
            # duplicated head cells) keep f32 for exact linear M-statistics.
            jnp.max(M, initial=0.0) <= 256,
            X.sum(axis=1),
            X.sum(axis=0),
        )

    x_hi, x_lo, M, has_rem, m_exact, xsu, xsi = scatter(idx, xs)
    return DenseHead(
        x_hi=x_hi,
        x_lo=x_lo if bool(has_rem) else None,
        m=M.astype(jnp.bfloat16) if bool(m_exact) else M,
        x_sum_user=xsu,
        x_sum_item=xsi,
        hu=hu,
        hi=hi,
        r0=r0,
        row_start=row_start,
    )


def _pass_to_device(p: BlockedPass) -> BlockedPass:
    """Move a host-built pass's data fields into HBM (one h2d each)."""
    return dataclasses.replace(
        p,
        loc=jnp.asarray(p.loc), x=jnp.asarray(p.x),
        chunk_self_block=jnp.asarray(p.chunk_self_block),
        chunk_other_block=jnp.asarray(p.chunk_other_block),
        self_old_of_new=jnp.asarray(p.self_old_of_new),
        other_old_of_new=jnp.asarray(p.other_old_of_new),
        self_new_of_old=jnp.asarray(p.self_new_of_old),
    )


def build_blocked(
    u: np.ndarray,
    i: np.ndarray,
    x: np.ndarray,
    n_users: int | None = None,
    n_items: int | None = None,
    block_users: int = 512,
    block_items: int = 512,
    chunk_size: int = 128,
    dtype=np.float32,
    seg_chunks: int = 4096,
    reorder: bool = False,
    group: int = 16,
    head=None,
    head_bytes: int = 2 << 30,
    head_r0: int = 512,
    tail_group_cap: int | None = None,
    head_row_mult: int = 1,
    tail_chunk_size: int | None = None,
    tail_group: int | None = None,
    cache_dir: str | None = None,
) -> BlockedCOO:
    """``head``: None = pure edge layout; "auto" = size a dense staircase
    from the data (requires ``reorder``); (hu, hi) = explicit head
    rows/cols (hu a multiple of ``head_r0``); a list of (row_start, rows,
    hi) = explicit tiers.  With a head, edges inside the dense tiers are
    stored as cell arrays (`DenseHead`) and EXCLUDED from the edge passes;
    engines must add the dense-head statistics (`pmf_tpu.ops.dense_head`)
    — the blocked sweep wrappers do this automatically.

    ``tail_group_cap``: when set and a head is engaged, re-derive
    chunk_size/group for the TAIL passes from the residual edge count
    (`auto_tiles(tail=True)` — the tail is several times sparser than the
    full data, so full-density tiles are padding-bound), with this Mosaic
    group cap.

    ``cache_dir`` (or the PMF_TPU_LAYOUT_CACHE env var): persist the
    built layout to disk keyed by (edge data, every geometry argument)
    and reload byte-identical on repeat builds
    (`pmf_tpu.data.layout_cache`)."""
    from pmf_tpu.data import layout_cache as lc

    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    x = np.asarray(x)
    if n_users is None:
        n_users = int(u.max()) + 1
    if n_items is None:
        n_items = int(i.max()) + 1

    cdir = lc.resolve_cache_dir(cache_dir)
    cpath = None
    if cdir is not None:
        params = dict(
            n_users=n_users, n_items=n_items, block_users=block_users,
            block_items=block_items, chunk_size=chunk_size,
            dtype=np.dtype(dtype).str, seg_chunks=seg_chunks,
            reorder=reorder, group=group, head=repr(head),
            head_bytes=head_bytes, head_r0=head_r0,
            tail_group_cap=tail_group_cap, head_row_mult=head_row_mult,
            tail_chunk_size=tail_chunk_size, tail_group=tail_group,
        )
        key = lc.make_key("blocked", lc.data_fingerprint(u, i, x), params)
        cpath = lc.entry_path(cdir, "blocked", key)
        hit = lc.load_entry(cpath)
        if hit is not None:
            return lc.unpack_blocked(*hit)

    def _save_and_finish(by_user, by_item, head_triples, heads):
        if cpath is not None:
            arrays = {}
            meta = lc.pack_blocked(by_user, by_item, head_triples, arrays)
            lc.save_entry(cpath, arrays, meta)
        return BlockedCOO(by_user=_pass_to_device(by_user),
                          by_item=_pass_to_device(by_item),
                          head=tuple(heads) if heads else None)

    if head is None:
        by_user = _build_pass(u, i, x, n_users, n_items, block_users, block_items,
                              chunk_size, dtype, seg_chunks, reorder, group,
                              device=False)
        by_item = _build_pass(i, u, x, n_items, n_users, block_items, block_users,
                              chunk_size, dtype, seg_chunks, reorder, group,
                              device=False)
        return _save_and_finish(by_user, by_item, [], [])

    if not reorder:
        raise ValueError("head requires reorder=True (head = top-count corner)")

    u_counts = np.bincount(u, minlength=n_users)
    i_counts = np.bincount(i, minlength=n_items)
    user_old_of_new = np.argsort(-u_counts, kind="stable").astype(np.int32)
    item_old_of_new = np.argsort(-i_counts, kind="stable").astype(np.int32)
    user_new_of_old = np.empty(n_users, dtype=np.int32)
    user_new_of_old[user_old_of_new] = np.arange(n_users, dtype=np.int32)
    item_new_of_old = np.empty(n_items, dtype=np.int32)
    item_new_of_old[item_old_of_new] = np.arange(n_items, dtype=np.int32)
    nu = user_new_of_old[u]
    ni = item_new_of_old[i]

    x32 = x.astype(np.float32)
    # bf16-exact iff the low 16 mantissa bits of every f32 are zero (one
    # cheap bit-test pass; the astype round-trip materialized two more
    # 25M-scale temporaries on the allocation-bound build host).
    exact = not bool(np.any(x32.view(np.uint32) & np.uint32(0xFFFF)))
    cell_bytes = 4 if exact else 6  # x_hi + m (+ x_lo)
    if head == "auto":
        r0 = head_r0
        tiers = _pick_tiers(nu, ni, n_users, n_items, head_bytes, cell_bytes,
                            r0, row_mult=head_row_mult)
    elif isinstance(head, list):
        # Explicit staircase: [(row_start, rows, hi), ...], disjoint bands.
        r0 = head_r0
        tiers = [(int(rs), int(rows), int(hi)) for rs, rows, hi in head]
        spans = sorted((rs, rs + rows) for rs, rows, _ in tiers)
        for (a0, b0), (a1, _) in zip(spans, spans[1:]):
            if a1 < b0:
                raise ValueError("head tiers must have disjoint user bands")
        for rs, rows, hi in tiers:
            if rows % max(min(r0, rows), 1) or rs + rows > n_users or hi > n_items:
                raise ValueError(f"head tier ({rs}, {rows}, {hi}) invalid")
    else:
        hu, hi = head
        r0 = min(head_r0, hu) if hu else head_r0
        if hu % max(r0, 1) or hu > n_users or hi > n_items:
            raise ValueError(
                f"head ({hu}, {hi}) invalid: hu must be a multiple of r0={r0} "
                f"and within ({n_users}, {n_items})"
            )
        tiers = [(0, hu, hi)] if hu and hi else []
    if not tiers:
        by_user = _build_pass(u, i, x, n_users, n_items, block_users, block_items,
                              chunk_size, dtype, seg_chunks, True, group,
                              device=False)
        by_item = _build_pass(i, u, x, n_items, n_users, block_items, block_users,
                              chunk_size, dtype, seg_chunks, True, group,
                              device=False)
        return _save_and_finish(by_user, by_item, [], [])

    in_head = np.zeros(len(nu), dtype=bool)
    heads = []
    head_triples = []
    for rs, rows, hi_t in tiers:
        mask = (nu >= rs) & (nu < rs + rows) & (ni < hi_t)
        hip_t = -(-hi_t // 512) * 512
        idx_t = _head_cell_index(nu[mask] - rs, ni[mask], hip_t)
        x_t = x32[mask]
        r0_t = min(r0, rows)
        heads.append(_scatter_head(idx_t, x_t, hu=rows, hi=hi_t, r0=r0_t,
                                   row_start=rs))
        head_triples.append((idx_t, x_t,
                             dict(hu=rows, hi=hi_t, r0=r0_t, row_start=rs)))
        in_head |= mask
    dense = tuple(heads)
    tu, ti, tx = nu[~in_head], ni[~in_head], x[~in_head]
    if tail_group_cap is not None:
        t = auto_tiles(n_users, n_items, len(tu), group_cap=tail_group_cap,
                       block=block_users, tail=True)
        chunk_size, group = t["chunk_size"], t["group"]
    # Explicit tail-tile overrides (scan tooling / tuned configs).
    if tail_chunk_size is not None:
        chunk_size = tail_chunk_size
    if tail_group is not None:
        group = tail_group
    # Tail passes are built on already-relabeled ids (reorder=False keeps
    # them); the GLOBAL permutations attach afterwards so kernel wrappers
    # permute tables / un-permute stats exactly as in the headless layout.
    by_user = _build_pass(tu, ti, tx, n_users, n_items, block_users, block_items,
                          chunk_size, dtype, seg_chunks, False, group,
                          device=False)
    by_item = _build_pass(ti, tu, tx, n_items, n_users, block_items, block_users,
                          chunk_size, dtype, seg_chunks, False, group,
                          device=False)
    by_user = dataclasses.replace(
        by_user,
        self_old_of_new=user_old_of_new,
        other_old_of_new=item_old_of_new,
        self_new_of_old=user_new_of_old,
        reordered=True,
    )
    by_item = dataclasses.replace(
        by_item,
        self_old_of_new=item_old_of_new,
        other_old_of_new=user_old_of_new,
        self_new_of_old=item_new_of_old,
        reordered=True,
    )
    return _save_and_finish(by_user, by_item, head_triples, dense)
