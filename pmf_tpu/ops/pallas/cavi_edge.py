"""Fused CAVI edge-pass Pallas kernel for the Poisson/HPF model family.

Replaces the XLA gather + scatter-add path (measured ~8-19 GB/s on TPU —
50-100x below HBM bandwidth, because (nnz, K~20) random access maps badly
onto 8x128 tiles) with a blocked formulation where every random access is
a one-hot matmul on the 128x128 MXU:

For each chunk of `C` edges, all belonging to one (self_block, other_block)
tile of factor rows (`pmf_tpu.data.blocked.BlockedPass`):

    onehot_self  = (self_loc  == iota)          (C, BS)  bf16 (exact)
    onehot_other = (other_loc == iota)          (C, BO)  bf16 (exact)
    g_self  = onehot_self  @ E_self_block       (C, K)   MXU gather
    g_other = onehot_other @ E_other_block      (C, K)   MXU gather
    rate    = max(<g_self, g_other>, floor)     (C,)     VPU
    alloc   = (x / rate) * g_self * g_other     (C, K)   VPU
    S_alloc_block  += onehot_self^T @ alloc     (BS, K)  MXU segment-sum
    S_other_block  += onehot_self^T @ g_other   (BS, K)  MXU segment-sum

Precision via free lane padding: the MXU always processes 128 output
lanes, so for K <= 21 a float32 operand can be decomposed into THREE
stacked bf16 parts (hi, lo, lo2 — an exact bf16x3 representation) packed
as extra columns of the SAME matmul.  One-hot gathers reconstruct the
f32 values exactly; segment sums accumulate each part in f32 and
recombine — f32-exact statistics at single-bf16-pass cost ("high", the
default).  "fast" uses one part (~5e-3 stat noise); "highest" uses
Mosaic's HIGHEST f32 dot (reference cross-check, ~3x slower).

Chunks are self-block-major, so each output block accumulates in VMEM
across consecutive grid steps (revisited-output pattern).  Padding edges
carry local index == block_size, matching no one-hot column, and rating
0 — they contribute exactly zero.  Chunks run in uniform segments under
ONE lax.scan (single Mosaic kernel compile; scalar-prefetch SMEM bounded
at any nnz).

This computes the sufficient statistics of the reference's per-row update
loops (`/root/reference/src/models/poisson_mf_cavi.py:135-164`,
`/root/reference/src/models/hpf_cavi.py:126-151`) for ALL rows at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmf_tpu.data.blocked import BlockedPass

# Mosaic's default VMEM budget (~16 MiB) capped the per-grid-step edge
# group at G*C = 2048 (round-2 known gap: "4096 measured 27M scoped vs the
# 16M limit").  v5e has 128 MiB of VMEM; raising the limit lets larger
# groups compile so the per-step fixed cost (DMA issue, scalar prefetch,
# loop overhead — the tail kernel measures ~0.5% of HBM roofline and
# ~17% of MXU, i.e. overhead-bound) amortizes over more edges.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _trunc_hi16(x: jax.Array) -> jax.Array:
    """The top-16-bit (sign+exponent+7 mantissa bits) part of an f32 array,
    still as f32 — i.e. an exactly-bf16-representable truncation.  Done
    with integer masking so --xla_allow_excess_precision (set on this
    platform) cannot elide the round-trip the way it elides
    ``x - f32(bf16(x))``."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)


def decompose_bf16(x: jax.Array, parts: int) -> jax.Array:
    """Exact bf16x<parts> column decomposition: (rows, K) f32 ->
    (rows, parts*K) bf16 with sum of parts == x (to ~f32 precision).
    Each part is a bit-truncated slice of the mantissa, so its bf16
    conversion is exact (no rounding) except for the final remainder."""
    outs = []
    r = x.astype(jnp.float32)
    for p in range(parts):
        h = _trunc_hi16(r) if p < parts - 1 else r
        outs.append(h.astype(jnp.bfloat16))
        r = r - h
    return jnp.concatenate(outs, axis=1)


def _recombine(g: jax.Array, k: int, parts: int) -> jax.Array:
    """Sum the ``parts`` K-column groups of a (C, parts*K) f32 array."""
    out = g[:, :k]
    for p in range(1, parts):
        out = out + g[:, p * k : (p + 1) * k]
    return out


def _kernel(
    sb_ref,  # scalar prefetch: (seg_chunks,) chunk -> self block
    ob_ref,  # scalar prefetch: (seg_chunks,) chunk -> other block
    loc_ref,  # (G*C, 1) int32, packed self<<16 | other, G chunks
    x_ref,  # (G*C, 1) float32
    eself_ref,  # (BS, parts*K) bf16  (or (BS, K) f32 for "highest")
    *rest,  # G x eother refs (BO, parts*K), then out_ref (BS, 2K)
    bs_self: int,
    bs_other: int,
    chunk_size: int,
    rate_floor: float,
    k: int,
    parts: int,
    highest: bool,
    group: int,
    mode: str = "cavi",
):
    """Each grid step processes a GROUP of `group` chunks sharing one self
    block (the builder pads every self block's chunk count to a multiple
    of `group`), amortizing per-step fixed cost.

    ``mode``: "cavi" computes the allocation statistic
    $(x/\\mathrm{rate})\\,g_s g_o$; "raw" replaces it by the plain product
    $g_s \\odot g_o$ (no $x$, no rate) — the extended-Poisson scalar
    refresh's $\\sum_e s_o \\langle E^{new}_s, E_o\\rangle$ statistic is its
    row-sum over $k$ when the other table arrives pre-scaled by $s_o$
    (`parallel/tp_blocked.tp_sweep_poisson_ext_blocked`)."""
    eother_refs = rest[:group]
    out_ref = rest[group]
    in_dtype = eself_ref.dtype
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    C = chunk_size
    G = group

    packed = loc_ref[:, :]  # (G*C, 1)
    sloc = jax.lax.shift_right_logical(packed, jnp.int32(16))
    oloc = jax.lax.bitwise_and(packed, jnp.int32(0xFFFF))
    xv = x_ref[:, :]

    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (G * C, bs_self), 1)
    ).astype(in_dtype)

    g_other_parts = []
    for g in range(G):
        onehot_og = (
            oloc[g * C : (g + 1) * C]
            == jax.lax.broadcasted_iota(jnp.int32, (C, bs_other), 1)
        ).astype(in_dtype)
        g_other_parts.append(
            jnp.dot(onehot_og, eother_refs[g][:], preferred_element_type=jnp.float32,
                    precision=prec)
        )

    g_self = _recombine(
        jnp.dot(onehot_s, eself_ref[:], preferred_element_type=jnp.float32,
                precision=prec),
        k, parts,
    )
    g_other = _recombine(jnp.concatenate(g_other_parts, axis=0), k, parts)

    if mode == "raw":
        alloc = g_self * g_other
    else:
        rate = jnp.maximum(
            jnp.sum(g_self * g_other, axis=1, keepdims=True),
            jnp.asarray(rate_floor, jnp.float32),
        )
        alloc = (xv / rate) * g_self * g_other

    # First visit of this output block: zero the accumulators.
    c = pl.program_id(0)
    prev_sb = sb_ref[jnp.maximum(G * c - G, 0)]
    is_first = (c == 0) | (sb_ref[G * c] != prev_sb)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Both statistics in one segment-sum matmul; bf16x<parts> payload
    # decomposition rides the same free lanes (2*parts*K <= 128 for K=20).
    # g_other is PASS-THROUGH: its gathered part columns are already exact
    # f32 images of bf16 values (a one-hot row selects exactly one table
    # row), so they re-enter the scatter with a plain bf16 cast — no
    # recombine -> re-decompose round-trip (saves ~1/3 of per-step VPU ops).
    contract = (((0,), (0,)), ((), ()))  # onehot_s^T @ payload
    if highest:
        payload_in = jnp.concatenate([alloc, g_other], axis=1)  # (G*C, 2K)
    else:
        payload_in = jnp.concatenate(
            [decompose_bf16(alloc, parts),
             jnp.concatenate(g_other_parts, axis=0).astype(jnp.bfloat16)],
            axis=1,
        )  # [alloc parts | g_other parts]
    seg = jax.lax.dot_general(
        onehot_s, payload_in, contract, preferred_element_type=jnp.float32,
        precision=prec,
    )
    if highest:
        out_ref[:] += seg
    else:
        out_ref[:] += jnp.concatenate(
            [_recombine(seg[:, : parts * k], k, parts),
             _recombine(seg[:, parts * k :], k, parts)],
            axis=1,
        )


def make_edge_stats_call(
    *,
    bs_self: int,
    bs_other: int,
    chunk_size: int,
    KT: int,
    K: int,
    parts: int,
    highest: bool,
    group: int,
    seg_chunks: int,
    out_rows: int,
    rate_floor: float,
    interpret: bool,
    mode: str = "cavi",
):
    """Construct the segment-level pallas_call shared by the single-chip
    pass (:func:`poisson_edge_stats`) and the TP blocked ring sweeps
    (`pmf_tpu.parallel.tp_blocked`).  The returned callable maps
    ``(sb, ob, loc, x, e_self_pad, e_other_pad x group) -> (out_rows, 2K)``
    for ONE segment of ``seg_chunks`` chunks; output rows are relative to
    the segment's first self block (``sb[0]``).  ``mode``: see
    :func:`_kernel`."""
    G = group
    C = chunk_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(seg_chunks // G,),
        in_specs=[
            pl.BlockSpec((G * C, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((G * C, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((bs_self, KT), lambda c, sb, ob: (sb[G * c], 0)),
            *[
                pl.BlockSpec(
                    (bs_other, KT),
                    lambda c, sb, ob, G=G, g=g: (ob[G * c + g], 0),
                )
                for g in range(G)
            ],
        ],
        out_specs=pl.BlockSpec(
            (bs_self, 2 * K), lambda c, sb, ob, G=G: (sb[G * c] - sb[0], 0)
        ),
    )
    kernel = functools.partial(
        _kernel,
        bs_self=bs_self,
        bs_other=bs_other,
        chunk_size=C,
        rate_floor=rate_floor,
        k=K,
        parts=parts,
        highest=highest,
        group=G,
        mode=mode,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, 2 * K), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )


@functools.partial(
    jax.jit,
    static_argnames=("rate_floor", "interpret", "precision", "mesh", "head_side"),
)
def poisson_edge_stats(
    e_self: jax.Array,
    e_other: jax.Array,
    p: BlockedPass,
    rate_floor: float = 1e-10,
    interpret: bool = False,
    precision: str = "high",
    mesh=None,
    head=None,
    head_side: str = "user",
):
    """Compute (S_alloc, S_other) segment sums over self rows.

    e_self: (n_self, K), e_other: (n_other, K).  Returns two (n_self, K)
    f32 arrays:  S_alloc[r] = sum_{edges of r} x * g_self * g_other / rate,
    S_other[r] = sum_{edges of r} g_other — the two sufficient statistics
    of every Poisson-family coordinate block.

    precision: "high" (bf16x3 lane-packed, f32-exact, default),
    "mid" (bf16x2, ~2e-5), "fast" (single bf16 pass, ~5e-3 stat noise),
    "highest" (Mosaic HIGHEST f32 dots; cross-check only, ~3x slower).

    mesh: optional 1-D `jax.sharding.Mesh` — segments shard across the
    "data" axis (each device scans its local segments through the same
    compiled kernel; dummy zero-contribution segments pad to a multiple
    of the device count) and the per-device accumulators combine with one
    psum over ICI.

    head: optional `pmf_tpu.data.blocked.DenseHead` from a hybrid layout —
    the dense-corner edges excluded from ``p``, whose statistics are added
    from dense matmuls (`pmf_tpu.ops.dense_head`).  ``head_side`` says
    which direction this pass is: "user" when self rows are the head's
    user axis (by_user pass), "item" for the by_item pass.
    """
    parts = {"fast": 1, "fast_bf16": 1, "mid": 2, "high": 3, "highest": 1}[precision]
    highest = precision == "highest"
    K = e_self.shape[1]
    n_self_pad = p.n_self_blocks * p.bs_self
    n_other_pad = p.n_other_blocks * p.bs_other
    if p.reordered:
        e_self = jnp.take(e_self, p.self_old_of_new, axis=0)
        e_other = jnp.take(e_other, p.other_old_of_new, axis=0)
    head_adds = []  # (new-space start row, contribution) per stair tier
    if head:
        if not p.reordered:
            raise ValueError("dense head requires a reordered layout")
        from pmf_tpu.ops.dense_head import poisson_head_stats, poisson_head_stats_t

        for tier in head:
            hip = tier.hip
            rs = tier.row_start
            if head_side == "user":
                theta_h = e_self[rs : rs + tier.hu].astype(jnp.float32)
                beta_h = jnp.pad(
                    e_other[: tier.hi].astype(jnp.float32),
                    ((0, hip - tier.hi), (0, 0)),
                )
                sa_h, so_h = poisson_head_stats(
                    theta_h, beta_h, tier, rate_floor, precision, interpret,
                    mesh=mesh,
                )
                head_adds.append((rs, jnp.concatenate([sa_h, so_h], axis=1)))
            else:
                theta_h = e_other[rs : rs + tier.hu].astype(jnp.float32)
                beta_h = jnp.pad(
                    e_self[: tier.hi].astype(jnp.float32),
                    ((0, hip - tier.hi), (0, 0)),
                )
                sa_h, so_h = poisson_head_stats_t(
                    theta_h, beta_h, tier, rate_floor, precision, interpret,
                    mesh=mesh,
                )
                head_adds.append(
                    (0, jnp.concatenate([sa_h[: tier.hi], so_h[: tier.hi]], axis=1))
                )
    if highest:
        e_self_t = e_self.astype(jnp.float32)
        e_other_t = e_other.astype(jnp.float32)
    else:
        e_self_t = decompose_bf16(e_self, parts)
        e_other_t = decompose_bf16(e_other, parts)
    e_self_pad = jnp.pad(e_self_t, ((0, n_self_pad - e_self_t.shape[0]), (0, 0)))
    e_other_pad = jnp.pad(e_other_t, ((0, n_other_pad - e_other_t.shape[0]), (0, 0)))

    # Segmented invocation: uniform segments of seg_chunks chunks, with
    # output rows RELATIVE to the segment's first self block (sb[c] -
    # sb[0]); keeps the scalar-prefetch arrays small enough for SMEM at
    # any nnz.  Segments run under ONE lax.scan so exactly one Mosaic
    # kernel is compiled regardless of segment count.  Per-segment partial
    # sums are assembled by masked dynamic-slice addition (a block
    # straddling a segment cut contributes from both).
    n_segments = p.n_chunks // p.seg_chunks
    max_blocks = max(p.seg_n_blocks)
    out_rows = max_blocks * p.bs_self
    KT = e_self_pad.shape[1]

    G = p.group
    call = make_edge_stats_call(
        bs_self=p.bs_self, bs_other=p.bs_other, chunk_size=p.chunk_size,
        KT=KT, K=K, parts=parts, highest=highest, group=G,
        seg_chunks=p.seg_chunks, out_rows=out_rows, rate_floor=rate_floor,
        interpret=interpret,
    )

    C = p.chunk_size
    S = p.seg_chunks
    xs = (
        p.chunk_self_block.reshape(n_segments, S),
        p.chunk_other_block.reshape(n_segments, S),
        p.loc.reshape(n_segments, S * C, 1),
        p.x.reshape(n_segments, S * C, 1),
        jnp.asarray([b * p.bs_self for b in p.seg_first_block], jnp.int32),
        jnp.asarray([b * p.bs_self for b in p.seg_n_blocks], jnp.int32),
    )
    # Overhang room: the last segment's uniform out_rows window may extend
    # past n_self_pad.
    acc0 = jnp.zeros((n_self_pad + out_rows, 2 * K), jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0)

    def body(acc, seg):
        sb, ob, locv, xv, r0, nr = seg
        contrib = call(sb, ob, locv, xv, e_self_pad, *([e_other_pad] * G))
        contrib = jnp.where(row_ids < nr, contrib, 0.0)
        zero = jnp.zeros((), r0.dtype)
        region = jax.lax.dynamic_slice(acc, (r0, zero), (out_rows, 2 * K))
        acc = jax.lax.dynamic_update_slice(acc, region + contrib, (r0, zero))
        return acc, None

    if mesh is None:
        acc, _ = jax.lax.scan(body, acc0, xs)
    else:
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.devices.size
        pad_segs = (-n_segments) % n_dev
        if pad_segs:
            # Dummy segments: all-padding edges, first block 0, nr = 0 —
            # their contribution is fully masked.
            def pad_seg(a, fill):
                shape = (pad_segs,) + a.shape[1:]
                return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)])

            pad_loc = (p.bs_self << 16) | p.bs_other
            xs = (
                pad_seg(xs[0], 0),
                pad_seg(xs[1], 0),
                pad_seg(xs[2], pad_loc),
                pad_seg(xs[3], 0),
                pad_seg(xs[4], 0),
                pad_seg(xs[5], 0),
            )

        def local_segments(*xs_local):
            acc, _ = jax.lax.scan(body, acc0, xs_local)
            return jax.lax.psum(acc, "data")

        acc = jax.shard_map(
            local_segments,
            mesh=mesh,
            in_specs=tuple(P("data") for _ in xs),
            out_specs=P(),
            check_vma=False,  # pallas_call outputs carry no vma info
        )(*xs)

    for rs, add in head_adds:
        # Tier rows live at [rs, rs + rows) of the reordered space; add the
        # dense statistics before un-permuting.
        acc = acc.at[rs : rs + add.shape[0]].add(add)
    s_alloc, s_other = acc[: p.n_self, :K], acc[: p.n_self, K:]
    if p.reordered:
        s_alloc = jnp.take(s_alloc, p.self_new_of_old, axis=0)
        s_other = jnp.take(s_other, p.self_new_of_old, axis=0)
    return s_alloc, s_other
