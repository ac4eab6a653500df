"""Fused CAVI edge-pass Pallas kernel for the Poisson/HPF model family.

Replaces the XLA gather + scatter-add path (measured ~8-19 GB/s on TPU —
50-100x below HBM bandwidth, because (nnz, K~20) random access maps badly
onto 8x128 tiles) with a blocked formulation where every random access is
a one-hot matmul on the 128x128 MXU:

For each chunk of `C` edges, all belonging to one (self_block, other_block)
tile of factor rows (`pmf_tpu.data.blocked.BlockedPass`):

    onehot_self  = (self_loc  == iota)          (C, BS)
    onehot_other = (other_loc == iota)          (C, BO)
    g_self  = onehot_self  @ E_self_block       (C, K)   MXU gather
    g_other = onehot_other @ E_other_block      (C, K)   MXU gather
    rate    = max(<g_self, g_other>, floor)     (C,)     VPU
    alloc   = (x / rate) * g_self * g_other     (C, K)   VPU
    S_alloc_block  += onehot_self^T @ alloc     (BS, K)  MXU segment-sum
    S_other_block  += onehot_self^T @ g_other   (BS, K)  MXU segment-sum

Chunks are self-block-major, so each output block accumulates in VMEM
across consecutive grid steps and spills to HBM exactly once (the
standard revisited-output pattern).  Padding edges carry local index ==
block_size, matching no one-hot column, and rating 0 — they contribute
exactly zero.

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


def _kernel(
    sb_ref,  # scalar prefetch: (n_chunks,) chunk -> self block
    ob_ref,  # scalar prefetch: (n_chunks,) chunk -> other block
    sloc_ref,  # (C, 1) int32
    oloc_ref,  # (C, 1) int32
    x_ref,  # (C, 1) float
    eself_ref,  # (BS, K) float
    eother_ref,  # (BO, K) float
    salloc_ref,  # out (BS, K)
    sother_ref,  # out (BS, K)
    *,
    bs_self: int,
    bs_other: int,
    chunk_size: int,
    rate_floor: float,
    precision,
    k: int,
):
    # With bf16 factor tables (fast_bf16 mode) the one-hots are built in
    # bf16 too: pure-bf16 MXU matmuls with f32 accumulation, no VPU
    # conversion passes and half the block DMA traffic.
    in_dtype = eself_ref.dtype

    sloc = sloc_ref[:, :]  # (C, 1)
    oloc = oloc_ref[:, :]  # (C, 1)
    xv = x_ref[:, :]  # (C, 1)

    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (chunk_size, bs_self), 1)
    ).astype(in_dtype)
    onehot_o = (
        oloc == jax.lax.broadcasted_iota(jnp.int32, (chunk_size, bs_other), 1)
    ).astype(in_dtype)

    g_self = jnp.dot(
        onehot_s, eself_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    g_other = jnp.dot(
        onehot_o, eother_ref[:], preferred_element_type=jnp.float32, precision=precision
    )

    rate = jnp.maximum(
        jnp.sum(g_self * g_other, axis=1, keepdims=True),
        jnp.asarray(rate_floor, jnp.float32),
    )
    alloc = (xv.astype(jnp.float32) / rate) * g_self * g_other

    # First visit of this output block: zero the accumulators.
    c = pl.program_id(0)
    prev_sb = sb_ref[jnp.maximum(c - 1, 0)]
    is_first = (c == 0) | (sb_ref[c] != prev_sb)

    @pl.when(is_first)
    def _():
        salloc_ref[:] = jnp.zeros_like(salloc_ref)
        sother_ref[:] = jnp.zeros_like(sother_ref)

    # Pack both payloads into one segment-sum matmul (2K lanes <= 128).
    payload = jnp.concatenate([alloc, g_other], axis=1).astype(in_dtype)  # (C, 2K)
    contract = (((0,), (0,)), ((), ()))  # onehot_s^T @ payload
    seg = jax.lax.dot_general(
        onehot_s, payload, contract, preferred_element_type=jnp.float32,
        precision=precision,
    )
    salloc_ref[:] += seg[:, :k]
    sother_ref[:] += seg[:, k:]


@functools.partial(jax.jit, static_argnames=("rate_floor", "interpret", "precision"))
def poisson_edge_stats(
    e_self: jax.Array,
    e_other: jax.Array,
    p: BlockedPass,
    rate_floor: float = 1e-10,
    interpret: bool = False,
    precision: str = "high",
):
    """Compute (S_alloc, S_other) segment sums over self rows.

    e_self: (n_self, K), e_other: (n_other, K).  Returns two (n_self, K)
    arrays:  S_alloc[r] = sum_{edges of r} x * g_self * g_other / rate,
    S_other[r] = sum_{edges of r} g_other — the two sufficient statistics
    of every Poisson-family coordinate block.

    ``precision`` controls the MXU pass count for the one-hot matmuls:
    "high" (multi-pass bf16, ~f32-exact — the default for numerical parity
    with the reference) or "fast" (single bf16 pass, ~5e-3 relative noise
    in the statistics; CAVI remains stable, use for throughput).
    (Mosaic supports only DEFAULT and HIGHEST dot precisions.)
    """
    prec = {
        "fast": jax.lax.Precision.DEFAULT,
        "fast_bf16": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGHEST,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    if precision == "fast_bf16":
        e_self = e_self.astype(jnp.bfloat16)
        e_other = e_other.astype(jnp.bfloat16)
    K = e_self.shape[1]
    n_self_pad = p.n_self_blocks * p.bs_self
    n_other_pad = p.n_other_blocks * p.bs_other
    if p.reordered:
        e_self = jnp.take(e_self, p.self_old_of_new, axis=0)
        e_other = jnp.take(e_other, p.other_old_of_new, axis=0)
    e_self_pad = jnp.pad(e_self, ((0, n_self_pad - e_self.shape[0]), (0, 0)))
    e_other_pad = jnp.pad(e_other, ((0, n_other_pad - e_other.shape[0]), (0, 0)))

    # Segmented invocation: uniform segments of seg_chunks chunks, with
    # output rows RELATIVE to the segment's first self block (sb[c] -
    # sb[0]); keeps the scalar-prefetch arrays small enough for SMEM at
    # any nnz.  Segments run under ONE lax.scan so exactly one Mosaic
    # kernel is compiled regardless of segment count (remote compiles are
    # expensive, and many unrolled pallas_calls overwhelm the compiler).
    # Per-segment partial sums are assembled by masked dynamic-slice
    # addition (a block straddling a segment cut contributes from both).
    n_segments = p.n_chunks // p.seg_chunks
    max_blocks = max(p.seg_n_blocks)
    out_rows = max_blocks * p.bs_self

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p.seg_chunks,),
        in_specs=[
            pl.BlockSpec((p.chunk_size, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((p.chunk_size, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((p.chunk_size, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((p.bs_self, K), lambda c, sb, ob: (sb[c], 0)),
            pl.BlockSpec((p.bs_other, K), lambda c, sb, ob: (ob[c], 0)),
        ],
        out_specs=[
            pl.BlockSpec((p.bs_self, K), lambda c, sb, ob: (sb[c] - sb[0], 0)),
            pl.BlockSpec((p.bs_self, K), lambda c, sb, ob: (sb[c] - sb[0], 0)),
        ],
    )

    kernel = functools.partial(
        _kernel,
        bs_self=p.bs_self,
        bs_other=p.bs_other,
        chunk_size=p.chunk_size,
        rate_floor=rate_floor,
        precision=prec,
        k=K,
    )
    call = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, K), jnp.float32),
            jax.ShapeDtypeStruct((out_rows, K), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )

    C = p.chunk_size
    S = p.seg_chunks
    xs = (
        p.chunk_self_block.reshape(n_segments, S),
        p.chunk_other_block.reshape(n_segments, S),
        p.self_loc.reshape(n_segments, S * C, 1),
        p.other_loc.reshape(n_segments, S * C, 1),
        p.x.reshape(n_segments, S * C, 1),
        jnp.asarray([b * p.bs_self for b in p.seg_first_block], jnp.int32),
        jnp.asarray([b * p.bs_self for b in p.seg_n_blocks], jnp.int32),
    )
    # Overhang room: the last segment's uniform out_rows window may extend
    # past n_self_pad.
    acc0 = jnp.zeros((n_self_pad + out_rows, 2 * K), jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0)

    def body(acc, seg):
        sb, ob, sl, ol, xv, r0, nr = seg
        sa_seg, so_seg = call(sb, ob, sl, ol, xv, e_self_pad, e_other_pad)
        contrib = jnp.concatenate([sa_seg, so_seg], axis=1)
        contrib = jnp.where(row_ids < nr, contrib, 0.0)
        zero = jnp.zeros((), r0.dtype)
        region = jax.lax.dynamic_slice(acc, (r0, zero), (out_rows, 2 * K))
        acc = jax.lax.dynamic_update_slice(acc, region + contrib, (r0, zero))
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, xs)
    s_alloc, s_other = acc[: p.n_self, :K], acc[: p.n_self, K:]
    if p.reordered:
        s_alloc = jnp.take(s_alloc, p.self_new_of_old, axis=0)
        s_other = jnp.take(s_other, p.self_new_of_old, axis=0)
    return s_alloc, s_other
