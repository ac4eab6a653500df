"""Shared scan-over-segments driver for blocked edge-pass kernels.

Kernels over a `pmf_tpu.data.blocked.BlockedPass` share one invocation
shape: scalar-prefetched chunk->block maps, G chunks per grid step sharing
a self block, one self-indexed table, G other-indexed table refs, and a
revisited (bs_self, out_width) accumulator block.  Uniform segments of
seg_chunks chunks run under ONE lax.scan (a single Mosaic kernel compile,
SMEM-bounded scalar prefetch at any nnz); per-segment partial sums are
assembled by masked dynamic-slice addition (a block straddling a segment
cut contributes from both sides).

Used by `gaussian_edge` and `ext_edge`; `cavi_edge` keeps its original
inline copy of the same structure (the tuned HPF/Poisson production path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmf_tpu.data.blocked import BlockedPass


def run_segmented(kernel, p: BlockedPass, self_table, other_table, out_width,
                  interpret: bool = False, mesh=None):
    """Run ``kernel`` over all segments; returns the (n_self, out_width)
    statistic.  ``kernel`` receives (sb_ref, ob_ref, loc_ref, x_ref,
    [self_block_ref,] other_block_ref x G, out_ref) — the self-table ref is
    omitted when ``self_table`` is None (pure pass-through kernels need no
    per-self-row values).

    mesh: optional 1-D `jax.sharding.Mesh` — segments shard across the
    "data" axis (dummy zero-contribution segments pad to a multiple of the
    device count) and per-device accumulators combine with one psum over
    ICI, mirroring `cavi_edge.poisson_edge_stats`."""
    n_segments = p.n_chunks // p.seg_chunks
    max_blocks = max(p.seg_n_blocks)
    out_rows = max_blocks * p.bs_self
    K_out = out_width
    G = p.group

    self_specs = (
        []
        if self_table is None
        else [pl.BlockSpec((p.bs_self, self_table.shape[1]),
                           lambda c, sb, ob, G=G: (sb[G * c], 0))]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p.seg_chunks // G,),
        in_specs=[
            pl.BlockSpec((G * p.chunk_size, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((G * p.chunk_size, 1), lambda c, sb, ob: (c, 0)),
            *self_specs,
            *[
                pl.BlockSpec(
                    (p.bs_other, other_table.shape[1]),
                    lambda c, sb, ob, G=G, g=g: (ob[G * c + g], 0),
                )
                for g in range(G)
            ],
        ],
        out_specs=pl.BlockSpec(
            (p.bs_self, K_out), lambda c, sb, ob, G=G: (sb[G * c] - sb[0], 0)
        ),
    )
    from pmf_tpu.ops.pallas.cavi_edge import VMEM_LIMIT_BYTES

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, K_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
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
    n_self_pad = p.n_self_blocks * p.bs_self
    acc0 = jnp.zeros((n_self_pad + out_rows, K_out), jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0)

    self_args = () if self_table is None else (self_table,)

    def body(acc, seg):
        sb, ob, locv, xv, r0, nr = seg
        seg_out = call(sb, ob, locv, xv, *self_args, *([other_table] * G))
        seg_out = jnp.where(row_ids < nr, seg_out, 0.0)
        zero = jnp.zeros((), r0.dtype)
        region = jax.lax.dynamic_slice(acc, (r0, zero), (out_rows, K_out))
        return jax.lax.dynamic_update_slice(acc, region + seg_out, (r0, zero)), None

    if mesh is None:
        acc, _ = jax.lax.scan(body, acc0, xs)
    else:
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.devices.size
        pad_segs = (-n_segments) % n_dev
        if pad_segs:
            # Dummy segments: all-padding edges (local index == block size
            # matches no one-hot column), nr = 0 masks the whole window.
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
    return acc[: p.n_self]
