"""Quantify the counts-formulation tail hybrid AGAINST the production
dense-head layout (round-3 closure of the last modeled perf lever).

The round-1 analysis (docs/PERFORMANCE.md "The counts formulation,
analyzed") modeled a 1.3-1.6x factor-pass win from computing per-tile
co-occurrence counts `onehot_s^T @ onehot_o` and flushing the WIDE
Gaussian second-moment statistic as `counts @ triA` per (self, other)
block tile.  That model predates the dense-head engine: the head's M cell
array IS the counts matrix of the supersaturated Zipf corner, consumed as
dense matmuls — i.e. the head already implements the counts formulation
exactly where it wins.  This script measures what remains for the TAIL.

Model (K=20, T=K(K+1)/2=210, precision "high" p_mb=2/p_A=2, MXU lane
granularity 128, one-hot matmul MACs = rows x padded-lanes per slot):

  direct (shipped kernel), B=512 tiles:
    gather  [mb | triA parts]  (BO x 462->512 lanes)   = 512*512 /slot
    scatter [w | m | triA]     (BS x 504->512 lanes)   = 512*512 /slot
    total ................................... 524,288 MAC/slot
  counts variant at other-tile width BO':
    counts accumulation onehot_s^T @ onehot_o (BS x BO' lanes)
    mb-only gather (BO x 42->128) + narrow scatter (BS x 84->128)
    per-tile flush counts @ triA parts (BS x BO' x 420->512 lanes)
  BO'=512: 393,216 MAC/slot + 134.2M/tile  -> break-even 1024 slots/tile
  BO'=128: 196,608 MAC/slot + 33.6M/tile   -> break-even  102 slots/tile
  (at precision "mid" p_A=1 the direct pass is 327,680 MAC/slot — already
  cheaper than the BO'=512 counts accumulation alone; counts loses
  outright, so only "high" is modeled.)

Outputs per pass (by_user / by_item): tail tile-occupancy histogram and
the modeled MAC totals, direct vs counts, at both BO' choices.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 512
LANE = 128


def _tile_hist(name, self_blk, other_abs, C, bo_width):
    """edges -> (sb, ob') tile ids -> per-tile edge counts."""
    ob = other_abs // bo_width
    tile = self_blk.astype(np.int64) * (other_abs.max() // bo_width + 1) + ob
    _, counts = np.unique(tile, return_counts=True)
    slots = np.ceil(counts / C).astype(np.int64) * C
    return counts, slots


def model_pass(name, self_blk, other_abs, C, n_edges):
    print(f"\n== {name} (tail edges {n_edges/1e6:.2f}M, chunk C={C}) ==")
    out = {}
    for bo, per_slot, flush, brk in (
        (512, 393_216, 512 * 512 * 512, 1024),
        (128, 196_608, 512 * 128 * 512, 102),
    ):
        counts, slots = _tile_hist(name, self_blk, other_abs, C, bo)
        n_tiles = len(counts)
        tot_slots = int(slots.sum())
        direct_macs = 524_288 * tot_slots
        counts_macs = per_slot * tot_slots + flush * n_tiles
        dense = slots >= brk
        frac_dense = slots[dense].sum() / max(tot_slots, 1)
        # Partial hybrid: counts for dense-enough tiles only.
        hybrid_macs = (
            per_slot * slots[dense].sum() + flush * int(dense.sum())
            + 524_288 * slots[~dense].sum()
        )
        print(
            f"  BO'={bo}: {n_tiles} tiles, {tot_slots/1e6:.2f}M slots, "
            f"median {int(np.median(slots))} / mean {slots.mean():.0f} "
            f"slots/tile; >=break-even({brk}): {dense.sum()} tiles "
            f"({100*frac_dense:.1f}% of slots)"
        )
        print(
            f"    MACs: direct {direct_macs/1e12:.2f}T | all-counts "
            f"{counts_macs/1e12:.2f}T ({direct_macs/counts_macs:.2f}x) | "
            f"dense-only hybrid {hybrid_macs/1e12:.2f}T "
            f"({direct_macs/hybrid_macs:.2f}x)"
        )
        out[bo] = dict(tiles=n_tiles, slots=tot_slots,
                       direct=direct_macs, counts=counts_macs,
                       hybrid=hybrid_macs, frac_dense=float(frac_dense))
    return out


def main(n_users=162_000, n_items=59_000, nnz=25_000_000):
    from bench import synth
    from pmf_tpu.data.blocked import build_blocked

    u, i, x = synth(n_users, n_items, nnz)
    hybrid = build_blocked(
        u, i, x, n_users=n_users, n_items=n_items,
        block_users=B, block_items=B, chunk_size=128, group=8, reorder=True,
        head="auto", head_bytes=3 << 30, tail_group_cap=8,
    )
    for name, p in (("by_user", hybrid.by_user), ("by_item", hybrid.by_item)):
        loc = np.asarray(p.loc).reshape(p.n_chunks, p.chunk_size)
        sb = np.repeat(np.asarray(p.chunk_self_block), p.chunk_size).reshape(
            p.n_chunks, p.chunk_size)
        ob = np.repeat(np.asarray(p.chunk_other_block), p.chunk_size).reshape(
            p.n_chunks, p.chunk_size)
        sloc = (loc >> 16) & 0xFFFF
        oloc = loc & 0xFFFF
        real = sloc != p.bs_self  # padding slots carry self_loc == bs_self
        other_abs = (ob * p.bs_other + oloc)[real].ravel()
        self_blk = sb[real].ravel()
        model_pass(name, self_blk, other_abs, p.chunk_size, int(real.sum()))


if __name__ == "__main__":
    main()
