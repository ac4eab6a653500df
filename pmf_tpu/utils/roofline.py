"""Analytic traffic/FLOP accounting for the blocked engines vs the v5e
roofline (VERDICT r2 Weak #2: "the tail kernel is the bottleneck" was
asserted, not quantified in the bench artifact).

The models here are LOWER BOUNDS on HBM bytes: every edge payload stream
counted once, factor-block tables once per tile transition (Pallas skips
the DMA when consecutive grid steps index the same block), outputs once
per self block, dense-head cell planes once per head pass.  MXU MACs
count the one-hot gather/scatter matmuls (the kernels' dominant term)
and the dense-head cell products.  Reported percentages are therefore
optimistic for the kernel: if measured time is close to
bytes_lower_bound / HBM_BW the kernel is provably memory-bound; a low
percentage on BOTH axes means fixed per-step overhead (grid/VMEM
constraints), not bandwidth, is the ceiling.

v5e peaks: 197 bf16 TFLOP/s (MXU), 819 GB/s HBM (public spec).
"""

from __future__ import annotations

import numpy as np

V5E_HBM_BYTES_PER_S = 819e9
V5E_BF16_FLOPS = 197e12  # mul+add counted as 2 FLOPs


def _transitions(block_ids) -> int:
    b = np.asarray(block_ids)
    if b.size == 0:
        return 0
    return int(np.count_nonzero(np.diff(b)) + 1)


def blocked_pass_traffic(p, w_gather_other: int, w_gather_self: int,
                         w_scatter: int, w_out_f32: int,
                         edge_payload_bytes: int = 8,
                         parts: int = 1) -> dict:
    """One edge pass over a BlockedPass.

    ``w_*`` are bf16 part-column widths of the one-hot matmuls
    (0 = the kernel skips that product); ``w_out_f32`` the f32 statistic
    columns written per self row; ``edge_payload_bytes`` per-edge stream
    bytes (packed loc int32 + rating f32 = 8); ``parts`` the bf16 parts
    per f32 source column (w / parts = f32 source width, used to count
    the table-build state reads)."""
    edges = p.n_chunks * p.chunk_size
    t_other = _transitions(p.chunk_other_block)
    bytes_edges = edges * edge_payload_bytes
    bytes_tables = (
        t_other * p.bs_other * w_gather_other * 2
        + p.n_self_blocks * p.bs_self * w_gather_self * 2
    )
    # Table build: write bf16 part tables + read the f32 source state
    # (w / parts f32 columns per row).
    bf16_writes = (p.n_other * w_gather_other + p.n_self * w_gather_self) * 2
    f32_reads = (p.n_other * w_gather_other + p.n_self * w_gather_self) * 4 \
        // max(parts, 1)
    bytes_build = bf16_writes + f32_reads
    bytes_out = p.n_self_blocks * p.bs_self * w_out_f32 * 4
    macs = edges * (
        p.bs_other * w_gather_other
        + p.bs_self * w_gather_self
        + p.bs_self * w_scatter
    )
    return {
        "bytes": bytes_edges + bytes_tables + bytes_build + bytes_out,
        "bytes_edges": bytes_edges,
        "bytes_tables": bytes_tables,
        "macs": macs,
        "tile_transitions": t_other,
        "edges_padded": edges,
    }


def head_traffic(head, K: int, planes: int, passes: int) -> dict:
    """Dense-head cell-plane traffic per iteration: ``planes`` bf16
    (hu, hip) arrays read ``passes`` times (user-side products + the
    transposed item-side products re-scan the same arrays), plus the
    head-row factor tables (~K f32 columns per head row per pass).
    MACs: each pass contracts every cell against ~K-wide payloads."""
    if not head:
        return {"bytes": 0, "macs": 0, "cells": 0}
    tiers = head if isinstance(head, (tuple, list)) else (head,)
    cells = sum(int(t.hu) * int(t.m.shape[1]) for t in tiers)
    table_rows = sum(int(t.hu) + int(t.m.shape[1]) for t in tiers)
    return {
        "bytes": cells * planes * 2 * passes + table_rows * K * 4 * passes,
        "macs": cells * K * planes * passes,
        "cells": cells,
    }


def hpf_blocked_traffic(layout, K: int, precision: str = "high") -> dict:
    """HPF/Poisson-family sweep: theta pass + beta pass (+ head)."""
    parts = {"high": 3, "mid": 2, "fast": 1}.get(precision, 3)
    w = parts * K
    out = {}
    total_b = total_m = 0
    for name, p in (("theta", layout.by_user), ("beta", layout.by_item)):
        # Scatter payload is [alloc parts | g_other parts] = 2*parts*K
        # bf16 columns (`cavi_edge._kernel`).
        t = blocked_pass_traffic(p, w_gather_other=w, w_gather_self=w,
                                 w_scatter=2 * parts * K, w_out_f32=2 * K,
                                 parts=parts)
        out[name] = t
        total_b += t["bytes"]
        total_m += t["macs"]
    h = head_traffic(layout.head, K, planes=2, passes=2)
    out["head"] = h
    total_b += h["bytes"]
    total_m += h["macs"]
    out["bytes_per_iter"] = total_b
    out["macs_per_iter"] = total_m
    return out


def gaussian_blocked_traffic(layout, K: int, precision: str = "high",
                             bias_update: str = "exact") -> dict:
    """Gaussian-with-biases sweep: 2 factor passes (+2 bias passes in
    exact mode; lagged rides the factor passes) + 3-plane head."""
    tri = K * (K + 1) // 2
    parts_w, parts_a = {"high": (2, 2), "mid": (2, 1),
                        "fast": (1, 1)}.get(precision, (2, 2))
    w_gather = parts_w * (K + 1) + parts_a * tri  # [m | b] + triA sections
    w_scatter = parts_w * (2 * K + 2) + parts_a * tri
    w_out = K + tri + 2  # f32 S_w, S_A, bias stats
    out = {}
    total_b = total_m = 0
    for name, p in (("theta", layout.by_user), ("beta", layout.by_item)):
        t = blocked_pass_traffic(p, w_gather_other=w_gather, w_gather_self=0,
                                 w_scatter=w_scatter, w_out_f32=w_out,
                                 parts=parts_w)
        out[name] = t
        total_b += t["bytes"]
        total_m += t["macs"]
    if bias_update == "exact":
        w_bias = parts_w * (K + 2)  # [m | b | x] pass-through tables
        for name, p in (("b_user", layout.by_user), ("b_item", layout.by_item)):
            t = blocked_pass_traffic(p, w_gather_other=w_bias,
                                     w_gather_self=0, w_scatter=w_bias,
                                     w_out_f32=4, parts=parts_w)
            out[name] = t
            total_b += t["bytes"]
            total_m += t["macs"]
    h = head_traffic(layout.head, K, planes=3,
                     passes=2 if bias_update == "lagged" else 4)
    out["head"] = h
    total_b += h["bytes"]
    total_m += h["macs"]
    out["bytes_per_iter"] = total_b
    out["macs_per_iter"] = total_m
    return out


def roofline_fields(traffic: dict, iter_seconds: float) -> dict:
    """Condense a traffic estimate + measured time into bench fields."""
    b, m = traffic["bytes_per_iter"], traffic["macs_per_iter"]
    eff_bw = b / iter_seconds
    eff_fl = 2.0 * m / iter_seconds
    head = traffic.get("head", {})
    tail_bytes = b - head.get("bytes", 0)
    return {
        "bytes_per_iter": int(b),
        "pct_hbm_roofline": round(100.0 * eff_bw / V5E_HBM_BYTES_PER_S, 1),
        "effective_gbps": round(eff_bw / 1e9, 1),
        "pct_mxu_roofline_bf16": round(100.0 * eff_fl / V5E_BF16_FLOPS, 1),
        "effective_tflops": round(eff_fl / 1e12, 1),
        "tail_bytes_per_iter": int(tail_bytes),
        "head_bytes_per_iter": int(head.get("bytes", 0)),
        "model": "analytic lower bound (see pmf_tpu/utils/roofline.py)",
    }
