"""TP blocked ring: the virtual-mesh SCALING SHAPE (VERDICT r3 weak #1).

One physical chip exists in this environment, so multi-chip TP throughput
cannot be timed directly.  What CAN be measured exactly without hardware
is the work GEOMETRY the ring hands each chip as the ring degree D grows:
the Pallas one-hot kernel's cost is proportional to padded CHUNK SLOTS
(every slot costs chunk_size x C one-hot MACs whether occupied or not),
and the ICI cost is the ppermuted visiting-table bytes.  This script
builds the REAL `build_tp_blocked` layouts for D in {1, 2, 4, 8} on the
ML-25M Zipf shape and reports, per direction and D:

  * real edges vs padded chunk-slot edges per chip (occupancy),
  * dummy-segment fraction (uniform `seg_max_override` padding — the
    price of one static Pallas geometry across all D^2 buckets),
  * per-chip slot scaling efficiency  eff(D) = slots/chip(D=1) /
    (D x slots/chip(D)) — the factor by which per-chip kernel work
    exceeds the ideal 1/D split,
  * ICI bytes per ring pass per chip ((D-1) ppermute hops of the
    visiting table; round-3 last-step optimization counted) and the
    bytes:MAC ratio vs the v5e ICI:MXU speed ratio — whether the ring
    is compute- or transfer-dominated at this scale.

Combined with bench.py's measured D=1 `tp` key (the full TP machinery on
the real chip), eff(D) bounds the expected per-chip rate at degree D:
rate(D) ~ rate(D=1) x eff(D) while the ring stays compute-bound.

Usage: python scripts/tp_scaling_shape.py [--nnz 25000000]
           [--data_cache data/cache/ml25m_planted_s11.npz]
           [--out reports/tp_scaling]

CPU-only (host layout build; no kernel execution).  Reference for the
TP design this measures: pmf_tpu/parallel/tp_blocked.py,
docs/PERFORMANCE.md "blocked kernels inside the TP rings".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Layout building is host-side numpy; keep jax off the TPU tunnel.
import jax

jax.config.update("jax_platforms", "cpu")

from pmf_tpu.data.blocked import auto_tiles  # noqa: E402
from pmf_tpu.parallel.tp_blocked import build_tp_blocked  # noqa: E402

# v5e per-chip spec: 197 TFLOP/s bf16 MXU, ~186 GB/s per ICI link
# (one direction).  Only the RATIO matters for the compute/transfer
# verdict; absolute numbers are not claimed.
V5E_MXU_MACS = 197e12 / 2.0
V5E_ICI_BPS = 186e9


def dir_stats(d, nnz_total: int, D: int, K: int, table_width: int):
    """Geometry of one TPBlockedDir: slots, dummies, per-chip work."""
    seg_nrows = np.asarray(d.seg_nrows)  # (D, steps, n_seg)
    n_seg_total = int(seg_nrows.size)
    n_dummy = int((seg_nrows == 0).sum())
    slot_chunks = n_seg_total * d.seg_chunks
    slot_edges = slot_chunks * d.chunk_size
    per_chip_slot_edges = slot_edges // D
    # Real (non-padding) edges held by this direction's tail: padding
    # slots carry the (bs_self << 16 | bs_other) sentinel.
    pad_packed = np.int32((d.bs_self << 16) | d.bs_other)
    tail_edges = int((np.asarray(d.loc) != pad_packed).sum())
    # One-hot kernel MACs per chip per pass: every chunk slot costs
    # chunk_size x C MACs for the one-hot build plus chunk_size x K for
    # the table product per payload lane; the slot count is the scaling
    # variable, so report slot-edges and derive MACs with the C=chunk
    # one-hot convention used by utils/roofline.py.
    macs_per_chip = per_chip_slot_edges * (d.chunk_size + K)
    # Visiting table: other_per rows x table_width lanes x 4 B, sent
    # D-1 times per pass (the last ring step consumes without the
    # discarded D-th hop).
    other_rows = d.n_other_blocks * d.bs_other
    ici_bytes = (D - 1) * other_rows * table_width * 4
    return {
        "seg_chunks": d.seg_chunks,
        "chunk_size": d.chunk_size,
        "n_segments_total": n_seg_total,
        "dummy_segments": n_dummy,
        "dummy_fraction": round(n_dummy / max(n_seg_total, 1), 4),
        "slot_edges_per_chip": per_chip_slot_edges,
        "tail_edges": tail_edges,
        "occupancy": round(tail_edges / max(slot_edges, 1), 4),
        "ici_bytes_per_pass_per_chip": ici_bytes,
        "macs_per_chip_per_pass": macs_per_chip,
        "ici_seconds": ici_bytes / V5E_ICI_BPS,
        "mxu_seconds": macs_per_chip / V5E_MXU_MACS,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_users", type=int, default=162_000)
    ap.add_argument("--n_items", type=int, default=59_000)
    ap.add_argument("--nnz", type=int, default=25_000_000)
    ap.add_argument("--n_factors", type=int, default=20)
    ap.add_argument("--degrees", default="1,2,4,8")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--data_cache", default="reports/cache/ml25m_planted_s11.npz")
    ap.add_argument("--out", default="reports/tp_scaling")
    ap.add_argument("--tag", default="r05")
    ap.add_argument("--no_balance", action="store_true",
                    help="skip the count-balanced global row deal the "
                         "production TP facades apply (naive contiguous "
                         "ownership — pathological on popularity-sorted "
                         "ids; kept for the before/after account)")
    ap.add_argument("--no_head", action="store_true",
                    help="build without the dense head (the pre-head "
                         "r04 geometry; production facades pass "
                         "head='auto' for HPF/plain Poisson)")
    args = ap.parse_args(argv)

    if args.data_cache and os.path.exists(args.data_cache):
        z = np.load(args.data_cache)
        u, i, x = z["u"][: args.nnz], z["i"][: args.nnz], z["x"][: args.nnz]
        print(f"# data cache: {args.data_cache} ({len(u)} edges)", flush=True)
    else:
        from pmf_tpu.data.synthetic import synth_planted

        u, i, x, _ = synth_planted(args.n_users, args.n_items, args.nnz,
                                   seed=args.seed,
                                   draw_factor=2.6 if args.nnz >= 5_000_000
                                   else 1.25)

    tiles = auto_tiles(args.n_users, args.n_items, len(u))
    K = args.n_factors
    # HPF's ring rotates the (rows, K) G_other table as f32 (its default
    # "high" precision uses 3 bf16 parts — wider than f32 — and the dense
    # head consumes raw f32 values, so per-step decomposition stays).
    # The Gaussian augmented table [m | b | tri(V+mm^T)] (K + 1 + K(K+1)/2
    # lanes) now rotates PRE-DECOMPOSED bf16 parts (tp_blocked.ring_stats,
    # round 5): bytes/row = 2 * (p_mb*(K+1) + p_A*tri) instead of
    # 4 * (K+1+tri).
    widths = {"hpf": K, "gaussian_bias": K + 1 + K * (K + 1) // 2}
    tri = K * (K + 1) // 2
    _FACTOR_PARTS = {"fast": (1, 1), "mid": (2, 1), "high": (2, 2)}
    gauss_bytes_per_row = {
        prec: 2 * (p_mb * (K + 1) + p_A * tri)
        for prec, (p_mb, p_A) in _FACTOR_PARTS.items()
    }
    gauss_bytes_per_row["f32_r04"] = 4 * (K + 1 + tri)

    report = {"tag": args.tag,
              "scale": {"n_users": args.n_users, "n_items": args.n_items,
                        "nnz": int(len(u)), "n_factors": K},
              "tiles": tiles,
              "row_ownership": ("naive contiguous" if args.no_balance else
                                "count-balanced round-robin deal "
                                "(parallel.tp.balance_perms — the "
                                "production fit(mesh=) path)"),
              "degrees": []}
    base_slots = {}
    for D in [int(s) for s in args.degrees.split(",")]:
        t0 = time.perf_counter()
        if args.no_balance:
            ub, ib = u, i
        else:
            from pmf_tpu.parallel.tp import balance_perms

            bal = balance_perms(u, i, -(-args.n_users // D) * D,
                                -(-args.n_items // D) * D, D)
            ub, ib = bal.u_new_of_old[u], bal.i_new_of_old[i]
        lay = build_tp_blocked(ub, ib, x, n_users=args.n_users,
                               n_items=args.n_items, n_devices=D,
                               block_users=tiles["block_users"],
                               block_items=tiles["block_items"],
                               chunk_size=tiles["chunk_size"],
                               group=tiles["group"],
                               head=None if args.no_head else "auto")
        build_s = time.perf_counter() - t0
        entry = {"D": D, "build_seconds": round(build_s, 1)}
        for name, dirn, tiers in (("by_user", lay.by_user, lay.head_user),
                                  ("by_item", lay.by_item, lay.head_item)):
            st = dir_stats(dirn, len(u), D, K, widths["hpf"])
            # Dense head: per chip per pass, each of the D ring steps
            # runs the fused kernel over its bucket's tiers — 3 dense
            # (rows x hip x K) contractions (R, W@beta, M@beta).
            head_cells = sum(t.hu * t.hip for t in tiers)
            st["head_tiers"] = [(t.row_start, t.hu, t.hi) for t in tiers]
            st["head_macs_per_chip_per_pass"] = 3 * D * head_cells * K
            st["head_edge_fraction"] = round(
                1.0 - st["tail_edges"] / max(len(u), 1), 4)
            st["mxu_seconds"] = (
                st["macs_per_chip_per_pass"]
                + st["head_macs_per_chip_per_pass"]) / V5E_MXU_MACS
            if D == 1:
                base_slots[name] = st["slot_edges_per_chip"]
            st["slot_scaling_efficiency"] = round(
                base_slots[name] / (D * st["slot_edges_per_chip"]), 4)
            # Compute- vs transfer-dominated: per HPF theta pass, each chip
            # overlaps (D-1)/D of the kernel work with table hops.
            st["ici_to_mxu_ratio"] = round(
                st["ici_seconds"] / max(st["mxu_seconds"], 1e-12), 3)
            entry[name] = st
        # Gaussian table is much wider; derive its ICI bytes from the
        # by_user row geometry and the PRE-DECOMPOSED bf16 rotation's
        # bytes/row per precision ("f32_r04" = the round-4 f32 rotation,
        # kept for the before/after).  The Gaussian family builds
        # HEADLESS layouts (its ring rejects a head), so its MXU time is
        # the tail-only slot cost; in a head run this understates
        # Gaussian tail work (the true Gaussian geometry is the
        # --no_head artifact) — flagged in the report.
        gu = entry["by_user"]
        other_rows_pass = (gu["ici_bytes_per_pass_per_chip"]
                           / max(widths["hpf"] * 4, 1))
        entry["gaussian_ici_bytes_per_pass_per_chip"] = {
            prec: int(other_rows_pass * bpr)
            for prec, bpr in gauss_bytes_per_row.items()
        }
        entry["gaussian_ici_to_mxu_ratio"] = {
            prec: round(b / V5E_ICI_BPS
                        / (gu["macs_per_chip_per_pass"] / V5E_MXU_MACS), 3)
            for prec, b in entry["gaussian_ici_bytes_per_pass_per_chip"].items()
        }
        entry["gaussian_note"] = ("headless layout geometry applies "
                                  "(see the no-head artifact)"
                                  if not args.no_head else "")
        report["degrees"].append(entry)
        print(f"# D={D}: built in {build_s:.0f}s; by_user occupancy "
              f"{gu['occupancy']:.3f}, dummy {gu['dummy_fraction']:.3f}, "
              f"eff {gu['slot_scaling_efficiency']:.3f}, ICI/MXU "
              f"{gu['ici_to_mxu_ratio']:.2f}", flush=True)
        del lay

    os.makedirs(args.out, exist_ok=True)
    jpath = os.path.join(args.out, f"TP_SCALING_{args.tag}.json")
    with open(jpath, "w") as f:
        json.dump(report, f, indent=1)
    write_md(report, os.path.join(args.out, f"TP_SCALING_{args.tag}.md"))
    print(f"# wrote {jpath}", flush=True)


def write_md(report, path):
    s = report["scale"]
    lines = [
        f"# TP blocked ring scaling shape ({report['tag']})",
        "",
        f"Real `build_tp_blocked` layouts on the ML-25M Zipf shape "
        f"({s['n_users']:,} x {s['n_items']:,}, {s['nnz']:,} edges, "
        f"K={s['n_factors']}), row ownership: {report['row_ownership']}; "
        "exact geometry, no timing.  "
        "eff(D) = slot-edges/chip at D=1 divided by D x slot-edges/chip "
        "at D — the per-chip kernel-work overhead vs an ideal 1/D split.  "
        "ICI/MXU <= 1 means the ring stays compute-bound (table hops "
        "hide under kernel work).",
        "",
        "| D | head edge frac u/i | occupancy u/i | dummy seg frac u/i | "
        "eff(D) u/i | HPF ICI/MXU | Gaussian ICI/MXU f32(r04) -> "
        "high / mid / fast | build s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for e in report["degrees"]:
        bu, bi = e["by_user"], e["by_item"]
        g = e["gaussian_ici_to_mxu_ratio"]
        lines.append(
            f"| {e['D']} | {bu.get('head_edge_fraction', 0):.3f} / "
            f"{bi.get('head_edge_fraction', 0):.3f} | "
            f"{bu['occupancy']:.3f} / {bi['occupancy']:.3f} | "
            f"{bu['dummy_fraction']:.3f} / {bi['dummy_fraction']:.3f} | "
            f"{bu['slot_scaling_efficiency']:.3f} / "
            f"{bi['slot_scaling_efficiency']:.3f} | "
            f"{bu['ici_to_mxu_ratio']:.2f} | "
            f"{g['f32_r04']:.2f} -> {g['high']:.2f} / {g['mid']:.2f} / "
            f"{g['fast']:.2f} | "
            f"{e['build_seconds']} |")
    lines += [
        "",
        "Expected per-chip rate at degree D ~ measured D=1 rate "
        "(bench detail `tp`) x eff(D) while ICI/MXU stays <= 1.",
        "",
        "The Gaussian ring rotates its augmented table PRE-DECOMPOSED to "
        "the kernel's bf16 parts (round 5, exactly equivalent math): "
        "bytes/row drop from 4*(K+1+tri) to 2*(p_mb*(K+1) + p_A*tri) — "
        "1.83x fewer at 'mid', 2x at 'fast', parity at 'high' (2+2 "
        "parts).",
    ]
    if any(e.get("gaussian_note") for e in report["degrees"]):
        lines += [
            "",
            "Head run caveats: the Gaussian family builds HEADLESS "
            "layouts (its ring rejects a head), so its true geometry is "
            "the no-head artifact (`TP_SCALING_r04.*`); the Gaussian "
            "column here divides its ICI bytes by this head layout's "
            "TAIL-only MXU time and overstates the ratio.  Head edge "
            "fraction GROWS with D because the per-device head budget "
            "is constant, so aggregate head capacity scales with the "
            "device count — per-chip tail slots then shrink "
            "super-linearly (eff(D) > 1).  The MXU-seconds model "
            "charges head cells 3K dense MACs each at peak; the "
            "measured engine comparison is "
            "`scripts/tp_ring_bench.py` -> "
            "`reports/tp_scaling/TP_RING_r04.json`.",
        ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
