"""TP ring D=1 throughput on the real chip: flat vs blocked vs blocked+head.

VERDICT r3 next #2 asked for a MEASURED TP number.  `bench.py` carries the
production config (blocked ring + dense head) as detail key `tp`; this
script is the engine comparison behind it — the same D=1 full-TP-machinery
run (bucketing, shard_map, local perms, count-balanced deal) for each ring
engine, so the head's win INSIDE the ring is measured, not inferred from
the single-chip hybrid.  The D-device scaling SHAPE is the geometry
artifact (`scripts/tp_scaling_shape.py`); multi-device equivalence is
gated on the virtual CPU mesh (`tests/test_tp_blocked.py`).

Usage: python scripts/tp_ring_bench.py [--nnz 25000000] [--iters 3]
           [--engines flat,blocked,blocked_head]
           [--out reports/tp_scaling/TP_RING_r04.json]

Writes one JSON with per-engine iter seconds + updates/s (2 edge-block
participations per rating per iteration, the HPF convention).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_users", type=int, default=162_000)
    ap.add_argument("--n_items", type=int, default=59_000)
    ap.add_argument("--nnz", type=int, default=25_000_000)
    ap.add_argument("--n_factors", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--engines", default="blocked_head,blocked,flat")
    ap.add_argument("--head_bytes", type=int, default=2 << 30,
                    help="per-device head byte budget for blocked_head")
    ap.add_argument("--data_cache", default="data/cache/ml25m_planted_s11.npz")
    ap.add_argument("--out", default="reports/tp_scaling/TP_RING_r04.json")
    args = ap.parse_args(argv)

    import jax

    from pmf_tpu.data.blocked import auto_tiles
    from pmf_tpu.models import hpf
    from pmf_tpu.parallel import make_mesh
    from pmf_tpu.parallel.tp import (
        HPF_AXIS_OF, HPF_PAD_ONES, balance_perms, build_tp_layout,
        pad_state_rows, place_tp, tp_sweep_hpf,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_hpf_blocked,
    )
    from pmf_tpu.utils.platform import measure_transfer_rtt, setup_cache

    setup_cache()

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
    nnz = len(u)
    K = args.n_factors
    cfg = hpf.HPFConfig(n_factors=K, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime,
             cfg.d_prime)
    mesh = make_mesh(1)
    interpret = jax.default_backend() == "cpu"
    rtt = measure_transfer_rtt()

    bal = balance_perms(u, i, args.n_users, args.n_items, 1)
    ub = bal.u_new_of_old[np.asarray(u)]
    ib = bal.i_new_of_old[np.asarray(i)]
    tiles = auto_tiles(args.n_users, args.n_items, nnz)

    def sync(tree):
        import jax.numpy as jnp

        leaves = jax.tree_util.tree_leaves(tree)
        return float(jnp.sum(leaves[0].ravel()[0]))

    def timed(step, st):
        st = step(st)
        sync(st)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st = step(st)
        sync(st)
        return (time.perf_counter() - t0 - rtt) / args.iters

    report = {"n_users": args.n_users, "n_items": args.n_items, "nnz": nnz,
              "K": K, "iters": args.iters,
              "updates_convention": "2 edge-block participations per "
                                    "rating per iteration (theta, beta)",
              "engines": {}}
    state_np = None
    for eng in args.engines.split(","):
        entry = {}
        try:
            t0 = time.perf_counter()
            if eng == "flat":
                lay = build_tp_layout(ub, ib, x, args.n_users, args.n_items, 1)
                place, sweep = place_tp, (
                    lambda s, lo: tp_sweep_hpf(s, lo, *hyper, mesh=mesh))
            else:
                lay = build_tp_blocked(
                    ub, ib, x, args.n_users, args.n_items, 1,
                    block_users=tiles["block_users"],
                    block_items=tiles["block_items"],
                    chunk_size=tiles["chunk_size"], group=tiles["group"],
                    head="auto" if eng == "blocked_head" else None,
                    head_bytes=args.head_bytes)
                place, sweep = place_tp_blocked, (
                    lambda s, lo: tp_sweep_hpf_blocked(
                        s, lo, *hyper, mesh=mesh, interpret=interpret))
                entry["head_tiers"] = {
                    "by_user": [(t.row_start, t.hu, t.hi)
                                for t in lay.head_user],
                    "by_item": [(t.row_start, t.hu, t.hi)
                                for t in lay.head_item],
                }
                entry["tail_slots"] = int(np.asarray(lay.by_user.loc).size)
            entry["build_seconds"] = round(time.perf_counter() - t0, 1)
            if state_np is None:
                state_np = pad_state_rows(
                    hpf.init_state(args.n_users, args.n_items, cfg),
                    HPF_AXIS_OF, lay.n_users_pad, lay.n_items_pad,
                    ones_keys=HPF_PAD_ONES)
            lay, st = place(lay, dict(state_np), mesh)
            dt = timed(lambda s: sweep(s, lay), st)
            entry["iter_seconds"] = round(dt, 4)
            entry["updates_per_sec"] = round(2.0 * nnz / dt, 1)
            print(f"# {eng}: {2 * nnz / dt / 1e6:.0f}M updates/s "
                  f"({dt:.3f}s/iter, build {entry['build_seconds']}s)",
                  flush=True)
            del lay, st
        except Exception as e:  # noqa: BLE001 — per-engine isolation
            entry["failure"] = str(e)[:400]
            print(f"# {eng} FAILED: {str(e)[:200]}", file=sys.stderr,
                  flush=True)
        report["engines"][eng] = entry

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
