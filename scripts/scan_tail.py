"""Scan the hybrid engine's TAIL tile configs at ML-25M scale on the TPU.

Round-2 found the residual tail kernel is ~3/4 of every hybrid HPF
iteration and attributed the ceiling to Mosaic's default VMEM budget
(G*C capped at 2048 edges/grid-step).  With the kernels' VMEM limit
raised to 100 MiB (`cavi_edge.VMEM_LIMIT_BYTES`), this scans larger
per-step edge groups over the SAME production head (auto staircase,
2 GiB) to find the new optimum.

    SCAN_CONFIGS="64x32,64x64,128x32,64x128,128x64" python scripts/scan_tail.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pmf_tpu.utils.platform import measure_transfer_rtt, setup_cache

    setup_cache()
    import jax.numpy as jnp

    from bench import synth
    from pmf_tpu.data.blocked import build_blocked
    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models import hpf

    n_users, n_items, nnz, K = 162_000, 59_000, 25_000_000, 20
    u, i, x = synth(n_users, n_items, nnz)
    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    rtt = measure_transfer_rtt()
    cfg = hpf.HPFConfig(n_factors=K, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    state0 = hpf.init_state(n_users, n_items, cfg)

    configs = os.environ.get(
        "SCAN_CONFIGS", "64x32,64x64,128x32,128x64,64x128,256x32")
    for c in configs.split(","):
        parts = [int(v) for v in c.split("x")]
        B, (C, G) = (parts[0], parts[1:]) if len(parts) == 3 else (512, parts)
        t0 = time.perf_counter()
        try:
            blocked = build_blocked(
                u, i, x, n_users=n_users, n_items=n_items,
                block_users=B, block_items=B, reorder=True,
                head="auto", head_bytes=2 << 30,
                tail_chunk_size=C, tail_group=G)
        except Exception as e:
            print(f"B={B} C={C} G={G}: BUILD FAILED {str(e)[:120]}", flush=True)
            continue
        tb = time.perf_counter() - t0
        tail_edges = blocked.by_user.n_chunks * C

        def step(s, b=blocked):
            return hpf.sweep_blocked(s, b, flat.user_counts, flat.item_counts,
                                     *hyper, precision="high")

        try:
            s = step(dict(state0))
            float(jnp.sum(s["a_theta"]))
            t0 = time.perf_counter()
            for _ in range(5):
                s = step(s)
            float(jnp.sum(s["a_theta"]))
            dt = (time.perf_counter() - t0 - rtt) / 5
            print(f"B={B} C={C} G={G} (step={C*G}): build {tb:.0f}s "
                  f"tail_slots {tail_edges/1e6:.1f}M sweep {dt:.4f}s -> "
                  f"{2*nnz/dt/1e6:.0f}M updates/s", flush=True)
        except Exception as e:
            print(f"B={B} C={C} G={G}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
