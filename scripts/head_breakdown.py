"""Break hybrid HPF sweep time into tail-kernel vs dense-head portions,
and scan tail tile parameters (the tail is 5x sparser than the full data,
so the full-density C=128/G=16 tiling may be padding-bound).

Usage: python scripts/head_breakdown.py [budget_gb]
"""

import dataclasses
import sys
import time

import numpy as np


def main():
    gb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    sys.path.insert(0, ".")
    from bench import synth
    from pmf_tpu.data.blocked import build_blocked
    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models import hpf
    from pmf_tpu.utils.platform import measure_transfer_rtt, setup_cache

    import jax.numpy as jnp

    setup_cache()
    rtt = measure_transfer_rtt()

    n_users, n_items, nnz, K, iters = 162_000, 59_000, 25_000_000, 20, 6
    u, i, x = synth(n_users, n_items, nnz)
    cfg = hpf.HPFConfig(n_factors=K, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    state0 = hpf.init_state(n_users, n_items, cfg)

    def sync(s):
        return float(jnp.sum(s["a_theta"]))

    def timeit(blocked, label):
        def step(s):
            return hpf.sweep_blocked(
                s, blocked, flat.user_counts, flat.item_counts, *hyper,
                precision="high",
            )

        s = step(dict(state0))
        sync(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = step(s)
        sync(s)
        dt = (time.perf_counter() - t0 - rtt) / iters
        print(f"{label}: {dt:.4f}s/iter ({2 * nnz / dt / 1e6:.0f}M)",
              flush=True)
        return dt

    # Note: G*C = 4096 per grid step exceeds the 16M scoped-VMEM budget
    # (measured: C=128/G=32 -> 27M scoped alloc, compile OOM); 2048 is
    # the per-step ceiling, and C=64/G=32 is the measured tail optimum.
    for C, G in ((128, 16), (64, 32), (32, 32), (16, 32)):
        blocked = build_blocked(
            u, i, x, n_users=n_users, n_items=n_items,
            block_users=512, block_items=512, chunk_size=C, group=G,
            reorder=True, head="auto", head_bytes=int(gb * (1 << 30)),
        )
        tail_nnz = blocked.by_user.nnz
        slots = blocked.by_user.n_chunks * C
        print(f"C={C} G={G}: tail nnz={tail_nnz/1e6:.1f}M "
              f"slots={slots/1e6:.1f}M pad={slots/max(tail_nnz,1):.2f}",
              flush=True)
        dt_full = timeit(blocked, f"  hybrid C={C}/G={G}")
        if C == 128:
            try:
                tail_only = dataclasses.replace(blocked, head=None)
                dt_tail = timeit(tail_only, "  tail-only C=128")
                print(f"  dense portion ~= {dt_full - dt_tail:.4f}s",
                      flush=True)
            except Exception as e:
                print(f"  tail-only failed: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
