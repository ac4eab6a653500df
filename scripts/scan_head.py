"""Scan dense-head sizes for the HPF hybrid engine at ML-25M Zipf scale.

Measures sweep_blocked seconds/iteration with no head vs heads of
increasing byte budget, on the real TPU.  Usage:
    python scripts/scan_head.py [budget_gb ...]
"""

import sys
import time

import numpy as np


def main():
    budgets = [float(a) for a in sys.argv[1:]] or [0, 1, 2, 4]
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

    for gb in budgets:
        t0 = time.perf_counter()
        blocked = build_blocked(
            u, i, x, n_users=n_users, n_items=n_items,
            block_users=512, block_items=512, chunk_size=128, group=16,
            reorder=True,
            head=None if gb == 0 else "auto",
            head_bytes=int(gb * (1 << 30)) or 1,
            tail_group_cap=32,
        )
        t_build = time.perf_counter() - t0
        h = blocked.head
        if h is None:
            desc = "none"
        else:
            cover = sum(float(np.asarray(t.m, np.float32).sum()) for t in h)
            cells = sum(t.hu * t.hip for t in h)
            tiers = " ".join(f"[{t.row_start}+{t.hu}x{t.hi}]" for t in h)
            desc = f"{tiers} cells={cells / 1e6:.0f}M cover={cover / nnz:.2%}"

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
        print(
            f"budget={gb:g}GB head[{desc}] build={t_build:.1f}s "
            f"iter={dt:.4f}s rate={2 * nnz / dt / 1e6:.0f}M updates/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
