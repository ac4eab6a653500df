"""Scan HPF blocked-engine tile configs at ML-25M scale on the TPU."""

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

    from pmf_tpu.data.blocked import build_blocked
    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models import hpf

    n_users, n_items, nnz, K = 162_000, 59_000, 25_000_000, 20
    rng = np.random.default_rng(0)
    iw = (1.0 + np.arange(n_items)) ** -1.0
    iw /= iw.sum()
    uw = (1.0 + np.arange(n_users)) ** -0.7
    uw /= uw.sum()
    u = rng.choice(n_users, size=nnz, p=uw).astype(np.int64)
    i = rng.choice(n_items, size=nnz, p=iw).astype(np.int64)
    u[:n_users] = np.arange(n_users)
    i[:n_items] = np.arange(n_items)
    x = (1.0 + rng.integers(0, 5, size=nnz)).astype(np.float32)

    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    rtt = measure_transfer_rtt()
    cfg = hpf.HPFConfig(n_factors=K, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    state0 = hpf.init_state(n_users, n_items, cfg)

    configs = os.environ.get("SCAN_CONFIGS", "512x128x16,512x256x16,512x128x32")
    for c in configs.split(","):
        B, C, G = (int(v) for v in c.split("x"))
        t0 = time.perf_counter()
        blocked = build_blocked(u, i, x, n_users=n_users, n_items=n_items,
                                block_users=B, block_items=B,
                                chunk_size=C, group=G, reorder=True)
        tb = time.perf_counter() - t0
        pad = blocked.by_user.n_chunks * C / nnz

        def step(s, b=blocked):
            return hpf.sweep_blocked(s, b, flat.user_counts, flat.item_counts,
                                     *hyper, precision="high")

        try:
            s = step(dict(state0))
            float(jnp.sum(s["a_theta"]))
            t0 = time.perf_counter()
            for _ in range(4):
                s = step(s)
            float(jnp.sum(s["a_theta"]))
            dt = (time.perf_counter() - t0 - rtt) / 4
            print(f"B={B} C={C} G={G}: build {tb:.0f}s pad {pad:.2f} "
                  f"sweep {dt:.3f}s -> {2*nnz/dt/1e6:.0f}M updates/s", flush=True)
        except Exception as e:
            print(f"B={B} C={C} G={G}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
