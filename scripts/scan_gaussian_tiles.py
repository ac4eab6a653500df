"""Scan Gaussian blocked-engine tile configs at ML-25M scale on the TPU."""

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
    from pmf_tpu.models import gaussian_mf

    n_users, n_items, nnz, K = 162_000, 59_000, 25_000_000, 20
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        nnz = 6_000_000
    rng = np.random.default_rng(0)
    iw = (1.0 + np.arange(n_items)) ** -1.0
    iw /= iw.sum()
    uw = (1.0 + np.arange(n_users)) ** -0.7
    uw /= uw.sum()
    u = rng.choice(n_users, size=nnz, p=uw).astype(np.int64)
    i = rng.choice(n_items, size=nnz, p=iw).astype(np.int64)
    u[:n_users] = np.arange(n_users)
    i[:n_items] = np.arange(n_items)
    x = rng.standard_normal(nnz).astype(np.float32)

    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    rtt = measure_transfer_rtt()
    cfg = gaussian_mf.GaussianMFConfig(n_factors=K, verbose=False)
    state0 = gaussian_mf.init_state(n_users, n_items, cfg)

    configs = [
        (256, 128, 16),
        (256, 64, 32),
        (128, 64, 32),
        (512, 128, 16),
        (256, 256, 8),
    ]
    if os.environ.get("SCAN_CONFIGS"):
        configs = [tuple(int(v) for v in c.split("x"))
                   for c in os.environ["SCAN_CONFIGS"].split(",")]

    for (B, C, G) in configs:
        t0 = time.perf_counter()
        blocked = build_blocked(u, i, x, n_users=n_users, n_items=n_items,
                                block_users=B, block_items=B,
                                chunk_size=C, group=G, reorder=True)
        tb = time.perf_counter() - t0
        pad_u = blocked.by_user.n_chunks * C / nnz
        pad_i = blocked.by_item.n_chunks * C / nnz

        def step(s):
            return gaussian_mf.sweep_blocked(
                s, blocked, flat.user_counts, flat.item_counts,
                cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
                True, precision="high")

        try:
            s = step(dict(state0))
            float(jnp.sum(s["m_theta"]))
            t0 = time.perf_counter()
            for _ in range(3):
                s = step(s)
            float(jnp.sum(s["m_theta"]))
            dt = (time.perf_counter() - t0 - rtt) / 3
            print(f"B={B} C={C} G={G}: build {tb:.0f}s pad {pad_u:.2f}/{pad_i:.2f} "
                  f"sweep {dt:.3f}s -> {2*nnz/dt/1e6:.0f}M (2-pass) "
                  f"{4*nnz/dt/1e6:.0f}M (4-pass)", flush=True)
        except Exception as e:
            print(f"B={B} C={C} G={G}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
