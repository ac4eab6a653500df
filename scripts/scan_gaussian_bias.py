"""Scan bias-pass sub-layouts for the Gaussian blocked engine at ML-25M."""

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

    main_cfg = os.environ.get("MAIN_CONFIG", "512x128x8")
    B, C, G = (int(v) for v in main_cfg.split("x"))
    blocked = build_blocked(u, i, x, n_users=n_users, n_items=n_items,
                            block_users=B, block_items=B,
                            chunk_size=C, group=G, reorder=True)
    print(f"# main layout {main_cfg} built", flush=True)

    bias_cfgs = os.environ.get("BIAS_CONFIGS", "128x32x8,128x64x8,256x64x8")
    for bc in bias_cfgs.split(","):
        bB, bC, bG = (int(v) for v in bc.split("x"))
        t0 = time.perf_counter()
        bb = build_blocked(u, i, x, n_users=n_users, n_items=n_items,
                           block_users=bB, block_items=bB,
                           chunk_size=bC, group=bG, reorder=True)
        tb = time.perf_counter() - t0
        pad = bb.by_user.n_chunks * bC / nnz

        def step(s, bb=bb):
            return gaussian_mf.sweep_blocked(
                s, blocked, flat.user_counts, flat.item_counts,
                cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
                True, precision="high", blocked_bias=bb)

        try:
            s = step(dict(state0))
            float(jnp.sum(s["m_theta"]))
            t0 = time.perf_counter()
            for _ in range(3):
                s = step(s)
            float(jnp.sum(s["m_theta"]))
            dt = (time.perf_counter() - t0 - rtt) / 3
            print(f"bias@{bc}: build {tb:.0f}s pad {pad:.2f} sweep {dt:.3f}s "
                  f"-> {2*nnz/dt/1e6:.0f}M (2-pass) {4*nnz/dt/1e6:.0f}M (4-pass)",
                  flush=True)
        except Exception as e:
            print(f"bias@{bc}: FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
