"""Sweep the Gaussian hybrid engine's dense-head byte budget at ML-25M.

The HPF budget scan found 2.5 GiB optimal (coverage-per-byte vs head
processing cost, docs/PERFORMANCE.md).  Gaussian head cells carry extra
planes (x_lo for centered ratings), so N GiB of Gaussian budget holds
fewer cells than N GiB of HPF budget — the optimum may sit elsewhere.
This measures hybrid_high (exact biases) and hybrid_mid_lagged (the
fastest production tier) across budgets.

    SCAN_GBYTES="2.5,3,3.75,4.5" python scripts/scan_gaussian_head.py
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
    from pmf_tpu.models import gaussian_mf

    n_users, n_items, nnz, K = 162_000, 59_000, 25_000_000, 20
    u, i, _ = synth(n_users, n_items, nnz)
    x = np.random.default_rng(1).standard_normal(nnz).astype(np.float32)
    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    rtt = measure_transfer_rtt()
    cfg = gaussian_mf.GaussianMFConfig(n_factors=K, verbose=False)
    state0 = gaussian_mf.init_state(n_users, n_items, cfg)

    budgets = os.environ.get("SCAN_GBYTES", "2.5,3,3.75,4.5")
    for g in budgets.split(","):
        head_bytes = int(float(g) * (1 << 30))
        t0 = time.perf_counter()
        try:
            hybrid = build_blocked(
                u, i, x, n_users=n_users, n_items=n_items,
                block_users=512, block_items=512, chunk_size=128, group=8,
                reorder=True, head="auto", head_bytes=head_bytes,
                tail_group_cap=8)
        except Exception as e:
            print(f"{g} GiB: BUILD FAILED {str(e)[:120]}", flush=True)
            continue
        tb = time.perf_counter() - t0
        cov = 1.0 - (hybrid.by_user.n_chunks * hybrid.by_user.chunk_size
                     / max(nnz, 1)) if hybrid.by_user else 0.0

        for name, prec, bias in (("hybrid_high", "high", "exact"),
                                 ("hybrid_mid_lagged", "mid", "lagged")):
            def step(s, p=prec, b=bias, lay=hybrid):
                return gaussian_mf.sweep_blocked(
                    s, lay, flat.user_counts, flat.item_counts,
                    cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
                    cfg.eta_bias2, True, precision=p, bias_update=b)

            try:
                s = step(dict(state0))
                float(jnp.sum(s["m_theta"]))
                t0 = time.perf_counter()
                for _ in range(5):
                    s = step(s)
                float(jnp.sum(s["m_theta"]))
                dt = (time.perf_counter() - t0 - rtt) / 5
                print(f"{g} GiB {name}: build {tb:.0f}s "
                      f"tail_slots {hybrid.by_user.n_chunks * hybrid.by_user.chunk_size / 1e6:.1f}M "
                      f"sweep {dt:.4f}s -> {4 * nnz / dt / 1e6:.0f}M "
                      f"4-block updates/s", flush=True)
            except Exception as e:
                print(f"{g} GiB {name}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
