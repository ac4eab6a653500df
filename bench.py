"""Headline benchmark: HPF-CAVI rating-updates/sec/chip on synthetic data
at MovieLens-25M-ish scale (200k users x 40k items x 20M ratings, K=20).

One CAVI iteration processes every observed rating twice (theta-block edge
sweep + beta-block edge sweep); rating-updates/sec = 2 * nnz / sweep_time.
Baseline target (BASELINE.json north star): 100M rating-updates/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n_users=200_000, n_items=40_000, nnz=20_000_000, K=20, iters=6):
    import jax

    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models import hpf

    rng = np.random.default_rng(0)
    u = rng.integers(0, n_users, size=nnz).astype(np.int64)
    i = rng.integers(0, n_items, size=nnz).astype(np.int64)
    x = (1.0 + rng.integers(0, 5, size=nnz)).astype(np.float64)
    # Ensure full dimension coverage.
    u[:n_users] = np.arange(n_users)
    i[:n_items] = np.arange(n_items)

    data = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    cfg = hpf.HPFConfig(n_factors=K, verbose=False)
    state = hpf.init_state(n_users, n_items, cfg)

    def step(s):
        return hpf.sweep(
            s, data, cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime
        )

    # NOTE on timing methodology: on the axon TPU tunnel platform,
    # jax.block_until_ready can return without synchronizing; the only
    # reliable sync is an actual device->host transfer.  Iterations are
    # naturally chained (state feeds the next sweep), so one scalar
    # transfer at the end bounds the whole chain; the measured transfer
    # round-trip is subtracted.
    import jax.numpy as jnp

    def sync(s):
        return float(jnp.sum(s["a_theta"]))

    # Warmup / compile.
    state = step(state)
    sync(state)

    # Transfer round-trip baseline.
    t0 = time.perf_counter()
    for _ in range(3):
        sync(state)
    rtt = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    sync(state)
    dt = (time.perf_counter() - t0 - rtt) / iters

    updates_per_sec = 2.0 * nnz / dt
    baseline = 100e6  # north-star target, BASELINE.json
    print(
        json.dumps(
            {
                "metric": "hpf_cavi_rating_updates_per_sec_per_chip",
                "value": round(updates_per_sec, 1),
                "unit": "updates/s",
                "vs_baseline": round(updates_per_sec / baseline, 3),
                "detail": {
                    "n_users": n_users,
                    "n_items": n_items,
                    "nnz": nnz,
                    "K": K,
                    "sweep_seconds": round(dt, 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    kwargs = {}
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        kwargs = dict(n_users=20_000, n_items=4_000, nnz=2_000_000, iters=3)
    main(**kwargs)
