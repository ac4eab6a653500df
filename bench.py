"""Headline benchmark: HPF-CAVI rating-updates/sec/chip on synthetic data
at MovieLens-25M-ish scale (200k users x 40k items x 20M ratings, K=20).

One CAVI iteration processes every observed rating twice (theta-block edge
sweep + beta-block edge sweep); rating-updates/sec = 2 * nnz / sweep_time.
Baseline target (BASELINE.json north star): 100M rating-updates/sec/chip.

The headline number uses the production-default engine (blocked_high: the
Pallas one-hot-matmul kernel at ~f32-exact precision); the detail field
also reports the blocked_fast (single-pass bf16 MXU) and flat (XLA
gather/scatter) engines.

Timing methodology: on the axon TPU tunnel, jax.block_until_ready can
return without synchronizing; iterations are chained (state feeds the
next sweep) and bounded by one scalar device->host transfer, with the
measured transfer round-trip subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE = 100e6  # north-star target, BASELINE.json


def _sync(state):
    import jax.numpy as jnp

    return float(jnp.sum(state["a_theta"]))


def _time_engine(step, state, iters, rtt):
    state = step(state)  # compile + warmup
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    _sync(state)
    return (time.perf_counter() - t0 - rtt) / iters


def main(n_users=200_000, n_items=40_000, nnz=20_000_000, K=20, iters=6):
    import jax

    from pmf_tpu.data.blocked import build_blocked
    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models import hpf
    from pmf_tpu.utils.platform import measure_transfer_rtt

    rng = np.random.default_rng(0)
    u = rng.integers(0, n_users, size=nnz).astype(np.int64)
    i = rng.integers(0, n_items, size=nnz).astype(np.int64)
    x = (1.0 + rng.integers(0, 5, size=nnz)).astype(np.float32)
    u[:n_users] = np.arange(n_users)
    i[:n_items] = np.arange(n_items)

    cfg = hpf.HPFConfig(n_factors=K, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    state0 = hpf.init_state(n_users, n_items, cfg)

    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    # Block sizes sized to tile density: ~512-row blocks keep the average
    # (user-block x item-block) tile near one 512-edge chunk at this shape.
    blocked = build_blocked(u, i, x, n_users=n_users, n_items=n_items,
                            block_users=512, block_items=512)
    rtt = measure_transfer_rtt()

    results = {}
    for engine in ("blocked_high", "blocked_fast", "flat"):
        if engine == "flat":
            step = lambda s: hpf.sweep(s, flat, *hyper)
        else:
            prec = "fast" if engine.endswith("fast") else "high"
            step = lambda s, p=prec: hpf.sweep_blocked(
                s, blocked, flat.user_counts, flat.item_counts, *hyper, precision=p
            )
        try:
            dt = _time_engine(step, dict(state0), iters, rtt)
            results[engine] = 2.0 * nnz / dt
        except Exception as e:  # e.g. flat engine HBM OOM at 20M edges
            results[engine] = None
            print(f"# engine {engine} failed: {str(e)[:160]}", file=sys.stderr)
        else:
            print(f"# engine {engine}: {results[engine]/1e6:.0f}M updates/s", file=sys.stderr)

    value = results["blocked_high"]
    print(
        json.dumps(
            {
                "metric": "hpf_cavi_rating_updates_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "updates/s",
                "vs_baseline": round(value / BASELINE, 3),
                "detail": {
                    "n_users": n_users,
                    "n_items": n_items,
                    "nnz": nnz,
                    "K": K,
                    "engines_updates_per_sec": {
                        k: (round(v, 1) if v else None) for k, v in results.items()
                    },
                    "transfer_rtt_ms": round(rtt * 1e3, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    kwargs = {}
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        kwargs = dict(n_users=20_000, n_items=4_000, nnz=2_000_000, iters=4)
    main(**kwargs)
