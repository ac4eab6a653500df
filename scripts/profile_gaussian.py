"""Profile the Gaussian CAVI blocked engine piecewise at ML-25M scale.

Usage: python scripts/profile_gaussian.py [--nnz 25000000] [--k 20]
Times (a) the full sweep_blocked, (b) one gaussian_factor_stats pass,
(c) the batched Cholesky inverse + einsum tail, (d) one bias pass —
to locate where the iteration time goes before kernel surgery.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf))


def timeit(fn, arg, iters, rtt, chain=False):
    out = fn(arg)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        arg2 = out if chain else arg
        out = fn(arg2)
    sync(out)
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_users", type=int, default=162_000)
    ap.add_argument("--n_items", type=int, default=59_000)
    ap.add_argument("--nnz", type=int, default=25_000_000)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--group", type=int, default=1)
    ap.add_argument("--precision", default="high")
    args = ap.parse_args()

    from pmf_tpu.utils.platform import measure_transfer_rtt, setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from pmf_tpu.data.blocked import build_blocked
    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models import gaussian_mf
    from pmf_tpu.ops.pallas.gaussian_edge import gaussian_bias_stats, gaussian_factor_stats
    from pmf_tpu.ops.solve import batched_psd_inverse, batched_psd_inverse_fast

    n_users, n_items, nnz, K = args.n_users, args.n_items, args.nnz, args.k
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

    t0 = time.perf_counter()
    blocked = build_blocked(u, i, x, n_users=n_users, n_items=n_items,
                            block_users=args.block, block_items=args.block,
                            chunk_size=args.chunk, group=args.group, reorder=True)
    print(f"# build_blocked: {time.perf_counter()-t0:.1f}s  "
          f"by_user chunks={blocked.by_user.n_chunks} "
          f"pad={blocked.by_user.n_chunks*blocked.by_user.chunk_size/nnz:.2f}  "
          f"by_item chunks={blocked.by_item.n_chunks} "
          f"pad={blocked.by_item.n_chunks*blocked.by_item.chunk_size/nnz:.2f}")
    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    rtt = measure_transfer_rtt()
    print(f"# rtt {rtt*1e3:.1f} ms")

    cfg = gaussian_mf.GaussianMFConfig(n_factors=K, verbose=False)
    state = gaussian_mf.init_state(n_users, n_items, cfg)

    # (a) full sweep
    def full(s):
        return gaussian_mf.sweep_blocked(
            s, blocked, flat.user_counts, flat.item_counts,
            cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
            True, precision=args.precision)

    dt = timeit(full, state, args.iters, rtt, chain=True)
    print(f"full sweep: {dt:.3f}s  -> {4*nnz/dt/1e6:.0f}M edge-visits/s "
          f"(4 passes), {2*nnz/dt/1e6:.0f}M (2-pass convention)")

    # (a') lagged-bias sweep: bias stats ride the factor passes
    def full_lagged(s):
        return gaussian_mf.sweep_blocked(
            s, blocked, flat.user_counts, flat.item_counts,
            cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
            True, precision=args.precision, bias_update="lagged")

    dt_l = timeit(full_lagged, state, args.iters, rtt, chain=True)
    print(f"full sweep (lagged bias): {dt_l:.3f}s  -> "
          f"{4*nnz/dt_l/1e6:.0f}M 4-block, {2*nnz/dt_l/1e6:.0f}M factor-only")

    # (b) one factor pass (theta block stats)
    def fac(s):
        return gaussian_factor_stats(
            s["m_beta"], s["V_beta"], s["b_user"], s["b_item"], blocked.by_user,
            use_bias=True, precision=args.precision)
    dt_f = timeit(fac, state, args.iters, rtt)
    print(f"factor stats (by_user): {dt_f:.3f}s")

    def fac_i(s):
        return gaussian_factor_stats(
            s["m_theta"], s["V_theta"], s["b_item"], s["b_user"], blocked.by_item,
            use_bias=True, precision=args.precision)
    dt_fi = timeit(fac_i, state, args.iters, rtt)
    print(f"factor stats (by_item): {dt_fi:.3f}s")

    # (c) the solve tail
    eye = jnp.eye(K, dtype=jnp.float32)

    @jax.jit
    def solve_tail(s):
        S_A = s["V_theta"]  # stand-in (n_users, K, K)
        prec = eye / cfg.eta_theta2 + S_A / cfg.sigma2
        V = batched_psd_inverse_fast(prec)
        m = jnp.einsum("rkl,rl->rk", V, s["m_theta"]) / cfg.sigma2
        return m

    dt_s = timeit(solve_tail, state, args.iters, rtt)
    print(f"solve tail (users {n_users}): {dt_s:.3f}s")

    # (d) one bias pass
    def bias(s):
        return gaussian_bias_stats(
            s["m_theta"], s["m_beta"], s["b_item"], blocked.by_user,
            precision=args.precision)
    dt_b = timeit(bias, state, args.iters, rtt)
    print(f"bias stats (by_user): {dt_b:.3f}s")

    print(f"# accounted: 2*factor({dt_f:.3f}+{dt_fi:.3f}) + 2*solve-ish + "
          f"2*bias({dt_b:.3f}) vs full {dt:.3f}")


if __name__ == "__main__":
    main()
