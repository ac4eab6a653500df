"""Microbench the SGD step's primitive costs on the real chip: random-row
gather, random-row scatter-add, and sorted-index variants, at the HPF-MAP
production shapes (tables (162k, 20) / (59k, 20), batch 65536).

Questions:
  * what do gather and scatter-add cost per batch (the step's dominant
    terms per scripts/profile_hpf_map.py)?
  * does sorting the batch indices (legal inside a step: the batch
    gradient is order-invariant) speed either one up?
  * scatter-add via .at[].add vs segment_sum over sorted ids?

Usage: python scripts/microbench_gather_scatter.py [--batch 65536]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--n_rows", type=int, default=162_000)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    B, N, K, S = args.batch, args.n_rows, args.K, args.steps

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (S, B)).astype(np.int32))
    idx_sorted = jnp.sort(idx, axis=1)
    vals = jnp.asarray(rng.standard_normal((S, B, K)).astype(np.float32))

    def scan_over(fn, *xs):
        @jax.jit
        def run(table, *xs):
            def step(c, batch):
                return c + fn(table, *batch), None

            c, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), xs)
            return c

        return lambda: float(run(table, *xs))

    t = timeit(scan_over(lambda tb, ix: jnp.take(tb, ix, axis=0).sum(), idx))
    print(f"gather random          : {t/S*1e3:7.3f} ms/batch "
          f"({B/(t/S)/1e6:.0f}M rows/s)")
    t = timeit(scan_over(lambda tb, ix: jnp.take(tb, ix, axis=0).sum(), idx_sorted))
    print(f"gather sorted          : {t/S*1e3:7.3f} ms/batch")

    t = timeit(scan_over(
        lambda tb, ix, v: jnp.zeros_like(tb).at[ix].add(v).sum(),
        idx, vals))
    print(f"scatter-add random     : {t/S*1e3:7.3f} ms/batch")
    t = timeit(scan_over(
        lambda tb, ix, v: jnp.zeros_like(tb).at[ix].add(v).sum(),
        idx_sorted, vals))
    print(f"scatter-add sorted     : {t/S*1e3:7.3f} ms/batch")
    t = timeit(scan_over(
        lambda tb, ix, v: jax.ops.segment_sum(v, ix, num_segments=N).sum(),
        idx_sorted, vals))
    print(f"segment_sum sorted     : {t/S*1e3:7.3f} ms/batch")

    # sort cost itself (inside-step sorting of the batch by row id)
    t = timeit(scan_over(lambda tb, ix: jnp.sort(ix, axis=0).astype(jnp.float32).sum() * 0
                         + jnp.float32(0), idx))
    print(f"sort 65k ids           : {t/S*1e3:7.3f} ms/batch")


if __name__ == "__main__":
    main()
