"""Isolate the dense-Adam traffic cost of (N, 20) narrow arrays vs flat.

Theory: TPU HBM stores f32 arrays in (8, 128) tiles, so a (162k, 20)
parameter array physically occupies 128 lanes per row — 6.4x the logical
bytes — and every dense optimizer pass pays that inflation.  Compare one
Adam step (real nonzero grads, donated buffers) over:
  a) the production shapes {(162k,20),(59k,20),(162k,),(59k,)}
  b) the same element count as flat 1-D arrays
  c) row-packed (N/32, 640) arrays (lane-exact for K=20)

Usage: python scripts/microbench_adam_layout.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def bench(shapes, label, n_steps=50):
    rng = np.random.default_rng(0)
    params = {f"p{k}": jnp.asarray(rng.standard_normal(s).astype(np.float32))
              for k, s in enumerate(shapes)}
    grads = {f"p{k}": jnp.asarray(rng.standard_normal(s).astype(np.float32))
             for k, s in enumerate(shapes)}
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def many(p, s, g):
        def step(carry, _):
            p, s = carry
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
            return (p, s), None

        (p, s), _ = jax.lax.scan(step, (p, s), None, length=n_steps)
        return p, s

    p, s = many(params, state, grads)  # compile
    float(jax.tree_util.tree_leaves(p)[0].sum())
    t0 = time.perf_counter()
    p, s = many(params, state, grads)
    float(jax.tree_util.tree_leaves(p)[0].sum())
    dt = (time.perf_counter() - t0) / n_steps
    logical = sum(int(np.prod(s)) * 4 for s in shapes)
    print(f"{label:28s} {dt*1e3:7.3f} ms/step  "
          f"(logical p+m+v+g r/w ~ {7*logical/1e6:.0f} MB -> "
          f"{7*logical/dt/1e9:.0f} GB/s effective)")
    return dt


def main():
    nu, ni, K = 162_000, 59_000, 20
    bench([(nu, K), (ni, K), (nu,), (ni,)], "production (N, 20)")
    bench([(nu * K,), (ni * K,), (nu,), (ni,)], "flat 1-D")
    P = 32
    bench([(nu // P, K * P), (ni // P + 1, K * P), (nu,), (ni,)],
          "row-packed (N/32, 640)")


if __name__ == "__main__":
    main()
