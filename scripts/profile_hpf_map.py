"""Break down where an HPF-MAP epoch spends its time at ML-25M scale.

Isolates the three candidate sinks on the real chip:
  shuffle   jax.random.permutation(25M) + 4 gathers + reshape
  grads     value_and_grad of batch_loss alone, scanned over all batches
            (dense scatter-add transpose of the gathers)
  adam      optimizer.update + apply_updates alone, scanned (dense traffic)
  step      the full production step, scanned (reference timing)

Usage: python scripts/profile_hpf_map.py [--nnz 25000000] [--batch 65536]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmf_tpu.models.hpf_map import HPFMapConfig, batch_loss, init_params


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, default=25_000_000)
    ap.add_argument("--n_users", type=int, default=162_000)
    ap.add_argument("--n_items", type=int, default=59_000)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--K", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    nnz = args.nnz
    B = args.batch
    n_batches = (nnz + B - 1) // B
    n_pad = n_batches * B
    u = rng.integers(0, args.n_users, n_pad).astype(np.int32)
    i = rng.integers(0, args.n_items, n_pad).astype(np.int32)
    x = rng.integers(1, 6, n_pad).astype(np.float32)
    u_all, i_all, x_all = map(jnp.asarray, (u, i, x))

    cfg = HPFMapConfig(n_factors=args.K, batch_size=B)
    params = init_params(args.n_users, args.n_items, cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    user_scale = jnp.full((args.n_users,), 1e-2, jnp.float32)
    item_scale = jnp.full((args.n_items,), 1e-2, jnp.float32)
    scalars = (0.3, 1.0, 1.0, 0.3, 1.0, 1.0)
    key = jax.random.key(0)

    @jax.jit
    def shuffle(key, u_all, i_all, x_all):
        perm = jax.random.permutation(key, n_pad)
        return (u_all[perm].reshape(n_batches, B),
                i_all[perm].reshape(n_batches, B),
                x_all[perm].reshape(n_batches, B))

    ub, ib, xb = shuffle(key, u_all, i_all, x_all)
    sync(ub)
    t_shuffle = timeit(lambda: sync(shuffle(key, u_all, i_all, x_all)))
    print(f"shuffle (perm + 3 gathers): {t_shuffle:.3f} s")

    @jax.jit
    def grads_only(p, ub, ib, xb):
        def step(c, batch):
            bu, bi, bx, bm = batch
            _, g = jax.value_and_grad(batch_loss)(
                p, bu, bi, bx, bm, user_scale, item_scale, scalars)
            return c + g["user"][0, 0], None

        c, _ = jax.lax.scan(step, jnp.float32(0), (ub, ib, xb, jnp.ones((n_batches, B), bool)))
        return c

    t_grads = timeit(lambda: sync(grads_only(params, ub, ib, xb)), n=2)
    print(f"grads only ({n_batches} batches): {t_grads:.3f} s "
          f"({t_grads / n_batches * 1e3:.2f} ms/step)")

    @jax.jit
    def loss_only(p, ub, ib, xb):
        def step(c, batch):
            bu, bi, bx, bm = batch
            l = batch_loss(p, bu, bi, bx, bm, user_scale, item_scale, scalars)
            return c + l, None

        c, _ = jax.lax.scan(step, jnp.float32(0), (ub, ib, xb, jnp.ones((n_batches, B), bool)))
        return c

    t_loss = timeit(lambda: sync(loss_only(params, ub, ib, xb)), n=2)
    print(f"forward only: {t_loss:.3f} s ({t_loss / n_batches * 1e3:.2f} ms/step)")

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    @jax.jit
    def adam_only(p, s):
        def step(carry, _):
            p, s = carry
            updates, s = optimizer.update(zero_grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), None

        (p, s), _ = jax.lax.scan(step, (p, s), None, length=n_batches)
        return p, s

    t_adam = timeit(lambda: sync(adam_only(params, opt_state)), n=2)
    print(f"adam only: {t_adam:.3f} s ({t_adam / n_batches * 1e3:.2f} ms/step)")

    @jax.jit
    def full(p, s, ub, ib, xb):
        def step(carry, batch):
            p, s = carry
            bu, bi, bx, bm = batch
            _, g = jax.value_and_grad(batch_loss)(
                p, bu, bi, bx, bm, user_scale, item_scale, scalars)
            updates, s = optimizer.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), None

        (p, s), _ = jax.lax.scan(step, (p, s), (ub, ib, xb, jnp.ones((n_batches, B), bool)))
        return p, s

    t_full = timeit(lambda: sync(full(params, opt_state, ub, ib, xb)), n=2)
    print(f"full step: {t_full:.3f} s ({t_full / n_batches * 1e3:.2f} ms/step) "
          f"-> {nnz / t_full / 1e6:.1f}M edge-visits/s (no shuffle)")
    print(f"epoch model: shuffle {t_shuffle:.2f} + steps {t_full:.2f} "
          f"= {t_shuffle + t_full:.2f} s")


if __name__ == "__main__":
    main()
