"""HPF by minibatch MAP/SGD — the TPU replacement for the reference's
PyTorch model (`/root/reference/src/models/hpf_pytorch.py`).

Same generative model as :mod:`pmf_tpu.models.hpf`, optimized by Adam on
softplus-constrained unconstrained parameters:

  * Poisson NLL  sum(lambda - x log lambda)  with lambda clamped >= 1e-6
    (`hpf_pytorch.py:78-83`).
  * Exact negative log-Gamma prior terms for theta|xi, beta|eta, xi, eta
    (`hpf_pytorch.py:145-180`).
  * Frequency-scaled priors: each batch occurrence of user u weighs its
    prior by 1/count(u), so the prior for every entity is applied exactly
    once per epoch (`hpf_pytorch.py:129-139`).

TPU formulation: one jitted `lax.scan` over the epoch's shuffled batches
(optax Adam), with the last partial batch padded + masked so every epoch
covers every rating exactly once and shapes stay static.  Batch sizes
should be much larger than the reference's 1024-4096 — the gathers and
VPU elementwise work saturate only with wide batches.

Fused parameter layout: the step is random-row gather/scatter LATENCY
bound (measured v5e: a (162k,) scalar gather costs MORE than a (162k, 20)
row gather — 1.13 vs 0.75 ms per 65k batch; scatter-adds 1.0-1.35 ms
either way), so the scalar entity parameters ride as an extra COLUMN of
the factor tables: params = {"user": (n_users, K+1) [theta | xi],
"item": (n_items, K+1) [beta | eta]}.  One gather and one scatter-add
per side instead of two each.  Adam is elementwise, so updates are
bit-identical to the per-leaf layout; init draws the same
default_rng(seed) values in the same order as the unfused layout.
(Checkpoints from the pre-fusion layout have different leaf shapes and
are rejected by the loader's shape check.)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmf_tpu.data.coo import EvalSet
from pmf_tpu.eval.metrics import masked_macro_mae, masked_rmse
from pmf_tpu.models.base import FactorModel, as_triples
from pmf_tpu.ops.segment import edge_dot, gather_rows

LAMBDA_FLOOR = 1e-6


@dataclasses.dataclass
class HPFMapConfig:
    n_factors: int = 20
    a: float = 0.3
    a_prime: float = 1.0
    b_prime: float = 1.0
    c: float = 0.3
    c_prime: float = 1.0
    d_prime: float = 1.0
    lr: float = 0.001
    # Reference default is 1024 (`hpf_pytorch.py:19`).  On TPU, dense Adam
    # touches EVERY parameter each step, so small batches are dominated by
    # optimizer traffic (measured ~2x total time going 4096 -> 65536 at
    # 25M ratings); use >= 2^16 at scale.
    batch_size: int = 1024
    epochs: int = 20
    device: str = "tpu"  # kept for best_hyperparams.txt compatibility; unused
    verbose: bool = True
    random_state: int = 42
    dtype: str = "float32"


def init_params(n_users: int, n_items: int, cfg: HPFMapConfig) -> dict:
    """Gaussian(0, 0.1) init of the unconstrained parameters.  The reference
    uses torch.randn without an explicit seed (`hpf_pytorch.py:39-48`); here
    init is deterministic via numpy default_rng(random_state).  Draw order
    (theta, beta, xi, eta) matches the historical per-leaf layout; the
    scalar parameters are stored as the last column of each table."""
    rng = np.random.default_rng(cfg.random_state)
    K = cfg.n_factors
    dt = np.dtype(cfg.dtype)
    theta = (0.1 * rng.standard_normal((n_users, K))).astype(dt)
    beta = (0.1 * rng.standard_normal((n_items, K))).astype(dt)
    xi = (0.1 * rng.standard_normal(n_users)).astype(dt)
    eta = (0.1 * rng.standard_normal(n_items)).astype(dt)
    return {
        "user": jnp.asarray(np.concatenate([theta, xi[:, None]], axis=1)),
        "item": jnp.asarray(np.concatenate([beta, eta[:, None]], axis=1)),
    }


def batch_loss(params, u, i, x, mask, user_scale, item_scale, cfg_scalars):
    """Masked MAP loss of one batch; ``mask`` zeroes padded rows."""
    a, a_prime, b_prime, c, c_prime, d_prime = cfg_scalars
    urows = jax.nn.softplus(gather_rows(params["user"], u))
    irows = jax.nn.softplus(gather_rows(params["item"], i))
    theta, xi = urows[:, :-1], urows[:, -1]
    beta, eta = irows[:, :-1], irows[:, -1]
    m = mask.astype(theta.dtype)

    lam = jnp.maximum(edge_dot(theta, beta), LAMBDA_FLOOR)
    nll = jnp.sum(m * (lam - x * jnp.log(lam)))

    u_scale = gather_rows(user_scale, u) * m
    i_scale = gather_rows(item_scale, i) * m

    # -log Gamma(theta | a, xi) summed over K, terms involving theta and xi.
    lp_theta = jnp.sum(
        -a * jnp.log(xi)[:, None] + xi[:, None] * theta - (a - 1.0) * jnp.log(theta),
        axis=1,
    )
    lp_beta = jnp.sum(
        -c * jnp.log(eta)[:, None] + eta[:, None] * beta - (c - 1.0) * jnp.log(beta),
        axis=1,
    )
    lp_xi = -(a_prime - 1.0) * jnp.log(xi) + b_prime * xi
    lp_eta = -(c_prime - 1.0) * jnp.log(eta) + d_prime * eta

    prior = (
        jnp.sum(lp_theta * u_scale)
        + jnp.sum(lp_beta * i_scale)
        + jnp.sum(lp_xi * u_scale)
        + jnp.sum(lp_eta * i_scale)
    )
    return nll + prior


@partial(jax.jit, static_argnames=("optimizer", "batch_size"),
         donate_argnums=(0, 1))
def train_epoch(
    params,
    opt_state,
    key,
    ui_all,
    x_all,
    user_scale,
    item_scale,
    cfg_scalars,
    optimizer,
    batch_size,
):
    """One epoch: shuffle, batch, scan Adam steps.

    ``ui_all``: (n_pad, 2) int32 with columns [u-or-minus-one, i]; padding
    rows carry u == -1 (the batch mask).  Shuffle gathers are latency-
    bound per ROW, so packing (u, i, mask) into one 2-wide int32 row
    gather replaces three separate 25M-element permutation gathers (u, i,
    bool mask) with one; only x keeps its own gather (dtype-exact)."""
    n = ui_all.shape[0]
    n_batches = n // batch_size
    perm = jax.random.permutation(key, n)
    uib = ui_all[perm].reshape(n_batches, batch_size, 2)
    xb = x_all[perm].reshape(n_batches, batch_size)

    def step(carry, batch):
        p, s = carry
        rows, bx = batch
        bm = rows[:, 0] >= 0
        bu = jnp.maximum(rows[:, 0], 0)
        bi = rows[:, 1]
        loss, grads = jax.value_and_grad(batch_loss)(
            p, bu, bi, bx, bm, user_scale, item_scale, cfg_scalars
        )
        updates, s = optimizer.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), (uib, xb))
    return params, opt_state, jnp.sum(losses)


@jax.jit
def eval_metrics(params: dict, ev: EvalSet):
    theta = jax.nn.softplus(params["user"][:, :-1])
    beta = jax.nn.softplus(params["item"][:, :-1])
    pred = edge_dot(gather_rows(theta, ev.u), gather_rows(beta, ev.i))
    pred = jnp.where(ev.valid, pred, 0.0)
    r = masked_rmse(ev.x, pred, ev.real)
    mm = masked_macro_mae(ev.x, pred, ev.real, ev.class_id, ev.n_classes)
    return r, mm


def _pack_ckpt(params, opt_state, key, epoch) -> dict:
    """Flatten (params, Adam state, RNG key, epoch) into a flat array dict
    for `pmf_tpu.utils.checkpoint.save_state`.  Leaves are enumerated in
    tree order; the tree structure is reproducible from a fresh
    ``optimizer.init(params)`` template at load time."""
    leaves = jax.tree_util.tree_leaves((params, opt_state))
    out = {f"leaf_{n}": leaf for n, leaf in enumerate(leaves)}
    out["rng_key_data"] = jax.random.key_data(key)
    out["epoch"] = jnp.asarray(epoch, jnp.int32)
    return out


def _unpack_ckpt(flat: dict, params_template, optimizer):
    """Inverse of :func:`_pack_ckpt` given a params template of matching
    shapes (the optimizer state tree is rebuilt from ``optimizer.init``)."""
    template = (params_template, optimizer.init(params_template))
    treedef = jax.tree_util.tree_structure(template)
    n_leaves = treedef.num_leaves
    t_leaves = jax.tree_util.tree_leaves(template)
    leaves = []
    for n in range(n_leaves):
        if f"leaf_{n}" not in flat:
            raise ValueError(
                f"checkpoint is missing leaf_{n} (have {n_leaves} expected "
                "leaves) — saved by an incompatible model/optimizer?"
            )
        leaf = jnp.asarray(flat[f"leaf_{n}"])
        if leaf.shape != t_leaves[n].shape:
            raise ValueError(
                f"checkpoint leaf_{n} shape {leaf.shape} does not match the "
                f"model/optimizer state ({t_leaves[n].shape})"
            )
        leaves.append(leaf.astype(t_leaves[n].dtype))
    params, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    key = jax.random.wrap_key_data(jnp.asarray(flat["rng_key_data"]))
    epoch = int(flat["epoch"])
    return params, opt_state, key, epoch


class HPFMap(FactorModel):
    """Reference-compatible facade for the MAP/SGD HPF path.

    Unlike the reference, which restarts MAP training from scratch every
    run (`/root/reference/src/experiments/train_hpf_pytorch_full.py:96-108`),
    ``fit`` supports exact mid-training checkpoint/resume including the
    Adam moments and the epoch RNG key (SURVEY §5.4)."""

    def fit(self, train_df, val_df=None, resume_from=None,
            checkpoint_dir=None, checkpoint_every=5, mesh=None,
            profile_dir=None):
        """``mesh``: optional `jax.sharding.Mesh` — data-parallel SGD: the
        epoch's rating arrays shard on the batch-element axis ("data"),
        params/Adam state replicate, and GSPMD psums the per-shard gradient
        scatter contributions over ICI each step."""
        cfg = self.config
        u, i, x = as_triples(train_df)
        self.n_users = int(u.max()) + 1
        self.n_items = int(i.max()) + 1
        if cfg.verbose:
            print(f"Inferred n_users={self.n_users}, n_items={self.n_items}", flush=True)

        dt = self._dtype
        nnz = len(u)
        B = cfg.batch_size
        n_batches = max((nnz + B - 1) // B, 1)
        n_pad = n_batches * B

        # Packed (n_pad, 2) int32 [u | i]; padding rows carry u == -1 so the
        # mask needs no separate array/gather (see train_epoch).
        ui = np.full((n_pad, 2), -1, dtype=np.int32)
        ui[:nnz, 0] = u
        ui[:nnz, 1] = i
        ui[nnz:, 1] = 0
        ui_all = jnp.asarray(ui)
        x_pad = np.zeros((n_pad,), dtype=dt)
        x_pad[:nnz] = x
        x_all = jnp.asarray(x_pad)

        # 1/count scaling with the reference's 1e-6 guard (`hpf_pytorch.py:33-35`).
        user_counts = np.bincount(u, minlength=self.n_users)
        item_counts = np.bincount(i, minlength=self.n_items)
        user_scale = jnp.asarray(1.0 / (user_counts + 1e-6), dtype=dt)
        item_scale = jnp.asarray(1.0 / (item_counts + 1e-6), dtype=dt)

        cfg_scalars = tuple(
            float(v)
            for v in (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
        )

        params = init_params(self.n_users, self.n_items, cfg)
        optimizer = optax.adam(cfg.lr)
        opt_state = optimizer.init(params)
        key = jax.random.key(cfg.random_state)
        start_epoch = 1
        if resume_from is not None:
            from pmf_tpu.utils.checkpoint import load_state

            flat, _ = load_state(resume_from)
            params, opt_state, key, done_epoch = _unpack_ckpt(flat, params, optimizer)
            start_epoch = done_epoch + 1
            if cfg.verbose:
                print(f"Resumed from {resume_from} after epoch {done_epoch}", flush=True)

        val = self._build_eval(val_df) if val_df is not None else None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from pmf_tpu.parallel import DATA_AXIS, replicate, shard_eval_set

            n_dev = mesh.devices.size
            if B % n_dev != 0:
                raise ValueError(
                    f"batch_size={B} not divisible by {n_dev} mesh devices"
                )
            edge = NamedSharding(mesh, P(DATA_AXIS))
            ui_all = jax.device_put(ui_all, NamedSharding(mesh, P(DATA_AXIS, None)))
            x_all = jax.device_put(x_all, edge)
            params = replicate(params, mesh)
            opt_state = replicate(opt_state, mesh)
            user_scale = jax.device_put(user_scale, NamedSharding(mesh, P()))
            item_scale = jax.device_put(item_scale, NamedSharding(mesh, P()))
            if val is not None:
                val = shard_eval_set(val, mesh)
        self.fit_history = []
        self.best_val_rmse = float("inf")
        import contextlib
        import time as _time

        prof = (
            jax.profiler.trace(profile_dir) if profile_dir
            else contextlib.nullcontext()
        )
        with prof:
            self._run_epochs(
                cfg, start_epoch, key, params, opt_state, ui_all, x_all,
                nnz, user_scale, item_scale, cfg_scalars, optimizer, val,
                checkpoint_dir, checkpoint_every, _time,
            )
        return self

    def _run_epochs(self, cfg, start_epoch, key, params, opt_state, ui_all,
                    x_all, nnz, user_scale, item_scale,
                    cfg_scalars, optimizer, val, checkpoint_dir,
                    checkpoint_every, _time):
        for epoch in range(start_epoch, cfg.epochs + 1):
            t0 = _time.perf_counter()
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_epoch(
                params, opt_state, sub, ui_all, x_all,
                user_scale, item_scale, cfg_scalars, optimizer,
                cfg.batch_size,
            )
            record = {"epoch": epoch, "train_loss": float(loss)}
            record["epoch_seconds"] = _time.perf_counter() - t0
            record["updates_per_sec"] = nnz / record["epoch_seconds"]
            if val is not None:
                val_rmse, val_macro = eval_metrics(params, val)
                record.update(val_rmse=float(val_rmse), val_macro_mae=float(val_macro))
                self.best_val_rmse = min(self.best_val_rmse, float(val_rmse))
                if cfg.verbose:
                    print(
                        f"HPFMap epoch {epoch}/{cfg.epochs} | loss {float(loss):.1f} | "
                        f"val RMSE {float(val_rmse):.4f}",
                        flush=True,
                    )
            elif cfg.verbose:
                print(f"HPFMap epoch {epoch}/{cfg.epochs} | loss {float(loss):.1f}", flush=True)
            self.fit_history.append(record)
            if checkpoint_dir and epoch % checkpoint_every == 0:
                from pmf_tpu.utils.checkpoint import save_state

                save_state(
                    checkpoint_dir,
                    _pack_ckpt(params, opt_state, key, epoch),
                    {"epoch": epoch, "name": "HPFMap"},
                )

        self.state = params
        return self

    def _point_estimates(self):
        return (
            jax.nn.softplus(self.state["user"][:, :-1]),
            jax.nn.softplus(self.state["item"][:, :-1]),
        )

    def predict(self, user_ids, item_ids) -> np.ndarray:
        return super().predict(user_ids, item_ids)

    def evaluate_rmse(self, df) -> float:
        from pmf_tpu.eval.metrics import rmse

        u, i, x = as_triples(df)
        return rmse(x, self.predict(u, i))

    def evaluate_macro_mae(self, df) -> float:
        from pmf_tpu.eval.metrics import macro_mae

        u, i, x = as_triples(df)
        return macro_mae(x, self.predict(u, i))
