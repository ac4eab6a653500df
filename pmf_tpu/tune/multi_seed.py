"""vmapped multi-seed training — S independent fits in one compiled program.

The reference's tuner runs one (unseeded!) trial at a time
(`/root/reference/src/experiments/tune_all_models.py:53-60`).  On TPU the
natural formulation runs all seeds of a config SIMULTANEOUSLY: stack S
random inits on a leading axis and vmap the jitted sweep over the state
(the COO shard is shared/broadcast).  One compile, S× the arithmetic
intensity, no host round-trips per seed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pmf_tpu.data.coo import build_ratings
from pmf_tpu.models import gaussian_mf, hpf, poisson_mf
from pmf_tpu.models.base import as_triples


def _stack_states(states: list[dict]) -> dict:
    return {k: jnp.stack([s[k] for s in states]) for k in states[0]}


def multi_seed_fit(config, train, val=None, seeds=(0, 1, 2), n_iter: Optional[int] = None):
    """Fit one config across seeds simultaneously.

    config: a GaussianMFConfig / PoissonMFConfig / HPFConfig.  Returns
    (stacked_state, per_seed_metrics) where per_seed_metrics is a list of
    {"seed", "val_rmse", "val_macro_mae"} (empty metrics without val).
    Runs a fixed number of iterations (config.max_iter or n_iter) — the
    per-seed early-stop rules are host control flow and intentionally not
    replicated under vmap.
    """
    u, i, x = as_triples(train)
    dtype = np.dtype(getattr(config, "dtype", "float32"))
    data = build_ratings(u, i, x, dtype=dtype)
    n_iter = n_iter or config.max_iter

    if isinstance(config, hpf.HPFConfig):
        mod, extra = hpf, (config.a, config.a_prime, config.b_prime,
                           config.c, config.c_prime, config.d_prime)
        sweep = lambda s, d: hpf.sweep(s, d, *extra)
        eval_fn = hpf.eval_metrics
    elif isinstance(config, poisson_mf.PoissonMFConfig):
        mod = poisson_mf
        sweep = lambda s, d: poisson_mf.sweep(s, d, config.a0, config.b0, config.extended)
        eval_fn = lambda s, ev: poisson_mf.eval_metrics(s, ev, config.extended)
    elif isinstance(config, gaussian_mf.GaussianMFConfig):
        mod = gaussian_mf
        sweep = lambda s, d: gaussian_mf.sweep(
            s, d, config.sigma2, config.eta_theta2, config.eta_beta2,
            config.eta_bias2, config.n_factors, config.use_bias,
        )
        eval_fn = lambda s, ev: gaussian_mf.eval_metrics(s, ev, config.use_bias)
    else:
        raise TypeError(f"unsupported config {type(config)!r}")

    states = [
        mod.init_state(data.n_users, data.n_items,
                       dataclasses.replace(config, random_state=int(seed)))
        for seed in seeds
    ]
    stacked = _stack_states(states)

    vsweep = jax.jit(jax.vmap(sweep, in_axes=(0, None)))
    for _ in range(n_iter):
        stacked = vsweep(stacked, data)

    metrics = []
    if val is not None:
        vu, vi, vx = as_triples(val)
        from pmf_tpu.data.coo import build_eval_set

        ev = build_eval_set(vu, vi, vx, data.n_users, data.n_items, dtype=dtype)
        veval = jax.jit(jax.vmap(eval_fn, in_axes=(0, None)))
        rmses, macros = veval(stacked, ev)
        for k, seed in enumerate(seeds):
            metrics.append(
                {
                    "seed": int(seed),
                    "val_rmse": float(rmses[k]),
                    "val_macro_mae": float(macros[k]),
                }
            )
    return stacked, metrics
