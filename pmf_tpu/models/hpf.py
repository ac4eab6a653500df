"""Hierarchical Poisson Factorization (Gopalan et al.) with CAVI.

Model (`/root/reference/src/models/hpf_cavi.py:21-31`):
    x_ui ~ Poisson(theta_u^T beta_i)
    theta_uk ~ Gamma(a, xi_u),    xi_u ~ Gamma(a', b')
    beta_ik ~ Gamma(c, eta_i),    eta_i ~ Gamma(c', d')

The four coordinate blocks per iteration run in the reference's exact
order with expectation refreshes between blocks
(`hpf_cavi.py:126-193`):  theta -> (refresh) -> xi -> (refresh) ->
beta -> (refresh) -> eta -> (refresh).  This ordering is load-bearing for
convergence parity.  Each block compiles to gathers + fused elementwise +
sorted segment sums over the COO edges; rows without observations reset to
shape=a (resp. c) and rate=E[xi_u] (resp. E[eta_i]) exactly like the
reference (`hpf_cavi.py:128-132,164-167`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pmf_tpu.data.coo import EvalSet, RatingsCOO
from pmf_tpu.eval.metrics import masked_macro_mae, masked_rmse
from pmf_tpu.models.base import (
    FactorModel,
    FitLoop,
    as_triples,
    poisson_stop_rule,
    resolve_engine,
)
from pmf_tpu.ops.segment import edge_dot, gather_rows, sorted_segment_sum

RATE_FLOOR = 1e-10


@dataclasses.dataclass
class HPFConfig:
    n_factors: int = 20
    a: float = 0.3
    a_prime: float = 0.3
    b_prime: float = 1.0
    c: float = 0.3
    c_prime: float = 0.3
    d_prime: float = 1.0
    max_iter: int = 100
    tol: Optional[float] = 1e-4
    random_state: int = 42
    verbose: bool = True
    dtype: str = "float32"
    # Sweep engine: "flat" = XLA gather/scatter; "flat_chunked" = same
    # math scanned over edge chunks (stays inside HBM at any nnz, exact);
    # "blocked_high" / "blocked_fast" = Pallas one-hot-matmul kernel
    # (high: ~f32-exact, fast: single-pass bf16 MXU, ~5e-3 stat noise);
    # "auto" = blocked_high on TPU, flat elsewhere.
    engine: str = "auto"


def init_state(n_users: int, n_items: int, cfg: HPFConfig) -> dict:
    """Host-side init matching the reference RNG draw order
    (`hpf_cavi.py:66-89`): theta shape, theta rate, beta shape, beta rate
    gamma-noised; xi/eta shapes are the constants a'+K*a / c'+K*c with
    rates b' / d'."""
    rng = np.random.default_rng(cfg.random_state)
    K = cfg.n_factors
    dt = np.dtype(cfg.dtype)
    N, M = n_users, n_items
    state = {
        "a_theta": jnp.asarray((cfg.a + rng.gamma(1.0, 0.1, size=(N, K))).astype(dt)),
        "b_theta": jnp.asarray((cfg.b_prime + rng.gamma(1.0, 0.1, size=(N, K))).astype(dt)),
        "a_beta": jnp.asarray((cfg.c + rng.gamma(1.0, 0.1, size=(M, K))).astype(dt)),
        "b_beta": jnp.asarray((cfg.d_prime + rng.gamma(1.0, 0.1, size=(M, K))).astype(dt)),
        # xi/eta shapes are scalars, constant through training.
        "b_xi": jnp.full((N,), cfg.b_prime, dtype=dt),
        "b_eta": jnp.full((M,), cfg.d_prime, dtype=dt),
    }
    return state


def _hpf_factor_block(
    E_self, E_other, E_rate_prior, self_ids, other_ids, x, counts, shape0, n_self
):
    """theta- or beta-block: multinomial allocation for the shape, observed
    sum of other rows plus the hierarchical rate expectation for the rate.
    Empty rows -> (shape0, E_rate_prior)."""
    dtype = E_self.dtype
    self_rows = gather_rows(E_self, self_ids)
    other_rows = gather_rows(E_other, other_ids)
    rate = jnp.maximum(edge_dot(self_rows, other_rows), jnp.asarray(RATE_FLOOR, dtype))
    alloc = (x / rate)[:, None] * self_rows * other_rows
    a_new = shape0 + sorted_segment_sum(alloc, self_ids, n_self)
    b_new = E_rate_prior[:, None] + sorted_segment_sum(other_rows, self_ids, n_self)
    has = (counts > 0)[:, None]
    a_out = jnp.where(has, a_new, jnp.asarray(shape0, dtype))
    b_out = jnp.where(has, b_new, E_rate_prior[:, None])
    return a_out, b_out


@jax.jit
def sweep(
    state: dict,
    data: RatingsCOO,
    a: float,
    a_prime: float,
    b_prime: float,
    c: float,
    c_prime: float,
    d_prime: float,
) -> dict:
    K = state["a_theta"].shape[1]
    a_xi = a_prime + K * a  # constant shape (`hpf_cavi.py:81`)
    a_eta = c_prime + K * c

    E_theta = state["a_theta"] / state["b_theta"]
    E_beta = state["a_beta"] / state["b_beta"]
    E_xi = a_xi / state["b_xi"]
    E_eta = a_eta / state["b_eta"]

    # -- theta block --
    a_theta, b_theta = _hpf_factor_block(
        E_theta, E_beta, E_xi, data.u_by_u, data.i_by_u, data.x_by_u,
        data.user_counts, a, data.n_users,
    )
    E_theta = a_theta / b_theta

    # -- xi block: rate-only update b' + sum_k E[theta_uk].  The refreshed
    # E[xi] is not read again this sweep (the next theta block recomputes it
    # from b_xi), so no dead E_xi store here.
    b_xi = b_prime + jnp.sum(E_theta, axis=1)

    # -- beta block --
    a_beta, b_beta = _hpf_factor_block(
        E_beta, E_theta, E_eta, data.i_by_i, data.u_by_i, data.x_by_i,
        data.item_counts, c, data.n_items,
    )
    E_beta = a_beta / b_beta

    # -- eta block: rate-only update d' + sum_k E[beta_ik] --
    b_eta = d_prime + jnp.sum(E_beta, axis=1)

    return {
        "a_theta": a_theta,
        "b_theta": b_theta,
        "a_beta": a_beta,
        "b_beta": b_beta,
        "b_xi": b_xi,
        "b_eta": b_eta,
    }


def _hpf_factor_block_chunked(
    E_self, E_other, E_rate_prior, self_ids, other_ids, x, counts, shape0,
    n_self, chunk_len: int,
):
    """Memory-bounded variant of :func:`_hpf_factor_block`: lax.scan over
    edge chunks, accumulating the two segment statistics, so no (nnz, K)
    intermediate is ever materialized (the unchunked flat engine OOMs HBM
    at 25M edges: 24.1G needed vs 15.75G)."""
    dtype = E_self.dtype
    K = E_self.shape[1]
    n = self_ids.shape[0]
    pad = (-n) % chunk_len
    if pad:
        self_ids = jnp.pad(self_ids, (0, pad), constant_values=n_self)
        other_ids = jnp.pad(other_ids, (0, pad), constant_values=E_other.shape[0])
        x = jnp.pad(x, (0, pad))
    n_chunks = self_ids.shape[0] // chunk_len
    sl = (
        self_ids.reshape(n_chunks, chunk_len),
        other_ids.reshape(n_chunks, chunk_len),
        x.reshape(n_chunks, chunk_len),
    )

    def body(carry, chunk):
        s_alloc, s_other = carry
        cs, co, cx = chunk
        self_rows = gather_rows(E_self, cs)
        other_rows = gather_rows(E_other, co)
        rate = jnp.maximum(edge_dot(self_rows, other_rows),
                           jnp.asarray(RATE_FLOOR, dtype))
        alloc = (cx / rate)[:, None] * self_rows * other_rows
        s_alloc = s_alloc + sorted_segment_sum(alloc, cs, n_self)
        s_other = s_other + sorted_segment_sum(other_rows, cs, n_self)
        return (s_alloc, s_other), None

    zeros = jnp.zeros((n_self, K), dtype)
    (s_alloc, s_other), _ = jax.lax.scan(body, (zeros, zeros), sl)
    a_new = shape0 + s_alloc
    b_new = E_rate_prior[:, None] + s_other
    has = (counts > 0)[:, None]
    a_out = jnp.where(has, a_new, jnp.asarray(shape0, dtype))
    b_out = jnp.where(has, b_new, E_rate_prior[:, None])
    return a_out, b_out


@partial(jax.jit, static_argnames=("chunk_len",))
def sweep_chunked(
    state: dict,
    data: RatingsCOO,
    a: float,
    a_prime: float,
    b_prime: float,
    c: float,
    c_prime: float,
    d_prime: float,
    chunk_len: int = 1 << 20,
) -> dict:
    """Same iteration as :func:`sweep` with edge passes scanned in chunks
    (engine="flat_chunked"): the XLA path that stays inside HBM at any nnz."""
    K = state["a_theta"].shape[1]
    a_xi = a_prime + K * a
    a_eta = c_prime + K * c

    E_theta = state["a_theta"] / state["b_theta"]
    E_beta = state["a_beta"] / state["b_beta"]
    E_xi = a_xi / state["b_xi"]
    E_eta = a_eta / state["b_eta"]

    a_theta, b_theta = _hpf_factor_block_chunked(
        E_theta, E_beta, E_xi, data.u_by_u, data.i_by_u, data.x_by_u,
        data.user_counts, a, data.n_users, chunk_len,
    )
    E_theta = a_theta / b_theta
    b_xi = b_prime + jnp.sum(E_theta, axis=1)

    a_beta, b_beta = _hpf_factor_block_chunked(
        E_beta, E_theta, E_eta, data.i_by_i, data.u_by_i, data.x_by_i,
        data.item_counts, c, data.n_items, chunk_len,
    )
    E_beta = a_beta / b_beta
    b_eta = d_prime + jnp.sum(E_beta, axis=1)

    return {
        "a_theta": a_theta,
        "b_theta": b_theta,
        "a_beta": a_beta,
        "b_beta": b_beta,
        "b_xi": b_xi,
        "b_eta": b_eta,
    }


@partial(jax.jit, static_argnames=("precision", "interpret", "mesh"))
def sweep_blocked(
    state: dict,
    blocked,
    user_counts: jax.Array,
    item_counts: jax.Array,
    a: float,
    a_prime: float,
    b_prime: float,
    c: float,
    c_prime: float,
    d_prime: float,
    precision: str = "high",
    interpret: bool = False,
    mesh=None,
) -> dict:
    """Same iteration as :func:`sweep`, with the two edge passes computed
    by the Pallas blocked kernel (`pmf_tpu.ops.pallas.cavi_edge`)."""
    from pmf_tpu.ops.pallas.cavi_edge import poisson_edge_stats

    K = state["a_theta"].shape[1]
    a_xi = a_prime + K * a
    a_eta = c_prime + K * c

    E_theta = state["a_theta"] / state["b_theta"]
    E_beta = state["a_beta"] / state["b_beta"]
    E_xi = a_xi / state["b_xi"]
    E_eta = a_eta / state["b_eta"]
    dtype = E_theta.dtype

    head = getattr(blocked, "head", None)
    # -- theta block --
    s_alloc, s_other = poisson_edge_stats(
        E_theta, E_beta, blocked.by_user, precision=precision, interpret=interpret,
        mesh=mesh, head=head, head_side="user",
    )
    has = (user_counts > 0)[:, None]
    a_theta = jnp.where(has, a + s_alloc, jnp.asarray(a, dtype))
    b_theta = jnp.where(has, E_xi[:, None] + s_other, E_xi[:, None])
    E_theta = a_theta / b_theta

    # -- xi block --
    b_xi = b_prime + jnp.sum(E_theta, axis=1)

    # -- beta block --
    s_alloc_i, s_other_i = poisson_edge_stats(
        E_beta, E_theta, blocked.by_item, precision=precision, interpret=interpret,
        mesh=mesh, head=head, head_side="item",
    )
    has_i = (item_counts > 0)[:, None]
    a_beta = jnp.where(has_i, c + s_alloc_i, jnp.asarray(c, dtype))
    b_beta = jnp.where(has_i, E_eta[:, None] + s_other_i, E_eta[:, None])
    E_beta = a_beta / b_beta

    # -- eta block --
    b_eta = d_prime + jnp.sum(E_beta, axis=1)

    return {
        "a_theta": a_theta,
        "b_theta": b_theta,
        "a_beta": a_beta,
        "b_beta": b_beta,
        "b_xi": b_xi,
        "b_eta": b_eta,
    }


@jax.jit
def eval_metrics(state: dict, ev: EvalSet):
    E_theta = state["a_theta"] / state["b_theta"]
    E_beta = state["a_beta"] / state["b_beta"]
    pred = edge_dot(gather_rows(E_theta, ev.u), gather_rows(E_beta, ev.i))
    pred = jnp.where(ev.valid, pred, 0.0)
    r = masked_rmse(ev.x, pred, ev.real)
    mm = masked_macro_mae(ev.x, pred, ev.real, ev.class_id, ev.n_classes)
    return r, mm


class HPF(FactorModel):
    """Reference-compatible facade for HPF-CAVI."""

    def fit(self, train_df, val_df=None, resume_from=None,
            checkpoint_dir=None, checkpoint_every=10, mesh=None,
            profile_dir=None, state_sharding=None, elbo_every: int = 0):
        """``mesh``: optional `jax.sharding.Mesh` — the full fit (sweeps,
        validation eval, early stopping) runs multi-chip with edges and eval
        rows sharded on the "data" axis (see `FactorModel._mesh_place`).
        ``state_sharding="rows"``: row-shard the Gamma state across the mesh
        and train with ring sweeps (`pmf_tpu.parallel.tp`).
        ``elbo_every=N``: record the auxiliary-variable ELBO in fit_history
        every N iterations (0 = off)."""
        cfg = self.config
        if state_sharding == "rows":
            if elbo_every:
                raise ValueError("elbo_every is not supported with TP "
                                 "(row-sharded) fits yet")
            if mesh is None:
                raise ValueError("state_sharding='rows' requires a mesh")
            return self._fit_tp(train_df, val_df, resume_from,
                                checkpoint_dir, checkpoint_every, mesh,
                                profile_dir)
        if state_sharding not in (None, "replicated"):
            raise ValueError(f"unknown state_sharding {state_sharding!r}")
        data = self._build_train(train_df)
        self.n_users, self.n_items = data.n_users, data.n_items
        if cfg.verbose:
            print(f"Inferred n_users={self.n_users}, n_items={self.n_items}", flush=True)
        state = self._initial_state(init_state(self.n_users, self.n_items, cfg),
                                    resume_from)

        engine = resolve_engine(cfg.engine, self.n_users, self.n_items, data.nnz)
        self.engine_used = engine
        hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
        if engine.startswith("blocked"):
            import jax as _jax

            from pmf_tpu.data.blocked import auto_tiles, build_blocked

            u, i, x = as_triples(train_df)
            # head_bytes: the round-3 budget scan's optimum (2.5 GiB: 418M
            # vs 407M at 2 GiB and declining above — head processing cost
            # overtakes tail savings; docs/PERFORMANCE.md round-3 section).
            blocked = build_blocked(u, i, x, n_users=self.n_users, n_items=self.n_items,
                                    dtype=self._dtype, reorder=True, head="auto",
                                    head_bytes=5 << 29, tail_group_cap=32,
                                    head_row_mult=mesh.devices.size if mesh else 1,
                                    **auto_tiles(self.n_users, self.n_items, data.nnz))
            precision = {"blocked_fast": "fast", "blocked_mid": "mid",
                         "blocked_high": "high"}.get(engine, "high")
            interpret = _jax.default_backend() == "cpu"

            def sweep_fn(s, d):
                return sweep_blocked(
                    s, blocked, d.user_counts, d.item_counts, *hyper,
                    precision=precision, interpret=interpret, mesh=mesh,
                )
        elif engine == "flat_chunked":

            def sweep_fn(s, d):
                return sweep_chunked(s, d, *hyper)
        else:

            def sweep_fn(s, d):
                return sweep(s, d, *hyper)

        val = self._build_eval(val_df) if val_df is not None else None
        data, state, val = self._mesh_place(data, state, val, mesh)
        loop = FitLoop(
            sweep_fn,
            eval_metrics,
            cfg.max_iter,
            cfg.tol,
            poisson_stop_rule,
            verbose=cfg.verbose,
            name="HPF",
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            profile_dir=profile_dir,
            edge_visits_per_iter=2 * data.nnz,  # theta + beta edge passes
            elbo_fn=self._make_elbo_fn(train_df) if elbo_every else None,
            elbo_every=elbo_every or 1,
        )
        self.state = loop.run(state, data, val)
        self.fit_history = loop.history
        return self

    def _fit_tp(self, train_df, val_df, resume_from, checkpoint_dir,
                checkpoint_every, mesh, profile_dir):
        """Row-sharded (TP) HPF training — Gamma state distributed across
        the mesh through every sweep/eval/checkpoint; equivalence gated at
        1e-10 in f64 (`tests/test_tp_fit.py`)."""
        from pmf_tpu.parallel.tp import (
            HPF_AXIS_OF,
            HPF_PAD_ONES,
            balance_perms,
            build_tp_layout,
            describe_tp,
            dp_degree,
            host_staging,
            pad_state_rows,
            permute_state_rows,
            place_tp,
            remap_eval,
            slice_state_rows,
            tp_degree,
            tp_sweep_hpf,
        )

        cfg = self.config
        u, i, x = as_triples(train_df)
        self.n_users = int(u.max()) + 1
        self.n_items = int(i.max()) + 1
        if cfg.verbose:
            print(f"Inferred n_users={self.n_users}, n_items={self.n_items} "
                  f"{describe_tp(mesh)}", flush=True)
        hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime,
                 cfg.d_prime)
        engine = resolve_engine(cfg.engine, self.n_users, self.n_items,
                                len(u))
        self.engine_used = engine
        # Count-balanced global row ownership (see BalancePerms): rows
        # deal to devices round-robin in descending count order, so
        # bucket sizes — and with them both rings' uniform padding —
        # balance for any popularity layout.  The perms re-derive
        # deterministically from the train edges on resume.
        D = tp_degree(mesh)
        bal = balance_perms(u, i, -(-self.n_users // D) * D,
                            -(-self.n_items // D) * D, D)
        ub = bal.u_new_of_old[np.asarray(u)]
        ib = bal.i_new_of_old[np.asarray(i)]
        if engine.startswith("blocked"):
            # Blocked Pallas kernels INSIDE the ring (VERDICT r3 weak #1:
            # the flat ring paid ~13x vs the blocked engine at exactly
            # the beyond-HBM scale TP exists for).
            from pmf_tpu.data.blocked import auto_tiles
            from pmf_tpu.parallel.tp_blocked import (
                build_tp_blocked,
                place_tp_blocked,
                tp_sweep_hpf_blocked,
            )

            precision = {"blocked_fast": "fast", "blocked_mid": "mid",
                         "blocked_high": "high"}.get(engine, "high")
            interpret = jax.default_backend() == "cpu"
            # Per-bucket tile occupancy equals the global one (nnz/D^2
            # edges over (n/D x m/D) rows), so size tiles from the
            # global shape.
            tiles = auto_tiles(self.n_users, self.n_items, len(u))
            layout = build_tp_blocked(
                ub, ib, x, self.n_users, self.n_items, D, dtype=self._dtype,
                dp=dp_degree(mesh), block_users=tiles["block_users"],
                block_items=tiles["block_items"],
                chunk_size=tiles["chunk_size"], group=tiles["group"],
                # Dense head inside the ring (per-(device, step) bucket
                # corners; 2 GiB/device across both directions' stacks).
                head="auto")
            place = place_tp_blocked
            sweep_tp = jax.jit(
                lambda s, lo: tp_sweep_hpf_blocked(
                    s, lo, *hyper, mesh=mesh, precision=precision,
                    interpret=interpret))
        else:
            layout = build_tp_layout(ub, ib, x, self.n_users, self.n_items,
                                     tp_degree(mesh), dtype=self._dtype,
                                     dp=dp_degree(mesh))
            place = place_tp
            sweep_tp = jax.jit(
                lambda s, lo: tp_sweep_hpf(s, lo, *hyper, mesh=mesh))
        # host_staging: full padded state stays on the host CPU until
        # place_tp shards it (TP exists for beyond-one-chip state).
        with host_staging():
            init = permute_state_rows(
                pad_state_rows(init_state(self.n_users, self.n_items, cfg),
                               HPF_AXIS_OF, layout.n_users_pad,
                               layout.n_items_pad, ones_keys=HPF_PAD_ONES),
                HPF_AXIS_OF, bal.u_old_of_new, bal.i_old_of_new)
            state = self._initial_state(init, resume_from)
        layout, state = place(layout, state, mesh)

        val = None
        if val_df is not None:
            from pmf_tpu.parallel import shard_eval_set

            val = shard_eval_set(
                remap_eval(self._build_eval(val_df),
                           bal.u_new_of_old, bal.i_new_of_old), mesh)
        loop = FitLoop(
            lambda s, lo: sweep_tp(s, lo),
            eval_metrics,
            cfg.max_iter,
            cfg.tol,
            poisson_stop_rule,
            verbose=cfg.verbose,
            name="HPF[tp]",
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            profile_dir=profile_dir,
            edge_visits_per_iter=2 * layout.nnz,
        )
        state = loop.run(state, layout, val)
        state = permute_state_rows(state, HPF_AXIS_OF,
                                   bal.u_new_of_old, bal.i_new_of_old)
        self.state = slice_state_rows(state, HPF_AXIS_OF,
                                      self.n_users, self.n_items)
        self.fit_history = loop.history
        return self

    def _make_elbo_fn(self, train):
        """state -> auxiliary-variable ELBO closure over the train edges
        (used by ``fit(elbo_every=)`` and :meth:`elbo`)."""
        import jax.numpy as jnp

        from pmf_tpu.eval.elbo import _auto_chunks, hpf_elbo

        u, i, x = as_triples(train)
        cfg = self.config
        dt = np.dtype(cfg.dtype)
        ue = jnp.asarray(u, jnp.int32)
        ie = jnp.asarray(i, jnp.int32)
        xe = jnp.asarray(x, dt)
        nc = _auto_chunks(len(u), cfg.n_factors)
        return lambda s: hpf_elbo(
            s, ue, ie, xe, cfg.a, cfg.a_prime, cfg.b_prime,
            cfg.c, cfg.c_prime, cfg.d_prime, n_chunks=nc,
        )

    def elbo(self, train) -> float:
        """Auxiliary-variable ELBO (optimal allocations) incl. the
        hierarchical xi/eta terms (see pmf_tpu.eval.elbo).  ``train``
        must be on the +1-shifted scale used by fit()."""
        return float(self._make_elbo_fn(train)(self.state))

    def _point_estimates(self):
        return (
            self.state["a_theta"] / self.state["b_theta"],
            self.state["a_beta"] / self.state["b_beta"],
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
