"""Gaussian matrix factorization with mean-field CAVI, optional biases.

Unifies the reference's two Gaussian variants:
  * plain:  x_ij ~ N(theta_i^T beta_j, sigma^2)
    (`/root/reference/src/models/gaussian_mf_cavi.py`)
  * biased: r_ij ~ N(mu + b_i + b_j + theta_i^T beta_j, sigma^2)
    (`/root/reference/src/models/gaussian_mf_cavi_bias.py` — the variant
    used by tune/compare/train).

TPU formulation (one jitted sweep per CAVI iteration):
  * The per-user precision sum S_i = sum_{j in Omega_i} E[beta_j beta_j^T]
    is: form A_j = V_j + m_j m_j^T once per block (n_items, K, K), gather A
    rows along the by-user edge list, sorted-segment-sum back to users.
  * All n_users K x K solves run as ONE batched Cholesky
    (`pmf_tpu.ops.solve`), replacing the reference's per-row
    ``np.linalg.inv`` loop (`gaussian_mf_cavi.py:121-147`).
  * Block order matches the reference exactly: theta -> beta
    [-> user bias -> item bias]; each block reads the previous block's
    freshly written values, and within a block all rows are independent,
    which is why the whole block batches.
  * Rows with no observations keep their current values (the reference
    ``continue``s past them — `gaussian_mf_cavi.py:123-124`), unlike the
    Poisson family which resets empty rows to the prior.
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
    gaussian_stop_rule,
    resolve_engine,
)
from pmf_tpu.ops.segment import edge_dot, gather_rows, sorted_segment_sum
from pmf_tpu.ops.solve import batched_psd_inverse


@dataclasses.dataclass
class GaussianMFConfig:
    n_factors: int = 10
    sigma2: float = 1.0
    eta_theta2: float = 1.0
    eta_beta2: float = 1.0
    eta_bias2: float = 1.0
    max_iter: int = 20
    tol: Optional[float] = 1e-3
    random_state: int = 42
    verbose: bool = True
    use_bias: bool = True  # True == reference's gaussian_mf_cavi_bias variant
    dtype: str = "float32"
    # "flat" | "blocked_high" | "blocked_fast" | "auto" (see HPFConfig.engine).
    engine: str = "auto"
    # "full": K x K posterior covariances (reference-exact).  "diag":
    # diagonal covariances — a documented mean-field coarsening for very
    # large row counts where (rows, K, K) covariance storage is infeasible
    # (SURVEY.md §7 "Gaussian covariance memory").  Diag mode stores V as
    # (rows, K).
    covariance: str = "full"
    # "exact": the reference's block order (theta, beta, b_user, b_item),
    # each bias block reading every newer value — needs two dedicated bias
    # edge passes.  "lagged": theta -> b_user -> beta -> b_item with
    # b_user's factor-interaction term against the previous iteration's
    # betas (the only stale quantity); the bias statistics then ride the
    # factor passes for free in the blocked engine (~1.4x per iteration at
    # ML-25M, docs/PERFORMANCE.md).  Same fixed point — the lag vanishes at
    # convergence (tests/test_gaussian_lagged.py).
    bias_update: str = "exact"
    # Blocked-engine tile sizes (None -> tuned defaults: 512-row blocks,
    # 128-edge chunks, groups of 8 — the fastest setting in the ML-25M tile
    # scan, docs/PERFORMANCE.md; 256-row blocks lose ~6% to padding).
    block_size: Optional[int] = None
    chunk_size: Optional[int] = None
    group: Optional[int] = None


def init_state(n_users: int, n_items: int, cfg: GaussianMFConfig) -> dict:
    """Host-side init matching the reference RNG draws exactly
    (`gaussian_mf_cavi_bias.py:52-67`): default_rng(seed), theta then beta
    standard normals scaled by 0.1, identity covariances, zero biases."""
    rng = np.random.default_rng(cfg.random_state)
    K = cfg.n_factors
    dt = np.dtype(cfg.dtype)
    m_theta = (0.1 * rng.standard_normal((n_users, K))).astype(dt)
    m_beta = (0.1 * rng.standard_normal((n_items, K))).astype(dt)
    if cfg.covariance == "diag":
        v_theta = jnp.ones((n_users, K), dtype=dt)
        v_beta = jnp.ones((n_items, K), dtype=dt)
    else:
        eye = np.eye(K, dtype=dt)
        v_theta = jnp.asarray(np.broadcast_to(eye, (n_users, K, K)).copy())
        v_beta = jnp.asarray(np.broadcast_to(eye, (n_items, K, K)).copy())
    state = {
        "m_theta": jnp.asarray(m_theta),
        "V_theta": v_theta,
        "m_beta": jnp.asarray(m_beta),
        "V_beta": v_beta,
        "b_user": jnp.zeros((n_users,), dtype=dt),
        "b_item": jnp.zeros((n_items,), dtype=dt),
    }
    return state


def _factor_block(
    m_self,
    V_self,
    m_other,
    V_other,
    b_self,
    b_other,
    self_ids,
    other_ids,
    x,
    counts,
    eta2: float,
    sigma2: float,
    n_self: int,
    use_bias: bool,
):
    """One factor coordinate block (theta given beta, or beta given theta).

    Edges must be sorted by ``self_ids``.  Returns updated (m_self, V_self).
    """
    K = m_self.shape[-1]
    dtype = m_self.dtype

    # A_j = V_j + m_j m_j^T per OTHER row, then gathered per edge.
    A_other = V_other + m_other[:, :, None] * m_other[:, None, :]
    A_edges = gather_rows(A_other.reshape(-1, K * K), other_ids)
    S = sorted_segment_sum(A_edges, self_ids, n_self).reshape(n_self, K, K)

    m_other_edges = gather_rows(m_other, other_ids)
    if use_bias:
        resid = x - gather_rows(b_self, self_ids) - gather_rows(b_other, other_ids)
    else:
        resid = x
    w = sorted_segment_sum(m_other_edges * resid[:, None], self_ids, n_self)

    eye = jnp.eye(K, dtype=dtype)
    precision = eye / jnp.asarray(eta2, dtype) + S / jnp.asarray(sigma2, dtype)
    V_new = batched_psd_inverse(precision)
    m_new = jnp.einsum("rkl,rl->rk", V_new, w) / jnp.asarray(sigma2, dtype)

    has = (counts > 0)[:, None]
    m_out = jnp.where(has, m_new, m_self)
    V_out = jnp.where(has[:, :, None], V_new, V_self)
    return m_out, V_out


def _factor_block_diag(
    m_self,
    v_self,
    m_other,
    v_other,
    b_self,
    b_other,
    self_ids,
    other_ids,
    x,
    counts,
    eta2: float,
    sigma2: float,
    n_self: int,
    use_bias: bool,
):
    """Diagonal-covariance factor block: per-coordinate mean-field update.

    With q(theta_u) fully factorized over coordinates, the coordinate-k
    update given the other coordinates' means is
        prec_uk = 1/eta^2 + sum_j E[b_jk^2] / sigma^2
        m_uk   = (sum_j m_jk (resid_uj - sum_{l != k} m_ul m_jl)) / (sigma^2 prec_uk)
    solved jointly via the Jacobi-style closed form with cross terms from
    the current means (one pass per block; a documented coarsening of the
    reference's full-covariance update for very large row counts).
    """
    dtype = m_self.dtype
    m_other_e = gather_rows(m_other, other_ids)
    sq_e = gather_rows(v_other + m_other * m_other, other_ids)
    if use_bias:
        resid = x - gather_rows(b_self, self_ids) - gather_rows(b_other, other_ids)
    else:
        resid = x
    # Cross-term handling: resid_k = resid - (pred - m_self_k m_other_k).
    pred = edge_dot(gather_rows(m_self, self_ids), m_other_e)
    S_sq = sorted_segment_sum(sq_e, self_ids, n_self)  # (n, K)
    S_mr = sorted_segment_sum(m_other_e * (resid - pred)[:, None], self_ids, n_self)
    S_mm = sorted_segment_sum(m_other_e * m_other_e, self_ids, n_self)  # sum m_jk^2
    prec = 1.0 / jnp.asarray(eta2, dtype) + S_sq / jnp.asarray(sigma2, dtype)
    v_new = 1.0 / prec
    # numerator: sum_j m_jk resid_j - sum_j m_jk (pred_j - m_uk m_jk)
    #          = S_mr + m_self_k * S_mm
    m_new = (S_mr + m_self * S_mm) / (jnp.asarray(sigma2, dtype) * prec)
    has = (counts > 0)[:, None]
    return jnp.where(has, m_new, m_self), jnp.where(has, v_new, v_self)


def _bias_block(
    b_self,
    b_other,
    m_self,
    m_other,
    self_ids,
    other_ids,
    x,
    counts,
    eta_bias2: float,
    sigma2: float,
    n_self: int,
):
    """Scalar bias coordinate block (`gaussian_mf_cavi_bias.py:206-263`):
    closed-form Gaussian update with precision 1/eta_b^2 + N/sigma^2 on the
    residual r - b_other - <theta, beta>."""
    dtype = b_self.dtype
    interaction = edge_dot(gather_rows(m_self, self_ids), gather_rows(m_other, other_ids))
    resid = x - gather_rows(b_other, other_ids) - interaction
    s = sorted_segment_sum(resid, self_ids, n_self)
    prec = 1.0 / jnp.asarray(eta_bias2, dtype) + counts / jnp.asarray(sigma2, dtype)
    b_new = s / (prec * jnp.asarray(sigma2, dtype))
    return jnp.where(counts > 0, b_new, b_self)


def _bias_block_lagged(
    b_self,
    m_self_new,
    S_m,
    S_x,
    S_b,
    counts,
    eta_bias2: float,
    sigma2: float,
):
    """Bias update from row-level sufficient statistics: the per-edge
    residual sum decomposes as s_i = sum x - sum b_other - <m_i, sum m_other>
    (m_i constant per row), so no edge pass is needed once (S_m, S_x, S_b)
    are known — the lagged-bias mode collects them on the factor passes."""
    dtype = b_self.dtype
    s = S_x - S_b - jnp.sum(m_self_new * S_m, axis=1)
    prec = 1.0 / jnp.asarray(eta_bias2, dtype) + counts / jnp.asarray(sigma2, dtype)
    return jnp.where(counts > 0, s / (prec * jnp.asarray(sigma2, dtype)), b_self)


@partial(jax.jit, static_argnames=("n_factors", "use_bias", "covariance",
                                   "bias_update"))
def sweep(
    state: dict,
    data: RatingsCOO,
    sigma2: float,
    eta_theta2: float,
    eta_beta2: float,
    eta_bias2: float,
    n_factors: int,
    use_bias: bool,
    covariance: str = "full",
    bias_update: str = "exact",
) -> dict:
    """One full CAVI iteration: theta block, beta block, then (optionally)
    user/item bias blocks, preserving the reference's block order and
    read-after-write structure.

    ``bias_update="lagged"`` reorders to theta -> b_user -> beta -> b_item
    and takes b_user's factor-interaction term against the PREVIOUS
    iteration's betas (the one stale quantity; b_item's update uses all
    current values).  Every block update and its fixed point are otherwise
    identical — at convergence the lag vanishes, so both modes share the
    reference's fixed point (tested in `tests/test_gaussian_lagged.py`).
    The payoff is in the blocked engine, where the bias statistics ride the
    factor passes' padded payload lanes for free (see `sweep_blocked`)."""
    del n_factors  # shape info lives in the arrays; kept static for clarity
    block = _factor_block if covariance == "full" else _factor_block_diag
    lagged = use_bias and bias_update == "lagged"
    m_theta, V_theta = block(
        state["m_theta"],
        state["V_theta"],
        state["m_beta"],
        state["V_beta"],
        state["b_user"],
        state["b_item"],
        data.u_by_u,
        data.i_by_u,
        data.x_by_u,
        data.user_counts,
        eta_theta2,
        sigma2,
        data.n_users,
        use_bias,
    )
    b_user = state["b_user"]
    b_item = state["b_item"]
    if lagged:
        S_m_u = sorted_segment_sum(
            gather_rows(state["m_beta"], data.i_by_u), data.u_by_u, data.n_users
        )
        S_b_u = sorted_segment_sum(
            gather_rows(b_item, data.i_by_u), data.u_by_u, data.n_users
        )
        S_x_u = sorted_segment_sum(data.x_by_u, data.u_by_u, data.n_users)
        b_user = _bias_block_lagged(
            b_user, m_theta, S_m_u, S_x_u, S_b_u, data.user_counts,
            eta_bias2, sigma2,
        )
    m_beta, V_beta = block(
        state["m_beta"],
        state["V_beta"],
        m_theta,
        V_theta,
        state["b_item"],
        b_user,  # lagged: the just-updated user biases; exact: unchanged
        data.i_by_i,
        data.u_by_i,
        data.x_by_i,
        data.item_counts,
        eta_beta2,
        sigma2,
        data.n_items,
        use_bias,
    )
    if lagged:
        S_m_i = sorted_segment_sum(
            gather_rows(m_theta, data.u_by_i), data.i_by_i, data.n_items
        )
        S_b_i = sorted_segment_sum(
            gather_rows(b_user, data.u_by_i), data.i_by_i, data.n_items
        )
        S_x_i = sorted_segment_sum(data.x_by_i, data.i_by_i, data.n_items)
        b_item = _bias_block_lagged(
            b_item, m_beta, S_m_i, S_x_i, S_b_i, data.item_counts,
            eta_bias2, sigma2,
        )
    elif use_bias:
        b_user = _bias_block(
            b_user,
            b_item,
            m_theta,
            m_beta,
            data.u_by_u,
            data.i_by_u,
            data.x_by_u,
            data.user_counts,
            eta_bias2,
            sigma2,
            data.n_users,
        )
        b_item = _bias_block(
            b_item,
            b_user,
            m_beta,
            m_theta,
            data.i_by_i,
            data.u_by_i,
            data.x_by_i,
            data.item_counts,
            eta_bias2,
            sigma2,
            data.n_items,
        )
    return {
        "m_theta": m_theta,
        "V_theta": V_theta,
        "m_beta": m_beta,
        "V_beta": V_beta,
        "b_user": b_user,
        "b_item": b_item,
    }


@partial(jax.jit, static_argnames=("use_bias", "precision", "interpret", "mesh",
                                   "covariance", "bias_update"))
def sweep_blocked(
    state: dict,
    blocked,
    user_counts: jax.Array,
    item_counts: jax.Array,
    sigma2: float,
    eta_theta2: float,
    eta_beta2: float,
    eta_bias2: float,
    use_bias: bool,
    precision: str = "high",
    interpret: bool = False,
    mesh=None,
    covariance: str = "full",
    blocked_bias=None,
    bias_update: str = "exact",
) -> dict:
    """Same iteration as :func:`sweep`, with all four edge passes computed
    by the Gaussian Pallas kernels (`pmf_tpu.ops.pallas.gaussian_edge`) and
    the K x K solves by the VMEM-resident Pallas Gauss-Jordan inverse
    (XLA's batched Cholesky lowers to sequential While loops on TPU —
    measured ~0.4 s for 162k users at K=20, vs ~2 ms in VMEM).

    ``bias_update="lagged"`` (full covariance only here) drops BOTH
    dedicated bias edge passes: their sufficient statistics ride the factor
    passes' padded payload lanes (two extra columns, 500 -> 504 of the same
    512-lane tiles), and the bias blocks become row-level closed forms —
    the same math as :func:`sweep`'s lagged mode.  Measured ~1.4x per
    iteration at ML-25M scale (docs/PERFORMANCE.md)."""
    from pmf_tpu.ops.pallas.gaussian_edge import (
        gaussian_bias_stats,
        gaussian_diag_stats,
        gaussian_factor_stats,
    )
    from pmf_tpu.ops.pallas.gj_inverse import batched_psd_inverse_pallas

    head = getattr(blocked, "head", None)
    if head is not None and blocked_bias is not None:
        raise ValueError(
            "blocked_bias sub-layouts are not supported with a dense head "
            "(the sub-layout would double-count head edges)"
        )

    K = state["m_theta"].shape[1]
    dtype = state["m_theta"].dtype
    eye = jnp.eye(K, dtype=dtype)

    def factor_update(m_old, V_old, S_w, S_A, counts, eta2):
        precn = eye / jnp.asarray(eta2, dtype) + S_A / jnp.asarray(sigma2, dtype)
        V_new = batched_psd_inverse_pallas(precn, interpret=interpret)
        m_new = jnp.einsum("rkl,rl->rk", V_new, S_w) / jnp.asarray(sigma2, dtype)
        has = (counts > 0)[:, None]
        return jnp.where(has, m_new, m_old), jnp.where(has[:, :, None], V_new, V_old)

    def diag_block(m_self, v_self, m_other, v_other, b_self, b_other, pass_,
                   counts, eta2, head_side):
        S_mr, S_sq, S_mm = gaussian_diag_stats(
            m_other, v_other, m_self, b_self, b_other, pass_,
            use_bias=use_bias, precision=precision, interpret=interpret,
            mesh=mesh, head=head, head_side=head_side,
        )
        precn = 1.0 / jnp.asarray(eta2, dtype) + S_sq / jnp.asarray(sigma2, dtype)
        v_new = 1.0 / precn
        m_new = (S_mr + m_self * S_mm) / (jnp.asarray(sigma2, dtype) * precn)
        has = (counts > 0)[:, None]
        return jnp.where(has, m_new, m_self), jnp.where(has, v_new, v_self)

    if covariance == "diag" and bias_update == "lagged" and use_bias:
        raise ValueError(
            "bias_update='lagged' requires covariance='full' in the blocked "
            "engine (the diag kernel carries no bias-stat payload); use the "
            "flat engine for lagged diag mode"
        )
    if covariance == "diag":
        m_theta, V_theta = diag_block(
            state["m_theta"], state["V_theta"], state["m_beta"], state["V_beta"],
            state["b_user"], state["b_item"], blocked.by_user, user_counts,
            eta_theta2, "user",
        )
        m_beta, V_beta = diag_block(
            state["m_beta"], state["V_beta"], m_theta, V_theta,
            state["b_item"], state["b_user"], blocked.by_item, item_counts,
            eta_beta2, "item",
        )
        lagged = False
    elif use_bias and bias_update == "lagged":
        # Lagged-bias iteration: theta -> b_user -> beta -> b_item; no
        # dedicated bias passes (stats ride the factor payloads).
        lagged = True
        S_w, S_A, S_m_u, S_x_u, S_b_u = gaussian_factor_stats(
            state["m_beta"], state["V_beta"], state["b_user"], state["b_item"],
            blocked.by_user, use_bias=True, precision=precision,
            interpret=interpret, mesh=mesh, with_bias_stats=True,
            head=head, head_side="user",
        )
        m_theta, V_theta = factor_update(
            state["m_theta"], state["V_theta"], S_w, S_A, user_counts, eta_theta2
        )
        b_user = _bias_block_lagged(
            state["b_user"], m_theta, S_m_u, S_x_u, S_b_u, user_counts,
            eta_bias2, sigma2,
        )
        S_w_i, S_A_i, S_m_i, S_x_i, S_b_i = gaussian_factor_stats(
            m_theta, V_theta, state["b_item"], b_user,
            blocked.by_item, use_bias=True, precision=precision,
            interpret=interpret, mesh=mesh, with_bias_stats=True,
            head=head, head_side="item",
        )
        m_beta, V_beta = factor_update(
            state["m_beta"], state["V_beta"], S_w_i, S_A_i, item_counts, eta_beta2
        )
        b_item = _bias_block_lagged(
            state["b_item"], m_beta, S_m_i, S_x_i, S_b_i, item_counts,
            eta_bias2, sigma2,
        )
    else:
        # theta block (old betas, old biases).
        S_w, S_A = gaussian_factor_stats(
            state["m_beta"], state["V_beta"], state["b_user"], state["b_item"],
            blocked.by_user, use_bias=use_bias, precision=precision,
            interpret=interpret, mesh=mesh, head=head, head_side="user",
        )
        m_theta, V_theta = factor_update(
            state["m_theta"], state["V_theta"], S_w, S_A, user_counts, eta_theta2
        )

        # beta block (new thetas, old biases).
        S_w_i, S_A_i = gaussian_factor_stats(
            m_theta, V_theta, state["b_item"], state["b_user"],
            blocked.by_item, use_bias=use_bias, precision=precision,
            interpret=interpret, mesh=mesh, head=head, head_side="item",
        )
        m_beta, V_beta = factor_update(
            state["m_beta"], state["V_beta"], S_w_i, S_A_i, item_counts, eta_beta2
        )
        lagged = False

    if not lagged:
        b_user = state["b_user"]
        b_item = state["b_item"]
    # The bias passes' narrow [m|b|x] payload hits the 128-lane one-hot
    # floor, so their MXU cost scales purely with the block size — an
    # optional smaller-block sub-layout (blocked_bias) cuts it ~4x.
    bias_layout = blocked if blocked_bias is None else blocked_bias
    if use_bias and not lagged:
        s_u = gaussian_bias_stats(
            m_theta, m_beta, b_item, bias_layout.by_user,
            precision=precision, interpret=interpret, mesh=mesh,
            head=head, head_side="user",
        )
        prec_u = 1.0 / jnp.asarray(eta_bias2, dtype) + user_counts / jnp.asarray(sigma2, dtype)
        b_user = jnp.where(user_counts > 0, s_u / (prec_u * jnp.asarray(sigma2, dtype)), b_user)
        s_i = gaussian_bias_stats(
            m_beta, m_theta, b_user, bias_layout.by_item,
            precision=precision, interpret=interpret, mesh=mesh,
            head=head, head_side="item",
        )
        prec_i = 1.0 / jnp.asarray(eta_bias2, dtype) + item_counts / jnp.asarray(sigma2, dtype)
        b_item = jnp.where(item_counts > 0, s_i / (prec_i * jnp.asarray(sigma2, dtype)), b_item)

    return {
        "m_theta": m_theta,
        "V_theta": V_theta,
        "m_beta": m_beta,
        "V_beta": V_beta,
        "b_user": b_user,
        "b_item": b_item,
    }


@partial(jax.jit, static_argnames=("use_bias",))
def eval_metrics(state: dict, ev: EvalSet, use_bias: bool):
    """Centered-scale validation RMSE + macro-MAE over in-range rows only
    (the Gaussian reference filters out-of-range rows before evaluating,
    `gaussian_mf_cavi_bias.py:318-333`; adding the global mean to both sides
    leaves both metrics unchanged)."""
    theta = gather_rows(state["m_theta"], ev.u)
    beta = gather_rows(state["m_beta"], ev.i)
    pred = edge_dot(theta, beta)
    if use_bias:
        pred = pred + gather_rows(state["b_user"], ev.u) + gather_rows(state["b_item"], ev.i)
    r = masked_rmse(ev.x, pred, ev.valid)
    mm = masked_macro_mae(ev.x, pred, ev.valid, ev.class_id, ev.n_classes)
    return r, mm


class GaussianMF(FactorModel):
    """Reference-compatible facade: fit/predict/evaluate on DataFrames."""

    def __init__(self, config: GaussianMFConfig):
        super().__init__(config)
        self.global_mean = 0.0

    def fit(self, train_df, val_df=None, global_mean: float = 0.0,
            resume_from=None, checkpoint_dir=None, checkpoint_every=10,
            mesh=None, profile_dir=None, state_sharding=None,
            elbo_every: int = 0):
        """``mesh``: optional `jax.sharding.Mesh` for multi-chip training
        (edges + eval rows sharded on "data"; see `FactorModel._mesh_place`).
        ``state_sharding="rows"``: additionally shard the factor STATE over
        mesh rows and train with ring sweeps (`pmf_tpu.parallel.tp`) — the
        TP mode for state that exceeds one chip's HBM (full-covariance
        V_theta/V_beta at (rows, K, K), SURVEY §2e).
        ``elbo_every=N``: record the exact mean-field ELBO in fit_history
        every N iterations (0 = off) and GATE it monotone non-decreasing —
        this sweep is exact coordinate ascent on that objective."""
        cfg = self.config
        if state_sharding == "rows":
            if elbo_every:
                raise ValueError("elbo_every is not supported with TP "
                                 "(row-sharded) fits yet")
            if mesh is None:
                raise ValueError("state_sharding='rows' requires a mesh")
            return self._fit_tp(train_df, val_df, global_mean, resume_from,
                                checkpoint_dir, checkpoint_every, mesh,
                                profile_dir)
        if state_sharding not in (None, "replicated"):
            raise ValueError(f"unknown state_sharding {state_sharding!r}")
        self.global_mean = float(global_mean)
        data = self._build_train(train_df)
        self.n_users, self.n_items = data.n_users, data.n_items
        if cfg.verbose:
            print(f"Inferred n_users={self.n_users}, n_items={self.n_items}", flush=True)
        state = self._initial_state(init_state(self.n_users, self.n_items, cfg),
                                    resume_from)

        engine = resolve_engine(cfg.engine, self.n_users, self.n_items, data.nnz)
        self.engine_used = engine
        if engine.startswith("blocked"):
            import jax as _jax

            from pmf_tpu.data.blocked import build_blocked

            u, i, x = as_triples(train_df)
            # Tuned defaults (measured at ML-25M scale, docs/PERFORMANCE.md):
            # 512-row blocks / 128-edge chunks / groups of 8 (the Gaussian
            # kernels' Mosaic compile caps the group at 8); auto_tiles
            # shrinks the chunk for reference-density (sparse-tile) shapes.
            from pmf_tpu.data.blocked import auto_tiles

            # Mosaic's compile helper crashes when group x payload-width
            # grows too large; empirically G=8 compiles at K=20 (payload
            # ~500 bf16 cols) and G=4 at K=30 (~1050).  Scale the cap with
            # the K(K+1)/2 payload (diag mode's 3K payload is tiny).
            K = cfg.n_factors
            payload = 3 * K if cfg.covariance == "diag" else 2 * (2 * K + K * (K + 1) // 2)
            cap = 8
            while cap > 1 and cap * payload > 4400:
                cap //= 2
            bs = cfg.block_size or 512
            tiles = auto_tiles(self.n_users, self.n_items, data.nnz,
                               group_cap=cap, block=bs)
            cs = cfg.chunk_size or tiles["chunk_size"]
            grp = cfg.group or tiles["group"]
            blocked = build_blocked(u, i, x, n_users=self.n_users, n_items=self.n_items,
                                    dtype=self._dtype, reorder=True,
                                    block_users=bs, block_items=bs,
                                    chunk_size=cs, group=grp, head="auto",
                                    # centered ratings carry an x_lo plane
                                    # (6 B/cell); 3.75 GiB matches the
                                    # Poisson family's 2.5 GiB CELL count
                                    # and is the measured optimum (358M
                                    # high / 620M mid-lagged vs 351/596
                                    # at 3 GiB; scan_gaussian_head.py)
                                    head_bytes=15 << 28,
                                    tail_group_cap=cap,
                                    head_row_mult=mesh.devices.size if mesh else 1)
            precision = {"blocked_fast": "fast", "blocked_mid": "mid",
                         "blocked_high": "high"}.get(engine, "high")
            interpret = _jax.default_backend() == "cpu"

            def sweep_fn(s, d):
                return sweep_blocked(
                    s, blocked, d.user_counts, d.item_counts,
                    cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
                    cfg.use_bias, precision=precision, interpret=interpret,
                    mesh=mesh, covariance=cfg.covariance,
                    bias_update=cfg.bias_update,
                )
        else:

            def sweep_fn(s, d):
                return sweep(
                    s,
                    d,
                    cfg.sigma2,
                    cfg.eta_theta2,
                    cfg.eta_beta2,
                    cfg.eta_bias2,
                    cfg.n_factors,
                    cfg.use_bias,
                    cfg.covariance,
                    cfg.bias_update,
                )

        def eval_fn(s, ev):
            return eval_metrics(s, ev, cfg.use_bias)

        val = self._build_eval(val_df) if val_df is not None else None
        data, state, val = self._mesh_place(data, state, val, mesh)
        loop = FitLoop(
            sweep_fn,
            eval_fn,
            cfg.max_iter,
            cfg.tol,
            gaussian_stop_rule,
            verbose=cfg.verbose,
            name="GaussianMF",
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            profile_dir=profile_dir,
            # theta + beta edge passes, plus the two bias passes when used
            edge_visits_per_iter=(4 if cfg.use_bias else 2) * data.nnz,
            elbo_fn=self._make_elbo_fn(train_df) if elbo_every else None,
            elbo_every=elbo_every or 1,
            # Monotone gate: exact coordinate ascent guarantees
            # non-decrease ONLY for the exact block order; the lagged bias
            # schedule shares the fixed point but not the ascent property.
            # Tolerance covers summation rounding (f64 flat) vs the
            # blocked engines' bf16-decomposed statistic error (~2e-5).
            elbo_monotone=(
                None if cfg.bias_update == "lagged"
                else (1e-6 if not engine.startswith("blocked") else 1e-4)
            ),
        )
        self.state = loop.run(state, data, val)
        self.fit_history = loop.history
        return self

    def _fit_tp(self, train_df, val_df, global_mean, resume_from,
                checkpoint_dir, checkpoint_every, mesh, profile_dir):
        """Row-sharded (TP) training: state shards stay distributed through
        every sweep, eval, and checkpoint; per-chip state memory is
        O(rows/D * K^2).  Ring sweeps share the flat blocks' math — full-fit
        equivalence at 1e-10 is tested on the 8-virtual-device CPU mesh
        (`tests/test_tp_fit.py`)."""
        from pmf_tpu.parallel.tp import (
            GAUSSIAN_AXIS_OF,
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
            tp_sweep_gaussian,
        )

        cfg = self.config
        self.global_mean = float(global_mean)
        u, i, x = as_triples(train_df)
        self.n_users = int(u.max()) + 1
        self.n_items = int(i.max()) + 1
        if cfg.verbose:
            print(f"Inferred n_users={self.n_users}, n_items={self.n_items} "
                  f"{describe_tp(mesh)}", flush=True)
        engine = resolve_engine(cfg.engine, self.n_users, self.n_items,
                                len(u))
        self.engine_used = engine
        if cfg.use_bias and cfg.bias_update != "exact" and not (
                engine.startswith("blocked") and cfg.covariance == "full"):
            raise ValueError(
                "TP mode supports bias_update='lagged' only with a blocked "
                "engine and covariance='full' (the flat ring and the diag "
                "kernel carry no bias-stat payload); got "
                f"engine={engine!r}, covariance={cfg.covariance!r}")
        # Count-balanced global row ownership (tp.BalancePerms): deal
        # rows to devices round-robin in descending count order so
        # bucket sizes — and both rings' uniform padding — balance.
        D = tp_degree(mesh)
        bal = balance_perms(u, i, -(-self.n_users // D) * D,
                            -(-self.n_items // D) * D, D)
        ub = bal.u_new_of_old[np.asarray(u)]
        ib = bal.i_new_of_old[np.asarray(i)]
        if engine.startswith("blocked"):
            # Gaussian blocked kernels INSIDE the ring (VERDICT r3 weak
            # #1) — the augmented [m | b | tri(V + mm^T)] table rotates
            # over ICI, all per-self-row algebra stays local.
            from pmf_tpu.data.blocked import auto_tiles
            from pmf_tpu.parallel.tp_blocked import (
                build_tp_blocked,
                place_tp_blocked,
                tp_sweep_gaussian_blocked,
            )

            precision = {"blocked_fast": "fast", "blocked_mid": "mid",
                         "blocked_high": "high"}.get(engine, "high")
            interpret = jax.default_backend() == "cpu"
            # Same payload-aware Mosaic group cap as the single-chip path.
            K = cfg.n_factors
            payload = (3 * K if cfg.covariance == "diag"
                       else 2 * (2 * K + K * (K + 1) // 2))
            cap = 8
            while cap > 1 and cap * payload > 4400:
                cap //= 2
            tiles = auto_tiles(self.n_users, self.n_items, len(u),
                               group_cap=cap)
            layout = build_tp_blocked(
                ub, ib, x, self.n_users, self.n_items, D,
                dtype=self._dtype, dp=dp_degree(mesh),
                block_users=tiles["block_users"],
                block_items=tiles["block_items"],
                chunk_size=tiles["chunk_size"], group=tiles["group"])
            place = place_tp_blocked
            sweep_tp = jax.jit(
                lambda s, lo: tp_sweep_gaussian_blocked(
                    s, lo, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
                    cfg.eta_bias2, use_bias=cfg.use_bias,
                    covariance=cfg.covariance, mesh=mesh,
                    precision=precision, interpret=interpret,
                    bias_update=cfg.bias_update))
        else:
            layout = build_tp_layout(ub, ib, x, self.n_users, self.n_items,
                                     D, dtype=self._dtype,
                                     dp=dp_degree(mesh))
            place = place_tp
            sweep_tp = jax.jit(
                lambda s, lo: tp_sweep_gaussian(
                    s, lo, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
                    cfg.eta_bias2, use_bias=cfg.use_bias,
                    covariance=cfg.covariance, mesh=mesh,
                )
            )
        # TP checkpoints carry mesh-padded row counts; restore against the
        # padded default (cross-mode resume would need a repad, unsupported).
        # host_staging: the full padded state exists only on the host CPU
        # until place_tp shards it row-wise — TP exists for state bigger
        # than one chip's HBM, so it must never land whole on a device.
        with host_staging():
            init = permute_state_rows(
                pad_state_rows(init_state(self.n_users, self.n_items, cfg),
                               GAUSSIAN_AXIS_OF, layout.n_users_pad,
                               layout.n_items_pad),
                GAUSSIAN_AXIS_OF, bal.u_old_of_new, bal.i_old_of_new)
            state = self._initial_state(init, resume_from)
        layout, state = place(layout, state, mesh)

        def eval_fn(s, ev):
            return eval_metrics(s, ev, cfg.use_bias)

        val = None
        if val_df is not None:
            from pmf_tpu.parallel import shard_eval_set

            val = shard_eval_set(
                remap_eval(self._build_eval(val_df),
                           bal.u_new_of_old, bal.i_new_of_old), mesh)
        loop = FitLoop(
            lambda s, lo: sweep_tp(s, lo),
            eval_fn,
            cfg.max_iter,
            cfg.tol,
            gaussian_stop_rule,
            verbose=cfg.verbose,
            name="GaussianMF[tp]",
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            profile_dir=profile_dir,
            edge_visits_per_iter=(4 if cfg.use_bias else 2) * layout.nnz,
        )
        state = loop.run(state, layout, val)
        state = permute_state_rows(state, GAUSSIAN_AXIS_OF,
                                   bal.u_new_of_old, bal.i_new_of_old)
        self.state = slice_state_rows(state, GAUSSIAN_AXIS_OF,
                                      self.n_users, self.n_items)
        self.fit_history = loop.history
        return self

    def _make_elbo_fn(self, train):
        """state -> exact mean-field ELBO closure over the (centered)
        train edges (used by ``fit(elbo_every=)`` and :meth:`elbo`)."""
        import jax.numpy as jnp

        from pmf_tpu.eval.elbo import _auto_chunks, gaussian_elbo

        u, i, x = as_triples(train)
        cfg = self.config
        width = cfg.n_factors ** 2 if cfg.covariance == "full" else cfg.n_factors
        ue = jnp.asarray(u, jnp.int32)
        ie = jnp.asarray(i, jnp.int32)
        xe = jnp.asarray(x, np.dtype(cfg.dtype))
        nc = _auto_chunks(len(u), width)
        return lambda s: gaussian_elbo(
            s, ue, ie, xe, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
            cfg.eta_bias2, use_bias=cfg.use_bias, covariance=cfg.covariance,
            n_chunks=nc,
        )

    def elbo(self, train) -> float:
        """Exact mean-field ELBO on (centered) training ratings — the
        objective this model's CAVI sweep ascends (see pmf_tpu.eval.elbo);
        beyond the reference, which never computes its objective."""
        return float(self._make_elbo_fn(train)(self.state))

    # -- predictions ------------------------------------------------------
    def _point_estimates(self):
        return self.state["m_theta"], self.state["m_beta"]

    def _score_offsets(self):
        """Serving scores must match predict(): with biases the ranking
        depends on b_item, and the reported score includes mean + b_user."""
        if not self.config.use_bias:
            return None, None, float(getattr(self, "global_mean", 0.0))
        return (
            self.state["b_user"],
            self.state["b_item"],
            float(getattr(self, "global_mean", 0.0)),
        )

    def predict(self, user_ids, item_ids, global_mean: float = 0.0) -> np.ndarray:
        u = np.asarray(user_ids, dtype=np.int64)
        i = np.asarray(item_ids, dtype=np.int64)
        valid = (u < self.n_users) & (i < self.n_items) & (u >= 0) & (i >= 0)
        theta = np.asarray(self.state["m_theta"], dtype=np.float64)
        beta = np.asarray(self.state["m_beta"], dtype=np.float64)
        preds = np.zeros(len(u), dtype=np.float64)
        if valid.any():
            p = np.sum(theta[u[valid]] * beta[i[valid]], axis=1)
            if self.config.use_bias:
                bu = np.asarray(self.state["b_user"], dtype=np.float64)
                bi = np.asarray(self.state["b_item"], dtype=np.float64)
                p = p + bu[u[valid]] + bi[i[valid]]
            preds[valid] = p
        return preds + global_mean

    def evaluate_rmse(self, df, global_mean: float = 0.0) -> float:
        from pmf_tpu.eval.metrics import rmse

        u, i, x = as_triples(df)
        mask = (u < self.n_users) & (i < self.n_items)
        if not mask.any():
            return float("nan")
        y_true = x[mask] + global_mean
        y_pred = self.predict(u[mask], i[mask], global_mean)
        return rmse(y_true, y_pred)

    def evaluate_macro_mae(self, df, global_mean: float = 0.0) -> float:
        from pmf_tpu.eval.metrics import macro_mae

        u, i, x = as_triples(df)
        mask = (u < self.n_users) & (i < self.n_items)
        if not mask.any():
            return float("nan")
        y_true = x[mask] + global_mean
        y_pred = self.predict(u[mask], i[mask], global_mean)
        return macro_mae(y_true, y_pred)
