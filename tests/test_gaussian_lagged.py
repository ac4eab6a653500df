"""Lagged-bias Gaussian mode (`bias_update="lagged"`).

Three gates:
  1. the flat lagged sweep matches a dense NumPy oracle of the lagged
     block order (theta -> b_user -> beta -> b_item, b_user's interaction
     term against the previous iteration's betas) at float64;
  2. the blocked (Pallas, interpret) lagged sweep matches the flat lagged
     sweep — the bias statistics riding the factor payload are exact;
  3. lagged and exact modes share the reference's fixed point: a lagged
     sweep applied at the exact mode's converged state is (numerically)
     the identity, because the lag vanishes at convergence.
"""

import numpy as np

from pmf_tpu.data.coo import build_ratings
from pmf_tpu.models import gaussian_mf
from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig


def _lagged_oracle_sweep(state, u, i, x, cfg):
    """Dense float64 reference of ONE lagged sweep (independent loops)."""
    m_t = state["m_theta"].copy()
    V_t = state["V_theta"].copy()
    m_b = state["m_beta"].copy()
    V_b = state["V_beta"].copy()
    b_u = state["b_user"].copy()
    b_i = state["b_item"].copy()
    K = m_t.shape[1]
    n_users, n_items = m_t.shape[0], m_b.shape[0]
    eye = np.eye(K)

    m_b_old, b_i_old = m_b.copy(), b_i.copy()

    # theta block: old betas, old biases (identical to exact mode)
    for r in range(n_users):
        mask = u == r
        if not mask.any():
            continue
        js = i[mask]
        A = V_b[js] + m_b[js][:, :, None] * m_b[js][:, None, :]
        S = A.sum(axis=0)
        resid = x[mask] - b_u[r] - b_i[js]
        w = (m_b[js] * resid[:, None]).sum(axis=0)
        prec = eye / cfg.eta_theta2 + S / cfg.sigma2
        V_t[r] = np.linalg.inv(prec)
        m_t[r] = V_t[r] @ w / cfg.sigma2

    # b_user: x, b_item old, sum of OLD betas; dot against NEW theta
    for r in range(n_users):
        mask = u == r
        if not mask.any():
            continue
        js = i[mask]
        s = (x[mask] - b_i_old[js]).sum() - m_t[r] @ m_b_old[js].sum(axis=0)
        prec = 1.0 / cfg.eta_bias2 + mask.sum() / cfg.sigma2
        b_u[r] = s / (prec * cfg.sigma2)

    # beta block: new thetas, NEW user biases, old item biases
    for r in range(n_items):
        mask = i == r
        if not mask.any():
            continue
        us = u[mask]
        A = V_t[us] + m_t[us][:, :, None] * m_t[us][:, None, :]
        S = A.sum(axis=0)
        resid = x[mask] - b_i[r] - b_u[us]
        w = (m_t[us] * resid[:, None]).sum(axis=0)
        prec = eye / cfg.eta_beta2 + S / cfg.sigma2
        V_b[r] = np.linalg.inv(prec)
        m_b[r] = V_b[r] @ w / cfg.sigma2

    # b_item: all-current values (theta new, beta new, b_user new)
    for r in range(n_items):
        mask = i == r
        if not mask.any():
            continue
        us = u[mask]
        s = (x[mask] - b_u[us]).sum() - m_b[r] @ m_t[us].sum(axis=0)
        prec = 1.0 / cfg.eta_bias2 + mask.sum() / cfg.sigma2
        b_i[r] = s / (prec * cfg.sigma2)

    return dict(m_theta=m_t, V_theta=V_t, m_beta=m_b, V_beta=V_b,
                b_user=b_u, b_item=b_i)


def test_lagged_flat_matches_oracle(small_ratings):
    u, i, x = small_ratings
    x = x - x.mean()
    cfg = GaussianMFConfig(n_factors=4, sigma2=0.6, eta_theta2=0.5,
                           eta_beta2=0.5, eta_bias2=0.8, dtype="float64",
                           verbose=False, bias_update="lagged")
    data = build_ratings(u, i, x, dtype=np.float64)
    state = gaussian_mf.init_state(data.n_users, data.n_items, cfg)
    host = {k: np.asarray(v, np.float64) for k, v in state.items()}
    for _ in range(3):
        state = gaussian_mf.sweep(
            state, data, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
            cfg.eta_bias2, cfg.n_factors, True, "full", "lagged",
        )
        host = _lagged_oracle_sweep(host, u, i, x, cfg)
    for k in host:
        np.testing.assert_allclose(
            np.asarray(state[k]), host[k], rtol=1e-8, atol=1e-10, err_msg=k
        )


def test_lagged_engines_agree(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    base = dict(n_factors=5, sigma2=0.5, eta_theta2=0.4, eta_beta2=0.4,
                eta_bias2=0.7, max_iter=3, tol=None, verbose=False,
                dtype="float32", use_bias=True, bias_update="lagged")
    flat = GaussianMF(GaussianMFConfig(engine="flat", **base)).fit(train, val)
    blocked = GaussianMF(GaussianMFConfig(engine="blocked_high", **base)).fit(
        train, val)
    for k in ("m_theta", "m_beta", "b_user", "b_item", "V_theta"):
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(blocked.state[k]),
            rtol=5e-3, atol=2e-5, err_msg=k,
        )


def test_lagged_shares_exact_fixed_point(small_ratings):
    """At the exact mode's converged state, one lagged sweep is a no-op:
    the lag (previous-iteration betas / pre-update user biases) equals the
    current values, so both modes have the SAME fixed point."""
    u, i, x = small_ratings
    x = x - x.mean()
    cfg = GaussianMFConfig(n_factors=4, sigma2=0.6, eta_theta2=0.5,
                           eta_beta2=0.5, eta_bias2=0.8, dtype="float64",
                           verbose=False)
    data = build_ratings(u, i, x, dtype=np.float64)
    state = gaussian_mf.init_state(data.n_users, data.n_items, cfg)
    for _ in range(400):  # converge the exact iteration in float64
        state = gaussian_mf.sweep(
            state, data, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
            cfg.eta_bias2, cfg.n_factors, True, "full", "exact",
        )
    lagged_after = gaussian_mf.sweep(
        state, data, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
        cfg.eta_bias2, cfg.n_factors, True, "full", "lagged",
    )
    exact_after = gaussian_mf.sweep(
        state, data, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
        cfg.eta_bias2, cfg.n_factors, True, "full", "exact",
    )
    for k in state:
        # Near the fixed point the two modes' sweeps agree to O(lag), and
        # both are (numerically) the identity.
        np.testing.assert_allclose(
            np.asarray(lagged_after[k]), np.asarray(exact_after[k]),
            rtol=1e-6, atol=1e-8, err_msg=k,
        )
        np.testing.assert_allclose(
            np.asarray(lagged_after[k]), np.asarray(state[k]),
            rtol=1e-5, atol=1e-8, err_msg=k,
        )


def test_lagged_diag_blocked_raises(small_ratings):
    import pytest

    from pmf_tpu.data.blocked import build_blocked

    u, i, x = small_ratings
    cfg = GaussianMFConfig(n_factors=4, covariance="diag",
                           bias_update="lagged", verbose=False)
    data = build_ratings(u, i, x)
    blocked = build_blocked(u, i, x, block_users=32, block_items=32,
                            chunk_size=64, group=1)
    state = gaussian_mf.init_state(data.n_users, data.n_items, cfg)
    with pytest.raises(ValueError, match="lagged"):
        gaussian_mf.sweep_blocked(
            state, blocked, data.user_counts, data.item_counts,
            cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
            True, precision="highest", interpret=True,
            covariance="diag", bias_update="lagged",
        )


def test_gaussian_mid_tier_close_to_flat(small_splits):
    """The mixed-parts "mid" tier (w-stat bf16x2, triA single bf16,
    ~2e-3 A-stat noise) must track the exact iteration closely."""
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    base = dict(n_factors=5, sigma2=0.5, eta_theta2=0.4, eta_beta2=0.4,
                eta_bias2=0.7, max_iter=3, tol=None, verbose=False,
                dtype="float32", use_bias=True)
    flat = GaussianMF(GaussianMFConfig(engine="flat", **base)).fit(train, val)
    mid = GaussianMF(GaussianMFConfig(engine="blocked_mid", **base)).fit(
        train, val)
    for k in ("m_theta", "m_beta", "b_user", "b_item"):
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(mid.state[k]),
            rtol=3e-2, atol=3e-3, err_msg=k,
        )
    assert abs(flat.fit_history[-1]["val_rmse"]
               - mid.fit_history[-1]["val_rmse"]) < 5e-3


def test_factor_stats_precision_tiers(small_ratings):
    """highest (f32 Mosaic dots) vs high (bf16x2/bf16x2) vs mid
    (bf16x2/bf16x1) factor statistics on the same layout: high within
    ~2e-5 of highest, mid within ~2e-3 (the documented tier errors)."""
    from pmf_tpu.data.blocked import build_blocked
    from pmf_tpu.ops.pallas.gaussian_edge import gaussian_factor_stats

    u, i, x = small_ratings
    x = (x - x.mean()).astype(np.float32)
    cfg = GaussianMFConfig(n_factors=6, verbose=False, dtype="float32")
    data = build_ratings(u, i, x)
    blocked = build_blocked(u, i, x, block_users=64, block_items=64,
                            chunk_size=64, group=2)
    state = gaussian_mf.init_state(data.n_users, data.n_items, cfg)
    b_self = np.random.default_rng(0).normal(0, 0.1, data.n_users).astype(np.float32)
    b_other = np.random.default_rng(1).normal(0, 0.1, data.n_items).astype(np.float32)

    outs = {}
    for prec in ("highest", "high", "mid"):
        outs[prec] = gaussian_factor_stats(
            state["m_beta"], state["V_beta"], b_self, b_other,
            blocked.by_user, use_bias=True, precision=prec, interpret=True,
            with_bias_stats=True,
        )
    for idx, tol in ((0, 3e-4), (1, 3e-2), (2, 3e-4), (3, 3e-4), (4, 3e-4)):
        hi = np.asarray(outs["highest"][idx])
        scale = np.abs(hi).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(outs["high"][idx]) / scale, hi / scale, atol=1e-4,
            err_msg=f"high stat {idx}")
        np.testing.assert_allclose(
            np.asarray(outs["mid"][idx]) / scale, hi / scale, atol=tol,
            err_msg=f"mid stat {idx}")
