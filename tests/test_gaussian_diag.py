"""Diagonal-covariance Gaussian mode: the large-scale coarsening must
still fit and predict sensibly (it is NOT parity-gated against the
full-covariance reference — a documented deviation)."""

import numpy as np

from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig


def test_diag_mode_fits_and_predicts(small_splits):
    (tu, ti, tx), (vu, vi, vx), (su, si, sx) = small_splits
    mean = tx.mean()
    cfg = GaussianMFConfig(
        n_factors=8, sigma2=1.0, eta_theta2=0.5, eta_beta2=0.5,
        max_iter=12, tol=1e-5, verbose=False, covariance="diag",
    )
    m = GaussianMF(cfg).fit((tu, ti, tx - mean), (vu, vi, vx - mean), global_mean=mean)
    assert m.state["V_theta"].ndim == 2  # (rows, K), not (rows, K, K)
    rmses = [h["val_rmse"] for h in m.fit_history]
    assert np.isfinite(rmses).all()
    assert rmses[-1] <= rmses[0] + 0.05
    # Better than predicting the mean on train.
    train_rmse = m.evaluate_rmse((tu, ti, tx - mean), global_mean=mean)
    assert train_rmse < np.sqrt(np.mean((tx - mean) ** 2))


def test_diag_engines_agree(small_splits):
    """The diag-covariance blocked (Pallas) engine matches the flat diag
    sweep — the 3K-wide payload mode built for ML-25M+ row counts."""
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    base = dict(n_factors=6, sigma2=0.8, eta_theta2=0.5, eta_beta2=0.5,
                eta_bias2=0.7, max_iter=4, tol=None, verbose=False,
                dtype="float32", covariance="diag", use_bias=True)
    flat = GaussianMF(GaussianMFConfig(engine="flat", **base)).fit(
        train, val, global_mean=mean)
    blocked = GaussianMF(GaussianMFConfig(engine="blocked_high", **base)).fit(
        train, val, global_mean=mean)
    for k in ("m_theta", "m_beta", "V_theta", "V_beta", "b_user", "b_item"):
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(blocked.state[k]),
            rtol=5e-3, atol=3e-5, err_msg=k,
        )


def test_diag_tracks_full_roughly(small_splits):
    """Same data, both modes: final val RMSE within a loose band."""
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    base = dict(n_factors=6, sigma2=1.0, eta_theta2=0.5, eta_beta2=0.5,
                max_iter=8, tol=None, verbose=False)
    full = GaussianMF(GaussianMFConfig(covariance="full", **base)).fit(
        (tu, ti, tx - mean), (vu, vi, vx - mean), global_mean=mean)
    diag = GaussianMF(GaussianMFConfig(covariance="diag", **base)).fit(
        (tu, ti, tx - mean), (vu, vi, vx - mean), global_mean=mean)
    r_full = full.fit_history[-1]["val_rmse"]
    r_diag = diag.fit_history[-1]["val_rmse"]
    assert abs(r_full - r_diag) < 0.25 * max(r_full, 1.0)
