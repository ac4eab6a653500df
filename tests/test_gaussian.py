import numpy as np
import pytest

from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

from tests import oracles


@pytest.mark.parametrize("use_bias", [False, True])
def test_gaussian_parity_vs_oracle(small_ratings, use_bias):
    u, i, x = small_ratings
    xc = x - x.mean()
    K, n_iter, seed = 6, 4, 3
    sigma2, eta_t2, eta_b2, eta_bias2 = 0.5, 0.3, 0.4, 0.8

    ref = oracles.gaussian_cavi(
        u, i, xc, K, sigma2, eta_t2, eta_b2, eta_bias2, n_iter, seed, use_bias
    )

    cfg = GaussianMFConfig(
        n_factors=K,
        sigma2=sigma2,
        eta_theta2=eta_t2,
        eta_beta2=eta_b2,
        eta_bias2=eta_bias2,
        max_iter=n_iter,
        tol=None,
        random_state=seed,
        verbose=False,
        use_bias=use_bias,
        dtype="float64",
    )
    model = GaussianMF(cfg).fit((u, i, xc))

    np.testing.assert_allclose(
        np.asarray(model.state["m_theta"]), ref["m_theta"], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(model.state["m_beta"]), ref["m_beta"], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(model.state["V_theta"]), ref["V_theta"], rtol=1e-7, atol=1e-10
    )
    if use_bias:
        np.testing.assert_allclose(
            np.asarray(model.state["b_user"]), ref["b_user"], rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(model.state["b_item"]), ref["b_item"], rtol=1e-8, atol=1e-10
        )

    # Predict parity on a few pairs, including out-of-range.
    up = np.array([0, 3, 10, 9999])
    ip = np.array([1, 0, 5, 2])
    pred = model.predict(up, ip, global_mean=1.5)
    theta, beta = ref["m_theta"], ref["m_beta"]
    for t in range(3):
        expect = theta[up[t]] @ beta[ip[t]]
        if use_bias:
            expect += ref["b_user"][up[t]] + ref["b_item"][ip[t]]
        assert abs(pred[t] - (expect + 1.5)) < 1e-8
    assert abs(pred[3] - 1.5) < 1e-12  # out-of-range -> 0 + mean


def test_gaussian_fit_improves_val(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    cfg = GaussianMFConfig(
        n_factors=8, sigma2=1.0, eta_theta2=0.5, eta_beta2=0.5,
        max_iter=10, tol=1e-5, random_state=0, verbose=False,
    )
    model = GaussianMF(cfg).fit((tu, ti, tx - mean), (vu, vi, vx - mean), global_mean=mean)
    assert len(model.fit_history) >= 2
    first, last = model.fit_history[0]["val_rmse"], model.fit_history[-1]["val_rmse"]
    assert np.isfinite(last)
    assert last <= first + 0.05
    # train RMSE should beat predicting the mean
    train_rmse = model.evaluate_rmse((tu, ti, tx - mean), global_mean=mean)
    assert train_rmse < np.sqrt(np.mean((tx - mean) ** 2))
