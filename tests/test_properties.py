"""Property tests (SURVEY §4): structural invariants that must hold for
any data — Gamma variational parameters stay strictly positive, Gaussian
posterior covariances stay symmetric positive-definite, predictions stay
finite — checked after many sweeps on skewed synthetic data."""

import numpy as np
import pytest

from pmf_tpu.data.synthetic import synth_ratings


@pytest.fixture(scope="module")
def skewed():
    # Heavier tail + duplicate-ish structure than the default fixtures.
    return synth_ratings(400, 700, 6000, seed=23, skew=1.8)


def test_poisson_family_gamma_positivity(skewed):
    from pmf_tpu.models.hpf import HPF, HPFConfig
    from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

    u, i, x = skewed
    for model in (
        PoissonMF(PoissonMFConfig(n_factors=7, max_iter=12, tol=None, verbose=False)),
        PoissonMF(PoissonMFConfig(n_factors=7, max_iter=12, tol=None, verbose=False,
                                  extended=True)),
        HPF(HPFConfig(n_factors=7, max_iter=12, tol=None, verbose=False)),
    ):
        model.fit((u, i, x + 1.0))
        for k, v in model.state.items():
            arr = np.asarray(v)
            assert np.isfinite(arr).all(), f"{type(model).__name__}.{k} not finite"
            assert (arr > 0).all(), f"{type(model).__name__}.{k} not positive"
        preds = model.predict(u[:50], i[:50])
        assert np.isfinite(preds).all() and (preds >= 0).all()


def test_gaussian_covariances_stay_spd(skewed):
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    u, i, x = skewed
    xc = x - x.mean()
    m = GaussianMF(GaussianMFConfig(n_factors=6, max_iter=12, tol=None,
                                    verbose=False)).fit((u, i, xc))
    for key in ("V_theta", "V_beta"):
        V = np.asarray(m.state[key])
        np.testing.assert_allclose(V, np.swapaxes(V, 1, 2), rtol=0, atol=1e-5,
                                   err_msg=f"{key} not symmetric")
        eig = np.linalg.eigvalsh(V.astype(np.float64))
        assert (eig > 0).all(), f"{key} not positive definite"
    assert np.isfinite(np.asarray(m.state["b_user"])).all()


def test_gaussian_diag_variances_positive(skewed):
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    u, i, x = skewed
    xc = x - x.mean()
    m = GaussianMF(GaussianMFConfig(n_factors=6, max_iter=12, tol=None,
                                    verbose=False, covariance="diag")).fit((u, i, xc))
    for key in ("V_theta", "V_beta"):
        v = np.asarray(m.state[key])
        assert (v > 0).all() and np.isfinite(v).all()


def test_hpf_map_params_finite_under_long_training(skewed):
    from pmf_tpu.models.hpf_map import HPFMap, HPFMapConfig

    u, i, x = skewed
    m = HPFMap(HPFMapConfig(n_factors=6, epochs=15, lr=0.05, batch_size=512,
                            verbose=False)).fit((u, i, x + 1.0))
    for k, v in m.state.items():
        assert np.isfinite(np.asarray(v)).all(), k
    theta, beta = m._point_estimates()
    assert (np.asarray(theta) > 0).all() and (np.asarray(beta) > 0).all()
