import numpy as np

from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

from tests import oracles


def test_poisson_parity_vs_oracle(small_ratings):
    u, i, x = small_ratings
    K, n_iter, seed = 7, 4, 5
    a0, b0 = 0.3, 1.0

    ref = oracles.poisson_cavi(u, i, x, K, a0, b0, n_iter, seed)

    cfg = PoissonMFConfig(
        n_factors=K, a0=a0, b0=b0, max_iter=n_iter, tol=None,
        random_state=seed, verbose=False, dtype="float64",
    )
    model = PoissonMF(cfg).fit((u, i, x))

    for key in ("a_theta", "b_theta", "a_beta", "b_beta"):
        np.testing.assert_allclose(
            np.asarray(model.state[key]), ref[key], rtol=1e-8, atol=1e-10, err_msg=key
        )

    pred = model.predict(u[:50], i[:50])
    expect = np.sum(ref["E_theta"][u[:50]] * ref["E_beta"][i[:50]], axis=1)
    np.testing.assert_allclose(pred, expect, rtol=1e-8)


def test_poisson_extended_parity_vs_oracle(small_ratings):
    u, i, x = small_ratings
    K, n_iter, seed = 5, 3, 9
    a0, b0 = 0.6, 1.0

    ref = oracles.poisson_extended_cavi(u, i, x, K, a0, b0, n_iter, seed)

    cfg = PoissonMFConfig(
        n_factors=K, a0=a0, b0=b0, max_iter=n_iter, tol=None,
        random_state=seed, verbose=False, extended=True, dtype="float64",
    )
    model = PoissonMF(cfg).fit((u, i, x))

    for key in ("a_theta", "b_theta", "a_beta", "b_beta", "a_phi", "b_phi", "a_psi", "b_psi"):
        np.testing.assert_allclose(
            np.asarray(model.state[key]), ref[key], rtol=1e-8, atol=1e-10, err_msg=key
        )

    pred = model.predict(u[:20], i[:20])
    expect = (
        np.sum(ref["E_theta"][u[:20]] * ref["E_beta"][i[:20]], axis=1)
        * ref["E_phi"][u[:20]]
        * ref["E_psi"][i[:20]]
    )
    np.testing.assert_allclose(pred, expect, rtol=1e-8)


def test_poisson_nonnegative_predictions(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    cfg = PoissonMFConfig(n_factors=6, max_iter=5, tol=None, verbose=False)
    model = PoissonMF(cfg).fit((tu, ti, tx), (vu, vi, vx))
    assert (model.predict(vu, vi) >= 0).all()
