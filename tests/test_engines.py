"""Engine equivalence: the Pallas blocked sweep (interpret mode on CPU)
must match the flat XLA sweep at float32 tolerance, end to end."""

import numpy as np

from pmf_tpu.models.hpf import HPF, HPFConfig
from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig


def _fit(model_cls, cfg, train, val):
    return model_cls(cfg).fit(train, val)


def test_hpf_engines_agree(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1), (vu, vi, vx + 1)
    base = dict(n_factors=6, max_iter=4, tol=None, verbose=False, dtype="float32")
    flat = _fit(HPF, HPFConfig(engine="flat", **base), train, val)
    blocked = _fit(HPF, HPFConfig(engine="blocked_high", **base), train, val)
    for k in flat.state:
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(blocked.state[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )
    r_flat = [h["val_rmse"] for h in flat.fit_history]
    r_blk = [h["val_rmse"] for h in blocked.fit_history]
    np.testing.assert_allclose(r_flat, r_blk, rtol=1e-4)


def test_gaussian_engines_agree(small_splits):
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    base = dict(n_factors=5, sigma2=0.5, eta_theta2=0.4, eta_beta2=0.4, eta_bias2=0.7,
                max_iter=3, tol=None, verbose=False, dtype="float32", use_bias=True)
    flat = _fit(GaussianMF, GaussianMFConfig(engine="flat", **base), train, val)
    blocked = _fit(GaussianMF, GaussianMFConfig(engine="blocked_high", **base), train, val)
    for k in ("m_theta", "m_beta", "b_user", "b_item", "V_theta"):
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(blocked.state[k]),
            rtol=5e-3, atol=2e-5, err_msg=k,
        )


def test_gaussian_nobias_engines_agree(small_splits):
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    base = dict(n_factors=5, sigma2=0.5, eta_theta2=0.4, eta_beta2=0.4,
                max_iter=3, tol=None, verbose=False, dtype="float32", use_bias=False)
    flat = _fit(GaussianMF, GaussianMFConfig(engine="flat", **base), train, val)
    blocked = _fit(GaussianMF, GaussianMFConfig(engine="blocked_high", **base), train, val)
    for k in ("m_theta", "m_beta"):
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(blocked.state[k]),
            rtol=5e-3, atol=2e-5, err_msg=k,
        )


def test_fast_engine_converges_like_flat(small_splits):
    """blocked_fast's ~5e-3 statistic noise must not change where CAVI
    converges in any way that matters: final val RMSE within 5e-3."""
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1), (vu, vi, vx + 1)
    base = dict(n_factors=6, max_iter=10, tol=None, verbose=False, dtype="float32")
    flat = _fit(HPF, HPFConfig(engine="flat", **base), train, val)
    fast = _fit(HPF, HPFConfig(engine="blocked_fast", **base), train, val)
    r_flat = flat.fit_history[-1]["val_rmse"]
    r_fast = fast.fit_history[-1]["val_rmse"]
    assert abs(r_flat - r_fast) < 5e-3


def test_poisson_extended_engines_agree(small_splits):
    """The extended variant's blocked engine (two Pallas passes per block,
    Gauss-Seidel scalar refresh) matches the flat sweep, including the
    scalar phi/psi factors."""
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    base = dict(n_factors=6, a0=0.6, b0=1.1, max_iter=4, tol=None,
                verbose=False, dtype="float32", extended=True)
    flat = _fit(PoissonMF, PoissonMFConfig(engine="flat", **base),
                (tu, ti, tx), (vu, vi, vx))
    blocked = _fit(PoissonMF, PoissonMFConfig(engine="blocked_high", **base),
                   (tu, ti, tx), (vu, vi, vx))
    for k in flat.state:
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(blocked.state[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )
    r_flat = [h["val_rmse"] for h in flat.fit_history]
    r_blk = [h["val_rmse"] for h in blocked.fit_history]
    np.testing.assert_allclose(r_flat, r_blk, rtol=1e-4)


def test_poisson_engines_agree(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    base = dict(n_factors=6, max_iter=4, tol=None, verbose=False, dtype="float32")
    flat = _fit(PoissonMF, PoissonMFConfig(engine="flat", **base), (tu, ti, tx), (vu, vi, vx))
    blocked = _fit(
        PoissonMF, PoissonMFConfig(engine="blocked_high", **base), (tu, ti, tx), (vu, vi, vx)
    )
    for k in flat.state:
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(blocked.state[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )


def test_hpf_chunked_flat_matches_flat(small_splits):
    """engine='flat_chunked' (lax.scan over edge chunks, no (nnz, K)
    intermediates) matches the plain flat sweep exactly."""
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1), (vu, vi, vx + 1)
    base = dict(n_factors=6, max_iter=4, tol=None, verbose=False, dtype="float64")
    flat = _fit(HPF, HPFConfig(engine="flat", **base), train, val)
    chunked = _fit(HPF, HPFConfig(engine="flat_chunked", **base), train, val)
    for k in flat.state:
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(chunked.state[k]),
            rtol=1e-12, atol=0, err_msg=k,
        )
