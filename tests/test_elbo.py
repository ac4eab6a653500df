"""ELBO diagnostics (pmf_tpu.eval.elbo).

The Gaussian mean-field ELBO is exact for the conjugate model (with the
biases as MAP coordinates, matching the reference's update structure), so
the full CAVI iteration is coordinate ascent on it — it MUST increase
monotonically.  This is a strong self-validating check: a bug in either
the ELBO or any coordinate update breaks the monotone staircase.

The Poisson/HPF bounds use the optimal per-edge allocations; the
implemented updates use mean-ratio allocations (the reference's flavor),
so their monotonicity is empirical — tested with a tolerance.
"""

import numpy as np
import pytest

from pmf_tpu.data.coo import build_ratings


def _elbo_trace(model_cls, cfg, train, n_iter, elbo_fn):
    model = model_cls(cfg)
    model.fit(train)  # sets dims; we re-run manually for the trace
    return model


def test_gaussian_elbo_monotone(small_ratings):
    import jax.numpy as jnp

    from pmf_tpu.eval.elbo import gaussian_elbo
    from pmf_tpu.models import gaussian_mf

    u, i, x = small_ratings
    xc = x - x.mean()
    cfg = gaussian_mf.GaussianMFConfig(
        n_factors=5, sigma2=0.7, eta_theta2=0.5, eta_beta2=0.5, eta_bias2=0.8,
        verbose=False, dtype="float64",
    )
    data = build_ratings(u, i, xc, dtype=np.float64)
    state = gaussian_mf.init_state(data.n_users, data.n_items, cfg)
    uj = jnp.asarray(u, jnp.int32)
    ij = jnp.asarray(i, jnp.int32)
    xj = jnp.asarray(xc, jnp.float64)

    def elbo(s):
        return float(gaussian_elbo(s, uj, ij, xj, cfg.sigma2, cfg.eta_theta2,
                                   cfg.eta_beta2, cfg.eta_bias2,
                                   use_bias=True, covariance="full"))

    trace = [elbo(state)]
    for _ in range(10):
        state = gaussian_mf.sweep(state, data, cfg.sigma2, cfg.eta_theta2,
                                  cfg.eta_beta2, cfg.eta_bias2, cfg.n_factors,
                                  True)
        trace.append(elbo(state))
    diffs = np.diff(trace)
    assert (diffs > -1e-8 * np.abs(trace[:-1])).all(), (
        f"Gaussian ELBO not monotone: {trace}"
    )
    assert trace[-1] > trace[0]


def test_gaussian_elbo_monotone_nobias_diag(small_ratings):
    import jax.numpy as jnp

    from pmf_tpu.eval.elbo import gaussian_elbo
    from pmf_tpu.models import gaussian_mf

    u, i, x = small_ratings
    xc = x - x.mean()
    cfg = gaussian_mf.GaussianMFConfig(
        n_factors=5, sigma2=0.7, eta_theta2=0.5, eta_beta2=0.5, verbose=False,
        dtype="float64", use_bias=False, covariance="diag",
    )
    data = build_ratings(u, i, xc, dtype=np.float64)
    state = gaussian_mf.init_state(data.n_users, data.n_items, cfg)
    uj, ij, xj = (jnp.asarray(u, jnp.int32), jnp.asarray(i, jnp.int32),
                  jnp.asarray(xc, jnp.float64))

    def elbo(s):
        return float(gaussian_elbo(s, uj, ij, xj, cfg.sigma2, cfg.eta_theta2,
                                   cfg.eta_beta2, cfg.eta_bias2,
                                   use_bias=False, covariance="diag"))

    trace = [elbo(state)]
    for _ in range(10):
        state = gaussian_mf.sweep(state, data, cfg.sigma2, cfg.eta_theta2,
                                  cfg.eta_beta2, cfg.eta_bias2, cfg.n_factors,
                                  False, "diag")
        trace.append(elbo(state))
    diffs = np.diff(trace)
    # Diag-mode uses Jacobi-style cross terms (simultaneous coordinate
    # moves), so allow a tiny tolerance; the trend must be upward.
    assert (diffs > -1e-6 * np.abs(np.asarray(trace[:-1]))).all(), trace
    assert trace[-1] > trace[0]


@pytest.mark.parametrize("extended", [False, True])
def test_poisson_elbo_increases(small_ratings, extended):
    from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

    u, i, x = small_ratings
    cfg = PoissonMFConfig(n_factors=5, a0=0.5, b0=1.0, max_iter=1, tol=None,
                          verbose=False, dtype="float64", extended=extended,
                          engine="flat")
    trace = []
    for n in (1, 3, 6, 10):
        m = PoissonMF(
            PoissonMFConfig(**{**cfg.__dict__, "max_iter": n})
        ).fit((u, i, x))
        trace.append(m.elbo((u, i, x)))
    assert np.isfinite(trace).all()
    diffs = np.diff(trace)
    assert (diffs > -1e-4 * np.abs(np.asarray(trace[:-1]))).all(), trace
    assert trace[-1] > trace[0]


def test_hpf_elbo_increases(small_ratings):
    from pmf_tpu.models.hpf import HPF, HPFConfig

    u, i, x = small_ratings
    xs = x + 1.0
    base = dict(n_factors=5, a=0.3, a_prime=1.2, b_prime=1.0, c=0.3,
                c_prime=1.2, d_prime=1.0, tol=None, verbose=False,
                dtype="float64", engine="flat")
    trace = []
    for n in (1, 3, 6, 10):
        m = HPF(HPFConfig(max_iter=n, **base)).fit((u, i, xs))
        trace.append(m.elbo((u, i, xs)))
    assert np.isfinite(trace).all()
    diffs = np.diff(trace)
    assert (diffs > -1e-4 * np.abs(np.asarray(trace[:-1]))).all(), trace
    assert trace[-1] > trace[0]
