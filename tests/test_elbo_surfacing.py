"""fit(elbo_every=) surfacing: history rows carry `elbo`, the Gaussian
monotone gate is active in the fit loop, and the CLI flag plumbs through
(VERDICT r3 Weak #5: the diagnostic existed but was invisible in runs)."""

import numpy as np
import pandas as pd
import pytest

from pmf_tpu.models import (
    HPF,
    HPFConfig,
    GaussianMF,
    GaussianMFConfig,
    PoissonMF,
    PoissonMFConfig,
)


def _df(u, i, x):
    return pd.DataFrame({"u": u, "i": i, "rating": x})


def test_gaussian_fit_records_monotone_elbo(small_ratings):
    u, i, x = small_ratings
    xc = x - x.mean()
    cfg = GaussianMFConfig(n_factors=4, max_iter=6, tol=None, verbose=False,
                           dtype="float64", engine="flat")
    m = GaussianMF(cfg).fit(_df(u, i, xc), elbo_every=1)
    elbos = [h["elbo"] for h in m.fit_history if "elbo" in h]
    assert len(elbos) == 6
    # The gate inside FitLoop would have raised on a decrease; check the
    # recorded trajectory is in fact non-decreasing (f64, exact ascent).
    assert all(b >= a - 1e-9 * abs(a) for a, b in zip(elbos, elbos[1:]))
    # And agrees with the on-demand method at the final state.
    assert np.isclose(elbos[-1], m.elbo(_df(u, i, xc)), rtol=1e-10)


def test_gaussian_monotone_gate_raises_on_decrease(small_ratings):
    u, i, x = small_ratings
    xc = x - x.mean()
    cfg = GaussianMFConfig(n_factors=4, max_iter=4, tol=None, verbose=False,
                           dtype="float64", engine="flat")
    model = GaussianMF(cfg)
    # Poison the objective: an elbo_fn that decreases must trip the gate.
    model._make_elbo_fn = lambda train: (
        lambda s, c=[0]: (c.__setitem__(0, c[0] + 1), -float(c[0]))[1]
    )
    with pytest.raises(RuntimeError, match="ELBO decreased"):
        model.fit(_df(u, i, xc), elbo_every=1)


def test_hpf_and_poisson_fit_record_elbo(small_ratings):
    u, i, x = small_ratings
    for model in (
        HPF(HPFConfig(n_factors=4, max_iter=4, tol=None, verbose=False,
                      dtype="float64", engine="flat")),
        PoissonMF(PoissonMFConfig(n_factors=4, max_iter=4, tol=None,
                                  verbose=False, dtype="float64",
                                  engine="flat")),
    ):
        m = model.fit(_df(u, i, x + 1.0), elbo_every=2)
        elbos = [h.get("elbo") for h in m.fit_history]
        # every 2nd iteration records (iterations 2 and 4)
        assert elbos[0] is None and elbos[1] is not None
        assert elbos[2] is None and elbos[3] is not None
        assert np.isfinite(elbos[1]) and elbos[3] >= elbos[1]


def test_run_single_elbo_flag():
    from pmf_tpu.cli.run_single import main

    res = main([
        "--model", "gaussian", "--synthetic", "800", "--synthetic_users",
        "80", "--synthetic_items", "50", "--max_iter", "3", "--elbo", "1",
    ])
    assert "final_elbo" in res and np.isfinite(res["final_elbo"])


def test_tp_fit_rejects_elbo_every(small_ratings):
    import jax

    from pmf_tpu.parallel import make_mesh

    u, i, x = small_ratings
    mesh = make_mesh(min(4, len(jax.devices())))
    cfg = HPFConfig(n_factors=4, max_iter=2, verbose=False)
    with pytest.raises(ValueError, match="elbo_every"):
        HPF(cfg).fit(_df(u, i, x + 1.0), mesh=mesh, state_sharding="rows",
                     elbo_every=1)
