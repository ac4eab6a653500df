"""Multi-device correctness: sharded CAVI sweeps must match single-device
results exactly (up to float noise) on an 8-fake-device CPU mesh."""

import jax
import numpy as np
import pytest

from pmf_tpu.data.coo import build_ratings
from pmf_tpu.models import gaussian_mf, hpf, poisson_mf
from pmf_tpu.parallel import make_mesh, replicate, shard_ratings


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 fake CPU devices"
    return make_mesh(8)


def _data_and_sharded(small_ratings, mesh):
    u, i, x = small_ratings
    data = build_ratings(u, i, x, dtype=np.float64)
    return data, shard_ratings(data, mesh)


def test_hpf_sweep_sharded_matches(small_ratings, mesh):
    data, data_sh = _data_and_sharded(small_ratings, mesh)
    cfg = hpf.HPFConfig(n_factors=6, dtype="float64", verbose=False)
    state = hpf.init_state(data.n_users, data.n_items, cfg)
    state_sh = replicate(state, mesh)
    args = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    for _ in range(3):
        state = hpf.sweep(state, data, *args)
        state_sh = hpf.sweep(state_sh, data_sh, *args)
    for k in state:
        np.testing.assert_allclose(
            np.asarray(state[k]), np.asarray(state_sh[k]), rtol=1e-12, err_msg=k
        )


def test_gaussian_sweep_sharded_matches(small_ratings, mesh):
    u, i, x = small_ratings
    xc = x - x.mean()
    data = build_ratings(u, i, xc, dtype=np.float64)
    data_sh = shard_ratings(data, mesh)
    cfg = gaussian_mf.GaussianMFConfig(n_factors=6, dtype="float64", verbose=False)
    state = gaussian_mf.init_state(data.n_users, data.n_items, cfg)
    state_sh = replicate(state, mesh)
    args = (cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2, cfg.n_factors, True)
    for _ in range(3):
        state = gaussian_mf.sweep(state, data, *args)
        state_sh = gaussian_mf.sweep(state_sh, data_sh, *args)
    for k in ("m_theta", "m_beta", "b_user", "b_item"):
        np.testing.assert_allclose(
            np.asarray(state[k]), np.asarray(state_sh[k]), rtol=1e-10, err_msg=k
        )


def test_row_sharded_state_matches(small_ratings, mesh):
    """Factor rows sharded over the mesh (model-parallel axis) + edges
    sharded: sweep must still match single-device results."""
    from pmf_tpu.parallel import shard_state_rows

    u, i, x = small_ratings
    # Row counts divisible by 8 so rows actually shard.
    data = build_ratings(u, i, x, n_users=128, n_items=88, dtype=np.float64)
    data_sh = shard_ratings(data, mesh)
    cfg = hpf.HPFConfig(n_factors=6, dtype="float64", verbose=False)
    state = hpf.init_state(128, 88, cfg)
    state_sh = shard_state_rows(state, mesh)
    args = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    for _ in range(2):
        state = hpf.sweep(state, data, *args)
        state_sh = hpf.sweep(state_sh, data_sh, *args)
    for k in state:
        np.testing.assert_allclose(
            np.asarray(state[k]), np.asarray(state_sh[k]), rtol=1e-12, err_msg=k
        )


def test_sweep_no_nans_under_debug(small_ratings):
    """jax_debug_nans sanity: one sweep of each CAVI family must be
    NaN-free (the race/NaN-detection hook of SURVEY §5.2)."""
    import jax

    u, i, x = small_ratings
    data = build_ratings(u, i, x + 1.0, dtype=np.float64)
    jax.config.update("jax_debug_nans", True)
    try:
        cfg = hpf.HPFConfig(n_factors=4, dtype="float64", verbose=False)
        state = hpf.init_state(data.n_users, data.n_items, cfg)
        hpf.sweep(state, data, cfg.a, cfg.a_prime, cfg.b_prime, cfg.c,
                  cfg.c_prime, cfg.d_prime)
        pcfg = poisson_mf.PoissonMFConfig(n_factors=4, dtype="float64", verbose=False)
        pstate = poisson_mf.init_state(data.n_users, data.n_items, pcfg)
        poisson_mf.sweep(pstate, data, pcfg.a0, pcfg.b0, False)
    finally:
        jax.config.update("jax_debug_nans", False)


def test_poisson_sweep_sharded_matches(small_ratings, mesh):
    data, data_sh = _data_and_sharded(small_ratings, mesh)
    cfg = poisson_mf.PoissonMFConfig(n_factors=6, dtype="float64", verbose=False)
    state = poisson_mf.init_state(data.n_users, data.n_items, cfg)
    state_sh = replicate(state, mesh)
    for _ in range(3):
        state = poisson_mf.sweep(state, data, cfg.a0, cfg.b0, False)
        state_sh = poisson_mf.sweep(state_sh, data_sh, cfg.a0, cfg.b0, False)
    for k in state:
        np.testing.assert_allclose(
            np.asarray(state[k]), np.asarray(state_sh[k]), rtol=1e-12, err_msg=k
        )
