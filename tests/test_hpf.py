import numpy as np

from pmf_tpu.models.hpf import HPF, HPFConfig

from tests import oracles


def test_hpf_parity_vs_oracle(small_ratings):
    u, i, x = small_ratings
    x = x + 1.0  # the reference's +1 shift for HPF runs
    K, n_iter, seed = 6, 4, 13
    a, a_p, b_p, c, c_p, d_p = 0.3, 0.3, 1.0, 0.3, 0.3, 1.0

    ref = oracles.hpf_cavi(u, i, x, K, a, a_p, b_p, c, c_p, d_p, n_iter, seed)

    cfg = HPFConfig(
        n_factors=K, a=a, a_prime=a_p, b_prime=b_p, c=c, c_prime=c_p, d_prime=d_p,
        max_iter=n_iter, tol=None, random_state=seed, verbose=False, dtype="float64",
    )
    model = HPF(cfg).fit((u, i, x))

    for key in ("a_theta", "b_theta", "a_beta", "b_beta", "b_xi", "b_eta"):
        np.testing.assert_allclose(
            np.asarray(model.state[key]), ref[key], rtol=1e-8, atol=1e-10, err_msg=key
        )

    pred = model.predict(u[:40], i[:40])
    expect = np.sum(ref["E_theta"][u[:40]] * ref["E_beta"][i[:40]], axis=1)
    np.testing.assert_allclose(pred, expect, rtol=1e-8)


def test_hpf_converges(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    cfg = HPFConfig(n_factors=8, max_iter=15, tol=None, verbose=False)
    model = HPF(cfg).fit((tu, ti, tx + 1), (vu, vi, vx + 1))
    rmses = [h["val_rmse"] for h in model.fit_history]
    assert np.isfinite(rmses).all()
    assert rmses[-1] <= rmses[0]
    assert (model.predict(vu, vi) >= 0).all()


def test_fit_profile_dir_writes_trace(tmp_path, small_splits):
    """fit(profile_dir=...) captures a jax.profiler trace (SURVEY §5.1 —
    the reference only ever logged wall-clock)."""
    import os

    from pmf_tpu.models.hpf import HPF, HPFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    prof = str(tmp_path / "trace")
    HPF(HPFConfig(n_factors=4, max_iter=2, tol=None, verbose=False)).fit(
        (tu, ti, tx + 1), (vu, vi, vx + 1), profile_dir=prof)
    found = []
    for root, _, files in os.walk(prof):
        found += [f for f in files if f.endswith((".pb", ".json.gz", ".trace.json.gz", ".xplane.pb"))]
    assert found, f"no trace files under {prof}"


def test_fit_max_iter_zero_applies_no_sweep(small_splits):
    """max_iter=0 must leave the (fresh or resumed) state untouched —
    regression for the pipelined FitLoop's speculative first dispatch."""
    from pmf_tpu.models.hpf import HPF, HPFConfig, init_state

    (tu, ti, tx), _, _ = small_splits
    cfg = HPFConfig(n_factors=5, max_iter=0, tol=None, verbose=False,
                    engine="flat")
    m = HPF(cfg).fit((tu, ti, tx + 1))
    fresh = init_state(m.n_users, m.n_items, cfg)
    for key, val in fresh.items():
        np.testing.assert_array_equal(np.asarray(m.state[key]),
                                      np.asarray(val), err_msg=key)
    assert m.fit_history == []
