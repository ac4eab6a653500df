"""Parity gates against the reference's OWN code, executed directly.

Round-1 parity was gated on re-derived NumPy oracles (tests/oracles.py),
written by the same builder — a shared misreading of the reference would
pass silently.  These tests put /root/reference on sys.path (read-only),
run the actual `src.models.*` implementations on tiny seeded frames, and
assert per-iteration variational-state agreement with pmf_tpu at float64.

Covered: gaussian_mf_cavi.py (plain), gaussian_mf_cavi_bias.py (biased),
poisson_mf_cavi.py, poisson_mf_extended_cavi.py, hpf_cavi.py.
(hpf_pytorch.py is a stochastic SGD path — covered by the behavioral
invariants in tests/test_hpf_map.py instead of bitwise parity.)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src", "models")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference model modules with /root/reference on sys.path."""
    sys.path.insert(0, REFERENCE)
    try:
        from src.models import (  # noqa: F401
            gaussian_mf_cavi,
            gaussian_mf_cavi_bias,
            hpf_cavi,
            poisson_mf_cavi,
            poisson_mf_extended_cavi,
        )

        yield {
            "gaussian": gaussian_mf_cavi,
            "gaussian_bias": gaussian_mf_cavi_bias,
            "poisson": poisson_mf_cavi,
            "poisson_ext": poisson_mf_extended_cavi,
            "hpf": hpf_cavi,
        }
    finally:
        sys.path.remove(REFERENCE)


@pytest.fixture(scope="module")
def tiny_df(small_ratings):
    import pandas as pd

    u, i, x = small_ratings
    return pd.DataFrame({"u": u, "i": i, "rating": x})


N_ITERS = (1, 3)  # stepwise parity: agreement after the 1st AND 3rd sweep


@pytest.mark.parametrize("n_iter", N_ITERS)
@pytest.mark.parametrize("use_bias", [False, True])
def test_gaussian_parity_vs_reference_code(ref_models, tiny_df, n_iter, use_bias):
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    mod = ref_models["gaussian_bias" if use_bias else "gaussian"]
    df = tiny_df.assign(rating=tiny_df["rating"] - tiny_df["rating"].mean())

    ref_cfg = mod.GaussianMFCAVIConfig(
        n_factors=5, sigma2=0.7, eta_theta2=0.4, eta_beta2=0.6,
        max_iter=n_iter, random_state=5, verbose=False,
    )
    if use_bias:
        ref_cfg.eta_bias2 = 0.9
    ref = mod.GaussianMFCAVI(ref_cfg)
    ref.fit(df)  # no val_df -> no early stop; exactly n_iter sweeps

    cfg = GaussianMFConfig(
        n_factors=5, sigma2=0.7, eta_theta2=0.4, eta_beta2=0.6, eta_bias2=0.9,
        max_iter=n_iter, tol=None, random_state=5, verbose=False,
        use_bias=use_bias, dtype="float64", engine="flat",
    )
    model = GaussianMF(cfg).fit(df)

    np.testing.assert_allclose(
        np.asarray(model.state["m_theta"]), ref.m_theta, rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(model.state["m_beta"]), ref.m_beta, rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(model.state["V_theta"]), ref.V_theta, rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(model.state["V_beta"]), ref.V_beta, rtol=1e-7, atol=1e-10
    )
    if use_bias:
        np.testing.assert_allclose(
            np.asarray(model.state["b_user"]), ref.m_user_bias, rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(model.state["b_item"]), ref.m_item_bias, rtol=1e-8, atol=1e-10
        )


@pytest.mark.parametrize("n_iter", N_ITERS)
def test_poisson_parity_vs_reference_code(ref_models, tiny_df, n_iter):
    from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

    mod = ref_models["poisson"]
    ref_cfg = mod.PoissonMFCAVIConfig(
        n_factors=4, a0=0.4, b0=0.8, max_iter=n_iter, tol=None,
        random_state=9, verbose=False,
    )
    ref = mod.PoissonMFCAVI(ref_cfg)
    ref.fit(tiny_df)

    cfg = PoissonMFConfig(
        n_factors=4, a0=0.4, b0=0.8, max_iter=n_iter, tol=None,
        random_state=9, verbose=False, dtype="float64", engine="flat",
    )
    model = PoissonMF(cfg).fit(tiny_df)

    for ours, theirs in (
        ("a_theta", ref.a_theta), ("b_theta", ref.b_theta),
        ("a_beta", ref.a_beta), ("b_beta", ref.b_beta),
    ):
        np.testing.assert_allclose(
            np.asarray(model.state[ours]), theirs, rtol=1e-8, atol=1e-10,
            err_msg=f"poisson {ours} diverges from reference after {n_iter} sweeps",
        )


@pytest.mark.parametrize("n_iter", N_ITERS)
def test_poisson_extended_parity_vs_reference_code(ref_models, tiny_df, n_iter):
    from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

    mod = ref_models["poisson_ext"]
    ref_cfg = mod.PoissonMFExtendedCAVIConfig(
        n_factors=4, a0=0.6, b0=1.1, max_iter=n_iter, tol=None,
        random_state=13, verbose=False,
    )
    ref = mod.PoissonMFExtendedCAVI(ref_cfg)
    ref.fit(tiny_df)

    cfg = PoissonMFConfig(
        n_factors=4, a0=0.6, b0=1.1, max_iter=n_iter, tol=None,
        random_state=13, verbose=False, extended=True, dtype="float64",
        engine="flat",
    )
    model = PoissonMF(cfg).fit(tiny_df)

    for ours, theirs in (
        ("a_theta", ref.a_theta), ("b_theta", ref.b_theta),
        ("a_beta", ref.a_beta), ("b_beta", ref.b_beta),
        ("a_phi", ref.a_phi), ("b_phi", ref.b_phi),
        ("a_psi", ref.a_psi), ("b_psi", ref.b_psi),
    ):
        np.testing.assert_allclose(
            np.asarray(model.state[ours]), theirs, rtol=1e-8, atol=1e-10,
            err_msg=f"extended-poisson {ours} diverges after {n_iter} sweeps",
        )


@pytest.mark.parametrize("n_iter", N_ITERS)
def test_hpf_parity_vs_reference_code(ref_models, tiny_df, n_iter):
    from pmf_tpu.models.hpf import HPF, HPFConfig

    mod = ref_models["hpf"]
    df = tiny_df.assign(rating=tiny_df["rating"] + 1.0)  # the runners' +1 shift

    ref_cfg = mod.HPF_CAVI_Config(
        n_factors=4, a=0.3, a_prime=1.5, b_prime=0.9, c=0.4, c_prime=1.2,
        d_prime=1.1, max_iter=n_iter, tol=None, random_state=21, verbose=False,
    )
    ref = mod.HPF_CAVI(ref_cfg)
    ref.fit(df)

    cfg = HPFConfig(
        n_factors=4, a=0.3, a_prime=1.5, b_prime=0.9, c=0.4, c_prime=1.2,
        d_prime=1.1, max_iter=n_iter, tol=None, random_state=21, verbose=False,
        dtype="float64", engine="flat",
    )
    model = HPF(cfg).fit(df)

    for ours, theirs in (
        ("a_theta", ref.gamma_a_theta), ("b_theta", ref.gamma_b_theta),
        ("a_beta", ref.gamma_a_beta), ("b_beta", ref.gamma_b_beta),
        ("b_xi", ref.gamma_b_xi), ("b_eta", ref.gamma_b_eta),
    ):
        np.testing.assert_allclose(
            np.asarray(model.state[ours]), theirs, rtol=1e-8, atol=1e-10,
            err_msg=f"hpf {ours} diverges from reference after {n_iter} sweeps",
        )

    # Prediction parity too (reference predict clamps out-of-range to 0,
    # `hpf_cavi.py:215-230`).
    up = np.array([0, 2, 7, 10_000])
    ip = np.array([1, 3, 0, 0])
    ref_pred = ref.predict(up, ip)
    np.testing.assert_allclose(model.predict(up, ip), ref_pred, rtol=1e-8, atol=1e-10)


def test_preprocess_parity_vs_reference_code(tmp_path, monkeypatch, ref_models):
    """Run the reference's OWN preprocess_data (src/data/load_data.py:9-90,
    relative-path based) and pmf_tpu's on identical synthetic raw Kaggle
    files; assert the five output artifacts match row for row (same
    filters, same per-user seed-42 shuffle, same leave-out split, same
    dense id maps).  `ref_models` keeps /root/reference importable."""
    import pandas as pd

    from pmf_tpu.data import pipeline

    rng = np.random.default_rng(6)
    n_rows = 4000
    frames = {}
    for k, split in enumerate(("train", "validation", "test")):
        n = n_rows // (1 + k)
        frames[split] = pd.DataFrame({
            "user_id": rng.integers(100, 400, n) * 7,  # sparse raw ids
            "recipe_id": rng.integers(1000, 1300, n) * 3,
            "rating": rng.integers(0, 6, n).astype(float),
            "date": "2020-01-01",  # extra raw column, ignored via usecols
        })

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    for d in (ref_dir, our_dir):
        (d / "data" / "raw").mkdir(parents=True)
        (d / "data" / "processed").mkdir(parents=True)
        for split, df in frames.items():
            df.to_csv(d / "data" / "raw" / f"interactions_{split}.csv",
                      index=False)

    monkeypatch.chdir(ref_dir)
    from src.data import load_data as ref_load_data

    # The reference was written against pandas < 3, whose groupby.apply
    # passed each group INCLUDING the grouping column (pandas 3 removed
    # include_groups=True).  Shim exactly that legacy semantics — group
    # frames in sorted key order with all columns — so the reference's own
    # shuffle/split logic executes unmodified.
    from pandas.core.groupby.generic import DataFrameGroupBy

    def legacy_apply(self, func, *args, **kwargs):
        pieces = [func(g, *args, **kwargs) for _, g in self]
        return pd.concat(pieces)

    monkeypatch.setattr(DataFrameGroupBy, "apply", legacy_apply)
    ref_load_data.preprocess_data()
    monkeypatch.undo()  # also reverts the chdir; re-applied below
    monkeypatch.chdir(our_dir)
    pipeline.preprocess_data(raw_dir="data/raw", processed_dir="data/processed")

    for name in ("interactions_train.csv", "interactions_validation.csv",
                 "interactions_test.csv", "dict_i.csv", "dict_u.csv"):
        got = pd.read_csv(our_dir / "data" / "processed" / name)
        want = pd.read_csv(ref_dir / "data" / "processed" / name)
        assert len(got) == len(want), name
        for col in want.columns:
            assert col in got.columns, f"{name}: missing column {col}"
            np.testing.assert_array_equal(
                got[col].to_numpy(), want[col].to_numpy(),
                err_msg=f"{name}:{col}",
            )
