"""Best-K sweep: vmapped multi-seed path (BASELINE config #4)."""

import numpy as np
import pandas as pd

from pmf_tpu.cli import best_k


def _frames(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mk = lambda u, i, x: pd.DataFrame({"u": u, "i": i, "rating": x})
    return mk(tu, ti, tx), mk(vu, vi, vx)


def test_sweep_vmapped_seeds_shape(small_splits):
    train_df, val_df = _frames(small_splits)
    rows = best_k.sweep("hpf_cavi", train_df, val_df, ks=[2, 3],
                        max_iter=3, seeds=3)
    assert len(rows) == 2
    for r in rows:
        assert len(r["per_seed"]) == 3
        assert r["val_lpl"] == np.mean([m["val_lpl"] for m in r["per_seed"]])
        # Distinct seeds give distinct inits -> distinct finite metrics.
        lpls = [m["val_lpl"] for m in r["per_seed"]]
        assert np.isfinite(lpls).all()
        assert len(set(lpls)) > 1


def test_sweep_vmapped_matches_single_seed(small_splits):
    """Seed 0 of the vmapped gaussian sweep must match the sequential
    single-seed fit (same init, same iteration count, no early stop)."""
    train_df, val_df = _frames(small_splits)
    vrows = best_k.sweep("gaussian", train_df, val_df, ks=[3],
                         max_iter=4, seeds=2)
    from pmf_tpu.cli.common import center
    from pmf_tpu.models import GaussianMF, GaussianMFConfig

    train_c, val_c, mean = center(train_df, val_df)
    cfg = GaussianMFConfig(n_factors=3, sigma2=2.0, eta_theta2=0.05,
                           eta_beta2=0.05, max_iter=4, tol=None,
                           use_bias=False, verbose=False, random_state=0)
    m = GaussianMF(cfg).fit(train_c, val_c)
    seed0 = vrows[0]["per_seed"][0]
    vu = val_c["u"].to_numpy()
    vi = val_c["i"].to_numpy()
    vx = val_c["rating"].to_numpy()
    pred = m.predict(vu, vi)
    ref_rmse = float(np.sqrt(np.mean((vx - pred) ** 2)))
    assert abs(seed0["val_rmse"] - ref_rmse) < 1e-6


def test_best_k_cli_seeds(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rows, best = best_k.main([
        "--model", "hpf_cavi", "--k_min", "2", "--k_max", "4", "--k_step", "2",
        "--max_iter", "2", "--seeds", "2", "--synthetic", "600",
        "--synthetic_users", "60", "--synthetic_items", "40",
    ])
    assert len(rows) == 2 and {"per_seed"} <= set(rows[0])
    assert best["K"] in (2, 4)
