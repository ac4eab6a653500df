"""Preprocessing parity: the vectorized filter/shuffle/split must be
byte-identical to the reference's pandas groupby-sample formulation."""

import os

import numpy as np
import pandas as pd
import pytest

from pmf_tpu.data.pipeline import (
    load_all_splits,
    load_all_splits_centered,
    preprocess_data,
)
from pmf_tpu.utils.mapping import get_recipe_id_map


def _fake_raw(tmp_path, n_rows=3000, seed=0):
    """Synthesize Kaggle-shaped raw interaction CSVs."""
    rng = np.random.default_rng(seed)
    raw_dir = tmp_path / "data" / "raw"
    os.makedirs(raw_dir, exist_ok=True)
    user_ids = rng.integers(1000, 1150, size=n_rows)
    recipe_ids = rng.integers(50000, 50120, size=n_rows)
    ratings = rng.integers(0, 6, size=n_rows)
    df = pd.DataFrame({"user_id": user_ids, "recipe_id": recipe_ids, "rating": ratings})
    df = df.drop_duplicates(["user_id", "recipe_id"]).reset_index(drop=True)
    bounds = [0, len(df) // 3, 2 * len(df) // 3, len(df)]
    for k, name in enumerate(("train", "validation", "test")):
        df.iloc[bounds[k] : bounds[k + 1]].to_csv(
            raw_dir / f"interactions_{name}.csv", index=False
        )
    return str(raw_dir)


def _reference_preprocess(raw_dir):
    """The reference's own pandas formulation (oracle), following
    `/root/reference/src/data/load_data.py:9-90` step by step."""
    frames = [
        pd.read_csv(os.path.join(raw_dir, f"interactions_{s}.csv"),
                    usecols=["user_id", "recipe_id", "rating"])
        for s in ("train", "validation", "test")
    ]
    df = pd.concat(frames, ignore_index=True)
    item_keep = df.value_counts("recipe_id").reset_index(name="n").query("n >= 10")[["recipe_id"]]
    df = df.merge(item_keep, on="recipe_id", how="inner")
    user_keep = df.value_counts("user_id").reset_index(name="n").query("n >= 5")[["user_id"]]
    df = df.merge(user_keep, on="user_id", how="inner")
    # The reference's groupby-apply (its pandas version kept group keys);
    # explicit iteration has identical semantics on modern pandas.
    parts = [
        g.sample(frac=1, random_state=42).assign(idx=range(len(g)))
        for _, g in df.groupby("user_id")
    ]
    df = pd.concat(parts).reset_index(drop=True)
    df["total"] = df.groupby("user_id")["user_id"].transform("size")
    df["split"] = np.where(
        df["total"] - (df["idx"] + 1) == 0, "3.test",
        np.where(df["total"] - (df["idx"] + 1) <= 2, "2.val", "1.train"),
    )
    dict_i = (df[["recipe_id"]].drop_duplicates().sort_values("recipe_id")
              .reset_index(drop=True).assign(i=lambda t: t.index))
    dict_u = (df[["user_id"]].drop_duplicates().sort_values("user_id")
              .reset_index(drop=True).assign(u=lambda t: t.index))
    df = df.drop(columns=["idx", "total"]).merge(dict_i, on="recipe_id").merge(dict_u, on="user_id")
    return {
        "train": df.query('split == "1.train"'),
        "validation": df.query('split == "2.val"'),
        "test": df.query('split == "3.test"'),
    }


def test_preprocess_matches_reference_formulation(tmp_path):
    raw_dir = _fake_raw(tmp_path)
    processed_dir = str(tmp_path / "data" / "processed")
    preprocess_data(raw_dir, processed_dir)
    oracle = _reference_preprocess(raw_dir)

    for name in ("train", "validation", "test"):
        got = pd.read_csv(os.path.join(processed_dir, f"interactions_{name}.csv"))
        want = oracle[name]
        assert len(got) == len(want), name
        # Same (u, i, rating) multiset in the same per-user order.
        g = got[["u", "i", "rating"]].reset_index(drop=True)
        w = want[["u", "i", "rating"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g.astype(np.int64), w.astype(np.int64), check_names=False
        )


def test_load_and_center(tmp_path, monkeypatch):
    raw_dir = _fake_raw(tmp_path)
    processed_dir = str(tmp_path / "data" / "processed")
    preprocess_data(raw_dir, processed_dir)

    train, val, test = load_all_splits(processed_dir)
    assert set(train.columns) == {"u", "i", "rating"}
    tc, vc, sc, mean = load_all_splits_centered(processed_dir)
    assert abs(tc["rating"].mean()) < 1e-9
    assert abs((vc["rating"] + mean).mean() - val["rating"].mean()) < 1e-9

    # Every user contributes exactly 1 test and 2 val rows.
    assert (test.groupby("u").size() == 1).all()
    assert (val.groupby("u").size() == 2).all()


def test_legacy_preprocessing(tmp_path):
    """The superseded 80/10/10 path: id mapping via Kaggle maps, recipe
    filter, shuffled row split."""
    import numpy as np

    from pmf_tpu.data.pipeline import legacy_generate_processed_data

    rng = np.random.default_rng(3)
    raw_dir = tmp_path / "data" / "raw"
    os.makedirs(raw_dir, exist_ok=True)
    n = 4000
    user_ids = rng.integers(1000, 1080, n)
    recipe_ids = rng.integers(50000, 50060, n)
    pd.DataFrame({
        "user_id": user_ids, "recipe_id": recipe_ids,
        "date": "2020-01-01", "rating": rng.integers(0, 6, n),
    }).to_csv(raw_dir / "RAW_interactions.csv", index=False)
    uniq_r = np.unique(recipe_ids)
    pd.DataFrame({"id": uniq_r, "i": np.arange(len(uniq_r))}).to_csv(
        raw_dir / "PP_recipes.csv", index=False)
    uniq_u = np.unique(user_ids)
    for s in ("train", "test", "validation"):
        pd.DataFrame({"user_id": uniq_u, "u": np.arange(len(uniq_u)),
                      "recipe_id": uniq_r[: len(uniq_u)] if len(uniq_u) <= len(uniq_r)
                      else uniq_r[0], "rating": 5}).to_csv(
            raw_dir / f"interactions_{s}.csv", index=False)

    processed = tmp_path / "data" / "legacy"
    parts = legacy_generate_processed_data(str(raw_dir), str(processed))
    total = sum(len(p) for p in parts.values())
    assert os.path.exists(processed / "interactions_processed.csv")
    assert abs(len(parts["train"]) - 0.8 * total) <= 1
    assert set(parts["train"].columns) >= {"user_id", "recipe_id", "rating", "u", "i"}


def test_recipe_id_map_canonical_schema(tmp_path):
    raw_dir = _fake_raw(tmp_path)
    processed_dir = str(tmp_path / "data" / "processed")
    preprocess_data(raw_dir, processed_dir)
    id_map = get_recipe_id_map(str(tmp_path / "data"))
    dict_i = pd.read_csv(os.path.join(processed_dir, "dict_i.csv"))
    assert id_map is not None
    assert len(id_map) == len(dict_i)
    for _, row in dict_i.head(20).iterrows():
        assert id_map[int(row["i"])] == int(row["recipe_id"])


def test_unzip_files(tmp_path):
    """D2 (`src/unzip_data.py:8-20`): every *.zip in raw_dir extracts in
    place; non-zip files are left alone."""
    import zipfile

    from pmf_tpu.data.pipeline import unzip_files

    raw = tmp_path / "raw"
    raw.mkdir()
    with zipfile.ZipFile(raw / "a.zip", "w") as zf:
        zf.writestr("interactions_train.csv", "user_id,recipe_id,rating\n")
    with zipfile.ZipFile(raw / "b.zip", "w") as zf:
        zf.writestr("PP_recipes.csv", "id,i\n")
    (raw / "notes.txt").write_text("not a zip")

    unzip_files(str(raw))

    assert (raw / "interactions_train.csv").read_text().startswith("user_id")
    assert (raw / "PP_recipes.csv").exists()
    assert (raw / "notes.txt").read_text() == "not a zip"


def test_download_dataset_invokes_kaggle_cli(tmp_path, monkeypatch):
    """D1 (`src/download_data.py:20-44`): shells out to the kaggle CLI
    with the reference's dataset slug, creating raw_dir first."""
    import subprocess as sp

    from pmf_tpu.data import pipeline

    calls = []
    monkeypatch.setattr(sp, "run", lambda cmd, check: calls.append((cmd, check)))
    raw = tmp_path / "raw" / "nested"
    pipeline.download_dataset(str(raw))
    assert raw.is_dir()
    (cmd, check), = calls
    assert check is True
    assert cmd[:4] == ["kaggle", "datasets", "download", "-d"]
    assert cmd[4] == pipeline.DATASET and cmd[-1] == str(raw)
