"""Model-index -> recipe-id mapping.

The reference has two incompatible dict_i.csv schemas (a latent bug noted
in SURVEY.md §2b): the current preprocess writes columns (recipe_id, i)
(`/root/reference/src/data/load_data.py:59-63`), while
`/root/reference/src/utils/mapping.py:26` expects the legacy (i_new, i)
schema joined through PP_recipes.  This module standardizes on the
canonical (recipe_id, i) schema and keeps a compat reader for the legacy
one.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def get_recipe_id_map(data_dir: str = "data") -> np.ndarray | None:
    """Return array with ``id_map[i] = recipe_id`` for model item index i."""
    dict_i_path = os.path.join(data_dir, "processed", "dict_i.csv")
    if not os.path.exists(dict_i_path):
        print(f"Error: {dict_i_path} not found.")
        return None
    dict_df = pd.read_csv(dict_i_path)

    if {"recipe_id", "i"} <= set(dict_df.columns):
        # Canonical schema: recipe_id -> dense index i.
        dict_df = dict_df.sort_values("i")
        n_items = int(dict_df["i"].max()) + 1
        id_map = np.zeros(n_items, dtype=np.int64)
        id_map[dict_df["i"].to_numpy()] = dict_df["recipe_id"].to_numpy()
        return id_map

    if {"i_new", "i"} <= set(dict_df.columns):
        # Legacy schema: dense index i_new -> Kaggle PP index i -> recipe id
        # via PP_recipes.csv (the reference's original chain).
        pp_path = os.path.join(data_dir, "raw", "PP_recipes.csv")
        if not os.path.exists(pp_path):
            print(f"Error: {pp_path} not found.")
            return None
        pp_df = pd.read_csv(pp_path, usecols=["id", "i"])
        merged = dict_df.merge(pp_df, on="i", how="left").sort_values("i_new")
        merged["id"] = merged["id"].fillna(-1)
        n_items = int(merged["i_new"].max()) + 1
        id_map = np.zeros(n_items, dtype=np.int64)
        id_map[merged["i_new"].to_numpy()] = merged["id"].astype(np.int64).to_numpy()
        return id_map

    print("Error: dict_i.csv has neither (recipe_id, i) nor (i_new, i) columns")
    return None
