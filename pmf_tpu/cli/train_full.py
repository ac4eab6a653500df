"""Full-data training + artifact export — the reference's
train_{gaussian,poisson,hpf_cavi,hpf_pytorch}_full.py and the
train_all_models.py driver consolidated:

    python -m pmf_tpu.cli.train_full --model {gaussian,poisson,hpf_cavi,
        hpf_map,all} --dataset_mode {train,train+val,full}

Per model: train on the selected split union with tuned config, export
  data/embeddings/<model>/{user,item}_embeddings.csv  (item rows carry a
  recipe_id column when the id map is available,
  `train_gaussian_full.py:71-101`),
  data/embeddings/<model>/config.txt,
  data/predictions/<model>/test_predictions.csv  (u,i,y_true,y_pred).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np
import pandas as pd

from pmf_tpu import config as cfg_io
from pmf_tpu.cli.common import setup_runtime, Timer, add_data_args, get_splits, print_header, shift
from pmf_tpu.cli.run_single import DEFAULTS
from pmf_tpu.eval.metrics import macro_mae, rmse
from pmf_tpu.models import (
    HPF,
    HPFConfig,
    HPFMap,
    HPFMapConfig,
    GaussianMF,
    GaussianMFConfig,
    PoissonMF,
    PoissonMFConfig,
)
from pmf_tpu.utils.mapping import get_recipe_id_map

# (artifact dir, run_single default key, artifact key, config class)
SPECS = {
    "gaussian": ("gaussian_mf", "gaussian_bias", cfg_io.GAUSSIAN_KEY, GaussianMFConfig),
    "poisson": ("poisson_mf", "poisson", cfg_io.POISSON_KEY, PoissonMFConfig),
    "hpf_cavi": ("hpf_cavi", "hpf_cavi", cfg_io.HPF_CAVI_KEY, HPFConfig),
    "hpf_map": ("hpf_pytorch", "hpf_map", cfg_io.HPF_MAP_KEY, HPFMapConfig),
}


def _select_union(train_df, val_df, test_df, mode: str) -> pd.DataFrame:
    if mode == "train":
        return train_df[["u", "i", "rating"]]
    if mode == "train+val":
        return pd.concat([train_df, val_df])[["u", "i", "rating"]]
    if mode == "full":
        return pd.concat([train_df, val_df, test_df])[["u", "i", "rating"]]
    raise ValueError(f"Invalid dataset_mode: {mode}")


def _export(model_dir_name, user_emb, item_emb, config, extra_cfg, test_df, predict_fn, data_dir="data", map_data_dir=None):
    out_dir = os.path.join(data_dir, "embeddings", model_dir_name)
    os.makedirs(out_dir, exist_ok=True)
    pd.DataFrame(np.asarray(user_emb)).to_csv(
        os.path.join(out_dir, "user_embeddings.csv"), index=False
    )
    item_df = pd.DataFrame(np.asarray(item_emb))
    id_map = get_recipe_id_map(map_data_dir or data_dir)
    if id_map is not None and len(id_map) >= len(item_df):
        item_df.insert(0, "recipe_id", id_map[: len(item_df)])
    item_df.to_csv(os.path.join(out_dir, "item_embeddings.csv"), index=False)
    with open(os.path.join(out_dir, "config.txt"), "w") as f:
        f.write(str(dataclasses.asdict(config)))
        for k, v in extra_cfg.items():
            f.write(f"\n{k}: {v}")

    pred_dir = os.path.join(data_dir, "predictions", model_dir_name)
    os.makedirs(pred_dir, exist_ok=True)
    tu, ti = test_df["u"].to_numpy(), test_df["i"].to_numpy()
    y_true = test_df["rating"].to_numpy()
    y_pred = predict_fn(tu, ti)
    pd.DataFrame({"u": tu, "i": ti, "y_true": y_true, "y_pred": y_pred}).to_csv(
        os.path.join(pred_dir, "test_predictions.csv"), index=False
    )
    print(
        f"Test metrics: RMSE={rmse(y_true, y_pred):.4f} "
        f"MacroMAE={macro_mae(y_true, y_pred):.4f}"
    )
    print(f"Exported embeddings -> {out_dir}, predictions -> {pred_dir}")


def train_one(model_name, train_df, val_df, test_df, dataset_mode, hyperparams,
              data_dir="data", verbose=True, mesh=None, map_data_dir=None):
    dir_name, default_key, artifact_key, config_cls = SPECS[model_name]
    raw = hyperparams.get(artifact_key)
    config = (
        config_cls(**cfg_io.filter_config_kwargs(config_cls, raw))
        if raw
        else dataclasses.replace(DEFAULTS[default_key])
    )
    config.verbose = verbose
    df = _select_union(train_df, val_df, test_df, dataset_mode)
    print_header(f"train_full: {model_name} | mode={dataset_mode} | {len(df)} ratings")

    if model_name == "gaussian":
        mean = float(df["rating"].mean())
        dfc = df.copy()
        dfc["rating"] -= mean
        model = GaussianMF(config)
        with Timer() as t:
            model.fit(dfc, global_mean=mean, mesh=mesh)
        user_emb, item_emb = model.state["m_theta"], model.state["m_beta"]
        predict_fn = lambda u, i: model.predict(u, i, global_mean=mean)
        extra = {"global_mean": mean}
    elif model_name == "poisson":
        model = PoissonMF(config)
        with Timer() as t:
            model.fit(df, mesh=mesh)
        user_emb, item_emb = model._point_estimates()
        predict_fn = model.predict
        extra = {}
    elif model_name == "hpf_cavi":
        model = HPF(config)
        with Timer() as t:
            model.fit(shift(df, 1), mesh=mesh)
        user_emb, item_emb = model._point_estimates()
        predict_fn = lambda u, i: model.predict(u, i) - 1.0
        extra = {"rating_shift": 1}
    else:  # hpf_map
        model = HPFMap(config)
        with Timer() as t:
            model.fit(shift(df, 1), mesh=mesh)
        user_emb, item_emb = model._point_estimates()
        predict_fn = lambda u, i: model.predict(u, i) - 1.0
        extra = {"rating_shift": 1}

    print(f"Training finished in {t.seconds:.1f}s")
    _export(dir_name, user_emb, item_emb, config, extra, test_df, predict_fn,
            data_dir, map_data_dir)
    return model


def main(argv=None):
    setup_runtime()
    parser = argparse.ArgumentParser(description="Full training + artifact export")
    parser.add_argument("--model", default="all", choices=["all", *SPECS])
    parser.add_argument("--dataset_mode", default="train",
                        choices=["train", "train+val", "full"])
    parser.add_argument("--hyperparams", default="best_hyperparams.txt")
    parser.add_argument("--data_dir", default="data")
    parser.add_argument("--map_data_dir", default=None,
                        help="directory whose processed/dict_i.csv provides the "
                        "recipe-id map when exports go elsewhere (default: "
                        "--data_dir)")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="train over an N-device data mesh (0 = single device)")
    add_data_args(parser)
    args = parser.parse_args(argv)

    train_df, val_df, test_df = get_splits(args)
    hyperparams = cfg_io.load_best_hyperparams(args.hyperparams)
    mesh = None
    if args.mesh_devices:
        from pmf_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_devices)
    names = list(SPECS) if args.model == "all" else [args.model]
    for name in names:
        try:
            train_one(name, train_df, val_df, test_df, args.dataset_mode,
                      hyperparams, data_dir=args.data_dir, verbose=args.verbose,
                      mesh=mesh, map_data_dir=args.map_data_dir)
        except Exception as e:
            print(f"{name} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
