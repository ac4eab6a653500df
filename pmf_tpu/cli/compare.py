"""Model comparison — the reference's flagship
`/root/reference/src/experiments/compare_models.py`: train all four
production models on the full splits with tuned configs, collect
train/val/test RMSE + macro-MAE + wall-clock, render the 3-panel bar
chart and the params artifact.

    python -m pmf_tpu.cli.compare [--synthetic N] [--hyperparams PATH]

Each model runs inside try/except so one failure doesn't kill the run
(`compare_models.py:448-478`).
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from pmf_tpu import config as cfg_io
from pmf_tpu.cli.common import setup_runtime, add_data_args, get_splits, print_header
from pmf_tpu.cli.run_single import DEFAULTS, run_model
from pmf_tpu.models import HPFConfig, HPFMapConfig, GaussianMFConfig, PoissonMFConfig

MODELS = [
    # (display name, run_single name, artifact key, config class)
    ("Gaussian MF (CAVI)", "gaussian_bias", cfg_io.GAUSSIAN_KEY, GaussianMFConfig),
    ("Poisson MF (CAVI)", "poisson", cfg_io.POISSON_KEY, PoissonMFConfig),
    ("HPF (CAVI)", "hpf_cavi", cfg_io.HPF_CAVI_KEY, HPFConfig),
    ("HPF (MAP)", "hpf_map", cfg_io.HPF_MAP_KEY, HPFMapConfig),
]


def _config_for(run_name, key, config_cls, hyperparams):
    raw = hyperparams.get(key)
    if raw:
        return config_cls(**cfg_io.filter_config_kwargs(config_cls, raw))
    import dataclasses

    return dataclasses.replace(DEFAULTS[run_name])


def plot_results(results_df: pd.DataFrame, path: str) -> None:
    """3-panel bar chart: RMSE, macro-MAE, training time
    (`compare_models.py:346-433`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, axes = plt.subplots(1, 3, figsize=(18, 6))
    x = np.arange(len(results_df))
    width = 0.25
    for k, split in enumerate(("train", "val", "test")):
        for ax, metric, title in (
            (axes[0], "rmse", "RMSE"),
            (axes[1], "macro_mae", "Macro-MAE"),
        ):
            vals = results_df[f"{split}_{metric}"]
            bars = ax.bar(x + (k - 1) * width, vals, width, label=split.capitalize())
            for b, v in zip(bars, vals):
                ax.text(b.get_x() + b.get_width() / 2, v, f"{v:.3f}",
                        ha="center", va="bottom", fontsize=7)
    for ax, title in ((axes[0], "RMSE"), (axes[1], "Macro-MAE")):
        ax.set_xticks(x)
        ax.set_xticklabels(results_df["model"], rotation=20, ha="right")
        ax.set_title(title)
        ax.legend()
        ax.grid(True, axis="y", alpha=0.3)
    bars = axes[2].bar(x, results_df["fit_seconds"], color="tab:gray")
    for b, v in zip(bars, results_df["fit_seconds"]):
        axes[2].text(b.get_x() + b.get_width() / 2, v, f"{v:.1f}s",
                     ha="center", va="bottom", fontsize=8)
    axes[2].set_xticks(x)
    axes[2].set_xticklabels(results_df["model"], rotation=20, ha="right")
    axes[2].set_title("Training time (s)")
    axes[2].grid(True, axis="y", alpha=0.3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    setup_runtime()
    parser = argparse.ArgumentParser(description="Compare all PMF models")
    parser.add_argument("--hyperparams", default="best_hyperparams.txt")
    parser.add_argument("--plot", default="model_comparison_plots.png")
    parser.add_argument("--params_out", default="model_comparison_params.txt")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--elbo", type=int, default=0, metavar="N",
                        help="record the ELBO every N iterations for the "
                             "CAVI models (0 = off)")
    parser.add_argument("--ranking", action="store_true",
                        help="also compute test recall@10 / NDCG@10 "
                             "(beyond the reference's metric set)")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="train every model over an N-device data mesh")
    add_data_args(parser)
    args = parser.parse_args(argv)
    mesh = None
    if args.mesh_devices:
        from pmf_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_devices)

    train_df, val_df, test_df = get_splits(args)
    hyperparams = cfg_io.load_best_hyperparams(args.hyperparams)
    if hyperparams:
        print(f"Loaded tuned configs from {args.hyperparams}: {sorted(hyperparams)}")
    else:
        print("No best_hyperparams.txt found; using defaults.")

    rows, configs_used = [], {}
    for display, run_name, key, config_cls in MODELS:
        print_header(display)
        config = _config_for(run_name, key, config_cls, hyperparams)
        config.verbose = args.verbose
        configs_used[display] = config
        try:
            res = run_model(run_name, train_df, val_df, test_df, config=config,
                            elbo_every=args.elbo,
                            verbose=args.verbose, mesh=mesh)
            model = res.pop("_model", None)
            res["model"] = display
            if args.ranking and model is not None:
                from pmf_tpu.eval.ranking import ranking_metrics

                theta, beta = model._point_estimates()
                r = ranking_metrics(
                    theta, beta,
                    train_df["u"].to_numpy(), train_df["i"].to_numpy(),
                    test_df["u"].to_numpy(), test_df["i"].to_numpy(),
                    ks=(10,),
                )
                res["test_recall@10"] = r["recall@10"]
                res["test_ndcg@10"] = r["ndcg@10"]
            rows.append(res)
            print(
                f"train/val/test RMSE: {res['train_rmse']:.3f} / "
                f"{res['val_rmse']:.3f} / {res['test_rmse']:.3f} | "
                f"time {res['fit_seconds']:.1f}s"
            )
        except Exception as e:
            print(f"{display} FAILED: {e}", flush=True)

    if not rows:
        print("No model succeeded.")
        return None
    results_df = pd.DataFrame(rows)
    plot_results(results_df, args.plot)
    with open(args.params_out, "w") as f:
        for display, config in configs_used.items():
            import dataclasses

            f.write(f"{display}: {dataclasses.asdict(config)!r}\n")
    print(f"\nWrote {args.plot} and {args.params_out}")
    print(results_df.drop(columns=[c for c in results_df.columns if c.startswith('_')])
          .to_string(index=False))
    return results_df


if __name__ == "__main__":
    main()
