"""Best-K sweeps — the reference's run_{gaussian_mf,poisson_mf,hpf}_best_k
scripts (`/root/reference/src/experiments/run_gaussian_mf_best_k.py` etc.):
sweep the latent dimension, pick argmax of the log predictive likelihood
on validation, and plot RMSE-vs-K and LPL-vs-K curves.

    python -m pmf_tpu.cli.best_k --model {gaussian,poisson,hpf_cavi} \
        --k_min 2 --k_max 60 --k_step 2 [--synthetic N]

Matching the reference quirk noted in SURVEY.md §2c: the HPF sweep does
NOT apply the +1 rating shift (`run_hpf_best_k.py:15-54`).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

from pmf_tpu.cli.common import setup_runtime, Timer, add_data_args, center, get_splits, print_header
from pmf_tpu.eval.metrics import (
    gaussian_log_predictive_likelihood,
    poisson_log_predictive_likelihood,
)
from pmf_tpu.models import HPF, HPFConfig, GaussianMF, GaussianMFConfig, PoissonMF, PoissonMFConfig

FIG_DIR = os.path.join("reports", "figures")


def _plot(ks, values, ylabel, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(ks, values, marker="o")
    ax.set_xlabel("K (latent factors)")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def _seed_metrics(model_name, cfg, stacked, n_seeds, val_df, n_users, n_items,
                  mean=0.0):
    """Per-seed val RMSE / LPL from a vmapped multi-seed state stack."""
    vu = val_df["u"].to_numpy()
    vi = val_df["i"].to_numpy()
    vx = val_df["rating"].to_numpy()
    valid = (vu < n_users) & (vi < n_items)
    out = []
    for s in range(n_seeds):
        if model_name == "gaussian":
            theta = np.asarray(stacked["m_theta"][s])
            beta = np.asarray(stacked["m_beta"][s])
            pred = np.zeros(len(vu))
            pred[valid] = np.sum(theta[vu[valid]] * beta[vi[valid]], axis=1)
            rmse_s = float(np.sqrt(np.mean((vx - pred) ** 2)))
            lpl = gaussian_log_predictive_likelihood(
                vx[valid], pred[valid], np.sqrt(cfg.sigma2))
        else:  # poisson / hpf_cavi: Gamma-mean rates
            theta = np.asarray(stacked["a_theta"][s] / stacked["b_theta"][s])
            beta = np.asarray(stacked["a_beta"][s] / stacked["b_beta"][s])
            lam = np.zeros(len(vu))
            lam[valid] = np.sum(theta[vu[valid]] * beta[vi[valid]], axis=1)
            rmse_s = float(np.sqrt(np.mean((vx - lam) ** 2)))
            lpl = poisson_log_predictive_likelihood(vx[valid], lam[valid])
        out.append({"seed": s, "val_rmse": rmse_s, "val_lpl": float(lpl)})
    return out


def sweep(model_name, train_df, val_df, ks, max_iter=30, verbose=False,
          seeds: int = 1):
    """``seeds > 1``: per K, fit all seeds SIMULTANEOUSLY in one vmapped
    program (`pmf_tpu.tune.multi_seed`) — BASELINE config #4's "best-K
    sweep vmapped across seeds" (the reference loops one unseeded fit per
    K, `run_gaussian_mf_best_k.py:27-71`).  Selection uses the MEAN val
    LPL across seeds; per-seed numbers ride in each row."""
    from pmf_tpu.tune.multi_seed import multi_seed_fit

    rows = []
    for K in ks:
        if seeds > 1:
            if model_name == "gaussian":
                train_c, val_c, mean = center(train_df, val_df)
                cfg = GaussianMFConfig(
                    n_factors=K, sigma2=2.0, eta_theta2=0.05, eta_beta2=0.05,
                    max_iter=max_iter, tol=1e-3, use_bias=False, verbose=verbose)
                tr, va = train_c, val_c
            elif model_name == "poisson":
                cfg = PoissonMFConfig(n_factors=K, max_iter=max_iter, tol=1e-4,
                                      verbose=verbose)
                tr, va = train_df, val_df
            else:  # hpf_cavi — reference quirk: no +1 shift in best-K
                cfg = HPFConfig(n_factors=K, max_iter=max_iter, tol=1e-4,
                                verbose=verbose)
                tr, va = train_df, val_df
            stacked, _ = multi_seed_fit(cfg, tr, va, seeds=tuple(range(seeds)),
                                        n_iter=max_iter)
            n_users = int(tr["u"].max()) + 1
            n_items = int(tr["i"].max()) + 1
            per_seed = _seed_metrics(model_name, cfg, stacked, seeds, va,
                                     n_users, n_items)
            row = {
                "K": K,
                "val_rmse": float(np.mean([m["val_rmse"] for m in per_seed])),
                "val_lpl": float(np.mean([m["val_lpl"] for m in per_seed])),
                "per_seed": per_seed,
            }
            rows.append(row)
            print(f"K={K}: mean val RMSE {row['val_rmse']:.4f} | mean val LPL "
                  f"{row['val_lpl']:.1f} (over {seeds} vmapped seeds)",
                  flush=True)
            continue
        if model_name == "gaussian":
            train_c, val_c, mean = center(train_df, val_df)
            cfg = GaussianMFConfig(
                n_factors=K, sigma2=2.0, eta_theta2=0.05, eta_beta2=0.05,
                max_iter=max_iter, tol=1e-3, use_bias=False, verbose=verbose,
            )
            m = GaussianMF(cfg).fit(train_c, val_c, global_mean=mean)
            val_rmse = m.evaluate_rmse(val_c, global_mean=mean)
            preds_state = m.state
            theta = np.asarray(preds_state["m_theta"])
            beta = np.asarray(preds_state["m_beta"])
            mask = (val_c["u"] < m.n_users) & (val_c["i"] < m.n_items)
            vv = val_c[mask]
            lpl = gaussian_log_predictive_likelihood(
                vv["rating"].to_numpy(),
                np.sum(theta[vv["u"]] * beta[vv["i"]], axis=1),
                np.sqrt(cfg.sigma2),
            )
        elif model_name == "poisson":
            cfg = PoissonMFConfig(n_factors=K, max_iter=max_iter, tol=1e-4, verbose=verbose)
            m = PoissonMF(cfg).fit(train_df, val_df)
            val_rmse = m.evaluate_rmse(val_df)
            lam = m.predict(val_df["u"].to_numpy(), val_df["i"].to_numpy())
            lpl = poisson_log_predictive_likelihood(val_df["rating"].to_numpy(), lam)
        elif model_name == "hpf_cavi":
            # Reference quirk preserved: no +1 shift in the best-K sweep.
            cfg = HPFConfig(n_factors=K, max_iter=max_iter, tol=1e-4, verbose=verbose)
            m = HPF(cfg).fit(train_df, val_df)
            val_rmse = m.evaluate_rmse(val_df)
            lam = m.predict(val_df["u"].to_numpy(), val_df["i"].to_numpy())
            lpl = poisson_log_predictive_likelihood(val_df["rating"].to_numpy(), lam)
        else:
            raise ValueError(model_name)
        rows.append({"K": K, "val_rmse": val_rmse, "val_lpl": lpl})
        print(f"K={K}: val RMSE {val_rmse:.4f} | val LPL {lpl:.1f}", flush=True)
    return rows


def main(argv=None):
    setup_runtime()
    parser = argparse.ArgumentParser(description="Best-K sweep")
    parser.add_argument("--model", required=True, choices=["gaussian", "poisson", "hpf_cavi"])
    parser.add_argument("--k_min", type=int, default=2)
    parser.add_argument("--k_max", type=int, default=60)
    parser.add_argument("--k_step", type=int, default=2)
    parser.add_argument("--max_iter", type=int, default=30)
    parser.add_argument("--seeds", type=int, default=1,
                        help="fit N seeds per K in one vmapped program and "
                             "select by mean val LPL")
    add_data_args(parser)
    args = parser.parse_args(argv)

    train_df, val_df, _ = get_splits(args)
    ks = list(range(args.k_min, args.k_max + 1, args.k_step))
    print_header(f"best-K sweep: {args.model}, K in {ks[0]}..{ks[-1]}"
                 + (f", {args.seeds} vmapped seeds/K" if args.seeds > 1 else ""))
    rows = sweep(args.model, train_df, val_df, ks, max_iter=args.max_iter,
                 seeds=args.seeds)

    best = max(rows, key=lambda r: r["val_lpl"])
    print(f"\nBest K by val LPL: {best['K']} (LPL {best['val_lpl']:.1f})")

    prefix = {"gaussian": "GF", "poisson": "PF", "hpf_cavi": "HPF"}[args.model]
    _plot([r["K"] for r in rows], [r["val_rmse"] for r in rows],
          "Validation RMSE", os.path.join(FIG_DIR, f"{prefix}_RMSE.png"))
    _plot([r["K"] for r in rows], [r["val_lpl"] for r in rows],
          "Validation log predictive likelihood", os.path.join(FIG_DIR, f"{prefix}_LPL.png"))
    print(f"Plots written to {FIG_DIR}/{prefix}_RMSE.png, {prefix}_LPL.png")
    return rows, best


if __name__ == "__main__":
    main()
