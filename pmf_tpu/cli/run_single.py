"""Single-model experiment runners — the reference's run_* scripts
(`/root/reference/src/experiments/run_gaussian_mf.py`,
`run_gaussian_mf_improved.py`, `run_poisson_mf.py`,
`run_poisson_mf_extended.py`, `run_hpf_cavi.py`, `run_hpf_pytorch.py`)
consolidated behind one entry point:

    python -m pmf_tpu.cli.run_single --model {gaussian,gaussian_bias,
        poisson,poisson_extended,hpf_cavi,hpf_map} [--synthetic N]

Per-model preprocessing matches the reference runners: Gaussian variants
train on centered ratings; Poisson variants validate non-negativity;
HPF-CAVI applies the +1 rating shift and unshifts for metrics
(`run_hpf_cavi.py:13-16,42-50`).
"""

from __future__ import annotations

import argparse

import numpy as np

from pmf_tpu.cli.common import setup_runtime, Timer, add_data_args, center, get_splits, print_header, shift
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

# Default configs mirror the reference runners (e.g. run_gaussian_mf.py:16-25).
DEFAULTS = {
    "gaussian": GaussianMFConfig(
        n_factors=20, sigma2=2.0, eta_theta2=0.05, eta_beta2=0.05,
        max_iter=100, tol=1e-3, use_bias=False,
    ),
    "gaussian_bias": GaussianMFConfig(
        n_factors=20, sigma2=0.5, eta_theta2=0.1, eta_beta2=0.01, eta_bias2=0.01,
        max_iter=100, tol=1e-8, use_bias=True,
    ),
    "poisson": PoissonMFConfig(n_factors=20, a0=0.3, b0=1.0, max_iter=100, tol=1e-4),
    "poisson_extended": PoissonMFConfig(
        n_factors=20, a0=0.6, b0=1.0, max_iter=100, tol=1e-4, extended=True
    ),
    "hpf_cavi": HPFConfig(
        n_factors=20, a=0.3, a_prime=1.0, b_prime=1.0, c=0.3, c_prime=1.0,
        d_prime=1.0, max_iter=100,
    ),
    "hpf_map": HPFMapConfig(
        n_factors=20, a=0.3, a_prime=1.0, b_prime=1.0, c=0.3, c_prime=1.0,
        d_prime=1.0, lr=1e-3, batch_size=4096, epochs=20,
    ),
}


def run_model(model_name: str, train_df, val_df, test_df, config=None, verbose=True,
              profile_dir=None, mesh=None, elbo_every: int = 0):
    """Train one model with its reference preprocessing; return metrics.

    ``profile_dir``: capture the whole fit as a jax.profiler trace
    (TensorBoard-viewable).  ``mesh``: run the fit multi-chip.
    ``elbo_every=N``: CAVI families record their ELBO in fit_history every
    N iterations (and the Gaussian gate asserts monotone ascent); the
    final ELBO lands in the result dict.  Ignored for hpf_map (an MAP
    path has no variational objective)."""
    import dataclasses as _dc

    # Never mutate the shared DEFAULTS instances (ADVICE r1).
    config = _dc.replace(config or DEFAULTS[model_name], verbose=verbose)
    results = {"model": model_name}

    if model_name.startswith("gaussian"):
        train_c, val_c, test_c, mean = center(train_df, val_df, test_df)
        model = GaussianMF(config)
        with Timer() as t:
            model.fit(train_c, val_c, global_mean=mean,
                      profile_dir=profile_dir, mesh=mesh,
                      elbo_every=elbo_every)
        for split, df in (("train", train_c), ("val", val_c), ("test", test_c)):
            results[f"{split}_rmse"] = model.evaluate_rmse(df, global_mean=mean)
            results[f"{split}_macro_mae"] = model.evaluate_macro_mae(df, global_mean=mean)
    elif model_name.startswith("poisson"):
        assert (train_df["rating"] >= 0).all(), "Poisson models need non-negative ratings"
        model = PoissonMF(config)
        with Timer() as t:
            model.fit(train_df, val_df, profile_dir=profile_dir, mesh=mesh,
                      elbo_every=elbo_every)
        for split, df in (("train", train_df), ("val", val_df), ("test", test_df)):
            results[f"{split}_rmse"] = model.evaluate_rmse(df)
            results[f"{split}_macro_mae"] = model.evaluate_macro_mae(df)
    elif model_name in ("hpf_cavi", "hpf_map"):
        # +1 shift to keep rates positive; unshift for original-scale metrics.
        tr, va, te = shift(train_df, 1), shift(val_df, 1), shift(test_df, 1)
        model = (HPF if model_name == "hpf_cavi" else HPFMap)(config)
        with Timer() as t:
            if model_name == "hpf_cavi":
                model.fit(tr, va, profile_dir=profile_dir, mesh=mesh,
                          elbo_every=elbo_every)
            else:
                model.fit(tr, va, profile_dir=profile_dir, mesh=mesh)
        for split, df0, df1 in (("train", train_df, tr), ("val", val_df, va), ("test", test_df, te)):
            preds = model.predict(df1["u"].to_numpy(), df1["i"].to_numpy()) - 1.0
            y = df0["rating"].to_numpy()
            results[f"{split}_rmse"] = rmse(y, preds)
            results[f"{split}_macro_mae"] = macro_mae(y, preds)
    else:
        raise ValueError(f"unknown model {model_name}")

    results["fit_seconds"] = t.seconds
    if elbo_every and model.fit_history:
        elbos = [h["elbo"] for h in model.fit_history if "elbo" in h]
        if elbos:
            results["final_elbo"] = elbos[-1]
    results["_model"] = model
    return results


def main(argv=None):
    setup_runtime()
    parser = argparse.ArgumentParser(description="Run a single PMF model")
    parser.add_argument("--model", required=True, choices=sorted(DEFAULTS))
    parser.add_argument("--max_iter", type=int, help="override config max_iter/epochs")
    parser.add_argument("--n_factors", type=int, help="override latent dimension")
    parser.add_argument("--profile_dir", help="write a jax.profiler trace here")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="train over an N-device data mesh (0 = single device)")
    parser.add_argument("--engine",
                        help="sweep engine override for CAVI models "
                             "(flat, flat_chunked, blocked_high, blocked_mid, "
                             "blocked_fast, auto)")
    parser.add_argument("--bias_update", choices=["exact", "lagged"],
                        help="Gaussian bias-block mode (lagged: bias stats "
                             "ride the factor passes; same fixed point)")
    parser.add_argument("--elbo", type=int, default=0, metavar="N",
                        help="record the ELBO every N iterations in "
                             "fit_history (CAVI models; 0 = off)")
    add_data_args(parser)
    args = parser.parse_args(argv)

    import dataclasses

    config = dataclasses.replace(DEFAULTS[args.model])
    if args.n_factors:
        config.n_factors = args.n_factors
    if args.max_iter:
        if hasattr(config, "max_iter"):
            config.max_iter = args.max_iter
        else:
            config.epochs = args.max_iter
    if args.engine and hasattr(config, "engine"):
        config.engine = args.engine
    if args.bias_update and hasattr(config, "bias_update"):
        config.bias_update = args.bias_update

    train_df, val_df, test_df = get_splits(args)
    print_header(f"run_single: {args.model}")
    mesh = None
    if args.mesh_devices:
        from pmf_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_devices)
    res = run_model(args.model, train_df, val_df, test_df, config=config,
                    profile_dir=args.profile_dir, mesh=mesh,
                    elbo_every=args.elbo)
    for split in ("train", "val", "test"):
        print(
            f"{split:>5} RMSE {res[f'{split}_rmse']:.4f} | "
            f"macro-MAE {res[f'{split}_macro_mae']:.4f}"
        )
    print(f"fit time: {res['fit_seconds']:.1f}s")
    if "final_elbo" in res:
        print(f"final ELBO: {res['final_elbo']:.6g}")
    return res


if __name__ == "__main__":
    main()
