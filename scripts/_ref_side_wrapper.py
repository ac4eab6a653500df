"""Reference-side stage runner for the reference-scale parity pipeline.

Runs the reference's OWN code (`/root/reference/src/...`, imported
read-only — the same fixture style as tests/test_parity_reference.py)
inside a working directory, one stage per invocation:

    python scripts/_ref_side_wrapper.py --workdir DIR --stage preprocess
    python scripts/_ref_side_wrapper.py --workdir DIR --stage tune --n_trials 2 --seed 7
    python scripts/_ref_side_wrapper.py --workdir DIR --stage compare
    python scripts/_ref_side_wrapper.py --workdir DIR --stage train

All reference paths are cwd-relative ("data/processed",
"best_hyperparams.txt", `load_data.py:7`, `tune_all_models.py:311`), so
each stage chdirs into --workdir first.  The compare stage captures the
fitted models (subclass shim around each model class — zero behavioral
change, `fit` is inherited verbatim) so their point estimates can be
exported for the cross-framework NDCG table, and writes
``ref_compare.json`` + ``ref_factors_<model>.npz``.

The reference tuner never seeds `random` (SURVEY.md §2c X11); --seed
seeds the global RNG so the tuned configs are reproducible.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REFERENCE = "/root/reference"


def stage_preprocess():
    os.makedirs("data/processed", exist_ok=True)
    # The reference was written against pandas < 3, whose groupby.apply
    # passed each group INCLUDING the grouping column (pandas 3 removed
    # include_groups=True).  Shim exactly that legacy semantics (same shim
    # as tests/test_parity_reference.py) so load_data.py:42-46 executes
    # unmodified.
    import pandas as pd
    from pandas.core.groupby.generic import DataFrameGroupBy

    def legacy_apply(self, func, *args, **kwargs):
        pieces = [func(g, *args, **kwargs) for _, g in self]
        return pd.concat(pieces)

    DataFrameGroupBy.apply = legacy_apply

    from src.data.load_data import preprocess_data

    preprocess_data()
    print("reference preprocess_data done")


def stage_tune(n_trials: int, seed: int):
    import random

    random.seed(seed)
    sys.argv = ["tune_all_models", "--n_trials", str(n_trials)]
    from src.experiments.tune_all_models import main

    main()


def _export_factors(name: str, payload: dict):
    import numpy as np

    np.savez(f"ref_factors_{name}.npz", **payload)


def stage_compare():
    """The body of `compare_models.main()` (compare_models.py:435-486)
    executed with model-capture shims, results collected to JSON."""
    import numpy as np
    import src.experiments.compare_models as cm
    from src.data.load_data import load_all_splits

    train_df, val_df, test_df = load_all_splits()
    hyperparams = cm.load_best_hyperparams("best_hyperparams.txt")

    captured = {}

    def capture(cls, key):
        class Cap(cls):
            def fit(self, *a, **k):
                out = super().fit(*a, **k)
                captured[key] = self
                return out

        Cap.__name__ = cls.__name__
        return Cap

    cm.GaussianMFCAVI = capture(cm.GaussianMFCAVI, "gaussian")
    cm.PoissonMFCAVI = capture(cm.PoissonMFCAVI, "poisson")
    cm.HPF_CAVI = capture(cm.HPF_CAVI, "hpf_cavi")
    # torch path: fit lives in the caller; capture at construction.
    _TorchCls = cm.HPF_PyTorch

    class CapTorch(_TorchCls):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            captured["hpf_map"] = self

    cm.HPF_PyTorch = CapTorch

    results = []
    results.append(
        cm.run_gaussian_mf(train_df, val_df, test_df,
                           config_dict=hyperparams.get("GaussianMF"))
    )
    results.append(
        cm.run_poisson_mf(train_df, val_df, test_df,
                          config_dict=hyperparams.get("PoissonMF"))
    )
    results.append(
        cm.run_hpf_cavi(train_df, val_df, test_df,
                        config_dict=hyperparams.get("HPF_CAVI"))
    )
    results.append(
        cm.run_hpf_pytorch(train_df, val_df, test_df,
                           config_dict=hyperparams.get("HPF_PyTorch"))
    )

    import pandas as pd

    cm.plot_results(pd.DataFrame(results))

    # Point estimates for the unified ranking-metric computation.
    g = captured["gaussian"]
    _export_factors("gaussian_bias",
                    dict(theta=g.m_theta, beta=g.m_beta,
                         b_user=g.m_user_bias, b_item=g.m_item_bias))
    p = captured["poisson"]
    _export_factors("poisson", dict(theta=p.E_theta, beta=p.E_beta))
    h = captured["hpf_cavi"]
    _export_factors("hpf_cavi", dict(theta=h.E_theta, beta=h.E_beta))
    t = captured["hpf_map"]
    _export_factors("hpf_map", dict(theta=t.theta.detach().numpy(),
                                    beta=t.beta.detach().numpy()))

    with open("ref_compare.json", "w") as f:
        json.dump(results, f, indent=1)
    print("reference compare done ->", os.path.abspath("ref_compare.json"))


def stage_train(dataset_mode: str):
    from src.experiments.train_gaussian_full import train_full_gaussian
    from src.experiments.train_hpf_cavi_full import train_full_hpf_cavi
    from src.experiments.train_hpf_pytorch_full import train_full_hpf_pytorch
    from src.experiments.train_poisson_full import train_full_poisson

    for fn in (train_full_gaussian, train_full_poisson, train_full_hpf_cavi,
               train_full_hpf_pytorch):
        fn(dataset_mode=dataset_mode)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--stage", required=True,
                    choices=["preprocess", "tune", "compare", "train"])
    ap.add_argument("--n_trials", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--dataset_mode", default="train")
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE)
    os.chdir(args.workdir)

    if args.stage == "preprocess":
        stage_preprocess()
    elif args.stage == "tune":
        stage_tune(args.n_trials, args.seed)
    elif args.stage == "compare":
        stage_compare()
    elif args.stage == "train":
        stage_train(args.dataset_mode)


if __name__ == "__main__":
    main()
