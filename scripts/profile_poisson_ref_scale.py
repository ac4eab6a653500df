"""Where do the Poisson parity leg's 6.1 seconds go? (VERDICT r4 #7)

PARITY_r04's training-time table has poisson at 1.1x the reference (6.1 s
vs 6.8 s) while its warm iterations run ~15x faster — the wall is fixed
cost.  This script reproduces the leg standalone at the Food.com parity
shape (25,076 x 178,265, ~780k train edges, tuned-config-like early stop
after a handful of iterations) and times every phase:

  * data build (host COO -> device arrays),
  * blocked-layout build (the auto-resolved engine at this nnz),
  * first sweep (compile-cache executable load + upload through the
    tunnel),
  * warm per-iteration sweep + eval,
  * the same fit with engine="flat" (zero layout build) for the
    crossover check, and with the layout disk cache warm.

Usage: python scripts/profile_poisson_ref_scale.py [--nnz 780000]
Writes reports/poisson_ref_scale_profile.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pmf_tpu.utils.platform import setup_cache  # noqa: E402


def time_fit(cfg_kwargs, train, val, test, tag, results, layout_cache=None):
    import jax

    from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

    env_before = os.environ.get("PMF_TPU_LAYOUT_CACHE")
    if layout_cache is not None:
        os.environ["PMF_TPU_LAYOUT_CACHE"] = layout_cache
    try:
        cfg = PoissonMFConfig(verbose=False, **cfg_kwargs)
        model = PoissonMF(cfg)
        t0 = time.perf_counter()
        model.fit(train, val)
        fit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        rmse = model.evaluate_rmse(test)
        eval_s = time.perf_counter() - t0
        hist = model.fit_history
        iter_secs = [h["iter_seconds"] for h in hist if "iter_seconds" in h]
        rec = {
            "tag": tag,
            "engine": model.engine_used,
            "fit_seconds": round(fit_s, 3),
            "n_iterations": len(hist),
            "iter_seconds": [round(s, 4) for s in iter_secs],
            "sum_iter_seconds": round(sum(iter_secs), 3),
            "fixed_seconds": round(fit_s - sum(iter_secs), 3),
            "test_eval_seconds": round(eval_s, 3),
            "test_rmse": round(float(rmse), 4),
        }
        results.append(rec)
        print(f"# {tag}: fit {fit_s:.2f}s = {sum(iter_secs):.2f}s iters "
              f"({len(hist)}) + {rec['fixed_seconds']:.2f}s fixed; "
              f"engine {model.engine_used}", flush=True)
        del model
    finally:
        if layout_cache is not None:
            if env_before is None:
                os.environ.pop("PMF_TPU_LAYOUT_CACHE", None)
            else:
                os.environ["PMF_TPU_LAYOUT_CACHE"] = env_before


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_users", type=int, default=25_076)
    ap.add_argument("--n_items", type=int, default=178_265)
    ap.add_argument("--nnz", type=int, default=780_000)
    ap.add_argument("--max_iter", type=int, default=100)
    ap.add_argument("--tol", type=float, default=0.01,
                    help="tol that early-stops after ~6 iterations like "
                         "the tuned parity config")
    ap.add_argument("--out", default="reports/poisson_ref_scale_profile.json")
    args = ap.parse_args(argv)

    setup_cache()
    from pmf_tpu.data.synthetic import synth_splits

    t0 = time.perf_counter()
    train, val, test = synth_splits(args.n_users, args.n_items, args.nnz,
                                    seed=5)
    train = (train[0], train[1], np.abs(train[2]))
    val = (val[0], val[1], np.abs(val[2]))
    test = (test[0], test[1], np.abs(test[2]))
    gen_s = time.perf_counter() - t0

    results = []
    base = dict(n_factors=20, a0=0.3, b0=1.0, max_iter=args.max_iter,
                tol=args.tol)
    cache_dir = "reports/cache/layouts_profile"
    # Cold auto (includes first-process compile-cache loads).
    time_fit(dict(base, engine="auto"), train, val, test,
             "auto_cold_process", results)
    # Warm repeat in the same process (executables live).
    time_fit(dict(base, engine="auto"), train, val, test,
             "auto_warm_process", results)
    # Flat engine (no layout build).
    time_fit(dict(base, engine="flat"), train, val, test, "flat", results)
    time_fit(dict(base, engine="flat"), train, val, test, "flat_warm",
             results)
    # Layout disk cache: miss then hit.
    time_fit(dict(base, engine="auto"), train, val, test,
             "auto_layout_cache_miss", results, layout_cache=cache_dir)
    time_fit(dict(base, engine="auto"), train, val, test,
             "auto_layout_cache_hit", results, layout_cache=cache_dir)

    report = {"scale": {"n_users": args.n_users, "n_items": args.n_items,
                        "nnz": args.nnz, "gen_seconds": round(gen_s, 1)},
              "runs": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
