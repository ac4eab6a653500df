"""Shared CLI plumbing: data access with a synthetic fallback, timing, and
artifact paths.

The reference experiments assume data/processed exists
(`/root/reference/src/data/load_data.py:93-105`).  Here every entry point
also accepts ``--synthetic N`` to run on generated data (the Kaggle
dataset is not redistributable), which keeps the whole experiment surface
executable anywhere, TPU included.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import pandas as pd

from pmf_tpu.data.pipeline import load_all_splits
from pmf_tpu.data.synthetic import synth_splits


def setup_runtime() -> None:
    """Per-invocation runtime setup shared by every CLI entry point.

    Enables the persistent XLA compilation cache
    (`pmf_tpu.utils.platform.setup_cache`) so repeated CLI invocations —
    the reference workflow is tune -> compare -> train as SEPARATE
    processes (`/root/reference/src/experiments/*.py`) — pay each model's
    compile once per machine instead of once per process.  At the
    reference's own Food.com scale, compile time is a large share of
    wall-clock (PARITY_r03: Poisson 0.8x vs CPU), so this is a
    match-or-beat lever, not a convenience."""
    import os

    from pmf_tpu.utils.platform import setup_cache

    # Honor an explicit JAX_PLATFORMS=cpu even on hosts whose site hooks
    # pre-register an accelerator plugin and merge platform lists (this
    # environment's axon tunnel) — otherwise `JAX_PLATFORMS=cpu python -m
    # pmf_tpu.cli...` can still try (and block on) the accelerator.
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    setup_cache()
    # Layout disk cache (pmf_tpu.data.layout_cache): blocked/TP layouts
    # are pure functions of (data, geometry), so the tune -> compare ->
    # train sequence reloads instead of rebuilding (~27 s single-chip /
    # minutes TP at 25M edges).  Same default root as the compile cache;
    # PMF_TPU_LAYOUT_CACHE= (empty) disables.
    if "PMF_TPU_LAYOUT_CACHE" not in os.environ:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_root = os.environ.get(
            "PMF_TPU_CACHE_DIR", os.path.join(repo_root, ".jax_cache"))
        os.environ["PMF_TPU_LAYOUT_CACHE"] = os.path.join(
            cache_root, "layouts")


def add_data_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--processed_dir", default="data/processed", help="processed CSV directory"
    )
    parser.add_argument(
        "--synthetic",
        type=int,
        default=0,
        metavar="N",
        help="use synthetic data with N ratings instead of data/processed",
    )
    parser.add_argument("--synthetic_users", type=int, default=2000)
    parser.add_argument("--synthetic_items", type=int, default=800)
    parser.add_argument("--seed", type=int, default=0, help="synthetic data seed")


def get_splits(args):
    """Return (train_df, val_df, test_df) as u/i/rating DataFrames."""
    if args.synthetic:
        (tu, ti, tx), (vu, vi, vx), (su, si, sx) = synth_splits(
            args.synthetic_users, args.synthetic_items, args.synthetic, seed=args.seed
        )
        mk = lambda u, i, x: pd.DataFrame({"u": u, "i": i, "rating": x})
        return mk(tu, ti, tx), mk(vu, vi, vx), mk(su, si, sx)
    return load_all_splits(args.processed_dir)


def center(train_df, *others):
    """Center by the train mean; returns (centered frames..., mean)."""
    mean = float(train_df["rating"].mean())
    out = []
    for df in (train_df, *others):
        c = df.copy()
        c["rating"] = c["rating"] - mean
        out.append(c)
    return (*out, mean)


def shift(df, delta: float):
    c = df.copy()
    c["rating"] = c["rating"] + delta
    return c


class Timer:
    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.seconds = time.time() - self.t0


def print_header(title: str) -> None:
    print(f"\n=== {title} ===", flush=True)
