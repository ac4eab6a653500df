"""Converged ML-25M-scale run: quality AND throughput in ONE artifact.

BASELINE.json's driver metric is "Rating-updates/sec/chip + epochs-to-
target test RMSE", and the north star demands reference-parity test
RMSE/NDCG on MovieLens-25M-scale ratings at >= 100M updates/s.  The
bench (`bench.py`) measures throughput on a few timed iterations; the
parity pipeline (`scripts/parity_pipeline.py`) proves quality at
Food.com scale.  This script closes the conjunction (VERDICT r3 Missing
#1): one CONVERGED fit per model at 162k users x 59k items x 25M
ratings, early-stopped on validation RMSE with the production engine,
reporting together

  * the per-iteration validation-RMSE trajectory,
  * iterations and wall-clock to the converged plateau ("epochs to
    target": first iteration within 0.5% of the plateau RMSE),
  * final test RMSE / macro-MAE / recall@10 / NDCG@10 (ranking metrics
    via the exact no-sort evaluator, `pmf_tpu/eval/ranking.py`),
  * SUSTAINED updates/s over the whole fit (every iteration, validation
    evals included — not a warmed 3-iteration window), and the
    layout-build / compile / fit wall-clock breakdown.

Data: `synth_planted` (`pmf_tpu/data/synthetic.py`) — Zipf-sampled
pairs with ratings from a planted bias+low-rank model rounded to 0-5
stars, so test RMSE has a generative floor to converge TOWARD (i.i.d.
synthetic ratings would make "converged quality" meaningless), with the
reference's per-user leave-out split flavor
(`/root/reference/src/data/load_data.py:53-56`).  A bias-only baseline
(train mean + user/item offsets) is reported so the factor models'
lift over the trivial predictor is visible.

Usage:  python scripts/converged_ml25m.py [--nnz 25000000]
        [--models hpf_cavi,gaussian_bias] [--out reports/converged]

Writes <out>/CONVERGED_r04.json and CONVERGED_r04.md; bench.py embeds
the JSON summary as detail.converged_ml25m.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# --cpu (smoke tests): must force the platform BEFORE any jax use — this
# environment's sitecustomize registers the axon TPU plugin in every
# process and the env var alone does not stop client creation.
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pmf_tpu.data.synthetic import leave_out_split, synth_planted
from pmf_tpu.eval.ranking import ranking_metrics, sampled_ranking_metrics
from pmf_tpu.utils.platform import setup_cache

# Edge-visit convention per iteration (bench.py): HPF touches every
# rating in the theta and beta blocks; Gaussian-with-biases in four
# (exact) or two ring passes' worth of blocks under lagged biases —
# the convention stays 4 block participations either way, with the
# strict factor-only (2/edge) rate always reported alongside.  Plain
# Poisson runs 2 edge passes/iter; extended runs 4 (theta/beta factor
# passes + the phi/psi Gauss-Seidel scalar passes, as bench.py counts).
VISITS_PER_EDGE = {"hpf_cavi": 2, "gaussian_bias": 4, "gaussian_bias_fast": 4,
                   "hpf_map": 1, "hpf_map_blocked": 1,
                   "poisson": 2, "poisson_extended": 4}


def bias_only_baseline(train, test):
    """Test RMSE of mean + user-offset + item-offset (one ALS-style pass),
    the trivial predictor a factor model must beat."""
    tu, ti, tx = train
    su, si, sx = test
    mean = tx.mean()
    r = tx - mean
    bu = np.bincount(tu, weights=r) / np.maximum(np.bincount(tu), 1)
    r2 = r - bu[tu]
    bi = np.bincount(ti, weights=r2, minlength=int(ti.max()) + 1) / np.maximum(
        np.bincount(ti, minlength=int(ti.max()) + 1), 1
    )
    bu_s = np.where(su < len(bu), bu[su], 0.0)
    bi_s = np.where(si < len(bi), bi[si], 0.0)
    pred = np.clip(mean + bu_s + bi_s, 0.0, 5.0)
    return float(np.sqrt(np.mean((sx - pred) ** 2)))


def epochs_to_target(history, key="val_rmse", band=0.005):
    """First iteration/epoch whose val RMSE is within ``band`` of the
    plateau (min) RMSE, plus cumulative fit seconds up to and including
    it.  CAVI fits record iteration/iter_seconds; the SGD MAP path
    records epoch/epoch_seconds."""
    vals = [h[key] for h in history if key in h]
    if not vals:
        return None
    plateau = min(vals)
    target = plateau * (1.0 + band)
    secs = 0.0
    for h in history:
        secs += h.get("iter_seconds") or h.get("epoch_seconds") or 0.0
        if h.get(key) is not None and h[key] <= target:
            return {
                "plateau_val_rmse": plateau,
                "target_val_rmse": target,
                "iterations_to_target": h.get("iteration", h.get("epoch")),
                "seconds_to_target": round(secs, 2),
            }
    return None


def fit_one(name, splits, max_iter, K, verbose):
    """Train one model family with its reference preprocessing (+1 shift
    for HPF, train-mean centering for Gaussian — `cli/run_single.py`);
    returns the result record."""
    (tu, ti, tx), (vu, vi, vx), (su, si, sx) = splits
    rec = {"model": name, "n_factors": K}

    t0 = time.perf_counter()
    if name == "hpf_cavi":
        from pmf_tpu.models.hpf import HPF, HPFConfig

        # tol 1e-5 (vs the CLI default 1e-4): HPF plateaus within a few
        # iterations on this data; the tighter tolerance runs the fit to a
        # genuine flat plateau so the sustained-rate average is not
        # dominated by the first (warmup) iteration.
        cfg = HPFConfig(n_factors=K, a=0.3, a_prime=1.0, b_prime=1.0, c=0.3,
                        c_prime=1.0, d_prime=1.0, max_iter=max_iter, tol=1e-5,
                        verbose=verbose)
        model = HPF(cfg)
        model.fit((tu, ti, tx + 1.0), (vu, vi, vx + 1.0))
        rec["config"] = dataclasses.asdict(cfg)
        predict = lambda uu, ii: model.predict(uu, ii) - 1.0
        theta, beta = (np.asarray(a) for a in model._point_estimates())
    elif name in ("gaussian_bias", "gaussian_bias_fast"):
        from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

        mean = float(tx.mean())
        # The _fast variant is the headline throughput configuration
        # (blocked_mid bf16-part planes + lagged biases, 615M 4-block
        # updates/s at this scale) run to convergence — demonstrating the
        # fast path reaches the same quality plateau as the exact default.
        fast = name.endswith("_fast")
        cfg = GaussianMFConfig(n_factors=K, sigma2=0.5, eta_theta2=0.1,
                               eta_beta2=0.01, eta_bias2=0.01,
                               max_iter=max_iter, tol=1e-6, use_bias=True,
                               engine="blocked_mid" if fast else "auto",
                               bias_update="lagged" if fast else "exact",
                               verbose=verbose)
        model = GaussianMF(cfg)
        model.fit((tu, ti, tx - mean), (vu, vi, vx - mean), global_mean=mean)
        rec["config"] = dataclasses.asdict(cfg)
        rec["train_mean"] = mean
        predict = lambda uu, ii: model.predict(uu, ii, global_mean=mean)
        # Ranking scores: fold the item bias into an extra factor column
        # (a constant-per-user bias never reorders that user's items).
        m_t, m_b = (np.asarray(a) for a in model._point_estimates())
        b_item = np.asarray(model.state["b_item"])
        theta = np.concatenate([m_t, np.ones((m_t.shape[0], 1), m_t.dtype)], 1)
        beta = np.concatenate([m_b, b_item[:, None]], 1)
    elif name in ("poisson", "poisson_extended"):
        from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

        # Reference configs: plain Poisson trains on RAW non-negative
        # ratings (`/root/reference/src/experiments/train_poisson_full.py:15-125`,
        # a0=0.3 b0=1.0); the extended variant adds per-user/item scalar
        # activity factors with a0=0.6 from the reference's E[rate]
        # back-of-envelope (`run_poisson_mf_extended.py:15-33`).
        ext = name.endswith("extended")
        # PMF_TPU_CONVERGED_POISSON_TOL="none" disables early stopping
        # (fixed-iteration plateau run): the reference's Poisson stop
        # rule fires on ANY improvement < tol including regressions
        # (`poisson_mf_cavi.py:213`), and the extended model's
        # Gauss-Seidel scalars plateau within ~3 sweeps on planted data,
        # which leaves a thin trajectory record.
        tol_env = os.environ.get("PMF_TPU_CONVERGED_POISSON_TOL", "1e-5")
        tol = None if tol_env.lower() == "none" else float(tol_env)
        cfg = PoissonMFConfig(n_factors=K, a0=0.6 if ext else 0.3, b0=1.0,
                              max_iter=max_iter, tol=tol, extended=ext,
                              verbose=verbose)
        model = PoissonMF(cfg)
        model.fit((tu, ti, tx), (vu, vi, vx))
        rec["config"] = dataclasses.asdict(cfg)
        predict = model.predict
        theta, beta = (np.asarray(a) for a in model._point_estimates())
        if ext:
            # Ranking scores under the extended model: psi scales every
            # item column (phi_u never reorders one user's items).
            theta = theta
            beta = beta * np.asarray(model.state["a_psi"]
                                     / model.state["b_psi"])[:, None]
    elif name in ("hpf_map", "hpf_map_blocked"):
        from pmf_tpu.models.hpf_map import HPFMap, HPFMapConfig

        # The blocked leg answers the engine="auto" gating question
        # (HPFMapConfig.engine): does the tile-local batch composition
        # reach the flat engine's quality plateau at REAL scale?
        cfg = HPFMapConfig(n_factors=K, a=0.3, a_prime=1.0, b_prime=1.0,
                           c=0.3, c_prime=1.0, d_prime=1.0, lr=2e-3,
                           batch_size=65536, epochs=max_iter,
                           engine=("blocked_fast" if name.endswith("blocked")
                                   else "flat"),
                           verbose=verbose)
        model = HPFMap(cfg)
        model.fit((tu, ti, tx + 1.0), (vu, vi, vx + 1.0))
        rec["config"] = dataclasses.asdict(cfg)
        predict = lambda uu, ii: model.predict(uu, ii) - 1.0
        theta, beta = (np.asarray(a) for a in model._point_estimates())
    else:
        raise ValueError(name)
    rec["fit_wall_seconds"] = round(time.perf_counter() - t0, 2)
    # Record the engine that actually ran (cfg.engine="auto" resolves by
    # nnz inside fit; the production default at this scale is the hybrid
    # dense-head + Pallas blocked tail).
    rec["engine"] = getattr(model, "engine_used", model.config.engine)

    hist = model.fit_history
    rec["iterations_run"] = len(hist)
    iter_secs = [h.get("iter_seconds") or h.get("epoch_seconds")
                 for h in hist
                 if h.get("iter_seconds") or h.get("epoch_seconds")]
    # Sustained rate over the WHOLE fit: every post-warmup iteration
    # including its validation eval.  Wall-clock rate (compile + layout
    # build included) reported alongside.
    visits = VISITS_PER_EDGE[name] * len(tu)
    rec["sum_iter_seconds"] = round(sum(iter_secs), 2)
    if iter_secs:
        rec["sustained_updates_per_sec"] = round(
            visits * len(iter_secs) / sum(iter_secs), 1
        )
        rec["sustained_updates_per_sec_factor_only"] = round(
            2 * len(tu) * len(iter_secs) / sum(iter_secs), 1
        )
    rec["wall_updates_per_sec"] = round(
        visits * len(hist) / rec["fit_wall_seconds"], 1
    )
    rec["epochs_to_target"] = epochs_to_target(hist)
    rec["val_rmse_trajectory"] = [
        round(h["val_rmse"], 5) for h in hist if "val_rmse" in h
    ]
    rec["median_iter_seconds"] = (
        round(float(np.median(iter_secs)), 4) if iter_secs else None
    )

    # Final quality on the held-out test split (original 0-5 scale).
    pred = predict(su, si)
    rec["test_rmse"] = float(np.sqrt(np.mean((sx - pred) ** 2)))
    rec["test_mae"] = float(np.mean(np.abs(sx - pred)))
    t0 = time.perf_counter()
    rank = ranking_metrics(theta, beta, tu, ti, su, si, ks=(10, 50))
    rec["ranking"] = {k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in rank.items()}
    # The gate with teeth (VERDICT r4 #4): leave-one-out + 100 sampled
    # negatives — random scores NDCG@10 ~ 0.045, so signal sits far from
    # the noise floor (full-catalog recall@10 at 59k items does not).
    srank = sampled_ranking_metrics(theta, beta, tu, ti, su, si,
                                    n_negatives=100, seed=0, ks=(10,))
    rec["ranking_sampled"] = {k: (round(v, 5) if isinstance(v, float) else v)
                              for k, v in srank.items()}
    rec["ranking_seconds"] = round(time.perf_counter() - t0, 2)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_users", type=int, default=162_000)
    ap.add_argument("--n_items", type=int, default=59_000)
    ap.add_argument("--nnz", type=int, default=25_000_000)
    ap.add_argument("--n_factors", type=int, default=20)
    ap.add_argument("--max_iter", type=int, default=200)
    ap.add_argument("--map_epochs", type=int, default=40,
                    help="epoch budget for the SGD MAP legs (no early "
                         "stop in the reference-faithful loop)")
    ap.add_argument("--models",
                    default="hpf_cavi,gaussian_bias,gaussian_bias_fast,"
                            "poisson,poisson_extended,hpf_map,"
                            "hpf_map_blocked")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", default="reports/converged")
    ap.add_argument("--tag", default="r05")
    ap.add_argument("--layout_cache", default="reports/cache/layouts",
                    help="PMF_TPU_LAYOUT_CACHE dir (empty string disables): "
                         "layouts are pure functions of (data, geometry), "
                         "so reruns skip the host build entirely")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-import; smoke "
                         "tests only)")
    ap.add_argument("--merge", action="store_true",
                    help="load an existing <out>/CONVERGED_<tag>.json and "
                         "replace/append only the legs named in --models — "
                         "lets each leg run in its OWN process (device-"
                         "allocator isolation: one leg's HBM high-water "
                         "mark cannot starve the next leg's compile)")
    ap.add_argument("--data_cache", default="",
                    help="npz path caching the generated (u, i, x, floor) "
                         "so interrupted runs skip the single-core "
                         "generation (the split re-derives deterministically)")
    args = ap.parse_args(argv)

    setup_cache()
    if args.layout_cache:
        os.environ.setdefault("PMF_TPU_LAYOUT_CACHE", args.layout_cache)
    os.makedirs(args.out, exist_ok=True)

    t0 = time.perf_counter()
    if args.data_cache and os.path.exists(args.data_cache):
        z = np.load(args.data_cache)
        u, i, x, floor = z["u"], z["i"], z["x"], float(z["floor"])
        print(f"# data cache hit: {args.data_cache}", flush=True)
    else:
        # draw_factor 2.6: Zipf duplicate rate at this shape means 1.25x
        # draws land only ~20.8M unique; 2.6x yields > nnz unique pairs,
        # which synth_planted then truncates to exactly nnz (true ML-25M
        # edge count).
        u, i, x, floor = synth_planted(args.n_users, args.n_items, args.nnz,
                                       seed=args.seed,
                                       draw_factor=2.6 if args.nnz >= 5_000_000
                                       else 1.25)
        if args.data_cache:
            np.savez(args.data_cache, u=u, i=i, x=x, floor=floor)
    train, val, test = leave_out_split(u, i, x, seed=args.seed)
    gen_secs = time.perf_counter() - t0
    report = {
        "tag": args.tag,
        "scale": {"n_users": args.n_users, "n_items": args.n_items,
                  "nnz_total": len(u), "nnz_train": len(train[0]),
                  "nnz_val": len(val[0]), "nnz_test": len(test[0]),
                  "n_factors": args.n_factors},
        "data": {"generator": "synth_planted (Zipf pairs, planted "
                              "bias+rank-8 ratings rounded to 0-5)",
                 "seed": args.seed,
                 "generative_floor_rmse": round(floor, 4),
                 "gen_split_seconds": round(gen_secs, 1)},
        "bias_only_test_rmse": round(bias_only_baseline(train, test), 5),
        "models": [],
    }
    print(f"# data: {len(train[0])} train / {len(val[0])} val / "
          f"{len(test[0])} test edges in {gen_secs:.0f}s; "
          f"floor RMSE ~{floor:.3f}, bias-only test RMSE "
          f"{report['bias_only_test_rmse']:.4f}", flush=True)

    jpath = os.path.join(args.out, f"CONVERGED_{args.tag}.json")
    rerun = {m.strip() for m in args.models.split(",")}
    if args.merge and os.path.exists(jpath):
        with open(jpath) as f:
            prior = json.load(f)
        # Keep prior legs not being re-run, in their original order.
        report["models"] = [m for m in prior.get("models", [])
                            if m.get("model") not in rerun]

    def flush_artifact():
        with open(jpath, "w") as f:
            json.dump(report, f, indent=1)
        write_md(report, os.path.join(args.out, f"CONVERGED_{args.tag}.md"))

    for name in args.models.split(","):
        name = name.strip()
        print(f"# fitting {name} ...", flush=True)
        budget = args.map_epochs if name.startswith("hpf_map") else args.max_iter
        # Per-model failure isolation (as cli.compare / the reference's
        # compare_models): one leg dying must not lose the others, and
        # the artifact flushes after every leg so an interrupted run
        # keeps its completed results.
        try:
            rec = fit_one(name, (train, val, test), budget,
                          args.n_factors, not args.quiet)
        except Exception as e:  # noqa: BLE001
            import traceback

            tb = traceback.format_exc().splitlines()
            site = next((l.strip() for l in reversed(tb)
                         if l.lstrip().startswith("File ")), "")
            rec = {"model": name, "failure": f"{type(e).__name__}: {e}"[:400],
                   "failure_site": site[:200]}
            print(f"# {name} FAILED: {rec['failure'][:160]}", flush=True)
            report["models"].append(rec)
            flush_artifact()
            continue
        report["models"].append(rec)
        flush_artifact()
        et = rec["epochs_to_target"] or {}
        print(f"# {name}: test RMSE {rec['test_rmse']:.4f} | "
              f"NDCG@10(100neg) {rec['ranking_sampled']['ndcg@10']:.4f} | "
              f"{rec.get('sustained_updates_per_sec', 0)/1e6:.0f}M sustained "
              f"updates/s | {et.get('iterations_to_target', '?')} iters "
              f"/ {et.get('seconds_to_target', '?')}s to target",
              flush=True)

    print(f"# wrote {jpath}", flush=True)


def write_md(report, path):
    s = report["scale"]
    lines = [
        f"# Converged ML-25M-scale run ({report['tag']})",
        "",
        "One run per model: converged quality AND sustained throughput "
        "together (the BASELINE metric's two halves).",
        "",
        f"- Scale: {s['n_users']:,} users x {s['n_items']:,} items, "
        f"{s['nnz_train']:,} train / {s['nnz_val']:,} val / "
        f"{s['nnz_test']:,} test ratings, K={s['n_factors']}",
        f"- Data: {report['data']['generator']}; generative floor RMSE "
        f"~{report['data']['generative_floor_rmse']} (oracle), bias-only "
        f"baseline test RMSE {report['bias_only_test_rmse']}",
        "",
        "| model | iters run | iters to target | secs to target | "
        "plateau val RMSE | test RMSE | test MAE | HR@10 (100neg) | "
        "NDCG@10 (100neg) | recall@10 (full) | sustained updates/s | "
        "median iter s |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for m in report["models"]:
        if "failure" in m:
            lines.append(f"| {m['model']} | FAILED: {m['failure'][:80]} "
                         + "| - " * 10 + "|")
            continue
        et = m.get("epochs_to_target") or {}
        sr = m.get("ranking_sampled", {})
        lines.append(
            f"| {m['model']} | {m['iterations_run']} | "
            f"{et.get('iterations_to_target', '-')} | "
            f"{et.get('seconds_to_target', '-')} | "
            f"{round(et.get('plateau_val_rmse', float('nan')), 5)} | "
            f"{m['test_rmse']:.5f} | {m['test_mae']:.5f} | "
            f"{sr.get('hr@10', float('nan')):.4f} | "
            f"{sr.get('ndcg@10', float('nan')):.4f} | "
            f"{m['ranking']['recall@10']:.4f} | "
            f"{m.get('sustained_updates_per_sec', 0)/1e6:.1f}M | "
            f"{m['median_iter_seconds']} |"
        )
    lines += [
        "",
        "HR@10 / NDCG@10 use the leave-one-out + 100-sampled-negatives "
        "protocol (`pmf_tpu.eval.ranking.sampled_ranking_metrics`): random "
        "scoring floors at HR@10 ~ 0.099 / NDCG@10 ~ 0.045, so these "
        "columns sit far from the noise floor (the full-catalog recall@10 "
        "at 59k items does not — kept for reference).",
        "",
        "Sustained updates/s counts EVERY post-warmup iteration including "
        "its validation eval (not a warmed timing window); the Gaussian "
        "number uses the 4-block convention, with the strict factor-only "
        "rate in the JSON (`sustained_updates_per_sec_factor_only`).",
        "",
        "Val-RMSE trajectories and full configs: same-named .json file.",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
