"""Assemble the reference-scale parity report (stage `report` of
scripts/parity_pipeline.py) into <out_prefix>.json / .md.

Unifies three comparisons between the reference pipeline and pmf_tpu:
  1. compare-stage final metrics (train/val/test RMSE + macro-MAE) from
     the reference's compare_models body vs pmf_tpu's compare path, both
     trained from the SAME best_hyperparams.txt on the SAME files;
  2. ranking quality (recall@10 / NDCG@10) computed by ONE function
     (pmf_tpu.eval.ranking.ranking_metrics) from each side's exported
     point estimates — the reference has no ranking metrics of its own,
     so this is the apples-to-apples closing of VERDICT r2 Missing #4;
  3. full-train test predictions (train_*_full vs cli.train_full),
     re-scored uniformly from each side's test_predictions.csv.

Returns the report dict so tests can gate on the deltas.
"""

from __future__ import annotations

import json
import os

import numpy as np

# (ref "Model" label, my run_name, artifact dir)
MODELS = [
    ("Gaussian MF (CAVI)", "gaussian_bias", "gaussian_mf"),
    ("Poisson MF (CAVI)", "poisson", "poisson_mf"),
    ("HPF (CAVI)", "hpf_cavi", "hpf_cavi"),
    ("HPF (PyTorch)", "hpf_map", "hpf_pytorch"),
]
SPLITS = ("train", "val", "test")
REF_KEYS = {("train", "rmse"): "Train RMSE", ("val", "rmse"): "Val RMSE",
            ("test", "rmse"): "Test RMSE",
            ("train", "macro_mae"): "Train MacroMAE",
            ("val", "macro_mae"): "Val MacroMAE",
            ("test", "macro_mae"): "Test MacroMAE"}


def _load_json(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _pred_metrics(csv_path):
    """Uniform re-score of a test_predictions.csv (u,i,y_true,y_pred)."""
    import pandas as pd

    from pmf_tpu.eval.metrics import macro_mae, mae, rmse

    if not os.path.exists(csv_path):
        return None
    df = pd.read_csv(csv_path)
    y, p = df["y_true"].to_numpy(float), df["y_pred"].to_numpy(float)
    return {"rmse": float(rmse(y, p)), "mae": float(mae(y, p)),
            "macro_mae": float(macro_mae(y, p))}


def _ranking(npz_path, train_u, train_i, test_u, test_i):
    from pmf_tpu.eval.ranking import ranking_metrics

    if not os.path.exists(npz_path):
        return None
    z = np.load(npz_path)
    r = ranking_metrics(np.asarray(z["theta"], np.float32),
                        np.asarray(z["beta"], np.float32),
                        train_u, train_i, test_u, test_i, ks=(10,))
    return {k: float(v) for k, v in r.items()}


def build_report(workdir: str, out_prefix: str, scale: str = "?") -> dict:
    import pandas as pd

    ref_rows = _load_json(os.path.join(workdir, "ref_compare.json")) or []
    ref_by_label = {r["Model"]: r for r in ref_rows}
    legs = {}
    for tag in ("cpu64", "tpu32"):
        rows = _load_json(
            os.path.join(workdir, f"my_{tag}", f"my_compare_{tag}.json")) or []
        legs[tag] = {r["model"]: r for r in rows}

    train_csv = os.path.join(workdir, "data", "processed", "interactions_train.csv")
    test_csv = os.path.join(workdir, "data", "processed", "interactions_test.csv")
    tr = pd.read_csv(train_csv)
    te = pd.read_csv(test_csv)
    train_u, train_i = tr["u"].to_numpy(np.int64), tr["i"].to_numpy(np.int64)
    test_u, test_i = te["u"].to_numpy(np.int64), te["i"].to_numpy(np.int64)

    report = {"scale": scale,
              "raw_stats": _load_json(os.path.join(workdir, "raw_stats.json")),
              "hyperparams": open(os.path.join(workdir, "best_hyperparams.txt"))
              .read() if os.path.exists(os.path.join(workdir, "best_hyperparams.txt")) else None,
              "models": {}}

    for label, run_name, art_dir in MODELS:
        entry = {"reference": {}, "cpu64": {}, "tpu32": {}, "delta": {}}
        ref = ref_by_label.get(label)
        for split in SPLITS:
            for metric in ("rmse", "macro_mae"):
                k = f"{split}_{metric}"
                if ref:
                    entry["reference"][k] = float(ref[REF_KEYS[(split, metric)]])
                for tag in ("cpu64", "tpu32"):
                    mine = legs[tag].get(run_name)
                    if mine:
                        entry[tag][k] = float(mine[k])
                        if ref:
                            entry["delta"][f"{tag}:{k}"] = float(
                                mine[k] - ref[REF_KEYS[(split, metric)]])
        if ref:
            entry["reference"]["fit_seconds"] = float(ref["Time (s)"])
        for tag in ("cpu64", "tpu32"):
            mine = legs[tag].get(run_name)
            if mine:
                entry[tag]["fit_seconds"] = float(mine["fit_seconds"])
                entry[tag]["n_iterations"] = mine.get("n_iterations")

        # Unified ranking metrics from exported point estimates.
        entry["reference"]["ranking"] = _ranking(
            os.path.join(workdir, f"ref_factors_{run_name}.npz"),
            train_u, train_i, test_u, test_i)
        for tag in ("cpu64", "tpu32"):
            entry[tag]["ranking"] = _ranking(
                os.path.join(workdir, f"my_{tag}",
                             f"my_factors_{tag}_{run_name}.npz"),
                train_u, train_i, test_u, test_i)

        # Full-train predictions, re-scored uniformly.
        entry["reference"]["train_full_test"] = _pred_metrics(
            os.path.join(workdir, "data", "predictions", art_dir,
                         "test_predictions.csv"))
        entry["tpu32"]["train_full_test"] = _pred_metrics(
            os.path.join(workdir, "my_tpu32", "data", "predictions", art_dir,
                         "test_predictions.csv"))
        report["models"][run_name] = entry

    # Headline gates: worst CAVI delta (deterministic parity) and the MAP band.
    cavi_deltas = [abs(v) for m in ("gaussian_bias", "poisson", "hpf_cavi")
                   for k, v in report["models"][m]["delta"].items()
                   if k.startswith("cpu64:")]
    map_deltas = [abs(v) for k, v in report["models"]["hpf_map"]["delta"].items()
                  if k.startswith("cpu64:")]
    report["max_abs_cavi_cpu64_delta"] = max(cavi_deltas) if cavi_deltas else None
    report["max_abs_map_cpu64_delta"] = max(map_deltas) if map_deltas else None
    tpu_deltas = [abs(v) for m in ("gaussian_bias", "poisson", "hpf_cavi")
                  for k, v in report["models"][m]["delta"].items()
                  if k.startswith("tpu32:")]
    report["max_abs_cavi_tpu32_delta"] = max(tpu_deltas) if tpu_deltas else None

    with open(out_prefix + ".json", "w") as f:
        json.dump(report, f, indent=1)
    _write_md(report, out_prefix + ".md")
    print(f"report -> {out_prefix}.json / .md", flush=True)
    print(f"max |CAVI delta| cpu64: {report['max_abs_cavi_cpu64_delta']}, "
          f"tpu32: {report['max_abs_cavi_tpu32_delta']}, "
          f"MAP cpu64 band: {report['max_abs_map_cpu64_delta']}", flush=True)
    return report


def _fmt(v, nd=4):
    return "—" if v is None else f"{v:.{nd}f}"


def _write_md(report, path):
    lines = [
        "# Reference-scale accuracy parity",
        "",
        f"Scale: **{report['scale']}** — synthetic Food.com clone "
        f"(`pmf_tpu.data.synthetic.synth_foodcom_raw`), raw stats: "
        f"`{report['raw_stats']}`.",
        "",
        "The reference's own pipeline (`tune_all_models` -> "
        "`compare_models` -> `train_*_full`, executed from "
        "`/root/reference/src`) vs pmf_tpu's CLI on the identical "
        "processed files with the identical tuned configs "
        "(shared `best_hyperparams.txt`, shared seeds).  `cpu64` = "
        "pmf_tpu float64/flat on CPU (deterministic parity leg); "
        "`tpu32` = pmf_tpu float32 production engines on the TPU chip.",
        "",
        "## Compare-stage final metrics",
        "",
        "| model | metric | reference | pmf_tpu cpu64 | Δ | pmf_tpu tpu32 | Δ |",
        "|---|---|---|---|---|---|---|",
    ]
    for run_name, e in report["models"].items():
        for split in SPLITS:
            for metric in ("rmse", "macro_mae"):
                k = f"{split}_{metric}"
                ref = e["reference"].get(k)
                c = e["cpu64"].get(k)
                t = e["tpu32"].get(k)
                lines.append(
                    f"| {run_name} | {k} | {_fmt(ref)} | {_fmt(c)} | "
                    f"{_fmt(e['delta'].get('cpu64:' + k), 6)} | {_fmt(t)} | "
                    f"{_fmt(e['delta'].get('tpu32:' + k), 6)} |")
    lines += [
        "",
        "## Training time (compare stage)",
        "",
        "| model | reference CPU (s) | pmf_tpu cpu64 (s) | pmf_tpu TPU (s) | TPU speedup |",
        "|---|---|---|---|---|",
    ]
    for run_name, e in report["models"].items():
        r = e["reference"].get("fit_seconds")
        c = e["cpu64"].get("fit_seconds")
        t = e["tpu32"].get("fit_seconds")
        sp = f"{r / t:.1f}x" if r and t else "—"
        lines.append(f"| {run_name} | {_fmt(r, 1)} | {_fmt(c, 1)} | "
                     f"{_fmt(t, 1)} | {sp} |")
    lines += [
        "",
        "## Ranking quality (uniform scorer, factors only)",
        "",
        "recall@10 / NDCG@10 of held-out test pairs, computed by "
        "`pmf_tpu.eval.ranking.ranking_metrics` from each side's exported "
        "point estimates (biases excluded on both sides — the reference "
        "exports none).",
        "",
        "| model | ref recall@10 | ref NDCG@10 | cpu64 recall@10 | cpu64 NDCG@10 | tpu32 recall@10 | tpu32 NDCG@10 |",
        "|---|---|---|---|---|---|---|",
    ]
    for run_name, e in report["models"].items():
        cells = []
        for side in ("reference", "cpu64", "tpu32"):
            rk = e[side].get("ranking")
            cells += [_fmt(rk and rk.get("recall@10")),
                      _fmt(rk and rk.get("ndcg@10"))]
        lines.append("| " + run_name + " | " + " | ".join(cells) + " |")
    lines += [
        "",
        "## Full-train test predictions (re-scored uniformly)",
        "",
        "| model | side | RMSE | MAE | macro-MAE |",
        "|---|---|---|---|---|",
    ]
    for run_name, e in report["models"].items():
        for side in ("reference", "tpu32"):
            m = e[side].get("train_full_test")
            if m:
                lines.append(f"| {run_name} | {side} | {_fmt(m['rmse'])} | "
                             f"{_fmt(m['mae'])} | {_fmt(m['macro_mae'])} |")
    lines += [
        "",
        f"**Worst |Δ| (CAVI, cpu64 leg): {report['max_abs_cavi_cpu64_delta']}**  ",
        f"**Worst |Δ| (CAVI, tpu32 leg): {report['max_abs_cavi_tpu32_delta']}**  ",
        f"**Worst |Δ| (HPF-MAP, cpu64 leg, stochastic band): "
        f"{report['max_abs_map_cpu64_delta']}**",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
