"""Reference-scale end-to-end accuracy-parity pipeline (VERDICT r2 #1).

Builds a Food.com-shaped synthetic raw dataset, runs the REFERENCE's own
tune -> compare -> train workflow on it (its actual code at
/root/reference, single-core CPU), runs pmf_tpu's equivalent CLI surface
on the IDENTICAL files with the IDENTICAL tuned configs (reference
best_hyperparams.txt read by both sides), and writes a side-by-side
final-metrics report:

    python scripts/parity_pipeline.py --scale small --workdir /tmp/parity
    python scripts/parity_pipeline.py --scale full  --workdir reports/parity_ref \
        --out_prefix PARITY_r03

Stages (resumable; each writes a .done marker in the workdir):
    gen            synthetic raw Kaggle files (pmf_tpu.data.synthetic)
    ref_preprocess reference preprocess_data (load_data.py:9-90)
    my_preprocess  pmf_tpu preprocess_data on the same raw; byte-compares
    ref_tune       reference tune_all_models (seeded global random)
    ref_compare    reference compare_models body + factor export
    ref_train      reference train_*_full (dataset_mode=train)
    my_tune        pmf_tpu cli.tune (pipeline exercise; configs recorded)
    my_cpu64       pmf_tpu compare, float64/flat on CPU — the tight
                   parity leg (same seeds, same configs)
    my_tpu32       pmf_tpu compare, float32 production engines on the
                   default platform (TPU) — the performance leg
    my_train       pmf_tpu cli.train_full (tpu leg)
    report         unified metrics/ranking table -> <out_prefix>.{json,md}

Every subprocess is nice'd so a full-scale background run yields the
single host core to interactive work.
"""

from __future__ import annotations

import argparse
import filecmp
import json
import os
import subprocess
import sys

REPO = "/root/repo"

SCALES = {
    # (n_users_raw, n_items_raw, n_raw, tune_n_trials)
    "tiny": (600, 1500, 15_000, 1),
    "small": (1500, 4000, 40_000, 2),
    "mid": (6000, 30_000, 200_000, 2),
    "full": (25_076, 178_265, 1_130_000, 2),
}

SEED = 7


def _run(cmd, cwd=None, env_extra=None, log=None):
    # Keep PYTHONPATH: the TPU platform plugin loads from it
    # (/root/.axon_site); wrappers add their own sys.path entries.
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    print("+", " ".join(cmd), ("> " + log if log else ""), flush=True)
    if log:
        with open(log, "w") as f:
            subprocess.run(["nice", "-n", "10", *cmd], cwd=cwd, env=env,
                           stdout=f, stderr=subprocess.STDOUT, check=True)
    else:
        subprocess.run(["nice", "-n", "10", *cmd], cwd=cwd, env=env, check=True)


def _done(workdir, stage):
    return os.path.join(workdir, f".{stage}.done")


def run_stage(workdir, stage, fn, force=False):
    marker = _done(workdir, stage)
    if os.path.exists(marker) and not force:
        print(f"[skip] {stage} (marker exists)", flush=True)
        return
    print(f"[stage] {stage}", flush=True)
    fn()
    open(marker, "w").write("ok\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--scale", default="small", choices=sorted(SCALES))
    ap.add_argument("--out_prefix", default=None,
                    help="report path prefix (default <workdir>/parity)")
    ap.add_argument("--stages", nargs="+", default=None,
                    help="subset of stages to run (default: all)")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    raw_dir = os.path.join(workdir, "data", "raw")
    processed = os.path.join(workdir, "data", "processed")
    my_processed = os.path.join(workdir, "my_processed")
    out_prefix = args.out_prefix or os.path.join(workdir, "parity")
    n_users, n_items, n_raw, n_trials = SCALES[args.scale]

    ref_wrap = os.path.join(REPO, "scripts", "_ref_side_wrapper.py")
    my_wrap = os.path.join(REPO, "scripts", "_my_side_wrapper.py")

    def gen():
        sys.path.insert(0, REPO)
        from pmf_tpu.data.synthetic import synth_foodcom_raw

        stats = synth_foodcom_raw(raw_dir, n_users=n_users, n_items=n_items,
                                  n_raw=n_raw, seed=SEED)
        print("raw stats:", stats, flush=True)
        with open(os.path.join(workdir, "raw_stats.json"), "w") as f:
            json.dump({"scale": args.scale, **stats}, f, indent=1)

    def ref_preprocess():
        _run([sys.executable, ref_wrap, "--workdir", workdir,
              "--stage", "preprocess"],
             log=os.path.join(workdir, "log_ref_preprocess.txt"))

    def my_preprocess():
        os.makedirs(my_processed, exist_ok=True)
        _run([sys.executable, "-c",
              "import sys; sys.path.insert(0, %r); "
              "from pmf_tpu.data.pipeline import preprocess_data; "
              "preprocess_data(%r, %r)" % (REPO, raw_dir, my_processed)],
             env_extra={"JAX_PLATFORMS": "cpu"},
             log=os.path.join(workdir, "log_my_preprocess.txt"))
        mismatches = []
        for name in ("interactions_train.csv", "interactions_validation.csv",
                     "interactions_test.csv", "dict_i.csv", "dict_u.csv"):
            a = os.path.join(processed, name)
            b = os.path.join(my_processed, name)
            if not filecmp.cmp(a, b, shallow=False):
                mismatches.append(name)
        if mismatches:
            raise AssertionError(
                f"preprocess byte-parity FAILED at {args.scale} scale: {mismatches}")
        print("preprocess byte-parity OK (5 files identical)", flush=True)

    def ref_tune():
        _run([sys.executable, ref_wrap, "--workdir", workdir, "--stage", "tune",
              "--n_trials", str(n_trials), "--seed", str(SEED)],
             log=os.path.join(workdir, "log_ref_tune.txt"))

    def ref_compare():
        _run([sys.executable, ref_wrap, "--workdir", workdir,
              "--stage", "compare"],
             log=os.path.join(workdir, "log_ref_compare.txt"))

    def ref_train():
        _run([sys.executable, ref_wrap, "--workdir", workdir, "--stage", "train"],
             log=os.path.join(workdir, "log_ref_train.txt"))

    def my_tune():
        d = os.path.join(workdir, "my_tune")
        os.makedirs(d, exist_ok=True)
        _run([sys.executable, my_wrap, "--workdir", d, "--stage", "tune",
              "--processed_dir", processed, "--n_trials", str(n_trials),
              "--seed", str(SEED), "--tag", "tune"],
             log=os.path.join(workdir, "log_my_tune.txt"))

    def my_cpu64():
        d = os.path.join(workdir, "my_cpu64")
        _run([sys.executable, my_wrap, "--workdir", d, "--stage", "compare",
              "--processed_dir", processed,
              "--hyperparams", os.path.join(workdir, "best_hyperparams.txt"),
              "--dtype", "float64", "--engine", "flat", "--tag", "cpu64",
              "--platform", "cpu"],
             env_extra={"JAX_PLATFORMS": "cpu", "JAX_ENABLE_X64": "1"},
             log=os.path.join(workdir, "log_my_cpu64.txt"))

    # The production platform for the tpu32/train legs.  The orchestrator
    # itself often runs with JAX_PLATFORMS=cpu (so the report stage stays
    # off the chip); children must NOT inherit that — default to the axon
    # TPU tunnel, overridable for CPU-only test runs.
    tpu_platform = os.environ.get("PARITY_TPU_PLATFORM", "axon")

    def my_tpu32():
        d = os.path.join(workdir, "my_tpu32")
        _run([sys.executable, my_wrap, "--workdir", d, "--stage", "compare",
              "--processed_dir", processed,
              "--hyperparams", os.path.join(workdir, "best_hyperparams.txt"),
              "--dtype", "float32", "--tag", "tpu32",
              "--platform", tpu_platform],
             env_extra={"JAX_PLATFORMS": tpu_platform},
             log=os.path.join(workdir, "log_my_tpu32.txt"))

    def my_train():
        d = os.path.join(workdir, "my_tpu32")
        _run([sys.executable, my_wrap, "--workdir", d, "--stage", "train",
              "--processed_dir", processed,
              "--hyperparams", os.path.join(workdir, "best_hyperparams.txt"),
              "--platform", tpu_platform],
             env_extra={"JAX_PLATFORMS": tpu_platform},
             log=os.path.join(workdir, "log_my_train.txt"))

    def report():
        sys.path.insert(0, REPO)
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        # The report's ranking metrics run through jax.  Honor an
        # orchestrator-level JAX_PLATFORMS=cpu in-process: the axon
        # sitecustomize registers the TPU plugin in every python, and
        # the env var alone does not stop (or un-wedge) client creation.
        if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        from parity_report import build_report

        build_report(workdir, out_prefix, scale=args.scale)

    all_stages = [
        ("gen", gen),
        ("ref_preprocess", ref_preprocess),
        ("my_preprocess", my_preprocess),
        ("ref_tune", ref_tune),
        ("ref_compare", ref_compare),
        ("ref_train", ref_train),
        ("my_tune", my_tune),
        ("my_cpu64", my_cpu64),
        ("my_tpu32", my_tpu32),
        ("my_train", my_train),
        ("report", report),
    ]
    wanted = set(args.stages) if args.stages else {s for s, _ in all_stages}
    unknown = wanted - {s for s, _ in all_stages}
    if unknown:
        raise SystemExit(f"unknown stages: {sorted(unknown)}")
    for stage, fn in all_stages:
        if stage in wanted:
            run_stage(workdir, stage, fn, force=args.force)
    print("parity pipeline complete", flush=True)


if __name__ == "__main__":
    main()
