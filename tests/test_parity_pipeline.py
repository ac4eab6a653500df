"""End-to-end pipeline parity vs the reference's OWN workflow (VERDICT r2
#1, scaled down for CI).

Runs scripts/parity_pipeline.py at the "tiny" scale: synthetic raw Kaggle
files -> the reference's own preprocess/tune/compare/train chain
(subprocesses importing /root/reference) -> pmf_tpu's CLI on the identical
files with the identical tuned configs -> unified report.  Gates:

  * preprocess byte-parity (asserted inside the my_preprocess stage);
  * CAVI final metrics (train/val/test RMSE + macro-MAE) match the
    reference at f64 resolution — same seeds, same configs, same files;
  * HPF-MAP lands in a stochastic band (different minibatch shuffles);
  * ranking metrics exist and are finite for every model and leg.

The full-scale (25k x 178k raw, ~700k kept) run of the same driver
produces the committed PARITY_r03.{json,md} artifact.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pipeline_parity_tiny(tmp_path):
    workdir = str(tmp_path / "parity")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PARITY_TPU_PLATFORM"] = "cpu"  # no chip in CI; prod leg runs CPU
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_pipeline.py"),
         "--workdir", workdir, "--scale", "tiny"],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    with open(os.path.join(workdir, "parity.json")) as f:
        report = json.load(f)

    # CAVI: deterministic parity (shared seeds/configs, f64 leg).
    assert report["max_abs_cavi_cpu64_delta"] is not None
    assert report["max_abs_cavi_cpu64_delta"] < 1e-6, report
    # Production f32 leg: float-resolution band.
    assert report["max_abs_cavi_tpu32_delta"] < 5e-3, report
    # MAP: stochastic band (reference shuffles minibatches torch-side).
    assert report["max_abs_map_cpu64_delta"] < 0.6, report

    for run_name, entry in report["models"].items():
        for leg in ("reference", "cpu64", "tpu32"):
            rk = entry[leg]["ranking"]
            assert rk is not None, (run_name, leg)
            assert np.isfinite(rk["ndcg@10"]), (run_name, leg, rk)
            assert np.isfinite(rk["recall@10"]), (run_name, leg, rk)

    # Full-train predictions exported and uniformly re-scored on both sides.
    for run_name, entry in report["models"].items():
        ref_t = entry["reference"]["train_full_test"]
        my_t = entry["tpu32"]["train_full_test"]
        assert ref_t and my_t, run_name
        band = 0.6 if run_name == "hpf_map" else 1e-3
        assert abs(ref_t["rmse"] - my_t["rmse"]) < band, (run_name, ref_t, my_t)
