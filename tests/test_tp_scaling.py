"""Smoke test for scripts/tp_scaling_shape.py (TP ring scaling geometry).

The script is a CPU-only report generator (host layout builds, no kernel
execution); this gates that it runs end-to-end and that the geometry
invariants hold: D=1 efficiency is exactly 1, slot-edge counts cover the
real edges, and the JSON/markdown artifacts are written.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tp_scaling_shape_smoke(tmp_path):
    out = tmp_path / "tpscale"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tp_scaling_shape.py"),
         "--n_users", "900", "--n_items", "400", "--nnz", "60000",
         "--degrees", "1,2,4", "--data_cache", "", "--out", str(out),
         "--tag", "t"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads((out / "TP_SCALING_t.json").read_text())
    assert (out / "TP_SCALING_t.md").exists()
    degs = {e["D"]: e for e in report["degrees"]}
    assert set(degs) == {1, 2, 4}
    for e in degs.values():
        for side in ("by_user", "by_item"):
            st = e[side]
            # Slots cover every real edge (padding only adds).
            assert st["slot_edges_per_chip"] * e["D"] >= report["scale"]["nnz"]
            assert 0.0 < st["occupancy"] <= 1.0
            assert 0.0 <= st["dummy_fraction"] < 1.0
    assert degs[1]["by_user"]["slot_scaling_efficiency"] == 1.0
    assert degs[1]["by_item"]["slot_scaling_efficiency"] == 1.0
    # ICI cost at D=1 is zero (no hops).
    assert degs[1]["by_user"]["ici_bytes_per_pass_per_chip"] == 0
