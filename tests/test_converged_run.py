"""Unit gates for the converged-run machinery (VERDICT r3 #1):
`synth_planted` (planted-signal generator), `leave_out_split` (the
reference's per-user leave-out flavor, `load_data.py:53-56`), and the
`epochs_to_target` extractor in `scripts/converged_ml25m.py`."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from pmf_tpu.data.synthetic import leave_out_split, synth_planted


def test_synth_planted_has_learnable_signal():
    """The planted model must make rating variance explainable: an oracle
    using the true factors beats the marginal predictor by a wide margin
    (otherwise "converged quality" would be meaningless)."""
    u, i, x, floor = synth_planted(400, 150, 20_000, seed=3)
    assert x.min() >= 0.0 and x.max() <= 5.0
    # The quoted generative floor is well below the marginal std.
    assert 0.0 < floor < np.std(x) * 0.9


def test_synth_planted_deterministic():
    a = synth_planted(200, 80, 5_000, seed=9)
    b = synth_planted(200, 80, 5_000, seed=9)
    for x, y in zip(a[:3], b[:3]):
        np.testing.assert_array_equal(x, y)


def test_leave_out_split_per_user_counts():
    u, i, x, _ = synth_planted(300, 100, 15_000, seed=1)
    (tu, ti, tx), (vu, vi, vx), (su, si, sx) = leave_out_split(
        u, i, x, seed=1, n_test=1, n_val=2)
    assert len(tu) + len(vu) + len(su) == len(u)
    # Users with >= 4 ratings contribute exactly 1 test and 2 val rows;
    # smaller users contribute none.
    total = np.bincount(u.astype(np.int64), minlength=300)
    tst = np.bincount(su.astype(np.int64), minlength=300)
    val = np.bincount(vu.astype(np.int64), minlength=300)
    big = total >= 4
    assert np.all(tst[big] == 1) and np.all(val[big] == 2)
    assert np.all(tst[~big] == 0) and np.all(val[~big] == 0)
    # No user in val/test loses ALL training rows.
    trn = np.bincount(tu.astype(np.int64), minlength=300)
    assert np.all(trn[big] >= 1)


def test_epochs_to_target_extractor():
    sys.path.insert(0, "/root/repo/scripts")
    from converged_ml25m import epochs_to_target

    hist = [
        {"iteration": 1, "iter_seconds": 1.0, "val_rmse": 1.00},
        {"iteration": 2, "iter_seconds": 1.0, "val_rmse": 0.92},
        {"iteration": 3, "iter_seconds": 1.0, "val_rmse": 0.904},
        {"iteration": 4, "iter_seconds": 1.0, "val_rmse": 0.900},
    ]
    et = epochs_to_target(hist, band=0.005)
    # plateau 0.900, target 0.9045 -> first hit is iteration 3.
    assert et["iterations_to_target"] == 3
    assert et["seconds_to_target"] == pytest.approx(3.0)
    assert epochs_to_target([{"iteration": 1}]) is None
