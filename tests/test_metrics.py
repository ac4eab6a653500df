import jax.numpy as jnp
import numpy as np

from pmf_tpu.data.coo import build_eval_set
from pmf_tpu.eval.metrics import (
    macro_mae,
    mae,
    masked_macro_mae,
    masked_rmse,
    rmse,
)


def test_host_metrics():
    y = np.array([1.0, 2.0, 3.0, 3.0])
    p = np.array([1.5, 2.0, 2.0, 4.0])
    assert abs(rmse(y, p) - np.sqrt(np.mean((y - p) ** 2))) < 1e-12
    assert abs(mae(y, p) - np.mean(np.abs(y - p))) < 1e-12
    # macro: classes 1, 2, 3 -> MAEs 0.5, 0.0, 1.0 -> 0.5
    assert abs(macro_mae(y, p) - 0.5) < 1e-12


def test_masked_metrics_match_host(small_ratings):
    u, i, x = small_ratings
    rng = np.random.default_rng(0)
    pred = x + rng.standard_normal(len(x)) * 0.3

    ev = build_eval_set(u, i, x, int(u.max()) + 1, int(i.max()) + 1, dtype=np.float64)
    pred_padded = np.zeros(ev.n_rows_padded)
    pred_padded[: len(pred)] = pred

    r = float(masked_rmse(ev.x, jnp.asarray(pred_padded), ev.real))
    mm = float(
        masked_macro_mae(ev.x, jnp.asarray(pred_padded), ev.real, ev.class_id, ev.n_classes)
    )
    assert abs(r - rmse(x, pred)) < 1e-9
    assert abs(mm - macro_mae(x, pred)) < 1e-9


def test_eval_set_valid_mask():
    u = np.array([0, 1, 5])
    i = np.array([0, 1, 1])
    x = np.array([1.0, 2.0, 3.0])
    ev = build_eval_set(u, i, x, n_users=3, n_items=2)  # u=5 out of range
    real = np.asarray(ev.real)
    valid = np.asarray(ev.valid)
    assert real[:3].all() and not real[3:].any()
    assert valid[0] and valid[1] and not valid[2]
