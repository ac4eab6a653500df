"""Evaluation metrics.

Host-facing numpy metrics mirror the reference's surface
(`/root/reference/src/evaluation/metrics.py`): rmse, mae, macro_mae and the
Gaussian/Poisson log predictive likelihoods.  The jnp-facing masked variants
are the jit-compatible forms used inside training loops, where evaluation
sets are padded to static shapes and macro-MAE's per-class grouping is
precomputed as segment ids (see :class:`pmf_tpu.data.coo.EvalSet`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host (numpy) metrics — reference-compatible surface
# ---------------------------------------------------------------------------

def rmse(y_true, y_pred) -> float:
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    return float(np.sqrt(np.mean((y_true - y_pred) ** 2)))


def mae(y_true, y_pred) -> float:
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    return float(np.mean(np.abs(y_true - y_pred)))


def macro_mae(y_true, y_pred) -> float:
    """MAE averaged over the unique true-rating classes (equal class weight),
    matching `/root/reference/src/evaluation/metrics.py:37-51`."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    per_class = [
        np.mean(np.abs(y_true[y_true == v] - y_pred[y_true == v]))
        for v in np.unique(y_true)
    ]
    return float(np.mean(per_class))


def gaussian_log_predictive_likelihood(y_true, y_pred, sigma) -> float:
    """Sum of Gaussian log densities with std ``sigma``
    (`/root/reference/src/evaluation/metrics.py:18-35`; that version takes
    (df, theta, beta) — here predictions are passed directly)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    var = float(sigma) ** 2
    sq = (y_true - y_pred) ** 2
    return float(np.sum(-0.5 * np.log(2.0 * np.pi * var) - sq / (2.0 * var)))


def poisson_log_predictive_likelihood(y_true, lam, epsilon: float = 1e-10) -> float:
    """Sum of Poisson log pmfs with rate floor
    (`/root/reference/src/evaluation/metrics.py:53-65`)."""
    from scipy.special import gammaln

    y_true = np.asarray(y_true, dtype=np.float64)
    lam = np.maximum(np.asarray(lam, dtype=np.float64), epsilon)
    return float(np.sum(y_true * np.log(lam) - lam - gammaln(y_true + 1.0)))


# ---------------------------------------------------------------------------
# Device (jnp) metrics — static-shape, mask-aware, jit-compatible
# ---------------------------------------------------------------------------

def masked_rmse(y_true: jax.Array, y_pred: jax.Array, mask: jax.Array) -> jax.Array:
    """RMSE over rows where ``mask`` is true (padding excluded)."""
    mask = mask.astype(y_true.dtype)
    err2 = mask * (y_true - y_pred) ** 2
    return jnp.sqrt(jnp.sum(err2) / jnp.maximum(jnp.sum(mask), 1.0))


def masked_macro_mae(
    y_true: jax.Array,
    y_pred: jax.Array,
    mask: jax.Array,
    class_id: jax.Array,
    n_classes: int,
) -> jax.Array:
    """Macro-MAE via one segment mean per precomputed rating class.

    ``class_id`` is ``n_classes`` (out of range, dropped) for padded rows.
    Classes with no valid rows are excluded from the average, matching the
    reference's iteration over classes actually present.
    """
    m = mask.astype(y_true.dtype)
    abs_err = m * jnp.abs(y_true - y_pred)
    ids = jnp.where(mask, class_id, n_classes)
    per_class_sum = jax.ops.segment_sum(abs_err, ids, num_segments=n_classes)
    per_class_n = jax.ops.segment_sum(m, ids, num_segments=n_classes)
    present = per_class_n > 0
    per_class_mae = per_class_sum / jnp.maximum(per_class_n, 1.0)
    return jnp.sum(jnp.where(present, per_class_mae, 0.0)) / jnp.maximum(
        jnp.sum(present.astype(y_true.dtype)), 1.0
    )
