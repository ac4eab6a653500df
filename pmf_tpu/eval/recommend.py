"""Batch top-k recommendation — the serving path.

The reference stops at rating prediction (its predict() scores explicit
(u, i) pairs); a production recommender needs "top-k unseen items per
user".  TPU formulation: batched dense score matrices theta[u] @ beta^T
on the MXU, the user's own training items masked by one scatter per
batch (indices prepared host-side from the by-user-sorted COO, padded to
a power-of-two cap so jit shapes stay cached), then `jax.lax.top_k`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pmf_tpu.ops.segment import gather_rows

NEG = -3.0e38  # effectively -inf for f32 scores


@partial(jax.jit, static_argnames=("k",))
def _topk_batch(theta_rows, beta, item_bias, mask_u, mask_i, k: int):
    scores = jnp.dot(theta_rows, beta.T, preferred_element_type=jnp.float32)
    scores = scores + item_bias[None, :]
    # Mask training items: padded mask entries carry row index B (dropped)
    # and item 0; scatter with out-of-range drop semantics.
    scores = scores.at[mask_u, mask_i].set(NEG, mode="drop")
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


def _round_pow2(n: int, floor: int = 256) -> int:
    m = floor
    while m < n:
        m *= 2
    return m


def recommend(
    theta,
    beta,
    user_ids,
    k: int = 10,
    train_u=None,
    train_i=None,
    batch: int = 1024,
    item_bias=None,
    user_bias=None,
    mean: float = 0.0,
):
    """Top-k items per user under the model's full score.

    theta: (n_users, K), beta: (n_items, K) point estimates.  Scores are
    ``mean + user_bias[u] + item_bias[i] + <theta_u, beta_i>``; item_bias
    participates in the ranking (it varies across candidates), while the
    per-user terms are rank-neutral and only shift the reported scores so
    they match the model's predict().  When train_u/train_i are given, each
    user's own training items are excluded from the candidates.  Returns
    (items (len(user_ids), k) int64, scores (len(user_ids), k) float32).
    """
    theta = jnp.asarray(theta, jnp.float32)
    beta = jnp.asarray(beta, jnp.float32)
    users = np.asarray(user_ids, dtype=np.int64)
    if len(users) and (users.min() < 0 or users.max() >= theta.shape[0]):
        bad = users[(users < 0) | (users >= theta.shape[0])][:5]
        raise ValueError(
            f"user ids out of range [0, {theta.shape[0]}): {bad.tolist()}"
        )
    item_bias = (
        jnp.zeros(beta.shape[0], jnp.float32)
        if item_bias is None
        else jnp.asarray(item_bias, jnp.float32)
    )

    have_train = train_u is not None and train_i is not None and len(train_u)
    if have_train:
        tu = np.asarray(train_u, dtype=np.int64)
        ti = np.asarray(train_i, dtype=np.int64)
        order = np.argsort(tu, kind="stable")
        tu, ti = tu[order], ti[order]
        lo = np.searchsorted(tu, users, side="left")
        hi = np.searchsorted(tu, users, side="right")

    items = np.empty((len(users), k), dtype=np.int64)
    scores = np.empty((len(users), k), dtype=np.float32)
    for s in range(0, len(users), batch):
        e = min(s + batch, len(users))
        ub = users[s:e]
        if have_train:
            n_edges = int((hi[s:e] - lo[s:e]).sum())
            cap = _round_pow2(max(n_edges, 1))
            mask_u = np.full(cap, len(ub), dtype=np.int32)  # row B -> dropped
            mask_i = np.zeros(cap, dtype=np.int32)
            pos = 0
            for row, (a, b) in enumerate(zip(lo[s:e], hi[s:e])):
                n = b - a
                mask_u[pos : pos + n] = row
                mask_i[pos : pos + n] = ti[a:b]
                pos += n
        else:
            mask_u = np.full(1, len(ub), dtype=np.int32)
            mask_i = np.zeros(1, dtype=np.int32)
        rows = gather_rows(theta, jnp.asarray(ub))
        v, idx = _topk_batch(rows, beta, item_bias, jnp.asarray(mask_u),
                             jnp.asarray(mask_i), k)
        items[s:e] = np.asarray(idx)
        scores[s:e] = np.asarray(v)
    if mean or user_bias is not None:
        shift = np.full(len(users), float(mean), dtype=np.float32)
        if user_bias is not None:
            shift = shift + np.asarray(user_bias, np.float32)[users]
        scores = scores + shift[:, None]
    return items, scores
