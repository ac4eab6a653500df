"""Dense-head CAVI statistics — the hybrid engine's MXU fast path.

After popularity reordering, the (top-hu users) x (top-hi items) corner of
a Zipf-shaped rating matrix is dense enough that per-edge processing is
waste: every CAVI sufficient statistic over that corner is expressible
with dense matmuls against the stored cell arrays X (rating sums) and
M (edge multiplicities) of `pmf_tpu.data.blocked.DenseHead`:

  Poisson/HPF factor blocks (the statistics of
  `/root/reference/src/models/hpf_cavi.py:126-151` and
  `poisson_mf_cavi.py:135-164`, restricted to head edges):

      R = Theta @ Beta^T                       (rate per cell)
      W = where(M > 0, X / max(R, floor), 0)   (allocation weight per cell)
      S_alloc[u] = theta_u * (W @ Beta)[u]     (sum_i x * theta*beta / rate)
      S_other[u] = (M @ Beta)[u]               (sum_i beta over edges)

  and transposed contractions of the SAME row-chunked arrays give the
  item-side statistics — no transposed copy of X is stored.

Everything here is plain XLA (lax.scan over row chunks of X so no
(hu, hip) f32 intermediate outlives a chunk); precision "high"/"mid" use
HIGHEST-precision (f32-exact) dots — stricter than the edge kernel's
bf16x3 — and "fast" uses one-pass bf16 like the edge kernel's fast tier.

Duplicate (u, i) edges are exact: rate is identical across duplicates, so
sum_e x_e / rate == X_cell / rate, and M carries multiplicity for the
linear statistics.  Cells with x == 0 but an edge present contribute to
S_other only (W == 0 there but M > 0) — matching the edge engines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pmf_tpu.data.blocked import DenseHead


def _prec(precision: str):
    return (
        jax.lax.Precision.DEFAULT
        if precision in ("fast", "fast_bf16")
        else jax.lax.Precision.HIGHEST
    )


def _chunks(head: DenseHead, theta_h: jax.Array):
    """Row-chunked scan inputs: (theta, x_hi, m[, x_lo]) per chunk."""
    nc = head.hu // head.r0
    r0 = head.r0
    xs = [
        theta_h.reshape(nc, r0, -1),
        head.x_hi.reshape(nc, r0, -1),
        head.m.reshape(nc, r0, -1),
    ]
    if head.x_lo is not None:
        xs.append(head.x_lo.reshape(nc, r0, -1))
    return tuple(xs)


def _cell_arrays(chunk):
    th, xh, mm, *lo = chunk
    x32 = xh.astype(jnp.float32)
    if lo:
        x32 = x32 + lo[0].astype(jnp.float32)
    return th, x32, mm.astype(jnp.float32)


def poisson_head_stats(
    theta_h: jax.Array,
    beta_h: jax.Array,
    head: DenseHead,
    rate_floor: float,
    precision: str = "high",
):
    """User-side head statistics: (S_alloc, S_other), both (hu, K).

    theta_h: (hu, K) head-user rows, beta_h: (hip, K) head-item rows
    (zero-padded past hi), both in NEW (count-reordered) id space."""
    prec = _prec(precision)
    K = theta_h.shape[1]
    floor = jnp.float32(rate_floor)

    def body(_, chunk):
        th, x32, m32 = _cell_arrays(chunk)
        R = jax.lax.dot_general(
            th, beta_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        W = jnp.where(m32 > 0, x32 / jnp.maximum(R, floor), 0.0)
        sa = th * jax.lax.dot(W, beta_h, preferred_element_type=jnp.float32,
                              precision=prec)
        so = jax.lax.dot(m32, beta_h, preferred_element_type=jnp.float32,
                         precision=prec)
        return None, (sa, so)

    _, (sa, so) = jax.lax.scan(body, None, _chunks(head, theta_h))
    return sa.reshape(head.hu, K), so.reshape(head.hu, K)


def poisson_head_stats_t(
    theta_h: jax.Array,
    beta_h: jax.Array,
    head: DenseHead,
    rate_floor: float,
    precision: str = "high",
):
    """Item-side head statistics via transposed contractions of the same
    row-chunked arrays: (S_alloc, S_other), both (hip, K) — rows past hi
    are exact zeros (M is zero there)."""
    prec = _prec(precision)
    K = theta_h.shape[1]
    hip = head.m.shape[1]
    floor = jnp.float32(rate_floor)
    contract0 = (((0,), (0,)), ((), ()))

    def body(carry, chunk):
        sa, so = carry
        th, x32, m32 = _cell_arrays(chunk)
        R = jax.lax.dot_general(
            th, beta_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        W = jnp.where(m32 > 0, x32 / jnp.maximum(R, floor), 0.0)
        sa = sa + jax.lax.dot_general(
            W, th, contract0, preferred_element_type=jnp.float32, precision=prec
        )
        so = so + jax.lax.dot_general(
            m32, th, contract0, preferred_element_type=jnp.float32, precision=prec
        )
        return (sa, so), None

    zeros = jnp.zeros((hip, K), jnp.float32)
    (sa, so), _ = jax.lax.scan(body, (zeros, zeros), _chunks(head, theta_h))
    return beta_h * sa, so


def ext_head_stats(
    theta_h: jax.Array,
    beta_h: jax.Array,
    sbeta_h: jax.Array,
    head: DenseHead,
    rate_floor: float,
    precision: str = "high",
):
    """Extended-Poisson user-side head statistics: (S_alloc, S_wother),
    both (hu, K).  The multinomial allocation denominator is the factor
    dot alone (the scalar factors cancel across k —
    `/root/reference/src/models/poisson_mf_extended_cavi.py:127-136`), so
    S_alloc matches the plain form; the rate statistic is psi-weighted:
    S_wother = M @ (s_other * Beta), with sbeta_h = s_other[:, None] *
    beta_h precomputed by the caller."""
    prec = _prec(precision)
    K = theta_h.shape[1]
    floor = jnp.float32(rate_floor)

    def body(_, chunk):
        th, x32, m32 = _cell_arrays(chunk)
        R = jax.lax.dot_general(
            th, beta_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        W = jnp.where(m32 > 0, x32 / jnp.maximum(R, floor), 0.0)
        sa = th * jax.lax.dot(W, beta_h, preferred_element_type=jnp.float32,
                              precision=prec)
        sw = jax.lax.dot(m32, sbeta_h, preferred_element_type=jnp.float32,
                         precision=prec)
        return None, (sa, sw)

    _, (sa, sw) = jax.lax.scan(body, None, _chunks(head, theta_h))
    return sa.reshape(head.hu, K), sw.reshape(head.hu, K)


def ext_head_stats_t(
    theta_h: jax.Array,
    beta_h: jax.Array,
    stheta_h: jax.Array,
    head: DenseHead,
    rate_floor: float,
    precision: str = "high",
):
    """Extended-Poisson item-side head statistics: (S_alloc, S_wother),
    both (hip, K); stheta_h = s_other[:, None] * theta_h (user scalars)."""
    prec = _prec(precision)
    K = theta_h.shape[1]
    hip = head.m.shape[1]
    floor = jnp.float32(rate_floor)
    contract0 = (((0,), (0,)), ((), ()))
    nc = head.hu // head.r0
    xs = _chunks(head, theta_h) + (stheta_h.reshape(nc, head.r0, -1),)

    def body(carry, chunk):
        sa, sw = carry
        th, x32, m32 = _cell_arrays(chunk[:-1])
        st = chunk[-1]
        R = jax.lax.dot_general(
            th, beta_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        W = jnp.where(m32 > 0, x32 / jnp.maximum(R, floor), 0.0)
        sa = sa + jax.lax.dot_general(
            W, th, contract0, preferred_element_type=jnp.float32, precision=prec
        )
        sw = sw + jax.lax.dot_general(
            m32, st, contract0, preferred_element_type=jnp.float32, precision=prec
        )
        return (sa, sw), None

    zeros = jnp.zeros((hip, K), jnp.float32)
    (sa, sw), _ = jax.lax.scan(body, (zeros, zeros), xs)
    return beta_h * sa, sw


def _xm_chunks(head: DenseHead):
    """Row-chunked (x_hi, m[, x_lo]) scan inputs (no self table)."""
    nc = head.hu // head.r0
    r0 = head.r0
    xs = [head.x_hi.reshape(nc, r0, -1), head.m.reshape(nc, r0, -1)]
    if head.x_lo is not None:
        xs.append(head.x_lo.reshape(nc, r0, -1))
    return tuple(xs)


def _xm32(chunk):
    xh, mm, *lo = chunk
    x32 = xh.astype(jnp.float32)
    if lo:
        x32 = x32 + lo[0].astype(jnp.float32)
    return x32, mm.astype(jnp.float32)


def head_products(
    head: DenseHead,
    other_tab: jax.Array,
    x_tab: jax.Array,
    precision: str = "high",
):
    """LINEAR user-side head statistics: (M @ other_tab, X @ x_tab).

    other_tab: (hip, W) per-head-item payload, x_tab: (hip, Wx) or None.
    Every Gaussian-family edge statistic is linear in per-other-row
    payloads with coefficient 1 (multiplicity) or x, so these two products
    cover them all.  Returns ((hu, W), (hu, Wx) or None)."""
    prec = _prec(precision)

    def body(_, chunk):
        x32, m32 = _xm32(chunk)
        mp = jax.lax.dot(m32, other_tab, preferred_element_type=jnp.float32,
                         precision=prec)
        xp = (
            None
            if x_tab is None
            else jax.lax.dot(x32, x_tab, preferred_element_type=jnp.float32,
                             precision=prec)
        )
        return None, (mp, xp)

    _, (mp, xp) = jax.lax.scan(body, None, _xm_chunks(head))
    return (
        mp.reshape(head.hu, -1),
        None if x_tab is None else xp.reshape(head.hu, -1),
    )


def head_products_t(
    head: DenseHead,
    self_tab: jax.Array,
    x_tab: jax.Array,
    precision: str = "high",
):
    """LINEAR item-side head statistics: (M^T @ self_tab, X^T @ x_tab)
    via transposed contractions of the row-chunked cell arrays.

    self_tab: (hu, W) per-head-user payload, x_tab: (hu, Wx) or None.
    Returns ((hip, W), (hip, Wx) or None); rows past hi are exact zeros."""
    prec = _prec(precision)
    nc = head.hu // head.r0
    r0 = head.r0
    hip = head.m.shape[1]
    contract0 = (((0,), (0,)), ((), ()))
    with_x = x_tab is not None
    xs = _xm_chunks(head) + (self_tab.reshape(nc, r0, -1),)
    if with_x:
        xs = xs + (x_tab.reshape(nc, r0, -1),)

    def body(carry, chunk):
        mp, xp = carry
        n_tail = 2 if with_x else 1
        x32, m32 = _xm32(chunk[:-n_tail])
        st = chunk[-n_tail]
        mp = mp + jax.lax.dot_general(
            m32, st, contract0, preferred_element_type=jnp.float32, precision=prec
        )
        if with_x:
            xp = xp + jax.lax.dot_general(
                x32, chunk[-1], contract0, preferred_element_type=jnp.float32,
                precision=prec,
            )
        return (mp, xp), None

    init = (
        jnp.zeros((hip, self_tab.shape[1]), jnp.float32),
        jnp.zeros((hip, x_tab.shape[1]), jnp.float32) if with_x else None,
    )
    (mp, xp), _ = jax.lax.scan(body, init, xs)
    return mp, xp
