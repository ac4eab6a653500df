"""Evidence lower bounds for the CAVI model families.

The reference monitors only validation RMSE; it never computes the
objective its updates optimize.  These ELBOs make convergence measurable:

* Gaussian MF: the EXACT mean-field ELBO (conjugate model) with the
  biases as point (MAP) coordinates, matching the reference's update
  structure (it keeps only bias means, `gaussian_mf_cavi_bias.py:206-263`)
  — the full CAVI iteration is coordinate ascent on THIS objective, so it
  must increase monotonically every sweep (tested in
  tests/test_elbo.py::test_gaussian_elbo_monotone).
* Poisson MF / extended / HPF: the standard auxiliary-variable bound
  (Jensen over per-edge multinomial allocations), evaluated at the
  OPTIMAL allocations phi* ~ exp(E[log theta_k] + E[log beta_k]) — i.e.
  the tightest bound of this family for the current q.  (The reference's
  allocation step uses ratios of means instead of geometric means, so
  per-sweep monotonicity of this bound is empirical, not guaranteed;
  in practice it increases.)

All edge terms stream in chunks (no (nnz, K^2) intermediates).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from pmf_tpu.ops.segment import edge_dot, gather_rows

_LOG2PI = 1.8378770664093453


def _kl_gamma(a, b, a0, b0):
    """KL(Gamma(a, b) || Gamma(a0, b0)), summed over all entries."""
    return jnp.sum(
        (a - a0) * digamma(a)
        - gammaln(a)
        + gammaln(a0)
        + a0 * (jnp.log(b) - jnp.log(b0))
        + a * (b0 - b) / b
    )


def _kl_gaussian_full(m, V, eta2):
    """KL(N(m, V) || N(0, eta2 I)), summed over rows; V (R, K, K)."""
    K = m.shape[1]
    chol = jnp.linalg.cholesky(V)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)))
    tr = jnp.sum(jnp.trace(V, axis1=1, axis2=2))
    sq = jnp.sum(m * m)
    R = m.shape[0]
    return 0.5 * ((tr + sq) / eta2 - R * K + R * K * jnp.log(eta2) - logdet)


def _kl_gaussian_diag(m, v, eta2):
    return 0.5 * jnp.sum(v / eta2 + m * m / eta2 - 1.0 + jnp.log(eta2) - jnp.log(v))


def _auto_chunks(nnz: int, width: int) -> int:
    """Chunk count keeping per-chunk gathered intermediates ~<= 64 MB."""
    per_chunk = max((1 << 24) // max(width, 1), 1 << 12)
    return max(8, -(-nnz // per_chunk))


@partial(jax.jit, static_argnames=("use_bias", "covariance", "n_chunks"))
def gaussian_elbo(
    state: dict,
    u: jax.Array,
    i: jax.Array,
    x: jax.Array,
    sigma2: float,
    eta_theta2: float,
    eta_beta2: float,
    eta_bias2: float,
    use_bias: bool = True,
    covariance: str = "full",
    n_chunks: int = 8,
):
    """Exact ELBO of the Gaussian mean-field posterior (biases as MAP
    coordinates; their Gaussian prior enters as a penalty).  x must be on
    the centered scale used by fit()."""
    m_t, m_b = state["m_theta"], state["m_beta"]
    V_t, V_b = state["V_theta"], state["V_beta"]
    dtype = m_t.dtype
    K = m_t.shape[1]
    nnz = u.shape[0]

    if covariance == "full":
        A_t = (V_t + m_t[:, :, None] * m_t[:, None, :]).reshape(-1, K * K)
        A_b = (V_b + m_b[:, :, None] * m_b[:, None, :]).reshape(-1, K * K)
    else:
        sq_t = V_t + m_t * m_t
        sq_b = V_b + m_b * m_b

    pad = (-nnz) % n_chunks
    up = jnp.pad(u, (0, pad), constant_values=0)
    ip = jnp.pad(i, (0, pad), constant_values=0)
    xp = jnp.pad(x, (0, pad))
    wp = jnp.pad(jnp.ones((nnz,), dtype), (0, pad))  # padding weight 0
    L = up.shape[0] // n_chunks
    chunks = (up.reshape(n_chunks, L), ip.reshape(n_chunks, L),
              xp.reshape(n_chunks, L), wp.reshape(n_chunks, L))

    def body(acc, ch):
        cu, ci, cx, cw = ch
        mu = gather_rows(m_t, cu)
        mi = gather_rows(m_b, ci)
        r = cx
        if use_bias:
            r = r - gather_rows(state["b_user"], cu) - gather_rows(state["b_item"], ci)
        pred = edge_dot(mu, mi)
        if covariance == "full":
            tr = edge_dot(gather_rows(A_t, cu), gather_rows(A_b, ci))
        else:
            # E[(theta^T beta)^2] under fully factorized q:
            # sum_k sq_t sq_b + sum_{k != l} m_t m_b (k) m_t m_b (l)
            st = gather_rows(sq_t, cu)
            sb = gather_rows(sq_b, ci)
            mm = mu * mi
            tr = edge_dot(st, sb) + pred * pred - edge_dot(mm, mm)
        e_sq = r * r - 2.0 * r * pred + tr
        return acc + jnp.sum(cw * e_sq), None

    sum_sq, _ = jax.lax.scan(body, jnp.zeros((), dtype), chunks)
    ll = -0.5 * nnz * (_LOG2PI + jnp.log(jnp.asarray(sigma2, dtype))) \
        - sum_sq / (2.0 * sigma2)

    if covariance == "full":
        kl = _kl_gaussian_full(m_t, V_t, eta_theta2) + _kl_gaussian_full(
            m_b, V_b, eta_beta2)
    else:
        kl = _kl_gaussian_diag(m_t, V_t, eta_theta2) + _kl_gaussian_diag(
            m_b, V_b, eta_beta2)

    elbo = ll - kl
    if use_bias:
        bu, bi = state["b_user"], state["b_item"]
        elbo = elbo - jnp.sum(bu * bu) / (2.0 * eta_bias2) \
            - jnp.sum(bi * bi) / (2.0 * eta_bias2) \
            - 0.5 * (bu.shape[0] + bi.shape[0]) * (
                _LOG2PI + jnp.log(jnp.asarray(eta_bias2, dtype)))
    return elbo


def _poisson_edge_bound(Elog_t, Elog_b, E_t, E_b, u, i, x, extra_log=None,
                        extra_mean=None, n_chunks: int = 8):
    """sum_e [ x_e * (logsumexp_k(Elog terms) [+ extra_log_e])
               - E[lambda_e] ] - log Gamma(x_e + 1), streamed in chunks."""
    dtype = E_t.dtype
    nnz = u.shape[0]
    pad = (-nnz) % n_chunks
    up = jnp.pad(u, (0, pad), constant_values=0)
    ip = jnp.pad(i, (0, pad), constant_values=0)
    xp = jnp.pad(x, (0, pad))
    wp = jnp.pad(jnp.ones((nnz,), dtype), (0, pad))
    L = up.shape[0] // n_chunks
    chunks = (up.reshape(n_chunks, L), ip.reshape(n_chunks, L),
              xp.reshape(n_chunks, L), wp.reshape(n_chunks, L))

    def body(acc, ch):
        cu, ci, cx, cw = ch
        s = gather_rows(Elog_t, cu) + gather_rows(Elog_b, ci)  # (L, K)
        logz = jax.scipy.special.logsumexp(s, axis=1)
        lam = edge_dot(gather_rows(E_t, cu), gather_rows(E_b, ci))
        if extra_log is not None:
            logz = logz + extra_log[0][cu] + extra_log[1][ci]
            lam = lam * extra_mean[0][cu] * extra_mean[1][ci]
        term = cx * logz - lam - gammaln(cx + 1.0)
        return acc + jnp.sum(cw * term), None

    out, _ = jax.lax.scan(body, jnp.zeros((), dtype), chunks)
    return out


@partial(jax.jit, static_argnames=("extended", "n_chunks"))
def poisson_elbo(state, u, i, x, a0: float, b0: float, extended: bool = False,
                 n_chunks: int = 8):
    """Auxiliary-variable ELBO of (extended) Poisson MF at the optimal
    per-edge allocations."""
    a_t, b_t = state["a_theta"], state["b_theta"]
    a_b, b_b = state["a_beta"], state["b_beta"]
    Elog_t = digamma(a_t) - jnp.log(b_t)
    Elog_b = digamma(a_b) - jnp.log(b_b)
    E_t, E_b = a_t / b_t, a_b / b_b

    extra_log = extra_mean = None
    kl = _kl_gamma(a_t, b_t, a0, b0) + _kl_gamma(a_b, b_b, a0, b0)
    if extended:
        a_p, b_p = state["a_phi"], state["b_phi"]
        a_s, b_s = state["a_psi"], state["b_psi"]
        extra_log = (digamma(a_p) - jnp.log(b_p), digamma(a_s) - jnp.log(b_s))
        extra_mean = (a_p / b_p, a_s / b_s)
        kl = kl + _kl_gamma(a_p, b_p, a0, b0) + _kl_gamma(a_s, b_s, a0, b0)

    ll = _poisson_edge_bound(Elog_t, Elog_b, E_t, E_b, u, i, x,
                             extra_log, extra_mean, n_chunks)
    return ll - kl


@partial(jax.jit, static_argnames=("n_chunks",))
def hpf_elbo(state, u, i, x, a: float, a_prime: float, b_prime: float,
             c: float, c_prime: float, d_prime: float, n_chunks: int = 8):
    """Auxiliary-variable ELBO of HPF (Gopalan et al. structure) at the
    optimal per-edge allocations, including the hierarchical xi/eta terms."""
    a_t, b_t = state["a_theta"], state["b_theta"]
    a_b, b_b = state["a_beta"], state["b_beta"]
    K = a_t.shape[1]
    a_xi = a_prime + K * a
    a_eta = c_prime + K * c
    b_xi, b_eta = state["b_xi"], state["b_eta"]

    Elog_t = digamma(a_t) - jnp.log(b_t)
    Elog_b = digamma(a_b) - jnp.log(b_b)
    E_t, E_b = a_t / b_t, a_b / b_b
    Elog_xi = digamma(a_xi) - jnp.log(b_xi)
    E_xi = a_xi / b_xi
    Elog_eta = digamma(a_eta) - jnp.log(b_eta)
    E_eta = a_eta / b_eta

    ll = _poisson_edge_bound(Elog_t, Elog_b, E_t, E_b, u, i, x,
                             n_chunks=n_chunks)

    def gamma_entropy(sa, sb):
        return jnp.sum(sa - jnp.log(sb) + gammaln(sa) + (1.0 - sa) * digamma(sa))

    # E log p(theta | a, xi) - E log q(theta)   (rate = xi_u per row)
    p_theta = jnp.sum(
        a * Elog_xi[:, None] + (a - 1.0) * Elog_t - E_xi[:, None] * E_t
        - gammaln(a)
    )
    p_beta = jnp.sum(
        c * Elog_eta[:, None] + (c - 1.0) * Elog_b - E_eta[:, None] * E_b
        - gammaln(c)
    )
    p_xi = jnp.sum(
        a_prime * jnp.log(b_prime) + (a_prime - 1.0) * Elog_xi
        - b_prime * E_xi - gammaln(a_prime)
    )
    p_eta = jnp.sum(
        c_prime * jnp.log(d_prime) + (c_prime - 1.0) * Elog_eta
        - d_prime * E_eta - gammaln(c_prime)
    )
    # + Gamma entropies (-E log q) for all four variational factor groups.
    return (
        ll + p_theta + p_beta + p_xi + p_eta
        + gamma_entropy(a_t, b_t) + gamma_entropy(a_b, b_b)
        + gamma_entropy(a_xi, b_xi) + gamma_entropy(a_eta, b_eta)
    )
