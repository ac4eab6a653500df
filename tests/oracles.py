"""Independent NumPy oracles for the CAVI update rules.

These are written directly from the model math (docs/Models.tex in the
reference; Gopalan et al. 2013 for HPF) as straightforward dense loops, and
serve as golden references for the JAX implementations.  They intentionally
share nothing with pmf_tpu's vectorized formulation: per-row Python loops,
explicit observation masks, no COO layout.
"""

from __future__ import annotations

import numpy as np


def _obs_of(ids, n):
    """obs[r] = array of edge positions whose id == r."""
    out = [[] for _ in range(n)]
    for pos, r in enumerate(ids):
        out[r].append(pos)
    return [np.asarray(o, dtype=int) for o in out]


def gaussian_cavi(u, i, x, K, sigma2, eta_t2, eta_b2, eta_bias2, n_iter, seed, use_bias):
    """Row-by-row Gaussian CAVI with full covariances, optional biases."""
    N, M = int(u.max()) + 1, int(i.max()) + 1
    rng = np.random.default_rng(seed)
    mt = 0.1 * rng.standard_normal((N, K))
    mb = 0.1 * rng.standard_normal((M, K))
    Vt = np.tile(np.eye(K), (N, 1, 1))
    Vb = np.tile(np.eye(K), (M, 1, 1))
    bu = np.zeros(N)
    bi = np.zeros(M)
    uo, io = _obs_of(u, N), _obs_of(i, M)

    for _ in range(n_iter):
        for r in range(N):
            sel = uo[r]
            if sel.size == 0:
                continue
            js, xs = i[sel], x[sel]
            res = xs - bu[r] - bi[js] if use_bias else xs
            second_moms = Vb[js] + mb[js][:, :, None] * mb[js][:, None, :]
            prec = np.eye(K) / eta_t2 + second_moms.sum(0) / sigma2
            V = np.linalg.inv(prec)
            mt[r] = V @ (mb[js] * res[:, None]).sum(0) / sigma2
            Vt[r] = V
        for r in range(M):
            sel = io[r]
            if sel.size == 0:
                continue
            us, xs = u[sel], x[sel]
            res = xs - bu[us] - bi[r] if use_bias else xs
            second_moms = Vt[us] + mt[us][:, :, None] * mt[us][:, None, :]
            prec = np.eye(K) / eta_b2 + second_moms.sum(0) / sigma2
            V = np.linalg.inv(prec)
            mb[r] = V @ (mt[us] * res[:, None]).sum(0) / sigma2
            Vb[r] = V
        if use_bias:
            for r in range(N):
                sel = uo[r]
                if sel.size == 0:
                    continue
                js, xs = i[sel], x[sel]
                res = xs - bi[js] - mb[js] @ mt[r]
                lam = 1.0 / eta_bias2 + sel.size / sigma2
                bu[r] = res.sum() / (lam * sigma2)
            for r in range(M):
                sel = io[r]
                if sel.size == 0:
                    continue
                us, xs = u[sel], x[sel]
                res = xs - bu[us] - mt[us] @ mb[r]
                lam = 1.0 / eta_bias2 + sel.size / sigma2
                bi[r] = res.sum() / (lam * sigma2)
    return dict(m_theta=mt, V_theta=Vt, m_beta=mb, V_beta=Vb, b_user=bu, b_item=bi)


def poisson_cavi(u, i, x, K, a0, b0, n_iter, seed):
    """Row-by-row plain Poisson CAVI."""
    N, M = int(u.max()) + 1, int(i.max()) + 1
    rng = np.random.default_rng(seed)
    at = a0 + rng.gamma(1.0, 0.1, size=(N, K))
    ab = a0 + rng.gamma(1.0, 0.1, size=(M, K))
    bt = np.full((N, K), b0)
    bb = np.full((M, K), b0)
    Et, Eb = at / bt, ab / bb
    uo, io = _obs_of(u, N), _obs_of(i, M)

    for _ in range(n_iter):
        for r in range(N):
            sel = uo[r]
            if sel.size == 0:
                at[r], bt[r] = a0, b0
                continue
            js, xs = i[sel], x[sel]
            lam = np.maximum(Eb[js] @ Et[r], 1e-10)
            at[r] = a0 + ((xs / lam)[:, None] * Eb[js] * Et[r]).sum(0)
            bt[r] = b0 + Eb[js].sum(0)
        Et = at / bt
        for r in range(M):
            sel = io[r]
            if sel.size == 0:
                ab[r], bb[r] = a0, b0
                continue
            us, xs = u[sel], x[sel]
            lam = np.maximum(Et[us] @ Eb[r], 1e-10)
            ab[r] = a0 + ((xs / lam)[:, None] * Et[us] * Eb[r]).sum(0)
            bb[r] = b0 + Et[us].sum(0)
        Eb = ab / bb
    return dict(a_theta=at, b_theta=bt, a_beta=ab, b_beta=bb, E_theta=Et, E_beta=Eb)


def poisson_extended_cavi(u, i, x, K, a0, b0, n_iter, seed):
    """Row-by-row extended Poisson CAVI with scalar activity factors and
    the per-row Gauss-Seidel refresh of the reference."""
    N, M = int(u.max()) + 1, int(i.max()) + 1
    rng = np.random.default_rng(seed)
    at = a0 + rng.gamma(1.0, 0.1, size=(N, K))
    ab = a0 + rng.gamma(1.0, 0.1, size=(M, K))
    aphi = a0 + rng.gamma(1.0, 0.1, size=N)
    apsi = a0 + rng.gamma(1.0, 0.1, size=M)
    bt = np.full((N, K), b0)
    bb = np.full((M, K), b0)
    bphi = np.full(N, b0)
    bpsi = np.full(M, b0)
    Et, Eb = at / bt, ab / bb
    Ephi, Epsi = aphi / bphi, apsi / bpsi
    uo, io = _obs_of(u, N), _obs_of(i, M)

    for _ in range(n_iter):
        for r in range(N):
            sel = uo[r]
            if sel.size == 0:
                at[r], bt[r] = a0, b0
                aphi[r], bphi[r] = a0, b0
                continue
            js, xs = i[sel], x[sel]
            dot = np.maximum(Eb[js] @ Et[r], 1e-10)
            at[r] = a0 + ((xs / dot)[:, None] * Eb[js] * Et[r]).sum(0)
            bt[r] = b0 + (Eb[js] * Epsi[js][:, None]).sum(0)
            Et[r] = at[r] / bt[r]
            aphi[r] = a0 + xs.sum()
            bphi[r] = b0 + (Epsi[js] * (Eb[js] @ Et[r])).sum()
            Ephi[r] = aphi[r] / bphi[r]
        for r in range(M):
            sel = io[r]
            if sel.size == 0:
                ab[r], bb[r] = a0, b0
                apsi[r], bpsi[r] = a0, b0
                continue
            us, xs = u[sel], x[sel]
            dot = np.maximum(Et[us] @ Eb[r], 1e-10)
            ab[r] = a0 + ((xs / dot)[:, None] * Et[us] * Eb[r]).sum(0)
            bb[r] = b0 + (Et[us] * Ephi[us][:, None]).sum(0)
            Eb[r] = ab[r] / bb[r]
            apsi[r] = a0 + xs.sum()
            bpsi[r] = b0 + (Ephi[us] * (Et[us] @ Eb[r])).sum()
            Epsi[r] = apsi[r] / bpsi[r]
    return dict(
        E_theta=Et, E_beta=Eb, E_phi=Ephi, E_psi=Epsi,
        a_theta=at, b_theta=bt, a_beta=ab, b_beta=bb,
        a_phi=aphi, b_phi=bphi, a_psi=apsi, b_psi=bpsi,
    )


def hpf_cavi(u, i, x, K, a, a_p, b_p, c, c_p, d_p, n_iter, seed):
    """Row-by-row HPF CAVI with the theta->xi->beta->eta block order."""
    N, M = int(u.max()) + 1, int(i.max()) + 1
    rng = np.random.default_rng(seed)
    at = a + rng.gamma(1.0, 0.1, size=(N, K))
    bt = b_p + rng.gamma(1.0, 0.1, size=(N, K))
    ab = c + rng.gamma(1.0, 0.1, size=(M, K))
    bb = d_p + rng.gamma(1.0, 0.1, size=(M, K))
    a_xi = a_p + K * a
    a_eta = c_p + K * c
    bxi = np.full(N, b_p)
    beta_rate = np.full(M, d_p)
    Et, Eb = at / bt, ab / bb
    Exi, Eeta = a_xi / bxi, a_eta / beta_rate
    uo, io = _obs_of(u, N), _obs_of(i, M)

    for _ in range(n_iter):
        for r in range(N):
            sel = uo[r]
            if sel.size == 0:
                at[r], bt[r] = a, Exi[r]
                continue
            js, xs = i[sel], x[sel]
            lam = np.maximum(Eb[js] @ Et[r], 1e-10)
            at[r] = a + ((xs / lam)[:, None] * Eb[js] * Et[r]).sum(0)
            bt[r] = Exi[r] + Eb[js].sum(0)
        Et = at / bt
        bxi = b_p + Et.sum(1)
        Exi = a_xi / bxi
        for r in range(M):
            sel = io[r]
            if sel.size == 0:
                ab[r], bb[r] = c, Eeta[r]
                continue
            us, xs = u[sel], x[sel]
            lam = np.maximum(Et[us] @ Eb[r], 1e-10)
            ab[r] = c + ((xs / lam)[:, None] * Et[us] * Eb[r]).sum(0)
            bb[r] = Eeta[r] + Et[us].sum(0)
        Eb = ab / bb
        beta_rate = d_p + Eb.sum(1)
        Eeta = a_eta / beta_rate
    return dict(
        a_theta=at, b_theta=bt, a_beta=ab, b_beta=bb,
        b_xi=bxi, b_eta=beta_rate, E_theta=Et, E_beta=Eb,
    )
