"""Fused Gaussian-CAVI edge-pass Pallas kernels (grouped, symmetric).

The Gaussian coordinate blocks need two sufficient statistics per self row
(`/root/reference/src/models/gaussian_mf_cavi_bias.py:132-201`):

    S_i = sum_{j in Omega_i} (V_j + m_j m_j^T)        (K, K)
    w_i = sum_{j in Omega_i} m_j * resid_ij           (K,)
    resid_ij = x_ij [- b_self_i - b_other_j]

and the bias blocks need (`gaussian_mf_cavi_bias.py:206-263`):

    s_i = sum_{j in Omega_i} (x_ij - b_other_j - <m_self_i, m_other_j>)

Design (same blocked layout / segmentation / padding semantics as
`pmf_tpu.ops.pallas.cavi_edge`, including its G-chunks-per-grid-step
grouping):

* Every per-edge gather is a one-hot matmul over an AUGMENTED other-row
  table ``[m | triu(V + m m^T) | b]``.  The second moment is SYMMETRIC, so
  only its K(K+1)/2 upper triangle rides the payload — it is gathered and
  scattered untouched (pure pass-through), and the full (K, K) statistic is
  reconstructed once per self row after the pass.  This nearly halves the
  dominant matmul width vs the round-1 full-K^2 payload.
* The two statistics pack into ONE segment-sum matmul of width K + K(K+1)/2.
* Grid steps process groups of G chunks sharing a self block, amortizing
  per-step fixed cost (the round-1 Gaussian kernels ran one chunk per step,
  which left the narrow bias pass overhead-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pmf_tpu.data.blocked import BlockedPass
from pmf_tpu.ops.pallas.cavi_edge import _recombine, decompose_bf16
from pmf_tpu.ops.pallas.segmented import run_segmented

# Gaussian parts policy: the second-moment payload is K(K+1)/2 wide (still
# several 128-lane tiles), so each extra bf16 part costs real matmul tiles.
# "high" uses bf16x2 (~2e-5 statistic error — far below the 5e-4
# engine-parity gates); "highest" keeps Mosaic HIGHEST f32 dots for exact
# cross-checks.  Used by the bias/diag kernels (uniform payloads).
_PARTS = {"fast": 1, "mid": 2, "high": 2, "highest": 0}

# The factor kernel carries TWO payload sections with independent parts:
# (p_mb, p_A) = parts for the [m | b | x] section vs the wide triA section.
# "mid" keeps the w-statistic at bf16x2 (~2e-5) but lets the K(K+1)/2
# second-moment section ride a single bf16 part (~2e-3 A-stat error) —
# the dominant matmul width drops ~40% (docs/PERFORMANCE.md).
_FACTOR_PARTS = {"fast": (1, 1), "mid": (2, 1), "high": (2, 2),
                 "highest": (0, 0)}


def _tri_size(k: int) -> int:
    return k * (k + 1) // 2


@functools.lru_cache(maxsize=None)
def _tri_indices(k: int):
    """(flat upper-tri indices into K*K, and the (K,K)->tri gather map)."""
    idx = np.zeros((k, k), dtype=np.int32)
    flat = []
    t = 0
    for a in range(k):
        for b in range(a, k):
            idx[a, b] = t
            idx[b, a] = t
            flat.append(a * k + b)
            t += 1
    return np.asarray(flat, dtype=np.int32), idx


def pack_tri(A_flat: jax.Array, k: int) -> jax.Array:
    """(R, K*K) symmetric rows -> (R, K(K+1)/2) upper-triangle columns."""
    flat, _ = _tri_indices(k)
    return jnp.take(A_flat, jnp.asarray(flat), axis=1)


def unpack_tri(S_tri: jax.Array, k: int) -> jax.Array:
    """(R, K(K+1)/2) -> full symmetric (R, K, K)."""
    _, idx = _tri_indices(k)
    return jnp.take(S_tri, jnp.asarray(idx.reshape(-1)), axis=1).reshape(-1, k, k)


def _factor_kernel(
    sb_ref, ob_ref, loc_ref, x_ref, *rest,
    bs_self, bs_other, chunk_size, p_mb, p_A, highest, k, use_bias, group,
    with_bias_stats=False,
):
    """Grouped factor-stats kernel: G chunks sharing one self block.

    Pure other-side pass over a TWO-SECTION table [[m | b] x p_mb parts |
    triA x p_A parts]: the payload is [m*(x - b_other) | m | triA (| x |
    b)], so the b_self term needs NO per-edge self gather — the wrapper
    applies S_w = out_mresid - b_self * out_m per row after the pass
    (exact algebra: sum_j m_j (x - b_i - b_j) = sum_j m_j (x - b_j)
    - b_i sum m_j).  The gathered triA part columns are scattered AS
    PARTS (selection is exact; part sums recombine after the scatter) —
    the sections are lane-contiguous, so no strided per-part slicing is
    needed, unlike the interleaved-parts variant that measured 7% slower
    in round 2."""
    aug_refs = rest[:group]
    out_ref = rest[group]
    dtype = aug_refs[0].dtype
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    T = _tri_size(k)
    w_mb = (k + 1) * max(p_mb, 1)  # [m | b] section width in the table
    C = chunk_size
    G = group

    packed = loc_ref[:, :]  # (G*C, 1)
    sloc = jax.lax.shift_right_logical(packed, jnp.int32(16))
    oloc = jax.lax.bitwise_and(packed, jnp.int32(0xFFFF))
    xv = x_ref[:, :]

    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (G * C, bs_self), 1)
    ).astype(dtype)

    g_parts = []
    for g in range(G):
        onehot_og = (
            oloc[g * C : (g + 1) * C]
            == jax.lax.broadcasted_iota(jnp.int32, (C, bs_other), 1)
        ).astype(dtype)
        g_parts.append(
            jnp.dot(onehot_og, aug_refs[g][:], preferred_element_type=jnp.float32,
                    precision=prec)
        )
    g_aug = jnp.concatenate(g_parts, axis=0)  # (G*C, w_mb + T*p_A)
    mb = _recombine(g_aug[:, :w_mb], k + 1, max(p_mb, 1))
    m_e = mb[:, :k]
    b_e = mb[:, k : k + 1]
    tri_cols = g_aug[:, w_mb:]  # raw part columns, pure pass-through
    resid = xv - b_e if use_bias else xv

    c = pl.program_id(0)
    prev_sb = sb_ref[jnp.maximum(G * c - G, 0)]

    @pl.when((c == 0) | (sb_ref[G * c] != prev_sb))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # [m*resid | m | triA parts (| x | b)]; padding edges have all-zero
    # one-hot rows, so they contribute nothing regardless of resid.
    fr = jnp.concatenate([m_e * resid, m_e], axis=1)
    pieces = [fr if highest else decompose_bf16(fr, p_mb),
              tri_cols if highest else tri_cols.astype(jnp.bfloat16)]
    if with_bias_stats:
        # Extra [x | b_other] columns ride the same padded payload tiles:
        # the lagged-bias mode's whole edge cost.
        xb = jnp.concatenate([xv, b_e], axis=1)
        pieces.append(xb if highest else decompose_bf16(xb, p_mb))
    payload_in = jnp.concatenate(pieces, axis=1)
    contract = (((0,), (0,)), ((), ()))
    seg = jax.lax.dot_general(
        onehot_s, payload_in, contract, preferred_element_type=jnp.float32,
        precision=prec,
    )
    pm = 1 if highest else p_mb
    pa = 1 if highest else p_A
    a = 2 * k * pm
    outs = [_recombine(seg[:, :a], 2 * k, pm),
            _recombine(seg[:, a : a + T * pa], T, pa)]
    if with_bias_stats:
        outs.append(_recombine(seg[:, a + T * pa :], 2, pm))
    out_ref[:] += jnp.concatenate(outs, axis=1)


def _bias_kernel(
    sb_ref, ob_ref, loc_ref, x_ref, *rest,
    bs_self, bs_other, chunk_size, parts, highest, k, group,
):
    """Grouped bias-stats kernel: PURE pass-through payload [m | b | x].

    The bias residual sum decomposes per self row:
        s_i = sum_e x_e - sum_e b_other_e - <m_self_i, sum_e m_other_e>
    so no per-edge self gather or dot is needed in-kernel; the wrapper
    finishes the row-level correction after the pass."""
    aug_refs = rest[:group]
    out_ref = rest[group]
    dtype = aug_refs[0].dtype
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    C = chunk_size
    G = group

    packed = loc_ref[:, :]
    sloc = jax.lax.shift_right_logical(packed, jnp.int32(16))
    oloc = jax.lax.bitwise_and(packed, jnp.int32(0xFFFF))
    xv = x_ref[:, :]

    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (G * C, bs_self), 1)
    ).astype(dtype)

    g_parts = []
    for g in range(G):
        onehot_og = (
            oloc[g * C : (g + 1) * C]
            == jax.lax.broadcasted_iota(jnp.int32, (C, bs_other), 1)
        ).astype(dtype)
        g_parts.append(
            jnp.dot(onehot_og, aug_refs[g][:], preferred_element_type=jnp.float32,
                    precision=prec)
        )
    gcat = jnp.concatenate(g_parts, axis=0)  # (G*C, parts*(K+1)) part columns

    c = pl.program_id(0)
    prev_sb = sb_ref[jnp.maximum(G * c - G, 0)]

    @pl.when((c == 0) | (sb_ref[G * c] != prev_sb))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Payload = [m | b (both pure pass-through part columns) | x (computed,
    # decomposed)].
    contract = (((0,), (0,)), ((), ()))
    if highest:
        payload_in = jnp.concatenate(
            [_recombine(gcat, k + 1, parts), xv], axis=1)
    else:
        payload_in = jnp.concatenate(
            [gcat.astype(jnp.bfloat16), decompose_bf16(xv, parts)], axis=1)
    seg = jax.lax.dot_general(
        onehot_s, payload_in, contract, preferred_element_type=jnp.float32,
        precision=prec,
    )
    if highest:
        out_ref[:] += seg
    else:
        pw = parts * (k + 1)
        mb = _recombine(seg[:, :pw], k + 1, parts)
        xs = _recombine(seg[:, pw:], 1, parts)
        out_ref[:] += jnp.concatenate([mb, xs], axis=1)


def _diag_kernel(
    sb_ref, ob_ref, loc_ref, x_ref, self_ref, *rest,
    bs_self, bs_other, chunk_size, parts, highest, k, use_bias, group,
):
    """Diagonal-covariance factor kernel: per-edge Jacobi cross-term form
    (`pmf_tpu.models.gaussian_mf._factor_block_diag`).  Gathers the other
    rows' [m | v+m^2 | b] and the self rows' [m | b]; payload is only 3K
    wide — the mode built for ML-25M+ row counts where (rows, K, K)
    covariance storage/compute is infeasible."""
    aug_refs = rest[:group]
    out_ref = rest[group]
    dtype = aug_refs[0].dtype
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    w = 2 * k + 1  # [m | sq | b]
    C = chunk_size
    G = group

    packed = loc_ref[:, :]
    sloc = jax.lax.shift_right_logical(packed, jnp.int32(16))
    oloc = jax.lax.bitwise_and(packed, jnp.int32(0xFFFF))
    xv = x_ref[:, :]

    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (G * C, bs_self), 1)
    ).astype(dtype)

    g_parts = []
    for g in range(G):
        onehot_og = (
            oloc[g * C : (g + 1) * C]
            == jax.lax.broadcasted_iota(jnp.int32, (C, bs_other), 1)
        ).astype(dtype)
        g_parts.append(
            jnp.dot(onehot_og, aug_refs[g][:], preferred_element_type=jnp.float32,
                    precision=prec)
        )
    g_aug = _recombine(jnp.concatenate(g_parts, axis=0), w, parts)
    g_self = _recombine(
        jnp.dot(onehot_s, self_ref[:], preferred_element_type=jnp.float32,
                precision=prec),
        k + 1, parts,
    )
    m_o = g_aug[:, :k]
    sq_o = g_aug[:, k : 2 * k]
    pred = jnp.sum(g_self[:, :k] * m_o, axis=1, keepdims=True)
    if use_bias:
        resid = xv - g_self[:, k : k + 1] - g_aug[:, 2 * k : 2 * k + 1]
    else:
        resid = xv

    payload = jnp.concatenate([m_o * (resid - pred), sq_o, m_o * m_o], axis=1)
    payload_in = payload if highest else decompose_bf16(payload, parts)

    c = pl.program_id(0)
    prev_sb = sb_ref[jnp.maximum(G * c - G, 0)]

    @pl.when((c == 0) | (sb_ref[G * c] != prev_sb))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    contract = (((0,), (0,)), ((), ()))
    seg = jax.lax.dot_general(
        onehot_s, payload_in, contract, preferred_element_type=jnp.float32,
        precision=prec,
    )
    out_ref[:] += _recombine(seg, 3 * k, 1 if highest else parts)


def _gauss_head_out(
    tier, mb, tri, K, T, use_bias, with_bias_stats, precision, head_side,
    mesh=None,
):
    """One stair tier's dense contribution in the factor kernel's
    output-column layout [S_w' | S_m | triA | (S_x | S_b)] (S_w' excludes
    the b_self term, exactly like the kernel — the wrapper's row-level
    correction covers head edges too).  ``mb``/``tri`` are the PERMUTED
    (new-id space) f32 other-row tables.  Returns (start_row, out): the
    tier's user band [row_start, row_start + hu) on the user side, item
    rows [0, hi) on the item side."""
    from pmf_tpu.ops.dense_head import head_products, head_products_t

    rs = tier.row_start
    if head_side == "user":
        n_h = tier.hip
        sl = slice(0, tier.hi)  # other = top items, always from 0
    else:
        n_h = tier.hu
        sl = slice(rs, rs + tier.hu)  # other = this tier's user band
    mbf = mb[sl].astype(jnp.float32)
    take_n = mbf.shape[0]
    m_h = jnp.pad(mbf[:, :K], ((0, n_h - take_n), (0, 0)))
    b_h = jnp.pad(mbf[:, K], (0, n_h - take_n))
    tri_h = jnp.pad(
        tri[sl].astype(jnp.float32), ((0, n_h - take_n), (0, 0))
    )
    tab = jnp.concatenate(
        [m_h, b_h[:, None] * m_h, tri_h, b_h[:, None]], axis=1
    )
    if head_side == "user":
        mp, xp = head_products(tier, tab, m_h, precision, mesh=mesh)
        x_sum = tier.x_sum_user
        start = rs
    else:
        mp, xp = head_products_t(tier, tab, m_h, precision, mesh=mesh)
        mp, xp = mp[: tier.hi], xp[: tier.hi]
        x_sum = tier.x_sum_item[: tier.hi]
        start = 0
    S_w = xp - mp[:, K : 2 * K] if use_bias else xp
    cols = [S_w, mp[:, :K], mp[:, 2 * K : 2 * K + T]]
    if with_bias_stats:
        cols += [x_sum[:, None], mp[:, -1:]]
    return start, jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("use_bias", "precision", "interpret", "mesh",
                     "with_bias_stats", "head_side"),
)
def gaussian_factor_stats(
    m_other, V_other, b_self, b_other, p: BlockedPass,
    use_bias: bool = True, precision: str = "high", interpret: bool = False,
    mesh=None, with_bias_stats: bool = False, head=None,
    head_side: str = "user",
):
    """Return (S_w (n_self, K), S_A (n_self, K, K)) for one factor block.

    With ``with_bias_stats`` (lagged-bias mode) additionally return
    (S_m, S_x, S_b): per-self-row sums of m_other, x, and b_other — the
    bias-block sufficient statistics, collected for free on the factor
    pass's padded payload lanes (see `_factor_kernel`).

    ``head``: optional `DenseHead` of a hybrid layout (dense-corner edges
    excluded from ``p``); its statistics are pure linear products of the
    cell arrays (`pmf_tpu.ops.dense_head.head_products`)."""
    K = m_other.shape[1]
    T = _tri_size(K)
    n_other_pad = p.n_other_blocks * p.bs_other

    p_mb, p_A = _FACTOR_PARTS[precision]
    highest = p_mb == 0
    A_flat = (V_other + m_other[:, :, None] * m_other[:, None, :]).reshape(-1, K * K)
    mb = jnp.concatenate([m_other, b_other[:, None]], axis=1)
    tri = pack_tri(A_flat, K)
    if p.reordered:
        mb = jnp.take(mb, p.other_old_of_new, axis=0)
        tri = jnp.take(tri, p.other_old_of_new, axis=0)
    head_outs = []
    if head:
        if not p.reordered:
            raise ValueError("dense head requires a reordered layout")
        head_outs = [
            _gauss_head_out(
                tier, mb, tri, K, T, use_bias, with_bias_stats, precision,
                head_side, mesh=mesh,
            )
            for tier in head
        ]
    if not highest:
        mb = decompose_bf16(mb, p_mb)
        tri = decompose_bf16(tri, p_A)
    aug = jnp.concatenate([mb, tri], axis=1)
    aug = jnp.pad(aug, ((0, n_other_pad - aug.shape[0]), (0, 0)))

    if with_bias_stats and not use_bias:
        raise ValueError("with_bias_stats requires use_bias=True")
    kernel = functools.partial(
        _factor_kernel, bs_self=p.bs_self, bs_other=p.bs_other,
        chunk_size=p.chunk_size, p_mb=p_mb, p_A=p_A, highest=highest, k=K,
        use_bias=use_bias, group=p.group, with_bias_stats=with_bias_stats,
    )
    w_out = 2 * K + T + (2 if with_bias_stats else 0)
    out = run_segmented(kernel, p, None, aug, w_out,
                        interpret=interpret, mesh=mesh)
    for start, h_out in head_outs:
        out = out.at[start : start + h_out.shape[0]].add(h_out)
    if p.reordered:
        out = jnp.take(out, p.self_new_of_old, axis=0)
    S_w = out[:, :K]
    S_m = out[:, K : 2 * K]
    if use_bias:
        # sum_j m_j (x - b_i - b_j) = sum_j m_j (x - b_j) - b_i sum_j m_j
        S_w = S_w - b_self[:, None] * S_m
    S_A = unpack_tri(out[:, 2 * K : 2 * K + T], K)
    if with_bias_stats:
        return S_w, S_A, S_m, out[:, 2 * K + T], out[:, 2 * K + T + 1]
    return S_w, S_A


@functools.partial(
    jax.jit, static_argnames=("precision", "interpret", "mesh", "head_side")
)
def gaussian_bias_stats(
    m_self, m_other, b_other, p: BlockedPass,
    precision: str = "high", interpret: bool = False, mesh=None,
    head=None, head_side: str = "user",
):
    """Return s (n_self,): per-row sums of bias residuals
    sum_e (x_e - b_other_e - <m_self, m_other_e>), assembled from the
    pass-through row sums (see _bias_kernel).  ``head``: dense-corner
    contribution of a hybrid layout (linear: S_m = M @ m, S_b = M @ b,
    S_x static)."""
    K = m_self.shape[1]
    n_other_pad = p.n_other_blocks * p.bs_other
    parts = _PARTS[precision]
    highest = parts == 0
    parts = max(parts, 1)
    aug = jnp.concatenate([m_other, b_other[:, None]], axis=1)
    if p.reordered:
        aug = jnp.take(aug, p.other_old_of_new, axis=0)
    head_outs = []
    if head:
        from pmf_tpu.ops.dense_head import head_products, head_products_t

        for tier in head:
            rs = tier.row_start
            if head_side == "user":
                n_h, sl = tier.hip, slice(0, tier.hi)
            else:
                n_h, sl = tier.hu, slice(rs, rs + tier.hu)
            tabf = aug[sl].astype(jnp.float32)
            tab = jnp.pad(tabf, ((0, n_h - tabf.shape[0]), (0, 0)))
            if head_side == "user":
                mp, _ = head_products(tier, tab, None, precision, mesh=mesh)
                x_sum = tier.x_sum_user
                start = rs
            else:
                mp, _ = head_products_t(tier, tab, None, precision, mesh=mesh)
                mp = mp[: tier.hi]
                x_sum = tier.x_sum_item[: tier.hi]
                start = 0
            head_outs.append(
                (start, jnp.concatenate([mp, x_sum[:, None]], axis=1))
            )
    if not highest:
        aug = decompose_bf16(aug, parts)
    aug = jnp.pad(aug, ((0, n_other_pad - aug.shape[0]), (0, 0)))

    kernel = functools.partial(
        _bias_kernel, bs_self=p.bs_self, bs_other=p.bs_other,
        chunk_size=p.chunk_size, parts=parts, highest=highest, k=K,
        group=p.group,
    )
    out = run_segmented(kernel, p, None, aug, K + 2, interpret=interpret,
                        mesh=mesh)
    for start, h_out in head_outs:
        out = out.at[start : start + h_out.shape[0]].add(h_out)
    if p.reordered:
        out = jnp.take(out, p.self_new_of_old, axis=0)
    S_m, S_b, S_x = out[:, :K], out[:, K], out[:, K + 1]
    return S_x - S_b - jnp.sum(m_self * S_m, axis=1)

def _diag_head_out(tier, aug, selftab, K, use_bias, precision, head_side,
                   mesh=None):
    """One stair tier's dense contribution for the diag kernel's
    [S_mr | S_sq | S_mm] output.  The Jacobi cross term
    sum_e m_o <m_s, m_o> rides a packed tri(m_o m_o^T) payload column
    group: unpack(M @ tri_mm) @ m_self.  Returns (start_row, out)."""
    from pmf_tpu.ops.dense_head import head_products, head_products_t

    rs = tier.row_start
    if head_side == "user":
        n_h, sl = tier.hip, slice(0, tier.hi)
    else:
        n_h, sl = tier.hu, slice(rs, rs + tier.hu)
    augf = aug[sl].astype(jnp.float32)
    af = jnp.pad(augf, ((0, n_h - augf.shape[0]), (0, 0)))
    m_o = af[:, :K]
    sq_o = af[:, K : 2 * K]
    b_o = af[:, 2 * K]
    tri_mm = pack_tri(
        (m_o[:, :, None] * m_o[:, None, :]).reshape(-1, K * K), K
    )
    tab = jnp.concatenate(
        [m_o, b_o[:, None] * m_o, sq_o, m_o * m_o, tri_mm], axis=1
    )
    if head_side == "user":
        mp, xp = head_products(tier, tab, m_o, precision, mesh=mesh)
        rows = tier.hu
        start = rs
        self_sl = slice(rs, rs + rows)
    else:
        mp, xp = head_products_t(tier, tab, m_o, precision, mesh=mesh)
        mp, xp = mp[: tier.hi], xp[: tier.hi]
        rows = tier.hi
        start = 0
        self_sl = slice(0, rows)
    stf = selftab[self_sl].astype(jnp.float32)
    m_s = stf[:, :K]
    b_s = stf[:, K]
    S_m = mp[:, :K]
    S_bm = mp[:, K : 2 * K]
    S_sq = mp[:, 2 * K : 3 * K]
    S_mm = mp[:, 3 * K : 4 * K]
    pred_term = jnp.einsum(
        "rkl,rl->rk", unpack_tri(mp[:, 4 * K :], K), m_s
    )
    S_mr = xp - pred_term
    if use_bias:
        S_mr = S_mr - b_s[:, None] * S_m - S_bm
    return start, jnp.concatenate([S_mr, S_sq, S_mm], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("use_bias", "precision", "interpret", "mesh", "head_side"),
)
def gaussian_diag_stats(
    m_other, v_other, m_self, b_self, b_other, p: BlockedPass,
    use_bias: bool = True, precision: str = "high", interpret: bool = False,
    mesh=None, head=None, head_side: str = "user",
):
    """Return (S_mr, S_sq, S_mm), each (n_self, K), for one diag-covariance
    factor block: S_mr = sum m_o (resid - pred), S_sq = sum (v_o + m_o^2),
    S_mm = sum m_o^2.  ``head``: dense-corner contribution of a hybrid
    layout (all three statistics are linear in per-other payloads)."""
    K = m_other.shape[1]
    n_other_pad = p.n_other_blocks * p.bs_other
    n_self_pad = p.n_self_blocks * p.bs_self
    parts = _PARTS[precision]
    highest = parts == 0
    parts = max(parts, 1)
    aug = jnp.concatenate(
        [m_other, v_other + m_other * m_other, b_other[:, None]], axis=1
    )
    selftab = jnp.concatenate([m_self, b_self[:, None]], axis=1)
    if p.reordered:
        aug = jnp.take(aug, p.other_old_of_new, axis=0)
        selftab = jnp.take(selftab, p.self_old_of_new, axis=0)
    head_outs = []
    if head:
        head_outs = [
            _diag_head_out(tier, aug, selftab, K, use_bias, precision,
                           head_side, mesh=mesh)
            for tier in head
        ]
    if not highest:
        aug = decompose_bf16(aug, parts)
        selftab = decompose_bf16(selftab, parts)
    aug = jnp.pad(aug, ((0, n_other_pad - aug.shape[0]), (0, 0)))
    selftab = jnp.pad(selftab, ((0, n_self_pad - selftab.shape[0]), (0, 0)))

    kernel = functools.partial(
        _diag_kernel, bs_self=p.bs_self, bs_other=p.bs_other,
        chunk_size=p.chunk_size, parts=parts, highest=highest, k=K,
        use_bias=use_bias, group=p.group,
    )
    out = run_segmented(kernel, p, selftab, aug, 3 * K,
                        interpret=interpret, mesh=mesh)
    for start, h_out in head_outs:
        out = out.at[start : start + h_out.shape[0]].add(h_out)
    if p.reordered:
        out = jnp.take(out, p.self_new_of_old, axis=0)
    return out[:, :K], out[:, K : 2 * K], out[:, 2 * K :]
