"""Fused extended-Poisson CAVI edge-pass Pallas kernels.

The extended model (`/root/reference/src/models/poisson_mf_extended_cavi.py`)
adds scalar activity factors: x ~ Poisson(phi_u psi_i theta_u^T beta_i).
Each coordinate block needs, per self row (reference :110-164):

    S_alloc_k = sum_e  x_e * g_self_k g_other_k / <g_self, g_other>
    S_wother_k = sum_e s_other_e * g_other_k          (factor rate, psi-weighted)
    S_sdot    = sum_e s_other_e * <g_self_NEW, g_other>  (scalar rate,
                 Gauss-Seidel: uses the freshly updated factor row)

(The scalar shape's sum_e x_e is constant across iterations and is
precomputed host-side.)  Two kernel passes per block: the factor pass
produces [S_alloc | S_wother] (2K wide), rows update, then the scalar pass
produces S_sdot (width 1) with the NEW self rows.  Both gather the same
augmented other table [E_other | s_other] (K+1 wide).  Same blocked
layout, grouping, precision lanes, and segmentation as
`pmf_tpu.ops.pallas.cavi_edge` / `segmented.run_segmented`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pmf_tpu.data.blocked import BlockedPass
from pmf_tpu.ops.pallas.cavi_edge import _recombine, decompose_bf16
from pmf_tpu.ops.pallas.segmented import run_segmented

_PARTS = {"fast": 1, "fast_bf16": 1, "mid": 2, "high": 3, "highest": 1}


def _gather_edges(onehot_s, oloc, aug_refs, self_ref, w_other, w_self,
                  parts, prec, chunk_size, bs_other, group):
    """Shared gather: per-edge other-row group [E_other | s_other] and
    self-row values via one-hot matmuls."""
    g_parts = []
    for g in range(group):
        onehot_og = (
            oloc[g * chunk_size : (g + 1) * chunk_size]
            == jax.lax.broadcasted_iota(jnp.int32, (chunk_size, bs_other), 1)
        ).astype(aug_refs[0].dtype)
        g_parts.append(
            jnp.dot(onehot_og, aug_refs[g][:], preferred_element_type=jnp.float32,
                    precision=prec)
        )
    g_aug = _recombine(jnp.concatenate(g_parts, axis=0), w_other, parts)
    g_self = _recombine(
        jnp.dot(onehot_s, self_ref[:], preferred_element_type=jnp.float32,
                precision=prec),
        w_self, parts,
    )
    return g_aug, g_self


def _factor_kernel(
    sb_ref, ob_ref, loc_ref, x_ref, eself_ref, *rest,
    bs_self, bs_other, chunk_size, rate_floor, k, parts, highest, group,
):
    aug_refs = rest[:group]
    out_ref = rest[group]
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    C, G = chunk_size, group

    packed = loc_ref[:, :]
    sloc = jax.lax.shift_right_logical(packed, jnp.int32(16))
    oloc = jax.lax.bitwise_and(packed, jnp.int32(0xFFFF))
    xv = x_ref[:, :]
    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (G * C, bs_self), 1)
    ).astype(aug_refs[0].dtype)

    g_aug, g_self = _gather_edges(onehot_s, oloc, aug_refs, eself_ref,
                                  k + 1, k, parts, prec, C, bs_other, G)
    g_other = g_aug[:, :k]
    s_other = g_aug[:, k : k + 1]

    # Allocation divides by the UNWEIGHTED dot (the scalars cancel in the
    # multinomial allocation, reference :117-127).
    dot = jnp.maximum(
        jnp.sum(g_self * g_other, axis=1, keepdims=True),
        jnp.asarray(rate_floor, jnp.float32),
    )
    alloc = (xv / dot) * g_self * g_other

    payload = jnp.concatenate([alloc, g_other * s_other], axis=1)  # (G*C, 2K)
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
    out_ref[:] += _recombine(seg, 2 * k, 1 if highest else parts)


def _scalar_kernel(
    sb_ref, ob_ref, loc_ref, x_ref, eself_ref, *rest,
    bs_self, bs_other, chunk_size, k, parts, highest, group,
):
    aug_refs = rest[:group]
    out_ref = rest[group]
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    C, G = chunk_size, group

    packed = loc_ref[:, :]
    sloc = jax.lax.shift_right_logical(packed, jnp.int32(16))
    oloc = jax.lax.bitwise_and(packed, jnp.int32(0xFFFF))
    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (G * C, bs_self), 1)
    ).astype(aug_refs[0].dtype)

    g_aug, g_self_new = _gather_edges(onehot_s, oloc, aug_refs, eself_ref,
                                      k + 1, k, parts, prec, C, bs_other, G)
    v = g_aug[:, k : k + 1] * jnp.sum(g_self_new * g_aug[:, :k], axis=1,
                                      keepdims=True)

    c = pl.program_id(0)
    prev_sb = sb_ref[jnp.maximum(G * c - G, 0)]

    @pl.when((c == 0) | (sb_ref[G * c] != prev_sb))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    contract = (((0,), (0,)), ((), ()))
    v_in = v if highest else decompose_bf16(v, parts)
    seg = jax.lax.dot_general(
        onehot_s, v_in, contract, preferred_element_type=jnp.float32,
        precision=prec,
    )
    out_ref[:] += _recombine(seg, 1, 1 if highest else parts)


def _prep_tables(E_self, E_other, s_other, p: BlockedPass, parts, highest):
    aug = jnp.concatenate([E_other, s_other[:, None]], axis=1)
    e_self = E_self
    if p.reordered:
        aug = jnp.take(aug, p.other_old_of_new, axis=0)
        e_self = jnp.take(e_self, p.self_old_of_new, axis=0)
    if not highest:
        aug = decompose_bf16(aug, parts)
        e_self = decompose_bf16(e_self, parts)
    else:
        aug = aug.astype(jnp.float32)
        e_self = e_self.astype(jnp.float32)
    n_other_pad = p.n_other_blocks * p.bs_other
    n_self_pad = p.n_self_blocks * p.bs_self
    aug = jnp.pad(aug, ((0, n_other_pad - aug.shape[0]), (0, 0)))
    e_self = jnp.pad(e_self, ((0, n_self_pad - e_self.shape[0]), (0, 0)))
    return e_self, aug


def _head_perm(E_self, E_other, s_other, p):
    """Permute the raw f32 tables to NEW-id space once (tiers then slice)."""
    e_self = E_self
    e_other = E_other
    s_o = s_other
    if p.reordered:
        e_self = jnp.take(e_self, p.self_old_of_new, axis=0)
        e_other = jnp.take(e_other, p.other_old_of_new, axis=0)
        s_o = jnp.take(s_o, p.other_old_of_new, axis=0)
    return e_self, e_other, s_o


def _head_slices(e_self, e_other, s_o, tier, head_side):
    """One tier's NEW-space f32 head tables: (theta_h (hu, K),
    beta_h (hip, K), s_h) where s_h follows the 'other' axis of the pass."""
    hip = tier.hip
    rs = tier.row_start
    if head_side == "user":
        theta_h = e_self[rs : rs + tier.hu].astype(jnp.float32)
        beta_h = jnp.pad(e_other[: tier.hi].astype(jnp.float32),
                         ((0, hip - tier.hi), (0, 0)))
        s_h = jnp.pad(s_o[: tier.hi].astype(jnp.float32),
                      (0, hip - tier.hi))
    else:
        theta_h = e_other[rs : rs + tier.hu].astype(jnp.float32)
        beta_h = jnp.pad(e_self[: tier.hi].astype(jnp.float32),
                         ((0, hip - tier.hi), (0, 0)))
        s_h = s_o[rs : rs + tier.hu].astype(jnp.float32)
    return theta_h, beta_h, s_h


@functools.partial(
    jax.jit,
    static_argnames=("rate_floor", "precision", "interpret", "mesh",
                     "head_side"),
)
def ext_factor_stats(
    E_self, E_other, s_other, p: BlockedPass,
    rate_floor: float = 1e-10, precision: str = "high",
    interpret: bool = False, mesh=None, head=None, head_side: str = "user",
):
    """Return (S_alloc, S_wother), both (n_self, K).  ``head``: optional
    dense corner of a hybrid layout (`pmf_tpu.ops.dense_head.ext_head_stats`)."""
    K = E_self.shape[1]
    parts = _PARTS[precision]
    highest = precision == "highest"
    head_adds = []
    if head:
        from pmf_tpu.ops.dense_head import ext_head_stats, ext_head_stats_t

        es, eo, so = _head_perm(E_self, E_other, s_other, p)
        for tier in head:
            theta_h, beta_h, s_h = _head_slices(es, eo, so, tier, head_side)
            if head_side == "user":
                sa_h, sw_h = ext_head_stats(
                    theta_h, beta_h, s_h[:, None] * beta_h, tier, rate_floor,
                    precision, mesh=mesh,
                )
                head_adds.append(
                    (tier.row_start, jnp.concatenate([sa_h, sw_h], axis=1))
                )
            else:
                sa_h, sw_h = ext_head_stats_t(
                    theta_h, beta_h, s_h[:, None] * theta_h, tier, rate_floor,
                    precision, mesh=mesh,
                )
                head_adds.append(
                    (0, jnp.concatenate([sa_h[: tier.hi], sw_h[: tier.hi]],
                                        axis=1))
                )
    e_self, aug = _prep_tables(E_self, E_other, s_other, p, parts, highest)
    kernel = functools.partial(
        _factor_kernel, bs_self=p.bs_self, bs_other=p.bs_other,
        chunk_size=p.chunk_size, rate_floor=rate_floor, k=K, parts=parts,
        highest=highest, group=p.group,
    )
    out = run_segmented(kernel, p, e_self, aug, 2 * K,
                        interpret=interpret, mesh=mesh)
    for start, add in head_adds:
        out = out.at[start : start + add.shape[0]].add(add)
    if p.reordered:
        out = jnp.take(out, p.self_new_of_old, axis=0)
    return out[:, :K], out[:, K:]


@functools.partial(
    jax.jit, static_argnames=("precision", "interpret", "mesh", "head_side")
)
def ext_scalar_stats(
    E_self_new, E_other, s_other, p: BlockedPass,
    precision: str = "high", interpret: bool = False, mesh=None,
    head=None, head_side: str = "user",
):
    """Return S_sdot (n_self,): sum_e s_other_e * <E_self_new, E_other>.

    Head contribution reuses the linear product M @ (s_other * E_other):
    S_sdot_head = rowsum(E_self_new ∘ (M @ (s ∘ E_other)))."""
    K = E_self_new.shape[1]
    parts = _PARTS[precision]
    highest = precision == "highest"
    head_adds = []
    if head:
        from pmf_tpu.ops.dense_head import head_products, head_products_t

        es, eo, so = _head_perm(E_self_new, E_other, s_other, p)
        for tier in head:
            theta_h, beta_h, s_h = _head_slices(es, eo, so, tier, head_side)
            if head_side == "user":
                mp, _ = head_products(tier, s_h[:, None] * beta_h, None,
                                      precision, mesh=mesh)
                head_adds.append(
                    (tier.row_start,
                     jnp.sum(theta_h * mp, axis=1, keepdims=True))
                )
            else:
                mp, _ = head_products_t(tier, s_h[:, None] * theta_h, None,
                                        precision, mesh=mesh)
                head_adds.append(
                    (0, jnp.sum(beta_h[: tier.hi] * mp[: tier.hi], axis=1,
                                keepdims=True))
                )
    e_self, aug = _prep_tables(E_self_new, E_other, s_other, p, parts, highest)
    kernel = functools.partial(
        _scalar_kernel, bs_self=p.bs_self, bs_other=p.bs_other,
        chunk_size=p.chunk_size, k=K, parts=parts, highest=highest,
        group=p.group,
    )
    out = run_segmented(kernel, p, e_self, aug, 1, interpret=interpret,
                        mesh=mesh)
    for start, add in head_adds:
        out = out.at[start : start + add.shape[0]].add(add)
    if p.reordered:
        out = jnp.take(out, p.self_new_of_old, axis=0)
    return out[:, 0]
