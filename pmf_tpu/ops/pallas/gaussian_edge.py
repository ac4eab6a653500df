"""Fused Gaussian-CAVI edge-pass Pallas kernels.

The Gaussian coordinate blocks need two sufficient statistics per self row
(`/root/reference/src/models/gaussian_mf_cavi_bias.py:132-201`):

    S_i = sum_{j in Omega_i} (V_j + m_j m_j^T)        (K, K)
    w_i = sum_{j in Omega_i} m_j * resid_ij           (K,)
    resid_ij = x_ij [- b_self_i - b_other_j]

and the bias blocks need (`gaussian_mf_cavi_bias.py:206-263`):

    s_i = sum_{j in Omega_i} (x_ij - b_other_j - <m_self_i, m_other_j>)

Everything per-edge is gathered through one-hot matmuls over an AUGMENTED
other-row table  [m | (V + m m^T).flatten | b]  (K + K^2 + 1 columns), so
one MXU gather delivers the mean, the second moment, and the bias of the
edge's other row at once; the two statistics pack into one segment-sum
matmul of width K + K^2.  Same blocked layout, segmentation, and padding
semantics as `pmf_tpu.ops.pallas.cavi_edge`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmf_tpu.data.blocked import BlockedPass
from pmf_tpu.ops.pallas.cavi_edge import _recombine, decompose_bf16

# Gaussian parts policy: the second-moment payload is K^2 wide (already
# several 128-lane tiles), so each extra bf16 part costs real matmul
# tiles.  "high" uses bf16x2 (~2e-5 statistic error — far below the 5e-4
# engine-parity gates); "highest" keeps Mosaic HIGHEST f32 dots for exact
# cross-checks.
_PARTS = {"fast": 1, "mid": 2, "high": 2, "highest": 0}


def _factor_kernel(
    sb_ref, ob_ref, loc_ref, x_ref, aug_ref, bself_ref,
    out_ref, *, bs_self, bs_other, chunk_size, parts, highest, k, use_bias,
):
    import jax.lax as lax

    dtype = aug_ref.dtype
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    w = k + k * k + 1  # [m | A.flat | b] group width
    packed = loc_ref[:, :]
    sloc = lax.shift_right_logical(packed, jnp.int32(16))
    oloc = lax.bitwise_and(packed, jnp.int32(0xFFFF))
    xv = x_ref[:, :]

    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (chunk_size, bs_self), 1)
    ).astype(dtype)
    onehot_o = (
        oloc == jax.lax.broadcasted_iota(jnp.int32, (chunk_size, bs_other), 1)
    ).astype(dtype)

    g_aug = _recombine(
        jnp.dot(onehot_o, aug_ref[:], preferred_element_type=jnp.float32,
                precision=prec),
        w, parts,
    )  # (C, K + K^2 + 1) f32
    m_e = g_aug[:, :k]
    if use_bias:
        b_other_e = g_aug[:, k + k * k : k + k * k + 1]
        b_self_e = _recombine(
            jnp.dot(onehot_s, bself_ref[:], preferred_element_type=jnp.float32,
                    precision=prec),
            1, parts,
        )
        resid = xv - b_self_e - b_other_e
    else:
        resid = xv

    payload = jnp.concatenate([m_e * resid, g_aug[:, k : k + k * k]], axis=1)
    payload_in = payload if highest else decompose_bf16(payload, parts)

    c = pl.program_id(0)
    prev_sb = sb_ref[jnp.maximum(c - 1, 0)]

    @pl.when((c == 0) | (sb_ref[c] != prev_sb))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    contract = (((0,), (0,)), ((), ()))
    seg = jax.lax.dot_general(
        onehot_s, payload_in, contract, preferred_element_type=jnp.float32,
        precision=prec,
    )
    out_ref[:] += _recombine(seg, k + k * k, 1 if highest else parts)


def _bias_kernel(
    sb_ref, ob_ref, loc_ref, x_ref, aug_ref, mself_ref,
    out_ref, *, bs_self, bs_other, chunk_size, parts, highest, k,
):
    import jax.lax as lax

    dtype = aug_ref.dtype
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    packed = loc_ref[:, :]
    sloc = lax.shift_right_logical(packed, jnp.int32(16))
    oloc = lax.bitwise_and(packed, jnp.int32(0xFFFF))
    xv = x_ref[:, :]

    onehot_s = (
        sloc == jax.lax.broadcasted_iota(jnp.int32, (chunk_size, bs_self), 1)
    ).astype(dtype)
    onehot_o = (
        oloc == jax.lax.broadcasted_iota(jnp.int32, (chunk_size, bs_other), 1)
    ).astype(dtype)

    g_aug = _recombine(
        jnp.dot(onehot_o, aug_ref[:], preferred_element_type=jnp.float32,
                precision=prec),
        k + 1, parts,
    )  # (C, K+1): [m_other | b_other]
    m_self_e = _recombine(
        jnp.dot(onehot_s, mself_ref[:], preferred_element_type=jnp.float32,
                precision=prec),
        k, parts,
    )
    inter = jnp.sum(m_self_e * g_aug[:, :k], axis=1, keepdims=True)
    resid = xv - g_aug[:, k : k + 1] - inter
    # Padding edges: one-hot rows are all zero and x is 0, so resid = 0.

    c = pl.program_id(0)
    prev_sb = sb_ref[jnp.maximum(c - 1, 0)]

    @pl.when((c == 0) | (sb_ref[c] != prev_sb))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    contract = (((0,), (0,)), ((), ()))
    resid_in = resid if highest else decompose_bf16(resid, parts)
    seg = jax.lax.dot_general(
        onehot_s, resid_in, contract, preferred_element_type=jnp.float32,
        precision=prec,
    )
    out_ref[:] += _recombine(seg, 1, 1 if highest else parts)


def _run_segmented(kernel, p: BlockedPass, payload_width, scalar_tables, out_width,
                   interpret: bool = False, mesh=None):
    """Shared scan-over-segments driver (see cavi_edge for the rationale).

    mesh: optional 1-D `jax.sharding.Mesh` — segments shard across the
    "data" axis (dummy zero-contribution segments pad to a multiple of the
    device count) and per-device accumulators combine with one psum over
    ICI, mirroring `cavi_edge.poisson_edge_stats`."""
    n_segments = p.n_chunks // p.seg_chunks
    max_blocks = max(p.seg_n_blocks)
    out_rows = max_blocks * p.bs_self
    K_out = out_width

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p.seg_chunks,),
        in_specs=[
            pl.BlockSpec((p.chunk_size, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((p.chunk_size, 1), lambda c, sb, ob: (c, 0)),
            pl.BlockSpec((p.bs_other, scalar_tables[0].shape[1]),
                         lambda c, sb, ob: (ob[c], 0)),
            pl.BlockSpec((p.bs_self, scalar_tables[1].shape[1]),
                         lambda c, sb, ob: (sb[c], 0)),
        ],
        out_specs=pl.BlockSpec((p.bs_self, K_out), lambda c, sb, ob: (sb[c] - sb[0], 0)),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, K_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    C = p.chunk_size
    S = p.seg_chunks
    xs = (
        p.chunk_self_block.reshape(n_segments, S),
        p.chunk_other_block.reshape(n_segments, S),
        p.loc.reshape(n_segments, S * C, 1),
        p.x.reshape(n_segments, S * C, 1),
        jnp.asarray([b * p.bs_self for b in p.seg_first_block], jnp.int32),
        jnp.asarray([b * p.bs_self for b in p.seg_n_blocks], jnp.int32),
    )
    n_self_pad = p.n_self_blocks * p.bs_self
    acc0 = jnp.zeros((n_self_pad + out_rows, K_out), jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0)

    def body(acc, seg):
        sb, ob, locv, xv, r0, nr = seg
        seg_out = call(sb, ob, locv, xv, scalar_tables[0], scalar_tables[1])
        seg_out = jnp.where(row_ids < nr, seg_out, 0.0)
        zero = jnp.zeros((), r0.dtype)
        region = jax.lax.dynamic_slice(acc, (r0, zero), (out_rows, K_out))
        return jax.lax.dynamic_update_slice(acc, region + seg_out, (r0, zero)), None

    if mesh is None:
        acc, _ = jax.lax.scan(body, acc0, xs)
    else:
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.devices.size
        pad_segs = (-n_segments) % n_dev
        if pad_segs:
            # Dummy segments: all-padding edges (local index == block size
            # matches no one-hot column), nr = 0 masks the whole window.
            def pad_seg(a, fill):
                shape = (pad_segs,) + a.shape[1:]
                return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)])

            pad_loc = (p.bs_self << 16) | p.bs_other
            xs = (
                pad_seg(xs[0], 0),
                pad_seg(xs[1], 0),
                pad_seg(xs[2], pad_loc),
                pad_seg(xs[3], 0),
                pad_seg(xs[4], 0),
                pad_seg(xs[5], 0),
            )

        def local_segments(*xs_local):
            acc, _ = jax.lax.scan(body, acc0, xs_local)
            return jax.lax.psum(acc, "data")

        acc = jax.shard_map(
            local_segments,
            mesh=mesh,
            in_specs=tuple(P("data") for _ in xs),
            out_specs=P(),
            check_vma=False,  # pallas_call outputs carry no vma info
        )(*xs)
    return acc[: p.n_self]


@functools.partial(
    jax.jit, static_argnames=("use_bias", "precision", "interpret", "mesh")
)
def gaussian_factor_stats(
    m_other, V_other, b_self, b_other, p: BlockedPass,
    use_bias: bool = True, precision: str = "high", interpret: bool = False,
    mesh=None,
):
    """Return (S_w (n_self, K), S_A (n_self, K, K)) for one factor block."""
    K = m_other.shape[1]
    n_other_pad = p.n_other_blocks * p.bs_other
    n_self_pad = p.n_self_blocks * p.bs_self

    parts = _PARTS[precision]
    highest = parts == 0
    parts = max(parts, 1)
    A_flat = (V_other + m_other[:, :, None] * m_other[:, None, :]).reshape(-1, K * K)
    aug = jnp.concatenate([m_other, A_flat, b_other[:, None]], axis=1)
    if p.reordered:
        aug = jnp.take(aug, p.other_old_of_new, axis=0)
        b_self = jnp.take(b_self, p.self_old_of_new, axis=0)
    bself = b_self[:, None]
    if not highest:
        aug = decompose_bf16(aug, parts)
        bself = decompose_bf16(bself, parts)
    aug = jnp.pad(aug, ((0, n_other_pad - aug.shape[0]), (0, 0)))
    bself_tab = jnp.pad(bself, ((0, n_self_pad - bself.shape[0]), (0, 0)))

    kernel = functools.partial(
        _factor_kernel, bs_self=p.bs_self, bs_other=p.bs_other,
        chunk_size=p.chunk_size, parts=parts, highest=highest, k=K, use_bias=use_bias,
    )
    out = _run_segmented(kernel, p, K + K * K, (aug, bself_tab), K + K * K,
                         interpret=interpret, mesh=mesh)
    if p.reordered:
        out = jnp.take(out, p.self_new_of_old, axis=0)
    return out[:, :K], out[:, K:].reshape(-1, K, K)


@functools.partial(jax.jit, static_argnames=("precision", "interpret", "mesh"))
def gaussian_bias_stats(
    m_self, m_other, b_other, p: BlockedPass,
    precision: str = "high", interpret: bool = False, mesh=None,
):
    """Return s (n_self,): per-row sums of bias residuals."""
    K = m_self.shape[1]
    n_other_pad = p.n_other_blocks * p.bs_other
    n_self_pad = p.n_self_blocks * p.bs_self
    parts = _PARTS[precision]
    highest = parts == 0
    parts = max(parts, 1)
    aug = jnp.concatenate([m_other, b_other[:, None]], axis=1)
    if p.reordered:
        aug = jnp.take(aug, p.other_old_of_new, axis=0)
        m_self = jnp.take(m_self, p.self_old_of_new, axis=0)
    if not highest:
        aug = decompose_bf16(aug, parts)
        m_self = decompose_bf16(m_self, parts)
    aug = jnp.pad(aug, ((0, n_other_pad - aug.shape[0]), (0, 0)))
    mself_tab = jnp.pad(m_self, ((0, n_self_pad - m_self.shape[0]), (0, 0)))

    kernel = functools.partial(
        _bias_kernel, bs_self=p.bs_self, bs_other=p.bs_other,
        chunk_size=p.chunk_size, parts=parts, highest=highest, k=K,
    )
    out = _run_segmented(kernel, p, 1, (aug, mself_tab), 1, interpret=interpret,
                         mesh=mesh)
    if p.reordered:
        out = jnp.take(out, p.self_new_of_old, axis=0)
    return out[:, 0]
