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

Two compute paths: the allocation-form statistics (nonlinear in R) run
as ONE fused Pallas kernel per tier — rate, W, and both segment products
stay in VMEM, so nothing but the X/M cell tiles moves through HBM — and
the LINEAR products (`head_products`) run as XLA scans over row chunks
with single-pass bf16 part matmuls (stored x_hi/x_lo planes are the
ready-made X decomposition; payload tables decompose once per call).
Precision "high"/"mid" keep ~2e-5 worst-case statistic error (HIGHEST
f32 dots for the fused kernel's K-narrow contractions); "fast" uses one
bf16 plane like the edge kernels' fast tier.

Duplicate (u, i) edges are exact: rate is identical across duplicates, so
sum_e x_e / rate == X_cell / rate, and M carries multiplicity for the
linear statistics.  Cells with x == 0 but an edge present contribute to
S_other only (W == 0 there but M > 0) — matching the edge engines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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


def _col_tile(hip: int) -> int:
    for c in (512, 256, 128):
        if hip % c == 0:
            return c
    return hip


def _fused_kernel(th_ref, beta_ref, xh_ref, m_ref, *rest, floor, has_lo,
                  prec, item_side):
    """Fused allocation kernel: rate -> W -> both segment products in VMEM.
    Nothing but the X/M cell tiles is ever read from or written to HBM —
    the XLA formulation materializes the (rows, hip) W matrix between its
    two matmuls, which dominates the dense pass at scale."""
    lo_ref = rest[0] if has_lo else None
    out_ref = rest[-1]
    inner = pl.program_id(1)

    @pl.when(inner == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    th = th_ref[:]
    bt = beta_ref[:]
    R = jax.lax.dot_general(
        th, bt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (R0, C0)
    x = xh_ref[:].astype(jnp.float32)
    if has_lo:
        x = x + lo_ref[:].astype(jnp.float32)
    m = m_ref[:].astype(jnp.float32)
    W = jnp.where(m > 0, x / jnp.maximum(R, jnp.float32(floor)), 0.0)
    if item_side:
        contract = (((0,), (0,)), ((), ()))  # sum over the user rows
        sa = jax.lax.dot_general(W, th, contract,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        so = jax.lax.dot_general(m, th, contract,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
    else:
        contract = (((1,), (0,)), ((), ()))  # sum over the item cols
        sa = jax.lax.dot_general(W, bt, contract,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        so = jax.lax.dot_general(m, bt, contract,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
    out_ref[:] += jnp.concatenate([sa, so], axis=1)


def fused_alloc_tier(theta_h, beta_h, x_hi, m, x_lo=None, *, r0: int,
                     rate_floor: float, precision: str = "high",
                     interpret: bool = False, item_side: bool = False):
    """Raw-array form of the fused allocation kernel over one dense tier.

    theta_h: (rows, K) f32 self rows, beta_h: (hip, K) f32 other rows
    (zero-padded past the real column count), x_hi/m[/x_lo]: (rows, hip)
    cell arrays.  Returns the (rows, 2K) [S_alloc' | S_other] accumulator
    (item_side=True: (hip, 2K)); S_alloc' lacks the final elementwise
    self factor.  ``rows`` must be a multiple of ``r0``.  Used by both
    `_fused_alloc_products` (single-chip hybrid) and the TP blocked ring
    (`pmf_tpu.parallel.tp_blocked`), where the visiting table's top rows
    are the tier's columns."""
    K = theta_h.shape[1]
    hip = m.shape[1]
    C0 = _col_tile(hip)
    n_c = hip // C0
    has_lo = x_lo is not None
    prec = _prec(precision)
    kernel = functools.partial(
        _fused_kernel, floor=rate_floor, has_lo=has_lo, prec=prec,
        item_side=item_side,
    )
    rows = x_hi.shape[0]
    n_r = rows // r0
    th_spec = pl.BlockSpec((r0, K), lambda a, b: ((b if item_side else a), 0))
    beta_spec = pl.BlockSpec((C0, K), lambda a, b: ((a if item_side else b), 0))
    cell = pl.BlockSpec((r0, C0), lambda a, b: ((b, a) if item_side else (a, b)))
    if item_side:
        grid = (n_c, n_r)
        out_spec = pl.BlockSpec((C0, 2 * K), lambda a, b: (a, 0))
        out_shape = jax.ShapeDtypeStruct((hip, 2 * K), jnp.float32)
    else:
        grid = (n_r, n_c)
        out_spec = pl.BlockSpec((r0, 2 * K), lambda a, b: (a, 0))
        out_shape = jax.ShapeDtypeStruct((rows, 2 * K), jnp.float32)
    in_specs = [th_spec, beta_spec, cell, cell] + ([cell] if has_lo else [])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(theta_h, beta_h, x_hi, m, *((x_lo,) if has_lo else ()))


def _fused_alloc_products(theta_h, beta_h, head, rate_floor, precision,
                          interpret, item_side, mesh=None):
    """Run the fused kernel over (row-block, col-tile) grid.  Returns the
    (rows, 2K) [S_alloc' | S_other] accumulator: rows = hu (user side) or
    hip (item side); S_alloc' lacks the final elementwise self factor.

    mesh: optional 1-D data mesh — when the tier's row-chunk count divides
    the device count (the auto builder rounds tiers for the fit mesh via
    ``head_row_mult``), the row axis shards across devices: each device
    runs the fused kernel on its row band; user-side outputs concatenate
    along rows, item-side partials psum over ICI.  Falls back to
    replicated compute otherwise (always correct)."""
    R0 = head.r0
    has_lo = head.x_lo is not None

    def core(bh, th, xh, mm, *lo):
        return fused_alloc_tier(
            th, bh, xh, mm, lo[0] if lo else None, r0=R0,
            rate_floor=rate_floor, precision=precision,
            interpret=interpret, item_side=item_side,
        )

    lo_ops = (head.x_lo,) if has_lo else ()
    n_dev = 1 if mesh is None else mesh.devices.size
    if n_dev <= 1 or (head.hu // R0) % n_dev:
        return core(beta_h, theta_h, head.x_hi, head.m, *lo_ops)

    from jax.sharding import PartitionSpec as P

    def local_fn(bh, th, xh, mm, *lo):
        out = core(bh, th, xh, mm, *lo)
        return jax.lax.psum(out, "data") if item_side else out

    row = P("data", None)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None), row, row, row) + ((row,) if has_lo else ()),
        out_specs=P() if item_side else row,
        check_vma=False,  # pallas_call outputs carry no vma info
    )(beta_h, theta_h, head.x_hi, head.m, *lo_ops)


def poisson_head_stats(
    theta_h: jax.Array,
    beta_h: jax.Array,
    head: DenseHead,
    rate_floor: float,
    precision: str = "high",
    interpret: bool = False,
    mesh=None,
):
    """User-side head statistics: (S_alloc, S_other), both (hu, K).

    theta_h: (hu, K) head-user rows, beta_h: (hip, K) head-item rows
    (zero-padded past hi), both in NEW (count-reordered) id space."""
    K = theta_h.shape[1]
    out = _fused_alloc_products(theta_h, beta_h, head, rate_floor, precision,
                                interpret, item_side=False, mesh=mesh)
    return theta_h * out[:, :K], out[:, K:]


def poisson_head_stats_t(
    theta_h: jax.Array,
    beta_h: jax.Array,
    head: DenseHead,
    rate_floor: float,
    precision: str = "high",
    interpret: bool = False,
    mesh=None,
):
    """Item-side head statistics via the transposed fused kernel:
    (S_alloc, S_other), both (hip, K) — rows past hi are exact zeros
    (M is zero there)."""
    K = theta_h.shape[1]
    out = _fused_alloc_products(theta_h, beta_h, head, rate_floor, precision,
                                interpret, item_side=True, mesh=mesh)
    return beta_h * out[:, :K], out[:, K:]


def ext_head_stats(
    theta_h: jax.Array,
    beta_h: jax.Array,
    sbeta_h: jax.Array,
    head: DenseHead,
    rate_floor: float,
    precision: str = "high",
    mesh=None,
):
    """Extended-Poisson user-side head statistics: (S_alloc, S_wother),
    both (hu, K).  The multinomial allocation denominator is the factor
    dot alone (the scalar factors cancel across k —
    `/root/reference/src/models/poisson_mf_extended_cavi.py:127-136`), so
    S_alloc matches the plain form; the rate statistic is psi-weighted:
    S_wother = M @ (s_other * Beta), with sbeta_h = s_other[:, None] *
    beta_h precomputed by the caller.  mesh: user rows shard over the
    data axis when divisible (like `head_products`)."""
    prec = _prec(precision)
    K = theta_h.shape[1]
    floor = jnp.float32(rate_floor)
    r0 = head.r0
    lo = (head.x_lo,) if head.x_lo is not None else ()

    def core(th_full, xh, mm, lo_t):
        rows = xh.shape[0]

        def body(_, chunk):
            th, x32, m32 = _cell_arrays(chunk)
            R = jax.lax.dot_general(
                th, beta_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            W = jnp.where(m32 > 0, x32 / jnp.maximum(R, floor), 0.0)
            sa = th * jax.lax.dot(W, beta_h,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
            sw = jax.lax.dot(m32, sbeta_h,
                             preferred_element_type=jnp.float32,
                             precision=prec)
            return None, (sa, sw)

        _, (sa, sw) = jax.lax.scan(
            body, None, _row_chunked((th_full, xh, mm) + lo_t, r0)
        )
        return sa.reshape(rows, K), sw.reshape(rows, K)

    n_dev = 1 if mesh is None else mesh.devices.size
    if n_dev <= 1 or (head.hu // r0) % n_dev:
        return core(theta_h, head.x_hi, head.m, lo)
    from jax.sharding import PartitionSpec as P

    row = P("data", None)
    return jax.shard_map(
        core, mesh=mesh, in_specs=(row, row, row, row), out_specs=row
    )(theta_h, head.x_hi, head.m, lo)


def ext_head_stats_t(
    theta_h: jax.Array,
    beta_h: jax.Array,
    stheta_h: jax.Array,
    head: DenseHead,
    rate_floor: float,
    precision: str = "high",
    mesh=None,
):
    """Extended-Poisson item-side head statistics: (S_alloc, S_wother),
    both (hip, K); stheta_h = s_other[:, None] * theta_h (user scalars).
    mesh: user rows (the contraction axis) shard; partials psum."""
    prec = _prec(precision)
    K = theta_h.shape[1]
    hip = head.m.shape[1]
    floor = jnp.float32(rate_floor)
    contract0 = (((0,), (0,)), ((), ()))
    r0 = head.r0
    lo = (head.x_lo,) if head.x_lo is not None else ()

    def core(th_full, st_full, xh, mm, lo_t):
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
                W, th, contract0, preferred_element_type=jnp.float32,
                precision=prec,
            )
            sw = sw + jax.lax.dot_general(
                m32, st, contract0, preferred_element_type=jnp.float32,
                precision=prec,
            )
            return (sa, sw), None

        init = (jnp.zeros((hip, K), jnp.float32),) * 2
        if varying:
            init = jax.tree_util.tree_map(
                lambda z: jax.lax.pcast(z, ("data",), to="varying"), init
            )
        (sa, sw), _ = jax.lax.scan(
            body, init,
            _row_chunked((th_full, xh, mm) + lo_t + (st_full,), r0),
        )
        return sa, sw

    n_dev = 1 if mesh is None else mesh.devices.size
    if n_dev <= 1 or (head.hu // r0) % n_dev:
        varying = False
        sa, sw = core(theta_h, stheta_h, head.x_hi, head.m, lo)
    else:
        from jax.sharding import PartitionSpec as P

        row = P("data", None)
        varying = True

        def local_fn(th_full, st_full, xh, mm, lo_t):
            return jax.lax.psum(
                core(th_full, st_full, xh, mm, lo_t), "data"
            )

        sa, sw = jax.shard_map(
            local_fn, mesh=mesh, in_specs=(row, row, row, row, row),
            out_specs=P(),
        )(theta_h, stheta_h, head.x_hi, head.m, lo)
    return beta_h * sa, sw


def _parts_of(precision: str) -> int:
    return 1 if precision in ("fast", "fast_bf16") else 2


def _dot_exact(A: jax.Array, B: jax.Array, transpose_a: bool) -> jax.Array:
    """HIGHEST-precision f32 dot for the "highest" cross-check tier — no
    bf16 part planes, so the only error left is the head's bf16x2 cell
    storage (~2^-17 relative), matching the edge kernels' exactness as
    closely as the stored data allows."""
    contract = (((0,), (0,)), ((), ())) if transpose_a else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        A, B, contract, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _decompose_list(B: jax.Array, parts: int) -> list:
    """f32 (n, c) -> list of ``parts`` exact bf16 (n, c) mantissa planes."""
    from pmf_tpu.ops.pallas.cavi_edge import decompose_bf16

    if parts == 1:
        return [B.astype(jnp.bfloat16)]
    c = B.shape[1]
    Bd = decompose_bf16(B, parts)
    return [Bd[:, j * c : (j + 1) * c] for j in range(parts)]


def _dot_part_lists(Ap: list, Bp: list, transpose_a: bool):
    """Sum of single-pass bf16 MXU cross products with i + j < max parts —
    ~2^-16 relative error for 2x2 parts (the edge kernels' "high" payload
    tier).  HIGHEST-precision f32 dots run at 1/6 of MXU peak, which
    dominated the wide-payload Gaussian head products; and all the part
    planes here are either stored (x_hi/x_lo, bf16 m) or decomposed ONCE
    per call, not per scan chunk."""
    contract = (((0,), (0,)), ((), ())) if transpose_a else (((1,), (0,)), ((), ()))
    out = None
    pm = max(len(Ap), len(Bp))
    for i, Ai in enumerate(Ap):
        for j, Bj in enumerate(Bp):
            if i + j >= pm:
                continue
            term = jax.lax.dot_general(
                Ai, Bj, contract, preferred_element_type=jnp.float32
            )
            out = term if out is None else out + term
    return out


def _m_parts(m_chunk: jax.Array, parts: int) -> list:
    """Multiplicity operand parts: a bf16-stored M is already one exact
    plane; an f32 M (counts > 256) decomposes into two exact planes."""
    from pmf_tpu.ops.pallas.cavi_edge import decompose_bf16

    if m_chunk.dtype == jnp.bfloat16 or parts == 1:
        return [m_chunk.astype(jnp.bfloat16)]
    c = m_chunk.shape[1]
    d = decompose_bf16(m_chunk, 2)
    return [d[:, :c], d[:, c:]]


def _row_chunked(arrs, r0: int):
    """Reshape (rows, c) arrays to (rows/r0, r0, c) scan inputs."""
    return tuple(a.reshape(a.shape[0] // r0, r0, -1) for a in arrs)


def head_products(
    head: DenseHead,
    other_tab: jax.Array,
    x_tab: jax.Array,
    precision: str = "high",
    mesh=None,
):
    """LINEAR user-side head statistics: (M @ other_tab, X @ x_tab).

    other_tab: (hip, W) per-head-item payload, x_tab: (hip, Wx) or None.
    Every Gaussian-family edge statistic is linear in per-other-row
    payloads with coefficient 1 (multiplicity) or x, so these two products
    cover them all.  Returns ((hu, W), (hu, Wx) or None).

    mesh: optional 1-D data mesh — user rows shard across devices when
    the row-chunk count divides the device count (payload tables
    replicate; outputs concatenate along rows); replicated otherwise."""
    exact = precision == "highest"
    parts = _parts_of(precision)
    if exact:
        Bp = (other_tab.astype(jnp.float32),)
        Xt = (x_tab.astype(jnp.float32),) if x_tab is not None else ()
    else:
        Bp = tuple(_decompose_list(other_tab, parts))
        Xt = tuple(_decompose_list(x_tab, parts)) if x_tab is not None else ()
    lo = (head.x_lo,) if head.x_lo is not None else ()
    r0 = head.r0

    def core(xh, mm, lo_t, bp_t, xt_t):
        rows = xh.shape[0]

        def body(_, chunk):
            xh_c, mm_c, *lo_c = chunk
            if exact:
                mp = _dot_exact(mm_c.astype(jnp.float32), bp_t[0],
                                transpose_a=False)
            else:
                mp = _dot_part_lists(_m_parts(mm_c, parts), list(bp_t),
                                     transpose_a=False)
            outs = (mp,)
            if xt_t:
                if exact:
                    x32 = xh_c.astype(jnp.float32)
                    if lo_c:
                        x32 = x32 + lo_c[0].astype(jnp.float32)
                    outs += (_dot_exact(x32, xt_t[0], transpose_a=False),)
                else:
                    # x_hi / x_lo ARE the stored 2-part decomposition of X.
                    xparts = [xh_c] + ([lo_c[0]] if lo_c and parts > 1 else [])
                    outs += (_dot_part_lists(xparts, list(xt_t),
                                             transpose_a=False),)
            return None, outs

        _, outs = jax.lax.scan(body, None, _row_chunked((xh, mm) + lo_t, r0))
        return tuple(o.reshape(rows, -1) for o in outs)

    n_dev = 1 if mesh is None else mesh.devices.size
    if n_dev <= 1 or (head.hu // r0) % n_dev:
        outs = core(head.x_hi, head.m, lo, Bp, Xt)
    else:
        from jax.sharding import PartitionSpec as P

        row = P("data", None)
        outs = jax.shard_map(
            core,
            mesh=mesh,
            in_specs=(row, row, row, P(None, None), P(None, None)),
            out_specs=row,
        )(head.x_hi, head.m, lo, Bp, Xt)
    return outs[0], (outs[1] if x_tab is not None else None)


def head_products_t(
    head: DenseHead,
    self_tab: jax.Array,
    x_tab: jax.Array,
    precision: str = "high",
    mesh=None,
):
    """LINEAR item-side head statistics: (M^T @ self_tab, X^T @ x_tab)
    via transposed contractions of the row-chunked cell arrays.

    self_tab: (hu, W) per-head-user payload, x_tab: (hu, Wx) or None.
    Returns ((hip, W), (hip, Wx) or None); rows past hi are exact zeros.

    mesh: optional 1-D data mesh — user rows shard across devices
    (contraction axis), partials psum over ICI; replicated otherwise."""
    exact = precision == "highest"
    parts = _parts_of(precision)
    r0 = head.r0
    hip = head.m.shape[1]
    with_x = x_tab is not None
    if exact:
        st_planes = (self_tab.astype(jnp.float32),)
        xt_planes = (x_tab.astype(jnp.float32),) if with_x else ()
    else:
        st_planes = tuple(_decompose_list(self_tab, parts))
        xt_planes = tuple(_decompose_list(x_tab, parts)) if with_x else ()
    lo = (head.x_lo,) if head.x_lo is not None else ()

    def core(xh, mm, lo_t, st_t, xt_t):
        xs = (
            _row_chunked((xh, mm) + lo_t, r0),
            _row_chunked(st_t, r0),
            _row_chunked(xt_t, r0),
        )

        def body(carry, chunk):
            cells, st_p, xt_p = chunk
            xh_c, mm_c, *lo_c = cells
            carry = list(carry)
            if exact:
                carry[0] = carry[0] + _dot_exact(
                    mm_c.astype(jnp.float32), st_p[0], transpose_a=True
                )
            else:
                carry[0] = carry[0] + _dot_part_lists(
                    _m_parts(mm_c, parts), list(st_p), transpose_a=True
                )
            if xt_t:
                if exact:
                    x32 = xh_c.astype(jnp.float32)
                    if lo_c:
                        x32 = x32 + lo_c[0].astype(jnp.float32)
                    carry[1] = carry[1] + _dot_exact(
                        x32, xt_p[0], transpose_a=True
                    )
                else:
                    xparts = [xh_c] + ([lo_c[0]] if lo_c and parts > 1 else [])
                    carry[1] = carry[1] + _dot_part_lists(
                        xparts, list(xt_p), transpose_a=True
                    )
            return tuple(carry), None

        init = (jnp.zeros((hip, st_t[0].shape[1]), jnp.float32),) + (
            (jnp.zeros((hip, xt_t[0].shape[1]), jnp.float32),) if xt_t else ()
        )
        if varying:
            # Under shard_map the accumulator must carry the mesh axis'
            # varying type from the start (the body mixes in sharded data).
            init = jax.tree_util.tree_map(
                lambda z: jax.lax.pcast(z, ("data",), to="varying"), init
            )
        out, _ = jax.lax.scan(body, init, xs)
        return out

    n_dev = 1 if mesh is None else mesh.devices.size
    if n_dev <= 1 or (head.hu // r0) % n_dev:
        varying = False
        outs = core(head.x_hi, head.m, lo, st_planes, xt_planes)
    else:
        from jax.sharding import PartitionSpec as P

        row = P("data", None)
        varying = True

        def local_fn(xh, mm, lo_t, st_t, xt_t):
            return jax.lax.psum(core(xh, mm, lo_t, st_t, xt_t), "data")

        outs = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(row, row, row, row, row),
            out_specs=P(),
        )(head.x_hi, head.m, lo, st_planes, xt_planes)
    return outs[0], (outs[1] if with_x else None)
