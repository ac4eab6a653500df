"""Dense-head hybrid engine: the (top-users x top-items) corner computed
by dense matmuls must combine with the Pallas tail passes to reproduce the
flat engine's statistics exactly (up to engine-parity tolerance), including
duplicate (u, i) edges and zero ratings."""

import numpy as np
import pytest

from pmf_tpu.data.blocked import build_blocked
from pmf_tpu.data.coo import build_ratings
from pmf_tpu.models import hpf, poisson_mf


def _hpf_states(u, i, x, n_users, n_items, head, iters=3):
    cfg = hpf.HPFConfig(n_factors=6, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, x, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=head, head_r0=4,
    )
    s_flat = hpf.init_state(n_users, n_items, cfg)
    s_blk = dict(s_flat)
    for _ in range(iters):
        s_flat = hpf.sweep(s_flat, flat, *hyper)
        s_blk = hpf.sweep_blocked(
            s_blk, blocked, flat.user_counts, flat.item_counts, *hyper,
            precision="high", interpret=True,
        )
    return s_flat, s_blk, blocked


def test_hpf_head_matches_flat(small_ratings):
    u, i, x = small_ratings
    s_flat, s_blk, blocked = _hpf_states(u, i, x + 1.0, 120, 80, head=(16, 24))
    assert blocked.head is not None and blocked.head[0].hu == 16
    # head must actually hold edges (top-count rows are the busiest)
    assert float(np.asarray(blocked.head[0].m, np.float32).sum()) > 100
    for k in s_flat:
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )


def test_hpf_all_edges_in_head(small_ratings):
    """hu x hi covering every row: the tail passes are empty and the whole
    sweep is dense."""
    u, i, x = small_ratings
    s_flat, s_blk, blocked = _hpf_states(u, i, x + 1.0, 120, 80, head=(120, 80))
    assert int(np.asarray(blocked.head[0].m, np.float32).sum()) == len(u)
    assert blocked.by_user.nnz == 0
    for k in s_flat:
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )


def test_poisson_head_duplicates_and_zeros():
    """Duplicate (u, i) pairs and x == 0 edges: X sums ratings, M carries
    multiplicity; statistics must match the flat engine edge-for-edge."""
    rng = np.random.default_rng(0)
    n_users, n_items, nnz = 60, 40, 900
    u = rng.integers(0, n_users, nnz)
    i = rng.integers(0, n_items, nnz)
    x = rng.integers(0, 5, nnz).astype(np.float32)  # includes zeros
    # force duplicates, including a duplicated zero-rating pair
    u[:40] = u[40:80]
    i[:40] = i[40:80]
    x[0] = 0.0
    x[40] = 0.0

    cfg = poisson_mf.PoissonMFConfig(n_factors=5, verbose=False)
    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, x, n_users=n_users, n_items=n_items,
        block_users=16, block_items=16, chunk_size=16, group=2,
        reorder=True, head=(12, 20), head_r0=4,
    )
    assert blocked.head is not None
    assert float(np.asarray(blocked.head[0].m).max()) >= 2  # duplicates landed

    s_flat = poisson_mf.init_state(n_users, n_items, cfg)
    s_blk = dict(s_flat)
    for _ in range(3):
        s_flat = poisson_mf.sweep(s_flat, flat, cfg.a0, cfg.b0, extended=False)
        s_blk = poisson_mf.sweep_blocked(
            s_blk, blocked, flat.user_counts, flat.item_counts, cfg.a0, cfg.b0,
            precision="high", interpret=True,
        )
    for k in s_flat:
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )


def test_noninteger_ratings_use_lo_part(small_ratings):
    """Centered / fractional ratings are not bf16-exact: the head stores a
    bf16 remainder plane and stays exact to f32."""
    u, i, x = small_ratings
    xf = x.astype(np.float32) + np.float32(0.3333)
    blocked = build_blocked(
        u, i, xf, n_users=120, n_items=80,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=(16, 24), head_r0=4,
    )
    h = blocked.head[0]
    assert h.x_lo is not None
    X = np.asarray(h.x_hi, np.float32) + np.asarray(h.x_lo, np.float32)
    # cell sums reproduce the f64 scatter at f32 resolution
    assert np.isfinite(X).all()
    np.testing.assert_allclose(float(X.sum()), float(h.x_sum_user.sum()), rtol=1e-5)


def test_hpf_staircase_tiers_match_flat(small_ratings):
    """Multi-tier staircase: tier 0 = top-8 users x 40 items, tier 1 =
    users 8..32 x top 12 items — disjoint bands, both consumed alongside
    the Pallas tail."""
    u, i, x = small_ratings
    s_flat, s_blk, blocked = _hpf_states(
        u, i, x + 1.0, 120, 80, head=[(0, 8, 40), (8, 24, 12)]
    )
    assert len(blocked.head) == 2
    assert blocked.head[1].row_start == 8
    total_head = sum(
        float(np.asarray(t.m, np.float32).sum()) for t in blocked.head
    )
    assert total_head > 100
    assert total_head + blocked.by_user.nnz == len(u)
    for k in s_flat:
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )


def test_gaussian_staircase_tiers_match_flat(small_ratings):
    u, i, x = small_ratings
    xc = x.astype(np.float32) - np.float32(x.mean())
    s_flat, s_blk = _gaussian_states(
        u, i, xc, 120, 80, [(0, 8, 40), (8, 24, 12)], True, "lagged"
    )
    for k in ("m_theta", "m_beta", "V_theta", "V_beta", "b_user", "b_item"):
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=5e-3, atol=2e-5, err_msg=k,
        )


def test_hpf_head_sharded_over_mesh(small_ratings):
    """Head rows shard over the 8-device CPU mesh (tier rows chosen so
    row chunks divide the device count): sweep must match the unsharded
    hybrid exactly."""
    from pmf_tpu.parallel import make_mesh

    u, i, x = small_ratings
    n_users, n_items = 120, 80
    xs = x + 1.0
    cfg = hpf.HPFConfig(n_factors=6, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    flat = build_ratings(u, i, xs, n_users=n_users, n_items=n_items)
    # hu = 32 rows, r0 = 4 -> 8 row chunks, divisible by 8 devices.
    blocked = build_blocked(
        u, i, xs, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=(32, 24), head_r0=4,
    )
    mesh = make_mesh(8)
    s_ref = dict(hpf.init_state(n_users, n_items, cfg))
    s_mesh = dict(s_ref)
    for _ in range(2):
        s_ref = hpf.sweep_blocked(
            s_ref, blocked, flat.user_counts, flat.item_counts, *hyper,
            precision="high", interpret=True,
        )
        s_mesh = hpf.sweep_blocked(
            s_mesh, blocked, flat.user_counts, flat.item_counts, *hyper,
            precision="high", interpret=True, mesh=mesh,
        )
    for k in s_ref:
        np.testing.assert_allclose(
            np.asarray(s_ref[k]), np.asarray(s_mesh[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )


def test_extended_head_mesh_matches_unsharded(small_ratings):
    """Extended-Poisson hybrid under a mesh (sharded tail + row-sharded
    head W/scalar products) matches the unsharded sweep."""
    import jax.numpy as jnp

    from pmf_tpu.parallel import make_mesh

    u, i, x = small_ratings
    n_users, n_items = 120, 80
    xs = x + 1.0
    cfg = poisson_mf.PoissonMFConfig(n_factors=5, extended=True, verbose=False)
    flat = build_ratings(u, i, xs, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, xs, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=(32, 24), head_r0=4,  # 8 row chunks / 8 devices
    )
    sx_user = jnp.asarray(np.bincount(u, weights=xs, minlength=n_users),
                          jnp.float32)
    sx_item = jnp.asarray(np.bincount(i, weights=xs, minlength=n_items),
                          jnp.float32)
    mesh = make_mesh(8)
    s_ref = dict(poisson_mf.init_state(n_users, n_items, cfg))
    s_mesh = dict(s_ref)
    for _ in range(2):
        args = (flat.user_counts, flat.item_counts, sx_user, sx_item,
                cfg.a0, cfg.b0)
        s_ref = poisson_mf.sweep_blocked_extended(
            s_ref, blocked, *args, precision="high", interpret=True)
        s_mesh = poisson_mf.sweep_blocked_extended(
            s_mesh, blocked, *args, precision="high", interpret=True,
            mesh=mesh)
    for k in s_ref:
        np.testing.assert_allclose(
            np.asarray(s_ref[k]), np.asarray(s_mesh[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )


def test_gaussian_head_mesh_matches_unsharded(small_ratings):
    """Gaussian hybrid under a mesh: sharded tail segments + (replicated)
    head products must match the unsharded sweep exactly."""
    from pmf_tpu.models import gaussian_mf
    from pmf_tpu.parallel import make_mesh

    u, i, x = small_ratings
    xc = x.astype(np.float32) - np.float32(x.mean())
    n_users, n_items = 120, 80
    cfg = gaussian_mf.GaussianMFConfig(
        n_factors=5, sigma2=0.5, eta_theta2=0.4, eta_beta2=0.4, eta_bias2=0.7,
        verbose=False,
    )
    flat = build_ratings(u, i, xc, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, xc, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=(32, 24), head_r0=4,
    )
    mesh = make_mesh(8)
    s_ref = dict(gaussian_mf.init_state(n_users, n_items, cfg))
    s_mesh = dict(s_ref)
    for _ in range(2):
        args = (flat.user_counts, flat.item_counts, cfg.sigma2,
                cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2, True)
        s_ref = gaussian_mf.sweep_blocked(
            s_ref, blocked, *args, precision="high", interpret=True)
        s_mesh = gaussian_mf.sweep_blocked(
            s_mesh, blocked, *args, precision="high", interpret=True,
            mesh=mesh)
    for k in ("m_theta", "m_beta", "V_theta", "b_user", "b_item"):
        np.testing.assert_allclose(
            np.asarray(s_ref[k]), np.asarray(s_mesh[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )


def test_pick_tiers_staircase_structure():
    """Auto tiers: contiguous disjoint bands from row 0, quartering item
    widths, rows rounded to r0*row_mult, last tier extended through the
    remaining users within budget."""
    from pmf_tpu.data.blocked import _pick_tiers

    rng = np.random.default_rng(0)
    n_users, n_items, nnz = 60_000, 30_000, 5_000_000
    # Zipf-ish synthetic in NEW-id space directly (already count-sorted).
    uw = (1.0 + np.arange(n_users)) ** -0.7
    iw = (1.0 + np.arange(n_items)) ** -1.0
    u = rng.choice(n_users, nnz, p=uw / uw.sum())
    i = rng.choice(n_items, nnz, p=iw / iw.sum())

    tiers = _pick_tiers(u, i, n_users, n_items, 1 << 29, 4, 512)
    assert tiers, "big Zipf data must get a head"
    # contiguity + shrinking item widths
    row = 0
    prev_hi = None
    for rs, rows, hi in tiers:
        assert rs == row and rows % 512 == 0
        if prev_hi is not None:
            assert hi < prev_hi
        prev_hi = hi
        row += rows
    # byte budget respected (hip pads to 512)
    cells = sum(r * (-(-h // 512) * 512) for _, r, h in tiers)
    assert cells * 4 <= (1 << 29)

    # row_mult rounds every tier's rows for even mesh sharding
    tiers8 = _pick_tiers(u, i, n_users, n_items, 1 << 29, 4, 512, row_mult=8)
    assert all(rows % (512 * 8) == 0 for _, rows, _ in tiers8)

    # tiny data declines
    assert _pick_tiers(u[:1000], i[:1000], n_users, n_items,
                       1 << 29, 4, 512) == []


def test_explicit_tier_validation():
    from pmf_tpu.data.blocked import build_blocked

    rng = np.random.default_rng(1)
    u = rng.integers(0, 64, 500)
    i = rng.integers(0, 40, 500)
    x = rng.random(500).astype(np.float32)
    with pytest.raises(ValueError, match="disjoint"):
        build_blocked(u, i, x, n_users=64, n_items=40,
                      block_users=16, block_items=16, chunk_size=16, group=2,
                      reorder=True, head=[(0, 16, 20), (8, 16, 10)], head_r0=4)
    with pytest.raises(ValueError, match="invalid"):
        build_blocked(u, i, x, n_users=64, n_items=40,
                      block_users=16, block_items=16, chunk_size=16, group=2,
                      reorder=True, head=[(0, 80, 20)], head_r0=4)


def test_auto_head_declines_small_data(small_ratings):
    u, i, x = small_ratings
    blocked = build_blocked(
        u, i, x, n_users=120, n_items=80,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head="auto",
    )
    assert blocked.head is None  # nnz far below the auto threshold


def test_extended_poisson_head_matches_flat(small_ratings):
    """Extended variant: the head's allocation reuses the plain form
    (scalars cancel in the multinomial), the rate stat is psi-weighted,
    and the Gauss-Seidel scalar refresh rides the same linear product."""
    import jax.numpy as jnp

    u, i, x = small_ratings
    n_users, n_items = 120, 80
    xs = x + 1.0
    cfg = poisson_mf.PoissonMFConfig(n_factors=5, extended=True, verbose=False)
    flat = build_ratings(u, i, xs, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, xs, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=(16, 24), head_r0=4,
    )
    assert blocked.head is not None
    sx_user = jnp.asarray(np.bincount(u, weights=xs, minlength=n_users),
                          jnp.float32)
    sx_item = jnp.asarray(np.bincount(i, weights=xs, minlength=n_items),
                          jnp.float32)

    s_flat = poisson_mf.init_state(n_users, n_items, cfg)
    s_blk = dict(s_flat)
    for _ in range(3):
        s_flat = poisson_mf.sweep(s_flat, flat, cfg.a0, cfg.b0, extended=True)
        s_blk = poisson_mf.sweep_blocked_extended(
            s_blk, blocked, flat.user_counts, flat.item_counts,
            sx_user, sx_item, cfg.a0, cfg.b0,
            precision="high", interpret=True,
        )
    for k in s_flat:
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )


# --- Per-tier single-sweep gates --------------------------------------
# Tolerances mirror the advertised error budget (bench.py
# `engine_stat_error`: high ~3e-7 HPF bf16x3 / ~2e-5 Gaussian bf16x2;
# mid ~2e-5 HPF, Gaussian w-stat ~2e-5 + A-stat ~2e-3; fast ~6e-3) with
# ~4x headroom after one sweep's K x K solve / gamma-ratio amplification.
# The round-2 blanket 5e-3 gate would have passed a 100x high-tier
# regression; these fail it.
HPF_TIER_RTOL = {"high": 5e-6, "mid": 2e-4, "fast": 5e-2}
GAUSS_TIER_RTOL = {"high": 2e-4, "mid": 2e-2, "fast": 5e-2}


@pytest.mark.parametrize("precision", ["high", "mid", "fast"])
def test_hpf_hybrid_tier_error_budget(small_ratings, precision):
    """ONE hybrid sweep from a shared init vs the flat sweep: per-tier
    statistic error must stay within the advertised tier budget."""
    u, i, x = small_ratings
    xs = x + 1.0
    n_users, n_items = 120, 80
    cfg = hpf.HPFConfig(n_factors=6, verbose=False)
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
    flat = build_ratings(u, i, xs, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, xs, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=(16, 24), head_r0=4,
    )
    s0 = hpf.init_state(n_users, n_items, cfg)
    s_flat = hpf.sweep(dict(s0), flat, *hyper)
    s_blk = hpf.sweep_blocked(
        dict(s0), blocked, flat.user_counts, flat.item_counts, *hyper,
        precision=precision, interpret=True,
    )
    rtol = HPF_TIER_RTOL[precision]
    for k in s_flat:
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=rtol, atol=rtol, err_msg=f"{k} @ {precision}",
        )


@pytest.mark.parametrize("precision", ["high", "mid", "fast"])
def test_gaussian_hybrid_tier_error_budget(small_ratings, precision):
    from pmf_tpu.models import gaussian_mf

    u, i, x = small_ratings
    xc = x.astype(np.float32) - np.float32(x.mean())
    n_users, n_items = 120, 80
    cfg = gaussian_mf.GaussianMFConfig(
        n_factors=5, sigma2=0.5, eta_theta2=0.4, eta_beta2=0.4, eta_bias2=0.7,
        verbose=False,
    )
    flat = build_ratings(u, i, xc, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, xc, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=(16, 24), head_r0=4,
    )
    s0 = gaussian_mf.init_state(n_users, n_items, cfg)
    s_flat = gaussian_mf.sweep(
        dict(s0), flat, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
        cfg.eta_bias2, cfg.n_factors, True,
    )
    s_blk = gaussian_mf.sweep_blocked(
        dict(s0), blocked, flat.user_counts, flat.item_counts,
        cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
        True, precision=precision, interpret=True,
    )
    rtol = GAUSS_TIER_RTOL[precision]
    for k in ("m_theta", "m_beta", "V_theta", "V_beta", "b_user", "b_item"):
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=rtol, atol=rtol, err_msg=f"{k} @ {precision}",
        )


def test_head_products_highest_is_exact_f32():
    """'highest' head products run HIGHEST f32 dots on the recombined
    cells — error vs an f64 oracle is storage-only (~2^-17), at least 10x
    tighter than the bf16x2 'high' part dots (ADVICE r2: 'highest' was
    silently mapping to part planes)."""
    from pmf_tpu.ops.dense_head import head_products, head_products_t

    rng = np.random.default_rng(5)
    hu, hi, W = 16, 24, 7
    u = rng.integers(0, hu, 4000)
    i = rng.integers(0, hi, 4000)
    x = (rng.random(4000) * 5).astype(np.float32)  # non-bf16-exact
    from pmf_tpu.data.blocked import _build_head

    head = _build_head(u, i, x, hu, hi, r0=4)
    assert head.x_lo is not None
    tab = rng.standard_normal((head.m.shape[1], W)).astype(np.float32)
    xtab = rng.standard_normal((head.m.shape[1], W)).astype(np.float32)

    X = np.zeros((hu, head.m.shape[1]))
    M = np.zeros_like(X)
    np.add.at(X, (u, i), x.astype(np.float64))
    np.add.at(M, (u, i), 1.0)
    want_m = M @ tab.astype(np.float64)
    want_x = X @ xtab.astype(np.float64)

    def err(precision):
        got_m, got_x = head_products(head, tab, xtab, precision=precision)
        scale = max(np.abs(want_x).max(), 1.0)
        return max(
            np.abs(np.asarray(got_m, np.float64) - want_m).max(),
            np.abs(np.asarray(got_x, np.float64) - want_x).max(),
        ) / scale

    e_highest, e_high = err("highest"), err("high")
    assert e_highest < 5e-5
    assert e_highest <= e_high + 1e-9

    # transposed variant
    stab = rng.standard_normal((hu, W)).astype(np.float32)
    got_mt, got_xt = head_products_t(head, stab, stab, precision="highest")
    want_mt = M.T @ stab.astype(np.float64)
    want_xt = X.T @ stab.astype(np.float64)
    scale = max(np.abs(want_xt).max(), 1.0)
    assert np.abs(np.asarray(got_mt, np.float64) - want_mt).max() / scale < 5e-5
    assert np.abs(np.asarray(got_xt, np.float64) - want_xt).max() / scale < 5e-5


def _gaussian_states(u, i, x, n_users, n_items, head, use_bias, bias_update,
                     iters=3):
    from pmf_tpu.models import gaussian_mf

    cfg = gaussian_mf.GaussianMFConfig(
        n_factors=5, sigma2=0.5, eta_theta2=0.4, eta_beta2=0.4, eta_bias2=0.7,
        use_bias=use_bias, verbose=False,
    )
    flat = build_ratings(u, i, x, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, x, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=head, head_r0=4,
    )
    assert blocked.head is not None
    s_flat = gaussian_mf.init_state(n_users, n_items, cfg)
    s_blk = dict(s_flat)
    for _ in range(iters):
        s_flat = gaussian_mf.sweep(
            s_flat, flat, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
            cfg.eta_bias2, cfg.n_factors, use_bias, bias_update=bias_update,
        )
        s_blk = gaussian_mf.sweep_blocked(
            s_blk, blocked, flat.user_counts, flat.item_counts,
            cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
            use_bias, precision="high", interpret=True,
            bias_update=bias_update,
        )
    return s_flat, s_blk


@pytest.mark.parametrize(
    "use_bias,bias_update",
    [(True, "exact"), (True, "lagged"), (False, "exact")],
)
def test_gaussian_head_matches_flat(small_ratings, use_bias, bias_update):
    """All three full-covariance Gaussian modes (exact biases via the
    dedicated bias passes, lagged biases riding the factor payload, and
    no-bias) must match the flat sweep with a dense head in the layout."""
    u, i, x = small_ratings
    xc = x.astype(np.float32) - np.float32(x.mean())  # centered, non-bf16-exact
    s_flat, s_blk = _gaussian_states(
        u, i, xc, 120, 80, (16, 24), use_bias, bias_update
    )
    keys = ["m_theta", "m_beta", "V_theta", "V_beta"]
    if use_bias:
        keys += ["b_user", "b_item"]
    for k in keys:
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=5e-3, atol=2e-5, err_msg=k,
        )


@pytest.mark.parametrize("use_bias", [True, False])
def test_gaussian_diag_head_matches_flat(small_ratings, use_bias):
    """Diag-covariance mode: the Jacobi cross term rides a packed
    tri(m m^T) payload column group in the head products."""
    from pmf_tpu.models import gaussian_mf

    u, i, x = small_ratings
    xc = x.astype(np.float32) - np.float32(x.mean())
    n_users, n_items = 120, 80
    cfg = gaussian_mf.GaussianMFConfig(
        n_factors=5, sigma2=0.5, eta_theta2=0.4, eta_beta2=0.4, eta_bias2=0.7,
        covariance="diag", use_bias=use_bias, verbose=False,
    )
    flat = build_ratings(u, i, xc, n_users=n_users, n_items=n_items)
    blocked = build_blocked(
        u, i, xc, n_users=n_users, n_items=n_items,
        block_users=32, block_items=32, chunk_size=16, group=2,
        reorder=True, head=(16, 24), head_r0=4,
    )
    assert blocked.head is not None
    s_flat = gaussian_mf.init_state(n_users, n_items, cfg)
    s_blk = dict(s_flat)
    for _ in range(3):
        s_flat = gaussian_mf.sweep(
            s_flat, flat, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
            cfg.eta_bias2, cfg.n_factors, use_bias, covariance="diag",
        )
        s_blk = gaussian_mf.sweep_blocked(
            s_blk, blocked, flat.user_counts, flat.item_counts,
            cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2, cfg.eta_bias2,
            use_bias, precision="high", interpret=True, covariance="diag",
        )
    for k in ("m_theta", "m_beta", "V_theta", "V_beta"):
        np.testing.assert_allclose(
            np.asarray(s_flat[k]), np.asarray(s_blk[k]),
            rtol=5e-3, atol=2e-5, err_msg=k,
        )
