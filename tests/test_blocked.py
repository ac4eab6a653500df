"""Blocked-COO layout + Pallas edge-pass kernel (interpret mode on CPU)
against the flat XLA segment-sum formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from pmf_tpu.data.blocked import build_blocked
from pmf_tpu.data.coo import build_ratings
from pmf_tpu.ops.pallas.cavi_edge import poisson_edge_stats
from pmf_tpu.ops.segment import edge_dot, gather_rows, sorted_segment_sum


def _flat_stats(e_self, e_other, self_ids, other_ids, x, n_self, floor=1e-10):
    g_self = gather_rows(e_self, self_ids)
    g_other = gather_rows(e_other, other_ids)
    rate = jnp.maximum(edge_dot(g_self, g_other), floor)
    alloc = (x / rate)[:, None] * g_self * g_other
    return (
        sorted_segment_sum(alloc, self_ids, n_self),
        sorted_segment_sum(g_other, self_ids, n_self),
    )


@pytest.mark.parametrize("chunk_size,block", [(128, 64), (256, 128)])
def test_blocked_stats_match_flat(small_ratings, chunk_size, block):
    u, i, x = small_ratings
    x = x + 1.0
    n_users, n_items = int(u.max()) + 1, int(i.max()) + 1
    rng = np.random.default_rng(0)
    K = 12
    e_theta = jnp.asarray(rng.gamma(1.0, 1.0, size=(n_users, K)).astype(np.float32))
    e_beta = jnp.asarray(rng.gamma(1.0, 1.0, size=(n_items, K)).astype(np.float32))

    flat = build_ratings(u, i, x, dtype=np.float32)
    blocked = build_blocked(
        u, i, x, block_users=block, block_items=block, chunk_size=chunk_size, group=4
    )

    # User pass.
    ref_alloc, ref_other = _flat_stats(
        e_theta, e_beta, flat.u_by_u, flat.i_by_u, flat.x_by_u, n_users
    )
    got_alloc, got_other = poisson_edge_stats(
        e_theta, e_beta, blocked.by_user, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_alloc), np.asarray(ref_alloc), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_other), np.asarray(ref_other), rtol=2e-5, atol=1e-5)

    # Item pass.
    ref_alloc_i, ref_other_i = _flat_stats(
        e_beta, e_theta, flat.i_by_i, flat.u_by_i, flat.x_by_i, n_items
    )
    got_alloc_i, got_other_i = poisson_edge_stats(
        e_beta, e_theta, blocked.by_item, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_alloc_i), np.asarray(ref_alloc_i), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_other_i), np.asarray(ref_other_i), rtol=2e-5, atol=1e-5)


def test_blocked_segmented_matches_flat(small_ratings):
    """Tiny seg_chunks forces many segments (including straddled blocks);
    results must still match the flat path exactly."""
    u, i, x = small_ratings
    x = x + 1.0
    n_users, n_items = int(u.max()) + 1, int(i.max()) + 1
    rng = np.random.default_rng(3)
    K = 8
    e_theta = jnp.asarray(rng.gamma(1.0, 1.0, size=(n_users, K)).astype(np.float32))
    e_beta = jnp.asarray(rng.gamma(1.0, 1.0, size=(n_items, K)).astype(np.float32))

    flat = build_ratings(u, i, x, dtype=np.float32)
    blocked = build_blocked(u, i, x, block_users=64, block_items=64,
                            chunk_size=128, seg_chunks=4, group=2)
    p = blocked.by_user
    assert p.n_chunks // p.seg_chunks > 1, "test needs multiple segments"

    ref_alloc, ref_other = _flat_stats(
        e_theta, e_beta, flat.u_by_u, flat.i_by_u, flat.x_by_u, n_users
    )
    got_alloc, got_other = poisson_edge_stats(e_theta, e_beta, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got_alloc), np.asarray(ref_alloc), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_other), np.asarray(ref_other), rtol=2e-5, atol=1e-5)


def test_blocked_reordered_matches_flat(small_ratings):
    """Popularity reordering must not change the statistics, and must
    reduce chunk padding on skewed data."""
    u, i, x = small_ratings
    x = x + 1.0
    n_users, n_items = int(u.max()) + 1, int(i.max()) + 1
    rng = np.random.default_rng(5)
    K = 8
    e_theta = jnp.asarray(rng.gamma(1.0, 1.0, size=(n_users, K)).astype(np.float32))
    e_beta = jnp.asarray(rng.gamma(1.0, 1.0, size=(n_items, K)).astype(np.float32))

    flat = build_ratings(u, i, x, dtype=np.float32)
    plain = build_blocked(u, i, x, block_users=32, block_items=32, chunk_size=128,
                          group=2)
    popular = build_blocked(u, i, x, block_users=32, block_items=32, chunk_size=128,
                            reorder=True, group=2)
    # Skewed synthetic data: reordering should not increase chunk count.
    assert popular.by_user.n_chunks <= plain.by_user.n_chunks

    ref_alloc, ref_other = _flat_stats(
        e_theta, e_beta, flat.u_by_u, flat.i_by_u, flat.x_by_u, n_users
    )
    got_alloc, got_other = poisson_edge_stats(e_theta, e_beta, popular.by_user,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(got_alloc), np.asarray(ref_alloc), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_other), np.asarray(ref_other), rtol=2e-5, atol=1e-5)


def test_blocked_sharded_matches_local(small_ratings):
    """Segments sharded across the 8-device CPU mesh (psum-combined
    accumulators) must match the single-device result."""
    import jax

    from pmf_tpu.parallel import make_mesh

    u, i, x = small_ratings
    x = x + 1.0
    n_users, n_items = int(u.max()) + 1, int(i.max()) + 1
    rng = np.random.default_rng(9)
    K = 8
    e_theta = jnp.asarray(rng.gamma(1.0, 1.0, size=(n_users, K)).astype(np.float32))
    e_beta = jnp.asarray(rng.gamma(1.0, 1.0, size=(n_items, K)).astype(np.float32))

    blocked = build_blocked(u, i, x, block_users=64, block_items=64,
                            chunk_size=128, seg_chunks=4, group=2)
    p = blocked.by_user
    assert p.n_chunks // p.seg_chunks >= 3, "test needs several segments"
    mesh = make_mesh(8)

    local_a, local_o = poisson_edge_stats(e_theta, e_beta, p, interpret=True)
    shard_a, shard_o = poisson_edge_stats(e_theta, e_beta, p, interpret=True,
                                          mesh=mesh)
    np.testing.assert_allclose(np.asarray(shard_a), np.asarray(local_a), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(shard_o), np.asarray(local_o), rtol=1e-6)


def test_blocked_handles_empty_blocks():
    """Rows/blocks with no edges must produce zero statistics."""
    u = np.array([0, 0, 700])  # users 1..699 empty -> empty self blocks
    i = np.array([0, 1, 2])
    x = np.array([2.0, 3.0, 4.0])
    K = 4
    rng = np.random.default_rng(1)
    e_theta = jnp.asarray(rng.gamma(1.0, 1.0, size=(701, K)).astype(np.float32))
    e_beta = jnp.asarray(rng.gamma(1.0, 1.0, size=(3, K)).astype(np.float32))
    blocked = build_blocked(u, i, x, block_users=128, block_items=128, chunk_size=128)
    s_alloc, s_other = poisson_edge_stats(e_theta, e_beta, blocked.by_user, interpret=True)
    assert s_alloc.shape == (701, K)
    np.testing.assert_allclose(np.asarray(s_alloc[1:700]), 0.0)
    np.testing.assert_allclose(np.asarray(s_other[1:700]), 0.0)
    assert np.asarray(s_other[700]).sum() > 0


def test_gaussian_bias_sublayout_matches(small_ratings):
    """sweep_blocked with a separate smaller-block bias sub-layout matches
    the single-layout sweep (the bias passes are layout-invariant)."""
    from pmf_tpu.data.coo import build_ratings as _br
    from pmf_tpu.models.gaussian_mf import GaussianMFConfig, init_state, sweep_blocked

    u, i, x = small_ratings
    xc = (x - x.mean()).astype(np.float32)
    n_users, n_items = int(u.max()) + 1, int(i.max()) + 1
    flat = _br(u, i, xc, dtype=np.float32)
    main = build_blocked(u, i, xc, block_users=64, block_items=64,
                         chunk_size=128, group=4, reorder=True)
    sub = build_blocked(u, i, xc, block_users=32, block_items=32,
                        chunk_size=64, group=4, reorder=True)
    cfg = GaussianMFConfig(n_factors=5, verbose=False)
    state = init_state(n_users, n_items, cfg)
    one = sweep_blocked(dict(state), main, flat.user_counts, flat.item_counts,
                        1.0, 0.5, 0.5, 0.7, True, interpret=True)
    two = sweep_blocked(dict(state), main, flat.user_counts, flat.item_counts,
                        1.0, 0.5, 0.5, 0.7, True, interpret=True,
                        blocked_bias=sub)
    for k in one:
        np.testing.assert_allclose(np.asarray(one[k]), np.asarray(two[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_auto_tiles_adapts_to_density():
    from pmf_tpu.data.blocked import auto_tiles

    # ML-25M-like density: expected edges/tile >> 128 -> tuned C=128.
    dense = auto_tiles(162_000, 59_000, 25_000_000)
    assert dense["chunk_size"] == 128 and dense["group"] == 16

    # Food.com density: ~41 edges/tile at B=512 -> chunk shrinks to 32.
    sparse = auto_tiles(25_076, 178_265, 700_000)
    assert sparse["chunk_size"] == 32
    assert sparse["group"] >= 8

    # group_cap respected (Gaussian kernels compile-cap at 8).
    capped = auto_tiles(162_000, 59_000, 25_000_000, group_cap=8)
    assert capped["group"] == 8

    # Tail mode (hybrid residual, e ~ 137): shrinks to C=64 only when the
    # group can double to keep per-step edges constant.
    tail32 = auto_tiles(162_000, 59_000, 5_000_000, group_cap=32, tail=True)
    assert tail32["chunk_size"] == 64 and tail32["group"] == 32
    tail8 = auto_tiles(162_000, 59_000, 5_000_000, group_cap=8, tail=True)
    assert tail8["chunk_size"] == 128 and tail8["group"] == 8
