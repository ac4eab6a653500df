"""Layout disk cache: cached reloads must be IDENTICAL to fresh builds
(`pmf_tpu/data/layout_cache.py`) — edge passes byte-for-byte, dense-head
tiers re-scattered to the same cells — and misses must key correctly on
data and geometry."""

import dataclasses

import numpy as np
import pytest

from pmf_tpu.data import layout_cache as lc
from pmf_tpu.data.blocked import BlockedCOO, build_blocked
from pmf_tpu.data.synthetic import synth_ratings


def _assert_pass_equal(a, b):
    for f in ("loc", "x", "chunk_self_block", "chunk_other_block",
              "self_old_of_new", "other_old_of_new", "self_new_of_old"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)
    for f in ("n_chunks", "chunk_size", "bs_self", "bs_other", "n_self",
              "n_other", "n_self_blocks", "n_other_blocks", "nnz",
              "seg_chunks", "seg_first_block", "seg_n_blocks", "reordered",
              "group"):
        assert getattr(a, f) == getattr(b, f), f


def _assert_head_equal(a, b):
    assert (a is None) == (b is None)
    if a is None:
        return
    assert len(a) == len(b)
    for ta, tb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ta.x_hi, np.float32),
                                      np.asarray(tb.x_hi, np.float32))
        np.testing.assert_array_equal(np.asarray(ta.m, np.float32),
                                      np.asarray(tb.m, np.float32))
        assert (ta.x_lo is None) == (tb.x_lo is None)
        if ta.x_lo is not None:
            np.testing.assert_array_equal(np.asarray(ta.x_lo, np.float32),
                                          np.asarray(tb.x_lo, np.float32))
        for f in ("hu", "hi", "r0", "row_start"):
            assert getattr(ta, f) == getattr(tb, f), f


def _blocked_equal(a: BlockedCOO, b: BlockedCOO):
    _assert_pass_equal(a.by_user, b.by_user)
    _assert_pass_equal(a.by_item, b.by_item)
    _assert_head_equal(a.head, b.head)


@pytest.fixture(scope="module")
def edges():
    u, i, x = synth_ratings(96, 64, 900, seed=3)
    return np.asarray(u), np.asarray(i), np.asarray(x, np.float32)


def test_blocked_cache_roundtrip(edges, tmp_path):
    u, i, x = edges
    kw = dict(n_users=96, n_items=64, block_users=16, block_items=16,
              chunk_size=8, group=2, reorder=True)
    fresh = build_blocked(u, i, x, **kw)
    miss = build_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    _blocked_equal(fresh, miss)
    files = list(tmp_path.glob("blocked_*.npz"))
    assert len(files) == 1
    hit = build_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    _blocked_equal(fresh, hit)


def test_blocked_cache_with_head_tiers(edges, tmp_path):
    u, i, x = edges
    kw = dict(n_users=96, n_items=64, block_users=16, block_items=16,
              chunk_size=8, group=2, reorder=True,
              head=[(0, 16, 24), (16, 32, 8)], head_r0=8)
    fresh = build_blocked(u, i, x, **kw)
    assert fresh.head is not None and len(fresh.head) == 2
    build_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    hit = build_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    _blocked_equal(fresh, hit)


def test_blocked_cache_keys_on_data_and_geometry(edges, tmp_path):
    u, i, x = edges
    kw = dict(n_users=96, n_items=64, block_users=16, block_items=16,
              chunk_size=8, group=2, reorder=True)
    build_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    # Different ratings -> different entry.
    build_blocked(u, i, x + 1.0, cache_dir=str(tmp_path), **kw)
    # Different geometry -> different entry.
    kw2 = dict(kw, chunk_size=16)
    build_blocked(u, i, x, cache_dir=str(tmp_path), **kw2)
    assert len(list(tmp_path.glob("blocked_*.npz"))) == 3


def test_blocked_cache_corrupt_entry_degrades_to_rebuild(edges, tmp_path):
    u, i, x = edges
    kw = dict(n_users=96, n_items=64, block_users=16, block_items=16,
              chunk_size=8, group=2, reorder=True)
    fresh = build_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    (entry,) = tmp_path.glob("blocked_*.npz")
    entry.write_bytes(b"not an npz")
    with pytest.warns(UserWarning, match="unreadable"):
        rebuilt = build_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    _blocked_equal(fresh, rebuilt)


def test_env_var_enables_cache(edges, tmp_path, monkeypatch):
    u, i, x = edges
    monkeypatch.setenv("PMF_TPU_LAYOUT_CACHE", str(tmp_path))
    kw = dict(n_users=96, n_items=64, block_users=16, block_items=16,
              chunk_size=8, group=2, reorder=True)
    fresh = build_blocked(u, i, x, **kw)
    assert len(list(tmp_path.glob("blocked_*.npz"))) == 1
    hit = build_blocked(u, i, x, **kw)
    _blocked_equal(fresh, hit)


def _tp_equal(a, b):
    for f in ("sb", "ob", "loc", "x", "seg_row0", "seg_nrows"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.by_user, f)), np.asarray(getattr(b.by_user, f)),
            err_msg=f"by_user.{f}")
        np.testing.assert_array_equal(
            np.asarray(getattr(a.by_item, f)), np.asarray(getattr(b.by_item, f)),
            err_msg=f"by_item.{f}")
    for d in (("by_user",), ("by_item",)):
        da, db = getattr(a, d[0]), getattr(b, d[0])
        for f in ("bs_self", "bs_other", "chunk_size", "group", "seg_chunks",
                  "n_segments", "out_rows", "n_self_blocks", "n_other_blocks"):
            assert getattr(da, f) == getattr(db, f), f"{d[0]}.{f}"
    for f in ("u_old_of_new", "u_new_of_old", "i_old_of_new", "i_new_of_old",
              "user_counts", "item_counts", "x_sum_user", "x_sum_item"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)
    for f in ("n_users", "n_items", "n_users_pad", "n_items_pad", "users_per",
              "items_per", "n_devices", "nnz", "n_dp"):
        assert getattr(a, f) == getattr(b, f), f
    for side in ("head_user", "head_item"):
        ha, hb = getattr(a, side), getattr(b, side)
        assert len(ha) == len(hb), side
        for ta, tb in zip(ha, hb):
            np.testing.assert_array_equal(np.asarray(ta.x_hi, np.float32),
                                          np.asarray(tb.x_hi, np.float32))
            np.testing.assert_array_equal(np.asarray(ta.m, np.float32),
                                          np.asarray(tb.m, np.float32))
            assert (ta.x_lo is None) == (tb.x_lo is None)
            for f in ("row_start", "hu", "hi", "hip", "r0"):
                assert getattr(ta, f) == getattr(tb, f), f


@pytest.mark.parametrize("dp", [1, 2])
def test_tp_cache_roundtrip(edges, tmp_path, dp):
    from pmf_tpu.parallel.tp_blocked import build_tp_blocked

    u, i, x = edges
    kw = dict(n_users=96, n_items=64, n_devices=2, dp=dp, block_users=16,
              block_items=16, chunk_size=8, group=2,
              head=[(0, 8 * dp, 8)], head_r0=8)
    fresh = build_tp_blocked(u, i, x, **kw)
    assert fresh.head_user and fresh.head_item
    build_tp_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    assert len(list(tmp_path.glob("tp_blocked_*.npz"))) == 1
    hit = build_tp_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    _tp_equal(fresh, hit)


def test_tp_cached_layout_trains_identically(edges, tmp_path):
    """A cached TP layout must drive the ring sweep to the same state as
    a fresh one (facade-level guard on the reconstruction)."""
    import jax
    from pmf_tpu.parallel.mesh import make_mesh
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked,
        place_tp_blocked,
        tp_sweep_hpf_blocked,
    )

    u, i, x = edges
    x = np.abs(x) + 1.0
    mesh = make_mesh(2)
    kw = dict(n_users=96, n_items=64, n_devices=2, block_users=16,
              block_items=16, chunk_size=8, group=2, head=[(0, 8, 8)],
              head_r0=8)
    hyper = (0.3, 1.0, 1.0, 0.3, 1.0, 1.0)

    def run(layout):
        rng = np.random.default_rng(0)
        state = {
            "a_theta": np.asarray(rng.gamma(1.0, 1.0, (96, 4)), np.float64),
            "b_theta": np.ones((96, 4)),
            "a_beta": np.asarray(rng.gamma(1.0, 1.0, (64, 4)), np.float64),
            "b_beta": np.ones((64, 4)),
            "b_xi": np.ones((96,)),
            "b_eta": np.ones((64,)),
        }
        layout, state = place_tp_blocked(layout, state, mesh)
        for _ in range(2):
            state = tp_sweep_hpf_blocked(state, layout, *hyper, mesh=mesh,
                                         interpret=True)
        return {k: np.asarray(v) for k, v in state.items()}

    fresh = run(build_tp_blocked(u, i, x, **kw))
    build_tp_blocked(u, i, x, cache_dir=str(tmp_path), **kw)
    cached = run(build_tp_blocked(u, i, x, cache_dir=str(tmp_path), **kw))
    for k in fresh:
        np.testing.assert_allclose(cached[k], fresh[k], rtol=0, atol=0,
                                   err_msg=k)
