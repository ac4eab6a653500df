"""TP blocked ring sweeps (`pmf_tpu.parallel.tp_blocked`).

VERDICT r3 weak #1: TP training ran flat segment sums inside the ring.
These tests gate the blocked replacement: per-iteration agreement with
the FLAT TP ring (same fixed point, kernel rounding apart) on the
8-virtual-device CPU mesh, for HPF and plain Poisson, pure TP and hybrid
DP x TP, plus full-fit equivalence through the model facade.
"""

import numpy as np
import pytest

from pmf_tpu.parallel import make_mesh, make_mesh_2d


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh_2d(2, 4)


def _ratings(n_users=90, n_items=70, nnz=1400, seed=3):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, nnz)
    i = rng.integers(0, n_items, nnz)
    # Dedup to keep the comparison free of duplicate-ordering noise.
    key = u * n_items + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]
    x = rng.integers(1, 6, len(u)).astype(np.float64)
    return u, i, x, n_users, n_items


def _tile_kwargs():
    # Small tiles so tiny data exercises multi-block, multi-segment,
    # multi-group paths.
    return dict(block_users=16, block_items=16, chunk_size=8, group=2)


def _hpf_states(mesh, dp=1):
    import jax

    from pmf_tpu.models.hpf import HPFConfig, init_state
    from pmf_tpu.parallel.tp import (
        HPF_AXIS_OF, HPF_PAD_ONES, build_tp_layout, pad_state_rows,
        place_tp, tp_sweep_hpf,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_hpf_blocked,
    )

    u, i, x, n_users, n_items = _ratings()
    D = 8 // dp
    cfg = HPFConfig(n_factors=5, random_state=0, dtype="float32")
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime,
             cfg.d_prime)

    flat_layout = build_tp_layout(u, i, x, n_users, n_items, D,
                                  dtype=np.float32, dp=dp)
    blk_layout = build_tp_blocked(u, i, x, n_users, n_items, D,
                                  dtype=np.float32, dp=dp, **_tile_kwargs())
    state0 = pad_state_rows(
        init_state(n_users, n_items, cfg), HPF_AXIS_OF,
        flat_layout.n_users_pad, flat_layout.n_items_pad,
        ones_keys=HPF_PAD_ONES)

    flat_layout, s_flat = place_tp(flat_layout, dict(state0), mesh)
    blk_layout, s_blk = place_tp_blocked(blk_layout, dict(state0), mesh)
    for _ in range(3):
        s_flat = tp_sweep_hpf(s_flat, flat_layout, *hyper, mesh=mesh)
        s_blk = tp_sweep_hpf_blocked(s_blk, blk_layout, *hyper, mesh=mesh,
                                     interpret=True)
    return jax.device_get(s_flat), jax.device_get(s_blk)


def _assert_close(a: dict, b: dict, rtol, atol):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=rtol, atol=atol, err_msg=k)


def test_hpf_tp_blocked_matches_flat_ring(mesh8):
    s_flat, s_blk = _hpf_states(mesh8)
    # precision="high" is ~f32-exact; three iterations compound kernel
    # rounding only.
    _assert_close(s_flat, s_blk, rtol=3e-4, atol=3e-5)


def test_hpf_tp_blocked_hybrid(mesh2x4):
    s_flat, s_blk = _hpf_states(mesh2x4, dp=2)
    _assert_close(s_flat, s_blk, rtol=3e-4, atol=3e-5)


def test_poisson_tp_blocked_matches_flat_ring(mesh8):
    import jax

    from pmf_tpu.models.poisson_mf import PoissonMFConfig, init_state
    from pmf_tpu.parallel.tp import (
        POISSON_AXIS_OF, POISSON_PAD_ONES, build_tp_layout, pad_state_rows,
        place_tp, tp_sweep_poisson,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_poisson_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=5)
    cfg = PoissonMFConfig(n_factors=4, random_state=1, dtype="float32")
    flat_layout = build_tp_layout(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32)
    blk_layout = build_tp_blocked(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32, **_tile_kwargs())
    state0 = pad_state_rows(
        init_state(n_users, n_items, cfg), POISSON_AXIS_OF,
        flat_layout.n_users_pad, flat_layout.n_items_pad,
        ones_keys=POISSON_PAD_ONES)

    flat_layout, s_flat = place_tp(flat_layout, dict(state0), mesh8)
    blk_layout, s_blk = place_tp_blocked(blk_layout, dict(state0), mesh8)
    for _ in range(3):
        s_flat = tp_sweep_poisson(s_flat, flat_layout, cfg.a0, cfg.b0,
                                  extended=False, mesh=mesh8)
        s_blk = tp_sweep_poisson_blocked(s_blk, blk_layout, cfg.a0, cfg.b0,
                                         mesh=mesh8, interpret=True)
    _assert_close(jax.device_get(s_flat), jax.device_get(s_blk),
                  rtol=3e-4, atol=3e-5)


def test_hpf_fit_tp_blocked_engine(small_splits, mesh8):
    """Full fit through the facade: engine='blocked_high' with
    state_sharding='rows' trains on the blocked ring and lands within
    kernel rounding of the flat-ring TP fit."""
    from pmf_tpu.models.hpf import HPF, HPFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1.0), (vu, vi, vx + 1.0)
    base = dict(n_factors=4, max_iter=4, tol=None, verbose=False,
                dtype="float32", random_state=2)

    flat = HPF(HPFConfig(engine="flat", **base)).fit(
        train, val, mesh=mesh8, state_sharding="rows")
    blk = HPF(HPFConfig(engine="blocked_high", **base)).fit(
        train, val, mesh=mesh8, state_sharding="rows")

    for k in flat.state:
        np.testing.assert_allclose(
            np.asarray(flat.state[k]), np.asarray(blk.state[k]),
            rtol=3e-4, atol=3e-5, err_msg=k)
    for rf, rb in zip(flat.fit_history, blk.fit_history):
        assert abs(rf["val_rmse"] - rb["val_rmse"]) < 1e-3


def test_poisson_ext_tp_blocked_matches_flat_ring(mesh8):
    """Extended Poisson: the two-ring blocked form (pre-scaled-table
    second kernel pass + raw-mode scalar rate) matches the flat TP ring
    within kernel rounding over 3 iterations."""
    import jax

    from pmf_tpu.models.poisson_mf import PoissonMFConfig, init_state
    from pmf_tpu.parallel.tp import (
        POISSON_EXT_AXIS_OF, POISSON_PAD_ONES, build_tp_layout,
        pad_state_rows, place_tp, tp_sweep_poisson,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_poisson_ext_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=9)
    cfg = PoissonMFConfig(n_factors=4, random_state=2, dtype="float32",
                          extended=True)
    flat_layout = build_tp_layout(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32)
    blk_layout = build_tp_blocked(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32, **_tile_kwargs())
    state0 = pad_state_rows(
        init_state(n_users, n_items, cfg), POISSON_EXT_AXIS_OF,
        flat_layout.n_users_pad, flat_layout.n_items_pad,
        ones_keys=POISSON_PAD_ONES)

    flat_layout, s_flat = place_tp(flat_layout, dict(state0), mesh8)
    blk_layout, s_blk = place_tp_blocked(blk_layout, dict(state0), mesh8)
    for _ in range(3):
        s_flat = tp_sweep_poisson(s_flat, flat_layout, cfg.a0, cfg.b0,
                                  extended=True, mesh=mesh8)
        s_blk = tp_sweep_poisson_ext_blocked(
            s_blk, blk_layout, cfg.a0, cfg.b0, mesh=mesh8, interpret=True)
    _assert_close(jax.device_get(s_flat), jax.device_get(s_blk),
                  rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("covariance,use_bias", [("full", True),
                                                 ("full", False),
                                                 ("diag", True)])
def test_gaussian_tp_blocked_matches_flat_ring(mesh8, covariance, use_bias):
    """Gaussian full/diag covariance, with and without biases: the
    blocked ring (rotating augmented [m|b|tri] tables, local PSD solves)
    matches the flat TP ring within kernel rounding over 3 iterations."""
    import jax

    from pmf_tpu.models.gaussian_mf import GaussianMFConfig, init_state
    from pmf_tpu.parallel.tp import (
        GAUSSIAN_AXIS_OF, build_tp_layout, pad_state_rows, place_tp,
        tp_sweep_gaussian,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_gaussian_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=17)
    x = x - x.mean()
    cfg = GaussianMFConfig(n_factors=4, random_state=0, dtype="float32",
                           use_bias=use_bias, covariance=covariance)
    hyper = dict(sigma2=cfg.sigma2, eta_theta2=cfg.eta_theta2,
                 eta_beta2=cfg.eta_beta2, eta_bias2=cfg.eta_bias2)

    flat_layout = build_tp_layout(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32)
    blk_layout = build_tp_blocked(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32, **_tile_kwargs())
    state0 = pad_state_rows(
        init_state(n_users, n_items, cfg), GAUSSIAN_AXIS_OF,
        flat_layout.n_users_pad, flat_layout.n_items_pad)

    flat_layout, s_flat = place_tp(flat_layout, dict(state0), mesh8)
    blk_layout, s_blk = place_tp_blocked(blk_layout, dict(state0), mesh8)
    for _ in range(3):
        s_flat = tp_sweep_gaussian(s_flat, flat_layout, **hyper,
                                   use_bias=use_bias, covariance=covariance,
                                   mesh=mesh8)
        s_blk = tp_sweep_gaussian_blocked(
            s_blk, blk_layout, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
            cfg.eta_bias2, use_bias=use_bias, covariance=covariance,
            mesh=mesh8, interpret=True)
    _assert_close(jax.device_get(s_flat), jax.device_get(s_blk),
                  rtol=2e-3, atol=2e-4)


def test_gaussian_tp_blocked_lagged_matches_flat_sweep(mesh8):
    """TP lagged-bias mode (2 ring passes/iter, bias closed forms local):
    matches the single-chip FLAT lagged sweep (`gaussian_mf.sweep` with
    bias_update="lagged", itself f64-oracle-gated in
    test_gaussian_lagged.py) within kernel rounding over 3 iterations."""
    import jax

    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models.gaussian_mf import (
        GaussianMFConfig, init_state, sweep,
    )
    from pmf_tpu.parallel.tp import (
        GAUSSIAN_AXIS_OF, build_tp_layout, pad_state_rows,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_gaussian_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=23)
    x = x - x.mean()
    cfg = GaussianMFConfig(n_factors=4, random_state=0, dtype="float32",
                           use_bias=True, bias_update="lagged")

    # Single-chip flat lagged oracle.
    data = build_ratings(u, i, x.astype(np.float32))
    s_ref = {k: np.asarray(v, np.float32)
             for k, v in init_state(n_users, n_items, cfg).items()}

    # TP blocked lagged.
    pads = build_tp_layout(u, i, x, n_users, n_items, 8, dtype=np.float32)
    blk = build_tp_blocked(u, i, x, n_users, n_items, 8,
                           dtype=np.float32, **_tile_kwargs())
    state0 = pad_state_rows(init_state(n_users, n_items, cfg),
                            GAUSSIAN_AXIS_OF, pads.n_users_pad,
                            pads.n_items_pad)
    blk, s_blk = place_tp_blocked(blk, dict(state0), mesh8)

    for _ in range(3):
        s_ref = sweep(s_ref, data, cfg.sigma2, cfg.eta_theta2,
                      cfg.eta_beta2, cfg.eta_bias2, cfg.n_factors, True,
                      covariance="full", bias_update="lagged")
        s_blk = tp_sweep_gaussian_blocked(
            s_blk, blk, cfg.sigma2, cfg.eta_theta2, cfg.eta_beta2,
            cfg.eta_bias2, use_bias=True, covariance="full", mesh=mesh8,
            interpret=True, bias_update="lagged")

    s_blk = jax.device_get(s_blk)
    rows = {"m_theta": n_users, "V_theta": n_users, "b_user": n_users,
            "m_beta": n_items, "V_beta": n_items, "b_item": n_items}
    for k, n in rows.items():
        np.testing.assert_allclose(
            np.asarray(s_blk[k])[:n], np.asarray(s_ref[k]),
            rtol=2e-3, atol=2e-4, err_msg=k)


def test_gaussian_fit_tp_lagged_facade(small_splits, mesh8):
    """fit(mesh=, state_sharding="rows") with bias_update="lagged" +
    blocked engine trains end-to-end; the flat TP ring still rejects
    lagged with a descriptive error."""
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    base = dict(n_factors=4, max_iter=3, tol=None, verbose=False,
                dtype="float32", random_state=2, use_bias=True,
                bias_update="lagged")

    single = GaussianMF(GaussianMFConfig(engine="flat", **base)).fit(
        train, val, global_mean=mean)
    tp = GaussianMF(GaussianMFConfig(engine="blocked_high", **base)).fit(
        train, val, global_mean=mean, mesh=mesh8, state_sharding="rows")
    assert abs(single.fit_history[-1]["val_rmse"]
               - tp.fit_history[-1]["val_rmse"]) < 1e-3

    with pytest.raises(ValueError, match="lagged"):
        GaussianMF(GaussianMFConfig(engine="flat", **base)).fit(
            train, val, global_mean=mean, mesh=mesh8,
            state_sharding="rows")


def test_segment_quantization_guard_geometry():
    """The segment-size guard (`build_tp_blocked.seg_for`) caps segments
    at a quarter of the EXPECTED bucket chunks: without it a bucket that
    only fills ~2 segments of the popularity-heuristic size pads up to a
    whole extra segment of dead slots per (d, s) bucket (measured 0.470
    by_item slot occupancy at D=8 on the real 25M layout; 0.676 with the
    guard — reports/tp_scaling/TP_SCALING_r04.md)."""
    from pmf_tpu.parallel.tp_blocked import build_tp_blocked

    rng = np.random.default_rng(0)
    nnz, n_users, n_items, D = 4096, 128, 128, 4
    u = rng.integers(0, n_users, nnz)
    i = rng.integers(0, n_items, nnz)
    x = rng.integers(1, 6, nnz).astype(np.float64)
    kw = dict(block_users=16, block_items=16, chunk_size=8, group=2)

    lay = build_tp_blocked(u, i, x, n_users, n_items, D, **kw)
    # est_chunks = 4096 / D^2 / 8 = 32 -> cap = max(group, 32 // 4) = 8.
    # The unguarded heuristic would pick 16 * (32 / ceil(32/16)) = 256.
    assert lay.by_user.seg_chunks == 8
    assert lay.by_item.seg_chunks == 8

    # Slot occupancy floor: with segments near the expected bucket size
    # the padding is bounded by chunk quantization, not whole segments.
    for dirn in (lay.by_user, lay.by_item):
        slots = dirn.sb.size * dirn.chunk_size  # D*D*n_seg*SEG*C
        assert nnz / slots > 0.25, (nnz, slots)


# ---------------------------------------------------------------------------
# Dense head inside the ring (TPHeadTier)
# ---------------------------------------------------------------------------


def _hpf_blocked_state(mesh, layout_kwargs, dp=1, seed=3, iters=3):
    """Run 3 blocked-ring HPF iterations with the given layout kwargs."""
    import jax

    from pmf_tpu.models.hpf import HPFConfig, init_state
    from pmf_tpu.parallel.tp import (
        HPF_AXIS_OF, HPF_PAD_ONES, pad_state_rows,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_hpf_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=seed)
    D = 8 // dp
    cfg = HPFConfig(n_factors=5, random_state=0, dtype="float32")
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime,
             cfg.d_prime)
    layout = build_tp_blocked(u, i, x, n_users, n_items, D,
                              dtype=np.float32, dp=dp, **_tile_kwargs(),
                              **layout_kwargs)
    state0 = pad_state_rows(
        init_state(n_users, n_items, cfg), HPF_AXIS_OF,
        layout.n_users_pad, layout.n_items_pad, ones_keys=HPF_PAD_ONES)
    layout, st = place_tp_blocked(layout, dict(state0), mesh)
    for _ in range(iters):
        st = tp_sweep_hpf_blocked(st, layout, *hyper, mesh=mesh,
                                  interpret=True)
    return layout, jax.device_get(st)


def test_hpf_tp_head_matches_headless(mesh8):
    """Explicit per-bucket head tiers: the dense-corner statistics from
    the fused MXU kernel land within kernel rounding of the pure edge
    layout (which processes the same edges through the segment scan)."""
    lay_head, s_head = _hpf_blocked_state(
        mesh8, dict(head=[(0, 8, 8)], head_r0=4))
    assert lay_head.head_user and lay_head.head_item
    # The carve actually moved edges out of the tail.
    lay_plain, s_plain = _hpf_blocked_state(mesh8, {})
    assert (np.asarray(lay_head.by_user.seg_nrows).sum()
            <= np.asarray(lay_plain.by_user.seg_nrows).sum())
    _assert_close(s_plain, s_head, rtol=3e-4, atol=3e-5)


def test_hpf_tp_head_hybrid(mesh2x4):
    """Hybrid DP x TP: tier rows split contiguously over the data axis
    (replica bands), combined by the per-pass psum."""
    lay_head, s_head = _hpf_blocked_state(
        mesh2x4, dict(head=[(0, 8, 8)], head_r0=4), dp=2)
    assert lay_head.head_user[0].x_hi.shape[-2] == 4  # hu_r = 8 / dp
    _, s_plain = _hpf_blocked_state(mesh2x4, {}, dp=2)
    _assert_close(s_plain, s_head, rtol=3e-4, atol=3e-5)


def test_hpf_tp_head_auto(mesh8):
    """head='auto' with the small-data gates lifted picks tiers and
    still matches the headless ring.  Needs shards at least 128 items
    wide (`_pick_tiers`' minimum tier width), hence the bigger shape."""
    import jax

    from pmf_tpu.models.hpf import HPFConfig, init_state
    from pmf_tpu.parallel.tp import (
        HPF_AXIS_OF, HPF_PAD_ONES, pad_state_rows,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_hpf_blocked,
    )

    rng = np.random.default_rng(7)
    n_users = n_items = 1200
    u = rng.integers(0, n_users, 20000)
    i = rng.integers(0, n_items, 20000)
    key = u * n_items + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]
    x = rng.integers(1, 6, len(u)).astype(np.float64)
    cfg = HPFConfig(n_factors=4, random_state=0, dtype="float32")
    hyper = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime,
             cfg.d_prime)

    def run(head_kwargs):
        layout = build_tp_blocked(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32, **_tile_kwargs(),
                                  **head_kwargs)
        state0 = pad_state_rows(
            init_state(n_users, n_items, cfg), HPF_AXIS_OF,
            layout.n_users_pad, layout.n_items_pad,
            ones_keys=HPF_PAD_ONES)
        layout, st = place_tp_blocked(layout, dict(state0), mesh8)
        st = tp_sweep_hpf_blocked(st, layout, *hyper, mesh=mesh8,
                                  interpret=True)
        return layout, jax.device_get(st)

    lay_head, s_head = run(dict(head="auto", head_r0=4, head_min_nnz=0,
                                head_bytes=1 << 20))
    assert lay_head.head_user, "auto sizing picked no tiers"
    _, s_plain = run({})
    _assert_close(s_plain, s_head, rtol=3e-4, atol=3e-5)


def test_poisson_tp_head_matches_headless(mesh8):
    import jax

    from pmf_tpu.models.poisson_mf import PoissonMFConfig, init_state
    from pmf_tpu.parallel.tp import (
        POISSON_AXIS_OF, POISSON_PAD_ONES, pad_state_rows,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_poisson_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=5)
    cfg = PoissonMFConfig(n_factors=4, random_state=1, dtype="float32")

    def run(head_kwargs):
        layout = build_tp_blocked(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32, **_tile_kwargs(),
                                  **head_kwargs)
        state0 = pad_state_rows(
            init_state(n_users, n_items, cfg), POISSON_AXIS_OF,
            layout.n_users_pad, layout.n_items_pad,
            ones_keys=POISSON_PAD_ONES)
        layout, st = place_tp_blocked(layout, dict(state0), mesh8)
        for _ in range(3):
            st = tp_sweep_poisson_blocked(st, layout, cfg.a0, cfg.b0,
                                          mesh=mesh8, interpret=True)
        return jax.device_get(st)

    _assert_close(run({}), run(dict(head=[(0, 8, 8)], head_r0=4)),
                  rtol=3e-4, atol=3e-5)


def test_poisson_ext_tp_head_matches_headless(mesh8):
    """Extended Poisson with per-bucket head tiers: the psi-scaled M
    products and the theta.(M@sb) scalar-rate identity land within
    kernel rounding of the headless two-ring form."""
    import jax

    from pmf_tpu.models.poisson_mf import PoissonMFConfig, init_state
    from pmf_tpu.parallel.tp import (
        POISSON_EXT_AXIS_OF, POISSON_PAD_ONES, pad_state_rows,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_poisson_ext_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=9)
    cfg = PoissonMFConfig(n_factors=4, random_state=2, dtype="float32",
                          extended=True)

    def run(head_kwargs):
        layout = build_tp_blocked(u, i, x, n_users, n_items, 8,
                                  dtype=np.float32, **_tile_kwargs(),
                                  **head_kwargs)
        state0 = pad_state_rows(
            init_state(n_users, n_items, cfg), POISSON_EXT_AXIS_OF,
            layout.n_users_pad, layout.n_items_pad,
            ones_keys=POISSON_PAD_ONES)
        layout, st = place_tp_blocked(layout, dict(state0), mesh8)
        for _ in range(3):
            st = tp_sweep_poisson_ext_blocked(st, layout, cfg.a0, cfg.b0,
                                              mesh=mesh8, interpret=True)
        return jax.device_get(st)

    _assert_close(run({}), run(dict(head=[(0, 8, 8)], head_r0=4)),
                  rtol=3e-4, atol=3e-5)


def test_poisson_ext_tp_head_hybrid(mesh2x4):
    """Extended head on the 2-D mesh: replica row bands (p_rep offsets)
    in both ring passes combine through the per-pass psum."""
    import jax

    from pmf_tpu.models.poisson_mf import PoissonMFConfig, init_state
    from pmf_tpu.parallel.tp import (
        POISSON_EXT_AXIS_OF, POISSON_PAD_ONES, pad_state_rows,
    )
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_poisson_ext_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=9)
    cfg = PoissonMFConfig(n_factors=4, random_state=2, dtype="float32",
                          extended=True)

    def run(head_kwargs):
        layout = build_tp_blocked(u, i, x, n_users, n_items, 4, dp=2,
                                  dtype=np.float32, **_tile_kwargs(),
                                  **head_kwargs)
        state0 = pad_state_rows(
            init_state(n_users, n_items, cfg), POISSON_EXT_AXIS_OF,
            layout.n_users_pad, layout.n_items_pad,
            ones_keys=POISSON_PAD_ONES)
        layout, st = place_tp_blocked(layout, dict(state0), mesh2x4)
        for _ in range(2):
            st = tp_sweep_poisson_ext_blocked(st, layout, cfg.a0, cfg.b0,
                                              mesh=mesh2x4, interpret=True)
        return jax.device_get(st)

    _assert_close(run({}), run(dict(head=[(0, 8, 8)], head_r0=4)),
                  rtol=3e-4, atol=3e-5)


def test_tp_explicit_tier_overlap_rejected():
    """Overlapping explicit head tiers would scatter the shared corner
    edges into BOTH tiers' stacks (double-counted ring statistics); the
    TP build must reject them like the single-chip build does."""
    from pmf_tpu.parallel.tp_blocked import build_tp_blocked

    u, i, x, n_users, n_items = _ratings(seed=13)
    with pytest.raises(ValueError, match="disjoint"):
        build_tp_blocked(u, i, x, n_users, n_items, 2, dtype=np.float32,
                         **_tile_kwargs(), head=[(0, 8, 8), (4, 8, 4)],
                         head_r0=4)


def test_gaussian_rejects_head(mesh8):
    """The Gaussian ring rejects head layouts with a descriptive error
    instead of silently dropping the carved edges."""
    from pmf_tpu.models.gaussian_mf import GaussianMFConfig
    from pmf_tpu.models.gaussian_mf import init_state as g_init
    from pmf_tpu.parallel.tp import GAUSSIAN_AXIS_OF, pad_state_rows
    from pmf_tpu.parallel.tp_blocked import (
        build_tp_blocked, place_tp_blocked, tp_sweep_gaussian_blocked,
    )

    u, i, x, n_users, n_items = _ratings(seed=11)
    layout = build_tp_blocked(u, i, x - x.mean(), n_users, n_items, 8,
                              dtype=np.float32, **_tile_kwargs(),
                              head=[(0, 8, 8)], head_r0=4)
    cfg = GaussianMFConfig(n_factors=4, random_state=0, dtype="float32")
    state0 = pad_state_rows(g_init(n_users, n_items, cfg),
                            GAUSSIAN_AXIS_OF, layout.n_users_pad,
                            layout.n_items_pad)
    layout_g, st = place_tp_blocked(layout, dict(state0), mesh8)
    with pytest.raises(ValueError, match="dense head"):
        tp_sweep_gaussian_blocked(st, layout_g, cfg.sigma2, cfg.eta_theta2,
                                  cfg.eta_beta2, cfg.eta_bias2,
                                  use_bias=True, covariance="full",
                                  mesh=mesh8, interpret=True)
