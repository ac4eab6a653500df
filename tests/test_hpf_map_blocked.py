"""HPF-MAP blocked SGD engine (`pmf_tpu.ops.pallas.map_grad` +
`hpf_map.train_epoch_blocked`).

VERDICT r3 #3: the MAP path ran at 10M edge-visits/s, gather/scatter
latency bound; the blocked one-hot machinery was never tried on the SGD
gradients.  These tests gate the attempt: (a) the kernel's gradients
match `jax.grad` of the flat `batch_loss` on the identical edge set,
(b) a full blocked fit converges to flat-fit quality, (c) checkpoints
round-trip across engines (original row order on disk).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _data(n_users=60, n_items=45, nnz=900, seed=13):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, nnz)
    i = rng.integers(0, n_items, nnz)
    key = u * n_items + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]
    x = rng.integers(1, 6, len(u)).astype(np.float64) + 1.0  # +1 shift
    return u, i, x, n_users, n_items


def test_blocked_gradients_match_autodiff():
    """One Adam step over ONE segment covering every edge: the kernel's
    (NLL + scaled prior) gradient must equal jax.grad(batch_loss) on the
    same batch (precision='highest', f32)."""
    import optax

    from pmf_tpu.models import hpf_map
    from pmf_tpu.models.hpf_map import (
        batch_loss, build_map_layout, init_params, train_epoch_blocked,
        _permute_rows,
    )

    u, i, x, n_users, n_items = _data()
    cfg = hpf_map.HPFMapConfig(n_factors=6, random_state=0, lr=0.01,
                               verbose=False)
    scal = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)

    lay = build_map_layout(u, i, x, n_users, n_items, batch_size=1 << 20,
                           dtype=np.float32)
    assert lay.n_segments == 1  # whole data = one batch

    params = init_params(n_users, n_items, cfg)
    params = jax.tree.map(lambda t: t.astype(jnp.float32), params)
    uc = np.bincount(u, minlength=n_users)
    ic = np.bincount(i, minlength=n_items)
    user_scale = jnp.asarray(1.0 / (uc + 1e-6), jnp.float32)
    item_scale = jnp.asarray(1.0 / (ic + 1e-6), jnp.float32)

    # Flat-oracle gradient + Adam step over the same (full) batch.
    mask = jnp.ones(len(u), bool)
    loss_ref, grads_ref = jax.value_and_grad(batch_loss)(
        params, jnp.asarray(u), jnp.asarray(i),
        jnp.asarray(x, jnp.float32), mask, user_scale, item_scale, scal)
    opt = optax.adam(cfg.lr)
    upd, _ = opt.update(grads_ref, opt.init(params), params)
    import optax as _optax

    p_ref = _optax.apply_updates(params, upd)

    # Blocked step (permuted world), then unpermute.
    p_blk, s_blk = _permute_rows(params, opt.init(params),
                                 lay.u_old_of_new, lay.i_old_of_new)
    p_out, s_out, loss_blk = train_epoch_blocked(
        p_blk, s_blk, jax.random.key(0), lay,
        user_scale[lay.u_old_of_new], item_scale[lay.i_old_of_new],
        scal, opt, precision="highest", interpret=True)
    p_out, _ = _permute_rows(p_out, s_out, lay.u_new_of_old,
                             lay.i_new_of_old)

    assert abs(float(loss_blk) - float(loss_ref)) < 1e-2 * abs(float(loss_ref))
    for k in ("user", "item"):
        np.testing.assert_allclose(np.asarray(p_out[k]),
                                   np.asarray(p_ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


@pytest.mark.parametrize("mix", [3, 4])
def test_mixed_step_equals_full_batch(mix):
    """A composed Adam step over ``mix`` segments whose union is the whole
    edge set (mix=4 includes a dummy padding segment) must equal the flat
    full-batch step — gradient accumulation across mixed segments is
    exact, dummies contribute nothing."""
    import optax

    from pmf_tpu.models import hpf_map
    from pmf_tpu.models.hpf_map import (
        batch_loss, build_map_layout, init_params, train_epoch_blocked,
        _permute_rows,
    )

    u, i, x, n_users, n_items = _data(nnz=5000)
    cfg = hpf_map.HPFMapConfig(n_factors=6, random_state=0, lr=0.01,
                               verbose=False)
    scal = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)

    # 3 real segments of 16 chunks each (one 512-row block, ~40 real
    # chunks padded to 48); mix=3 -> exactly one composed step, mix=4 ->
    # one dummy segment appended.
    lay = build_map_layout(u, i, x, n_users, n_items,
                           batch_size=mix * 2048, mix=mix,
                           dtype=np.float32)
    assert lay.n_segments == mix

    params = init_params(n_users, n_items, cfg)
    params = jax.tree.map(lambda t: t.astype(jnp.float32), params)
    uc = np.bincount(u, minlength=n_users)
    ic = np.bincount(i, minlength=n_items)
    user_scale = jnp.asarray(1.0 / (uc + 1e-6), jnp.float32)
    item_scale = jnp.asarray(1.0 / (ic + 1e-6), jnp.float32)

    mask = jnp.ones(len(u), bool)
    _, grads_ref = jax.value_and_grad(batch_loss)(
        params, jnp.asarray(u), jnp.asarray(i),
        jnp.asarray(x, jnp.float32), mask, user_scale, item_scale, scal)
    opt = optax.adam(cfg.lr)
    upd, _ = opt.update(grads_ref, opt.init(params), params)
    p_ref = optax.apply_updates(params, upd)

    p_blk, s_blk = _permute_rows(params, opt.init(params),
                                 lay.u_old_of_new, lay.i_old_of_new)
    p_out, s_out, _ = train_epoch_blocked(
        p_blk, s_blk, jax.random.key(0), lay,
        user_scale[lay.u_old_of_new], item_scale[lay.i_old_of_new],
        scal, opt, precision="highest", interpret=True, mix=mix)
    p_out, _ = _permute_rows(p_out, s_out, lay.u_new_of_old,
                             lay.i_new_of_old)
    for k in ("user", "item"):
        np.testing.assert_allclose(np.asarray(p_out[k]),
                                   np.asarray(p_ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_blocked_fit_converges_like_flat(small_splits):
    """Full facade fit with engine='blocked_mid': the best-over-epochs
    val RMSE lands within the MAP stochastic band of the flat engine's.

    Tile-local batches are MORE correlated than uniform ones, so per-
    epoch progress is a little slower on tiny data (measured: flat
    reaches its 1.69 basin at ~12 epochs, blocked at ~20, both then
    drift up from overfitting) — the gate is the basin, not the epoch
    count."""
    from pmf_tpu.models.hpf_map import HPFMap, HPFMapConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1.0), (vu, vi, vx + 1.0)
    base = dict(n_factors=6, lr=0.02, batch_size=512,
                verbose=False, random_state=3, dtype="float32")

    flat = HPFMap(HPFMapConfig(engine="flat", epochs=12, **base)).fit(
        train, val)
    blk = HPFMap(HPFMapConfig(engine="blocked_mid", epochs=20, **base)).fit(
        train, val)

    assert np.isfinite(blk.best_val_rmse)
    assert abs(blk.best_val_rmse - flat.best_val_rmse) < 0.1, (
        blk.best_val_rmse, flat.best_val_rmse)


def test_blocked_checkpoint_cross_engine(tmp_path, small_splits):
    """Blocked-engine checkpoints store ORIGINAL row order: a flat-engine
    fit can resume them (and vice versa) with exact state continuity."""
    from pmf_tpu.models.hpf_map import HPFMap, HPFMapConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1.0), (vu, vi, vx + 1.0)
    base = dict(n_factors=5, lr=0.02, batch_size=512, verbose=False,
                random_state=7, dtype="float32")

    ck = str(tmp_path / "ck")
    m1 = HPFMap(HPFMapConfig(engine="blocked_mid", epochs=4, **base)).fit(
        train, val, checkpoint_dir=ck, checkpoint_every=4)
    m2 = HPFMap(HPFMapConfig(engine="flat", epochs=5, **base)).fit(
        train, val, resume_from=ck)
    assert len(m2.fit_history) == 1  # resumed after epoch 4
    assert np.isfinite(m2.fit_history[-1]["val_rmse"])
