import jax.numpy as jnp
import numpy as np

from pmf_tpu.models.hpf_map import HPFMap, HPFMapConfig, batch_loss, init_params


def test_hpf_map_trains_and_improves(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    cfg = HPFMapConfig(
        n_factors=8, lr=0.005, batch_size=512, epochs=15, verbose=False, random_state=1
    )
    model = HPFMap(cfg).fit((tu, ti, tx + 1), (vu, vi, vx + 1))
    losses = [h["train_loss"] for h in model.fit_history]
    rmses = [h["val_rmse"] for h in model.fit_history]
    assert losses[-1] < losses[0]
    assert np.isfinite(rmses).all()
    # MAP on tiny data overfits late; the best epoch must beat the first.
    assert model.best_val_rmse < rmses[0]
    assert (model.predict(vu, vi) >= 0).all()


def test_prior_scaling_invariant():
    """Sum of 1/count-scaled per-occurrence priors over a full epoch must
    equal applying each entity's prior exactly once (the reference's
    invariant, `hpf_pytorch.py:129-139`)."""
    rng = np.random.default_rng(0)
    n_users, n_items, K = 6, 5, 3
    u = np.array([0, 0, 0, 1, 1, 2, 3, 4, 5, 5])
    i = np.array([0, 1, 2, 0, 3, 4, 2, 1, 0, 3])
    x = rng.integers(1, 6, size=len(u)).astype(np.float64)

    cfg = HPFMapConfig(n_factors=K, random_state=0, dtype="float64")
    params = init_params(n_users, n_items, cfg)
    scalars = (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)

    user_counts = np.bincount(u, minlength=n_users)
    item_counts = np.bincount(i, minlength=n_items)
    user_scale = jnp.asarray(1.0 / (user_counts + 1e-6))
    item_scale = jnp.asarray(1.0 / (item_counts + 1e-6))

    mask = jnp.ones(len(u), dtype=bool)
    total = float(
        batch_loss(
            params, jnp.asarray(u), jnp.asarray(i), jnp.asarray(x), mask,
            user_scale, item_scale, scalars,
        )
    )

    # Direct computation: NLL over edges + per-entity priors applied once.
    import jax

    theta = np.asarray(jax.nn.softplus(params["user"][:, :-1]))
    beta = np.asarray(jax.nn.softplus(params["item"][:, :-1]))
    xi = np.asarray(jax.nn.softplus(params["user"][:, -1]))
    eta = np.asarray(jax.nn.softplus(params["item"][:, -1]))
    lam = np.maximum(np.sum(theta[u] * beta[i], axis=1), 1e-6)
    nll = np.sum(lam - x * np.log(lam))
    a, a_p, b_p, c, c_p, d_p = scalars
    pt = np.sum(-a * np.log(xi)[:, None] + xi[:, None] * theta - (a - 1) * np.log(theta), axis=1)
    pb = np.sum(-c * np.log(eta)[:, None] + eta[:, None] * beta - (c - 1) * np.log(beta), axis=1)
    pxi = -(a_p - 1) * np.log(xi) + b_p * xi
    peta = -(c_p - 1) * np.log(eta) + d_p * eta
    # Only entities appearing in the epoch receive their prior.
    seen_u = user_counts > 0
    seen_i = item_counts > 0
    direct = (
        nll
        + pt[seen_u].sum()
        + pxi[seen_u].sum()
        + pb[seen_i].sum()
        + peta[seen_i].sum()
    )
    assert abs(total - direct) / abs(direct) < 1e-5
