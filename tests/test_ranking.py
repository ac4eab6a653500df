"""Ranking metrics vs a naive sort-based oracle."""

import numpy as np

from pmf_tpu.eval.ranking import ranking_metrics


def _naive(theta, beta, train_u, train_i, test_u, test_i, k):
    n_users, n_items = theta.shape[0], beta.shape[0]
    train_sets = {u: set() for u in range(n_users)}
    for u, i in zip(train_u, train_i):
        train_sets[u].add(i)
    ranks = []
    scores_all = theta @ beta.T
    for u, i in zip(test_u, test_i):
        s = scores_all[u]
        target = s[i]
        competitors = [j for j in range(n_items) if j not in train_sets[u]]
        rank = 1 + sum(1 for j in competitors if s[j] > target)
        ranks.append(rank)
    ranks = np.array(ranks, dtype=float)
    hit = ranks <= k
    return {
        "mean_rank": ranks.mean(),
        f"recall@{k}": hit.mean(),
        f"ndcg@{k}": np.where(hit, 1.0 / np.log2(ranks + 1), 0.0).mean(),
    }


def test_ranking_matches_naive():
    rng = np.random.default_rng(0)
    n_users, n_items, K = 40, 60, 5
    theta = rng.standard_normal((n_users, K)).astype(np.float32)
    beta = rng.standard_normal((n_items, K)).astype(np.float32)

    # Train edges: ~8 per user; test: 1-2 held-out items per user.
    train_u, train_i, test_u, test_i = [], [], [], []
    for u in range(n_users):
        items = rng.choice(n_items, size=10, replace=False)
        train_u += [u] * 8
        train_i += list(items[:8])
        n_test = 1 + (u % 2)
        test_u += [u] * n_test
        test_i += list(items[8 : 8 + n_test])

    got = ranking_metrics(theta, beta, np.array(train_u), np.array(train_i),
                          np.array(test_u), np.array(test_i), ks=(10,), batch=7)
    want = _naive(theta, beta, train_u, train_i, test_u, test_i, 10)
    assert abs(got["mean_rank"] - want["mean_rank"]) < 1e-4
    assert abs(got["recall@10"] - want["recall@10"]) < 1e-9
    assert abs(got["ndcg@10"] - want["ndcg@10"]) < 1e-6


def test_ranking_chunked_edge_pass_matches_single_shot():
    """The train-correction edge pass scans fixed-size chunks at scale
    (one whole-nnz program OOMs HBM at 24.5M edges); a tiny edge_chunk
    forces chunking + tail padding and must reproduce the single-shot
    counts exactly."""
    rng = np.random.default_rng(3)
    n_users, n_items, K = 50, 70, 4
    theta = rng.standard_normal((n_users, K)).astype(np.float32)
    beta = rng.standard_normal((n_items, K)).astype(np.float32)
    train_u = rng.integers(0, n_users, 500)
    train_i = rng.integers(0, n_items, 500)
    test_u = np.arange(n_users)
    test_i = rng.integers(0, n_items, n_users)

    one = ranking_metrics(theta, beta, train_u, train_i, test_u, test_i,
                          ks=(10,))
    # 96-edge chunks: 500 edges -> 5 full chunks + a padded 20-edge tail.
    chunked = ranking_metrics(theta, beta, train_u, train_i, test_u, test_i,
                              ks=(10,), edge_chunk=96)
    assert one == chunked


def test_ranking_perfect_model():
    """A model that scores the held-out item highest must get recall@1 == 1."""
    n_users, n_items = 10, 30
    theta = np.eye(n_users, 4, dtype=np.float32)
    beta = np.zeros((n_items, 4), dtype=np.float32)
    test_u = np.arange(n_users)
    test_i = np.arange(n_users)  # item i for user i
    beta[test_i, :] = 0.0
    for u in range(n_users):
        beta[u] = theta[u] * 10  # held-out item aligned with the user
    got = ranking_metrics(theta, beta, np.array([0]), np.array([29]),
                          test_u, test_i, ks=(1,))
    assert got["recall@1"] == 1.0
    assert got["ndcg@1"] == 1.0


def test_recommend_matches_dense_oracle(small_splits):
    """recommend() matches a dense numpy argsort oracle with train-item
    exclusion, across batch boundaries."""
    import numpy as np

    from pmf_tpu.eval.recommend import recommend

    (tu, ti, tx), _, _ = small_splits
    rng = np.random.default_rng(3)
    n_users, n_items, K = int(tu.max()) + 1, int(ti.max()) + 1, 6
    theta = rng.standard_normal((n_users, K)).astype(np.float32)
    beta = rng.standard_normal((n_items, K)).astype(np.float32)

    users = rng.choice(n_users, size=37, replace=False)
    k = 5
    items, scores = recommend(theta, beta, users, k=k, train_u=tu, train_i=ti,
                              batch=16)

    dense = theta @ beta.T
    for u_idx, u in enumerate(users):
        s = dense[u].copy()
        s[ti[tu == u]] = -np.inf
        want = np.argsort(-s, kind="stable")[:k]
        np.testing.assert_allclose(
            np.sort(s[want])[::-1], np.sort(scores[u_idx])[::-1], rtol=1e-5,
            err_msg=f"user {u}",
        )
        # item sets match (ties may reorder)
        assert set(items[u_idx]) == set(want) or np.allclose(
            np.sort(s[want]), np.sort(s[items[u_idx]]), rtol=1e-5
        )
        # no train item leaked
        assert not set(items[u_idx]) & set(ti[tu == u])

    # A prepared exclusion index (the serving pattern: sort once, reuse
    # across requests) gives identical results.
    from pmf_tpu.eval.recommend import build_exclusion_index

    idx = build_exclusion_index(tu, ti)
    items2, scores2 = recommend(theta, beta, users, k=k, train_index=idx,
                                batch=16)
    np.testing.assert_array_equal(items, items2)
    np.testing.assert_allclose(scores, scores2, rtol=1e-6)

    # The zero-transfer index derived from a training RatingsCOO (the
    # device-resident by-user layout) serves identically.
    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.eval.recommend import exclusion_index_from_coo

    coo = build_ratings(tu, ti, np.ones(len(tu), np.float32),
                        n_users=theta.shape[0], n_items=beta.shape[0])
    idx3 = exclusion_index_from_coo(coo)
    items3, scores3 = recommend(theta, beta, users, k=k, train_index=idx3,
                                batch=16)
    np.testing.assert_array_equal(items, items3)
    np.testing.assert_allclose(scores, scores3, rtol=1e-6)


def test_model_recommend_facade(small_splits):
    from pmf_tpu.models.hpf import HPF, HPFConfig

    (tu, ti, tx), _, _ = small_splits
    m = HPF(HPFConfig(n_factors=5, max_iter=2, tol=None, verbose=False)).fit(
        (tu, ti, tx + 1))
    items, scores = m.recommend([0, 1, 2], k=4, train=(tu, ti, tx))
    assert items.shape == (3, 4) and scores.shape == (3, 4)
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # descending


def test_recommend_ranks_with_item_bias(small_splits):
    """The Gaussian bias model's recommend() must rank by the SAME score
    its predict() reports (b_item participates in ranking; mean + b_user
    shift the reported scores) — regression for the serving path dropping
    learned biases."""
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig

    (tu, ti, tx), _, _ = small_splits
    mean = float(np.mean(tx))
    m = GaussianMF(
        GaussianMFConfig(n_factors=4, max_iter=3, tol=None, verbose=False,
                         engine="flat")
    ).fit((tu, ti, tx - mean), global_mean=mean)
    assert np.abs(np.asarray(m.state["b_item"])).max() > 0  # biases learned

    users = np.arange(5)
    k = 4
    items, scores = m.recommend(users, k=k)
    for r, u in enumerate(users):
        s = m.predict(np.full(m.n_items, u), np.arange(m.n_items),
                      global_mean=mean)
        want = np.argsort(-s, kind="stable")[:k]
        np.testing.assert_allclose(np.sort(s[want])[::-1], scores[r],
                                   rtol=1e-4, atol=1e-4)
        same = set(items[r]) == set(want)
        assert same or np.allclose(np.sort(s[items[r]]), np.sort(s[want]),
                                   atol=1e-5)


def test_model_recommend_mesh_facade(small_splits):
    """model.recommend(mesh=) routes through recommend_sharded and equals
    the single-device facade, including the Gaussian bias/mean score
    shifts."""
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig
    from pmf_tpu.parallel import make_mesh

    (tu, ti, tx), _, _ = small_splits
    mean = float(np.mean(tx))
    m = GaussianMF(
        GaussianMFConfig(n_factors=4, max_iter=3, tol=None, verbose=False,
                         engine="flat")
    ).fit((tu, ti, tx - mean), global_mean=mean)
    users = np.arange(13)
    i1, s1 = m.recommend(users, k=5, train=(tu, ti, tx))
    i2, s2 = m.recommend(users, k=5, train=(tu, ti, tx),
                         mesh=make_mesh(8))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_recommend_sharded_matches_single():
    """Mesh-parallel serving: users sharded over an 8-device mesh must
    return exactly the single-device recommend() results (scores, masks,
    and top-k are all row-local — zero collectives)."""
    from pmf_tpu.eval.recommend import (
        build_exclusion_index,
        recommend,
        recommend_sharded,
    )
    from pmf_tpu.parallel import make_mesh

    rng = np.random.default_rng(11)
    nu, ni, nnz = 300, 120, 4000
    tu = rng.integers(0, nu, nnz)
    ti = rng.integers(0, ni, nnz)
    theta = rng.standard_normal((nu, 6)).astype(np.float32)
    beta = rng.standard_normal((ni, 6)).astype(np.float32)
    bias = rng.standard_normal(ni).astype(np.float32)
    idx = build_exclusion_index(tu, ti, n_users=nu)
    users = rng.integers(0, nu, 101)  # odd count: exercises padding
    mesh = make_mesh(8)

    it1, s1 = recommend(theta, beta, users, k=7, train_index=idx,
                        item_bias=bias)
    it2, s2 = recommend_sharded(theta, beta, users, k=7, train_index=idx,
                                mesh=mesh, item_bias=bias)
    np.testing.assert_array_equal(it1, it2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

    # No exclusion index: plain sharded scoring.
    it3, s3 = recommend(theta, beta, users, k=7)
    it4, s4 = recommend_sharded(theta, beta, users, k=7, mesh=mesh)
    np.testing.assert_array_equal(it3, it4)
    np.testing.assert_allclose(s3, s4, rtol=1e-6)

    # Batched dispatch (batch < n, last batch partial) is identical —
    # the batch loop bounds per-device score memory like recommend's.
    it5, s5 = recommend_sharded(theta, beta, users, k=7, train_index=idx,
                                mesh=mesh, item_bias=bias, batch=32)
    np.testing.assert_array_equal(it1, it5)
    np.testing.assert_allclose(s1, s5, rtol=1e-6)

    # Out-of-range ids raise like the single-device path (not silently
    # clamp to another user's rows).
    import pytest

    for bad in ([-1], [nu]):
        with pytest.raises(ValueError, match="out of range"):
            recommend_sharded(theta, beta, bad, k=7, train_index=idx,
                              mesh=mesh)


def test_recommend_cold_user_above_trained_range():
    """A prebuilt exclusion index sized from max(train_u)+1 must still
    serve valid cold users above the largest trained user (row_ptr pads
    to theta's rows; those users get zero exclusions)."""
    from pmf_tpu.eval.recommend import build_exclusion_index, recommend

    rng = np.random.default_rng(7)
    theta = rng.standard_normal((12, 3)).astype(np.float32)
    beta = rng.standard_normal((9, 3)).astype(np.float32)
    tu = np.array([0, 0, 1, 2, 2, 5])  # max trained user = 5 < 12 rows
    ti = np.array([1, 3, 0, 4, 5, 2])
    idx = build_exclusion_index(tu, ti)  # n_users defaulted to 6
    items, scores = recommend(theta, beta, [5, 11], k=4, train_index=idx)
    # user 11 (cold): plain argsort, nothing excluded
    want = np.argsort(-(theta[11] @ beta.T), kind="stable")[:4]
    np.testing.assert_array_equal(np.sort(items[1]), np.sort(want))
    # user 5: its train item 2 stays excluded
    assert 2 not in items[0]


def test_recommend_out_of_range_user_raises():
    import pytest

    from pmf_tpu.eval.recommend import recommend

    theta = np.zeros((10, 3), np.float32)
    beta = np.zeros((8, 3), np.float32)
    with pytest.raises(ValueError, match="out of range"):
        recommend(theta, beta, [3, 11], k=2)
    with pytest.raises(ValueError, match="out of range"):
        recommend(theta, beta, [-1], k=2)


def test_exclusion_index_rejects_out_of_range_train_ids():
    """Caller-supplied n_users smaller than max(train_u) must raise — the
    radix path would silently drop those keys and misalign the CSR index
    (ADVICE r3)."""
    import pytest

    from pmf_tpu.eval.recommend import build_exclusion_index

    tu = np.array([0, 3, 7])
    ti = np.array([1, 2, 3])
    with pytest.raises(ValueError, match="out of range"):
        build_exclusion_index(tu, ti, n_users=5)
    with pytest.raises(ValueError, match="out of range"):
        build_exclusion_index(np.array([-1, 0]), np.array([0, 1]), n_users=5)


def test_recommend_sharded_pinned_cap():
    """A pinned cap reuses one executable across dispatches and matches
    the adaptive-cap results; an undersized cap raises instead of
    silently truncating exclusions (ADVICE r3)."""
    import pytest

    from pmf_tpu.eval.recommend import (
        build_exclusion_index,
        recommend_sharded,
    )
    from pmf_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    nu, ni, nnz = 200, 80, 3000
    tu = rng.integers(0, nu, nnz)
    ti = rng.integers(0, ni, nnz)
    theta = rng.standard_normal((nu, 5)).astype(np.float32)
    beta = rng.standard_normal((ni, 5)).astype(np.float32)
    idx = build_exclusion_index(tu, ti, n_users=nu)
    users = rng.integers(0, nu, 70)
    mesh = make_mesh(4)

    it1, s1 = recommend_sharded(theta, beta, users, k=5, train_index=idx,
                                mesh=mesh, batch=32)
    # Generous pinned cap: identical results, one compiled shape.
    it2, s2 = recommend_sharded(theta, beta, users, k=5, train_index=idx,
                                mesh=mesh, batch=32, cap=4096)
    np.testing.assert_array_equal(it1, it2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

    with pytest.raises(ValueError, match="pinned cap"):
        recommend_sharded(theta, beta, users, k=5, train_index=idx,
                          mesh=mesh, batch=64, cap=4)


def test_sampled_ranking_matches_bruteforce():
    """Sampled-negatives protocol: given the seed-determined candidate
    sets, ranks must equal a brute-force numpy computation, negatives
    must exclude train items and the target, and metrics must be
    deterministic in the seed."""
    from pmf_tpu.eval.ranking import sampled_ranking_metrics

    rng = np.random.default_rng(1)
    n_users, n_items, K = 30, 200, 4
    theta = rng.standard_normal((n_users, K)).astype(np.float32)
    beta = rng.standard_normal((n_items, K)).astype(np.float32)
    train_u, train_i, test_u, test_i = [], [], [], []
    for u in range(n_users):
        items = rng.choice(n_items, size=30, replace=False)
        train_u += [u] * 28
        train_i += list(items[:28])
        test_u += [u]
        test_i += [items[28]]
    train_u, train_i = np.array(train_u), np.array(train_i)
    test_u, test_i = np.array(test_u), np.array(test_i)

    got = sampled_ranking_metrics(theta, beta, train_u, train_i,
                                  test_u, test_i, n_negatives=50, seed=7,
                                  ks=(10,), batch=11)
    again = sampled_ranking_metrics(theta, beta, train_u, train_i,
                                    test_u, test_i, n_negatives=50, seed=7,
                                    ks=(10,), batch=64)
    assert got == again  # deterministic in seed, batch-size independent

    # Reproduce the candidate sets with the same RNG protocol and verify
    # the exclusion property + brute-force ranks.
    n_neg = 50
    train_keys = np.sort(train_u.astype(np.int64) * n_items + train_i)

    def is_seen(users, items):
        keys = users * n_items + items
        pos = np.minimum(np.searchsorted(train_keys, keys),
                         len(train_keys) - 1)
        return train_keys[pos] == keys

    r2 = np.random.default_rng(7)
    cands = r2.integers(0, n_items, size=(len(test_u), n_neg), dtype=np.int64)
    users_b = np.broadcast_to(test_u[:, None].astype(np.int64), cands.shape)
    bad = is_seen(users_b.ravel(), cands.ravel()).reshape(cands.shape)
    bad |= cands == test_i[:, None]
    while bad.any():
        redraw = r2.integers(0, n_items, size=int(bad.sum()), dtype=np.int64)
        cands[bad] = redraw
        bu = np.broadcast_to(test_u[:, None].astype(np.int64), cands.shape)[bad]
        still = is_seen(bu, redraw) | (
            redraw == test_i[:, None].repeat(n_neg, 1)[bad])
        nb = np.zeros_like(bad)
        nb[bad] = still
        bad = nb
    assert not is_seen(users_b.ravel(), cands.ravel()).any()
    assert not (cands == test_i[:, None]).any()

    scores = theta @ beta.T
    t = scores[test_u, test_i]
    neg_scores = scores[test_u[:, None], cands]
    ranks = 1.0 + (neg_scores > t[:, None]).sum(1)
    hit = ranks <= 10
    assert abs(got["mean_rank"] - ranks.mean()) < 1e-5
    assert abs(got["hr@10"] - hit.mean()) < 1e-9
    assert abs(got["ndcg@10"]
               - np.where(hit, 1.0 / np.log2(ranks + 1), 0.0).mean()) < 1e-6


def test_sampled_ranking_perfect_and_random():
    """A model that scores the held-out item above everything must get
    HR@10 = NDCG@10 = 1; random scores must land near the protocol's
    analytic floor (NDCG@10 ~ 0.045 at 100 negatives)."""
    from pmf_tpu.eval.ranking import sampled_ranking_metrics

    rng = np.random.default_rng(3)
    n_users, n_items, K = 400, 500, 3
    test_u = np.arange(n_users)
    test_i = rng.integers(0, n_items, n_users)
    beta = rng.standard_normal((n_items, K)).astype(np.float32)
    beta /= np.linalg.norm(beta, axis=1, keepdims=True)  # unit rows:
    # cos similarity peaks uniquely at the target itself.
    theta_perfect = beta[test_i]
    perfect = sampled_ranking_metrics(
        theta_perfect, beta, np.array([], np.int64), np.array([], np.int64),
        test_u, test_i, n_negatives=100, seed=0)
    assert perfect["hr@10"] > 0.99
    assert perfect["ndcg@10"] > 0.99

    theta_rand = rng.standard_normal((n_users, K)).astype(np.float32)
    rand = sampled_ranking_metrics(
        theta_rand, beta, np.array([], np.int64), np.array([], np.int64),
        test_u, test_i, n_negatives=100, seed=0)
    assert 0.02 < rand["ndcg@10"] < 0.09
    assert 0.05 < rand["hr@10"] < 0.16
