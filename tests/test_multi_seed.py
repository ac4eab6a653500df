import numpy as np

from pmf_tpu.models.hpf import HPF, HPFConfig
from pmf_tpu.tune.multi_seed import multi_seed_fit


def test_multi_seed_matches_sequential(small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1), (vu, vi, vx + 1)
    cfg = HPFConfig(n_factors=5, max_iter=4, tol=None, verbose=False,
                    dtype="float64", engine="flat")

    stacked, metrics = multi_seed_fit(cfg, train, val, seeds=(3, 7))
    assert len(metrics) == 2

    # Each vmapped seed must equal its sequential counterpart exactly.
    for k, seed in enumerate((3, 7)):
        import dataclasses

        solo = HPF(dataclasses.replace(cfg, random_state=seed)).fit(train, val)
        for key in solo.state:
            np.testing.assert_allclose(
                np.asarray(stacked[key][k]), np.asarray(solo.state[key]),
                rtol=1e-10, err_msg=f"seed {seed} key {key}",
            )
        assert abs(metrics[k]["val_rmse"] - solo.fit_history[-1]["val_rmse"]) < 1e-9

    # Seeds genuinely differ.
    assert not np.allclose(np.asarray(stacked["a_theta"][0]),
                           np.asarray(stacked["a_theta"][1]))
