import numpy as np

from pmf_tpu.models.hpf import HPF, HPFConfig
from pmf_tpu.utils.checkpoint import load_model, load_state, save_model, save_state


def test_state_roundtrip(tmp_path):
    state = {"a": np.arange(6.0).reshape(2, 3), "b": np.ones(4)}
    save_state(str(tmp_path / "ck"), state, {"iteration": 3})
    got, meta = load_state(str(tmp_path / "ck"))
    assert meta["iteration"] == 3
    np.testing.assert_allclose(got["a"], state["a"])
    np.testing.assert_allclose(got["b"], state["b"])


def test_model_roundtrip(tmp_path, small_splits):
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    cfg = HPFConfig(n_factors=5, max_iter=3, tol=None, verbose=False)
    model = HPF(cfg).fit((tu, ti, tx + 1), (vu, vi, vx + 1))
    save_model(model, str(tmp_path / "hpf_ck"))
    loaded = load_model(str(tmp_path / "hpf_ck"))
    assert type(loaded).__name__ == "HPF"
    assert loaded.n_users == model.n_users
    assert loaded.config.n_factors == 5
    np.testing.assert_allclose(
        loaded.predict(vu[:20], vi[:20]), model.predict(vu[:20], vi[:20]), rtol=1e-6
    )


def test_fit_resume_from_checkpoint(tmp_path, small_splits):
    """Checkpoint mid-training, resume, and match an uninterrupted run."""
    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1), (vu, vi, vx + 1)
    base = dict(n_factors=5, tol=None, verbose=False, dtype="float64", engine="flat")

    full = HPF(HPFConfig(max_iter=6, **base)).fit(train, val)

    ck = str(tmp_path / "resume_ck")
    HPF(HPFConfig(max_iter=3, **base)).fit(train, val,
                                           checkpoint_dir=ck, checkpoint_every=3)
    resumed = HPF(HPFConfig(max_iter=3, **base)).fit(train, val, resume_from=ck)

    for k in full.state:
        np.testing.assert_allclose(
            np.asarray(full.state[k]), np.asarray(resumed.state[k]),
            rtol=1e-10, err_msg=k,
        )


def test_hpf_map_resume_with_optimizer_state(tmp_path, small_splits):
    """HPF-MAP exact resume: params + Adam moments + epoch RNG key persist,
    so checkpoint-at-3 + resume-to-6 equals an uninterrupted 6-epoch run
    bitwise (same shuffles, same optimizer trajectory)."""
    from pmf_tpu.models.hpf_map import HPFMap, HPFMapConfig

    (tu, ti, tx), (vu, vi, vx), _ = small_splits
    train, val = (tu, ti, tx + 1), (vu, vi, vx + 1)
    base = dict(n_factors=4, lr=0.01, batch_size=256, verbose=False,
                random_state=3, dtype="float64")

    full = HPFMap(HPFMapConfig(epochs=6, **base)).fit(train, val)

    ck = str(tmp_path / "map_ck")
    HPFMap(HPFMapConfig(epochs=3, **base)).fit(train, val,
                                               checkpoint_dir=ck,
                                               checkpoint_every=3)
    resumed = HPFMap(HPFMapConfig(epochs=6, **base)).fit(train, val,
                                                         resume_from=ck)
    # Resume continues at epoch 4.
    assert [r["epoch"] for r in resumed.fit_history] == [4, 5, 6]
    for k in full.state:
        np.testing.assert_allclose(
            np.asarray(full.state[k]), np.asarray(resumed.state[k]),
            rtol=1e-12, atol=0, err_msg=k,
        )

    # Resuming without Adam moments would diverge: check the checkpoint
    # actually carries more than the params (4 param leaves + count/mu/nu).
    flat, meta = load_state(ck)
    assert meta["name"] == "HPFMap"
    n_leaves = sum(1 for k in flat if k.startswith("leaf_"))
    assert n_leaves > 4, "optimizer state missing from HPF-MAP checkpoint"


def test_fitloop_periodic_checkpoint(tmp_path, small_splits):
    (tu, ti, tx), _, _ = small_splits
    cfg = HPFConfig(n_factors=4, max_iter=4, tol=None, verbose=False)
    model = HPF(cfg)
    # Drive fit with checkpointing through the loop by monkey-wiring:
    from pmf_tpu.data.coo import build_ratings
    from pmf_tpu.models import hpf
    from pmf_tpu.models.base import FitLoop, poisson_stop_rule

    data = build_ratings(tu, ti, tx + 1)
    state = hpf.init_state(data.n_users, data.n_items, cfg)
    loop = FitLoop(
        lambda s, d: hpf.sweep(s, d, cfg.a, cfg.a_prime, cfg.b_prime, cfg.c,
                               cfg.c_prime, cfg.d_prime),
        None, cfg.max_iter, cfg.tol, poisson_stop_rule,
        checkpoint_dir=str(tmp_path / "loopck"), checkpoint_every=2,
    )
    final = loop.run(state, data, None)
    got, meta = load_state(str(tmp_path / "loopck"))
    assert meta["iteration"] == 4  # last multiple of 2 <= max_iter
    np.testing.assert_allclose(np.asarray(final["a_theta"]), got["a_theta"], rtol=1e-6)


def test_cross_mode_resume_names_tp_padding(tmp_path):
    """Resuming a TP (mesh-padded rows) checkpoint into a flat fit must
    fail with a message naming the row-padding/mode mismatch, not an
    opaque shape error (ADVICE r3)."""
    import pandas as pd
    import pytest

    from pmf_tpu.data.synthetic import synth_ratings
    from pmf_tpu.models import HPF, HPFConfig
    from pmf_tpu.parallel import make_mesh

    u, i, x = synth_ratings(30, 22, 300, seed=3)
    df = pd.DataFrame({"u": u, "i": i, "rating": x + 1.0})
    cfg = HPFConfig(n_factors=3, max_iter=2, tol=None, verbose=False)
    ck = str(tmp_path / "tp_ck")
    mesh = make_mesh(4)
    HPF(cfg).fit(df, mesh=mesh, state_sharding="rows",
                 checkpoint_dir=ck, checkpoint_every=1)
    with pytest.raises(ValueError, match="mesh-.?padded|state_sharding"):
        HPF(cfg).fit(df, resume_from=ck)
