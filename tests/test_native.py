"""Native C++ ingest runtime vs pandas/numpy ground truth."""

import numpy as np
import pandas as pd
import pytest

from pmf_tpu.data.native import get_lib, parse_interactions_csv, radix_argsort


def test_native_builds():
    assert get_lib() is not None, "g++ toolchain expected in this environment"


def test_parse_csv_matches_pandas(tmp_path):
    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame(
        {
            "extra": rng.integers(0, 9, n),
            "u": rng.integers(0, 1000, n),
            "i": rng.integers(0, 500, n),
            "rating": rng.integers(0, 6, n).astype(float),
            "split": ["x"] * n,
        }
    )
    path = str(tmp_path / "interactions.csv")
    df.to_csv(path, index=False)

    u, i, x = parse_interactions_csv(path)
    np.testing.assert_array_equal(u, df["u"].to_numpy())
    np.testing.assert_array_equal(i, df["i"].to_numpy())
    np.testing.assert_allclose(x, df["rating"].to_numpy())


def test_parse_csv_fractional_ratings(tmp_path):
    path = str(tmp_path / "r.csv")
    with open(path, "w") as f:
        f.write("u,i,rating\n0,1,4.5\n2,3,0.25\n")
    u, i, x = parse_interactions_csv(path)
    np.testing.assert_array_equal(u, [0, 2])
    np.testing.assert_array_equal(i, [1, 3])
    np.testing.assert_allclose(x, [4.5, 0.25], rtol=1e-6)


def test_radix_argsort_matches_numpy():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 4096, size=100_000).astype(np.int32)
    perm, counts = radix_argsort(keys, 4096)
    np.testing.assert_array_equal(perm, np.argsort(keys, kind="stable"))
    np.testing.assert_array_equal(counts, np.bincount(keys, minlength=4096))


def test_scatter_edges_matches_numpy_build():
    """The fused native scatter (`pmf_scatter_edges`) must produce a
    layout bit-identical to the numpy formulation in `_build_pass` —
    including duplicate (u, i) pairs, empty blocks, and sub-chunk
    tiles."""
    from pmf_tpu.data import native
    from pmf_tpu.data.blocked import _build_pass

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(0)
    for n, nu, ni in [(40_000, 500, 300), (1_000, 64, 64), (0, 16, 16),
                      (7, 8, 8)]:
        s = rng.integers(0, nu, n)
        o = rng.integers(0, ni, n)
        x = rng.integers(1, 6, n).astype(np.float64)
        a = _build_pass(s, o, x, nu, ni, 32, 32, 16, np.float32,
                        reorder=True, group=4)
        orig = native.scatter_edges
        native.scatter_edges = lambda *args, **kw: None  # force numpy path
        try:
            b = _build_pass(s, o, x, nu, ni, 32, 32, 16, np.float32,
                            reorder=True, group=4)
        finally:
            native.scatter_edges = orig
        np.testing.assert_array_equal(np.asarray(a.loc), np.asarray(b.loc))
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        np.testing.assert_array_equal(np.asarray(a.chunk_self_block),
                                      np.asarray(b.chunk_self_block))
        np.testing.assert_array_equal(np.asarray(a.chunk_other_block),
                                      np.asarray(b.chunk_other_block))
        assert a.seg_chunks == b.seg_chunks and a.n_chunks == b.n_chunks
        assert a.seg_first_block == b.seg_first_block
        assert a.seg_n_blocks == b.seg_n_blocks
