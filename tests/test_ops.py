import jax.numpy as jnp
import numpy as np

from pmf_tpu.ops.segment import edge_dot, gather_rows, sorted_segment_sum
from pmf_tpu.ops.solve import batched_psd_inverse, batched_psd_solve


def test_sorted_segment_sum_drops_out_of_range():
    data = jnp.asarray([1.0, 2.0, 3.0, 99.0, 99.0])
    ids = jnp.asarray([0, 0, 2, 3, 3])  # 3 == num_segments -> padding, dropped
    out = sorted_segment_sum(data, ids, 3)
    np.testing.assert_allclose(np.asarray(out), [3.0, 0.0, 3.0])


def test_sorted_segment_sum_matrix_payload():
    data = jnp.arange(12, dtype=jnp.float64).reshape(6, 2)
    ids = jnp.asarray([0, 0, 1, 1, 1, 2])
    out = sorted_segment_sum(data, ids, 3)
    expect = np.stack(
        [
            np.arange(12).reshape(6, 2)[:2].sum(0),
            np.arange(12).reshape(6, 2)[2:5].sum(0),
            np.arange(12).reshape(6, 2)[5:].sum(0),
        ]
    )
    np.testing.assert_allclose(np.asarray(out), expect)


def test_gather_rows_clips():
    table = jnp.asarray([[1.0], [2.0], [3.0]])
    out = gather_rows(table, jnp.asarray([0, 2, 5]))
    np.testing.assert_allclose(np.asarray(out), [[1.0], [3.0], [3.0]])


def test_edge_dot():
    a = jnp.asarray([[1.0, 2.0], [0.5, 0.5]])
    b = jnp.asarray([[3.0, 4.0], [2.0, 2.0]])
    np.testing.assert_allclose(np.asarray(edge_dot(a, b)), [11.0, 2.0])


def test_batched_psd_solve_and_inverse():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((5, 4, 4))
    mats = A @ A.transpose(0, 2, 1) + 4.0 * np.eye(4)
    rhs = rng.standard_normal((5, 4))
    x = np.asarray(batched_psd_solve(jnp.asarray(mats), jnp.asarray(rhs)))
    for r in range(5):
        np.testing.assert_allclose(mats[r] @ x[r], rhs[r], rtol=1e-9, atol=1e-9)
    inv = np.asarray(batched_psd_inverse(jnp.asarray(mats)))
    for r in range(5):
        np.testing.assert_allclose(mats[r] @ inv[r], np.eye(4), rtol=1e-8, atol=1e-8)


def test_batched_psd_inverse_fast_matches_numpy():
    """The unrolled Gauss-Jordan inverse (TPU-fast path for the blocked
    Gaussian engine) matches np.linalg.inv on well-conditioned PD
    matrices like the CAVI precision matrices."""
    import numpy as np

    from pmf_tpu.ops.solve import batched_psd_inverse_fast

    rng = np.random.default_rng(0)
    K, R = 12, 50
    A = rng.standard_normal((R, K, K))
    mats = np.eye(K) * 2.0 + A @ np.transpose(A, (0, 2, 1)) * 0.1
    got = np.asarray(batched_psd_inverse_fast(mats.astype(np.float64)))
    np.testing.assert_allclose(got, np.linalg.inv(mats), rtol=1e-9, atol=1e-11)


def test_tri_pack_roundtrip():
    import numpy as np

    from pmf_tpu.ops.pallas.gaussian_edge import pack_tri, unpack_tri

    rng = np.random.default_rng(1)
    K, R = 7, 9
    B = rng.standard_normal((R, K, K))
    sym = B + np.transpose(B, (0, 2, 1))
    tri = pack_tri(sym.reshape(R, K * K), K)
    assert tri.shape == (R, K * (K + 1) // 2)
    np.testing.assert_allclose(np.asarray(unpack_tri(tri, K)), sym, rtol=1e-12)


def test_batched_psd_inverse_pallas_matches(small_ratings):
    """Pallas VMEM-resident Gauss-Jordan (interpret mode on CPU) matches
    np.linalg.inv on PD matrices, including the identity-padded tail."""
    import numpy as np

    from pmf_tpu.ops.pallas.gj_inverse import batched_psd_inverse_pallas

    rng = np.random.default_rng(2)
    K, R = 10, 300  # not a multiple of the 128-lane batch
    A = rng.standard_normal((R, K, K)).astype(np.float32)
    mats = np.eye(K, dtype=np.float32) * 2.0 + 0.1 * A @ np.transpose(A, (0, 2, 1))
    got = np.asarray(batched_psd_inverse_pallas(mats, interpret=True))
    np.testing.assert_allclose(got, np.linalg.inv(mats.astype(np.float64)),
                               rtol=2e-4, atol=2e-5)
