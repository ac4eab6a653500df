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
