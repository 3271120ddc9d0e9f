"""Matrix parity tests (src/matrix-test.c) — with real assertions; the
reference computes matrix_equal and discards the result
(src/matrix-test.c:24,40,53)."""
import numpy as np
import jax.numpy as jnp

from plonk_tpu.utils.params import HF17
from plonk_tpu.ops.field import Field
from plonk_tpu.ops import matrix as M

F = Field(HF17)


def test_matrix_add():
    a = F.array([[1], [2]])
    b = F.array([[3], [4]])
    np.testing.assert_array_equal(np.asarray(M.mat_add(F, a, b)),
                                  [[4], [6]])


def test_matrix_mul():
    a = F.array([[1, 2, 3], [4, 5, 6]])
    b = F.array([[10, 11], [20, 21], [30, 31]])
    expected = np.array([[140, 146], [320, 335]]) % 17
    np.testing.assert_array_equal(np.asarray(M.mat_mul(F, a, b)), expected)


def test_matrix_inv_involution():
    mat = np.array([[1, 2], [3, 4]])
    inv = M.mat_inv_host(17, mat)
    inv_inv = M.mat_inv_host(17, inv)
    np.testing.assert_array_equal(inv_inv, mat % 17)
    np.testing.assert_array_equal((mat @ inv) % 17, np.eye(2, dtype=int))


def test_gauss_jordan_identity():
    m = M.gauss_jordan_host(17, np.array([[2, 0, 1], [0, 3, 5]]))
    np.testing.assert_array_equal(m[:, :2], np.eye(2, dtype=int))


def test_vandermonde():
    V = M.vandermonde_host(17, [1, 4, 16, 13])
    assert V[1][1] == 4 and V[2][2] == (16 * 16) % 17
    np.testing.assert_array_equal(V[0], [1, 1, 1, 1])
