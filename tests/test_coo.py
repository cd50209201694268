"""COO container vs scipy/HostCSR oracles."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpusparse.sparse.coo import COO
from tpusparse.sparse.csr import HostCSR
import pytest


def _rand(m, n, density, seed):
    rng = np.random.default_rng(seed)
    a = sp.random(m, n, density=density, random_state=rng, format="csr")
    a.data = rng.standard_normal(a.nnz)
    return HostCSR.from_scipy(a)


@pytest.mark.slow
def test_mv_matches_csr():
    a = _rand(120, 90, 0.07, 0)
    coo = COO.from_csr(a)
    x = np.random.default_rng(1).standard_normal(90)
    np.testing.assert_allclose(
        np.asarray(coo.mv(jnp.asarray(x))), a.mv(x), rtol=1e-12, atol=1e-13
    )


def test_rmv_matches_transpose():
    a = _rand(60, 80, 0.1, 2)
    coo = COO.from_csr(a)
    y = np.random.default_rng(3).standard_normal(60)
    np.testing.assert_allclose(
        np.asarray(coo.rmv(jnp.asarray(y))),
        a.transpose().mv(y),
        rtol=1e-12, atol=1e-13,
    )


def test_duplicates_sum():
    """ADD_VALUES semantics: duplicate coordinates accumulate."""
    rows = jnp.asarray([0, 0, 1, 1], jnp.int32)
    cols = jnp.asarray([1, 1, 0, 2], jnp.int32)
    vals = jnp.asarray([2.0, 3.0, 1.0, 4.0])
    coo = COO(rows=rows, cols=cols, vals=vals, shape=(2, 3))
    x = jnp.asarray([1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(coo.mv(x)), [5.0, 5.0])
    csr = coo.to_csr()
    assert csr.nnz == 3  # duplicates compacted (MatAssemblyEnd parity)


def test_diagonal_and_roundtrip():
    a = _rand(50, 50, 0.12, 4)
    coo = COO.from_csr(a)
    np.testing.assert_allclose(
        np.asarray(coo.diagonal()), a.diagonal(), rtol=1e-13, atol=1e-14
    )
    back = coo.to_csr()
    np.testing.assert_array_equal(back.indptr, a.indptr)
    np.testing.assert_allclose(back.data, a.data, rtol=1e-14)


def test_spmm_matches_dense():
    a = _rand(70, 50, 0.1, 9)
    x = np.random.default_rng(10).standard_normal((50, 6))
    ref = a.to_dense() @ x
    from tpusparse.sparse.coo import COO as _COO
    from tpusparse.sparse.ell import ELL

    coo = _COO.from_csr(a)
    np.testing.assert_allclose(
        np.asarray(coo.mm(jnp.asarray(x))), ref, rtol=1e-12, atol=1e-12
    )
    ell = ELL.from_csr(a)
    np.testing.assert_allclose(
        np.asarray(ell.mm(jnp.asarray(x))), ref, rtol=1e-12, atol=1e-12
    )
