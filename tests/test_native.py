"""Native (C++) setup engine vs scipy/numpy/Python oracles.

Covers the ctypes surface in ``tpusparse/native``: SpMV, SpGEMM (symbolic +
numeric), transpose, PtAP, greedy aggregation (must match the Python
reference decision-for-decision), and the 7-point Poisson assembler (must
match the vectorized numpy assembler bit-for-bit)."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse import native
from tpusparse.amg.unstructured import (
    _greedy_aggregate_py,
    strength_graph,
)
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import assemble_poisson
from tpusparse.sparse.csr import HostCSR

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


def _rand_csr(m, n, density, seed):
    rng = np.random.default_rng(seed)
    a = sp.random(m, n, density=density, random_state=rng, format="csr")
    a.data = rng.standard_normal(a.nnz)
    a.sort_indices()
    return HostCSR.from_scipy(a)


def test_spmv_matches_numpy():
    a = _rand_csr(200, 150, 0.05, 0)
    x = np.random.default_rng(1).standard_normal(150)
    np.testing.assert_allclose(native.spmv(a, x), a.mv(x), rtol=1e-13)


@pytest.mark.parametrize("shapes", [(40, 30, 20), (100, 100, 7), (5, 80, 5)])
def test_spgemm_matches_scipy(shapes):
    m, k, n = shapes
    a = _rand_csr(m, k, 0.1, 2)
    b = _rand_csr(k, n, 0.1, 3)
    c = native.spgemm(a, b)
    ref = (a.to_scipy() @ b.to_scipy()).tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(c.indptr, ref.indptr)
    np.testing.assert_array_equal(c.indices, ref.indices)
    np.testing.assert_allclose(c.data, ref.data, rtol=1e-13)


def test_transpose_matches_scipy():
    a = _rand_csr(60, 45, 0.08, 4)
    t = native.transpose(a)
    ref = HostCSR.from_scipy(a.to_scipy().T.tocsr())
    np.testing.assert_array_equal(t.indptr, ref.indptr)
    np.testing.assert_array_equal(t.indices, ref.indices)
    np.testing.assert_allclose(t.data, ref.data, rtol=1e-13)


def test_ptap_matches_scipy():
    grid = Grid3D(6, 6, 6)
    a, _b, _e = assemble_poisson(grid)
    # a simple piecewise-constant prolongator onto 27 aggregates
    agg = (np.arange(grid.n) // 8) % 27
    p = HostCSR.from_scipy(
        sp.csr_matrix(
            (np.ones(grid.n), (np.arange(grid.n), agg)), shape=(grid.n, 27)
        )
    )
    c = native.ptap(p, a)
    ref = (p.to_scipy().T @ a.to_scipy() @ p.to_scipy()).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    np.testing.assert_array_equal(c.indices, ref.indices)
    np.testing.assert_allclose(c.data, ref.data, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n", [7, 13, 20])
def test_aggregate_matches_python(n):
    grid = Grid3D(n, n, max(n - 3, 2))
    a, _b, _e = assemble_poisson(grid)
    strong = strength_graph(a, 0.0)
    agg_native, n_agg = native.aggregate(a, strong)
    agg_py = _greedy_aggregate_py(a, strong)
    np.testing.assert_array_equal(agg_native, agg_py)
    assert n_agg == int(agg_py.max()) + 1
    assert (agg_native >= 0).all()


def test_assemble_poisson7_matches_numpy():
    grid = Grid3D(9, 7, 5)
    ref, _b, _e = assemble_poisson(grid, pin=False)
    got = native.assemble_poisson7(
        grid.nx, grid.ny, grid.nz, grid.dx, grid.dy, grid.dz
    )
    np.testing.assert_array_equal(got.indptr, ref.indptr)
    np.testing.assert_array_equal(got.indices, ref.indices)
    np.testing.assert_allclose(got.data, ref.data, rtol=0, atol=0)
