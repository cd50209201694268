"""Assembly tests: symmetry, format cross-consistency, discretization order.

Oracle strategy (reference has no tests — SURVEY.md section 4): small grids
solved directly with scipy must reproduce the manufactured solution to O(h^2),
and the Linf error must shrink ~4x per mesh doubling.
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from tpusparse import Grid3D
from tpusparse.grid.poisson import (
    assemble_poisson,
    exact_field,
    poisson_stencil,
    rhs_field,
)


def test_fields_match_reference_formulas():
    g = Grid3D(4, 3, 5)
    ex = exact_field(g)
    f = rhs_field(g)
    # spot check a few cells against the closed forms (src/helper.cpp:104-110)
    c1 = 2 * np.pi
    for (k, j, i) in [(0, 0, 0), (2, 1, 3), (4, 2, 0)]:
        x, y, z = (i + 0.5) * g.dx, (j + 0.5) * g.dy, (k + 0.5) * g.dz
        u = np.cos(c1 * x) * np.cos(c1 * y) * np.cos(c1 * z)
        assert ex[k, j, i] == pytest.approx(u, rel=1e-14)
        assert f[k, j, i] == pytest.approx(-3 * c1 * c1 * u, rel=1e-14)


@pytest.mark.parametrize("dims", [(4, 4, 4), (5, 3, 4), (1, 6, 2)])
@pytest.mark.parametrize("pin", [False, True])
def test_matrix_symmetric(dims, pin):
    g = Grid3D(*dims)
    a, _, _ = assemble_poisson(g, pin=pin)
    m = a.to_scipy()
    assert abs(m - m.T).max() == 0.0


def test_unpinned_rowsums_zero():
    g = Grid3D(4, 5, 3)
    a, _, _ = assemble_poisson(g, pin=False)
    rowsum = a.to_scipy() @ np.ones(g.n)
    np.testing.assert_allclose(rowsum, 0.0, atol=1e-12)


@pytest.mark.parametrize("dims", [(4, 4, 4), (5, 3, 4), (2, 1, 6)])
@pytest.mark.parametrize("pin", [False, True])
def test_stencil_matches_csr(dims, pin):
    import jax.numpy as jnp

    g = Grid3D(*dims)
    a, b, exact = assemble_poisson(g, pin=pin)
    op, b2, exact2 = poisson_stencil(g, pin=pin)
    np.testing.assert_allclose(np.asarray(b2).reshape(-1), b, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(exact2).reshape(-1), exact, rtol=1e-13, atol=1e-13)
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = rng.standard_normal(g.n)
        y_csr = a.mv(x)
        y_st = np.asarray(op.mv_flat(jnp.asarray(x)))
        np.testing.assert_allclose(y_st, y_csr, rtol=1e-12, atol=1e-12)


def test_pinned_row_col():
    g = Grid3D(4, 4, 4)
    a, b, exact = assemble_poisson(g, pin=True)
    m = a.to_scipy().toarray()
    # row 0 / col 0 zero except the diagonal
    assert np.all(m[0, 1:] == 0)
    assert np.all(m[1:, 0] == 0)
    # pinned diagonal = mean of the unpinned diagonal (src/helper.cpp:264-272)
    a0, _, _ = assemble_poisson(g, pin=False)
    scale = a0.diagonal().mean()
    assert m[0, 0] == pytest.approx(scale)
    assert b[0] == pytest.approx(scale * exact[0])


@pytest.mark.slow
def test_direct_solve_convergence_order():
    """Linf error vs manufactured solution must be O(h^2): the reference's
    primary correctness gate (src/main_ksp.cpp:120-129)."""
    errs = []
    for nref in (8, 16, 32):
        g = Grid3D(nref, nref, nref)
        a, b, exact = assemble_poisson(g, pin=True)
        x = spla.spsolve(a.to_scipy().tocsc(), b)
        errs.append(np.abs(x - exact).max())
    rate01 = errs[0] / errs[1]
    rate12 = errs[1] / errs[2]
    assert 3.0 < rate01 < 5.0, errs
    assert 3.0 < rate12 < 5.0, errs
    assert errs[-1] < 5e-2


def test_device_assembly_matches_host():
    """poisson_stencil_device == poisson_stencil to ulp-level (libm vs XLA
    cos) for both pin settings."""
    import jax.numpy as jnp

    from tpusparse.grid.poisson import poisson_stencil, poisson_stencil_device

    grid = Grid3D(10, 8, 12)
    for pin in (True, False):
        op_h, b_h, e_h = poisson_stencil(grid, pin=pin)
        op_d, b_d, e_d = poisson_stencil_device(grid, pin=pin)
        np.testing.assert_allclose(
            np.asarray(op_d.diag), np.asarray(op_h.diag), rtol=1e-14
        )
        assert float(op_d.cx) == float(op_h.cx)
        np.testing.assert_allclose(
            np.asarray(b_d), np.asarray(b_h), rtol=1e-13, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(e_d), np.asarray(e_h), rtol=1e-14, atol=1e-15
        )
        assert op_d.pinned == pin
