"""Device-resident banded GAMG setup (amg/deviceagg.py).

Oracle strategy: the segment-banded Galerkin product is checked against an
EXPLICIT scipy P^T A P built from the same segment aggregation, and the
end-to-end hierarchy must solve matrices that defeat ``infer_grid3d``
(periodic wrap bands, high-order 1-D stencils) with mesh-independent-ish
iteration counts.  Reference role: GAMG setup inside KSPSetUp
(/root/reference/src/main_ksp.cpp:97) for MATAIJ matrices."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.amg.deviceagg import (
    SegTransfer,
    _coarsen_once,
    gamg_setup_banded_device,
)
from tpusparse.amg.hierarchy import AMGParams, vcycle
from tpusparse.solve.cg import cg
from tpusparse.sparse.dia import DIA


def _dia_from_scipy(a) -> DIA:
    from tpusparse.sparse.csr import HostCSR

    return DIA.from_csr(HostCSR.from_scipy(a.tocsr()), dtype=np.float32)


def _periodic_lap1d(n, order=1):
    """1-D Laplacian with periodic wrap (+ pin) — wrap bands at +-(n-1)
    defeat infer_grid3d; SPD after pinning row/col 0."""
    a = sp.diags(
        [2.0 * order, -1.0, -1.0, -1.0, -1.0],
        [0, 1, -1, n - 1, -(n - 1)],
        shape=(n, n),
    ).tolil()
    a[0, :] = 0.0
    a[:, 0] = 0.0
    a[0, 0] = 2.0 * order
    return a.tocsr()


def _high_order_1d(n):
    """4th-order 1-D stencil (offsets 0,+-1,+-2): banded, non-grid-3D."""
    return sp.diags(
        [2.5, -4.0 / 3, -4.0 / 3, 1.0 / 12, 1.0 / 12],
        [0, 1, -1, 2, -2], shape=(n, n),
    ).tocsr()


def _explicit_p(a_sp, s, omega, nsmooths):
    """Host oracle: P = (I - omega D^-1 A) T over contiguous segments."""
    n = a_sp.shape[0]
    n_c = -(-n // s)
    agg = np.arange(n) // s
    t = sp.csr_matrix(
        (np.full(n, 1.0 / np.sqrt(s)), (np.arange(n), agg)),
        shape=(n, n_c),
    )
    if nsmooths == 0:
        return t
    dinv = 1.0 / a_sp.diagonal()
    return (t - omega * sp.diags(dinv) @ (a_sp @ t)).tocsr()


@pytest.mark.parametrize("nsmooths", [0, 1])
@pytest.mark.parametrize("s", [3, 8])
def test_galerkin_matches_scipy(nsmooths, s):
    n = 500
    a_sp = _periodic_lap1d(n).astype(np.float64)
    d = _dia_from_scipy(a_sp)
    dinv = 1.0 / np.asarray(d.diagonal())
    omega = 0.7
    cb, coffs = _coarsen_once(
        d.bands, d.offsets, jnp.asarray(dinv, jnp.float32),
        jnp.asarray(omega, jnp.float32), s=s, n=n, nsmooths=nsmooths,
    )
    p = _explicit_p(a_sp, s, omega, nsmooths)
    ac_ref = (p.T @ a_sp @ p).toarray()
    n_c = -(-n // s)
    ac = np.zeros((n_c, n_c))
    cbn = np.asarray(cb)
    for i, e in enumerate(coffs):
        r = np.arange(max(0, -e), min(n_c, n_c - e))
        ac[r, r + e] = cbn[i, r]
    np.testing.assert_allclose(ac, ac_ref, rtol=1e-4, atol=1e-5)


def test_seg_transfer_matches_explicit_p():
    n, s = 300, 4
    a_sp = _high_order_1d(n).astype(np.float64)
    d = _dia_from_scipy(a_sp)
    dinv = jnp.asarray(1.0 / np.asarray(d.diagonal()))
    omega = 0.65
    n_c = -(-n // s)
    tr = SegTransfer(
        w=jnp.asarray(1.0 / np.sqrt(s), jnp.float32),
        omega=jnp.asarray(omega, jnp.float32),
        s=s, n_fine=n, n_coarse=n_c,
    )
    p = _explicit_p(a_sp, s, omega, 1)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n).astype(np.float32)
    e = rng.standard_normal(n_c).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(tr.restrict(d, dinv, jnp.asarray(v))),
        p.T @ v, rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(tr.prolong(d, dinv, jnp.asarray(e))),
        p @ e, rtol=1e-4, atol=1e-4,
    )


def _solve_iters(a_sp, hier, rtol=1e-8):
    n = a_sp.shape[0]
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(n)
    b = jnp.asarray((a_sp @ x_true).astype(np.float32))
    op = hier.levels[0].op
    res = cg(
        op.mv, b, rtol=rtol, atol=0.0, maxiter=300,
        m_mv=lambda r: vcycle(hier, r),
    )
    assert int(res.reason) > 0, f"diverged: {int(res.reason)}"
    return int(res.iters)


@pytest.mark.slow
@pytest.mark.parametrize("n", [3000, 24000])
def test_periodic_wrap_solve_mesh_independent(n):
    """Wrap-band Laplacian: the geo path refuses it (infer_grid3d fails);
    the device-banded hierarchy must solve it with bounded iterations."""
    a_sp = _periodic_lap1d(n)
    d = _dia_from_scipy(a_sp)
    tm = {}
    hier = gamg_setup_banded_device(d, AMGParams(), timings=tm)
    iters = _solve_iters(a_sp, hier)
    assert len(hier.levels) >= 2
    assert iters <= 40, iters
    assert set(tm) >= {"rho", "galerkin"}


@pytest.mark.slow
def test_high_order_1d_solve():
    """4th-order stencil: NOT an M-matrix (positive off-diagonals), so
    SA contracts more slowly and the f32 floor binds earlier — gate at
    rtol 1e-6 (production wraps this path in mixed-precision refinement,
    solve/refine.py)."""
    a_sp = _high_order_1d(6000)
    d = _dia_from_scipy(a_sp)
    hier = gamg_setup_banded_device(d, AMGParams())
    assert _solve_iters(a_sp, hier, rtol=1e-6) <= 80


@pytest.mark.slow
def test_poisson3d_banded_vs_greedy_quality():
    """On the 3-D Poisson matrix itself (treated as a generic banded
    matrix), iteration counts must stay within 3x of the greedy-Vanek
    host oracle — the honesty gate for the segment aggregation."""
    from tpusparse.amg.unstructured import gamg_setup_unstructured
    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import assemble_poisson

    grid = Grid3D(20, 20, 20)
    a, _b, _e = assemble_poisson(grid, dtype=np.float64)
    a_sp = a.to_scipy()
    d = DIA.from_csr(a, dtype=np.float32)
    hier_dev = gamg_setup_banded_device(d, AMGParams())
    hier_greedy = gamg_setup_unstructured(
        a, AMGParams(), dtype=np.float32, aggregation="greedy"
    )
    it_dev = _solve_iters(a_sp, hier_dev, rtol=1e-6)
    it_greedy = _solve_iters(a_sp, hier_greedy, rtol=1e-6)
    assert it_dev <= max(3 * it_greedy, 30), (it_dev, it_greedy)


@pytest.mark.slow
def test_auto_routes_deviceless_nongrid_to_banded():
    """gamg_setup_unstructured(a=None, fine_op=<non-grid DIA>) used to
    raise; 'auto' now routes it to the banded device setup."""
    from tpusparse.amg.deviceagg import SegTransfer as _ST
    from tpusparse.amg.unstructured import gamg_setup_unstructured

    n = 3000
    a_sp = _periodic_lap1d(n)
    d = _dia_from_scipy(a_sp)
    hier = gamg_setup_unstructured(
        None, AMGParams(), dtype=np.float32, fine_op=d
    )
    assert isinstance(hier.levels[0].transfer, _ST)
    assert _solve_iters(a_sp, hier) <= 40


@pytest.mark.slow
def test_explicit_banded_aggregation_from_host_csr():
    from tpusparse.amg.deviceagg import SegTransfer as _ST
    from tpusparse.amg.unstructured import gamg_setup_unstructured
    from tpusparse.sparse.csr import HostCSR

    a_sp = _high_order_1d(4000)
    tm = {}
    hier = gamg_setup_unstructured(
        HostCSR.from_scipy(a_sp), AMGParams(), dtype=np.float32,
        aggregation="banded", timings=tm,
    )
    assert isinstance(hier.levels[0].transfer, _ST)
    assert _solve_iters(a_sp, hier, rtol=1e-6) <= 80
    assert "galerkin" in tm


def test_validation_errors():
    a_sp = _high_order_1d(100)
    d = _dia_from_scipy(a_sp)
    with pytest.raises(ValueError, match="DIA fine operator"):
        gamg_setup_banded_device(object())
    with pytest.raises(ValueError, match="bjacobi"):
        gamg_setup_banded_device(d, AMGParams(bjacobi_bs=4))
    nodiag = DIA(
        bands=d.bands[:1], offsets=(d.offsets[1],), shape=d.shape
    )
    with pytest.raises(ValueError, match="main diagonal"):
        gamg_setup_banded_device(nodiag, AMGParams())
