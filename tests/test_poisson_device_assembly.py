"""Device-side DIA assembly (grid/poisson.poisson_dia_device) vs the host
HostCSR oracle (assemble_poisson) — the aij driver's init phase.

The device assembler must reproduce the reference matrix ENTRYWISE
(generateA /root/reference/src/helper.cpp:161-246 + setRefPoint :250-279):
hi == float32(A64) exactly, hi + lo == the Dekker split of A64, and the
b / exact fields match the host f64 libm evaluation to rounding.
"""

import jax
import numpy as np
import pytest

from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import assemble_poisson, poisson_dia_device
from tpusparse.sparse.dia import DIA


def _host_split(grid):
    a, b, exact = assemble_poisson(grid, dtype=np.float64)
    bands64, offsets, shape = DIA.host_bands(a)
    hi = bands64.astype(np.float32)
    lo = (bands64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo, tuple(int(o) for o in offsets), b, exact


@pytest.mark.parametrize(
    "shape", [(6, 6, 6), (5, 6, 7), (2, 2, 2), (12, 3, 4)]
)
def test_bands_match_host_oracle_exactly(shape):
    nx, ny, nz = shape
    grid = Grid3D(nx, ny, nz)
    ref_hi, ref_lo, ref_offsets, b_ref, exact_ref = _host_split(grid)

    op_hi, op_lo, b, exact = poisson_dia_device(grid)
    assert op_lo.offsets == ref_offsets
    assert op_hi.offsets == ref_offsets
    hi = np.asarray(op_hi.hi)
    lo = (
        np.zeros_like(hi) if op_hi.lo is None else np.asarray(op_hi.lo)
    )
    # the two-float split is exact, not approximate
    np.testing.assert_array_equal(hi, ref_hi)
    np.testing.assert_array_equal(lo, ref_lo)
    # op_lo aliases the hi bands (zero duplicate upload)
    assert op_lo.bands is op_hi.hi

    # fields: device XLA cos vs host libm cos — equal to a few ulp
    np.testing.assert_allclose(
        np.asarray(b), b_ref, rtol=1e-14, atol=1e-15
    )
    np.testing.assert_allclose(
        np.asarray(exact), exact_ref, rtol=1e-14, atol=1e-15
    )


def test_anisotropic_extent_splits_exactly():
    # non-unit extent -> coefficients that are NOT f32-representable, so
    # the lo half must be present and carry the split residual
    grid = Grid3D(6, 5, 4, lx=1.0, ly=0.7, lz=1.3)
    ref_hi, ref_lo, ref_offsets, b_ref, _ = _host_split(grid)
    op_hi, op_lo, b, _ = poisson_dia_device(grid)
    assert op_hi.lo is not None
    np.testing.assert_array_equal(np.asarray(op_hi.hi), ref_hi)
    np.testing.assert_array_equal(np.asarray(op_hi.lo), ref_lo)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-14, atol=1e-15)


@pytest.mark.slow
def test_aij_driver_device_vs_host_assembly_identical():
    """The driver's two assembly routes produce the SAME solve: iteration
    count and error agree exactly (the operators are bit-identical)."""
    from tpusparse.bench.driver import solve_poisson

    r_dev = solve_poisson(
        24, rtol=1e-8, atol=1e-12, mat_type="aij", precision="mixed",
        assembly="device", structure_detect=False,
    )
    r_host = solve_poisson(
        24, rtol=1e-8, atol=1e-12, mat_type="aij", precision="mixed",
        assembly="host", structure_detect=False,
    )
    assert r_dev.iters == r_host.iters
    assert r_dev.outer_iters == r_host.outer_iters
    # operators are bit-identical but b is XLA-cos vs libm-cos, so the two
    # x's agree only to the rtol-1e-8 convergence level, not bitwise
    assert r_dev.linf_error == pytest.approx(r_host.linf_error, rel=1e-6)
    assert r_dev.resnorm == pytest.approx(r_host.resnorm, rel=1e-2)


def test_device_assembly_requires_mixed():
    from tpusparse.bench.driver import solve_poisson

    with pytest.raises(ValueError, match="requires precision"):
        solve_poisson(
            8, mat_type="aij", precision="f32", assembly="device"
        )


def test_setup_without_host_csr_raises_for_greedy():
    """a=None is only legal when the geometric device-resident setup can
    take over; forcing greedy must raise, not crash."""
    from tpusparse.amg.hierarchy import AMGParams
    from tpusparse.amg.unstructured import gamg_setup_unstructured

    grid = Grid3D(8, 8, 8)
    _, op_lo, _, _ = poisson_dia_device(grid)
    with pytest.raises(ValueError, match="host CSR"):
        gamg_setup_unstructured(
            None, AMGParams(), dtype=np.float32, aggregation="greedy",
            fine_op=op_lo,
        )
