"""Structure detection (sparse/starlift.py): proving an assembled MATAIJ
matrix is a constant-coefficient star and lifting it onto the structured
executor — the route that runs the reference's own benchmark matrix
(DMDA Poisson forced into CSR, /root/reference/src/helper.cpp:39) at the
structured path's speed while arbitrary matrices keep the general path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.bench.driver import solve_poisson
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import (
    assemble_poisson,
    poisson_dia_device,
    poisson_stencil,
)
from tpusparse.sparse.dia import DIA
from tpusparse.sparse.starlift import star_lift
from tpusparse.sparse.stencil import StarStencil3D
import pytest


@pytest.mark.slow
def test_lift_device_assembly_matches_structured_oracle():
    grid = Grid3D(12, 10, 8)
    op_hi, op_lo, b, exact = poisson_dia_device(grid)
    lifted = star_lift(op_lo, op_hi, grid.shape)
    assert lifted is not None
    star_hi, star_lo = lifted
    assert isinstance(star_hi, StarStencil3D) and star_hi.pinned
    op_ref, _, _ = poisson_stencil(grid, dtype=np.float64)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(grid.shape)
    )
    np.testing.assert_array_equal(
        np.asarray(star_hi.mv(x)), np.asarray(op_ref.mv(x))
    )
    rel = np.abs(
        np.asarray(star_lo.mv(x.astype(jnp.float32)), np.float64)
        - np.asarray(op_ref.mv(x))
    ).max() / np.abs(np.asarray(op_ref.mv(x))).max()
    assert rel < 1e-6  # f32 twin


def test_lift_host_f64_and_anisotropic_extent():
    grid = Grid3D(8, 6, 10, lx=1.0, ly=2.0, lz=0.5)
    a, _, _ = assemble_poisson(grid, dtype=np.float64)
    d = DIA.from_csr(a)
    lifted = star_lift(d, d, grid.shape)
    assert lifted is not None
    star_hi, star_lo = lifted
    assert star_lo is star_hi  # uniform precision shares the container
    op_ref, _, _ = poisson_stencil(grid, dtype=np.float64)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(grid.shape))
    np.testing.assert_array_equal(
        np.asarray(star_hi.mv(x)), np.asarray(op_ref.mv(x))
    )


def test_lift_refuses_non_star_matrices():
    grid = Grid3D(8, 8, 8)
    a, _, _ = assemble_poisson(grid, dtype=np.float64)
    d = DIA.from_csr(a)
    k1 = d.offsets.index(1)
    # variable coefficient on one leg
    bands = np.asarray(d.bands).copy()
    bands[k1, 100] *= 1.0 + 1e-7
    v1 = DIA(bands=jnp.asarray(bands), offsets=d.offsets, shape=d.shape)
    assert star_lift(v1, v1, grid.shape) is None
    # nonzero at a domain-wrap position (the stencil's zero-fill shift
    # would silently drop it — the proof must refuse)
    bands2 = np.asarray(d.bands).copy()
    bands2[k1, 7] = 3.0  # i = nx-1 row
    v2 = DIA(bands=jnp.asarray(bands2), offsets=d.offsets, shape=d.shape)
    assert star_lift(v2, v2, grid.shape) is None
    # missing legs / extra offsets
    v3 = DIA(bands=d.bands[:5], offsets=d.offsets[:5], shape=d.shape)
    assert star_lift(v3, v3, grid.shape) is None


@pytest.mark.slow
def test_aij_driver_lifts_to_structured_iteration_parity():
    rep_aij = solve_poisson(16, mat_type="aij", rtol=1e-8, view=True)
    rep_str = solve_poisson(16, rtol=1e-8)
    assert "star DETECTED" in rep_aij.solver_view
    assert "star_lift" in rep_aij.setup_breakdown
    assert rep_aij.iters == rep_str.iters
    assert rep_aij.outer_iters == rep_str.outer_iters
    np.testing.assert_allclose(
        rep_aij.linf_error, rep_str.linf_error, rtol=1e-10
    )
    assert rep_aij.mat_type == "aij"


@pytest.mark.slow
def test_aij_driver_structure_detect_off_keeps_general_path():
    rep = solve_poisson(16, mat_type="aij", rtol=1e-8,
                        structure_detect=False, view=True)
    assert "star DETECTED" not in (rep.solver_view or "")
    assert rep.reason > 0
    assert rep.linf_error < 0.03  # O(h^2) gate at 16^3


def test_aij_host_assembly_also_lifts():
    rep = solve_poisson(
        16, mat_type="aij", rtol=1e-8, assembly="host", view=True
    )
    assert "star DETECTED" in rep.solver_view
    assert rep.reason > 0


@pytest.mark.slow
def test_aij_multi_device_via_lift():
    """Sharded aij through the driver: the star lift routes the assembled
    matrix onto the structured sharded pipeline (MPIAIJ-through-the-driver
    parity for proven-structured matrices; the general sharded executor
    is dist.general.DistDIA)."""
    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")
    rep = solve_poisson(16, mat_type="aij", rtol=1e-8, n_devices=4)
    ref = solve_poisson(16, rtol=1e-8)
    assert rep.mat_type == "aij" and rep.reason > 0
    assert rep.iters == ref.iters
    np.testing.assert_allclose(
        rep.linf_error, ref.linf_error, rtol=1e-8
    )


def test_aij_multi_device_without_detect_raises():
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual mesh")
    with pytest.raises(NotImplementedError, match="DistDIA"):
        solve_poisson(16, mat_type="aij", rtol=1e-8, n_devices=4,
                      structure_detect=False)
