"""Standalone -pc_type sor / bjacobi (PCSOR, PCBJACOBI as top-level PCs —
not just MG smoothers)."""

import numpy as np
import pytest

from tpusparse.amg import AMGParams
from tpusparse.bench.driver import solve_poisson


@pytest.mark.slow
def test_standalone_ssor_beats_jacobi():
    """SSOR(1) is a stronger single-level PC than point Jacobi on the
    Poisson operator (classic result); both reach the same answer."""
    sor = solve_poisson(16, 16, 16, rtol=1e-8, pc="sor", precision="f64")
    jac = solve_poisson(16, 16, 16, rtol=1e-8, pc="jacobi", precision="f64")
    assert sor.reason > 0 and jac.reason > 0
    assert sor.iters < jac.iters
    assert abs(sor.linf_error - jac.linf_error) < 1e-6  # same O(h^2)


@pytest.mark.slow
def test_standalone_ssor_mixed_precision():
    rep = solve_poisson(16, 16, 16, rtol=1e-8, pc="sor")
    assert rep.reason > 0
    assert rep.linf_error < 5e-2


def test_standalone_bjacobi_aij():
    """-pc_type bjacobi with real bs x bs blocks on the general path.  On
    an x-ANISOTROPIC operator (stretched domain: dx << dy,dz so x-coupling
    dominates) x-line blocks solve the strong direction exactly and beat
    the bs=0 point degeneracy decisively; on isotropic Poisson they are a
    wash (measured 96 vs 100-103 at 14^3 — the classic result)."""
    kw = dict(
        rtol=1e-8, pc="bjacobi", mat_type="aij", structure_detect=False,
        precision="f64", assembly="host", extent=(0.25, 1.0, 1.0),
    )
    blk = solve_poisson(
        16, 8, 8, amg_params=AMGParams(bjacobi_bs=16), **kw,  # x-lines
    )
    pt = solve_poisson(
        16, 8, 8, amg_params=AMGParams(bjacobi_bs=0), **kw,
    )
    assert blk.reason > 0 and pt.reason > 0
    assert blk.iters < 0.7 * pt.iters


def test_sor_rejected_on_multi_device():
    with pytest.raises(NotImplementedError, match="single-device"):
        solve_poisson(12, 12, 24, rtol=1e-6, pc="sor", n_devices=2)


def test_cli_pc_sor(capsys):
    from tpusparse.__main__ import main

    rc = main([
        "-da_grid_x", "12", "-da_grid_y", "12", "-da_grid_z", "12",
        "-pc_type", "sor", "-ksp_rtol", "1e-8", "-precision", "f64",
        "-ksp_converged_reason",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Linear solve converged" in out


def test_ksp_object_sor_and_bjacobi():
    """The standalone PCs through the KSP object API."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from tpusparse import KSP
    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import assemble_poisson, poisson_stencil

    op, b, exact = poisson_stencil(Grid3D(14, 14, 14))
    k1 = KSP(pc_type="sor", rtol=1e-8, precision="f64")
    k1.set_operators(op)
    r1 = k1.solve(b)
    assert r1.converged
    assert float(jnp.abs(r1.x - exact).max()) < 4e-2  # O(h^2) at 14^3

    a, rhs, _ = assemble_poisson(Grid3D(12, 12, 12))
    from tpusparse.amg import AMGParams

    k2 = KSP(pc_type="bjacobi", rtol=1e-8, precision="f64",
             amg_params=AMGParams(bjacobi_bs=12))
    k2.set_operators(a)
    r2 = k2.solve(jnp.asarray(rhs))
    assert r2.converged
    res = sp.csr_matrix(
        (a.data, a.indices, a.indptr), shape=a.shape
    ) @ __import__("numpy").asarray(r2.x) - rhs
    assert float(abs(res).max()) < 1e-5  # rtol 1e-8 vs ||b||~O(1e2)
