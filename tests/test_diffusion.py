"""Variable-coefficient diffusion family: assembly oracle, AMG on a
VarStencil27 FINE level, and solve accuracy vs a sparse direct solve."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.grid.diffusion import assemble_diffusion, default_kappa
from tpusparse.grid.grid3d import Grid3D
from tpusparse.solve import cg
import pytest


def test_stencil_matches_csr():
    grid = Grid3D(10, 8, 9)
    op, a, b = assemble_diffusion(grid)
    x = np.random.default_rng(0).standard_normal(grid.shape)
    y_st = np.asarray(op.mv(jnp.asarray(x))).reshape(-1)
    y_csr = a.mv(x.reshape(-1))
    scale = np.abs(y_csr).max()
    np.testing.assert_allclose(y_st, y_csr, rtol=1e-12, atol=1e-12 * scale)


def test_operator_is_symmetric_negative_definite():
    grid = Grid3D(7, 7, 7)
    op, a, b = assemble_diffusion(grid)
    d = a.to_dense()
    np.testing.assert_allclose(d, d.T, atol=1e-12)
    w = np.linalg.eigvalsh(d)
    assert (w < 1e-10).all()  # negative semidefinite; pin makes it definite
    assert (w < -1e-12).sum() >= grid.n - 1


@pytest.mark.slow
def test_amg_solves_high_contrast():
    """CG + GAMG on a 100x-contrast coefficient field: converges in a
    bounded number of iterations and matches the sparse direct solve."""
    grid = Grid3D(18, 18, 18)
    kappa = default_kappa(grid, contrast=100.0)
    op, a, b = assemble_diffusion(grid, kappa)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=64))

    @jax.jit
    def solve(op, hier, b):
        return cg(
            op.mv, b, rtol=1e-10, maxiter=500,
            m_mv=lambda r: vcycle(hier, r),
        )

    res = solve(op, hier, jnp.asarray(b))
    assert res.converged(), int(res.reason)
    assert int(res.iters) < 120  # AMG keeps high-contrast iterations bounded

    x_ref = spla.spsolve(a.to_scipy().tocsc(), b.reshape(-1))
    x = np.asarray(res.x).reshape(-1)
    # pinned system: both solutions are exact solves of the same matrix
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-7 * scale)


def test_unpinned_nullspace_is_constant():
    grid = Grid3D(6, 6, 6)
    op, a, b = assemble_diffusion(grid, pin=False)
    ones = np.ones(grid.n)
    np.testing.assert_allclose(a.mv(ones), 0.0, atol=1e-9)


@pytest.mark.slow
def test_cli_problem_diffusion(capsys):
    """-problem diffusion through the full driver protocol: the variable-
    coefficient second problem family with the ALGEBRAIC manufactured gate
    (b = A exact, Linf vs exact measures the solver, not h^2)."""
    from tpusparse.__main__ import main

    rc = main([
        "-da_grid_x", "16", "-da_grid_y", "16", "-da_grid_z", "16",
        "-problem", "diffusion", "-diffusion_contrast", "50",
        "-ksp_rtol", "1e-9", "-ksp_converged_reason",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Linear solve converged" in out
    assert "Problem: diffusion(contrast=50)" in out
    import json as _json
    import re

    side = _json.loads(re.search(r"JSON: (.*)", out).group(1))
    assert side["mat_type"] == "varstencil"
    assert side["linf_error"] < 1e-7  # algebraic gate (rtol 1e-9 solve)


@pytest.mark.slow
def test_sharded_variable_coefficient_solve():
    """The variable-coefficient operator (VarStencil27, 27 coefficient
    fields) sharded over the 8-device mesh: GSPMD halo-exchanges every
    coefficient-field shift and the solve matches single-device
    iteration-for-iteration — MPIAIJ parity beyond the constant-
    coefficient benchmark matrix."""
    from tpusparse.dist import field_sharding, make_mesh, shard_hierarchy
    from tpusparse.dist.mesh import _put

    grid = Grid3D(16, 16, 16)
    kappa = default_kappa(grid, contrast=50.0)
    op, _, b = assemble_diffusion(grid, kappa)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=64))

    run = jax.jit(
        lambda op, h, b: cg(
            op.mv, b, rtol=1e-10, maxiter=500,
            m_mv=lambda r: vcycle(h, r),
        )
    )
    res0 = run(op, hier, jnp.asarray(b))

    mesh = make_mesh(8)
    res1 = run(
        _put(op, field_sharding(mesh)),
        shard_hierarchy(hier, mesh),
        jax.device_put(jnp.asarray(b), field_sharding(mesh)),
    )
    assert int(res1.reason) > 0
    assert int(res0.iters) == int(res1.iters)
    assert len(res1.x.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(res0.x), np.asarray(res1.x), atol=1e-9
    )
