"""W-cycle option and the simple KSP types (richardson, preonly)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.amg.hierarchy import wcycle
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg
from tpusparse.solve.simple import preonly, richardson
import pytest


def _system(n=18):
    grid = Grid3D(n, n, n)
    op, b, exact = poisson_stencil(grid, dtype=np.float32)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))
    return op, b, exact, hier


@pytest.mark.slow
def test_wcycle_converges_at_least_as_fast():
    op, b, exact, hier = _system()
    rv = cg(op.mv, b, rtol=1e-6, maxiter=200, m_mv=lambda r: vcycle(hier, r))
    rw = cg(op.mv, b, rtol=1e-6, maxiter=200, m_mv=lambda r: wcycle(hier, r))
    assert rv.converged() and rw.converged()
    assert int(rw.iters) <= int(rv.iters)  # W is at least as strong per apply
    np.testing.assert_allclose(
        np.asarray(rw.x), np.asarray(rv.x), rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_richardson_with_mg_is_a_solver():
    """Multigrid-as-a-solver: Richardson + V-cycle converges standalone."""
    op, b, exact, hier = _system()
    # f32 un-normalized residuals floor around rel ~3e-6; gate above it
    res = jax.jit(
        lambda op, h, b: richardson(
            op.mv, b, rtol=1e-4, maxiter=200, m_mv=lambda r: vcycle(h, r)
        )
    )(op, hier, b)
    assert res.converged()
    linf = float(jnp.max(jnp.abs(res.x - exact)))
    assert linf < 5e-2


@pytest.mark.slow
def test_richardson_diverges_reported():
    op, b, _e, _h = _system(12)
    # unpreconditioned undamped Richardson on a stiff operator blows up
    res = richardson(op.mv, b, rtol=1e-6, maxiter=50, scale=1.0)
    assert int(res.reason) < 0


@pytest.mark.slow
def test_preonly_applies_pc_once():
    op, b, _e, hier = _system(12)
    res = preonly(op.mv, b, m_mv=lambda r: vcycle(hier, r))
    assert int(res.iters) == 1
    # one V-cycle reduces the residual substantially
    assert float(res.resnorm) < 0.5 * float(res.bnorm)
