"""Mixed-precision iterative-refinement tests: f64 tolerances from f32 inner
solves (solve/refine.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import Grid3D
from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg
from tpusparse.solve.refine import cg_refined


def _ops(n):
    g = Grid3D(n, n, n)
    op64, b, exact = poisson_stencil(g, dtype=np.float64)
    op32, _, _ = poisson_stencil(g, dtype=np.float32)
    return op64, op32, b, exact


@pytest.mark.slow
def test_refined_reaches_f64_tolerance():
    op64, op32, b, exact = _ops(20)
    hier = gamg_setup(op32, AMGParams(coarse_eq_limit=30))
    res = jax.jit(
        lambda op64, op32, hier, b: cg_refined(
            op64.mv, op32.mv, b, rtol=1e-12, atol=1e-30,
            m_lo_mv=lambda r: vcycle(hier, r),
        )
    )(op64, op32, hier, b)
    assert res.converged(), int(res.reason)
    # the achieved residual is far below anything f32 alone can reach
    assert float(res.resnorm) <= 1e-12 * float(res.bnorm)
    assert int(res.outer_iters) <= 6
    # matches a pure-f64 CG solve
    ref = cg(op64.mv, b, rtol=1e-12, maxiter=5000)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-8, atol=1e-10
    )


def test_refined_linf_gate():
    op64, op32, b, exact = _ops(24)
    hier = gamg_setup(op32, AMGParams(coarse_eq_limit=30))
    res = cg_refined(
        op64.mv, op32.mv, b, rtol=1e-10,
        m_lo_mv=lambda r: vcycle(hier, r),
    )
    assert res.converged()
    linf = float(jnp.abs(res.x - jnp.asarray(exact)).max())
    assert linf < 2e-2


def test_refined_divergence_reported():
    op64, op32, b, _ = _ops(12)
    # hopeless inner solver (identity preconditioner, 1 inner iteration)
    res = cg_refined(
        op64.mv, op32.mv, b, rtol=1e-14, atol=0.0, max_outer=2,
        inner_rtol=0.99, inner_maxiter=1,
    )
    assert int(res.reason) < 0


def test_stall_detection_at_unattainable_rtol():
    """At an rtol below the f64 true-residual floor, defect correction must
    stop with CONVERGED_STALLED (positive) instead of burning max_outer
    sweeps and reporting divergence."""
    import numpy as np

    from tpusparse.amg import AMGParams, gamg_setup, vcycle
    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import poisson_stencil
    from tpusparse.solve.cg import ConvergedReason

    grid = Grid3D(20, 20, 20)
    op, b, _ = poisson_stencil(grid)
    op32, _b, _e = poisson_stencil(grid, dtype=np.float32)
    hier = gamg_setup(op32, AMGParams(coarse_eq_limit=64))

    res = jax.jit(
        lambda op, op32, h, b: cg_refined(
            op.mv, op32.mv, b, rtol=1e-30, atol=1e-300, max_outer=12,
            m_lo_mv=lambda r: vcycle(h, r),
        )
    )(op, op32, hier, b)
    assert int(res.reason) == int(ConvergedReason.CONVERGED_STALLED)
    assert res.converged()  # positive reason
    assert int(res.outer_iters) < 12  # did not burn the whole budget
    # stalled at the attainable floor, which is still very accurate
    rel = float(res.resnorm / res.bnorm)
    assert rel < 1e-10
