"""Block multi-RHS solves (solve/multi.py — PETSc KSPMatSolve parity):
masked per-column CG/defect-correction vs the single-RHS solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import KSP, Grid3D
from tpusparse.grid.poisson import poisson_stencil_device
from tpusparse.solve import cg, cg_multi, cg_refined, refined_multi


def _system(n=16):
    grid = Grid3D(n, n, n)
    op, b, exact = poisson_stencil_device(grid)
    return grid, op, b, exact


@pytest.mark.slow
def test_cg_multi_matches_single_columns():
    """Each column of the block solve matches the single-RHS solver
    iteration-for-iteration (same mask-frozen recurrences)."""
    _, op, b, _ = _system(12)
    op64 = jax.tree.map(
        lambda l: l.astype(jnp.float64)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        else l, op,
    )
    b = b.astype(jnp.float64)
    dinv = 1.0 / op64.diagonal_field()
    m = lambda r: dinv * r
    # columns with different difficulty: scaled + perturbed rhs
    cols = jnp.stack([b, 3.0 * b, b + 0.1 * jnp.sin(7.0 * b)])
    multi = cg_multi(op64.mv, cols, rtol=1e-9, m_mv=m, maxiter=2000)
    for i in range(3):
        single = cg(op64.mv, cols[i], rtol=1e-9, m_mv=m, maxiter=2000)
        assert int(multi.iters[i]) == int(single.iters)
        assert int(multi.reason[i]) == int(single.reason)
        assert float(jnp.abs(multi.x[i] - single.x).max()) < 1e-10


@pytest.mark.slow
def test_cg_multi_frozen_columns_do_not_drift():
    """A trivially-easy column (converges immediately-ish) must be frozen
    while a hard column keeps iterating — no NaNs, exact early answer."""
    _, op, b, _ = _system(12)
    op64 = jax.tree.map(
        lambda l: l.astype(jnp.float64)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        else l, op,
    )
    b = b.astype(jnp.float64)
    cols = jnp.stack([jnp.zeros_like(b), b])  # zero rhs converges at it=0
    res = cg_multi(op64.mv, cols, rtol=1e-9, maxiter=2000)
    assert int(res.iters[0]) == 0
    assert float(jnp.abs(res.x[0]).max()) == 0.0
    assert bool(jnp.all(jnp.isfinite(res.x)))
    assert res.reason[1] > 0 and int(res.iters[1]) > 0


@pytest.mark.slow
def test_refined_multi_matches_single():
    """Block mixed-precision defect correction matches cg_refined per
    column (same outer sweeps, same solutions)."""
    _, op, b, _ = _system(12)
    op_lo = jax.tree.map(
        lambda l: l.astype(jnp.float32)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        else l, op,
    )
    dinv = 1.0 / op_lo.diagonal_field()
    m = lambda r: dinv * r
    cols = jnp.stack([b, -2.0 * b])
    multi = refined_multi(
        op.mv, op_lo.mv, cols, rtol=1e-9, atol=1e-30, m_lo_mv=m
    )
    for i in range(2):
        single = cg_refined(
            op.mv, op_lo.mv, cols[i], rtol=1e-9, atol=1e-30, m_lo_mv=m
        )
        assert int(multi.outer_iters[i]) == int(single.outer_iters)
        assert multi.reason[i] > 0 and single.reason > 0
        rel = float(jnp.abs(multi.x[i] - single.x).max()) / float(
            jnp.abs(single.x).max()
        )
        assert rel < 1e-8


@pytest.mark.slow
def test_ksp_mat_solve_structured():
    """KSP.mat_solve end-to-end: CG+GAMG block solve, per-column results,
    manufactured-solution accuracy on the first column."""
    _, op, b, exact = _system(16)
    ksp = KSP(rtol=1e-8)
    ksp.set_operators(op)
    cols = jnp.stack([b, 5.0 * b])
    res = ksp.mat_solve(cols)
    assert res.all_converged()
    assert float(jnp.abs(res.x[0] - exact).max()) < 2e-1
    assert float(jnp.abs(res.x[1] - 5.0 * res.x[0]).max()) <= 1e-5 * float(
        jnp.abs(res.x[1]).max()
    )
    # flat block in -> flat block out
    res_flat = ksp.mat_solve(cols.reshape(2, -1))
    assert res_flat.x.shape == (2, 16**3)


def test_ksp_mat_solve_requires_cg():
    _, op, b, _ = _system(12)
    ksp = KSP(ksp_type="gmres", rtol=1e-6)
    ksp.set_operators(op)
    with pytest.raises(ValueError, match="mat_solve"):
        ksp.mat_solve(jnp.stack([b]))


@pytest.mark.slow
def test_refined_multi_blowup_reports_dtol():
    """Regression (review finding): a diverging column in the block
    defect-correction loop must report DIVERGED_DTOL, not the positive
    CONVERGED_STALLED (which error_if_not_converged would wave through)."""
    import scipy.sparse as sp

    from tpusparse.solve.cg import ConvergedReason
    from tpusparse.solve.multi import refined_multi

    n = 32
    rng = np.random.default_rng(1)
    s = rng.standard_normal((n, n))
    a_bad = np.eye(n) + 5.0 * (s - s.T)       # nonsymmetric: CG blows up
    lap = sp.diags(
        [2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)], [0, -1, 1]
    ).toarray() + 0.1 * np.eye(n)

    # column 0 solves the good SPD system; the OUTER operator for column 1
    # is the bad one, so its defect loop diverges
    a_hi = jnp.asarray(np.stack([lap, a_bad]))
    a_lo = a_hi.astype(jnp.float32)
    b = jnp.asarray(np.stack([lap @ np.ones(n), rng.standard_normal(n)]))

    res = refined_multi(
        lambda v: jnp.einsum("kij,kj->ki", a_hi, v),
        lambda v: jnp.einsum("kij,kj->ki", a_lo, v),
        b, rtol=1e-10, atol=1e-12, max_outer=40, batched_ops=True,
    )
    reasons = np.asarray(res.reason)
    assert reasons[0] > 0
    assert reasons[1] in (
        int(ConvergedReason.DIVERGED_DTOL),
        int(ConvergedReason.DIVERGED_NANORINF),
    ), reasons
