"""Flexible GMRES (KSPFGMRES parity) — right-preconditioned, true-residual.

What plain GMRES cannot do and FGMRES exists for (Saad 1993): a
preconditioner that CHANGES between iterations (inexact inner solves,
non-stationary smoothers).  These tests pin (a) the nonsymmetric oracle,
(b) the true-residual convergence claim, and (c) the flexibility property
itself — a deliberately iteration-varying preconditioner that still
converges to the right answer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.solve.cg import ConvergedReason
from tpusparse.solve.fgmres import fgmres
from tpusparse.sparse.dia import DIA

from tests.test_gmres import _convdiff


def test_fgmres_nonsymmetric_matches_direct():
    a = _convdiff()
    d = DIA.from_csr(a)
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(a.n_rows)
    b = jnp.asarray(a.to_scipy() @ x_true)
    res = jax.jit(
        lambda op, b: fgmres(op.mv, b, rtol=1e-10, maxiter=2000, restart=40)
    )(d, b)
    assert res.converged()
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6,
                               atol=1e-7)


def test_fgmres_true_residual_convergence():
    """reason=CONVERGED_RTOL must certify the TRUE residual (right
    preconditioning), independent of how badly scaled M is — the property
    left-preconditioned gmres does NOT have."""
    a = _convdiff(10)
    d = DIA.from_csr(a)
    b = jnp.asarray(np.sin(np.arange(a.n_rows) * 0.37))
    # wildly scaled Jacobi: left-preconditioned norms would be off by ~1e4
    dinv = jnp.asarray(1e4 / a.to_scipy().diagonal())
    res = fgmres(d.mv, b, rtol=1e-8, maxiter=1000, restart=30,
                 m_mv=lambda r: dinv * r)
    assert res.converged()
    true_rel = float(
        jnp.linalg.norm(b - d.mv(res.x)) / jnp.linalg.norm(b)
    )
    assert true_rel <= 1.2e-8  # small slack for the recurrence estimate


def test_fgmres_variable_preconditioner_converges():
    """The flexibility property: M differs EVERY application (alternating
    scalings driven by a mutable host counter captured at trace time is
    impossible under jit — so emulate variability inside the graph with an
    iteration-independent but state-dependent scaling: M(r) depends on r,
    which plain GMRES's fixed-operator Arnoldi assumption violates)."""
    a = _convdiff(10, peclet=8.0)
    d = DIA.from_csr(a)
    dinv = jnp.asarray(1.0 / a.to_scipy().diagonal())
    b = jnp.asarray(np.cos(np.arange(a.n_rows) * 0.11))

    def m_var(r):
        # scaling factor depends on the vector being preconditioned —
        # a genuinely nonlinear, per-application-different operator
        s = 1.0 + 0.5 * jnp.tanh(jnp.vdot(r, r))
        return s * (dinv * r)

    res = fgmres(d.mv, b, rtol=1e-9, maxiter=2000, restart=30, m_mv=m_var)
    assert res.converged()
    true_rel = float(
        jnp.linalg.norm(b - d.mv(res.x)) / jnp.linalg.norm(b)
    )
    assert true_rel <= 5e-9


def test_fgmres_spd_matches_cg_solution():
    """On the SPD Poisson system fgmres and cg agree on the answer."""
    from tpusparse import Grid3D
    from tpusparse.grid.poisson import poisson_stencil
    from tpusparse.solve import cg

    grid = Grid3D(12, 12, 12)
    op, b, exact = poisson_stencil(grid, dtype=np.float64)
    r1 = fgmres(op.mv, b, rtol=1e-10, maxiter=3000, restart=40)
    r2 = cg(op.mv, b, rtol=1e-10, maxiter=3000)
    assert r1.converged() and r2.converged()
    np.testing.assert_allclose(
        np.asarray(r1.x), np.asarray(r2.x), rtol=1e-5, atol=1e-7
    )


@pytest.mark.slow
def test_fgmres_with_vcycle_preconditioner():
    """FGMRES wrapping the AMG V-cycle — the production pairing for
    variable preconditioners (the V-cycle with chebyshev smoothing is a
    fixed linear operator, but FGMRES must also handle it)."""
    from tpusparse import Grid3D
    from tpusparse.amg import AMGParams, gamg_setup, vcycle
    from tpusparse.grid.poisson import poisson_stencil

    grid = Grid3D(16, 16, 16)
    op, b, exact = poisson_stencil(grid, dtype=np.float64)
    hier = gamg_setup(op, AMGParams())
    # NB: plain restarted GMRES(30) STAGNATES on this SPD system (restart
    # stagnation — it hits maxiter at ~3e-7 relative), which is itself the
    # argument for the V-cycle: preconditioned, it converges in a handful
    # of iterations well inside one restart cycle.
    pc = fgmres(op.mv, b, rtol=1e-9, maxiter=2000, restart=30,
                m_mv=lambda r: vcycle(hier, r))
    assert pc.converged()
    assert int(pc.iters) <= 30
    true_rel = float(jnp.linalg.norm(b - op.mv(pc.x)) / jnp.linalg.norm(b))
    assert true_rel <= 2e-9


def test_fgmres_maxiter_reports_its():
    a = _convdiff(10)
    d = DIA.from_csr(a)
    b = jnp.asarray(np.ones(a.n_rows))
    res = fgmres(d.mv, b, rtol=1e-14, maxiter=3, restart=30)
    assert int(res.reason) == int(ConvergedReason.DIVERGED_ITS)
    assert int(res.iters) == 3


def test_fgmres_history_monotone_tail():
    a = _convdiff(8)
    d = DIA.from_csr(a)
    b = jnp.asarray(np.sin(np.arange(a.n_rows) * 0.51))
    res, hist = fgmres(d.mv, b, rtol=1e-9, maxiter=500, restart=30,
                       history=True)
    assert res.converged()
    h = np.asarray(hist)[: int(res.iters) + 1]
    assert h[0] > 0 and h[-1] <= 1e-9 * h[0] * 1.01 + 1e-30
