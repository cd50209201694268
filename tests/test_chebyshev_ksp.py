"""KSPCHEBYSHEV as a top-level solver (solve/chebyshev.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpusparse.solve import cg, chebyshev
from tpusparse.solve.cg import ConvergedReason
import pytest


def _lap1d(n):
    return sp.diags(
        [2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)], [0, -1, 1]
    ).toarray()


def test_chebyshev_matches_cg_solution():
    """Jacobi-preconditioned Chebyshev with auto bounds converges to the
    same solution CG finds (slower in iterations — no minimization — but
    dot-free per iteration)."""
    n = 96
    a_np = _lap1d(n) + 0.2 * np.eye(n)
    a = jnp.asarray(a_np)
    minv = jnp.asarray(1.0 / np.diag(a_np))
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    m = lambda r: minv * r
    res = chebyshev(lambda v: a @ v, b, rtol=1e-10, maxiter=4000, m_mv=m)
    ref = cg(lambda v: a @ v, b, rtol=1e-12, m_mv=m)
    assert int(res.reason) > 0, int(res.reason)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), atol=1e-7
    )
    # the true residual the result reports is honest
    true = np.linalg.norm(np.asarray(b) - a_np @ np.asarray(res.x))
    np.testing.assert_allclose(float(res.resnorm), true, rtol=1e-6)


def test_chebyshev_explicit_bounds_beat_auto_loose():
    """Tight explicit [emin, emax] converge faster than the conservative
    auto transform (lo = 0.1 rho is far below the true lmin here).  The
    shifted operator keeps lmin above the auto lo, so BOTH converge —
    PETSc's default transform likewise assumes a clustered (smoothing-
    context) spectrum."""
    n = 64
    a_np = _lap1d(n) + 0.5 * np.eye(n)   # spectrum in (0.5, 4.5)
    ev = np.linalg.eigvalsh(a_np)
    a = jnp.asarray(a_np)
    b = jnp.ones(n)
    auto = chebyshev(lambda v: a @ v, b, rtol=1e-8, maxiter=8000)
    tight = chebyshev(
        lambda v: a @ v, b, rtol=1e-8, maxiter=8000,
        emin=float(ev[0]), emax=float(ev[-1]),
    )
    assert int(auto.reason) > 0 and int(tight.reason) > 0
    assert int(tight.iters) < int(auto.iters)


def test_chebyshev_negative_definite_pair():
    """A = nabla^2-sign (negative definite) with M = 1/diag (also
    negative): M A has positive spectrum and the iteration just works —
    the reference's own sign convention."""
    n = 64
    a_np = -(_lap1d(n) + 0.2 * np.eye(n))
    a = jnp.asarray(a_np)
    minv = jnp.asarray(1.0 / np.diag(a_np))
    x_ref = np.random.default_rng(1).standard_normal(n)
    b = jnp.asarray(a_np @ x_ref)
    res = chebyshev(
        lambda v: a @ v, b, rtol=1e-10, maxiter=4000,
        m_mv=lambda r: minv * r,
    )
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-6)


@pytest.mark.slow
def test_chebyshev_via_driver_gamg():
    """-ksp_type chebyshev with the GAMG V-cycle: multigrid-driven
    Chebyshev (no dots on the critical path except the convergence
    check)."""
    from tpusparse.bench.driver import solve_poisson

    rep = solve_poisson(
        20, 20, 20, rtol=1e-8, ksp="chebyshev", precision="f64",
    )
    assert rep.reason > 0
    assert rep.linf_error < 3e-2  # O(h^2) at 20^3


def test_chebyshev_history_and_maxiter():
    a = jnp.asarray(_lap1d(32))
    b = jnp.ones(32)
    res, hist = chebyshev(
        lambda v: a @ v, b, rtol=1e-14, maxiter=5, history=True,
    )
    assert int(res.reason) == int(ConvergedReason.DIVERGED_ITS)
    h = np.asarray(hist)
    assert h[0] > 0 and (h[1 : int(res.iters) + 1] > 0).all()


@pytest.mark.slow
def test_chebyshev_mixed_inner():
    """chebyshev as the INNER solver of mixed-precision defect correction
    (the production wrapper accepts any solver with the cg contract)."""
    from tpusparse.bench.driver import solve_poisson

    rep = solve_poisson(16, 16, 16, rtol=1e-8, ksp="chebyshev")
    assert rep.reason > 0
    assert rep.linf_error < 5e-2  # O(h^2) at 16^3
