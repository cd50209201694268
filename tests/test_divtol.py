"""-ksp_divtol / DIVERGED_DTOL: the divergence branch of PETSc's
KSPConvergedDefault test (||r|| >= divtol * ||b|| => reason -4)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.solve import cg, minres
from tpusparse.solve.cg import ConvergedReason
from tpusparse.solve.simple import richardson


def _lap1d(n):
    return sp.diags(
        [2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)], [0, -1, 1]
    ).toarray()


def _nonsym(n=32, seed=1):
    """CG applied outside its contract (nonsymmetric A): the residual
    grows without bound — the textbook case divtol exists for."""
    rng = np.random.default_rng(seed)
    s = rng.standard_normal((n, n))
    s = s - s.T
    return np.eye(n) + 5.0 * s, rng.standard_normal(n)


def test_cg_blowup_reports_dtol():
    a_np, b_np = _nonsym()
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)
    res = cg(lambda v: a @ v, b, rtol=1e-12, maxiter=5000, divtol=1e5)
    assert int(res.reason) == int(ConvergedReason.DIVERGED_DTOL)
    assert int(res.iters) < 5000  # exited early, not at maxiter
    assert float(res.resnorm) >= 1e5 * np.linalg.norm(b_np) * 0.99


def test_cg_divtol_disabled_runs_to_maxiter():
    a_np, b_np = _nonsym()
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)
    res = cg(lambda v: a @ v, b, rtol=1e-12, maxiter=60, divtol=0.0)
    assert int(res.reason) == int(ConvergedReason.DIVERGED_ITS)


def test_cg_divtol_does_not_fire_on_convergent_solves():
    a = jnp.asarray(_lap1d(48) + 0.1 * np.eye(48))
    b = jnp.ones(48)
    res = cg(lambda v: a @ v, b, rtol=1e-10, divtol=1e5)
    assert int(res.reason) > 0


def test_richardson_overdamped_dtol():
    """Richardson with scale far beyond 2/lmax diverges geometrically —
    caught by dtol within a few dozen iterations."""
    a = jnp.asarray(_lap1d(32))
    b = jnp.ones(32)
    res = richardson(
        lambda v: a @ v, b, rtol=1e-10, maxiter=5000, scale=5.0,
    )
    assert int(res.reason) == int(ConvergedReason.DIVERGED_DTOL)
    assert int(res.iters) < 200


def test_minres_does_not_dtol_on_indefinite():
    """MINRES monotonically non-increases the preconditioned residual, so
    the same indefinite system that DTOLs CG converges here."""
    n = 64
    a_np = _lap1d(n) - 1.37 * np.eye(n)
    a = jnp.asarray(a_np)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    res = minres(lambda v: a @ v, b, rtol=1e-10, maxiter=500)
    assert int(res.reason) > 0


def test_option_parses_and_threads():
    from tpusparse.config import load_options

    o = load_options(["-ksp_divtol", "1e3"])
    assert o.ksp_divtol == 1e3
