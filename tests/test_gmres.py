"""Restarted GMRES (KSPGMRES parity) — nonsymmetric oracle tests.

The reference never needs GMRES (its operator is SPD), but PETSc users get
it by default; with the general-matrix containers (DIA/ELL) nonsymmetric
operators are first-class here, so the workhorse solver must exist.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse import Grid3D, HostCSR
from tpusparse.grid.poisson import assemble_poisson, poisson_stencil
from tpusparse.solve.cg import ConvergedReason
from tpusparse.solve.gmres import gmres
from tpusparse.sparse.dia import DIA


def _convdiff(n=12, peclet=5.0):
    """1D-kron'd 3D convection-diffusion: Poisson + upwind convection —
    genuinely nonsymmetric, the GMRES use case."""
    lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
    up1 = sp.diags([-1.0, 1.0], [-1, 0], shape=(n, n)) * peclet / n
    eye = sp.identity(n)
    a1 = lap1 + up1
    a = (
        sp.kron(sp.kron(a1, eye), eye)
        + sp.kron(sp.kron(eye, a1), eye)
        + sp.kron(sp.kron(eye, eye), a1)
    ).tocsr()
    return HostCSR.from_scipy(a)


def test_gmres_nonsymmetric_matches_direct():
    a = _convdiff()
    d = DIA.from_csr(a)
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(a.n_rows)
    b = jnp.asarray(a.to_scipy() @ x_true)
    res = jax.jit(
        lambda op, b: gmres(op.mv, b, rtol=1e-10, maxiter=2000, restart=40)
    )(d, b)
    assert res.converged()
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6,
                               atol=1e-7)


def test_gmres_preconditioned_fewer_iterations():
    a = _convdiff(14, peclet=20.0)
    d = DIA.from_csr(a)
    dinv = jnp.asarray(1.0 / a.to_scipy().diagonal())
    b = jnp.asarray(np.sin(np.arange(a.n_rows) * 0.23))
    plain = gmres(d.mv, b, rtol=1e-8, maxiter=2000, restart=30)
    pc = gmres(d.mv, b, rtol=1e-8, maxiter=2000, restart=30,
               m_mv=lambda r: dinv * r)
    assert plain.converged() and pc.converged()
    assert int(pc.iters) <= int(plain.iters)


def test_gmres_restart_cycles():
    """Convergence requiring multiple restart cycles still lands."""
    a = _convdiff(12)
    d = DIA.from_csr(a)
    b = jnp.asarray(np.cos(np.arange(a.n_rows) * 0.11))
    res = gmres(d.mv, b, rtol=1e-8, maxiter=3000, restart=8)
    assert res.converged()
    assert int(res.iters) > 8  # actually restarted
    x = np.asarray(res.x)
    r = np.asarray(b) - a.to_scipy() @ x
    assert np.linalg.norm(r) <= 1e-6 * np.linalg.norm(np.asarray(b))


@pytest.mark.slow
def test_gmres_on_spd_poisson_with_amg():
    """GMRES+AMG on the SPD reference problem converges like CG+AMG."""
    from tpusparse.amg import AMGParams, gamg_setup, vcycle
    from tpusparse.solve import cg

    op, b, _ = poisson_stencil(Grid3D(16, 16, 16), dtype=np.float32)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=40))
    m = lambda r: vcycle(hier, r)
    rg = gmres(op.mv, b, rtol=1e-6, maxiter=200, restart=30, m_mv=m)
    rc = cg(op.mv, b, rtol=1e-6, maxiter=200, m_mv=m)
    assert rg.converged() and rc.converged()
    assert int(rg.iters) <= int(rc.iters) + 5


def test_gmres_history_and_maxiter():
    a = _convdiff(10)
    d = DIA.from_csr(a)
    b = jnp.asarray(np.ones(a.n_rows))
    res, hist = gmres(d.mv, b, rtol=1e-8, maxiter=50, restart=10,
                      history=True)
    h = np.asarray(hist)
    it = int(res.iters)
    assert h.shape == (51,)
    np.testing.assert_allclose(h[it], float(res.resnorm), rtol=1e-5)
    # maxiter exhaustion reports DIVERGED_ITS
    res2 = gmres(d.mv, b, rtol=1e-14, maxiter=5, restart=10)
    assert int(res2.reason) == int(ConvergedReason.DIVERGED_ITS)
    assert int(res2.iters) == 5


def test_driver_gmres():
    from tpusparse.bench.driver import solve_poisson

    rep = solve_poisson(12, rtol=1e-6, precision="f64", ksp="gmres",
                        pc="gamg", warmup=False)
    assert rep.reason > 0
    assert rep.linf_error < 5e-2


# --- BiCGStab (KSPBCGS) ------------------------------------------------------

def test_bicgstab_nonsymmetric_matches_direct():
    from tpusparse.solve.bcgs import bicgstab

    a = _convdiff()
    d = DIA.from_csr(a)
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(a.n_rows)
    b = jnp.asarray(a.to_scipy() @ x_true)
    dinv = jnp.asarray(1.0 / a.to_scipy().diagonal())
    res = jax.jit(
        lambda op, b: bicgstab(op.mv, b, rtol=1e-10, maxiter=3000,
                               m_mv=lambda r: dinv * r)
    )(d, b)
    assert res.converged()
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-5,
                               atol=1e-6)


def test_bicgstab_history_and_driver():
    from tpusparse.bench.driver import solve_poisson
    from tpusparse.solve.bcgs import bicgstab

    a = _convdiff(10)
    d = DIA.from_csr(a)
    b = jnp.asarray(np.ones(a.n_rows))
    res, hist = bicgstab(d.mv, b, rtol=1e-8, maxiter=300, history=True)
    assert res.converged()
    h = np.asarray(hist)
    np.testing.assert_allclose(h[int(res.iters)], float(res.resnorm),
                               rtol=1e-5)
    rep = solve_poisson(12, rtol=1e-6, precision="f64", ksp="bcgs",
                        pc="gamg", warmup=False)
    assert rep.reason > 0
    assert rep.linf_error < 5e-2
