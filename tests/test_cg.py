"""CG solver tests: dense oracle, Poisson manufactured-solution gate,
converged-reason semantics (reference src/main_ksp.cpp:103-121)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import ELL, Grid3D
from tpusparse.grid.poisson import assemble_poisson, poisson_stencil
from tpusparse.solve import ConvergedReason, cg


def test_cg_dense_spd_oracle():
    rng = np.random.default_rng(0)
    n = 40
    q = rng.standard_normal((n, n))
    a = q @ q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    res = cg(lambda x: jnp.asarray(a) @ x, jnp.asarray(b), rtol=1e-12, maxiter=500)
    assert res.converged()
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(a, b), rtol=1e-8)


def test_cg_negative_definite():
    """The assembled Poisson operator is negative definite; CG must handle
    the sign exactly as PETSc does."""
    rng = np.random.default_rng(1)
    n = 30
    q = rng.standard_normal((n, n))
    a = -(q @ q.T + n * np.eye(n))
    b = rng.standard_normal(n)
    res = cg(lambda x: jnp.asarray(a) @ x, jnp.asarray(b), rtol=1e-12, maxiter=500)
    assert res.converged()
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(a, b), rtol=1e-8)


@pytest.mark.parametrize("fmt", ["stencil", "ell"])
def test_cg_poisson_manufactured(fmt):
    """Unpreconditioned CG on 24^3 pinned Poisson: converge and reproduce the
    manufactured solution to O(h^2) (the reference's Linf gate,
    src/main_ksp.cpp:120-129)."""
    g = Grid3D(24, 24, 24)
    if fmt == "stencil":
        op, b, exact = poisson_stencil(g)
        a_mv = op.mv
    else:
        a, bh, exacth = assemble_poisson(g)
        op = ELL.from_csr(a, width=8)
        a_mv = op.mv
        b, exact = jnp.asarray(bh), jnp.asarray(exacth)

    solve = jax.jit(lambda b: cg(a_mv, b, rtol=1e-10, maxiter=5000))
    res = solve(b)
    assert res.converged(), int(res.reason)
    linf = float(jnp.abs(res.x - exact).max())
    # discretization error at h=1/24: ~ pi^2/3 * h^2 ~ 6e-3
    assert linf < 2e-2, linf
    # residual actually small
    assert float(res.resnorm) <= 1e-10 * float(res.bnorm)


def test_cg_maxiter_diverged_its():
    g = Grid3D(16, 16, 16)
    op, b, _ = poisson_stencil(g)
    res = cg(op.mv, b, rtol=1e-12, maxiter=3)
    assert int(res.reason) == ConvergedReason.DIVERGED_ITS
    assert int(res.iters) == 3


def test_cg_nan_detected():
    a = jnp.array([[1.0, 0.0], [0.0, jnp.nan]])
    res = cg(lambda x: a @ x, jnp.ones(2), maxiter=10)
    assert int(res.reason) == ConvergedReason.DIVERGED_NANORINF


def test_cg_atol_reason():
    n = 20
    a = np.eye(n) * 2.0
    b = np.full(n, 1e-30)
    res = cg(lambda x: jnp.asarray(a) @ x, jnp.asarray(b), rtol=1e-30, atol=1e-12)
    assert int(res.reason) == ConvergedReason.CONVERGED_ATOL


def test_cg_hostloop_matches_cg():
    """The gather-safe host-chunked driver follows the same iteration
    sequence as cg (exact state carry), converging to the same solution."""
    import numpy as np

    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import assemble_poisson
    from tpusparse.solve.cg import cg_hostloop
    from tpusparse.sparse.ell import ELL

    grid = Grid3D(12, 12, 12)
    a, rhs, exact = assemble_poisson(grid)
    ell = ELL.from_csr(a)
    b = jnp.asarray(rhs)

    r_ref = cg(lambda v: ell.mv(v), b, rtol=1e-10, maxiter=3000)
    r_host = cg_hostloop(
        lambda e, v: e.mv(v), ell, b, rtol=1e-10, maxiter=3000, chunk=50
    )
    assert r_ref.converged() and r_host.converged()
    # host loop may overrun by < chunk iterations
    assert int(r_host.iters) - int(r_ref.iters) < 50
    np.testing.assert_allclose(
        np.asarray(r_host.x), np.asarray(r_ref.x), rtol=1e-7, atol=1e-9
    )


def test_cg_hostloop_preconditioned():
    import numpy as np

    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import assemble_poisson
    from tpusparse.solve.cg import cg_hostloop
    from tpusparse.sparse.ell import ELL

    grid = Grid3D(14, 14, 14)
    a, rhs, exact = assemble_poisson(grid)
    ell = ELL.from_csr(a)
    dinv = jnp.asarray(1.0 / a.diagonal())
    res = cg_hostloop(
        lambda e, v: e.mv(v), ell, jnp.asarray(rhs), rtol=1e-8,
        maxiter=3000, m_apply=lambda d, r: d * r, m_state=dinv,
    )
    assert res.converged()
    linf = float(jnp.max(jnp.abs(res.x - jnp.asarray(exact))))
    assert linf < 5e-2


@pytest.mark.slow
def test_ksp_norm_type_variants():
    """-ksp_norm_type (round-4 verdict item 7): preconditioned uses
    sqrt(<r,z>) as the test quantity (PETSc CG's own default norm); none
    runs exactly maxiter iterations and reports CONVERGED_ITS."""
    from tpusparse.amg.hierarchy import AMGParams, gamg_setup, vcycle
    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import poisson_stencil

    op, b, _e = poisson_stencil(Grid3D(14, 14, 14))
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=50))
    m = lambda r: vcycle(hier, r)
    b = jnp.asarray(b)

    r_u = cg(op.mv, b, rtol=1e-8, maxiter=200, m_mv=m)
    r_p = cg(op.mv, b, rtol=1e-8, maxiter=200, m_mv=m,
             norm_type="preconditioned")
    assert int(r_u.reason) > 0 and int(r_p.reason) > 0
    # same Krylov sequence, different test quantity: iteration counts land
    # within a couple of each other on an SPD system with an SPD M
    assert abs(int(r_u.iters) - int(r_p.iters)) <= 3
    np.testing.assert_allclose(
        np.asarray(r_p.x), np.asarray(r_u.x), rtol=1e-5, atol=1e-8
    )

    r_n = cg(op.mv, b, rtol=1e-8, maxiter=7, m_mv=m, norm_type="none")
    assert int(r_n.iters) == 7
    assert int(r_n.reason) == int(ConvergedReason.CONVERGED_ITS)

    with pytest.raises(ValueError, match="norm_type"):
        cg(op.mv, b, norm_type="bogus")
