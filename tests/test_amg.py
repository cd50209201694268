"""AMG tests: VarStencil27 round-trips, transfer vs explicit-P oracle,
probed Galerkin vs scipy P^T A P, and CG+AMG convergence gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse import Grid3D
from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.amg.galerkin import galerkin_coarse, ptap_scipy
from tpusparse.amg.transfer import StructuredTransfer
from tpusparse.grid.poisson import assemble_poisson, poisson_stencil
from tpusparse.solve import cg
from tpusparse.sparse.varstencil import VarStencil27


def _poisson(dims, pin=True):
    g = Grid3D(*dims)
    a, b, exact = assemble_poisson(g, pin=pin)
    op, b3, exact3 = poisson_stencil(g, pin=pin)
    return g, a, op, b3, exact3


# --- VarStencil27 ----------------------------------------------------------

@pytest.mark.parametrize("dims", [(4, 4, 4), (5, 3, 4)])
def test_varstencil_roundtrip_and_mv(dims):
    g, a, op, _, _ = _poisson(dims)
    vs = VarStencil27.from_csr(a, g.shape)
    back = vs.to_csr()
    assert abs(back.to_scipy() - a.to_scipy()).max() < 1e-14
    x = np.random.default_rng(0).standard_normal(g.shape)
    np.testing.assert_allclose(
        np.asarray(vs.mv(jnp.asarray(x))).reshape(-1),
        a.mv(x.reshape(-1)),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(vs.diagonal_field()).reshape(-1), a.diagonal(), rtol=1e-14
    )


def test_varstencil_rejects_wide_pattern():
    from tpusparse.sparse.csr import HostCSR

    n = 27  # 3x3x3 grid; couple cells 0 and 26 (offset (2,2,2))
    m = sp.csr_matrix(
        (np.array([1.0, 1.0]), (np.array([0, 26]), np.array([26, 0]))),
        shape=(n, n),
    )
    with pytest.raises(ValueError, match="27-point"):
        VarStencil27.from_csr(HostCSR.from_scipy(m), (3, 3, 3))


# --- transfers vs explicit P -----------------------------------------------

@pytest.mark.parametrize("dims", [(6, 6, 6), (7, 5, 4)])
def test_transfer_matches_explicit_p(dims):
    g, a, op, _, _ = _poisson(dims)
    dinv = 1.0 / op.diagonal_field()
    tr = StructuredTransfer.build(g.shape, omega=0.7, dtype=np.float64)
    p = tr.explicit_p_scipy(a, np.asarray(dinv).reshape(-1))

    rng = np.random.default_rng(1)
    e_c = rng.standard_normal(tr.c_shape)
    np.testing.assert_allclose(
        np.asarray(tr.prolong(op, dinv, jnp.asarray(e_c))).reshape(-1),
        p @ e_c.reshape(-1),
        rtol=1e-12, atol=1e-12,
    )
    r = rng.standard_normal(g.shape)
    np.testing.assert_allclose(
        np.asarray(tr.restrict(op, dinv, jnp.asarray(r))).reshape(-1),
        p.T @ r.reshape(-1),
        rtol=1e-12, atol=1e-12,
    )


# --- probed Galerkin vs scipy ------------------------------------------------

@pytest.mark.parametrize("dims", [(9, 9, 9), (10, 8, 7), (4, 9, 5)])
def test_galerkin_probe_exact(dims):
    g, a, op, _, _ = _poisson(dims)
    dinv = 1.0 / op.diagonal_field()
    tr = StructuredTransfer.build(g.shape, omega=0.55, dtype=np.float64)
    ac_dev = galerkin_coarse(op, dinv, tr)

    p = tr.explicit_p_scipy(a, np.asarray(dinv).reshape(-1))
    ac_ref = ptap_scipy(a, p).to_scipy()

    ac_back = ac_dev.to_csr().to_scipy()
    assert abs(ac_back - ac_ref).max() < 1e-11


def test_galerkin_probe_second_level():
    """The 27-point invariant must hold level-to-level: probe a coarse
    VarStencil27 again and match scipy."""
    g, a, op, _, _ = _poisson((9, 9, 9))
    dinv = 1.0 / op.diagonal_field()
    tr = StructuredTransfer.build(g.shape, omega=0.55, dtype=np.float64)
    ac = galerkin_coarse(op, dinv, tr)         # 3x3x3 coarse grid

    a1 = ac.to_csr()
    dinv1 = 1.0 / ac.diagonal_field()
    tr1 = StructuredTransfer.build(ac.grid_shape, omega=0.6, dtype=np.float64)
    ac2_dev = galerkin_coarse(ac, dinv1, tr1)
    p1 = tr1.explicit_p_scipy(a1, np.asarray(dinv1).reshape(-1))
    ac2_ref = ptap_scipy(a1, p1).to_scipy()
    assert abs(ac2_dev.to_csr().to_scipy() - ac2_ref).max() < 1e-11


# --- full hierarchy + CG ------------------------------------------------------

def test_hierarchy_shapes():
    g, _, op, _, _ = _poisson((27, 27, 27))
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))
    shapes = [lev.op.grid_shape for lev in hier.levels]
    assert shapes == [(27, 27, 27), (9, 9, 9), (3, 3, 3)]
    assert hier.levels[-1].transfer is None


def test_vcycle_symmetric():
    """The V-cycle must be a symmetric operator (valid CG preconditioner):
    check <M r1, r2> == <r1, M r2>."""
    g, _, op, _, _ = _poisson((9, 9, 9))
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=5))
    rng = np.random.default_rng(2)
    r1 = jnp.asarray(rng.standard_normal(g.shape))
    r2 = jnp.asarray(rng.standard_normal(g.shape))
    m1 = vcycle(hier, r1)
    m2 = vcycle(hier, r2)
    s12 = float(jnp.vdot(m1, r2))
    s21 = float(jnp.vdot(r1, m2))
    assert s12 == pytest.approx(s21, rel=1e-10)


@pytest.mark.parametrize(
    "n,smoother,max_iters",
    [(24, "chebyshev", 30), (30, "chebyshev", 30), (24, "richardson", 120)],
)
@pytest.mark.slow
def test_cg_amg_poisson(n, smoother, max_iters):
    """CG+AMG must converge in O(10) iterations with the default chebyshev
    smoother (mesh-independent), still converge with the reference config's
    richardson(1)+jacobi parity smoother, and pass the manufactured-solution
    Linf gate (src/main_ksp.cpp:120-129)."""
    g, _, op, b, exact = _poisson((n, n, n))
    hier = gamg_setup(
        op, AMGParams(coarse_eq_limit=30, smoother=smoother)
    )

    solve = jax.jit(
        lambda b: cg(
            op.mv, b, rtol=1e-10, maxiter=200,
            m_mv=lambda r: vcycle(hier, r),
        )
    )
    res = solve(b)
    assert res.converged(), int(res.reason)
    iters = int(res.iters)
    assert iters < max_iters, iters
    linf = float(jnp.abs(res.x - exact).max())
    assert linf < 10.0 / (n * n), linf  # O(h^2) with generous constant


@pytest.mark.slow
def test_cg_amg_iteration_count_mesh_independent():
    """The hallmark of multigrid: iterations must not grow with the mesh."""
    iters = []
    for n in (18, 36):
        g, _, op, b, _ = _poisson((n, n, n))
        hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))
        res = cg(op.mv, b, rtol=1e-10, maxiter=200, m_mv=lambda r: vcycle(hier, r))
        assert res.converged()
        iters.append(int(res.iters))
    assert iters[1] <= iters[0] + 5, iters


@pytest.mark.slow
def test_cg_amg_beats_plain_cg_iterations():
    g, _, op, b, _ = _poisson((24, 24, 24))
    hier = gamg_setup(op)
    plain = cg(op.mv, b, rtol=1e-8, maxiter=2000)
    pcg = cg(op.mv, b, rtol=1e-8, maxiter=2000, m_mv=lambda r: vcycle(hier, r))
    assert int(pcg.iters) * 3 < int(plain.iters), (
        int(pcg.iters), int(plain.iters),
    )


@pytest.mark.slow
def test_fmg_pass_reduces_residual_every_level():
    """FMG (nested iteration, -pc_mg_type full cycle shape): one pass must
    beat one plain V-cycle from zero, be linear in b, and run jitted."""
    import jax

    from tpusparse.amg.hierarchy import fmg

    op, b, _ = poisson_stencil(Grid3D(24, 24, 24), dtype=np.float64)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=60))
    b3 = b.reshape(op.grid_shape)

    def rel(x):
        r = b3 - op.mv(x)
        return float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b3.ravel()))

    x_v = vcycle(hier, b3)
    x_f = jax.jit(lambda bb: fmg(hier, bb, n_v=1))(b3)
    assert rel(x_f) < rel(x_v)
    # linearity (a fixed linear process in b); eager-vs-eager so only
    # scaling exactness is tested, not jit-vs-eager reduction order
    x1 = fmg(hier, b3, n_v=1)
    x2 = fmg(hier, 2.0 * b3, n_v=1)
    np.testing.assert_allclose(
        np.asarray(x2), 2.0 * np.asarray(x1), rtol=1e-12
    )
