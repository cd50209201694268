"""BSR container vs scipy oracles + the BASELINE config-3 solve shape
(CG + Chebyshev/Jacobi smoothing on a Poisson system in BSR form)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import assemble_poisson
from tpusparse.sparse.bsr import BSR
from tpusparse.solve import cg


def _rand_bsr(nb, bs, density, seed):
    rng = np.random.default_rng(seed)
    mask = sp.random(nb, nb, density=density, random_state=rng, format="csr")
    mask.data[:] = 1.0
    m = sp.kron(mask, np.ones((bs, bs))).tocsr()
    m.data = rng.standard_normal(m.nnz)
    m = m.tobsr(blocksize=(bs, bs))
    m.sort_indices()
    return m


def test_mv_matches_scipy():
    for bs in (1, 2, 4):
        m = _rand_bsr(40, bs, 0.08, bs)
        b = BSR.from_scipy_bsr(m)
        assert b.bs == bs
        x = np.random.default_rng(1).standard_normal(m.shape[1])
        np.testing.assert_allclose(
            np.asarray(b.mv(jnp.asarray(x))), m @ x, rtol=1e-12, atol=1e-12
        )


def test_reblock_csr_roundtrip():
    grid = Grid3D(8, 8, 8)
    a, _b, _e = assemble_poisson(grid)
    b = BSR.from_csr(a, bs=4)
    assert b.shape == a.shape
    x = np.random.default_rng(2).standard_normal(grid.n)
    np.testing.assert_allclose(
        np.asarray(b.mv(jnp.asarray(x))), a.mv(x), rtol=1e-12, atol=1e-10
    )
    back = b.to_csr()
    np.testing.assert_allclose(back.to_dense(), a.to_dense(), atol=1e-14)


def test_diagonal():
    m = (_rand_bsr(30, 3, 0.1, 7) + sp.identity(90) * 5.0).tobsr(
        blocksize=(3, 3)
    )
    b = BSR.from_scipy_bsr(m)
    np.testing.assert_allclose(
        np.asarray(b.diagonal()), m.diagonal(), rtol=1e-12
    )


def test_cg_chebyshev_on_bsr_poisson():
    """BASELINE config 3 (scaled down for CPU): CG + Chebyshev(Jacobi)
    preconditioning with the operator stored as BSR blocks."""
    grid = Grid3D(16, 16, 16)
    a, rhs, exact = assemble_poisson(grid)
    op = BSR.from_csr(a, bs=4)

    dinv = 1.0 / jnp.asarray(a.diagonal())
    # rho(D^-1 A) estimate by power iteration (operator is negative definite;
    # spectrum of D^-1 A is positive)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(grid.n))
    for _ in range(20):
        w = dinv * op.mv(v)
        v = w / jnp.linalg.norm(w)
    rho = float(v @ (dinv * op.mv(v))) * 1.05

    def cheby(r, degree=3):
        lo, hi = 0.1 * rho, 1.05 * rho
        theta, delta = 0.5 * (hi + lo), 0.5 * (hi - lo)
        sigma = theta / delta
        rho_c = 1.0 / sigma
        d = (dinv * r) / theta
        x = d
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma - rho_c)
            rr = r - op.mv(x)
            d = rho_new * rho_c * d + (2.0 * rho_new / delta) * (dinv * rr)
            x = x + d
            rho_c = rho_new
        return x

    res = cg(op.mv, jnp.asarray(rhs), rtol=1e-8, maxiter=2000, m_mv=cheby)
    assert res.converged()
    linf = float(jnp.max(jnp.abs(res.x - jnp.asarray(exact))))
    assert linf < 5e-2  # O(h^2) at 16^3


def test_spmm_matches_dense():
    m = _rand_bsr(25, 3, 0.12, 11)
    b = BSR.from_scipy_bsr(m)
    x = np.random.default_rng(12).standard_normal((m.shape[1], 5))
    np.testing.assert_allclose(
        np.asarray(b.mm(jnp.asarray(x))), m @ x, rtol=1e-12, atol=1e-12
    )
