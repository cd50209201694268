"""Pipelined CG vs classic CG and dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg
from tpusparse.solve.pipelined import cg_pipelined


def _spd_system(n, seed):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, n))
    a = m @ m.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return jnp.asarray(a), jnp.asarray(b)


def test_matches_dense_solve():
    a, b = _spd_system(80, 0)
    res = cg_pipelined(lambda x: a @ x, b, rtol=1e-12)
    assert res.converged()
    x_ref = np.linalg.solve(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8, atol=1e-9)


def test_matches_classic_cg_iterations():
    """Same Krylov space — iteration counts should agree to within a couple
    (pipelined recurrences round differently)."""
    a, b = _spd_system(120, 1)
    r1 = cg(lambda x: a @ x, b, rtol=1e-10)
    r2 = cg_pipelined(lambda x: a @ x, b, rtol=1e-10)
    assert r1.converged() and r2.converged()
    assert abs(int(r1.iters) - int(r2.iters)) <= 3


@pytest.mark.slow
def test_preconditioned_poisson():
    grid = Grid3D(24, 24, 24)
    op, b, exact = poisson_stencil(grid)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=64))

    @jax.jit
    def solve(op, hier, b):
        return cg_pipelined(
            op.mv, b, rtol=1e-10, m_mv=lambda r: vcycle(hier, r)
        )

    res = solve(op, hier, b)
    assert res.converged()
    linf = float(jnp.max(jnp.abs(res.x - exact)))
    assert linf < 2e-2  # O(h^2) at 24^3 with the 12pi^2 curvature constant
    # AMG-preconditioned: mesh-independent-ish few dozen iterations
    assert int(res.iters) < 60


def test_divergence_reason_on_maxiter():
    a, b = _spd_system(60, 2)
    res = cg_pipelined(lambda x: a @ x, b, rtol=1e-14, maxiter=2)
    assert int(res.reason) < 0


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [8])
def test_sharded_matches_single(n_dev):
    from tpusparse.dist import make_mesh, shard_hierarchy, shard_system

    grid = Grid3D(16, 16, 16)
    op, b, exact = poisson_stencil(grid)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=64))

    def run(op, hier, b):
        return cg_pipelined(
            op.mv, b, rtol=1e-10, m_mv=lambda r: vcycle(hier, r)
        )

    r_single = jax.jit(run)(op, hier, b)

    mesh = make_mesh(n_dev)
    op_s, b_s, _ = shard_system(op, b, exact, mesh)
    hier_s = shard_hierarchy(hier, mesh)
    r_shard = jax.jit(run)(op_s, hier_s, b_s)

    assert r_shard.converged()
    np.testing.assert_allclose(
        np.asarray(r_single.x), np.asarray(r_shard.x), rtol=1e-8, atol=1e-10
    )


@pytest.mark.slow
def test_driver_pipecg_all_precisions():
    """pipecg now runs as the mixed-precision inner solver too (VERDICT
    item 6): f64 recurrence scalars + residual replacement cure the f32
    recurrence cancellation that round 1 guarded against."""
    from tpusparse.bench.driver import solve_poisson

    for precision in ("f64", "mixed"):
        rep = solve_poisson(
            16, rtol=1e-6, pc="gamg", precision=precision, ksp="pipecg",
            warmup=False,
        )
        assert rep.reason > 0, precision
        assert rep.linf_error < 5e-2, precision


def test_pipelined_f64_scalars_match_f32_vectors():
    """scalar_dtype=f64 must not change the contract (still converges, same
    solution) on an f32 solve."""
    import numpy as np

    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import poisson_stencil

    op, b, _ = poisson_stencil(Grid3D(12, 12, 12), dtype=np.float32)
    r32 = cg_pipelined(op.mv, b, rtol=1e-4, maxiter=500)
    r64 = cg_pipelined(
        op.mv, b, rtol=1e-4, maxiter=500, scalar_dtype=jnp.float64
    )
    assert r32.converged() and r64.converged()
    # same algorithm, same convergence contract; solutions are only
    # comparable to within ||r||/lambda_min (large for the near-singular
    # pinned Neumann operator), so gate on iteration-count agreement
    assert abs(int(r64.iters) - int(r32.iters)) <= 0.25 * int(r32.iters)
