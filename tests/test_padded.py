"""Padded-resident operator/pipeline vs the plain layout (CPU oracles)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.sparse.padded import PaddedStar, crop_field, pad_field
from tpusparse.solve import cg


def _ops(shape, pin=True):
    nz, ny, nx = shape
    grid = Grid3D(nx, ny, nz)
    op, b, exact = poisson_stencil(grid, pin=pin, dtype=np.float32)
    return grid, op, PaddedStar.from_star(op, backend="xla"), b, exact


@pytest.mark.parametrize("shape", [(8, 8, 8), (12, 6, 10), (9, 16, 128)])
@pytest.mark.parametrize("pin", [True, False])
def test_padded_mv_matches_plain(shape, pin):
    grid, op, op_p, b, _ = _ops(shape, pin)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    y_ref = op.mv(x)
    y_p = op_p.mv(pad_field(x))
    scale = float(jnp.max(jnp.abs(y_ref)))
    np.testing.assert_allclose(
        np.asarray(crop_field(y_p, shape)), np.asarray(y_ref),
        rtol=1e-5, atol=1e-5 * scale,
    )
    # layout invariant: pads of the output are exactly zero
    y_np = np.asarray(y_p)
    nz, ny, nx = shape
    assert (y_np[0] == 0).all() and (y_np[-1] == 0).all()
    assert (y_np[:, ny:] == 0).all() and (y_np[:, :, nx:] == 0).all()


def test_padded_interpret_matches_xla():
    shape = (8, 8, 8)
    _grid, _op, op_p, _b, _ = _ops(shape)
    op_i = dataclasses.replace(op_p, backend="interpret")
    rng = np.random.default_rng(1)
    x = pad_field(jnp.asarray(rng.standard_normal(shape).astype(np.float32)))
    y_x = np.asarray(op_p.mv(x))
    y_i = np.asarray(op_i.mv(x))
    scale = np.abs(y_x).max()
    np.testing.assert_allclose(y_i, y_x, rtol=1e-5, atol=1e-5 * scale)


@pytest.mark.slow
def test_padded_vcycle_preconditions_like_plain():
    """rho estimation sees different start vectors on padded fields, so the
    cycles differ in rounding-level details — compare as preconditioners:
    same CG convergence behavior, same solution."""
    shape = (18, 18, 18)
    grid, op, op_p, b, _ = _ops(shape)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))
    hier_p = gamg_setup(op_p, AMGParams(coarse_eq_limit=30))

    r1 = cg(op.mv, b, rtol=1e-6, m_mv=lambda r: vcycle(hier, r))
    r2 = cg(
        op_p.mv, pad_field(b), rtol=1e-6,
        m_mv=lambda r: vcycle(hier_p, r),
    )
    assert r1.converged() and r2.converged()
    assert abs(int(r1.iters) - int(r2.iters)) <= 3
    scale = float(jnp.max(jnp.abs(r1.x)))
    np.testing.assert_allclose(
        np.asarray(crop_field(r2.x, shape)), np.asarray(r1.x),
        rtol=1e-4, atol=1e-4 * scale,
    )


def test_padded_cg_solve():
    shape = (16, 16, 16)
    grid, op, op_p, b, exact = _ops(shape)
    res = cg(op_p.mv, pad_field(b), rtol=1e-6, maxiter=3000)
    assert res.converged()
    linf = float(jnp.max(jnp.abs(crop_field(res.x, shape) - exact)))
    assert linf < 5e-2


@pytest.mark.slow
def test_driver_padded_layout_end_to_end():
    from tpusparse.bench.driver import solve_poisson

    rep_plain = solve_poisson(
        18, rtol=1e-8, pc="gamg", precision="mixed", layout="plain",
        warmup=False,
    )
    rep_padded = solve_poisson(
        18, rtol=1e-8, pc="gamg", precision="mixed", layout="padded",
        warmup=False,
    )
    assert rep_padded.reason > 0
    assert abs(rep_padded.linf_error - rep_plain.linf_error) < 1e-6
    assert abs(rep_padded.iters - rep_plain.iters) <= 3


def test_driver_padded_tf_end_to_end():
    from tpusparse.bench.driver import solve_poisson

    rep = solve_poisson(
        18, rtol=1e-8, pc="gamg", precision="tf", layout="padded",
        warmup=False,
    )
    assert rep.reason > 0
    assert rep.linf_error < 5e-2  # O(h^2) at 18^3
