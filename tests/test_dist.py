"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py):
sharded solves must match single-device bit-for-bit-ish and actually
produce sharded outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import Grid3D
from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.dist import (
    field_sharding,
    make_mesh,
    shard_hierarchy,
    shard_system,
)
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg


requires_multi = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_multi
def test_sharded_stencil_mv_matches():
    g = Grid3D(16, 8, 8)
    op, b, exact = poisson_stencil(g)
    y_ref = np.asarray(op.mv(b))

    mesh = make_mesh(8)
    op_s, b_s, _ = shard_system(op, b, exact, mesh)
    mv = jax.jit(lambda o, x: o.mv(x))
    y = mv(op_s, b_s)
    assert len(y.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-13, atol=1e-13)


@pytest.mark.slow
@requires_multi
@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_cg_amg_solve_matches(n_dev):
    g = Grid3D(24, 12, 12)
    op, b, exact = poisson_stencil(g)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))

    def solve(op, hier, b):
        return cg(
            op.mv, b, rtol=1e-10, maxiter=200,
            m_mv=lambda r: vcycle(hier, r),
        )

    ref = jax.jit(solve)(op, hier, b)
    assert ref.converged()

    mesh = make_mesh(n_dev)
    op_s, b_s, _ = shard_system(op, b, exact, mesh)
    hier_s = shard_hierarchy(hier, mesh)
    res = jax.jit(solve)(op_s, hier_s, b_s)
    assert res.converged()
    assert int(res.iters) == int(ref.iters)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-10, atol=1e-12
    )
    # solution stays sharded across the mesh (no silent gather to one device)
    assert len(res.x.sharding.device_set) == n_dev


@requires_multi
def test_indivisible_grid_rejected_with_clear_error():
    """XLA needs evenly divisible shards; the framework must fail fast with
    an actionable message (DMDA decomposition-validation parity)."""
    g = Grid3D(6, 6, 9)  # field (nz=9, ny=6, nx=6); mesh (4, 2): 9 % 4 != 0
    op, b, exact = poisson_stencil(g)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="not divisible by mesh"):
        shard_system(op, b, exact, mesh)


@requires_multi
def test_custom_mesh_shape():
    g = Grid3D(8, 8, 12)  # field (12, 8, 8); mesh shape (2, 4)
    op, b, exact = poisson_stencil(g)
    mesh = make_mesh(8, shape=(2, 4))
    op_s, b_s, _ = shard_system(op, b, exact, mesh)
    y = jax.jit(lambda o, x: o.mv(x))(op_s, b_s)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(op.mv(b)), rtol=1e-13, atol=1e-13
    )


@pytest.mark.slow
def test_driver_multidevice_mixed_end_to_end():
    """Full driver path with n_devices=8 and mixed precision: exercises the
    sharded op/hierarchy placement, the f32 twin, and the defect-correction
    loop under GSPMD."""
    from tpusparse.bench.driver import solve_poisson

    rep = solve_poisson(
        16, rtol=1e-8, pc="gamg", precision="mixed", n_devices=8,
        warmup=False,
    )
    assert rep.reason > 0
    assert rep.linf_error < 5e-2  # O(h^2) at 16^3
    rep1 = solve_poisson(
        16, rtol=1e-8, pc="gamg", precision="mixed", n_devices=1,
        warmup=False,
    )
    assert abs(rep.iters - rep1.iters) <= 3
    assert abs(rep.linf_error - rep1.linf_error) < 1e-6
