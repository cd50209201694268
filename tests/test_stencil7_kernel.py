"""Pallas 7-point stencil kernel vs the XLA lax.pad pipeline.

Runs the kernel under the Pallas interpreter (CPU suite) so its semantics —
manual halo DMA, slab normalization, edge masking, pinned row/column handling
— are pinned without TPU hardware.  The real-chip run is exercised by the
bench driver (tpusparse/bench/driver.py) on the TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import assemble_poisson, poisson_stencil
from tpusparse.kernels.stencil7 import star7_mv_pallas, star7_supported


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(8, 8, 8), (12, 6, 10), (20, 16, 16)])
@pytest.mark.parametrize("pin", [True, False])
def test_kernel_matches_xla_path(shape, pin):
    nz, ny, nx = shape
    grid = Grid3D(nx, ny, nz)
    op, _b, _e = poisson_stencil(grid, pin=pin, dtype=np.float32)
    assert star7_supported(shape, jnp.float32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    y_xla = op.mv(x)  # CPU default backend -> XLA path
    y_pal = star7_mv_pallas(
        op.diag, op.cx, op.cy, op.cz, x, pin, interpret=True
    )
    # f32 with O(1/h^2) coefficients; kernel and XLA path associate the
    # sums differently -> ~1e-4 absolute wiggle at O(100) magnitudes
    scale = float(jnp.max(jnp.abs(y_xla)))
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_xla), rtol=1e-5, atol=1e-5 * scale
    )


def test_kernel_matches_csr_oracle():
    grid = Grid3D(10, 8, 12)
    a, _b, _e = assemble_poisson(grid, pin=True, dtype=np.float32)
    op, _b2, _e2 = poisson_stencil(grid, pin=True, dtype=np.float32)

    rng = np.random.default_rng(1)
    x = rng.standard_normal(grid.n).astype(np.float32)
    y_ref = a.mv(x)
    y_pal = star7_mv_pallas(
        op.diag, op.cx, op.cy, op.cz,
        jnp.asarray(x.reshape(grid.shape)), True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_pal).reshape(-1), y_ref, rtol=2e-5, atol=2e-5
    )


def test_backend_dispatch():
    """'auto' stays on XLA off-TPU; 'pallas' raises for unsupported shapes;
    sharded placement forces 'xla'."""
    import dataclasses

    grid = Grid3D(8, 8, 8)
    op, _b, _e = poisson_stencil(grid, dtype=np.float32)
    assert op.backend == "auto"
    assert not op._pallas_eligible(jnp.zeros(grid.shape, jnp.float32))

    bad = dataclasses.replace(op, backend="pallas")
    with pytest.raises(ValueError, match="unsupported"):
        # f64 x is not pallas-eligible
        bad._pallas_eligible(jnp.zeros(grid.shape, jnp.float64))

    from tpusparse.dist import make_mesh, shard_system

    mesh = make_mesh(8)
    op_s, _b_s, _e_s = shard_system(
        op, jnp.zeros(grid.shape, jnp.float32),
        jnp.zeros(grid.shape, jnp.float32), mesh,
    )
    assert op_s.backend == "xla"
