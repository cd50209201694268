"""Seam-local sharded transfer (dist/seam.ShardedTransfer): numeric parity
with the single-device StructuredTransfer, and the HLO-level guarantee that
the restrict seam is one coarse-sized psum (prolong: no collective at all).

Round-4 HLO audit context: GSPMD's default lowering of the replicated-coarse
restriction moved ~n/3 bytes (all-reduce of the z-coarsened partial +
all-gather); the shard_map form moves 2*(p-1)/p * n/27 (one coarse psum).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.dist import make_mesh, shard_hierarchy, shard_system
from tpusparse.dist.seam import ShardedTransfer
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.utils.hlostats import compiled_collectives

NX, NY, NZ = 16, 16, 24


@pytest.fixture(scope="module")
def sharded():
    grid = Grid3D(NX, NY, NZ)
    op, b, exact = poisson_stencil(grid, dtype=np.float32)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))
    mesh = make_mesh(8)
    op_s, b_s, _ = shard_system(op, b, exact, mesh)
    hier_s = shard_hierarchy(hier, mesh)
    return mesh, op, hier, b, op_s, hier_s, b_s


def test_level0_transfer_is_seam_wrapped(sharded):
    _mesh, _op, _hier, _b, _op_s, hier_s, _b_s = sharded
    assert isinstance(hier_s.levels[0].transfer, ShardedTransfer)
    # coarse levels stay plain (replicated — nothing to localize)
    for lev in hier_s.levels[1:]:
        if lev.transfer is not None:
            assert not isinstance(lev.transfer, ShardedTransfer)


def test_tT_and_t_apply_match_unsharded(sharded):
    _mesh, _op, hier, b, _op_s, hier_s, b_s = sharded
    tr, tr_s = hier.levels[0].transfer, hier_s.levels[0].transfer
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.standard_normal(b.shape), jnp.float32)
    r_s = jax.device_put(r, b_s.sharding)

    c_ref = tr.tT_apply(r)
    c_got = tr_s.tT_apply(r_s)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref),
                               rtol=2e-6, atol=2e-6)

    e = jnp.asarray(rng.standard_normal(tr.c_shape), jnp.float32)
    f_ref = tr.t_apply(e)
    f_got = tr_s.t_apply(e)
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_ref),
                               rtol=2e-6, atol=2e-6)


def test_vcycle_matches_unsharded(sharded):
    _mesh, _op, hier, b, _op_s, hier_s, b_s = sharded
    z_ref = np.asarray(vcycle(hier, b))
    z_got = np.asarray(jax.jit(lambda h, r: vcycle(h, r))(hier_s, b_s))
    np.testing.assert_allclose(z_got, z_ref, rtol=3e-5, atol=3e-5)


def test_restrict_seam_is_one_coarse_psum(sharded):
    """The compiled restrict's only collectives: the fine-operator halo
    exchange (collective-permute) + ONE all-reduce of the coarse field."""
    _mesh, _op, _hier, _b, _op_s, hier_s, b_s = sharded
    lev0 = hier_s.levels[0]
    s = compiled_collectives(
        lambda l, r: l.transfer.restrict(l.op, l.dinv, r), lev0, b_s
    )
    itemsize = 4
    c_shape = hier_s.levels[0].transfer.c_shape
    coarse_bytes = int(np.prod(c_shape)) * itemsize
    ar = s.get("all-reduce", {"bytes": 0, "count": 0})
    assert ar["count"] == 1, s
    assert ar["bytes"] == coarse_bytes, (s, coarse_bytes)
    assert "all-gather" not in s, s


def test_prolong_has_no_seam_collective(sharded):
    """Prolongation from the replicated coarse field is communication-free
    apart from the fine-operator halo exchange."""
    _mesh, _op, _hier, _b, _op_s, hier_s, b_s = sharded
    lev0 = hier_s.levels[0]
    e = jnp.ones(lev0.transfer.c_shape, jnp.float32)
    s = compiled_collectives(
        lambda l, e: l.transfer.prolong(l.op, l.dinv, e), lev0, e
    )
    assert "all-reduce" not in s, s
    assert "all-gather" not in s, s
