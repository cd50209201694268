"""Distributed general sparse matrices (MPIAIJ parity) on the 8-device
virtual mesh: block-row DistDIA mv + fully sharded unstructured CG+GAMG must
match single-device results iteration-for-iteration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import Grid3D
from tpusparse.amg import AMGParams, vcycle
from tpusparse.amg.unstructured import gamg_setup_unstructured
from tpusparse.dist.general import (
    DistDIA,
    make_row_mesh,
    shard_unstructured_hierarchy,
    shard_vector,
)
from tpusparse.grid.poisson import assemble_poisson
from tpusparse.solve import cg
from tpusparse.sparse.dia import DIA


def _system(n=16):
    a, b, exact = assemble_poisson(Grid3D(n, n, n))
    return a, jnp.asarray(b), jnp.asarray(exact)


@pytest.mark.parametrize("p", [2, 4, 8])
def test_dist_dia_mv_matches_single(p):
    a, b, _ = _system(8)
    d = DIA.from_csr(a)
    mesh = make_row_mesh(p)
    dd = DistDIA.shard(d, mesh)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(a.n_rows))
    y1 = np.asarray(d.mv(x))
    y2 = np.asarray(jax.jit(lambda m, v: m.mv(v))(dd, shard_vector(x, mesh)))
    np.testing.assert_allclose(y2, y1, rtol=1e-12, atol=1e-12)


def test_dist_dia_single_device_mesh():
    """p=1 mesh: the no-neighbor path (zero halos) must equal plain DIA."""
    a, b, _ = _system(8)
    d = DIA.from_csr(a)
    dd = DistDIA.shard(d, make_row_mesh(1))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(a.n_rows))
    np.testing.assert_allclose(
        np.asarray(dd.mv(x)), np.asarray(d.mv(x)), rtol=1e-12, atol=1e-12
    )


def test_dist_dia_rejects_bad_partition():
    a, _, _ = _system(8)   # 512 rows
    d = DIA.from_csr(a)
    mesh = make_row_mesh(8)  # 64 rows/shard < max offset 64? offsets +-64
    # max |offset| = 64 == rows/shard: OK;  3 shards does not divide
    with pytest.raises(ValueError, match="divisible"):
        DistDIA.shard(d, make_row_mesh(3))


def test_sharded_gmres_nonsymmetric():
    """GMRES over a block-row-sharded nonsymmetric DistDIA (the full
    MPIAIJ-parity story: nonsymmetric general matrices, distributed)."""
    import scipy.sparse as sp

    from tpusparse import HostCSR
    from tpusparse.solve.gmres import gmres

    n1 = 8
    lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n1, n1))
    up1 = sp.diags([-1.0, 1.0], [-1, 0], shape=(n1, n1)) * 0.4
    eye = sp.identity(n1)
    a1 = lap1 + up1
    s = (
        sp.kron(sp.kron(a1, eye), eye)
        + sp.kron(sp.kron(eye, a1), eye)
        + sp.kron(sp.kron(eye, eye), a1)
    ).tocsr()
    d = DIA.from_csr(HostCSR.from_scipy(s))
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(s.shape[0])
    b = jnp.asarray(s @ x_true)

    r1 = gmres(d.mv, b, rtol=1e-10, maxiter=1000, restart=30)
    mesh = make_row_mesh(8)
    dd = DistDIA.shard(d, mesh)
    b_s = shard_vector(b, mesh)
    r8 = jax.jit(
        lambda op, b: gmres(op.mv, b, rtol=1e-10, maxiter=1000, restart=30)
    )(dd, b_s)
    assert r1.converged() and r8.converged()
    assert int(r8.iters) == int(r1.iters)
    np.testing.assert_allclose(np.asarray(r8.x), x_true, rtol=1e-6,
                               atol=1e-7)


@pytest.mark.slow
def test_sharded_unstructured_cg_gamg_iteration_parity():
    """The VERDICT item-3 gate: sharded general-matrix CG+GAMG matches the
    single-device solve iteration-for-iteration."""
    a, b, exact = _system(16)
    # auto: DIA for the (banded) fine operator, ELL fallback for the
    # wider-stencil coarse levels (small, below the gather-crash cap, and
    # replicated anyway)
    hier = gamg_setup_unstructured(
        a, AMGParams(coarse_eq_limit=64),
        device_format="auto", transfer_format="factored",
    )
    res1 = cg(hier.levels[0].op.mv, b, rtol=1e-8, maxiter=300,
              m_mv=lambda r: vcycle(hier, r))
    assert res1.converged()

    mesh = make_row_mesh(8)
    hier_s = shard_unstructured_hierarchy(hier, mesh)
    b_s = shard_vector(b, mesh)

    def solve(h, b):
        return cg(h.levels[0].op.mv, b, rtol=1e-8, maxiter=300,
                  m_mv=lambda r: vcycle(h, r))

    res8 = jax.jit(solve)(hier_s, b_s)
    assert res8.converged()
    assert int(res8.iters) == int(res1.iters)
    np.testing.assert_allclose(
        np.asarray(res8.x), np.asarray(res1.x), rtol=1e-8, atol=1e-10
    )
    # manufactured-solution gate (Linf ~ O(h^2)), like the reference driver
    linf = float(jnp.max(jnp.abs(res8.x - exact)))
    assert linf < 5e-2


def test_dist_dia_bands_span_multiple_shards():
    """VERDICT r2 #5 gate: a matrix whose bands reach ACROSS two shards
    (reach > rows/shard) — the multi-hop window exchange must reproduce
    the single-device mv exactly."""
    import scipy.sparse as sp

    from tpusparse import HostCSR

    n = 8 * 64  # 64 rows/shard on the 8-device mesh
    rng = np.random.default_rng(5)
    # bands at +-150: nearly 3 shards away
    m = (
        sp.diags(
            [rng.standard_normal(n - 150), rng.standard_normal(n),
             rng.standard_normal(n - 150), rng.standard_normal(n - 1),
             rng.standard_normal(n - 1)],
            [-150, 0, 150, 1, -1],
        )
    ).tocsr()
    d = DIA.from_csr(HostCSR.from_scipy(m))
    mesh = make_row_mesh(8)
    dd = DistDIA.shard(d, mesh)
    assert dd.halo > n // 8  # genuinely multi-hop
    x = jnp.asarray(rng.standard_normal(n))
    x_s = shard_vector(x, mesh)
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda a, v: a.mv(v))(dd, x_s)),
        m @ np.asarray(x), rtol=1e-10, atol=1e-10,
    )


def test_dist_hybrid_dia_matches_host():
    """DistHybridDIA: band window exchange + GSPMD remainder gather."""
    import scipy.sparse as sp

    from tpusparse import HostCSR

    from tpusparse.dist.general import DistHybridDIA, _shard_ell_rows
    from tpusparse.sparse.dia import HybridDIA

    n = 8 * 48
    rng = np.random.default_rng(6)
    s = sp.random(n, n, density=0.02, random_state=7, format="csr")
    s = (s + s.T + 10 * sp.identity(n)).tocsr()
    h = HybridDIA.from_csr(HostCSR.from_scipy(s), max_bands=8)
    assert h.rem is not None
    mesh = make_row_mesh(8)
    rows = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("rows")
    )
    dh = DistHybridDIA(
        dia=DistDIA.shard(h.dia, mesh), rem=_shard_ell_rows(h.rem, rows)
    )
    x = jnp.asarray(rng.standard_normal(n))
    x_s = shard_vector(x, mesh)
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda a, v: a.mv(v))(dh, x_s)),
        s @ np.asarray(x), rtol=1e-9, atol=1e-9,
    )


@pytest.mark.slow
def test_all_levels_sharded_hierarchy_parity():
    """Every level above the replication threshold block-row-sharded
    (DistDIA/DistHybridDIA), transfers sharded — iteration-for-iteration
    parity with the single-device solve (VERDICT r2 #5)."""
    a, b, exact = _system(24)
    hier = gamg_setup_unstructured(
        a, AMGParams(coarse_eq_limit=64), device_format="auto",
    )
    res1 = cg(hier.levels[0].op.mv, b, rtol=1e-8, maxiter=300,
              m_mv=lambda r: vcycle(hier, r))
    assert res1.converged()

    mesh = make_row_mesh(8)
    # tiny threshold: force EVERY divisible level to shard
    hier_s = shard_unstructured_hierarchy(hier, mesh, min_shard_rows=1)
    from tpusparse.dist.general import DistDIA as _DD, DistHybridDIA as _DH

    n_sharded = sum(
        isinstance(lev.op, (_DD, _DH)) for lev in hier_s.levels
    )
    assert n_sharded >= 2, [type(l.op).__name__ for l in hier_s.levels]
    b_s = shard_vector(b, mesh)

    def solve(h, b):
        return cg(h.levels[0].op.mv, b, rtol=1e-8, maxiter=300,
                  m_mv=lambda r: vcycle(h, r))

    res8 = jax.jit(solve)(hier_s, b_s)
    assert res8.converged()
    assert int(res8.iters) == int(res1.iters)
    np.testing.assert_allclose(
        np.asarray(res8.x), np.asarray(res1.x), rtol=1e-8, atol=1e-10
    )
