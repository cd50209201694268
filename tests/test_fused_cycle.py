"""vcycle_fused (temporally-blocked fine level) vs the standard vcycle.

The fused cycle must be the same preconditioner up to benign reassociation:
close outputs, identical CG iteration counts (±1) — the parity gate the
reference establishes across its own kernel variants (SURVEY.md section 4,
cross-variant consistency).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.amg.fused_cycle import fused_fine_supported, vcycle_fused
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg
from tpusparse.sparse.padded import PaddedStar, pad_field


def _setup(n=24, smoother="chebyshev", backend="interpret"):
    grid = Grid3D(n, n, n)
    op, b, exact = poisson_stencil(grid, dtype=np.float32)
    pop = PaddedStar.from_star(op, backend=backend)
    hier = gamg_setup(
        pop, AMGParams(coarse_eq_limit=40, smoother=smoother)
    )
    return pop, hier, pad_field(b.astype(jnp.float32))


@pytest.mark.slow
@pytest.mark.parametrize("smoother", ["chebyshev", "richardson"])
@pytest.mark.parametrize("backend", ["interpret", "xla"])
def test_fused_cycle_matches_vcycle(smoother, backend):
    pop, hier, b_p = _setup(smoother=smoother, backend=backend)
    assert fused_fine_supported(hier)
    z_ref = vcycle(hier, b_p)
    z_fused = vcycle_fused(hier, b_p)
    ref = np.asarray(z_ref)
    np.testing.assert_allclose(
        np.asarray(z_fused), ref, rtol=1e-4,
        atol=1e-4 * np.abs(ref).max(),
    )


@pytest.mark.slow
@pytest.mark.parametrize("gamma", [1, 2])
def test_fused_cycle_cg_iteration_parity(gamma):
    pop, hier, b_p = _setup(backend="interpret")
    r_ref = cg(
        pop.mv, b_p, rtol=1e-6, maxiter=100,
        m_mv=lambda r: vcycle(hier, r, gamma=gamma),
    )
    r_fused = cg(
        pop.mv, b_p, rtol=1e-6, maxiter=100,
        m_mv=lambda r: vcycle_fused(hier, r, gamma=gamma),
    )
    assert r_ref.converged() and r_fused.converged()
    assert abs(int(r_ref.iters) - int(r_fused.iters)) <= 1


@pytest.mark.slow
def test_bf16_coarse_coefs_iteration_parity():
    """cast_coarse_coefs halves coarse operator traffic without changing
    convergence (vectors stay f32 — unlike the full-hierarchy bf16 cast)."""
    from tpusparse.amg.hierarchy import cast_coarse_coefs

    pop, hier, b_p = _setup(backend="xla")
    hier_b = cast_coarse_coefs(hier)
    assert hier_b.levels[1].op.coef.dtype == jnp.bfloat16
    assert hier_b.levels[0].op.diag.dtype == jnp.float32
    r1 = cg(pop.mv, b_p, rtol=1e-6, maxiter=100,
            m_mv=lambda r: vcycle(hier, r))
    r2 = cg(pop.mv, b_p, rtol=1e-6, maxiter=100,
            m_mv=lambda r: vcycle(hier_b, r))
    assert r1.converged() and r2.converged()
    assert abs(int(r1.iters) - int(r2.iters)) <= 1


@pytest.mark.slow
def test_unsupported_falls_back():
    """degree != 2 isn't fused — must silently use the standard cycle."""
    grid = Grid3D(18, 18, 18)
    op, b, _ = poisson_stencil(grid, dtype=np.float32)
    pop = PaddedStar.from_star(op, backend="xla")
    hier = gamg_setup(pop, AMGParams(coarse_eq_limit=40, degree=3))
    assert not fused_fine_supported(hier)
    b_p = pad_field(b.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(vcycle_fused(hier, b_p)),
        np.asarray(vcycle(hier, b_p)),
        rtol=0, atol=0,
    )


@pytest.mark.slow
@pytest.mark.parametrize("smoother", ["richardson", "chebyshev"])
def test_fused_cycle_degree1_matches_plain(smoother):
    """The degree-1 composite modes (descent1/ascent1 — the verbatim
    reference config's Richardson(1) shape) must reproduce the plain
    degree-1 V-cycle to f32 rounding."""
    import numpy as np

    from tpusparse.amg import AMGParams, gamg_setup, vcycle
    from tpusparse.amg.fused_cycle import fused_fine_supported, vcycle_fused
    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import poisson_stencil
    from tpusparse.sparse.padded import PaddedStar, pad_field

    grid = Grid3D(12, 12, 12)
    op, b, _ = poisson_stencil(grid, dtype=np.float32)
    op_p = PaddedStar.from_star(op, backend="interpret")
    hier = gamg_setup(
        op_p, AMGParams(coarse_eq_limit=40, smoother=smoother, degree=1)
    )
    assert fused_fine_supported(hier)
    hier_plain = gamg_setup(
        op, AMGParams(coarse_eq_limit=40, smoother=smoother, degree=1)
    )
    b_p = pad_field(b.astype(jnp.float32))
    z_f = np.asarray(vcycle_fused(hier, b_p), np.float64)
    z_p = np.asarray(vcycle(hier_plain, b.astype(jnp.float32)), np.float64)
    from tpusparse.sparse.padded import crop_field

    z_f_c = np.asarray(
        crop_field(jnp.asarray(z_f), grid.shape), np.float64
    )
    scale = np.abs(z_p).max()
    assert np.abs(z_f_c - z_p).max() < 5e-5 * scale


@pytest.mark.slow
@pytest.mark.parametrize("smoother", ["chebyshev", "richardson"])
@pytest.mark.parametrize("backend", ["interpret", "xla"])
def test_fused_cycle_dots(smoother, backend):
    """vcycle_fused_dots returns (z, <b,z>, <b,b>) matching the plain cycle
    + XLA reductions (descent_rr/ascent_rz kernel variants)."""
    from tpusparse.amg.fused_cycle import vcycle_fused_dots

    pop, hier, b_p = _setup(smoother=smoother, backend=backend)
    z_ref = vcycle(hier, b_p)
    z, rz, rr = vcycle_fused_dots(hier, b_p)
    ref = np.asarray(z_ref)
    np.testing.assert_allclose(
        np.asarray(z), ref, rtol=1e-4, atol=1e-4 * np.abs(ref).max()
    )
    flat_b = np.asarray(b_p).reshape(-1)
    np.testing.assert_allclose(
        float(rr), float(flat_b @ flat_b), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(rz), float(flat_b @ np.asarray(z).reshape(-1)), rtol=1e-4
    )


@pytest.mark.slow
def test_cg_m_mv_dots_and_check_every_parity():
    """cg with the fused-dots preconditioner interface and check_every=2
    converges to the same answer in the same-or-one-extra iterations."""
    from tpusparse.amg.fused_cycle import vcycle_fused_dots

    pop, hier, b_p = _setup(backend="interpret")
    r_ref = cg(
        pop.mv, b_p, rtol=1e-6, maxiter=100,
        m_mv=lambda r: vcycle(hier, r),
    )
    r_dots = cg(
        pop.mv, b_p, rtol=1e-6, maxiter=100,
        m_mv_dots=lambda r: vcycle_fused_dots(hier, r),
        check_every=2,
    )
    assert r_ref.converged() and r_dots.converged()
    it_ref, it_dots = int(r_ref.iters), int(r_dots.iters)
    # check_every=2 may overshoot by one; kernel-vs-XLA rounding one more
    assert it_ref <= it_dots <= it_ref + 2
    np.testing.assert_allclose(
        np.asarray(r_dots.x), np.asarray(r_ref.x), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["interpret", "xla"])
def test_full_fusion_cg_parity(backend):
    """The full-fusion CG body (ab_fused = PaddedStar.cgmv, m_fused =
    vcycle_fused_rupdate) vs the standard preconditioned CG: identical
    iteration counts (+-1 rounding) and matching solutions — the same
    cross-variant consistency gate the reference applies to its kernel
    steps (SURVEY.md section 4)."""
    from tpusparse.amg.fused_cycle import (
        cg_fusion_supported,
        vcycle_fused_rupdate,
    )

    pop, hier, b_p = _setup(backend=backend)
    assert cg_fusion_supported(hier)
    r_ref = cg(
        pop.mv, b_p, rtol=1e-6, maxiter=100,
        m_mv=lambda r: vcycle(hier, r),
    )
    r_fused = cg(
        pop.mv, b_p, rtol=1e-6, maxiter=100,
        ab_fused=lambda z, p, x, ap_, be: pop.cgmv(z, p, x, ap_, be),
        m_fused=lambda r, ap, al: vcycle_fused_rupdate(hier, r, ap, al),
    )
    assert r_ref.converged() and r_fused.converged()
    assert abs(int(r_ref.iters) - int(r_fused.iters)) <= 1
    ref = np.asarray(r_ref.x)
    np.testing.assert_allclose(
        np.asarray(r_fused.x), ref, rtol=1e-4,
        atol=1e-4 * np.abs(ref).max() + 1e-6,
    )


@pytest.mark.slow
def test_full_fusion_check_every_2():
    """check_every=2 composes with the fused body (the production lever
    for the dynamic-loop fixed cost)."""
    from tpusparse.amg.fused_cycle import vcycle_fused_rupdate

    pop, hier, b_p = _setup(backend="xla")
    r1 = cg(
        pop.mv, b_p, rtol=1e-6, maxiter=100,
        ab_fused=lambda z, p, x, ap_, be: pop.cgmv(z, p, x, ap_, be),
        m_fused=lambda r, ap, al: vcycle_fused_rupdate(hier, r, ap, al),
    )
    r2 = cg(
        pop.mv, b_p, rtol=1e-6, maxiter=100, check_every=2,
        ab_fused=lambda z, p, x, ap_, be: pop.cgmv(z, p, x, ap_, be),
        m_fused=lambda r, ap, al: vcycle_fused_rupdate(hier, r, ap, al),
    )
    assert r1.converged() and r2.converged()
    # the checked-every-2 solve may overshoot by at most 1 iteration
    assert int(r1.iters) <= int(r2.iters) <= int(r1.iters) + 1
    np.testing.assert_allclose(
        np.asarray(r2.x), np.asarray(r1.x), rtol=1e-4, atol=1e-5
    )


def test_full_fusion_degree1_falls_back():
    """Degree-1 hierarchies have no descentu twin: cg_fusion_supported is
    False and vcycle_fused_rupdate still produces correct results via the
    XLA-update + dot-fused fallback."""
    from tpusparse.amg.fused_cycle import (
        cg_fusion_supported,
        vcycle_fused_rupdate,
    )
    from tpusparse.amg.hierarchy import AMGParams

    grid = Grid3D(16, 16, 16)
    op, b, _ = poisson_stencil(grid, dtype=np.float32)
    pop = PaddedStar.from_star(op, backend="xla")
    hier = gamg_setup(
        pop, AMGParams(coarse_eq_limit=40, smoother="richardson", degree=1)
    )
    assert not cg_fusion_supported(hier)
    b_p = pad_field(b.astype(jnp.float32))
    alpha = jnp.float32(0.3)
    ap = 0.5 * b_p
    z, r_new, rz, rr = vcycle_fused_rupdate(hier, b_p, ap, alpha)
    r_want = b_p - alpha * ap
    np.testing.assert_allclose(
        np.asarray(r_new), np.asarray(r_want), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        float(rr), float(jnp.vdot(r_want.reshape(-1), r_want.reshape(-1))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(rz), float(jnp.vdot(r_want.reshape(-1), z.reshape(-1))),
        rtol=1e-4,
    )
