"""Sharded fused fine level (dist/fused_sharded.py) — VERDICT r2 #4.

Gate: the fused-sharded V-cycle equals the plain XLA cycle (same hierarchy)
to rounding, and a sharded CG+GAMG using it matches the single-device fused
solve iteration-for-iteration.  Runs on the 8-device virtual CPU mesh with
interpret-mode kernels (the same kernel code the TPU compiles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.dist.fused_sharded import (
    FusedSharded,
    fused_sharded_supported,
    make_z_mesh,
    vcycle_fused_sharded,
)
from tpusparse.dist.mesh import field_sharding, shard_hierarchy, shard_system
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg


def _setup(n=12, nz=48, n_dev=8):
    grid = Grid3D(n, n, nz)
    op, b, exact = poisson_stencil(grid, dtype=np.float32)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))
    mesh = make_z_mesh(n_dev)
    op_s, b_s, _ = shard_system(op, b, exact, mesh)
    hier_s = shard_hierarchy(hier, mesh)
    fs = FusedSharded.build(op, mesh, interpret=True)
    return op, b, hier, op_s, b_s, hier_s, fs, mesh


def test_supported_predicate():
    op, b, hier, *_ = _setup(8, 16, 2)
    assert fused_sharded_supported(hier)


def test_stacked_layout_roundtrip_and_halo():
    *_, fs, mesh = _setup(8, 16, 4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 8, 8)), jnp.float32)
    x_s = jax.device_put(x, field_sharding(mesh))
    st = fs.to_stacked(x_s)
    assert st.shape[0] == 4 and st.shape[1] == 16 // 4 + 2 * 3
    np.testing.assert_array_equal(np.asarray(fs.from_stacked(st)),
                                  np.asarray(x))
    # halo exchange: shard i's bottom halo == shard i-1's top domain planes
    ex = fs._exchange_all(st)
    exn = np.asarray(ex)
    stn = np.asarray(st)
    F = 3
    nzl = 4
    for i in range(1, 4):
        np.testing.assert_array_equal(
            exn[i, :F], stn[i - 1, F + nzl - F:F + nzl]
        )
    # global faces stay zero
    assert (exn[0, :F] == 0).all() and (exn[3, -F:] == 0).all()


@pytest.mark.slow
def test_sharded_fused_cycle_matches_plain_cycle():
    """vcycle_fused_sharded == plain vcycle on the same (sharded)
    hierarchy, to f32 rounding."""
    op, b, hier, op_s, b_s, hier_s, fs, mesh = _setup(12, 48, 8)

    z_plain = jax.jit(lambda h, r: vcycle(h, r))(hier_s, b_s)
    z_fused = jax.jit(
        lambda f, h, r: vcycle_fused_sharded(f, h, r)
    )(fs, hier_s, b_s)
    zp = np.asarray(z_plain, np.float64)
    zf = np.asarray(z_fused, np.float64)
    scale = np.abs(zp).max()
    assert np.abs(zp - zf).max() < 2e-5 * scale


@pytest.mark.slow
def test_sharded_fused_cg_iteration_parity():
    """CG+GAMG with the fused-sharded preconditioner: same iteration count
    as the plain sharded cycle and as 1-device, same solution."""
    op, b, hier, op_s, b_s, hier_s, fs, mesh = _setup(12, 48, 8)

    res_plain = jax.jit(
        lambda op, h, b: cg(op.mv, b, rtol=1e-6, maxiter=100,
                            m_mv=lambda r: vcycle(h, r))
    )(op_s, hier_s, b_s)
    res_fused = jax.jit(
        lambda op, f, h, b: cg(op.mv, b, rtol=1e-6, maxiter=100,
                               m_mv=lambda r: vcycle_fused_sharded(f, h, r))
    )(op_s, fs, hier_s, b_s)
    assert res_plain.converged() and res_fused.converged()
    assert abs(int(res_plain.iters) - int(res_fused.iters)) <= 1
    np.testing.assert_allclose(
        np.asarray(res_fused.x), np.asarray(res_plain.x),
        rtol=2e-4, atol=1e-5,  # f32 reassociation noise on near-zero cells
    )
    assert len(res_fused.x.sharding.device_set) == 8


@pytest.mark.slow
def test_pinned_origin_only_on_first_shard():
    """The pin lives at global (0,0,0): sharding must reproduce the pinned
    operator's cycle exactly (global-z masking in the kernel)."""
    op, b, hier, op_s, b_s, hier_s, fs, mesh = _setup(8, 16, 4)
    assert op.pinned  # poisson_stencil pins by default
    z1 = np.asarray(jax.jit(lambda h, r: vcycle(h, r))(hier, b), np.float64)
    zs = np.asarray(
        jax.jit(lambda f, h, r: vcycle_fused_sharded(f, h, r))(
            fs, hier_s, b_s
        ),
        np.float64,
    )
    assert np.abs(z1 - zs).max() < 2e-5 * np.abs(z1).max()


def test_indivisible_nz_rejected():
    grid = Grid3D(8, 8, 18)  # 18 % 4 != 0
    op, b, _ = poisson_stencil(grid, dtype=np.float32)
    mesh = make_z_mesh(4)
    with pytest.raises(ValueError, match="divisible"):
        FusedSharded.build(op, mesh, interpret=True)


@pytest.mark.slow
def test_driver_fused_sharded_end_to_end():
    """solve_poisson(layout='padded', n_devices=8): the driver routes the
    sharded solve through the fused kernels (interpret mode on CPU) and
    reproduces the plain sharded result."""
    from tpusparse.bench.driver import solve_poisson

    # rtol 1e-6, NOT 1e-7: the mixed-precision inner iterates in f32, and
    # 1e-7 sits at the f32 attainable floor where the residual decays so
    # slowly that iteration counts become pure reduction-order noise
    # (measured 32 vs 39 on the z- vs (z,y)-mesh for the SAME math; both
    # layouts take 29 at 1e-6 and 40 single-device at 1e-7)
    rep_f = solve_poisson(
        12, 12, 48, rtol=1e-6, layout="padded", n_devices=8
    )
    rep_p = solve_poisson(
        12, 12, 48, rtol=1e-6, layout="plain", n_devices=8
    )
    assert rep_f.reason > 0 and rep_p.reason > 0
    assert abs(rep_f.iters - rep_p.iters) <= 2
    assert abs(rep_f.linf_error - rep_p.linf_error) < 1e-6 + 1e-3 * abs(
        rep_p.linf_error
    )


def test_degree1_config_keeps_plain_sharded_cycle():
    """Review finding: the fused sharded kernels implement the DEGREE-2
    smoother only — a degree-1 config through the multi-device driver must
    route to the plain GSPMD cycle (identical results to layout='plain'),
    not silently apply the degree-2 polynomial."""
    from tpusparse.bench.driver import solve_poisson

    params = AMGParams(degree=1)
    rep_f = solve_poisson(
        12, 12, 24, rtol=1e-7, layout="padded", n_devices=4,
        amg_params=params,
    )
    rep_p = solve_poisson(
        12, 12, 24, rtol=1e-7, layout="plain", n_devices=4,
        amg_params=params,
    )
    assert rep_f.reason > 0 and rep_p.reason > 0
    assert rep_f.iters == rep_p.iters       # identical cycle => identical
    # layout='padded' multi-device uses the z-mesh (different device
    # layout => different reduction order): tiny roundoff drift only
    assert abs(rep_f.linf_error - rep_p.linf_error) < 1e-5
