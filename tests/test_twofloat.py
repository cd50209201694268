"""Two-float (double-single) arithmetic vs real f64 (CPU has native f64,
so the oracle here is exact IEEE double)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
import pytest

from tpusparse.utils.twofloat import (
    DF64,
    df_add,
    df_add_f32,
    df_mul,
    df_norm2,
)


def _rand64(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape) * scale
    )


def test_roundtrip_precision():
    x = _rand64((1000,), 0)
    df = DF64.from_f64(x)
    err = float(jnp.max(jnp.abs(df.to_f64() - x) / jnp.abs(x)))
    assert err < 3e-15  # 48-bit mantissa representation


def test_add_mul_precision():
    a64, b64 = _rand64((4096,), 1), _rand64((4096,), 2)
    a, b = DF64.from_f64(a64), DF64.from_f64(b64)
    s = df_add(a, b).to_f64()
    p = df_mul(a, b).to_f64()
    # near-cancellation sums have large RELATIVE error vs tiny results;
    # the absolute bound is what matters downstream
    np.testing.assert_allclose(np.asarray(s), np.asarray(a64 + b64),
                               rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(np.asarray(p), np.asarray(a64 * b64),
                               rtol=1e-13, atol=1e-14)


def test_accumulation_beats_f32():
    """Summing many small corrections: DF64 keeps ~1e-14, f32 loses at 1e-7."""
    x64 = jnp.zeros(64, dtype=jnp.float64)
    x = DF64.from_f32(jnp.zeros(64, jnp.float32))
    x32 = jnp.zeros(64, jnp.float32)
    rng = np.random.default_rng(3)
    for i in range(50):
        c = jnp.asarray(rng.standard_normal(64).astype(np.float32)) * (0.5 ** i)
        x64 = x64 + c.astype(jnp.float64)
        x = df_add_f32(x, c)
        x32 = x32 + c
    err_df = float(jnp.max(jnp.abs(x.to_f64() - x64)))
    err_32 = float(jnp.max(jnp.abs(x32.astype(jnp.float64) - x64)))
    assert err_df < 1e-13
    assert err_df < err_32 / 10 or err_32 < 1e-13


@pytest.mark.slow
def test_stencil_df_matches_f64():
    """StarStencilDF apply == f64 apply to ~1e-13 relative."""
    grid = Grid3D(14, 12, 10)
    op, b, _ = poisson_stencil(grid)  # f64
    op_df = op.to_df()
    x64 = _rand64(grid.shape, 4)
    y64 = op.mv(x64)
    y_df = op_df.mv(DF64.from_f64(x64)).to_f64()
    scale = float(jnp.max(jnp.abs(y64)))
    np.testing.assert_allclose(
        np.asarray(y_df), np.asarray(y64), rtol=1e-12, atol=1e-13 * scale
    )


def test_norm2():
    x64 = _rand64((5000,), 5, scale=1e-6)
    n_ref = float(jnp.sqrt(jnp.vdot(x64, x64)))
    n_df = float(df_norm2(DF64.from_f64(x64)))
    assert abs(n_df - n_ref) / n_ref < 1e-5  # convergence-gate accuracy


@pytest.mark.slow
def test_cg_refined_tf_poisson():
    """Full two-float defect correction reaches deep tolerances on CPU."""
    from tpusparse.amg import AMGParams, gamg_setup, vcycle
    from tpusparse.solve.refine import cg_refined_tf

    grid = Grid3D(20, 20, 20)
    op, b, exact = poisson_stencil(grid)            # f64
    op32, _b32, _ = poisson_stencil(grid, dtype=np.float32)
    hier = gamg_setup(op32, AMGParams(coarse_eq_limit=64))

    res = jax.jit(
        lambda op_df, op32, hier, b: cg_refined_tf(
            op_df, op32.mv, b, rtol=1e-12,
            m_lo_mv=lambda r: vcycle(hier, r),
        )
    )(op.to_df(), op32, hier, b)
    assert res.converged(), int(res.reason)
    # true f64 residual check
    r = b - op.mv(res.x)
    rel = float(jnp.sqrt(jnp.vdot(r, r)) / jnp.sqrt(jnp.vdot(b, b)))
    assert rel < 5e-12, rel
    linf = float(jnp.max(jnp.abs(res.x - exact)))
    assert linf < 3e-2  # discretization error at 20^3
