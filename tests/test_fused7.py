"""Fused stencil-kernel family (kernels/fused7.py) vs the XLA reference
formulations, under the Pallas interpreter (CPU).

Shapes are chosen to exercise every pipeline path: grid=2 (peel only),
grid=4 (peel + pair loop, even drain), grid=5 (peel + loop + odd tail).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.kernels.fused7 import MODES, fused7_call, fused7_xla
from tpusparse.sparse.padded import PaddedStar, pad_field


def _padded_system(shape):
    # ``shape`` is the (nz, ny, nx) field shape; Grid3D takes (nx, ny, nz)
    grid = Grid3D(shape[2], shape[1], shape[0])
    op, b, _ = poisson_stencil(grid, dtype=np.float32)
    pop = PaddedStar.from_star(op, backend="interpret")
    key = jax.random.PRNGKey(7)
    kx, kd = jax.random.split(key)
    x = pad_field(jax.random.normal(kx, shape, jnp.float32))
    d = pad_field(jax.random.normal(kd, shape, jnp.float32))
    b_p = pad_field(b.astype(jnp.float32))
    return pop, x, b_p, d


G = jnp.float32(0.731)
AD = jnp.float32(0.377)
S0 = jnp.float32(1.618)
GW = jnp.float32(0.243)
G2 = jnp.float32(0.519)


@pytest.mark.slow
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("shape", [(12, 12, 12), (40, 11, 13)])
def test_fused_matches_xla_reference(mode, shape):
    pop, x, b_p, d = _padded_system(shape)
    got = fused7_call(
        mode, pop.diag, pop.cx, pop.cy, pop.cz, x, b_p, d, G, AD, S0,
        shape=shape, pinned=pop.pinned, interpret=True, gw=GW, g2=G2,
    )
    want = fused7_xla(mode, pop, x, b_p, d, G, AD, S0, gw=GW, g2=G2)
    got = got if isinstance(got, tuple) else (got,)
    want = want if isinstance(want, tuple) else (want,)
    assert len(got) == len(want)
    for g_, w_ in zip(got, want):
        if mode == "mv":
            # identical formulation and op order: bit-exact
            np.testing.assert_array_equal(np.asarray(g_), np.asarray(w_))
        else:
            # epilogue modes: the compiler may contract b - diag*x into an
            # FMA inside the fused kernel (1 ulp at the pinned origin), and
            # the transfer-smoothing modes use the exact diag-term identity
            # where the reference rounds diag*(dinv*x).  atol scales with
            # the output magnitude: cgmv's ap output carries the raw
            # diag-scaled operator range (~1e6 here), where a fixed 1e-3
            # is below f32 roundoff.
            w_np = np.asarray(w_)
            scale = float(np.max(np.abs(w_np))) if w_np.size else 1.0
            np.testing.assert_allclose(
                np.asarray(g_), w_np, rtol=1e-5,
                atol=max(1e-3, 1e-6 * scale),
            )


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["cheb", "descent", "ascent"])
@pytest.mark.parametrize("shape", [(32, 12, 12), (30, 9, 10)])
def test_fused_grid_paths(mode, shape):
    """grid variants (even with loop / odd tail) of the pipeline."""
    pop, x, b_p, d = _padded_system(shape)
    got = fused7_call(
        mode, pop.diag, pop.cx, pop.cy, pop.cz, x, b_p, d, G, AD, S0,
        shape=shape, pinned=True, interpret=True, gw=GW, g2=G2,
    )
    want = fused7_xla(mode, pop, x, b_p, d, G, AD, S0, gw=GW, g2=G2)
    got = got if isinstance(got, tuple) else (got,)
    want = want if isinstance(want, tuple) else (want,)
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w_), rtol=1e-5, atol=1e-3
        )


@pytest.mark.slow
def test_mvdot_mode():
    """mvdot: y = A x plus the fused <x, A x> partial-sum output."""
    shape = (24, 11, 13)
    pop, x, b_p, d = _padded_system(shape)
    y, pap = fused7_call(
        "mvdot", pop.diag, pop.cx, pop.cy, pop.cz, x, b_p, d, G, AD, S0,
        shape=shape, pinned=True, interpret=True,
    )
    want_y = pop.mv(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=1e-6, atol=1e-4)
    want = float(jnp.vdot(x.reshape(-1), want_y.reshape(-1)))
    assert abs(float(pap) - want) <= 1e-5 * abs(want)


@pytest.mark.slow
def test_cg_with_mv_dot_matches_plain():
    shape = (24, 12, 12)
    pop, x, b_p, d = _padded_system(shape)
    from tpusparse.solve import cg

    r1 = cg(pop.mv, b_p, rtol=1e-6, maxiter=500)
    r2 = cg(pop.mv, b_p, rtol=1e-6, maxiter=500, a_mv_dot=pop.mv_dot)
    assert r1.converged() and r2.converged()
    assert abs(int(r1.iters) - int(r2.iters)) <= 1


def test_tz_candidate_ladder():
    """Host-side slab-depth ladder: model pick first, then the
    empirically-safe row region, descending, divisors only."""
    from tpusparse.kernels.fused7 import _tz_candidates, _pick_tz_mode

    cands = _tz_candidates(300, 300, 300, "descent")
    assert cands[0] == _pick_tz_mode(300, 300, 300, "descent")
    assert all(300 % t == 0 and 300 // t >= 2 for t in cands)
    assert len(set(cands)) == len(cands)
    # ascent's soft row cap is tighter than descent's
    ca = _tz_candidates(300, 300, 300, "ascent")
    assert all(300 % t == 0 for t in ca)


@pytest.mark.parametrize("mode", ["pre2", "descent"])
def test_pad_invariant_preserved(mode):
    """Outputs must carry zero pads (the padded-layout invariant)."""
    from tpusparse.kernels.stencil7 import FACE

    shape = (12, 11, 13)
    pop, x, b_p, d = _padded_system(shape)
    outs = fused7_call(
        mode, pop.diag, pop.cx, pop.cy, pop.cz, x, b_p, d, G, AD, S0,
        shape=shape, pinned=True, interpret=True, gw=GW, g2=G2,
    )
    nz, ny, nx = shape
    for out in outs:
        a = np.asarray(out)
        assert np.all(a[:FACE] == 0) and np.all(a[nz + FACE:] == 0)
        assert np.all(a[:, ny:, :] == 0) and np.all(a[:, :, nx:] == 0)
