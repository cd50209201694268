"""lift_pallas_levels: the Pallas-banded hierarchy must be numerically
interchangeable with the plain-DIA one (same V-cycle output, same solve),
exercised under the Pallas interpreter on the CPU suite."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpusparse.amg.hierarchy import AMGParams, vcycle
from tpusparse.amg.unstructured import (
    gamg_setup_unstructured,
    lift_pallas_levels,
)
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import assemble_poisson
from tpusparse.sparse.dia import DIA, HybridDIA, PallasDIA
import pytest


def _interpret_lift(hier):
    return lift_pallas_levels(hier, interpret=True)


def test_lifted_vcycle_matches_plain():
    grid = Grid3D(12, 12, 12)
    a, b, _e = assemble_poisson(grid, dtype=np.float32)
    hier = gamg_setup_unstructured(a, AMGParams(), dtype=np.float32)
    lifted = _interpret_lift(hier)
    # at least the fine level must have been lifted
    assert any(
        isinstance(lev.op, PallasDIA)
        or (isinstance(lev.op, HybridDIA)
            and isinstance(lev.op.dia, PallasDIA))
        for lev in lifted.levels
    )
    r = jnp.asarray(b.astype(np.float32))
    y0 = np.asarray(vcycle(hier, r))
    y1 = np.asarray(vcycle(lifted, r))
    scale = np.abs(y0).max() + 1e-30
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5 * scale)


def test_lift_passes_through_ineligible():
    """f64 hierarchies are untouched (kernel is f32-only)."""
    grid = Grid3D(8, 8, 8)
    a, _b, _e = assemble_poisson(grid, dtype=np.float64)
    hier = gamg_setup_unstructured(a, AMGParams(), dtype=np.float64)
    lifted = _interpret_lift(hier)
    assert lifted is hier  # no change -> same object


@pytest.mark.slow
def test_lifted_solve_converges():
    """Full CG + lifted-GAMG solve reaches the same iterate count."""
    from tpusparse.solve.cg import cg

    grid = Grid3D(10, 10, 10)
    a, b, _e = assemble_poisson(grid, dtype=np.float32)
    hier = gamg_setup_unstructured(a, AMGParams(), dtype=np.float32)
    lifted = _interpret_lift(hier)
    bb = jnp.asarray(b.astype(np.float32))

    def solve(h):
        op = h.levels[0].op
        return cg(
            op.mv, bb, rtol=1e-6, atol=0.0,
            m_mv=lambda r: vcycle(h, r),
        )

    r0 = solve(hier)
    r1 = solve(lifted)
    assert int(r1.reason) > 0
    assert int(r1.iters) == int(r0.iters)
    np.testing.assert_allclose(
        np.asarray(r1.x), np.asarray(r0.x), rtol=1e-4, atol=1e-4
    )


def test_lift_preserves_hybrid_remainder():
    """HybridDIA levels keep their ELL remainder; only the bands lift."""
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n = 4000
    # banded core + a sprinkle of off-band entries -> HybridDIA
    diags = [rng.standard_normal(n) + 10.0, rng.standard_normal(n - 1),
             rng.standard_normal(n - 1)]
    a = sp.diags(diags, [0, 1, -1], format="lil")
    for _ in range(60):
        i, j = rng.integers(0, n, 2)
        a[i, j] = a[j, i] = 0.5
    h = HybridDIA.from_csr(a.tocsr().astype(np.float32), max_bands=3)
    assert h.rem is not None
    hier_like = dataclasses.replace  # noqa: F841 (doc: replace used below)
    lifted = PallasDIA.from_dia(h.dia, interpret=True)
    h2 = dataclasses.replace(h, dia=lifted)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(h2.mv(x)), np.asarray(h.mv(x)), rtol=1e-5, atol=1e-4
    )
