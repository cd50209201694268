"""-ksp_compute_eigenvalues (solve/spectrum.py): Ritz values of M A from
the CG iteration's Lanczos scalars."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.solve import cg
from tpusparse.solve.spectrum import eigenvalue_block, ritz_values


def _lap1d(n):
    return sp.diags(
        [2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)], [0, -1, 1]
    ).toarray()


def test_ritz_matches_dense_spectrum_extremes():
    """Run CG far enough and the extreme Ritz values converge to the true
    extreme eigenvalues of M A (Lanczos theory — extremes first)."""
    n = 64
    a_np = _lap1d(n) + 0.05 * np.eye(n)
    d = np.diag(a_np)
    a = jnp.asarray(a_np)
    minv = jnp.asarray(1.0 / d)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))

    res, (al, be) = cg(
        lambda v: a @ v, b, rtol=1e-13, maxiter=200,
        m_mv=lambda r: minv * r, spectrum=True,
    )
    assert int(res.reason) > 0
    ritz = ritz_values(np.asarray(al), np.asarray(be), int(res.iters))

    ma = np.diag(1.0 / d) @ a_np
    true = np.sort(np.linalg.eigvals(ma).real)
    np.testing.assert_allclose(ritz[0], true[0], rtol=2e-2)
    np.testing.assert_allclose(ritz[-1], true[-1], rtol=2e-2)
    # interior Ritz values are bracketed by the true spectrum
    assert ritz.min() >= true.min() - 1e-8
    assert ritz.max() <= true.max() + 1e-8

    block = eigenvalue_block(ritz)
    assert "Iteratively computed eigenvalues" in block
    assert "kappa(MA)" in block


def test_spectrum_incompatible_with_history():
    a = jnp.asarray(_lap1d(8))
    b = jnp.ones(8)
    with pytest.raises(ValueError, match="spectrum"):
        cg(lambda v: a @ v, b, spectrum=True, history=True)


def test_ritz_values_guards():
    with pytest.raises(ValueError, match="negative"):
        ritz_values(np.array([1.0, -2.0]), np.array([0.5, 0.5]), 2)
    with pytest.raises(ValueError, match="non-finite"):
        ritz_values(np.array([1.0, np.nan]), np.array([0.5, 0.5]), 2)
    assert ritz_values(np.zeros(0), np.zeros(0), 0).size == 0
    one = ritz_values(np.array([0.5]), np.zeros(1), 1)
    np.testing.assert_allclose(one, [2.0])


@pytest.mark.slow
def test_driver_gamg_eigenvalues():
    """The production question this answers: kappa(M A) of the GAMG
    V-cycle, measured FROM THE SOLVE ITSELF (no dense oracle) — the
    negative-definite pair's CG scalars stay positive and the Ritz values
    land in the V-cycle's known (0, 1] preconditioned spectrum."""
    from tpusparse.bench.driver import solve_poisson

    rep = solve_poisson(
        18, 18, 18, rtol=1e-10, precision="f64",
        compute_eigenvalues=True,
    )
    assert rep.reason > 0
    ev = np.asarray(rep.eigenvalues)
    assert ev.size == rep.iters
    assert 0.0 < ev.min() and ev.max() <= 1.0 + 1e-8
    # the known structure (results/README.md, test_amg_quality.py oracle):
    # an O(1)-conditioned BULK plus ONE small outlier from the null-space
    # pin (CG deflates it in a handful of iterations) — measured here from
    # the production iteration instead of a dense eigensolve
    bulk_kappa = ev.max() / ev[1]
    assert bulk_kappa < 20.0, ev
    assert ev[1] / ev[0] > 5.0  # the pin outlier is well-separated


def test_driver_mixed_warns_and_skips():
    from tpusparse.bench.driver import solve_poisson

    with pytest.warns(UserWarning, match="ksp_compute_eigenvalues"):
        rep = solve_poisson(
            12, 12, 12, rtol=1e-8, precision="mixed",
            compute_eigenvalues=True,
        )
    assert rep.eigenvalues is None


def test_ksp_object_compute_eigenvalues():
    """KSPComputeEigenvalues on the KSP object: works for the MIXED
    production configuration too (probes the f32 pair the inner solves
    actually iterate with)."""
    from tpusparse import KSP
    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import poisson_stencil_device

    op, b, _ = poisson_stencil_device(Grid3D(16, 16, 16))
    ksp = KSP(rtol=1e-8)              # mixed precision, cg+gamg
    ksp.set_operators(op)
    ev = ksp.compute_eigenvalues()
    assert ev.size >= 5
    assert 0.0 < ev.min() and ev.max() <= 1.0 + 1e-5
    # bulk kappa: exclude the pin outlier AND its Lanczos ghost copies
    # (duplicated converged extremes — see solve/spectrum.py docstring)
    bulk = ev[ev > 10.0 * ev.min()]
    assert bulk.size >= 3
    assert bulk.max() / bulk.min() < 20.0


def test_cli_flag(capsys):
    from tpusparse.__main__ import main

    rc = main([
        "-da_grid_x", "12", "-da_grid_y", "12", "-da_grid_z", "12",
        "-ksp_rtol", "1e-9", "-precision", "f64",
        "-ksp_compute_eigenvalues",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Iteratively computed eigenvalues" in out
    assert "kappa(MA)" in out


def test_driver_aij_eigenvalues():
    """Regression (review finding): the aij general executor's uniform-
    precision route must thread spectrum capture — this exact call used to
    crash with 'CGResult is not subscriptable'."""
    from tpusparse.bench.driver import solve_poisson

    rep = solve_poisson(
        14, 14, 14, rtol=1e-8, precision="f64", mat_type="aij",
        structure_detect=False, compute_eigenvalues=True,
    )
    assert rep.reason > 0
    ev = np.asarray(rep.eigenvalues)
    assert ev.size == rep.iters and 0.0 < ev.min()
