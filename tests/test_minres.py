"""KSPMINRES parity (solve/minres.py): symmetric indefinite systems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.solve import cg, minres
from tpusparse.solve.cg import ConvergedReason


def _lap1d(n):
    return sp.diags(
        [2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
        [0, -1, 1],
    ).toarray()


def test_minres_spd_matches_cg():
    """On an SPD system minres and cg must find the same solution."""
    a = jnp.asarray(_lap1d(64) + 0.1 * np.eye(64))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(64))
    mv = lambda v: a @ v
    xm = minres(mv, b, rtol=1e-12).x
    xc = cg(mv, b, rtol=1e-12).x
    np.testing.assert_allclose(np.asarray(xm), np.asarray(xc), atol=1e-8)


def test_minres_indefinite():
    """A shifted Laplacian with eigenvalues on both sides of zero — CG's
    assumptions break (pAp can vanish), minres converges."""
    n = 96
    lap = _lap1d(n)
    evals = np.linalg.eigvalsh(lap)
    shift = 0.5 * (evals[3] + evals[4])   # strictly between eigenvalues
    a_np = lap - shift * np.eye(n)
    assert (np.linalg.eigvalsh(a_np) < 0).sum() == 4  # genuinely indefinite
    a = jnp.asarray(a_np)
    rng = np.random.default_rng(1)
    x_ref = rng.standard_normal(n)
    b = jnp.asarray(a_np @ x_ref)

    res = minres(lambda v: a @ v, b, rtol=1e-11, maxiter=500)
    assert int(res.reason) > 0, int(res.reason)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-6)
    # resnorm is the TRUE unpreconditioned residual
    true = np.linalg.norm(b - a_np @ np.asarray(res.x))
    np.testing.assert_allclose(float(res.resnorm), true, rtol=1e-6)


def test_minres_preconditioned_indefinite():
    """SPD preconditioner (|diag|^-1) on an indefinite diagonal-dominant
    system; fewer iterations than unpreconditioned."""
    n = 128
    rng = np.random.default_rng(2)
    d = np.concatenate([np.linspace(1.0, 50.0, n - 5), -np.linspace(2, 9, 5)])
    q = sp.random(n, n, density=0.05, random_state=rng)
    s = 0.1 * (q + q.T).toarray()
    a_np = np.diag(d) + s
    a_np = 0.5 * (a_np + a_np.T)
    x_ref = rng.standard_normal(n)
    b = jnp.asarray(a_np @ x_ref)
    a = jnp.asarray(a_np)
    minv = jnp.asarray(1.0 / np.abs(np.diag(a_np)))

    plain = minres(lambda v: a @ v, b, rtol=1e-10, maxiter=2000)
    pc = minres(
        lambda v: a @ v, b, rtol=1e-10, maxiter=2000,
        m_mv=lambda r: minv * r,
    )
    assert int(plain.reason) > 0 and int(pc.reason) > 0
    np.testing.assert_allclose(np.asarray(pc.x), x_ref, atol=1e-6)
    assert int(pc.iters) < int(plain.iters)


def test_minres_maxiter_and_zero_rhs():
    a = jnp.asarray(_lap1d(32))
    b = jnp.asarray(np.ones(32))
    res = minres(lambda v: a @ v, b, rtol=1e-14, maxiter=2)
    assert int(res.reason) == int(ConvergedReason.DIVERGED_ITS)
    res0 = minres(lambda v: a @ v, jnp.zeros(32), rtol=1e-12, atol=1e-30)
    assert int(res0.reason) > 0 and int(res0.iters) == 0


def test_minres_jit_and_scipy_cross_check():
    """Jitted end-to-end; iteration count within 2x of scipy's minres on
    the same indefinite operator (same algorithm family)."""
    import scipy.sparse.linalg as spla

    n = 80
    lap = _lap1d(n)
    a_np = lap - 0.15 * np.eye(n)
    b_np = np.sin(np.arange(n) * 0.61)
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)

    res = jax.jit(
        lambda b: minres(lambda v: a @ v, b, rtol=1e-9, maxiter=400)
    )(b)
    assert int(res.reason) > 0

    it = 0

    def cb(_):
        nonlocal it
        it += 1

    x_sp, info = spla.minres(a_np, b_np, rtol=1e-9, maxiter=400, callback=cb)
    assert info == 0
    np.testing.assert_allclose(np.asarray(res.x), x_sp, atol=1e-5)
    assert int(res.iters) <= 2 * it + 5


def test_minres_negative_definite_pc_autonegated():
    """M = -(diag inverse) — the sign convention of the reference's
    A = laplacian assembly (diag = -sum of neighbors) makes the natural
    GAMG preconditioner negative definite; minres must auto-negate it
    and converge identically to the +M run."""
    n = 64
    a_np = _lap1d(n) + 0.1 * np.eye(n)
    a = jnp.asarray(a_np)
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    minv = jnp.asarray(1.0 / np.diag(a_np))
    pos = minres(lambda v: a @ v, b, rtol=1e-11, m_mv=lambda r: minv * r)
    neg = minres(lambda v: a @ v, b, rtol=1e-11, m_mv=lambda r: -minv * r)
    assert int(pos.reason) > 0 and int(neg.reason) > 0
    assert int(pos.iters) == int(neg.iters)
    np.testing.assert_allclose(np.asarray(pos.x), np.asarray(neg.x),
                               atol=1e-10)


@pytest.mark.slow
def test_minres_via_driver_gamg():
    """-ksp_type minres through the Poisson driver with the GAMG V-cycle as
    the (SPD) preconditioner — KSP-family integration."""
    from tpusparse.bench.driver import solve_poisson

    rep = solve_poisson(
        24, 24, 24, rtol=1e-8, ksp="minres", precision="f64",
    )
    assert rep.reason > 0
    assert rep.linf_error < 2e-2  # O(h^2) at 24^3 is ~1.1e-2
