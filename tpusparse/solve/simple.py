"""Simple KSP types — Richardson iteration and preonly.

PETSc parity: the reference's config uses these as INNER components
(``-mg_levels_ksp_type richardson``, ``-mg_coarse_ksp_type preonly``), and
PETSc also exposes them as top-level KSP types; so do we.  Both share the
``cg``-style contract (CGResult, converged reasons, jit-compatible).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tpusparse.solve.cg import CGResult, ConvergedReason, _dot


def richardson(
    a_mv: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-50,
    maxiter: int = 10000,
    m_mv: Callable | None = None,
    scale: float = 1.0,
    history: bool = False,
    divtol: float = 1e5,
) -> CGResult:
    """Preconditioned Richardson iteration x += scale * M (b - A x)
    (KSPRICHARDSON with ``-ksp_richardson_scale``).

    Converges for SPD A, M when scale * rho(M A) < 2; with the V-cycle as M
    this is "multigrid as a solver" rather than as a CG preconditioner.
    ``history=True`` additionally returns the ``(maxiter+1,)`` f32 residual
    norm history (KSPMonitor data, as in ``cg``).
    """
    if m_mv is None:
        m_mv = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)

    dt = b.dtype
    bnorm = jnp.sqrt(_dot(b, b)).astype(dt)
    tol = jnp.maximum(jnp.asarray(rtol, dt) * bnorm, jnp.asarray(atol, dt))
    dgate = (
        jnp.asarray(divtol, dt) * bnorm if divtol and divtol > 0
        else jnp.asarray(jnp.inf, dt)
    )
    w = jnp.asarray(scale, dt)

    def classify(rnorm, it):
        return jnp.where(
            ~jnp.isfinite(rnorm),
            jnp.int32(ConvergedReason.DIVERGED_NANORINF),
            jnp.where(
                rnorm <= jnp.asarray(atol, dt),
                jnp.int32(ConvergedReason.CONVERGED_ATOL),
                jnp.where(
                    rnorm <= tol,
                    jnp.int32(ConvergedReason.CONVERGED_RTOL),
                    jnp.where(
                        rnorm >= dgate,
                        jnp.int32(ConvergedReason.DIVERGED_DTOL),
                        jnp.where(
                            it >= maxiter,
                            jnp.int32(ConvergedReason.DIVERGED_ITS),
                            jnp.int32(ConvergedReason.ITERATING),
                        ),
                    ),
                ),
            ),
        )

    def cond(state):
        rnorm, it = state[2], state[3]
        return classify(rnorm, it) == jnp.int32(ConvergedReason.ITERATING)

    def body(state):
        x, r, _rn, it = state[:4]
        x = x + w * m_mv(r)
        r = b - a_mv(x)
        rnorm = jnp.sqrt(_dot(r, r))
        new = (x, r, rnorm, it + 1)
        if history:
            new += (state[4].at[it + 1].set(rnorm.astype(jnp.float32)),)
        return new

    r0 = b - a_mv(x0)
    rnorm0 = jnp.sqrt(_dot(r0, r0))
    state = (x0, r0, rnorm0, jnp.int32(0))
    if history:
        hist0 = jnp.zeros((maxiter + 1,), jnp.float32)
        state += (hist0.at[0].set(rnorm0.astype(jnp.float32)),)
    out = jax.lax.while_loop(cond, body, state)
    x, rnorm, it = out[0], out[2], out[3]
    result = CGResult(
        x=x, iters=it, resnorm=rnorm, reason=classify(rnorm, it), bnorm=bnorm
    )
    if history:
        return result, out[4]
    return result


def preonly(
    a_mv: Callable,
    b: jax.Array,
    x0=None,
    *,
    rtol: float = 0.0,
    atol: float = 0.0,
    maxiter: int = 1,
    m_mv: Callable | None = None,
    history: bool = False,
    divtol: float = 1e5,
) -> CGResult:
    """One preconditioner application, x = M b (KSPPREONLY).

    The rtol/atol/maxiter/divtol parameters exist for interface
    compatibility and are ignored (PETSc's preonly likewise performs no
    convergence test);
    the residual is reported for observability (and as the 2-entry
    ``history`` when requested).
    """
    del x0, rtol, atol, maxiter, divtol
    if m_mv is None:
        m_mv = lambda r: r
    x = m_mv(b)
    r = b - a_mv(x)
    rnorm = jnp.sqrt(_dot(r, r))
    bnorm = jnp.sqrt(_dot(b, b))
    result = CGResult(
        x=x,
        iters=jnp.int32(1),
        resnorm=rnorm,
        reason=jnp.int32(ConvergedReason.CONVERGED_RTOL),
        bnorm=bnorm,
    )
    if history:
        hist = jnp.stack(
            [bnorm.astype(jnp.float32), rnorm.astype(jnp.float32)]
        )
        return result, hist
    return result
