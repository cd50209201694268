"""BiCGStab — KSPBCGS parity, jit-native.

PETSc's short-recurrence nonsymmetric workhorse (the usual alternative to
GMRES when storing a restart-length basis is too expensive).  Same contract
as ``cg``: one ``lax.while_loop``, converged-reason API, optional residual
history.  This implementation is RIGHT-preconditioned with convergence on
the true residual — note that PETSc's KSPBCGS default is LEFT
preconditioning with the preconditioned norm; the two agree on the
solution but their residual norms (and hence iteration counts near the
tolerance) can differ.

Breakdown (rho or omega ~ 0) is detected and reported via
``DIVERGED_BREAKDOWN`` (PETSc's KSP_DIVERGED_BREAKDOWN = -5).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tpusparse.solve.cg import CGResult, ConvergedReason, _dot

DIVERGED_BREAKDOWN = -5  # PETSc KSP_DIVERGED_BREAKDOWN


def bicgstab(
    a_mv: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-50,
    maxiter: int = 10000,
    m_mv: Callable | None = None,
    divtol: float = 1e5,
    history: bool = False,
) -> CGResult:
    """Solve A x = b with preconditioned BiCGStab."""
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
    eps = jnp.asarray(jnp.finfo(dt).tiny * 1e4, dt)

    r0 = b - a_mv(x0)
    rnorm0 = jnp.sqrt(_dot(r0, r0)).astype(dt)
    zeros = jnp.zeros_like(b)
    one = jnp.ones((), dt)

    def classify(rnorm, it, broke):
        return jnp.where(
            broke,
            jnp.int32(DIVERGED_BREAKDOWN),
            jnp.where(
                ~jnp.isfinite(rnorm),
                jnp.int32(ConvergedReason.DIVERGED_NANORINF),
                jnp.where(
                    rnorm <= jnp.asarray(atol, dt),
                    jnp.int32(ConvergedReason.CONVERGED_ATOL),
                    jnp.where(
                        rnorm <= tol,
                        jnp.int32(ConvergedReason.CONVERGED_RTOL),
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
        rnorm, it, broke = state[7], state[8], state[9]
        return classify(rnorm, it, broke) == jnp.int32(
            ConvergedReason.ITERATING
        )

    def body(state):
        x, r, p, v, rho, alpha, omega, _rn, it, _broke = state[:10]
        rho_new = _dot(r0, r)
        broke = jnp.abs(rho_new) <= eps
        beta = (rho_new / jnp.where(broke, one, rho)) * (
            alpha / jnp.where(omega == 0, one, omega)
        )
        p = r + beta * (p - omega * v)
        ph = m_mv(p)
        v = a_mv(ph)
        denom = _dot(r0, v)
        broke = broke | (jnp.abs(denom) <= eps)
        alpha = rho_new / jnp.where(broke, one, denom)
        s = r - alpha * v
        sh = m_mv(s)
        t = a_mv(sh)
        tt = _dot(t, t)
        omega = _dot(t, s) / jnp.where(tt == 0, one, tt)
        x_new = x + alpha * ph + omega * sh
        r_new = s - omega * t
        rnorm = jnp.sqrt(_dot(r_new, r_new))
        # breakdown detected mid-body: return the PRE-breakdown state.
        # PETSc's BCGS exits before applying the update; the substituted
        # unit denominators above exist only to keep the arithmetic finite,
        # their alpha/beta must never reach x/r.
        keep = lambda old, new_: jnp.where(broke, old, new_)
        new = (
            keep(x, x_new), keep(r, r_new), keep(state[2], p),
            keep(state[3], v), keep(rho, rho_new),
            keep(state[5], alpha), keep(state[6], omega),
            keep(_rn, rnorm), it + 1, broke,
        )
        if history:
            hist = state[10].at[it + 1].set(rnorm.astype(jnp.float32))
            new += (jnp.where(broke, state[10], hist),)
        return new

    state = (x0, r0, zeros, zeros, one, one, one, rnorm0,
             jnp.int32(0), jnp.bool_(False))
    if history:
        hist0 = jnp.zeros((maxiter + 1,), jnp.float32)
        state += (hist0.at[0].set(rnorm0.astype(jnp.float32)),)
    out = jax.lax.while_loop(cond, body, state)
    x, rnorm, it, broke = out[0], out[7], out[8], out[9]
    result = CGResult(
        x=x, iters=it, resnorm=rnorm,
        reason=classify(rnorm, it, broke), bnorm=bnorm,
    )
    if history:
        return result, out[10]
    return result
