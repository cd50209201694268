"""Iteratively computed eigenvalues — PETSc ``-ksp_compute_eigenvalues``.

PETSc estimates the preconditioned operator's spectrum from the Krylov
iteration itself (KSPComputeEigenvalues): for CG, the iteration scalars
``alpha_k``/``beta_k`` ARE a Lanczos process in disguise, and the
tridiagonal

    T[j, j]   = 1/alpha_j + beta_{j-1}/alpha_{j-1}   (beta_{-1} = 0)
    T[j, j+1] = sqrt(beta_j) / alpha_j

has Ritz values that converge to eigenvalues of M A (extreme ones first).
That makes this the practical large-scale preconditioner-quality probe:
``kappa(M A) = lmax/lmin`` measured from the PRODUCTION solve at any size,
where a dense eigenanalysis (``tests/test_amg_quality.py``'s oracle) stops
at a few thousand unknowns.

Host-side: the scalars arrive as two tiny ``(maxiter,)`` arrays after the
solve; the tridiagonal eigensolve is O(iters^2) on iters ~ tens.

Finite-precision caveat (shared with PETSc's KSPComputeEigenvalues, which
uses the same iteration scalars): Lanczos without reorthogonalization
duplicates already-converged extreme eigenvalues ("ghosts") once the
iteration runs past their convergence — e.g. the GAMG hierarchy's
null-space-pin outlier can appear twice.  Ghost copies agree to many
digits, so near-duplicates in the output are copies of one true
eigenvalue, not evidence of a cluster.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ritz_values", "eigenvalue_block"]


def ritz_values(alphas, betas, iters: int) -> np.ndarray:
    """Ritz values of M A from ``iters`` CG steps' scalars (ascending).

    Assumes the CG pair was DEFINITE (both A and M positive- or both
    negative-definite — the framework's two supported sign conventions);
    then every alpha and beta is positive and T is a real symmetric
    tridiagonal.  Raises on non-finite/non-positive scalars inside the
    first ``iters`` entries (an indefinite pair — the Lanczos identity
    does not hold there).
    """
    import scipy.linalg as sla

    k = int(iters)
    if k < 1:
        return np.zeros((0,))
    a = np.asarray(alphas, dtype=np.float64)[:k]
    b = np.asarray(betas, dtype=np.float64)[: max(k - 1, 0)]
    if not (np.isfinite(a).all() and np.isfinite(b).all()):
        raise ValueError("non-finite CG scalars: cannot form the Lanczos T")
    if (a <= 0).any() or (b < 0).any():
        raise ValueError(
            "negative CG scalars (indefinite operator/preconditioner "
            "pair): the CG-Lanczos identity does not apply"
        )
    diag = 1.0 / a
    diag[1:] += b[: k - 1] / a[: k - 1]
    off = np.sqrt(b[: k - 1]) / a[: k - 1]
    if k == 1:
        return diag.copy()
    return sla.eigvalsh_tridiagonal(diag, off)


def eigenvalue_block(ritz: np.ndarray) -> str:
    """PETSc's ``-ksp_compute_eigenvalues`` output shape: one
    'Iteratively computed eigenvalues' header then '%g + %gi' lines
    (imaginary parts are identically zero for CG), plus the condition
    estimate the values imply."""
    lines = [f"Iteratively computed eigenvalues: {ritz.size}"]
    lines += [f"{v:g} + 0i" for v in ritz]
    if ritz.size >= 2 and ritz[0] > 0:
        lines.append(
            f"Condition estimate kappa(MA) ~= {ritz[-1] / ritz[0]:.4g} "
            f"(lmin {ritz[0]:.4g}, lmax {ritz[-1]:.4g})"
        )
    return "\n".join(lines)
