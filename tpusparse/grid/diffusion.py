"""Variable-coefficient diffusion problem — the framework's second problem
family, demonstrating generality beyond the reference's constant-coefficient
Poisson benchmark.

Problem:  -div( kappa(x) grad u ) = f  on [0,1]^3, all-Neumann boundaries
(dropped-entry convention like the Poisson assembly), pinned at cell 0.
Discretized with the standard cell-centered finite-volume 7-point scheme:
the face conductivity between neighboring cells is the harmonic mean of the
cell kappas (flux continuity), so the operator is a 7-point stencil with
POSITION-DEPENDENT off-diagonal coefficients — representable exactly as a
``VarStencil27`` (only the 7 star offsets populated).

This exercises the paths the Poisson benchmark cannot: VarStencil27 as the
FINE level of the AMG hierarchy (probed Galerkin from a variable-coefficient
radius-1 operator), smoother robustness under coefficient jumps, and the
assembler oracle vs scipy.

Sign convention matches the reference's assembly (negative definite:
diag < 0, off-diag > 0) so the same solvers apply unchanged.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from tpusparse.grid.grid3d import Grid3D
from tpusparse.sparse.csr import HostCSR


def default_kappa(grid: Grid3D, contrast: float = 100.0, seed: int = 0):
    """A standard hard test field: smoothly varying background times a
    high-contrast checkerboard of inclusions."""
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(
        grid.cell_centers("z"), grid.cell_centers("y"), grid.cell_centers("x"),
        indexing="ij",
    )
    smooth = np.exp(np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) * 0.5)
    blocks = ((np.floor(3 * x) + np.floor(3 * y) + np.floor(3 * z)) % 2)
    jump = np.where(blocks > 0, contrast, 1.0)
    noise = np.exp(0.1 * rng.standard_normal(grid.shape))
    return smooth * jump * noise


def _face_kappa(kappa: np.ndarray, axis: int) -> np.ndarray:
    """Harmonic-mean conductivity on interior faces along ``axis``."""
    lo = np.take(kappa, range(kappa.shape[axis] - 1), axis=axis)
    hi = np.take(kappa, range(1, kappa.shape[axis]), axis=axis)
    return 2.0 * lo * hi / (lo + hi)


def assemble_diffusion(
    grid: Grid3D,
    kappa: np.ndarray | Callable | None = None,
    pin: bool = True,
    dtype=np.float64,
):
    """Assemble -div(kappa grad .) as (VarStencil27, HostCSR, b) with a
    manufactured RHS.

    Returns ``(op: VarStencil27, a: HostCSR, b: (nz,ny,nx) ndarray)`` — the
    stencil and CSR forms are numerically identical; b is a smooth source
    with zero mean (compatible with the Neumann problem before pinning).
    """
    import jax.numpy as jnp

    from tpusparse.sparse.varstencil import OFFSETS, VarStencil27

    if kappa is None:
        kappa = default_kappa(grid)
    elif callable(kappa):
        kappa = kappa(grid)
    kappa = np.asarray(kappa, dtype)
    if kappa.shape != grid.shape:
        raise ValueError(f"kappa shape {kappa.shape} != grid {grid.shape}")

    nz, ny, nx = grid.shape
    inv_h2 = {
        0: dtype(1.0 / (grid.dz * grid.dz)),
        1: dtype(1.0 / (grid.dy * grid.dy)),
        2: dtype(1.0 / (grid.dx * grid.dx)),
    }

    # coef planes for the 7 star offsets; start with zeros everywhere
    coef = np.zeros((27,) + grid.shape, dtype=dtype)
    center = OFFSETS.index((0, 0, 0))

    for axis, (minus_off, plus_off) in {
        0: ((-1, 0, 0), (1, 0, 0)),
        1: ((0, -1, 0), (0, 1, 0)),
        2: ((0, 0, -1), (0, 0, 1)),
    }.items():
        fk = _face_kappa(kappa, axis) * inv_h2[axis]
        o_plus = OFFSETS.index(plus_off)
        o_minus = OFFSETS.index(minus_off)
        sl_lo = [slice(None)] * 3
        sl_lo[axis] = slice(0, grid.shape[axis] - 1)
        sl_hi = [slice(None)] * 3
        sl_hi[axis] = slice(1, grid.shape[axis])
        # +face coupling for the lower cell, +face for the upper cell
        coef[o_plus][tuple(sl_lo)] = fk
        coef[o_minus][tuple(sl_hi)] = fk
        # Neumann-dropped entries: diagonal absorbs only existing faces
        coef[center][tuple(sl_lo)] -= fk
        coef[center][tuple(sl_hi)] -= fk

    # manufactured zero-mean source (smooth; no closed-form solution —
    # correctness is gated vs a direct sparse solve in tests)
    z, y, x = np.meshgrid(
        grid.cell_centers("z", dtype), grid.cell_centers("y", dtype),
        grid.cell_centers("x", dtype), indexing="ij",
    )
    b = np.cos(2 * np.pi * x) * np.cos(2 * np.pi * y) * np.cos(2 * np.pi * z)
    b = (b - b.mean()).astype(dtype)

    if pin:
        scale = dtype(coef[center].sum() / grid.n)
        # zero row 0 and column 0, set pinned diagonal, fix rhs
        # column part: neighbors of cell 0 lose their entry pointing at it
        for off in ((0, 0, 1), (0, 1, 0), (1, 0, 0)):
            o_to_zero = OFFSETS.index(tuple(-d for d in off))  # reads cell 0
            nb = tuple(off)
            coef[o_to_zero][nb] = 0.0
        # row part
        for o, _off in enumerate(OFFSETS):
            if o != center:
                coef[o][0, 0, 0] = 0.0
        coef[center][0, 0, 0] = scale
        b[0, 0, 0] = 0.0

    op = VarStencil27(coef=jnp.asarray(coef))
    a = op.to_csr()
    return op, a, b
