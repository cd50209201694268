"""Geometry-aware aggregation for the general-matrix (aij) path.

The unstructured V-cycle's FactoredTransfer applies the tentative
prolongator through a fine-sized gather (``e_c[agg]``) and a fine-sized
``segment_sum`` — the two operation classes the deployed v5e libtpu is worst
at (slow always, and gather-in-loop crashes the worker outright at >= ~2M
rows; see ``sparse/dia.py``).  They were measured to dominate the 300^3
general-matrix solve.

This module removes both for the (large, common) class of inputs whose
sparsity pattern reveals a 3-D grid: a banded matrix with offsets
``{dz*(nx*ny) + dy*nx + dx : |dz|,|dy|,|dx| <= r}`` *is* a grid operator in
lexicographic order, whatever its coefficients.  When ``infer_grid3d``
recognizes that shape, aggregation becomes geometric (bz x by x bx index
blocks — the same 3^3 aggregation the structured fast path uses, PETSc
``PCSetCoordinates``-informed GAMG being the precedent for
structure-exploiting aggregation), and the transfer becomes ``GeoTransfer``:
prolongation = 3-D ``repeat`` + crop, restriction = pad + block-``reshape``
sum — pure layout ops, zero gathers, zero scatters, at every level (Galerkin
coarse operators inherit the 3-D lexicographic numbering, so every coarse
level is a pure <=27-band DIA with no ELL remainder).

Inputs that do not look like grids keep the fully general greedy-Vanek
+ FactoredTransfer path (``amg/unstructured.py``).

Reference parity notes: the reference's matrix IS this class
(``DMSetMatType(MATAIJ)`` over a DMDA 7-point star,
/root/reference/src/helper.cpp:31-39,161-246); PETSc solves it through
general-CSR kernels (``src/openacc-step1/MatMult_SeqAIJ.patch:19-30``) with
graph-based GAMG aggregation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def infer_grid3d(
    offsets: tuple[int, ...], n: int, max_reach: int = 3
) -> tuple[int, int, int] | None:
    """Recover (nz, ny, nx) from a banded sparsity pattern, or None.

    Accepts offset sets of the form ``dz*(nx*ny) + dy*nx + dx`` with
    ``|d*| <= max_reach`` over SOME factorization ``n == nx*ny*nz``.  The
    7-point star yields ``{0, +-1, +-nx, +-nx*ny}``; Galerkin coarse
    operators of geometric 3^3 aggregation yield the 27-point version.

    Degenerate/ambiguous patterns (pure tridiagonal, or too few distinct
    positive offsets to pin nx and nx*ny) return None — callers fall back
    to graph aggregation, never guess.
    """
    offs = sorted(set(int(o) for o in offsets))
    if offs != sorted(-o for o in offs):
        return None  # structurally nonsymmetric pattern: not a grid star
    pos = [o for o in offs if o > 0]
    if len(pos) < 2 or pos[0] != 1:
        return None

    def decompose(o, nx, q):
        """o -> (dz, dy, dx) under strides (q, nx, 1), nearest rounding."""
        dz = round(o / q) if q else 0
        rem = o - dz * q
        dy = round(rem / nx)
        dx = rem - dy * nx
        return dz, dy, dx

    def valid(nx, ny, nz):
        q = nx * ny
        for o in pos:
            dz, dy, dx = decompose(o, nx, q if nz > 1 else 0)
            if nz == 1 and abs(o) >= q:
                return False
            if not (abs(dz) <= max_reach and abs(dy) <= max_reach
                    and abs(dx) <= max_reach):
                return False
            # (dz,dy,dx) must address a real neighbor on the grid
            if abs(dy) >= ny or abs(dx) >= nx or abs(dz) >= nz:
                return False
        return True

    def score(nx, ny, nz):
        """Total |dz|+|dy|+|dx| over offsets — the true factorization
        decomposes a grid star with minimal neighbor reach, so ties between
        valid factorizations (possible on tiny grids whose offset clusters
        overlap) resolve toward the real one."""
        q = nx * ny
        return sum(
            sum(map(abs, decompose(o, nx, q if nz > 1 else 0)))
            for o in pos
        )

    # nx candidates: the cluster of offsets just above the x-band (a
    # 27-point pattern has {nx-1, nx, nx+1} — any member might be first)
    big = [o for o in pos if o > max_reach]
    if not big:
        return None
    nx_cands = [o for o in big if o <= big[0] + max_reach and n % o == 0]
    found: list[tuple[int, tuple[int, int, int]]] = []
    for nx in nx_cands:
        # q candidates: cluster just above the xy-plane band
        plane = [o for o in big if o > nx * max_reach + max_reach]
        if not plane:
            ny = n // nx
            if ny >= 1 and valid(nx, ny, 1):
                found.append((score(nx, ny, 1), (1, ny, nx)))
            continue
        q_cands = [
            o for o in plane
            if o <= plane[0] + nx * max_reach + max_reach
            and o % nx == 0 and n % o == 0
        ]
        for q in q_cands:
            ny = q // nx
            nz = n // q
            if ny >= 1 and nz >= 1 and valid(nx, ny, nz):
                found.append((score(nx, ny, nz), (nz, ny, nx)))
    return min(found)[1] if found else None


def geo_block_sizes(shape, factor: int = 3):
    """Per-axis aggregation block size: ``factor``, clamped to the axis."""
    return tuple(min(factor, s) for s in shape)


def coarse_dims(shape, bs):
    return tuple(-(-s // b) for s, b in zip(shape, bs))


def geo_aggregate_ids(shape, bs) -> np.ndarray:
    """Aggregate id of every fine cell under bz x by x bx index blocks,
    3-D lexicographic coarse numbering.  (n,) int64, host-side — used to
    build the tentative prolongator for the Galerkin products."""
    nz, ny, nx = shape
    czs, cys, cxs = coarse_dims(shape, bs)
    z, y, x = np.meshgrid(
        np.arange(nz) // bs[0], np.arange(ny) // bs[1],
        np.arange(nx) // bs[2], indexing="ij",
    )
    return (z * cys * cxs + y * cxs + x).reshape(-1)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["w", "omega"],
    meta_fields=["fine_shape", "bs"],
)
@dataclasses.dataclass
class GeoTransfer:
    """Smoothed-aggregation transfer over geometric index blocks —
    gather/scatter-free twin of ``FactoredTransfer``.

    P = (I - omega D^-1 A) T with T the l2-normalized piecewise-constant
    tentative prolongator over bz x by x bx blocks.  T's action is a 3-D
    ``repeat`` + crop (prolong) / pad + block-``reshape``-sum (restrict);
    the smoothing factor reuses the level operator's gather-free mv.
    Identical math to FactoredTransfer (tested), different data movement.
    """

    w: jax.Array           # (n_fine,) 1/sqrt(|block|) per member
    omega: jax.Array       # prolongator-smoothing damping
    fine_shape: tuple[int, int, int]
    bs: tuple[int, int, int]

    @property
    def coarse_shape(self):
        return coarse_dims(self.fine_shape, self.bs)

    @property
    def n_coarse(self) -> int:
        c = self.coarse_shape
        return c[0] * c[1] * c[2]

    def _up(self, e_c: jax.Array) -> jax.Array:
        """T0 e_c: nearest-neighbor upsample (repeat + crop), flat->flat."""
        nz, ny, nx = self.fine_shape
        e3 = e_c.reshape(self.coarse_shape)
        for ax, b in enumerate(self.bs):
            if b > 1:
                e3 = jnp.repeat(e3, b, axis=ax)
        return e3[:nz, :ny, :nx].reshape(-1)

    def _down(self, v: jax.Array) -> jax.Array:
        """T0^T v: zero-pad to block multiples + block-sum, flat->flat."""
        nz, ny, nx = self.fine_shape
        (bz, by, bx) = self.bs
        czs, cys, cxs = self.coarse_shape
        v3 = v.reshape(nz, ny, nx)
        pad = (czs * bz - nz, cys * by - ny, cxs * bx - nx)
        if any(pad):
            v3 = jnp.pad(v3, [(0, p) for p in pad])
        return (
            v3.reshape(czs, bz, cys, by, cxs, bx)
            .sum(axis=(1, 3, 5))
            .reshape(-1)
        )

    def prolong(self, fine_op, dinv, e_c):
        t = self.w * self._up(e_c)
        return t - self.omega * (dinv * fine_op.mv(t))

    def restrict(self, fine_op, dinv, x):
        s = x - self.omega * fine_op.mv(dinv * x)
        return self._down(self.w * s)
