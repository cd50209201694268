"""Unstructured smoothed-aggregation AMG — the general-matrix GAMG path.

The structured hierarchy (``hierarchy.py``) covers the reference benchmark's
actual use (DMDA grids).  This module provides what PETSc GAMG provides for
*arbitrary* symmetric matrices (``-pc_type gamg -pc_gamg_type agg``): a
strength-of-connection graph, greedy Vanek aggregation, a smoothed tentative
prolongator, and Galerkin coarse operators — with setup on the host (it runs
once, like KSPSetUp) and the V-cycle apply fully on device over padded-ELL
operators and explicit ELL transfer matrices.

The apply path reuses ``hierarchy.vcycle`` unchanged: levels are the same
``Level`` pytree, with an ``ELLTransfer`` standing in for the matrix-free
structured transfer (duck-typed ``prolong``/``restrict``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.amg.hierarchy import AMGParams, Hierarchy, Level
from tpusparse.sparse.csr import HostCSR
from tpusparse.sparse.ell import ELL


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["p", "r"],
    meta_fields=[],
)
@dataclasses.dataclass
class ELLTransfer:
    """Explicit prolongator/restrictor pair (R = P^T, materialized once at
    setup so the apply path never pays a scatter)."""

    p: ELL  # (n_fine, n_coarse)
    r: ELL  # (n_coarse, n_fine)

    def prolong(self, fine_op, dinv, e_c):
        return self.p.mv(e_c)

    def restrict(self, fine_op, dinv, x):
        return self.r.mv(x)


def strength_graph(a: HostCSR, threshold: float) -> "np.ndarray":
    """Boolean strong-connection mask over a's entries.

    GAMG semantics (``-pc_gamg_threshold``): keep entry (i, j != i) when
    |a_ij| > threshold * sqrt(|a_ii| * |a_jj|); threshold 0.0 (the reference
    config) keeps every structural connection.
    """
    rows = np.repeat(np.arange(a.n_rows), a.row_nnz())
    cols = a.indices
    off = rows != cols
    if threshold <= 0.0:
        return off
    d = np.abs(a.diagonal())
    lim = threshold * np.sqrt(d[rows] * d[cols])
    return off & (np.abs(a.data) > lim)


def greedy_aggregate(a: HostCSR, threshold: float = 0.0) -> np.ndarray:
    """Vanek-style greedy aggregation (the algorithm family behind GAMG's
    'agg' type).  Returns the aggregate id of every node.

    Pass 1: any node whose strong neighborhood is fully unaggregated roots a
    new aggregate containing the whole neighborhood.  Pass 2: remaining nodes
    join the aggregate of any strong neighbor.  Pass 3: leftovers root their
    own aggregates from whatever unaggregated neighbors remain.

    Dispatches to the native C++ engine when built (same decisions — tested
    against ``_greedy_aggregate_py``); Python loops otherwise.
    """
    from tpusparse import native

    strong = strength_graph(a, threshold)
    if native.available():
        agg, _ = native.aggregate(a, strong)
        return agg
    return _greedy_aggregate_py(a, strong)


def _greedy_aggregate_py(a: HostCSR, strong: np.ndarray) -> np.ndarray:
    """Pure-Python reference implementation (and no-toolchain fallback)."""
    n = a.n_rows
    indptr, indices = a.indptr, a.indices
    agg = np.full(n, -1, dtype=np.int64)
    n_agg = 0

    def nbrs(i):
        sl = slice(indptr[i], indptr[i + 1])
        return indices[sl][strong[sl]]

    # pass 1
    for i in range(n):
        if agg[i] != -1:
            continue
        nb = nbrs(i)
        if np.all(agg[nb] == -1):
            agg[i] = n_agg
            agg[nb] = n_agg
            n_agg += 1
    # pass 2: attach to a neighboring aggregate
    attach = agg.copy()
    for i in range(n):
        if agg[i] != -1:
            continue
        nb = nbrs(i)
        owned = nb[agg[nb] != -1]
        if owned.size:
            attach[i] = agg[owned[0]]
    agg = attach
    # pass 3: leftovers
    for i in range(n):
        if agg[i] == -1:
            agg[i] = n_agg
            nb = nbrs(i)
            free = nb[agg[nb] == -1]
            agg[free] = n_agg
            n_agg += 1
    return agg


def tentative_prolongator(agg: np.ndarray):
    """T with l2-normalized piecewise-constant columns (scipy CSR)."""
    import scipy.sparse as sp

    n = agg.shape[0]
    n_agg = int(agg.max()) + 1
    sizes = np.bincount(agg, minlength=n_agg).astype(np.float64)
    vals = 1.0 / np.sqrt(sizes[agg])
    return sp.csr_matrix((vals, (np.arange(n), agg)), shape=(n, n_agg))


def _rho_dinv_a(a_sp, dinv: np.ndarray, iters: int = 25) -> float:
    v = np.sin(np.arange(a_sp.shape[0]) * 0.7 + 0.3)
    v /= np.linalg.norm(v)
    for _ in range(iters):
        w = dinv * (a_sp @ v)
        v = w / np.linalg.norm(w)
    return float(v @ (dinv * (a_sp @ v)))


def gamg_setup_unstructured(
    a: HostCSR, params: AMGParams = AMGParams(), dtype=None
) -> Hierarchy:
    """Build a device Hierarchy from an arbitrary symmetric HostCSR."""
    import scipy.sparse as sp

    if params.nsmooths not in (0, 1):
        raise ValueError("only nsmooths in {0, 1} supported")
    a_sp = a.to_scipy()
    levels: list[Level] = []
    transfers: list[ELLTransfer | None] = []

    while True:
        n = a_sp.shape[0]
        diag = a_sp.diagonal()
        dinv = 1.0 / diag
        rho = _rho_dinv_a(a_sp, dinv, params.rho_iters) * params.rho_safety
        last = n <= params.coarse_eq_limit or len(levels) + 1 >= params.max_levels
        if not last:
            agg = greedy_aggregate(
                HostCSR.from_scipy(a_sp), params.threshold
            )
            if agg.max() + 1 >= n:  # aggregation stalled
                last = True
        op_ell = ELL.from_csr(
            HostCSR.from_scipy(a_sp), dtype=dtype
        )
        lev_common = dict(
            op=op_ell,
            dinv=jnp.asarray(dinv, op_ell.dtype),
            rho=jnp.asarray(rho, op_ell.dtype),
        )
        if last:
            levels.append(Level(transfer=None, **lev_common))
            break
        t = tentative_prolongator(agg)
        if params.nsmooths == 1:
            omega = params.omega_scale / rho
            p = (t - omega * sp.diags(dinv) @ (a_sp @ t)).tocsr()
        else:
            p = t
        transfer = ELLTransfer(
            p=ELL.from_csr(HostCSR.from_scipy(p), dtype=dtype),
            r=ELL.from_csr(HostCSR.from_scipy(p.T.tocsr()), dtype=dtype),
        )
        levels.append(Level(transfer=transfer, **lev_common))
        # Galerkin triple product (PETSc MatPtAP parity): native C++ SpGEMM
        # when built (tpusparse/native), scipy otherwise
        from tpusparse import native

        if native.available():
            ac = native.ptap(HostCSR.from_scipy(p), HostCSR.from_scipy(a_sp)).to_scipy()
        else:
            ac = (p.T @ (a_sp @ p)).tocsr()
        ac.sum_duplicates()
        ac.eliminate_zeros()
        a_sp = ac

    lead = levels[0].dinv.dtype
    return Hierarchy(
        levels=levels,
        damping=jnp.asarray(params.smooth_damping, lead),
        smoother=params.smoother,
        degree=params.degree,
        cheby_lo=params.cheby_lo,
        cheby_hi=params.cheby_hi,
    )
