"""Padded-resident 7-point stencil operator — the zero-copy hot path.

The drop-in Pallas kernel (``kernels/stencil7.star7_mv_pallas``) pays two
extra array passes per apply (pad x, crop y), which erases most of its win
inside the V-cycle where the operator applies 6-7 times per CG iteration.
This module moves the padding INTO the solver state: every level-0 field
(x, b, r, p, diag, dinv, ...) lives permanently in the layout

    (nz + 2*FACE, ny_p, nx_p)      ny_p = ceil8(ny), nx_p = ceil128(nx)

(FACE = kernels.stencil7.FACE zero planes per z face — enough halo depth for
the temporally-blocked kernels in kernels/fused7.py to chain three stencil
applications in one HBM pass)

with the invariant that **every pad cell of every vector is zero**.  All
elementwise solver algebra (axpy, dots, Jacobi/Chebyshev updates) preserves
the invariant for free (linear ops on zeros; dinv's pads are set to 1.0 so
no inf*0 NaNs appear), dots are unchanged by the zero pads, and the stencil
apply is one resident kernel call moving exactly x + diag + y.

This is the reference's step-2 lesson ("upload the matrix once, reuse it
across thousands of MatMults", ``src/openacc-step2/MatMult_SeqAIJ.patch``)
transposed to layout: *align once, reuse the alignment across the solve*.

The AMG transfers cross between the padded fine level and the true-shape
coarse levels; ``PaddedTransfer`` pays one crop (restrict) / one pad
(prolong) per V-cycle — 2 thin passes replacing the 12+ the drop-in form
would spend.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpusparse.kernels.stencil7 import (
    FACE,
    is_tpu_backend,
    padded_shape,
    star7_supported,
)
from tpusparse.sparse.stencil import StarStencil3D, _shift


def pad_field(x: jax.Array, value: float = 0.0) -> jax.Array:
    """(nz, ny, nx) → padded layout, pads filled with ``value``."""
    nzp2, nyp, nxp = padded_shape(x.shape)
    nz, ny, nx = x.shape
    return jnp.pad(
        x, ((FACE, FACE), (0, nyp - ny), (0, nxp - nx)),
        constant_values=value,
    )


def crop_field(x_p: jax.Array, shape: tuple[int, int, int]) -> jax.Array:
    """Padded layout → (nz, ny, nx)."""
    nz, ny, nx = shape
    return x_p[FACE:nz + FACE, :ny, :nx]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["diag", "cx", "cy", "cz"],
    meta_fields=["pinned", "true_shape", "backend"],
)
@dataclasses.dataclass
class PaddedStar:
    """StarStencil3D twin operating on padded-resident fields.

    ``diag`` is stored padded with 1.0 in the pads (so ``1/diag`` is finite
    and ``dinv * r`` keeps pad zeros); pad diag values are never read by the
    kernel (outputs are domain-masked).  ``backend``: "auto" (Pallas on TPU,
    XLA elsewhere), "xla", "pallas", or "interpret" (CPU tests).
    """

    diag: jax.Array   # (nz+2, ny_p, nx_p)
    cx: jax.Array
    cy: jax.Array
    cz: jax.Array
    pinned: bool
    true_shape: tuple[int, int, int]
    backend: str = "auto"

    @classmethod
    def from_star(cls, op: StarStencil3D, backend: str = "auto") -> "PaddedStar":
        return cls(
            diag=pad_field(op.diag, 1.0),
            cx=op.cx, cy=op.cy, cz=op.cz,
            pinned=op.pinned,
            true_shape=tuple(op.diag.shape),
            backend=backend,
        )

    # --- introspection (duck-typed with StarStencil3D) ---------------------
    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return self.true_shape

    @property
    def shape(self) -> tuple[int, int]:
        n = int(np.prod(self.true_shape))
        return (n, n)

    @property
    def dtype(self):
        return self.diag.dtype

    def diagonal_field(self) -> jax.Array:
        """PADDED diagonal with 1.0 pads — safe to invert elementwise."""
        return self.diag

    # --- apply --------------------------------------------------------------
    def _use_pallas(self) -> bool:
        if self.backend in ("pallas", "interpret"):
            return True
        if self.backend == "xla":
            return False
        return is_tpu_backend() and star7_supported(
            self.true_shape, self.dtype
        )

    def mv(self, x_p: jax.Array) -> jax.Array:
        """y = A @ x on padded fields (both with zero pads)."""
        if x_p.shape != self.diag.shape:
            raise ValueError(f"x {x_p.shape} != padded {self.diag.shape}")
        if self._use_pallas():
            from tpusparse.kernels.stencil7 import star7_mv_padded

            return star7_mv_padded(
                self.diag, self.cx, self.cy, self.cz, x_p,
                self.true_shape, self.pinned,
                interpret=(self.backend == "interpret"),
            )
        return self._mv_xla(x_p)

    def _mv_xla(self, x_p: jax.Array) -> jax.Array:
        """XLA fallback (CPU / unsupported shapes): shifted reads over the
        padded array.  x's zero pads realize the Neumann boundary except
        where a dimension is exactly tile-aligned; the final domain mask
        kills out-of-domain outputs either way."""
        nz, ny, nx = self.true_shape
        nzp2, nyp, nxp = x_p.shape
        k = lax.broadcasted_iota(jnp.int32, x_p.shape, 0)
        j = lax.broadcasted_iota(jnp.int32, x_p.shape, 1)
        i = lax.broadcasted_iota(jnp.int32, x_p.shape, 2)
        in_dom = (k >= FACE) & (k < nz + FACE) & (j < ny) & (i < nx)
        zero = jnp.zeros((), x_p.dtype)

        if self.pinned:
            origin = (k == FACE) & (j == 0) & (i == 0)
            xn = jnp.where(origin, zero, x_p)
        else:
            xn = x_p
        xp_ = _shift(xn, 2, 1)
        xm_ = _shift(xn, 2, -1)
        yp_ = _shift(xn, 1, 1)
        ym_ = _shift(xn, 1, -1)
        if nx == nxp:  # no zero pad column: mask the Neumann edge explicitly
            xp_ = jnp.where(i < nx - 1, xp_, zero)
            xm_ = jnp.where(i > 0, xm_, zero)
        if ny == nyp:
            yp_ = jnp.where(j < ny - 1, yp_, zero)
            ym_ = jnp.where(j > 0, ym_, zero)
        y = self.diag * x_p
        y += self.cx * (xp_ + xm_)
        y += self.cy * (yp_ + ym_)
        y += self.cz * (_shift(xn, 0, 1) + _shift(xn, 0, -1))
        if self.pinned:
            y = jnp.where(origin, self.diag * x_p, y)
        return jnp.where(in_dom, y, zero)

    def mv_dot(self, x_p: jax.Array):
        """(A @ x, <x, A x>) in one HBM pass over x/diag/y — the fused CG
        alpha denominator (kernels/fused7.py 'mvdot'); XLA fallback
        elsewhere."""
        if self._use_pallas():
            from tpusparse.kernels.fused7 import fused7_call

            zero = jnp.zeros((), jnp.float32)
            return fused7_call(
                "mvdot", self.diag, self.cx, self.cy, self.cz, x_p, x_p,
                x_p, zero, zero, zero, shape=self.true_shape,
                pinned=self.pinned, interpret=(self.backend == "interpret"),
            )
        y = self._mv_xla(x_p)
        return y, jnp.vdot(x_p.reshape(-1), y.reshape(-1))

    def cgmv(self, z_p, p_p, x_p, alpha_prev, beta):
        """The CG iteration's top half in ONE kernel pass
        (kernels/fused7.py 'cgmv'): returns ``(ap, p_new, x_new, pap)``
        where ``p_new = z + beta*p``, ``ap = A p_new``,
        ``x_new = x + alpha_prev*p`` (the DEFERRED x update of the
        full-fusion CG body — see solve/cg.py) and ``pap = <p_new, ap>``.
        Replaces the p-update axpy + mv + <p,Ap> dot + half the x/r axpy
        pass of the standard body.  XLA fallback elsewhere."""
        if self._use_pallas():
            from tpusparse.kernels.fused7 import fused7_call

            zero = jnp.zeros((), jnp.float32)
            return fused7_call(
                "cgmv", self.diag, self.cx, self.cy, self.cz, z_p, p_p,
                x_p, beta, alpha_prev, zero, shape=self.true_shape,
                pinned=self.pinned, interpret=(self.backend == "interpret"),
            )
        pn = z_p + beta * p_p
        w = self._mv_xla(pn)
        xn = x_p + alpha_prev * p_p
        return w, pn, xn, jnp.vdot(pn.reshape(-1), w.reshape(-1))

    def __matmul__(self, x):
        return self.mv(x)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["inner"],
    meta_fields=[],
)
@dataclasses.dataclass
class PaddedTransfer:
    """StructuredTransfer adapter for a padded fine level: crops before the
    coarse-side reshape algebra, pads after — one thin pass each per V-cycle.
    Coarse fields stay true-shaped (VarStencil27 levels are unpadded)."""

    inner: object  # StructuredTransfer

    @property
    def c_shape(self):
        return self.inner.c_shape

    @property
    def omega(self):
        return self.inner.omega

    @property
    def tnorm(self):
        return self.inner.tnorm

    def _padded_s(self):
        """Zero-padded per-axis aggregation matrices: the T-action einsums
        then produce/consume the padded layout DIRECTLY — the zero matmul
        rows realize the pads for free, saving a full pad pass per V-cycle
        (the fine field is ~108MB at 300^3)."""
        inner = self.inner
        nz, ny, nx = inner.fine_shape
        nzp, nyp, nxp = padded_shape(inner.fine_shape)
        return (
            jnp.pad(inner.sz, ((FACE, nzp - nz - FACE), (0, 0))),
            jnp.pad(inner.sy, ((0, nyp - ny), (0, 0))),
            jnp.pad(inner.sx, ((0, nxp - nx), (0, 0))),
        )

    def t_apply_padded(self, e_c):
        """T e_c straight into the padded layout (zero faces/pads)."""
        szp, syp, sxp = self._padded_s()
        x = e_c * self.inner.tnorm
        x = jnp.einsum("zc,cde->zde", szp, x)
        x = jnp.einsum("yd,zde->zye", syp, x)
        return jnp.einsum("xe,zye->zyx", sxp, x)

    def tT_apply_padded(self, s_p):
        """T^T s from a padded field (pads contract against zero rows)."""
        szp, syp, sxp = self._padded_s()
        x = jnp.einsum("zyx,zc->cyx", s_p, szp)
        x = jnp.einsum("cyx,yd->cdx", x, syp)
        x = jnp.einsum("cdx,xe->cde", x, sxp)
        return x * self.inner.tnorm

    def prolong(self, fine_op, dinv, e_c):
        if self.inner.fop is not None:
            # threshold-filtered P-smoothing operator (same routing as
            # StructuredTransfer.prolong — this adapter previously dropped
            # the filter, leaving the padded cycle inconsistent with the
            # fop-built Galerkin coarse operator)
            fine_op = self.inner.fop
        t_p = self.t_apply_padded(e_c)
        return t_p - self.inner.omega * dinv * fine_op.mv(t_p)

    def restrict(self, fine_op, dinv, r_p):
        if self.inner.fop is not None:
            fine_op = self.inner.fop
        s_p = r_p - self.inner.omega * fine_op.mv(dinv * r_p)
        return self.tT_apply_padded(s_p)
