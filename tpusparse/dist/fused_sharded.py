"""Sharded fused fine level — the temporally-blocked kernels at every
device count.

Round 2's flagship kernels (``kernels/fused7.py`` descent/ascent: the
V-cycle's whole fine-level downstroke/upstroke in one launch each) were
gated to ``n_devices == 1``: a Pallas custom call cannot be GSPMD-
partitioned, so a sharded solve fell back to the ~40-pass XLA cycle — the
reference's accelerated kernel, by contrast, runs at every rank count
(``/root/reference/runs/multiple-node-scaling.pbs:57-68``).

This module runs the SAME kernels per-shard under ``jax.shard_map`` over a
1-D z mesh:

- fields live in the **stacked-padded** layout ``(p, nz_l + 2*FACE, nyp,
  nxp)`` — each shard's z-slab with its own FACE halo planes, x/y padded to
  tiles.  Elementwise solver algebra and dots work unchanged because halo
  planes are ZERO between kernel calls (the kernels zero their output
  faces; exchanges happen just-in-time inside the shard region);
- before each launch, the FACE-deep z halos are refreshed with one
  ``lax.ppermute`` pair per operand (the VecScatterBegin/End of
  ``MatMult_MPIAIJ``, riding ICI on real hardware);
- inside the kernel, masking runs in GLOBAL z coordinates (``z0``/``nzg``,
  see ``fused7_call``), so chained stencil steps treat shard-boundary halo
  planes as real neighbors and only the true domain boundary gets the
  Neumann dropped-entry treatment.

The coarse hierarchy and the CG shell stay in plain GSPMD form (they are
27x+ smaller); ``vcycle_fused_sharded`` stitches the two worlds per cycle:
stack -> descent -> unstack -> T^T -> coarse vcycle -> T -> stack ->
ascent -> unstack.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusparse.kernels.stencil7 import FACE, padded_shape

ZAXIS = "z"


def make_z_mesh(n_devices: int | None = None) -> Mesh:
    """z-slab mesh: the standard ('z', 'y') mesh with y = 1, so the same
    mesh object serves both the shard_map'd kernels (axis 'z') and the
    GSPMD remainder of the program (dist.mesh shardings)."""
    from tpusparse.dist.mesh import make_mesh

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return make_mesh(n_devices, shape=(n_devices, 1))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["diag_st", "cx", "cy", "cz"],
    meta_fields=["shape", "pinned", "mesh", "interpret"],
)
@dataclasses.dataclass
class FusedSharded:
    """Fine-level fused-kernel executor over a 1-D z mesh.

    ``diag_st`` is the diagonal field in stacked-padded layout WITH ITS
    HALOS ALREADY REFRESHED (the diagonal never changes, so its exchange
    happens once at build time); traced operands are exchanged per call.
    """

    diag_st: jax.Array            # (p, nz_l + 2F, nyp, nxp)
    cx: jax.Array
    cy: jax.Array
    cz: jax.Array
    shape: tuple[int, int, int]   # GLOBAL (nz, ny, nx)
    pinned: bool
    mesh: Mesh
    interpret: bool

    @property
    def p(self) -> int:
        return self.mesh.shape[ZAXIS]

    @property
    def nz_l(self) -> int:
        return self.shape[0] // self.p

    @property
    def local_shape(self) -> tuple[int, int, int]:
        return (self.nz_l, self.shape[1], self.shape[2])

    # --- layout ----------------------------------------------------------
    @classmethod
    def build(cls, op, mesh: Mesh, interpret: bool = False) -> "FusedSharded":
        """From a plain StarStencil3D (f32) — diag is stacked, uploaded
        sharded, and halo-refreshed once."""
        nz, ny, nx = op.grid_shape
        pz = mesh.shape[ZAXIS]
        if nz % pz:
            raise ValueError(
                f"nz={nz} not divisible by {pz} z-shards (DMDA-style"
                f" validation)"
            )
        fs = cls(
            diag_st=jnp.zeros((1, 1, 1, 1), jnp.float32),
            cx=op.cx.astype(jnp.float32),
            cy=op.cy.astype(jnp.float32),
            cz=op.cz.astype(jnp.float32),
            shape=(nz, ny, nx),
            pinned=op.pinned,
            mesh=mesh,
            interpret=interpret,
        )
        diag_st = fs.to_stacked(op.diag.astype(jnp.float32))
        # refresh halos (shard-boundary planes get true neighbor diag), THEN
        # set every remaining zero pad — x/y pads and GLOBAL z faces — to
        # 1.0 so 1/diag stays finite everywhere the kernels evaluate it
        # (the PaddedStar invariant; domain diagonals are never 0)
        diag_st = fs._exchange_all(diag_st)
        diag_st = jnp.where(diag_st == 0, jnp.float32(1.0), diag_st)
        return dataclasses.replace(fs, diag_st=diag_st)

    def _sharding(self):
        return NamedSharding(self.mesh, P(ZAXIS, None, None, None))

    def to_stacked(self, x: jax.Array) -> jax.Array:
        """(nz, ny, nx) z-sharded field -> stacked-padded, halos ZERO."""
        nz, ny, nx = self.shape
        _, nyp, nxp = padded_shape(self.shape)
        x4 = x.reshape(self.p, self.nz_l, ny, nx)
        x4 = jnp.pad(
            x4,
            ((0, 0), (FACE, FACE), (0, nyp - ny), (0, nxp - nx)),
        )
        return jax.lax.with_sharding_constraint(x4, self._sharding())

    def from_stacked(self, x_st: jax.Array) -> jax.Array:
        """Stacked-padded -> (nz, ny, nx) (z-sharded via GSPMD)."""
        nz, ny, nx = self.shape
        dom = x_st[:, FACE:FACE + self.nz_l, :ny, :nx]
        return dom.reshape(nz, ny, nx)

    # --- halo exchange ----------------------------------------------------
    def _exchange_local(self, x_l: jax.Array) -> jax.Array:
        """Refresh the FACE halo planes of one local block (inside
        shard_map).  x_l: (nz_l + 2F, nyp, nxp)."""
        p = lax.axis_size(ZAXIS)
        nz_l = self.nz_l
        if p == 1:
            return x_l
        idx = lax.axis_index(ZAXIS)
        fwd = [(i, (i + 1) % p) for i in range(p)]
        bwd = [(i, (i - 1) % p) for i in range(p)]
        # my top FACE domain planes -> next shard's bottom halo
        from_below = lax.ppermute(x_l[nz_l:nz_l + FACE], ZAXIS, fwd)
        # my bottom FACE domain planes -> previous shard's top halo
        from_above = lax.ppermute(x_l[FACE:2 * FACE], ZAXIS, bwd)
        zeros = jnp.zeros_like(from_below)
        from_below = jnp.where(idx == 0, zeros, from_below)
        from_above = jnp.where(idx == p - 1, zeros, from_above)
        return jnp.concatenate(
            [from_below, x_l[FACE:FACE + nz_l], from_above], axis=0
        )

    def _exchange_all(self, x_st: jax.Array) -> jax.Array:
        """Refresh halos of a stacked-padded field (standalone call)."""
        fn = jax.shard_map(
            lambda x: self._exchange_local(x[0])[None],
            mesh=self.mesh,
            in_specs=P(ZAXIS, None, None, None),
            out_specs=P(ZAXIS, None, None, None),
            check_vma=False,  # pallas_call inside cannot express vma
        )
        return fn(x_st)

    # --- fused kernel launches -------------------------------------------
    def _call_local(self, mode, diag_l, x_l, b_l, d_l, scal):
        """One fused7 launch on a local block (inside shard_map).  ``scal``
        carries every traced scalar explicitly (shard_map bodies must not
        close over traced values)."""
        from tpusparse.kernels.fused7 import _WINDOWS, fused7_call

        cx, cy, cz, g, ad, s0, gw, g2 = scal
        halos = _WINDOWS[mode]
        idx = lax.axis_index(ZAXIS)
        z0 = idx.astype(jnp.int32) * jnp.int32(self.nz_l)
        # refresh only the operands this mode actually reads (the PRIMARY
        # stencil input is b for pre2/descent, x otherwise — mirror
        # fused7_call's slot assignment)
        if mode in ("pre2", "descent"):
            b_l = self._exchange_local(b_l)
        else:
            x_l = self._exchange_local(x_l)
            if "b" in halos:
                b_l = self._exchange_local(b_l)
        if "d" in halos:
            d_l = self._exchange_local(d_l)
        return fused7_call(
            mode, diag_l, cx, cy, cz, x_l, b_l, d_l,
            g, ad, s0, shape=self.local_shape, pinned=self.pinned,
            interpret=self.interpret, gw=gw, g2=g2,
            z0=z0, nzg=self.shape[0],
        )

    def call(self, mode: str, x_st, b_st, d_st, g, ad, s0, gw=0.0, g2=0.0):
        """Sharded fused7_call: stacked-padded in, stacked-padded out
        (output halo planes zero — the kernels zero their faces)."""
        from tpusparse.kernels.fused7 import _TWO_OUT

        two = mode in _TWO_OUT
        scal = tuple(
            jnp.asarray(v, jnp.float32)
            for v in (self.cx, self.cy, self.cz, g, ad, s0, gw, g2)
        )

        def body(diag4, x4, b4, d4, *scal_a):
            out = self._call_local(
                mode, diag4[0], x4[0], b4[0], d4[0], scal_a
            )
            if two:
                return out[0][None], out[1][None]
            return out[None]

        spec = P(ZAXIS, None, None, None)
        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(spec, spec, spec, spec) + (P(),) * 8,
            out_specs=(spec, spec) if two else spec,
            check_vma=False,  # pallas_call inside cannot express vma
        )
        return fn(self.diag_st, x_st, b_st, d_st, *scal)


def preflight_sharded(fs: FusedSharded) -> bool:
    """AOT-verify the composite kernels for the LOCAL slab shape (the
    per-shard kernel compiles against (nz_l, ny, nx))."""
    from tpusparse.kernels.fused7 import _pick_tz_mode, preflight_tz

    nz_l, ny, nx = fs.local_shape
    if fs.interpret:
        # no Mosaic involved: only the slab-depth model must admit the shape
        return all(
            _pick_tz_mode(nz_l, ny, nx, m) > 0
            for m in ("descent", "ascent")
        )
    return all(
        preflight_tz(mode, fs.local_shape, fs.pinned) > 0
        for mode in ("descent", "ascent")
    )


def fused_sharded_supported(hier) -> bool:
    """Level-0 configuration the sharded fused cycle can run.

    Accepts the transfer both bare (StructuredTransfer) and in its
    seam-local sharded wrapper (dist/seam.ShardedTransfer — what
    ``shard_hierarchy`` installs since round 5; the wrapper keeps the
    ``tT_apply``/``t_apply`` interface this cycle calls).  The wrapper
    check is load-bearing: without it this gate silently returned False
    on every sharded hierarchy and the fused kernels never ran."""
    from tpusparse.amg.transfer import StructuredTransfer
    from tpusparse.dist.seam import ShardedTransfer
    from tpusparse.sparse.stencil import StarStencil3D

    lev = hier.levels[0]
    return (
        isinstance(lev.op, StarStencil3D)
        and isinstance(lev.transfer, (StructuredTransfer, ShardedTransfer))
        and hier.smoother in ("chebyshev", "richardson")
        and hier.degree == 2
        and jnp.dtype(lev.op.dtype) == jnp.float32
    )


def vcycle_fused_sharded(fs: FusedSharded, hier, b, gamma: int = 1):
    """One multigrid cycle from a zero guess: fused fine level per shard,
    standard GSPMD cycle from level 1 down.

    ``hier``: a PLAIN structured hierarchy (sharded via
    ``dist.mesh.shard_hierarchy`` over the same devices); ``b``: plain
    (nz, ny, nx) z-sharded field.  Math identical to
    ``amg.fused_cycle.vcycle_fused`` (same kernels, same scalars).
    """
    from tpusparse.amg.fused_cycle import _fine_scalars
    from tpusparse.amg.hierarchy import vcycle

    lev = hier.levels[0]
    tr = lev.transfer
    s0, ad, g = _fine_scalars(hier, lev)
    gw = tr.omega.astype(jnp.float32)

    b_st = fs.to_stacked(b)
    # downstroke: pre-smooth x2 + residual + P^T smoothing pass, fused
    x1_st, s_st = fs.call("descent", b_st, b_st, b_st, g, ad, s0, gw, g)
    s = fs.from_stacked(s_st)
    r_c = tr.tT_apply(s)

    e = vcycle(hier, r_c, level=1, gamma=gamma)
    for _ in range(gamma - 1):
        r_c2 = r_c - hier.levels[1].op.mv(e)
        e = e + vcycle(hier, r_c2, level=1, gamma=gamma)

    # upstroke: P smoothing + correction + post-smooth x2, fused
    t_st = fs.to_stacked(tr.t_apply(e))
    out_st = fs.call("ascent", t_st, b_st, x1_st, s0, ad, s0, gw, g)
    return fs.from_stacked(out_st)
