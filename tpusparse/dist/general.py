"""Distributed general sparse matrices — MatMult_MPIAIJ parity for the
general-matrix path.

PETSc's MPIAIJ (SURVEY.md section 2b) is a block-row partition: each rank
holds a diagonal block (columns it owns) plus an off-diagonal block whose
column entries arrive by VecScatter before the off-block multiply, overlapped
with the diag-block compute (``MatMult_MPIAIJ``, exercised at 16-1024 ranks
by ``/root/reference/runs/multiple-node-scaling.pbs:57-68``).

The TPU-native equivalent here is built on the DIA container
(``sparse/dia.py``): a block-row partition of the band arrays over a 1-D
``("rows",)`` device mesh, with the off-shard columns delivered by a
fixed-width ``lax.ppermute`` window exchange — the VecScatter plan computed
at setup (the window half-width = max |offset|).  Properties:

- **gather-free**: shifts against the halo-extended local vector are static
  slices, so the mv runs inside jitted CG loops at any size (the deployed
  v5e libtpu crashes on gather-mv in loops at >= ~2M rows);
- the permute pair posts before the band multiplies and carries no data
  dependence on them — XLA overlaps the ICI transfer with the local compute,
  exactly the VecScatterBegin/compute/VecScatterEnd overlap of the
  reference;
- dots in the surrounding CG reduce with one ``psum`` via GSPMD (the
  MPI_Allreduce class of traffic).

Requirement: max |offset| <= rows per shard (halo reaches only adjacent
shards) — true for mesh-graph matrices under contiguous orderings; violated
inputs are rejected at setup with an actionable error.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusparse.sparse.dia import DIA

ROW_AXIS = "rows"


def make_row_mesh(n_devices: int | None = None) -> Mesh:
    """1-D block-row mesh (the MPIAIJ rank layout)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (ROW_AXIS,))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bands"],
    meta_fields=["offsets", "shape", "halo", "mesh"],
)
@dataclasses.dataclass
class DistDIA:
    """Block-row-sharded DIA matrix.  ``bands`` is (K, n) sharded along the
    row axis; ``halo`` is the VecScatter window half-width (= max |offset|,
    padded to a lane multiple).  ``mesh`` is static metadata so ``mv`` works
    on traced operands inside jit."""

    bands: jax.Array
    offsets: tuple[int, ...]
    shape: tuple[int, int]
    halo: int
    mesh: Mesh

    @classmethod
    def shard(cls, a: DIA, mesh: Mesh) -> "DistDIA":
        """Partition a square DIA over ``mesh`` (1-D, ROW_AXIS)."""
        n = a.n_rows
        p = mesh.shape[ROW_AXIS]
        if a.shape[0] != a.shape[1]:
            raise ValueError("DistDIA shards square operators")
        if n % p:
            raise ValueError(
                f"n={n} rows not divisible by {p} shards; pad the system or"
                f" choose a divisor device count (DMDA-style validation)"
            )
        nl = n // p
        reach = max((abs(o) for o in a.offsets), default=0)
        if reach > nl:
            raise ValueError(
                f"max |offset| {reach} exceeds rows/shard {nl}: halo would"
                f" span non-adjacent shards; use fewer shards or reorder"
            )
        halo = max(8, -(-reach // 8) * 8)  # sublane-friendly window
        halo = min(halo, nl)
        bands = jax.device_put(
            a.bands, NamedSharding(mesh, P(None, ROW_AXIS))
        )
        return cls(
            bands=bands, offsets=a.offsets, shape=a.shape, halo=halo,
            mesh=mesh,
        )

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.bands.dtype

    def diagonal(self) -> jax.Array:
        if 0 in self.offsets:
            return self.bands[self.offsets.index(0)]
        return jnp.zeros(self.n_rows, self.dtype)

    def _mv_shard(self, bands_l, x_l):
        """Per-shard mv.  Runs inside shard_map over (ROW_AXIS,)."""
        h = self.halo
        p = lax.axis_size(ROW_AXIS)
        idx = lax.axis_index(ROW_AXIS)
        nl = x_l.shape[0]
        zeros = jnp.zeros((h,), x_l.dtype)
        if p == 1:
            prev_tail, next_head = zeros, zeros
        else:
            # VecScatterBegin parity: both neighbor windows post up front,
            # with no dependence on the band multiplies below
            fwd = [(i, (i + 1) % p) for i in range(p)]
            bwd = [(i, (i - 1) % p) for i in range(p)]
            prev_tail = lax.ppermute(x_l[nl - h:], ROW_AXIS, fwd)
            next_head = lax.ppermute(x_l[:h], ROW_AXIS, bwd)
            prev_tail = jnp.where(idx == 0, zeros, prev_tail)
            next_head = jnp.where(idx == p - 1, zeros, next_head)
        x_ext = jnp.concatenate([prev_tail, x_l, next_head])
        # local band multiplies: static slices of the halo-extended vector
        y = bands_l[0] * lax.dynamic_slice_in_dim(
            x_ext, h + self.offsets[0], nl
        )
        for k, o in enumerate(self.offsets[1:], start=1):
            y = y + bands_l[k] * lax.dynamic_slice_in_dim(x_ext, h + o, nl)
        return y

    def mv(self, x: jax.Array) -> jax.Array:
        """y = A @ x on row-sharded vectors (MatMult_MPIAIJ parity)."""
        fn = jax.shard_map(
            self._mv_shard,
            mesh=self.mesh,
            in_specs=(P(None, ROW_AXIS), P(ROW_AXIS)),
            out_specs=P(ROW_AXIS),
        )
        return fn(self.bands, x)

    def __matmul__(self, x):
        return self.mv(x)


def shard_vector(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P(ROW_AXIS)))


def shard_unstructured_hierarchy(hier, mesh: Mesh):
    """MPIAIJ-style placement of an unstructured AMG hierarchy: level 0's
    operator/vectors block-row-sharded (DistDIA + sharded fields), the
    FactoredTransfer's fine-sized arrays likewise; coarse levels replicated
    (27x smaller per level — same policy as the structured path)."""
    from tpusparse.amg.unstructured import FactoredTransfer

    rep = NamedSharding(mesh, P())
    put_rep = lambda t: jax.tree.map(lambda v: jax.device_put(v, rep), t)

    lev0 = hier.levels[0]
    if not isinstance(lev0.op, DIA):
        raise ValueError(
            "shard_unstructured_hierarchy needs DIA level operators"
            " (gamg_setup_unstructured(device_format='dia'))"
        )
    if not isinstance(lev0.transfer, FactoredTransfer):
        raise ValueError("needs transfer_format='factored'")
    rows = NamedSharding(mesh, P(ROW_AXIS))
    new0 = dataclasses.replace(
        lev0,
        op=DistDIA.shard(lev0.op, mesh),
        dinv=jax.device_put(lev0.dinv, rows),
        rho=jax.device_put(lev0.rho, rep),
        transfer=dataclasses.replace(
            lev0.transfer,
            agg=jax.device_put(lev0.transfer.agg, rows),
            w=jax.device_put(lev0.transfer.w, rows),
            omega=jax.device_put(lev0.transfer.omega, rep),
        ),
        bjac=put_rep(lev0.bjac),
    )
    new_levels = [new0] + [put_rep(lev) for lev in hier.levels[1:]]
    return dataclasses.replace(
        hier, levels=new_levels,
        damping=jax.device_put(hier.damping, rep),
    )
