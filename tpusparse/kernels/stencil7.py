"""Pallas TPU kernel for the 7-point star stencil — speed-of-light SpMV.

This is the TPU-native counterpart of the reference's hand-tuned OpenACC SpMV
(``src/openacc-step4/MatMult_SeqAIJ.patch``: blocked row pipeline with
per-stream copy/compute overlap).  The XLA fallback in ``sparse/stencil.py``
materializes each shifted operand (~15 HBM passes per apply); this kernel
reads x and diag essentially once and writes y once:

- grid over z-slabs of TZ planes; each program manually DMAs its x slab
  *plus one halo plane on each side* from HBM into VMEM (the BlockSpec
  machinery cannot express overlapping reads; the async-copy API can).
  Slab layout is normalized so local plane p always holds global plane
  k0 - 1 + p; the first/last programs copy one plane less and mask the
  missing halo;
- in-plane (y, x) neighbor shifts are VMEM rolls masked at the domain edge —
  zero-fill reproducing the Neumann dropped-entry assembly
  (``src/helper.cpp:229-233``);
- the pinned row/column (``MatZeroRowsColumns`` parity) is handled in-kernel
  on program 0 by zeroing the origin's slab entry (column part) and
  rewriting y[0,0,0] = diag * x[0,0,0] (row part) — no extra memory traffic.

f32 only (the mixed-precision hot path); f64 applies stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tz(nz: int) -> int:
    for tz in (8, 10, 6, 5, 4, 3, 2):
        if nz % tz == 0 and nz // tz >= 2:
            return tz
    return 0


def star7_supported(shape: tuple[int, int, int], dtype) -> bool:
    nz, ny, nx = shape
    if jnp.dtype(dtype) != jnp.float32:
        return False
    tz = _pick_tz(nz)
    if tz == 0:
        return False
    # slab + double-buffered diag/y blocks must fit comfortably in VMEM
    plane = ny * ((nx + 127) // 128 * 128) * 4
    return (5 * tz + 2) * plane <= 100 * 1024 * 1024


def _kernel(
    scal_ref, x_hbm, diag_ref, y_ref, xslab, sem, *, tz, nz, ny, nx, pinned
):
    cx, cy, cz = scal_ref[0], scal_ref[1], scal_ref[2]
    pid = pl.program_id(0)
    last = pl.num_programs(0) - 1
    k0 = pid * tz

    # normalized slab: local plane p == global plane k0 - 1 + p
    @pl.when(pid == 0)
    def _():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, tz + 1)], xslab.at[pl.ds(1, tz + 1)], sem
        )
        dma.start()
        dma.wait()

    @pl.when((pid == last) & (pid != 0))
    def _():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(nz - tz - 1, tz + 1)],
            xslab.at[pl.ds(0, tz + 1)],
            sem,
        )
        dma.start()
        dma.wait()

    @pl.when((pid != 0) & (pid != last))
    def _():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(k0 - 1, tz + 2)], xslab, sem
        )
        dma.start()
        dma.wait()

    if pinned:
        x000 = xslab[1, 0, 0]  # global x[0,0,0] (only meaningful on pid 0)

        @pl.when(pid == 0)
        def _zero_origin():
            # column-0 zeroing: no row may read x[0,0,0] as a neighbor
            xslab[1, 0, 0] = jnp.zeros((), xslab.dtype)

    cur = xslab[pl.ds(1, tz)]   # global planes [k0, k0+tz)
    dn = xslab[pl.ds(0, tz)]    # k-1 planes (garbage on pid 0 plane 0: masked)
    up = xslab[pl.ds(2, tz)]    # k+1 planes (garbage on last plane: masked)

    kk = k0 + jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 2)
    zero = jnp.zeros((), cur.dtype)

    # pltpu.roll requires non-negative shifts: roll by n-1 == roll by -1
    xp = jnp.where(ii < nx - 1, pltpu.roll(cur, nx - 1, 2), zero)
    xm = jnp.where(ii > 0, pltpu.roll(cur, 1, 2), zero)
    yp = jnp.where(jj < ny - 1, pltpu.roll(cur, ny - 1, 1), zero)
    ym = jnp.where(jj > 0, pltpu.roll(cur, 1, 1), zero)
    zp = jnp.where(kk < nz - 1, up, zero)
    zm = jnp.where(kk > 0, dn, zero)

    y = diag_ref[:] * cur + cx * (xp + xm) + cy * (yp + ym) + cz * (zp + zm)

    if pinned:
        origin = (kk == 0) & (jj == 0) & (ii == 0)
        y = jnp.where(origin, diag_ref[:] * x000, y)
    y_ref[:] = y


@functools.partial(jax.jit, static_argnames=("pinned",))
def star7_mv_pallas(diag, cx, cy, cz, x, pinned: bool):
    """y = A @ x for the 7-point star operator (f32, TPU)."""
    nz, ny, nx = x.shape
    tz = _pick_tz(nz)
    if tz == 0:
        raise ValueError(f"unsupported nz={nz} for the pallas star7 kernel")
    scal = jnp.stack([cx, cy, cz]).astype(x.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nz // tz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (tz, ny, nx), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tz, ny, nx), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ny, nx), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, tz=tz, nz=nz, ny=ny, nx=nx, pinned=pinned
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=13 * nz * ny * nx,
            bytes_accessed=3 * nz * ny * nx * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(scal, x, diag)
