"""Pallas TPU kernel for the 7-point star stencil — speed-of-light SpMV.

This is the TPU-native counterpart of the reference's hand-tuned OpenACC SpMV
(``src/openacc-step4/MatMult_SeqAIJ.patch``).  The parallel is exact: the
reference splits CSR rows into blocks and pipelines each block's compute
against the previous block's transfers on its own async stream
(``async(b+1)``, block loop at patch:54-72); this kernel splits the grid into
z-slabs and pipelines each slab's VPU compute against the next slab's
HBM→VMEM DMA, with the same wait-join at the end (``acc wait`` parity).
The XLA fallback in ``sparse/stencil.py`` materializes several shifted
operands per apply; this kernel reads x and diag once and writes y once.

Design — shaped by what the deployed v5e Mosaic toolchain actually lowers
(probed empirically on the chip):

- grid pipelines (any ``grid=`` pallas_call) fail to legalize → the kernel is
  GRIDLESS: one invocation owns the whole array in HBM (``pl.ANY``) and runs
  its own ``fori_loop`` slab pipeline with explicit ``make_async_copy`` DMAs
  (which DO legalize in gridless kernels) and double-buffered input slabs;
- all loop/index math is i32 (i64 anywhere — a bare Python int under
  jax_enable_x64 — hits unlegalizable converts);
- scalar reads from refs are avoided: the three stencil coefficients ride in
  as (8, nx_p) replicated planes and multiply via sublane broadcast;
- fields are zero-padded to the (8, 128) tile in (ny, nx) and viewed 2-D as
  (rows, nx_p): a z-plane is ny_p rows, plane arithmetic is row arithmetic,
  every shift is a supported 2-D rotate;
- x additionally gets one zero plane per z face, so every slab DMA is the
  same unconditional tile-aligned copy and the z-boundary Neumann zeros are
  built in (the reference realizes the same boundary by *dropping* stencil
  entries, ``src/helper.cpp:229-233``);
- in-plane neighbor shifts are VMEM rotates masked at the TRUE domain edge
  (rotates wrap over padding/seams; every wrapped lane is where'd to zero);
- the pinned row/column (``MatZeroRowsColumns`` parity,
  ``src/helper.cpp:250-279``) is handled by masking the three neighbor reads
  that can see cell 0 and rewriting y[0,0,0] = diag * x — no scalar stores
  (Mosaic forbids them).

f32 only (the mixed-precision hot path); f64 applies stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tz(nz: int) -> int:
    for tz in (8, 10, 6, 5, 4, 3, 2):
        if nz % tz == 0 and nz // tz >= 2:
            return tz
    return 0


def _pad_to(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def star7_supported(shape: tuple[int, int, int], dtype) -> bool:
    nz, ny, nx = shape
    if jnp.dtype(dtype) != jnp.float32:
        return False
    tz = _pick_tz(nz)
    if tz == 0:
        return False
    # double-buffered x/diag slabs + y slab must fit comfortably in VMEM
    plane = _pad_to(ny, 8) * _pad_to(nx, 128) * 4
    return (7 * tz + 4) * plane <= 100 * 1024 * 1024


def _kernel(
    coef_ref, x_hbm, diag_hbm, y_hbm, xs, ds, ys, sx, sd, sy,
    *, tz, nz, ny, nx, nyp, pinned,
):
    """Gridless slab pipeline.  2-D views: a z-plane is ``nyp`` rows.

    ``x_hbm`` holds nz+2 planes (zero z-faces): domain plane k lives at
    padded plane k+1, so slab i's x window is padded rows
    [i*rows, i*rows + rows + 2*nyp) — domain planes [k0-1, k0+tz+1).
    ``xs``/``ds`` are (2, ...) double buffers with semaphore arrays
    ``sx``/``sd``; y writeback is synchronous from the single ``ys`` buffer.
    """
    nxp = ys.shape[-1]
    rows = tz * nyp
    grid = nz // tz
    i32 = jnp.int32

    cx = coef_ref[pl.ds(0, 8)][0:1, :]   # (1, nxp) sublane-broadcast rows
    cy = coef_ref[pl.ds(8, 8)][0:1, :]
    cz = coef_ref[pl.ds(16, 8)][0:1, :]

    # the slab loop is PYTHON-UNROLLED (grid is static, <= ~40): every DMA
    # offset and buffer index is a compile-time constant — no dynamic VMEM
    # leading-dim indexing, no loop-carried semaphore bookkeeping to legalize
    def dma_x(i):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(jnp.int32(i * rows), rows + 2 * nyp)],
            xs.at[jnp.int32(i % 2)], sx.at[jnp.int32(i % 2)],
        )

    def dma_d(i):
        return pltpu.make_async_copy(
            diag_hbm.at[pl.ds(jnp.int32(i * rows), rows)], ds.at[jnp.int32(i % 2)], sd.at[jnp.int32(i % 2)]
        )

    rr = jax.lax.broadcasted_iota(i32, (rows, nxp), 0)
    ii = jax.lax.broadcasted_iota(i32, (rows, nxp), 1)
    jj = rr % i32(nyp)
    s1 = i32(1)

    def compute(i):
        """y slab i (static) from double buffer i % 2."""
        slab = xs[jnp.int32(i % 2)]                   # value: (rows + 2*nyp, nxp)
        cur = slab[nyp:nyp + rows]         # domain planes [k0, k0+tz)
        dn = slab[0:rows]                  # k-1 (zero face below plane 0)
        up = slab[2 * nyp:2 * nyp + rows]  # k+1 (zero face above nz-1)
        diag = ds[jnp.int32(i % 2)]
        zero = jnp.zeros((), cur.dtype)

        # pltpu.roll needs non-negative shifts: roll by n-1 == roll by -1.
        # Rolls wrap across padding and plane seams; masks zero every
        # wrapped read (true-ny/nx edges = Neumann dropped entries).
        xp = jnp.where(ii < nx - 1, pltpu.roll(cur, i32(nxp - 1), 1), zero)
        xm = jnp.where(ii > 0, pltpu.roll(cur, s1, 1), zero)
        yp = jnp.where(jj < ny - 1, pltpu.roll(cur, i32(rows - 1), 0), zero)
        ym = jnp.where(jj > 0, pltpu.roll(cur, s1, 0), zero)
        zp = up
        zm = dn

        if pinned and i == 0:  # cell 0 lives in slab 0 (tz >= 2)
            kk = rr // i32(nyp)
            # column-0 zeroing: only rows (0,0,1), (0,1,0), (1,0,0) read
            # x[0,0,0] as a neighbor — mask exactly those reads
            xm = jnp.where((kk == 0) & (jj == 0) & (ii == 1), zero, xm)
            ym = jnp.where((kk == 0) & (jj == 1) & (ii == 0), zero, ym)
            zm = jnp.where((kk == 1) & (jj == 0) & (ii == 0), zero, zm)

        y = diag * cur + cx * (xp + xm) + cy * (yp + ym) + cz * (zp + zm)

        if pinned and i == 0:
            # pinned row: y[0,0,0] = diag * x[0,0,0] only
            origin = (kk == 0) & (jj == 0) & (ii == 0)
            y = jnp.where(origin, diag * cur, y)
        return y

    def writeback(i):
        wb = pltpu.make_async_copy(ys, y_hbm.at[pl.ds(jnp.int32(i * rows), rows)], sy)
        wb.start()
        wb.wait()

    dma_x(0).start()
    dma_d(0).start()
    for i in range(grid):
        if i + 1 < grid:
            # prefetch slab i+1 while slab i computes (the reference's
            # step-3/4 transfer/compute overlap, done the TPU way)
            dma_x(i + 1).start()
            dma_d(i + 1).start()
        dma_x(i).wait()
        dma_d(i).wait()
        ys[:] = compute(i)
        writeback(i)


@functools.partial(jax.jit, static_argnames=("pinned", "interpret"))
def star7_mv_pallas(diag, cx, cy, cz, x, pinned: bool, interpret: bool = False):
    """y = A @ x for the 7-point star operator (f32, TPU).

    ``interpret=True`` runs the kernel under the Pallas interpreter (any
    backend) — used by the CPU test suite to pin down kernel semantics.

    (ny, nx) are zero-padded up to the (8, 128) tile and x gets one zero
    plane per z face (see module docstring).  Padding is zeros, which the
    in-kernel edge masks (based on the TRUE ny/nx) never read as domain
    values; the diag/coefficient pads are loop-invariant and hoisted out of
    solver loops by XLA, so steady-state extra traffic is the x pad + y
    unpad.
    """
    nz, ny, nx = x.shape
    tz = _pick_tz(nz)
    if tz == 0:
        raise ValueError(f"unsupported nz={nz} for the pallas star7 kernel")

    nyp, nxp = _pad_to(ny, 8), _pad_to(nx, 128)
    x = jnp.pad(x, ((1, 1), (0, nyp - ny), (0, nxp - nx)))
    if (nyp, nxp) != (ny, nx):
        diag = jnp.pad(diag, ((0, 0), (0, nyp - ny), (0, nxp - nx)))
    x2 = x.reshape((nz + 2) * nyp, nxp)
    diag2 = diag.reshape(nz * nyp, nxp)
    # coefficient broadcast planes (scalar ref reads don't legalize)
    coef = jnp.concatenate(
        [
            jnp.full((8, nxp), c, x.dtype)
            for c in (cx, cy, cz)
        ]
    )

    rows = tz * nyp
    kernel = functools.partial(
        _kernel, tz=tz, nz=nz, ny=ny, nx=nx, nyp=nyp, pinned=pinned
    )
    y2 = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coef planes
            pl.BlockSpec(memory_space=pl.ANY),      # x (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # diag (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nz * nyp, nxp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2 * nyp, nxp), x.dtype),  # x double buffer
            pltpu.VMEM((2, rows, nxp), x.dtype),            # diag double buf
            pltpu.VMEM((rows, nxp), x.dtype),               # y staging
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # double-buffered slabs exceed the 16MB default scoped limit;
            # v5e has 128MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,  # output written via DMA, not returned
        ),
        cost_estimate=pl.CostEstimate(
            flops=13 * nz * ny * nx,
            bytes_accessed=3 * nz * ny * nx * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coef, x2, diag2)

    y = y2.reshape(nz, nyp, nxp)
    if (nyp, nxp) != (ny, nx):
        y = y[:, :ny, :nx]
    return y
