"""Pallas TPU kernel for the 7-point star stencil — speed-of-light SpMV.

This is the TPU-native counterpart of the reference's hand-tuned OpenACC SpMV
(``src/openacc-step4/MatMult_SeqAIJ.patch``).  The parallel is exact: the
reference splits CSR rows into blocks and pipelines each block's compute
against the previous block's transfers on its own async stream
(``async(b+1)``, block loop at patch:54-72); this kernel splits the grid into
z-slabs and pipelines each slab's VPU compute against the next slab's
HBM→VMEM DMA, with the same wait-join at the end (``acc wait`` parity).

Two call forms:

- ``star7_mv_padded`` — the RESIDENT form: x, diag, y all live permanently in
  the padded layout (nz+2, ny_p, nx_p) (see ``sparse/padded.py``), so an
  apply moves exactly x + diag + y once — no per-call pad/unpad traffic.
  This mirrors the reference's step-2 insight (upload once, reuse across
  thousands of MatMults) applied to *layout* instead of residency.
- ``star7_mv_pallas`` — the drop-in form for plain (nz, ny, nx) fields: pads
  inputs, runs the same kernel, crops the output.  Costs ~2 extra array
  passes per call; used where the padded invariant is not established.

Design — shaped by what the deployed v5e Mosaic toolchain actually lowers
(probed empirically on the chip; see the repo memory notes):

- grid pipelines (any ``grid=`` pallas_call) fail to legalize → the kernel is
  GRIDLESS: one invocation owns the whole array in HBM (``pl.ANY``) and runs
  a pair-unrolled ``fori_loop`` slab pipeline with explicit
  ``make_async_copy`` DMAs (which DO legalize gridless) and double-buffered
  input slabs — static buffer/semaphore indices, dynamic i32 slab indices;
- all index math is i32 (bare Python ints trace i64 under jax_enable_x64 and
  hit unlegalizable converts);
- scalar reads from refs are avoided: the three stencil coefficients ride in
  as (8, nx_p) replicated planes and multiply via sublane broadcast;
- the padded layout guarantees every pad cell of x is ZERO, so the Neumann
  dropped-entry boundary (``src/helper.cpp:229-233``) needs no edge masks at
  all: rotates that wrap land in zero pads, and out-of-domain outputs are
  squashed by one in-domain mask;
- the pinned row/column (``MatZeroRowsColumns`` parity,
  ``src/helper.cpp:250-279``) is handled by masking the three neighbor reads
  that can see cell 0 and rewriting y at the origin — no scalar stores
  (Mosaic forbids them).

f32 only (the mixed-precision hot path); f64 applies stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def is_tpu_backend() -> bool:
    """True when the default JAX backend drives TPU hardware.

    ``jax.default_backend()`` is NOT enough: tunneled plugins register under
    their own platform name (e.g. "axon" for the remote v5e), so we check the
    device kind ("TPU v5 lite", ...) as well.
    """
    if jax.default_backend() == "tpu":
        return True
    try:
        return "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:
        return False


def _pick_tz(nz: int) -> int:
    for tz in (8, 10, 6, 5, 4, 3, 2):
        if nz % tz == 0 and nz // tz >= 2:
            return tz
    return 0


def _pad_to(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# z-face pad depth of the resident layout.  3 (not 1) so the temporally
# blocked kernels in kernels/fused7.py can chain up to three stencil
# applications per HBM pass (each consumes one halo plane); costs ~1.3%
# extra bytes per pass at 300^3 and dissolves the edge-slab special cases.
FACE = 3


def padded_shape(shape: tuple[int, int, int]) -> tuple[int, int, int]:
    """The resident layout for a (nz, ny, nx) field: FACE zero planes per z
    face, (ny, nx) rounded up to the f32 (8, 128) tile."""
    nz, ny, nx = shape
    return (nz + 2 * FACE, _pad_to(ny, 8), _pad_to(nx, 128))


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
    coef_ref, x_hbm, diag_hbm, y_hbm, xs, ds, ys, zp_buf, sx, sd, sy, sz,
    *, tz, nz, ny, nx, nyp, pinned,
):
    """Gridless pair-pipelined slab loop over 2-D row views.

    Layouts (a z-plane is ``nyp`` rows): ``x_hbm`` has nz+2 planes (zero
    faces; domain plane k at padded plane k+1), ``diag_hbm``/``y_hbm`` have
    nz+2 planes with only the domain planes read/written (+ y faces zeroed).
    Slab i's x window is padded rows [i*rows, i*rows + rows + 2*nyp) —
    domain planes [k0-1, k0+tz+1).
    """
    nxp = ys.shape[-1]
    rows = tz * nyp
    grid = nz // tz
    i32 = jnp.int32

    cx = coef_ref[pl.ds(0, 8)][0:1, :]   # (1, nxp) sublane-broadcast rows
    cy = coef_ref[pl.ds(8, 8)][0:1, :]
    cz = coef_ref[pl.ds(16, 8)][0:1, :]

    def dma_x(i, buf):
        # halo-1 window: padded planes [i*tz + FACE - 1, i*tz + tz + FACE + 1)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * i32(rows) + i32((FACE - 1) * nyp),
                           rows + 2 * nyp)],
            xs.at[jnp.int32(buf)], sx.at[jnp.int32(buf)],
        )

    def dma_d(i, buf):
        # domain plane k0 = i*tz lives at padded plane i*tz + FACE
        return pltpu.make_async_copy(
            diag_hbm.at[pl.ds(i * i32(rows) + i32(FACE * nyp), rows)],
            ds.at[jnp.int32(buf)], sd.at[jnp.int32(buf)],
        )

    rr = jax.lax.broadcasted_iota(i32, (rows, nxp), 0)
    ii = jax.lax.broadcasted_iota(i32, (rows, nxp), 1)
    jj = rr % i32(nyp)
    s1 = i32(1)
    in_dom = (jj < ny) & (ii < nx)

    def compute(i, buf):
        """y slab i (dynamic i32) from double buffer ``buf`` (static).

        No edge masks: x's pads are zero by layout invariant, so every
        rotate that wraps (over the lane pad, across plane seams, or across
        the slab boundary) reads either a zero pad or a value that the final
        in-domain mask discards.
        """
        slab = xs[jnp.int32(buf)]          # value: (rows + 2*nyp, nxp)
        cur = slab[nyp:nyp + rows]         # domain planes [k0, k0+tz)
        dn = slab[0:rows]                  # k-1 planes
        up = slab[2 * nyp:2 * nyp + rows]  # k+1 planes
        diag = ds[jnp.int32(buf)]

        # pltpu.roll needs non-negative shifts: roll by n-1 == roll by -1
        xp = pltpu.roll(cur, i32(nxp - 1), 1)
        xm = pltpu.roll(cur, s1, 1)
        yp = pltpu.roll(cur, i32(rows - 1), 0)
        ym = pltpu.roll(cur, s1, 0)
        zp = up
        zm = dn
        # wrapped rotates normally land in zero pads; when a dimension is
        # exactly tile-aligned there IS no pad there, so the Neumann edge
        # masks come back (static choice — free in the common padded case)
        zero = jnp.zeros((), cur.dtype)
        if nx == nxp:
            xp = jnp.where(ii < nx - 1, xp, zero)
            xm = jnp.where(ii > 0, xm, zero)
        if ny == nyp:
            yp = jnp.where(jj < ny - 1, yp, zero)
            ym = jnp.where(jj > 0, ym, zero)

        if pinned:  # masks are no-ops for every slab but 0 (kk >= tz there)
            kk = i * i32(tz) + rr // i32(nyp)
            # column-0 zeroing: only rows (0,0,1), (0,1,0), (1,0,0) read
            # x[0,0,0] as a neighbor — mask exactly those reads
            xm = jnp.where((kk == 0) & (jj == 0) & (ii == 1), zero, xm)
            ym = jnp.where((kk == 0) & (jj == 1) & (ii == 0), zero, ym)
            zm = jnp.where((kk == 1) & (jj == 0) & (ii == 0), zero, zm)

        y = diag * cur + cx * (xp + xm) + cy * (yp + ym) + cz * (zp + zm)

        if pinned:
            # pinned row: y[0,0,0] = diag * x[0,0,0] only
            origin = (kk == 0) & (jj == 0) & (ii == 0)
            y = jnp.where(origin, diag * cur, y)
        # keep the padded-layout invariant: out-of-domain outputs are zero
        return jnp.where(in_dom, y, zero)

    def writeback(i):
        wb = pltpu.make_async_copy(
            ys, y_hbm.at[pl.ds(i * i32(rows) + i32(FACE * nyp), rows)], sy
        )
        wb.start()
        wb.wait()

    def step(i, buf, prefetch, pbuf):
        """Wait slab i, compute+write it; meanwhile slab ``prefetch`` loads."""
        dma_x(prefetch, pbuf).start()
        dma_d(prefetch, pbuf).start()
        dma_x(i, buf).wait()
        dma_d(i, buf).wait()
        ys[:] = compute(i, buf)
        writeback(i)

    # zero y's face planes (one DMA per face from a zeroed VMEM block)
    zp_buf[:] = jnp.zeros_like(zp_buf)
    face_lo = pltpu.make_async_copy(zp_buf, y_hbm.at[pl.ds(0, FACE * nyp)], sz)
    face_lo.start()
    face_lo.wait()
    face_hi = pltpu.make_async_copy(
        zp_buf, y_hbm.at[pl.ds(i32((nz + FACE) * nyp), FACE * nyp)], sz
    )
    face_hi.start()
    face_hi.wait()

    dma_x(i32(0), 0).start()
    dma_d(i32(0), 0).start()

    def pair(j, carry):
        s0 = j * i32(2)
        # while s0 computes, s0+1 loads; while s0+1 computes, s0+2 loads.
        # The prefetch index wraps modulo grid so the final pair re-reads
        # slab 0/1 instead of running out of bounds; the epilogue drains it.
        step(s0, 0, jax.lax.rem(s0 + 1, i32(grid)), 1)
        step(s0 + 1, 1, jax.lax.rem(s0 + 2, i32(grid)), 0)
        return carry

    n_pairs = grid // 2
    jax.lax.fori_loop(i32(0), i32(n_pairs), pair, i32(0), unroll=False)
    if grid % 2:
        # odd tail: slab grid-1 (buffer 0) was prefetched by the final pair
        last = i32(grid - 1)
        dma_x(last, 0).wait()
        dma_d(last, 0).wait()
        ys[:] = compute(last, 0)
        writeback(last)
        # drain the tail's own wrapped prefetch? none: the tail prefetches
        # nothing, and the final pair's second step prefetched `last` itself
    else:
        # even grid: the final pair's wrapped prefetch (slab 0 → buffer 0)
        # is still in flight; drain so the kernel exits with clean DMA state
        dma_x(i32(0), 0).wait()
        dma_d(i32(0), 0).wait()


def _coef_planes(cx, cy, cz, nxp, dtype):
    """(24, nxp) replicated coefficient planes (scalar ref reads don't
    legalize on this toolchain)."""
    return jnp.concatenate(
        [jnp.full((8, nxp), c, dtype) for c in (cx, cy, cz)]
    )


@functools.partial(jax.jit, static_argnames=("shape", "pinned", "interpret"))
def star7_mv_padded(
    diag_p, cx, cy, cz, x_p, shape: tuple[int, int, int], pinned: bool,
    interpret: bool = False,
):
    """y = A @ x in the RESIDENT padded layout (see ``padded_shape``).

    ``x_p``/``diag_p``: (nz+2, ny_p, nx_p); x's pads must be zero (layout
    invariant); diag's pad values are never read.  Returns y in the same
    layout with zero pads.  One x read + one diag read + one y write of HBM
    traffic — nothing else.
    """
    nz, ny, nx = shape
    nzp2, nyp, nxp = x_p.shape
    tz = _pick_tz(nz)
    if tz == 0:
        raise ValueError(f"unsupported nz={nz} for the pallas star7 kernel")
    if (nzp2, nyp, nxp) != padded_shape(shape):
        raise ValueError(
            f"x_p shape {x_p.shape} != padded_shape({shape})="
            f"{padded_shape(shape)}"
        )
    coef = _coef_planes(cx, cy, cz, nxp, x_p.dtype)
    x2 = x_p.reshape(nzp2 * nyp, nxp)
    diag2 = diag_p.reshape(nzp2 * nyp, nxp)

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
        out_shape=jax.ShapeDtypeStruct((nzp2 * nyp, nxp), x_p.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2 * nyp, nxp), x_p.dtype),  # x double buf
            pltpu.VMEM((2, rows, nxp), x_p.dtype),            # diag dbl buf
            pltpu.VMEM((rows, nxp), x_p.dtype),               # y staging
            pltpu.VMEM((FACE * nyp, nxp), x_p.dtype),         # zero faces
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
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
            bytes_accessed=3 * nz * ny * nx * x_p.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coef, x2, diag2)
    return y2.reshape(nzp2, nyp, nxp)


@functools.partial(jax.jit, static_argnames=("pinned", "interpret"))
def star7_mv_pallas(diag, cx, cy, cz, x, pinned: bool, interpret: bool = False):
    """y = A @ x for plain (nz, ny, nx) f32 fields: pad → resident kernel →
    crop.  ``interpret=True`` runs under the Pallas interpreter (any
    backend) — used by the CPU test suite to pin down kernel semantics."""
    nz, ny, nx = x.shape
    nzp2, nyp, nxp = padded_shape(x.shape)
    pad = ((FACE, FACE), (0, nyp - ny), (0, nxp - nx))
    x_p = jnp.pad(x, pad)
    diag_p = jnp.pad(diag, pad)
    y_p = star7_mv_padded(
        diag_p, cx, cy, cz, x_p, (nz, ny, nx), pinned, interpret
    )
    return y_p[FACE:nz + FACE, :ny, :nx]
