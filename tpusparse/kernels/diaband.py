"""Pallas TPU kernel for general banded (DIA) SpMV — the MatMult_SeqAIJ
role for ARBITRARY assembled matrices on the gather-free general path.

Reference anchor: ``/root/reference/src/openacc-step1/MatMult_SeqAIJ.patch:19-30``
— the reference GPU-offloads PETSc's general CSR SpMV; this kernel is the
TPU-native counterpart for the DIA layout the general executor uses
(``sparse/dia.py``: gather-free banded storage, the only general layout the
deployed v5e toolchain runs crash-free inside solver loops).

Why a kernel: the XLA formulation (K ``lax.pad``-shift FMAs) measured
13.4 ms / 14.1 Gnnz/s for the 7-band 300^3 operator — each band's shift is
lane-misaligned, so XLA pays a full relayout per band (results/README.md
roofline).  Here each slab of x is DMA'd once and every band's shifted read
is two ``pltpu.roll``s + a lane select on VMEM-resident data, so the apply
runs at the slab pipeline's streaming bandwidth: traffic = K band passes +
x + y (the information-theoretic minimum for per-entry coefficients).

Structure (mirrors ``kernels/stencil7.py``): gridless pair-pipelined slab
loop, double-buffered input DMAs, double-buffered output writebacks, and
halo sharing for x (consecutive slabs' x windows overlap by 2*HR rows; the
overlap rides in a VMEM tail buffer so x is read from HBM exactly once).

Layouts: x/y are length ``n_pad`` (n rounded up to a whole number of
slabs), zero-tailed; bands ride as ONE slab-major stacked (K * n_pad,)
array (``stack_bands``) so EACH SLAB'S ENTIRE BAND DATA is a single
contiguous DMA.  Offsets are STATIC (they shape the roll/select
constants).  f32 only; the general executor's inner dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8


def _halo_rows(offsets) -> int:
    """Halo row count: the largest |offset| in rows, +1 for the lane spill,
    rounded to the 8-row sublane tile."""
    m = max(abs(int(o)) for o in offsets) if offsets else 0
    hr = m // LANE + 1
    return -(-hr // SUB) * SUB


def _pick_ts(n: int, hr: int, k: int) -> tuple[int, int]:
    """(slab rows, total padded rows).  The slab size is chosen FREELY (no
    row-count divisibility — AMG level operators land on near-prime padded
    row counts) and the row space padded up to a multiple of it: the
    largest 8-multiple fitting the VMEM budget with double buffering,
    capped so small matrices keep >= 2 slabs for the pipeline.  (0, 0)
    when nothing fits (fall back to XLA)."""
    rows_min = -(-(-(-n // LANE)) // SUB) * SUB
    # 48 MB budget (of the ~128 MB VMEM): Mosaic's live-range accounting
    # charges well beyond the declared scratch — the K-band compute loop
    # unrolls fully and its roll/select temporaries overlap (a 100 MB
    # model OOM'd at K=27: 159.6 MB used of 128).  Keep the band slabs
    # (the dominant term, 2*K*ts) under half of VMEM and leave the rest
    # to the compiler.
    budget = 48 * 1024 * 1024 // (LANE * 4)  # total rows of f32 VMEM
    best = 0
    # keep >= 16 slabs when possible: the pair-pipelined loop needs depth
    # to hide its prologue/epilogue (6-slab level-1 measured 85 GB/s vs
    # the fine level's 338 at 104 slabs)
    hi = min(max(rows_min // 16, 8), 2048)
    for ts in range(8, hi + 1, 8):
        # dbl-buf x/bands/y + tail + xw concat + compute-temp slack
        need = ts * (2 * k + 16) + 6 * hr
        if need <= budget:
            best = ts
    if best == 0:
        return 0, 0
    # >= 2 slabs ALWAYS: the pair-pipelined kernel's drain logic waits
    # buffer-0 DMAs that a grid==1 plan would have already consumed (the
    # run(0,...) prefetch lands in buffer 1) — an un-signaled semaphore
    # wait that deadlocks on real TPU.  Padding tiny matrices to a second
    # all-zero slab costs one wasted slab of compute and keeps the
    # pipeline's invariants uniform.
    rows = max(-(-rows_min // best), 2) * best
    return best, rows


def _plan(n: int, offsets) -> tuple[int, int, int]:
    """(ts, rows, hr) for a vector length / offset set; ts == 0 means the
    kernel cannot run this shape."""
    hr = _halo_rows(offsets)
    ts, rows = _pick_ts(n, hr, len(offsets))
    return ts, rows, hr


def n_padded(n: int, offsets=(0,)) -> int:
    _ts, rows, _hr = _plan(n, offsets)
    return rows * LANE


def supported(n: int, offsets: tuple[int, ...], dtype) -> bool:
    """Kernel eligibility: f32, offsets small enough that the halo fits
    comfortably beside a slab in VMEM, and enough rows to pipeline."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if len(offsets) > 48:
        return False
    ts, _rows, _hr = _plan(n, offsets)
    return ts > 0


def stack_bands(bands, offsets, n: int):
    """(K, n) band array -> the kernel's SLAB-MAJOR stacked (K * R, LANE)
    2-D HBM layout: slab i's rows [i*K*ts, (i+1)*K*ts) hold ALL K bands
    of that slab (band j at sub-rows [j*ts, (j+1)*ts)), so every slab's
    band data arrives in ONE contiguous DMA.  (The band-major layout
    needed K DMAs/slab; their issue+wait overhead dominated small levels:
    a 27-band 1M-row mv measured 1.4 ms of ~pure semaphore traffic.)
    Done ONCE at container build; zero-padded tails keep the
    pad-output-zero invariant."""
    import numpy as np

    k, _ = bands.shape
    ts, rows, _hr = _plan(n, offsets)
    npad = rows * LANE
    ns = rows // ts
    if isinstance(bands, np.ndarray):
        out = np.zeros((k, npad), bands.dtype)
        out[:, :n] = bands
        out = out.reshape(k, ns, ts, LANE).transpose(1, 0, 2, 3)
        return jnp.asarray(np.ascontiguousarray(out).reshape(-1, LANE))
    out = jnp.zeros((k, npad), bands.dtype)
    out = out.at[:, :n].set(bands)
    out = out.reshape(k, ns, ts, LANE).transpose(1, 0, 2, 3)
    return out.reshape(-1, LANE)


def _kernel(
    x_hbm, b_hbm, y_hbm, xs, bsb, ys, xtail, sx, sb, swb, stl,
    *, offsets, ts, rows, hr, n,
):
    """Pair-pipelined slab loop.  ``rows`` = total 2-D rows; slab i owns
    rows [i*ts, (i+1)*ts); its x window is rows [i*ts - hr, (i+1)*ts + hr)
    (clamped reads handled by priming/tail logic: the window is assembled
    from the tail buffer + the freshly DMA'd new part)."""
    i32 = jnp.int32
    k = len(offsets)
    grid = rows // ts

    def dma_x(i, buf):
        # new part of slab i's window: rows [i*ts + hr, i*ts + hr + ts) of
        # a VIRTUAL row space shifted by +hr (the HBM array is prefixed by
        # hr zero rows via the caller's pad — see dia_mv_pallas)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * i32(ts) + i32(2 * hr), ts)],
            xs.at[jnp.int32(buf)], sx.at[jnp.int32(buf)],
        )

    def dma_b(i, buf):
        # slab-major layout: slab i's K band slabs are ONE contiguous
        # k*ts-row range (band j lands at buffer rows [j*ts, (j+1)*ts))
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(i * i32(k * ts), k * ts)],
            bsb.at[jnp.int32(buf)],
            sb.at[jnp.int32(buf)],
        )

    def wb(i, buf):
        return pltpu.make_async_copy(
            ys.at[jnp.int32(buf)],
            y_hbm.at[pl.ds(i * i32(ts), ts)],
            swb.at[jnp.int32(buf)],
        )

    lane = jax.lax.broadcasted_iota(i32, (ts, LANE), 1)

    def compute(i, buf):
        new = xs[jnp.int32(buf)]
        xw = jnp.concatenate([xtail[...], new], axis=0)  # (ts + 2hr, LANE)
        xtail[...] = xw[ts:ts + 2 * hr]
        bands = bsb[jnp.int32(buf)]
        y = jnp.zeros((ts, LANE), jnp.float32)
        for j, off in enumerate(offsets):
            o = int(off)
            q, c = divmod(o, LANE)  # x[e+o] = row e/LANE + q (+1), lane +c
            a = xw[hr + q:hr + q + ts]
            bv = bands[j * ts:(j + 1) * ts]
            if c == 0:
                y = y + bv * a
                continue
            b2 = xw[hr + q + 1:hr + q + 1 + ts]
            ra = pltpu.roll(a, i32(LANE - c), 1)
            rb = pltpu.roll(b2, i32(LANE - c), 1)
            y = y + bv * jnp.where(lane < LANE - c, ra, rb)
        return y

    def run(i, buf, prefetch, pbuf, wait_wb):
        dma_x(prefetch, pbuf).start()
        dma_b(prefetch, pbuf).start()
        dma_x(i, buf).wait()
        dma_b(i, buf).wait()
        if wait_wb:
            wb(i - i32(2), buf).wait()
        ys[jnp.int32(buf)] = compute(i, buf)
        wb(i, buf).start()

    # prime the tail: virtual rows [-hr, hr) = HBM rows [0, 2hr) of the
    # hr-prefixed x array
    tl = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 2 * hr)], xtail, stl)
    tl.start()
    dma_x(i32(0), 0).start()
    dma_b(i32(0), 0).start()
    tl.wait()

    run(i32(0), 0, jax.lax.rem(i32(1), i32(grid)), 1, False)
    if grid > 1:
        run(i32(1), 1, jax.lax.rem(i32(2), i32(grid)), 0, False)

    def pair(j, carry):
        first = j * i32(2)
        run(first, 0, jax.lax.rem(first + 1, i32(grid)), 1, True)
        run(first + 1, 1, jax.lax.rem(first + 2, i32(grid)), 0, True)
        return carry

    n_pairs = grid // 2
    if n_pairs > 1:
        jax.lax.fori_loop(i32(1), i32(n_pairs), pair, i32(0), unroll=False)
    if grid % 2 and grid > 1:
        last = i32(grid - 1)
        dma_x(last, 0).wait()
        dma_b(last, 0).wait()
        if grid > 2:
            wb(last - i32(2), 0).wait()
        ys[jnp.int32(0)] = compute(last, 0)
        wb(last, 0).start()
    else:
        dma_x(i32(0), 0).wait()
        dma_b(i32(0), 0).wait()

    wb(i32(grid - 1), (grid - 1) % 2).wait()
    if grid > 1:
        wb(i32(grid - 2), (grid - 2) % 2).wait()


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "interpret", "ts_override")
)
def dia_mv_pallas(
    kbands, x, offsets: tuple[int, ...], n: int,
    interpret: bool = False, ts_override: int | None = None,
):
    """y = A @ x for a DIA matrix with STATIC ``offsets``.

    ``kbands``: the ``stack_bands`` layout ((K*R, LANE), zero-tailed).
    ``x``: flat (n,) f32.  Returns flat (n,) f32.  The pad/crop of x/y is
    2 extra XLA passes per call — callers holding padded vectors can pass
    ``n == n_padded`` views to avoid it.
    """
    ts, rows, hr = _plan(n, offsets)
    if ts_override:
        ts = ts_override
        rows_min = -(-(-(-n // LANE)) // SUB) * SUB
        rows = -(-rows_min // ts) * ts
    npad = rows * LANE
    k = len(offsets)
    if kbands.shape != (k * rows, LANE):
        raise ValueError(
            f"kbands {kbands.shape} != {(k * rows, LANE)} for n={n}"
        )
    if ts == 0:
        raise ValueError(f"no slab size fits n={n}, K={k}")
    # hr-row zero prefix and suffix make every window read in-bounds
    # (virtual rows [-hr, rows + hr)); lax.pad fuses with the reshape
    x2 = jnp.pad(x.astype(jnp.float32), (0, npad - n)).reshape(rows, LANE)
    x2 = jnp.pad(x2, ((hr, hr), (0, 0)))

    kernel = functools.partial(
        _kernel, offsets=tuple(int(o) for o in offsets),
        ts=ts, rows=rows, hr=hr, n=n,
    )
    y2 = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x (hr-prefixed)
            pl.BlockSpec(memory_space=pl.ANY),   # stacked bands
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ts, LANE), jnp.float32),       # x double buf
            pltpu.VMEM((2, k * ts, LANE), jnp.float32),   # band slabs
            pltpu.VMEM((2, ts, LANE), jnp.float32),       # y staging
            pltpu.VMEM((2 * hr, LANE), jnp.float32),      # x tail
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n,
            bytes_accessed=(k + 2) * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, kbands)
    return y2.reshape(-1)[:n]
