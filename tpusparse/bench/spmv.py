"""SpMV microbenchmark — per-chip GB/s and nnz/s (BASELINE.json metric).

Benchmarks both storage strategies on the 7-point Poisson operator:
- padded-ELL (general sparse; MatMult_SeqAIJ-style row kernel), and
- the structured stencil form (gather-free),
reporting achieved bandwidth against the pessimistic traffic models in
``utils/metrics.py``.  Run on the real chip:

    python -m tpusparse.bench.spmv [N] [reps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def bench_op(name, fn, *args, flops, bytes_, nnz, reps=20):
    """Time ``reps`` chained applications inside ONE jitted program.

    Per-dispatch latency through a tunneled backend is 2-4 ms — larger than
    many kernels being measured — so timing eager dispatches per rep would
    measure the tunnel, not the chip.  Chaining y -> fn(y) inside a
    fori_loop amortizes dispatch to nothing and keeps data dependencies so
    XLA cannot elide iterations.
    """
    from tpusparse.utils.metrics import KernelStats

    op, x = args

    @jax.jit
    def run(op, x):
        return jax.lax.fori_loop(0, reps, lambda i, v: fn(op, v), x)

    float(jnp.sum(run(op, x)))  # compile + warm (sync via scalar fetch)
    t0 = time.perf_counter()
    float(jnp.sum(run(op, x)))
    dt = (time.perf_counter() - t0) / reps
    return KernelStats(name=name, seconds=dt, flops=flops, bytes=bytes_, nnz=nnz)


def run(n: int = 300, reps: int = 20, dtype=jnp.float64):
    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import assemble_poisson, poisson_stencil
    from tpusparse.sparse.ell import ELL
    from tpusparse.utils.metrics import (
        ell_mv_traffic,
        spmv_flops,
        stencil_mv_traffic,
    )

    grid = Grid3D(n, n, n)
    vb = jnp.dtype(dtype).itemsize
    stats = []

    # stencil form
    op, b, _ = poisson_stencil(grid, dtype=jnp.dtype(dtype).type)
    mv = jax.jit(lambda o, x: o.mv(x))
    nnz7 = 7 * grid.n - 2 * (  # interior entries actually stored
        grid.ny * grid.nz + grid.nx * grid.nz + grid.nx * grid.ny
    )
    stats.append(
        bench_op(
            f"stencil7_mv_{n}^3_{jnp.dtype(dtype).name}", mv, op, b,
            flops=spmv_flops(nnz7, grid.n),
            bytes_=stencil_mv_traffic(grid.n, vb),
            nnz=nnz7, reps=reps,
        )
    )

    # resident-padded Pallas form (TPU only; the reference's step-4 analog)
    from tpusparse.kernels.stencil7 import is_tpu_backend, star7_supported

    if (
        jnp.dtype(dtype) == jnp.float32
        and is_tpu_backend()
        and star7_supported(grid.shape, jnp.float32)
    ):
        from tpusparse.sparse.padded import PaddedStar, pad_field

        op_p = PaddedStar.from_star(op)
        b_p = pad_field(b)
        stats.append(
            bench_op(
                f"stencil7_pallas_resident_{n}^3_f32",
                lambda o, x: o.mv(x), op_p, b_p,
                flops=spmv_flops(nnz7, grid.n),
                bytes_=stencil_mv_traffic(grid.n, vb),
                nnz=nnz7, reps=reps,
            )
        )

    # DIA form: the gather-free GENERAL-matrix container (sparse/dia.py) —
    # runs at any size on the deployed libtpu (no gather to crash), so it
    # fills the general-SpMV roofline row the ELL cap leaves open.
    from tpusparse.sparse.dia import DIA

    a, bh, _ = assemble_poisson(grid, dtype=jnp.dtype(dtype).type)
    dia = DIA.from_csr(a)
    xd = jnp.asarray(bh)
    stats.append(
        bench_op(
            f"dia{len(dia.offsets)}_mv_{n}^3_{jnp.dtype(dtype).name}",
            lambda d, x: d.mv(x), dia, xd,
            flops=spmv_flops(a.nnz, grid.n),
            # traffic: K band reads + K shifted x streams + y write
            bytes_=(2 * len(dia.offsets) + 1) * grid.n * vb,
            nnz=a.nnz, reps=reps,
        )
    )

    # Pallas banded kernel over the SAME matrix (kernels/diaband.py): the
    # general-matrix hot kernel (MatMult_SeqAIJ role) — slab-pipelined
    # band streams instead of XLA's per-band lane-relayout shifts.
    from tpusparse.sparse.dia import PallasDIA

    if (
        jnp.dtype(dtype) == jnp.float32
        and is_tpu_backend()
        and PallasDIA.supported(dia)
    ):
        pdia = PallasDIA.from_dia(dia)
        stats.append(
            bench_op(
                f"diaband_pallas{len(dia.offsets)}_mv_{n}^3_f32",
                lambda d, x: d.mv(x), pdia, xd,
                flops=spmv_flops(a.nnz, grid.n),
                # traffic: K band reads + x read + y write (the kernel's
                # halo-tail reuse reads x exactly once)
                bytes_=(len(dia.offsets) + 2) * grid.n * vb,
                nnz=a.nnz, reps=reps,
            )
        )

    # ELL form (width 8).  Deployed-libtpu caveat: gather-based mv crashes
    # the TPU worker above a few million rows even in fixed-trip loops
    # (2.1M rows fine, 27M fatal — see sparse/bsr.py known-issue note), so
    # the ELL benchmark is skipped on TPU beyond a conservative cap.
    if is_tpu_backend() and grid.n > 4_000_000:
        print(f"# ell8_mv_{n}^3 skipped on TPU (gather cap, {grid.n} rows)")
        return stats
    ell = ELL.from_csr(a, width=8)
    x = jnp.asarray(bh)
    mv_ell = jax.jit(lambda e, x: e.mv(x))
    stats.append(
        bench_op(
            f"ell8_mv_{n}^3_{jnp.dtype(dtype).name}", mv_ell, ell, x,
            flops=spmv_flops(a.nnz, grid.n),
            bytes_=ell_mv_traffic(grid.n, 8, vb),
            nnz=a.nnz, reps=reps,
        )
    )
    return stats


def main():
    jax.config.update("jax_enable_x64", True)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    for dtype in (jnp.float32, jnp.float64):
        for s in run(n, reps, dtype):
            print(s.line())


if __name__ == "__main__":
    main()
