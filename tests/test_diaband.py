"""Pallas banded (DIA) SpMV kernel vs the XLA shift pipeline / scipy.

The kernel (kernels/diaband.py) fills the MatMult_SeqAIJ role for ARBITRARY
assembled matrices on the gather-free general path (reference anchor:
/root/reference/src/openacc-step1/MatMult_SeqAIJ.patch:19-30).  Runs under
the Pallas interpreter so the slab pipeline's semantics — halo-tail x reuse,
per-band roll/select shifted reads, stacked-band DMA addressing — are pinned
without TPU hardware.  Real-chip numbers come from bench/spmv.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.kernels.diaband import (
    dia_mv_pallas,
    n_padded,
    stack_bands,
    supported,
)
from tpusparse.sparse.dia import DIA


def _random_dia(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    k = len(offsets)
    bands = rng.standard_normal((k, n)).astype(np.float32)
    r = np.arange(n)
    for i, o in enumerate(offsets):
        bands[i, (r + o < 0) | (r + o >= n)] = 0.0  # DIA frame convention
    return bands


@pytest.mark.parametrize(
    "n,offsets",
    [
        (5000, (-70, -1, 0, 1, 70)),
        (12000, (-300, -20, -1, 0, 1, 20, 300)),  # 7-band star shape
        (4096, (0,)),                              # diagonal only
        (9000, (-2500, -130, 0, 130, 2500)),       # multi-row halo
        (6000, (-1, 0, 1, 2, 3, 5, 8, 13)),        # asymmetric cluster
    ],
)
@pytest.mark.slow
def test_kernel_matches_dia_mv(n, offsets):
    bands = _random_dia(n, offsets)
    x = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    d = DIA(bands=jnp.asarray(bands), offsets=offsets, shape=(n, n))
    y_ref = np.asarray(d.mv(jnp.asarray(x)))
    assert supported(n, offsets, np.float32)
    kb = stack_bands(bands, offsets, n)
    y = np.asarray(
        dia_mv_pallas(kb, jnp.asarray(x), offsets, n, interpret=True)
    )
    scale = np.abs(y_ref).max() + 1e-30
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5 * scale)


def test_kernel_matches_scipy_poisson():
    """7-point Poisson bands (the reference's matrix class) vs scipy."""
    import scipy.sparse as sp

    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import assemble_poisson

    grid = Grid3D(12, 10, 8)
    a, _b, _e = assemble_poisson(grid, pin=True, dtype=np.float32)
    bands, offsets, shape = DIA.host_bands(a, dtype=np.float32)
    n = shape[0]
    x = np.random.default_rng(2).standard_normal(n).astype(np.float32)
    y_ref = a.to_scipy().astype(np.float32) @ x
    kb = stack_bands(bands, offsets, n)
    y = np.asarray(
        dia_mv_pallas(kb, jnp.asarray(x), tuple(offsets), n, interpret=True)
    )
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_stack_bands_layout():
    """Slab-major: slab i holds all K bands contiguously (band j at
    sub-rows [j*ts, (j+1)*ts)), zero-padded tails."""
    from tpusparse.kernels.diaband import _plan

    n, offsets = 400_000, (-3, 0, 7)
    bands = _random_dia(n, offsets, seed=3)
    kb = np.asarray(stack_bands(bands, offsets, n))
    ts, rows, _hr = _plan(n, offsets)
    ns = rows // ts
    assert ns > 1  # exercise real interleaving
    assert kb.shape == (3 * rows, 128)
    v = kb.reshape(ns, 3, ts, 128)
    for k in range(3):
        flat = v[:, k].reshape(-1)
        np.testing.assert_array_equal(flat[:n], bands[k])
        assert not flat[n:].any()
    assert n_padded(n, offsets) == rows * 128


def test_unsupported_dtype_and_width():
    assert not supported(5000, (0, 1), np.float64)  # f32 only
    assert not supported(5000, tuple(range(-30, 30)), np.float32)  # K > 48


def test_pallas_dia_container_roundtrip():
    """PallasDIA wraps a DIA, preserves mv semantics (interpret) and
    diagonal(), and exposes the stacked layout."""
    from tpusparse.sparse.dia import PallasDIA

    n, offsets = 5000, (-70, -1, 0, 1, 70)
    bands = _random_dia(n, offsets, seed=4)
    d = DIA(bands=jnp.asarray(bands), offsets=offsets, shape=(n, n))
    p = PallasDIA.from_dia(d, interpret=True)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal(n).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(p.mv(x)), np.asarray(d.mv(x)), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(p.diagonal()), np.asarray(d.diagonal()), rtol=0, atol=0
    )
    assert p.shape == (n, n)
    assert p.n_rows == n


@pytest.mark.parametrize("n", [256, 1000, 1024])
def test_small_n_keeps_two_slabs(n):
    """Tiny matrices (n <= LANE*SUB = 1024, e.g. the coarsest AMG level
    lifted by the driver) must get a >= 2-slab plan: a grid==1 plan
    deadlocks the drain's buffer-0 semaphore waits on real TPU (the
    run(0,...) prefetch lands in buffer 1).  Numerics still match."""
    from tpusparse.kernels.diaband import _plan

    offsets = (-3, -1, 0, 1, 3)
    ts, rows, _hr = _plan(n, offsets)
    assert ts > 0 and rows // ts >= 2
    bands = _random_dia(n, offsets, seed=6)
    x = np.random.default_rng(7).standard_normal(n).astype(np.float32)
    d = DIA(bands=jnp.asarray(bands), offsets=offsets, shape=(n, n))
    y_ref = np.asarray(d.mv(jnp.asarray(x)))
    kb = stack_bands(bands, offsets, n)
    y = np.asarray(
        dia_mv_pallas(kb, jnp.asarray(x), offsets, n, interpret=True)
    )
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-4)
