"""ELL container tests: round-trip, SpMV/rmv/diagonal vs scipy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse import ELL, Grid3D, HostCSR
from tpusparse.grid.poisson import assemble_poisson


def _random_csr(n, m, density, seed):
    rng = np.random.default_rng(seed)
    a = sp.random(n, m, density=density, random_state=rng, format="csr")
    a.data = rng.standard_normal(a.nnz) + 1.0  # avoid zeros = padding marker
    a.sort_indices()
    return HostCSR.from_scipy(a)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("shape,density", [((40, 40), 0.1), ((64, 17), 0.3), ((7, 90), 0.05)])
def test_roundtrip_and_mv(shape, density, seed):
    csr = _random_csr(*shape, density, seed)
    ell = ELL.from_csr(csr)
    back = ell.to_csr()
    assert abs(back.to_scipy() - csr.to_scipy()).max() < 1e-14

    rng = np.random.default_rng(seed + 100)
    x = rng.standard_normal(shape[1])
    np.testing.assert_allclose(
        np.asarray(ell.mv(jnp.asarray(x))),
        csr.to_scipy() @ x,
        rtol=1e-12,
        atol=1e-12,
    )


def test_mv_wider_padding():
    csr = _random_csr(30, 30, 0.2, 3)
    for w in (csr.max_row_nnz, csr.max_row_nnz + 5):
        ell = ELL.from_csr(csr, width=w)
        x = np.linspace(-1, 1, 30)
        np.testing.assert_allclose(
            np.asarray(ell.mv(jnp.asarray(x))), csr.to_scipy() @ x, rtol=1e-12
        )


def test_width_too_small_raises():
    csr = _random_csr(30, 30, 0.3, 4)
    with pytest.raises(ValueError):
        ELL.from_csr(csr, width=1)


def test_rmv_is_transpose_mv():
    csr = _random_csr(25, 40, 0.15, 5)
    ell = ELL.from_csr(csr)
    y = np.random.default_rng(6).standard_normal(25)
    np.testing.assert_allclose(
        np.asarray(ell.rmv(jnp.asarray(y))),
        csr.to_scipy().T @ y,
        rtol=1e-12,
        atol=1e-12,
    )


def test_diagonal_poisson():
    g = Grid3D(5, 4, 3)
    a, _, _ = assemble_poisson(g)
    ell = ELL.from_csr(a)
    np.testing.assert_allclose(np.asarray(ell.diagonal()), a.diagonal(), rtol=1e-14)


def test_poisson_ell_mv():
    g = Grid3D(6, 6, 6)
    a, b, _ = assemble_poisson(g)
    ell = ELL.from_csr(a, width=8)  # pad 7 -> 8 (lane-friendly)
    x = np.random.default_rng(7).standard_normal(g.n)
    np.testing.assert_allclose(
        np.asarray(ell.mv(jnp.asarray(x))), a.to_scipy() @ x, rtol=1e-12, atol=1e-12
    )
