"""Checkpoint/resume: snapshots round-trip and resumed solves converge to
the same answer as uninterrupted ones."""

import jax.numpy as jnp
import numpy as np

from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg
from tpusparse.solve.checkpoint import (
    CheckpointConfig,
    cg_checkpointed,
    load_pytree,
    save_pytree,
)


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(10, dtype=jnp.float64),
        "b": (jnp.ones((3, 4)), jnp.int32(7)),
    }
    p = save_pytree(tmp_path / "state.npz", tree, {"iters": 42})
    restored, meta = load_pytree(p, tree)
    assert meta["iters"] == 42
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(10))
    np.testing.assert_array_equal(np.asarray(restored["b"][0]), np.ones((3, 4)))


def test_checkpointed_matches_direct(tmp_path):
    grid = Grid3D(12, 12, 12)
    op, b, exact = poisson_stencil(grid)

    direct = cg(op.mv, b, rtol=1e-10, maxiter=2000)
    cfg = CheckpointConfig(path=tmp_path / "cg.npz", every=25)
    res, total = cg_checkpointed(op.mv, b, cfg, rtol=1e-10, maxiter=2000)
    assert res.converged()
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(direct.x), rtol=1e-7, atol=1e-9
    )


def test_resume_from_partial(tmp_path):
    """Kill after a few chunks; a fresh call resumes and still converges."""
    grid = Grid3D(12, 12, 12)
    op, b, exact = poisson_stencil(grid)
    cfg = CheckpointConfig(path=tmp_path / "cg.npz", every=20)

    # phase 1: budget too small to converge -> leaves a snapshot behind
    res1, it1 = cg_checkpointed(op.mv, b, cfg, rtol=1e-12, maxiter=40)
    assert not res1.converged()
    assert (tmp_path / "cg.npz").exists()

    # phase 2: resume picks up the saved iterate and finishes
    res2, it2 = cg_checkpointed(op.mv, b, cfg, rtol=1e-12, maxiter=2000)
    assert res2.converged()
    assert it2 > it1  # global count includes the resumed work
    direct = cg(op.mv, b, rtol=1e-12, maxiter=2000)
    np.testing.assert_allclose(
        np.asarray(res2.x), np.asarray(direct.x), rtol=1e-6, atol=1e-8
    )
