"""-ksp_monitor residual history + richardson/preonly CLI wiring.

Reference analogue: PETSc's ``-ksp_monitor`` (exercisable via the options
file the reference ingests, ``src/main_ksp.cpp:74-77``) prints
``  %d KSP Residual norm %e`` per iteration during KSPSolve.  Our solve is a
single compiled program, so the history is recorded in the loop carry and
rendered afterwards — same data, no per-iteration host round-trip.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.bench.driver import solve_poisson
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg
from tpusparse.solve.simple import preonly, richardson


def _system(n=12, dtype=np.float64):
    grid = Grid3D(n, n, n)
    return poisson_stencil(grid, dtype=dtype)


def test_cg_history_matches_contract():
    op, b, _ = _system()
    res, hist = cg(op.mv, b, rtol=1e-8, maxiter=300, history=True)
    assert res.converged()
    it = int(res.iters)
    h = np.asarray(hist)
    assert h.shape == (301,)
    # index 0 = initial residual = ||b|| (x0 = 0)
    np.testing.assert_allclose(h[0], float(res.bnorm), rtol=1e-6)
    # final recorded entry agrees with the reported final residual
    np.testing.assert_allclose(h[it], float(res.resnorm), rtol=1e-5)
    # unwritten tail stays zero
    assert np.all(h[it + 1:] == 0.0)
    # monitoring must not perturb the iteration sequence
    plain = cg(op.mv, b, rtol=1e-8, maxiter=300)
    assert int(plain.iters) == it


def test_richardson_history():
    op, b, _ = _system()
    minv = 1.0 / op.diagonal_field()
    res, hist = richardson(
        op.mv, b, rtol=1e-4, maxiter=500, m_mv=lambda r: minv * r,
        scale=0.9, history=True,
    )
    assert res.converged()
    h = np.asarray(hist)[: int(res.iters) + 1]
    np.testing.assert_allclose(h[-1], float(res.resnorm), rtol=1e-5)


def test_preonly_history():
    op, b, _ = _system()
    res, hist = preonly(op.mv, b, history=True)
    assert np.asarray(hist).shape == (2,)
    np.testing.assert_allclose(
        np.asarray(hist), [float(res.bnorm), float(res.resnorm)], rtol=1e-6
    )


@pytest.mark.slow
@pytest.mark.parametrize("precision", ["f64", "mixed"])
def test_driver_monitor(precision):
    rep = solve_poisson(
        12, rtol=1e-8, precision=precision, monitor=True, warmup=False
    )
    assert rep.residual_history is not None
    n_expected = (rep.outer_iters if precision == "mixed" else rep.iters) + 1
    assert len(rep.residual_history) == n_expected
    # monotone-ish: first entry is the largest (initial residual)
    assert rep.residual_history[0] == max(rep.residual_history)
    block = rep.monitor_block()
    lines = block.splitlines()
    assert len(lines) == n_expected
    assert re.match(r"\s+0 KSP Residual norm \d", lines[0])
    # JSON sidecar carries the history (no text scraping needed)
    import json

    assert json.loads(rep.json_sidecar())["residual_history"] == \
        rep.residual_history


@pytest.mark.slow
def test_driver_richardson_and_preonly_ksp():
    """VERDICT item 5: -ksp_type richardson/preonly must run end-to-end."""
    rr = solve_poisson(
        12, rtol=1e-6, precision="f64", ksp="richardson", pc="gamg",
        warmup=False,
    )
    assert rr.reason > 0
    assert rr.linf_error < 5e-2
    # preonly under mixed precision = one V-cycle per defect-correction sweep
    rp = solve_poisson(
        12, rtol=1e-8, precision="mixed", ksp="preonly", pc="gamg",
        warmup=False,
    )
    assert rp.reason > 0
    assert rp.linf_error < 5e-2


@pytest.mark.slow
def test_ksp_view():
    """-ksp_view: KSPView/PCView-parity configuration description."""
    rep = solve_poisson(12, rtol=1e-8, precision="mixed", view=True,
                        warmup=False)
    v = rep.solver_view
    assert v is not None
    assert "KSP Object: type cg" in v
    assert "PC Object: type gamg" in v
    assert "level 0:" in v and "1728 unknowns" in v


def test_cli_ksp_view(capsys):
    from tpusparse.__main__ import main

    rc = main(
        ["-da_grid_x", "12", "-da_grid_y", "12", "-da_grid_z", "12",
         "-ksp_view", "-ksp_rtol", "1e-6", "-precision", "f64"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "KSP Object" in out and "PC Object" in out


def test_cli_log_view(capsys):
    from tpusparse.__main__ import main

    rc = main(
        ["-da_grid_x", "12", "-da_grid_y", "12", "-da_grid_z", "12",
         "-log_view", "-ksp_rtol", "1e-6", "-precision", "f64"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Performance Summary" in out
    assert "GFLOP/s" in out and "solve" in out


def test_cli_converged_reason(capsys):
    """-ksp_converged_reason: PETSc's KSPConvergedReasonView line
    ('Linear solve converged due to CONVERGED_RTOL iterations N')."""
    from tpusparse.__main__ import main

    rc = main(
        ["-da_grid_x", "12", "-da_grid_y", "12", "-da_grid_z", "12",
         "-ksp_converged_reason", "-ksp_rtol", "1e-6", "-precision", "f64"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    m = re.search(
        r"Linear solve converged due to (CONVERGED_\w+) iterations (\d+)",
        out,
    )
    assert m, out
    # the iteration count in the reason line matches the summary block
    assert f"Number of iterations: {m.group(2)}" in out


def test_converged_reason_line_negative():
    """A negative reason renders as 'did not converge' with the enum name."""
    from tpusparse.bench.driver import SolveReport
    from tpusparse.solve.cg import ConvergedReason

    rep = SolveReport.__new__(SolveReport)
    rep.reason = int(ConvergedReason.DIVERGED_ITS)
    rep.iters = 10000
    line = rep.converged_reason_line()
    assert "did not converge" in line
    assert "DIVERGED_ITS" in line and "10000" in line


def test_cli_richardson_monitor(capsys):
    """The VERDICT done-criterion: python -m tpusparse -ksp_type richardson
    -ksp_monitor runs."""
    from tpusparse.__main__ import main

    rc = main(
        [
            "-da_grid_x", "12", "-da_grid_y", "12", "-da_grid_z", "12",
            "-ksp_type", "richardson", "-ksp_monitor",
            "-ksp_rtol", "1e-6", "-precision", "f64",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "KSP Residual norm" in out
    assert "Number of iterations" in out
