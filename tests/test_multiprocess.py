"""Two-process jax.distributed smoke test — the first real exercise of the
process-boundary path (MPI_Init/aprun parity, VERDICT item 9).

Spawns two fresh CPU-backend processes on localhost; each initializes the
distributed runtime through ``tpusparse.dist.multihost.initialize`` (env-var
form), builds a process-spanning mesh, and runs a psum across processes —
the MPI_Allreduce traffic class of the reference (SURVEY.md section 5.8).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, __REPO__)
import jax
jax.config.update("jax_platforms", "cpu")

import tpusparse.dist.multihost as mh

mh.initialize()  # from JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID
info = mh.describe()
assert info["process_count"] == 2, info
assert info["global_devices"] == 2 * info["local_devices"], info

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()), ("p",))
n = len(jax.devices())
# global array sharded across BOTH processes; one psum-reducing dot
x = jax.make_array_from_callback(
    (n * 8,), NamedSharding(mesh, P("p")),
    lambda idx: np.full((8,), 1.0 + jax.process_index(), np.float64)[
        : idx[0].stop - idx[0].start if idx[0].stop else 8
    ],
)
total = jax.jit(lambda v: jnp.sum(v))(x)
# each process contributed local_devices*8 entries of (1+pid)
want = 8 * info["local_devices"] * (1.0 + 0.0) + 8 * info["local_devices"] * (1.0 + 1.0)
assert abs(float(total) - want) < 1e-12, (float(total), want)
print(f"proc {info['process_index']}: OK total={float(total)}")
"""


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("__REPO__", repr(repo)))
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, cwd=repo,
            )
        )
    outs = [p.communicate(timeout=150) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-2000:]}"
        assert "OK total=" in out


_SOLVE_WORKER = r"""
import os, sys
sys.path.insert(0, __REPO__)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import tpusparse.dist.multihost as mh

mh.initialize()
NPROC = int(os.environ["JAX_NUM_PROCESSES"])
assert mh.describe()["process_count"] == NPROC

import numpy as np
import jax.numpy as jnp
from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.dist import (
    field_sharding, make_mesh, shard_hierarchy, shard_system,
)
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil
from tpusparse.solve import cg

grid = Grid3D(12, 12, 24)
op, b, exact = poisson_stencil(grid)
hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))

mesh = make_mesh(len(jax.devices()))   # 2*NPROC devices spanning NPROC processes
op_s, b_s, exact_s = shard_system(op, b, exact, mesh)
hier_s = shard_hierarchy(hier, mesh)

@jax.jit
def step(op, hier, b):
    res = cg(op.mv, b, rtol=1e-8, maxiter=100, m_mv=lambda r: vcycle(hier, r))
    return res.x, res.resnorm, res.iters, res.reason

x, rnorm, iters, reason = step(op_s, hier_s, b_s)
assert int(reason) > 0, int(reason)
linf = float(jnp.max(jnp.abs(x - exact_s)))     # replicated scalar fetch
assert linf < 0.1, linf                          # O(h^2) at h=1/12
assert len(x.sharding.device_set) == 2 * NPROC, x.sharding
print(f"proc {jax.process_index()}: SOLVE OK iters={int(iters)} linf={linf:.3e}")
"""


def _run_solve_procs(tmp_path, nproc: int, timeout: int):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "solve_worker.py"
    script.write_text(_SOLVE_WORKER.replace("__REPO__", repr(repo)))
    procs = []
    for pid in range(nproc):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES=str(nproc),
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, cwd=repo,
            )
        )
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-2000:]}"
        assert "SOLVE OK" in out


@pytest.mark.slow
def test_two_process_sharded_cg_gamg_solve(tmp_path):
    """A FULL CG+GAMG solve sharded across two OS processes — every CG dot
    is a cross-process allreduce and every fine-level apply halo-exchanges
    over the process boundary (the reference's multi-rank KSPSolve,
    runs/multiple-node-scaling.pbs:57-68, on localhost DCN)."""
    _run_solve_procs(tmp_path, 2, 420)


@pytest.mark.slow
def test_four_process_sharded_cg_gamg_solve(tmp_path):
    """The same solve across FOUR processes (8 devices on a (4,2) mesh):
    halo planes cross three process boundaries and the mesh spans both
    axes — the closest localhost analogue of the reference's multi-node
    sweep (runs/multiple-node-scaling.pbs:57-68; VERDICT item 5)."""
    _run_solve_procs(tmp_path, 4, 600)
