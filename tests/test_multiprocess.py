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
