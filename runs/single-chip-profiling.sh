#!/usr/bin/env bash
# Parity with runs/single-node-profiling.pbs (Score-P instrumented run):
# one full solve under the JAX profiler; view the trace with
#   tensorboard --logdir runs/trace
set -euo pipefail
cd "$(dirname "$0")/.."
N="${N:-300}"
python -m tpusparse -da_grid_x "$N" -da_grid_y "$N" -da_grid_z "$N" \
  -config configs/SolverOptions_GAMG.info -ksp_rtol 1e-8 \
  -profile runs/trace
