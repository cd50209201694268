#!/usr/bin/env bash
# Parity with the reference's runs/single-node-scaling.pbs: the same 300^3
# problem at a sweep of parallel widths on one node.  On TPU the sweep is
# over VIRTUAL device counts (host-emulated mesh) for the communication
# paths, plus the one real chip for absolute time; the reference swept MPI
# ranks 16,8,4,2,1 on one Titan node (single-node-scaling.pbs:56-67).
set -euo pipefail
cd "$(dirname "$0")/.."
N="${N:-128}"
OUT="${OUT:-runs/scaling_strong.json}"
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m tpusparse.bench.scaling strong --n "$N" --devices 1,2,4,8 \
    --precision f64 --out "$OUT"
