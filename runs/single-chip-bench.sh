#!/usr/bin/env bash
# The headline benchmark run (reference comparison point: best Titan node,
# 16 cores + K20x, ~25-35 s KSPSolve at 300^3 — BASELINE.md).
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py
