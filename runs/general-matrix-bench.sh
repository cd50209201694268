#!/usr/bin/env bash
# The GENERAL-MATRIX (arbitrary-CSR) benchmark: the same 300^3 Poisson
# system assembled as a host CSR and solved through -mat_type aij —
# DMSetMatType(MATAIJ) parity (/root/reference/src/helper.cpp:39), the
# matrix type the reference actually ships, solved by PETSc through its
# patched general-CSR kernel (src/openacc-step1/MatMult_SeqAIJ.patch).
#
# Comparison point: the reference's best node (16 cores + K20x) solves
# this in ~25-35 s of KSPSolve time (BASELINE.md).  The record of the
# run lands next to this script as general_matrix_<N>.json.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${N:-300}"
OUT="${OUT:-runs/general_matrix_${N}.json}"
python -m tpusparse -da_grid_x "$N" -da_grid_y "$N" -da_grid_z "$N" \
  -mat_type aij -ksp_rtol 1e-8 -ksp_atol 1e-12 -log_view \
  | tee /dev/stderr | awk '/^JSON:/ {sub(/^JSON: /, ""); print}' > "$OUT"
echo "record: $OUT" >&2
