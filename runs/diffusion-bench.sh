#!/usr/bin/env bash
# The SECOND problem family's benchmark record: variable-coefficient
# diffusion -div(kappa grad u) with contrast-to-1 inclusions
# (grid/diffusion.py, -problem diffusion).  No reference counterpart —
# the reference ships constant-coefficient Poisson only — so the record
# demonstrates generality: VarStencil27 fine level (27 coefficient
# fields), probed Galerkin on variable coefficients, ALGEBRAIC
# manufactured gate (b = A*exact; Linf measures the solver, not h^2).
set -euo pipefail
cd "$(dirname "$0")/.."
N="${N:-192}"
CONTRAST="${CONTRAST:-100}"
OUT="${OUT:-runs/diffusion_${N}_c${CONTRAST}.json}"
python -m tpusparse -da_grid_x "$N" -da_grid_y "$N" -da_grid_z "$N" \
  -problem diffusion -diffusion_contrast "$CONTRAST" \
  -ksp_rtol 1e-8 -ksp_atol 1e-12 \
  | tee /dev/stderr | awk '/^JSON:/ {sub(/^JSON: /, ""); print}' > "$OUT"
echo "record: $OUT" >&2
