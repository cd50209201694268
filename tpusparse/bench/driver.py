"""Benchmark driver — parity with the reference's ``src/main_ksp.cpp``.

Reproduces the reference driver's protocol: build the manufactured Poisson
system, set up CG + AMG, solve, hard-fail on divergence, compute the Linf
error against the analytic solution, and report the three-phase time triple
``[init, create solver, solve]`` in the exact text format the reference's
plot layer regex-parses (``src/main_ksp.cpp:124-129``,
``scripts/generate_plots.py:87-90``) — plus a JSON sidecar so nothing
downstream ever has to scrape text again (SURVEY.md section 5.5).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.amg import AMGParams, gamg_setup, vcycle
from tpusparse.grid.grid3d import Grid3D
from tpusparse.grid.poisson import poisson_stencil_device as poisson_stencil
from tpusparse.solve import cg


@dataclasses.dataclass
class SolveReport:
    nx: int
    ny: int
    nz: int
    iters: int
    resnorm: float
    linf_error: float
    reason: int
    t_init: float
    t_setup: float
    t_solve: float
    rtol: float
    atol: float
    pc: str
    precision: str = "f64"
    outer_iters: int = 0
    # -mat_type: "stencil" (structured DMDA fast path) or "aij"
    # (general assembled-CSR path, DMSetMatType(MATAIJ) parity —
    # /root/reference/src/helper.cpp:39)
    mat_type: str = "stencil"
    # KSPSetUp sub-phase breakdown (aij path): aggregate/galerkin/rho/
    # device_put seconds — the reference times setup as a first-class
    # phase (src/main_ksp.cpp:97-100)
    setup_breakdown: dict | None = None
    # -ksp_monitor data: per-iteration ||r||_2 for uniform-precision solves,
    # per-OUTER-sweep true ||r||_2 for mixed precision (index 0 = initial)
    residual_history: list | None = None
    # -ksp_view text (KSPView/PCView parity), filled when view=True
    solver_view: str | None = None
    # matrix provenance for file-loaded systems (-f, MatLoad parity) or
    # non-Poisson problem families; None for assembled Poisson runs
    source: str | None = None
    # True when the system came from a file: nx/ny are MATRIX dims, not
    # grid dims (reference_block keys on this, not on shape inference)
    source_is_file: bool = False
    # -ksp_compute_eigenvalues data: Ritz values of the preconditioned
    # operator M A from the CG iteration's own Lanczos scalars
    # (solve/spectrum.py), ascending; None unless requested
    eigenvalues: list | None = None

    def log_view(self) -> str:
        """PETSc ``-log_view``-style performance summary: phase wall times
        plus the solve phase's flop accounting (PetscLogFlops model:
        2*nnz per fine operator apply, ~7 applies per CG+AMG iteration
        with a 27/7-nnz-ratio coarse hierarchy ~= 1.6x fine-level work)."""
        n = self.nx * self.ny * self.nz
        nnz = 7 * n - 2 * (
            self.ny * self.nz + self.nx * self.nz + self.nx * self.ny
        )
        flops = 2 * nnz * 7 * 1.6 * max(self.iters, 1)
        total = self.t_init + self.t_setup + self.t_solve
        lines = [
            "--- Performance Summary (-log_view) "
            "----------------------------------",
            f"{'Phase':<16}{'Time (s)':>12}{'% total':>10}",
            f"{'init (system)':<16}{self.t_init:>12.4f}"
            f"{100 * self.t_init / total:>9.1f}%",
            f"{'setup (KSP+PC)':<16}{self.t_setup:>12.4f}"
            f"{100 * self.t_setup / total:>9.1f}%",
            f"{'solve':<16}{self.t_solve:>12.4f}"
            f"{100 * self.t_solve / total:>9.1f}%",
            f"solve: {self.iters} iterations, ~{flops / 1e9:.2f} GFLOP "
            f"(PetscLogFlops model), "
            f"{flops / self.t_solve / 1e9:.1f} GFLOP/s, "
            f"{nnz * max(self.iters, 1) / self.t_solve / 1e9:.2f} Gnnz/s",
        ]
        return "\n".join(lines)

    def monitor_block(self) -> str:
        """PETSc ``-ksp_monitor`` output: '  %d KSP Residual norm %e' per
        recorded residual (KSPMonitorResidual format)."""
        if not self.residual_history:
            return ""
        return "\n".join(
            f"  {i} KSP Residual norm {r:e}"
            for i, r in enumerate(self.residual_history)
        )

    def eigenvalues_block(self) -> str:
        """PETSc ``-ksp_compute_eigenvalues`` output (KSPComputeEigenvalues
        data printed after the solve) + the kappa(MA) estimate."""
        if not self.eigenvalues:
            return ""
        import numpy as np

        from tpusparse.solve.spectrum import eigenvalue_block

        return eigenvalue_block(np.asarray(self.eigenvalues))

    def converged_reason_line(self) -> str:
        """PETSc ``-ksp_converged_reason`` output: 'Linear solve converged
        due to CONVERGED_RTOL iterations 34' (KSPConvergedReasonView
        format; the reason name from the shared enum, including the
        TPU-extension CONVERGED_STALLED)."""
        from tpusparse.solve.cg import ConvergedReason

        try:
            name = ConvergedReason(self.reason).name
        except ValueError:
            name = str(self.reason)
        verdict = (
            "converged" if self.reason > 0 else "did not converge"
        )
        return (
            f"Linear solve {verdict} due to {name}"
            f" iterations {self.iters}"
        )

    def reference_block(self) -> str:
        """The reference's exact output contract (src/main_ksp.cpp:124-129).

        File-loaded systems (``solve_from_file``) substitute the grid line
        with the matrix provenance, and print "n/a" for the
        error-vs-analytic norm when the file carries no exact solution
        (sentinel ``linf_error < 0``)."""
        grid_line = f"[Nx, Ny, Nz]: [{self.nx}, {self.ny}, {self.nz}]"
        if self.source_is_file:
            # file-loaded system: nx x ny are the MATRIX dims
            head = f"Matrix: {self.source} [{self.nx} x {self.ny}]"
        elif self.source:
            # non-Poisson grid problem (e.g. diffusion): name it, keep grid
            head = f"Problem: {self.source}\n{grid_line}"
        else:
            head = grid_line
        linf = (
            f"{self.linf_error:f}" if self.linf_error >= 0.0
            else "n/a (no exact solution in file)"
        )
        return (
            f"{head}\n"
            f"Number of iterations: {self.iters}\n"
            f"L2 norm of final residual: {self.resnorm:f}\n"
            f"Maximum norm of error: {linf}\n"
            f"Time [init, create solver, solve]: "
            f"[{self.t_init:f}, {self.t_setup:f}, {self.t_solve:f}]"
        )

    def json_sidecar(self) -> str:
        return json.dumps(dataclasses.asdict(self))


class DivergedError(RuntimeError):
    """SETERRQ1-on-negative-reason parity (src/main_ksp.cpp:109-111)."""


def _pick_ksp(
    ksp: str,
    precision: str,
    ksp_gmres_restart: int,
    ksp_richardson_scale: float,
    ksp_norm_type: str = "default",
):
    """Resolve a -ksp_type name to a solver callable (shared by the stencil
    and aij drivers)."""
    if ksp == "cg":
        if ksp_norm_type not in ("default", "unpreconditioned"):
            from functools import partial as _partial

            return _partial(cg, norm_type=ksp_norm_type)
        return cg
    if ksp == "pipecg":
        from tpusparse.solve.pipelined import cg_pipelined

        if precision in ("mixed", "tf"):
            # round 1 measured the f32 inner recurrences NaN'ing at >=144^3
            # (the delta - beta*gamma/alpha denominator cancels in f32).
            # Cure: f64 RECURRENCE SCALARS + residual replacement every 5
            # (vectors and dots stay f32).  Measured on-chip: 144^3
            # converges to rel 2e-9; at 216^3+ the solution still reaches
            # discretization accuracy (Linf = O(h^2)) but the pipelined
            # attainable-accuracy floor sits above rtol 1e-8, reported
            # honestly as CONVERGED_STALLED.  Classic cg remains the
            # default inner solver; pipecg's fused-reduction advantage is
            # a multi-chip latency play.
            from functools import partial as _partial

            if not jax.config.jax_enable_x64:
                # the cure REQUIRES f64 scalars; with x64 off this would
                # silently re-enable the measured-NaN configuration
                raise ValueError(
                    "-ksp_type pipecg with mixed precision needs f64 "
                    "recurrence scalars: enable jax_enable_x64"
                )
            return _partial(
                cg_pipelined,
                scalar_dtype=jnp.float64,
                replace_every=5,
            )
        return cg_pipelined
    if ksp == "gmres":
        # KSPGMRES (PETSc's default type): restarted, left-preconditioned,
        # CGS2 orthogonalization as MXU matmuls (solve/gmres.py)
        from functools import partial as _partial

        from tpusparse.solve.gmres import gmres

        return _partial(gmres, restart=ksp_gmres_restart)
    if ksp == "fgmres":
        # KSPFGMRES: flexible (right-preconditioned) restarted GMRES —
        # tolerates a variable/inexact preconditioner, converges on the
        # TRUE residual norm (solve/fgmres.py)
        from functools import partial as _partial

        from tpusparse.solve.fgmres import fgmres

        return _partial(fgmres, restart=ksp_gmres_restart)
    if ksp == "bcgs":
        # KSPBCGS: short-recurrence nonsymmetric workhorse
        from tpusparse.solve.bcgs import bicgstab

        return bicgstab
    if ksp == "minres":
        # KSPMINRES: symmetric INDEFINITE systems (CG requires SPD)
        from tpusparse.solve.minres import minres

        return minres
    if ksp == "chebyshev":
        # KSPCHEBYSHEV: dot-free iteration (auto eigenvalue estimation)
        from tpusparse.solve.chebyshev import chebyshev

        return chebyshev
    if ksp == "richardson":
        # KSPRICHARDSON as the top-level (or inner, under mixed precision)
        # solver: multigrid-as-a-solver when pc=gamg
        from functools import partial as _partial

        from tpusparse.solve.simple import richardson

        return _partial(richardson, scale=ksp_richardson_scale)
    if ksp == "preonly":
        # KSPPREONLY: one preconditioner application; under mixed precision
        # this is classic "one V-cycle per defect-correction sweep"
        from tpusparse.solve.simple import preonly

        return preonly
    raise ValueError(
        f"unknown ksp {ksp!r} (cg | pipecg | gmres | fgmres | bcgs |"
        f" minres | chebyshev | richardson | preonly)"
    )


def _plain_cycle_only(params) -> bool:
    """Configs the fused/padded kernel layout cannot honor: real
    block-Jacobi (-pc_bjacobi_bs) and multicolor SOR (-mg_levels_pc_type
    sor) smoothers (the kernels smooth with point Jacobi only), and the
    dense-direct coarse solve (-mg_coarse_pc_type lu: the padded
    hierarchy keeps 128-lane pad columns at every level, so the coarsest
    dense matrix would be orders too large).  These route through the
    plain XLA cycle so the user's explicit choice is honored.  Shared by
    the structured driver and the star-lifted aij route so the gates
    cannot drift."""
    return bool(params) and bool(
        getattr(params, "bjacobi_bs", 0)
        or getattr(params, "smoother", "") == "sor"
        or getattr(params, "coarse_solve", "jacobi") == "lu"
    )


def solve_poisson(
    nx: int,
    ny: int | None = None,
    nz: int | None = None,
    *,
    rtol: float = 1e-14,
    atol: float = 1e-12,
    divtol: float = 1e5,
    maxiter: int = 10000,
    pc: str = "gamg",
    amg_params: AMGParams | None = None,
    dtype=jnp.float64,
    precision: str = "mixed",
    warmup: bool = True,
    check_error: bool = True,
    n_devices: int = 1,
    layout: str = "auto",
    ksp: str = "cg",
    pc_dtype: str = "f32",
    mg_cycle: str = "v",
    monitor: bool = False,
    ksp_richardson_scale: float = 1.0,
    view: bool = False,
    ksp_gmres_restart: int = 30,
    mat_type: str = "stencil",
    aggregation: str = "auto",
    extent: tuple[float, float, float] | None = None,
    assembly: str = "auto",
    structure_detect: bool = True,
    compute_eigenvalues: bool = False,
    ksp_norm_type: str = "default",
) -> SolveReport:
    """End-to-end solve with the reference's defaults
    (tolerances: configs/PETSc_SolverOptions_GAMG.info:1-4).

    ``precision``: "mixed" (default — f32 CG+AMG inner solves under f64
    defect correction; same tolerances at TPU-native speed, see
    solve/refine.py), "f64" (uniform f64, strict reference parity, slow on
    TPUs without native f64), or "f32" (uniform f32, tolerance-limited).

    ``mat_type``: "stencil" (default) is the structured DMDA-equivalent
    fast path; "aij" treats the same system as an arbitrary assembled CSR —
    DMSetMatType(MATAIJ) parity (/root/reference/src/helper.cpp:39) — over
    gather-free DIA containers with unstructured smoothed-aggregation GAMG.

    Phase timing protocol matches main_ksp.cpp:80-106: init = system build,
    setup = preconditioner construction, solve = the (pre-compiled) solve.
    When ``warmup`` is true the solve is compiled + run once first, so
    t_solve measures execution (the reference's KSPSolve timing also
    excludes compilation — its kernels are prebuilt binaries); the SETUP
    program gets the same treatment (pre-built untimed, then the timed
    region re-executes it), so t_setup measures the numeric hierarchy
    build — rho power iterations, probed Galerkin, transfer construction —
    which is what the reference's KSPSetUp phase times (its aggregation/
    SpGEMM run as prebuilt binaries too; src/main_ksp.cpp:97-100).
    """
    ny = ny or nx
    nz = nz or nx
    if mat_type not in ("stencil", "aij"):
        raise ValueError(f"unknown mat_type {mat_type!r} (stencil | aij)")
    if mat_type == "aij":
        return _solve_poisson_aij(
            nx, ny, nz, rtol=rtol, atol=atol, divtol=divtol,
            maxiter=maxiter, pc=pc,
            amg_params=amg_params, precision=precision, warmup=warmup,
            check_error=check_error, n_devices=n_devices, ksp=ksp,
            mg_cycle=mg_cycle, monitor=monitor, view=view,
            ksp_gmres_restart=ksp_gmres_restart,
            ksp_richardson_scale=ksp_richardson_scale,
            aggregation=aggregation, extent=extent, assembly=assembly,
            structure_detect=structure_detect,
            compute_eigenvalues=compute_eigenvalues,
        )
    if precision not in ("mixed", "tf", "f64", "f32"):
        raise ValueError(f"unknown precision {precision!r}")
    if precision == "f32":
        dtype = jnp.float32
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        raise RuntimeError("enable jax_enable_x64 before building f64 systems")
    mixed = precision in ("mixed", "tf")
    ksp_solve = _pick_ksp(
        ksp, precision, ksp_gmres_restart, ksp_richardson_scale,
        ksp_norm_type,
    )

    # Runtime bring-up OUTSIDE the timed phases: the reference's timer
    # starts after MPI_Init/PetscInitialize (src/main_ksp.cpp:70-80), so
    # backend/plugin/compile-service startup (which on a tunneled TPU can
    # cost ~10 s and otherwise lands in whichever phase runs first) is the
    # PetscInitialize analogue, not init work.
    float(jax.jit(lambda: jnp.zeros(()))())

    t0 = time.perf_counter()
    lx, ly, lz = extent or (1.0, 1.0, 1.0)
    grid = Grid3D(nx, ny, nz, lx=lx, ly=ly, lz=lz)
    op, b, exact = poisson_stencil(grid, dtype=jnp.dtype(dtype).type)
    # low-precision twin for the inner solves (also the AMG's home dtype)
    op_lo = poisson_stencil(grid, dtype=np.float32)[0] if mixed else op

    # padded-resident inner layout (sparse/padded.py).  Round 1 resolved
    # "auto" to plain because the standalone Pallas mv lost in context (the
    # custom call blocked XLA's elementwise fusion).  Round 2's fused
    # descent/ascent kernels (kernels/fused7.py) pull the smoother/residual
    # /transfer work INTO the kernel, so "auto" now resolves to padded on
    # TPU whenever the kernels support the shape.
    if layout not in ("auto", "padded", "plain"):
        raise ValueError(f"unknown layout {layout!r}")
    from tpusparse.kernels.stencil7 import is_tpu_backend, star7_supported

    # multi-device twin of the fused path (dist/fused_sharded.py): the same
    # kernels per z-shard under shard_map — "auto" takes it on TPU; an
    # explicit layout="padded" takes it on any backend (interpret-mode
    # kernels on CPU, which is how the virtual-mesh tests drive it)
    # the fused/padded kernels smooth with point Jacobi only; a bjacobi
    # sub-PC (-pc_bjacobi_bs) routes through the plain XLA cycle, whose
    # hierarchy carries the batched inverted line blocks (amg/hierarchy.py)
    plain_only = _plain_cycle_only(amg_params) or pc == "sor"
    if n_devices > 1 and pc in ("sor", "bjacobi"):
        raise NotImplementedError(
            f"pc_type={pc!r} is single-device (its state is not wired"
            " through the sharding layer); use gamg/jacobi multi-device"
        )
    fused_sh_ok = (
        mixed and n_devices > 1 and pc == "gamg" and not plain_only
        and grid.shape[0] % n_devices == 0
    )
    if layout == "auto":
        padded = (
            mixed and n_devices == 1 and is_tpu_backend()
            and not plain_only
            and star7_supported(grid.shape, np.float32)
        )
        fused_sh = fused_sh_ok and is_tpu_backend()
    else:
        if layout == "padded" and plain_only:
            raise ValueError(
                "layout='padded' is point-Jacobi + jacobi-coarse only; drop"
                " -pc_bjacobi_bs / -mg_levels_pc_type sor /"
                " -mg_coarse_pc_type lu or use layout='plain'/'auto'"
            )
        padded = mixed and n_devices == 1 and layout == "padded"
        fused_sh = fused_sh_ok and layout == "padded"
    encode = decode = None
    if padded:
        from functools import partial as _partial

        from tpusparse.sparse.padded import PaddedStar, crop_field, pad_field

        op_lo = PaddedStar.from_star(op_lo)
        encode = pad_field
        decode = _partial(crop_field, shape=grid.shape)
    b = jax.block_until_ready(b)
    t_init = time.perf_counter() - t0

    return _setup_and_solve(
        op=op, op_lo=op_lo, b=b, exact=exact, nx=nx, ny=ny, nz=nz,
        t_init=t_init, padded=padded, fused_sh=fused_sh, encode=encode,
        decode=decode, mixed=mixed, precision=precision, pc=pc,
        pc_dtype=pc_dtype, mg_cycle=mg_cycle, amg_params=amg_params,
        rtol=rtol, atol=atol, divtol=divtol, maxiter=maxiter, ksp=ksp,
        ksp_solve=ksp_solve, monitor=monitor, view=view, warmup=warmup,
        n_devices=n_devices, check_error=check_error,
        eigs=compute_eigenvalues,
    )


def _cg_fusion_kw(ok: bool, op_lo, pc_state, gamma: int) -> dict:
    """``ab_fused``/``m_fused`` kwargs for the cg_refined* inner solver when
    the full-fusion CG kernels preflighted (empty dict otherwise).
    ``op_lo``/``pc_state`` are the enclosing solve_fn's jit ARGUMENTS
    (tracers — not closed-over device arrays, per the driver-wide rule)."""
    if not ok:
        return {}
    from tpusparse.amg.fused_cycle import vcycle_fused_rupdate

    return {
        "ab_fused": lambda z, p, x, a_prev, beta: op_lo.cgmv(
            z, p, x, a_prev, beta
        ),
        "m_fused": lambda r, ap, alpha: vcycle_fused_rupdate(
            pc_state, r, ap, alpha, gamma=gamma
        ),
    }


def _setup_and_solve(
    *,
    op, op_lo, b, exact, nx, ny, nz, t_init,
    padded, fused_sh, encode, decode,
    mixed, precision, pc, pc_dtype, mg_cycle, amg_params,
    rtol, atol, maxiter, ksp, ksp_solve, monitor, view,
    divtol: float = 1e5,
    warmup, n_devices, check_error,
    mat_type: str = "stencil",
    view_extra: str | None = None,
    breakdown: dict | None = None,
    t_setup_seed: float = 0.0,
    eigs: bool = False,
) -> SolveReport:
    """KSPSetUp + KSPSolve core shared by the structured driver and the
    star-lifted aij route (sparse/starlift.py): warmup program builds,
    timed one-dispatch hierarchy setup, fused/padded cycle selection,
    sharding, timed solve, and the reference-contract report
    (src/main_ksp.cpp:97-129)."""
    if eigs and (mixed or ksp != "cg" or monitor):
        # PETSc computes these for any KSP; here the Lanczos identity is
        # wired for the uniform-precision CG path (mixed precision runs
        # many short inner solves — no single Lanczos process to report)
        import warnings

        warnings.warn(
            "-ksp_compute_eigenvalues needs uniform-precision -ksp_type cg"
            " without -ksp_monitor; skipping eigenvalue computation"
        )
        eigs = False
    # -pc_gamg_threshold on the structured path: an EAGER strength fetch
    # picks a static per-axis coarsening schedule (None when isotropic —
    # the threshold-0 reference default takes this branch untouched)
    threshold_sched = None
    if pc == "gamg":
        from tpusparse.amg.hierarchy import threshold_schedule as _tsch

        _params_t = amg_params or AMGParams()
        threshold_sched = _tsch(op_lo, _params_t.threshold, _params_t.factor)

    if warmup and pc == "gamg":
        # Setup-program build OUTSIDE the timed phase — the same protocol
        # the solve phase has always used (see the warmup note below): the
        # reference's KSPSetUp runs prebuilt binaries, so its timed setup
        # is pure numeric work (aggregation, Galerkin products, smoother
        # setup).  Our JIT trace + executable transport is the analogue of
        # its compile step, not of KSPSetUp.  The timed region below
        # re-executes the (now in-process-cached) setup program, so
        # t_setup measures the numeric hierarchy build — rho power
        # iterations, probed Galerkin, transfer builds — on prebuilt
        # programs, exactly like t_solve.
        from tpusparse.amg.hierarchy import gamg_setup_compiled as _gsc

        _pre = _gsc(
            op_lo, amg_params or AMGParams(),
            factors_schedule=threshold_sched,
        )
        float(_pre.levels[-1].rho)  # sync via scalar fetch (tunnel-safe)
        del _pre

    t0 = time.perf_counter()
    # NOTE: operator/hierarchy pytrees are passed as jit ARGUMENTS, never
    # closed over — a closure would bake hundreds of MB of fields into the
    # program as literal constants (and, e.g., overflow remote-compile
    # transports).  Data stays device-resident; only the HLO is compiled.
    if mg_cycle not in ("v", "w"):
        raise ValueError(f"unknown mg_cycle {mg_cycle!r}")
    gamma = 1 if mg_cycle == "v" else 2
    breakdown = {} if breakdown is None else breakdown
    m_dots_of = None  # set by the padded gamg branch when kernels verify
    cg_fusion_ok = False  # full-fusion CG body (padded gamg + cg only)
    if pc == "gamg":
        # ONE-dispatch compiled setup (gamg_setup_compiled): the whole
        # hierarchy build as a single XLA program — eager per-level
        # dispatches cost a tunnel round trip each and dominated t_setup
        from tpusparse.amg.hierarchy import gamg_setup_compiled

        _t0 = time.perf_counter()
        pc_state = gamg_setup_compiled(
            op_lo, amg_params or AMGParams(),
            factors_schedule=threshold_sched,
        )
        jax.block_until_ready(pc_state.levels[-1].rho)
        breakdown["hierarchy_build"] = round(time.perf_counter() - _t0, 4)
        if pc_dtype == "bf16" and not padded:
            # bf16 V-cycle: half the preconditioner's HBM traffic.  Measured
            # trade-off is SIZE-DEPENDENT: +2 CG iterations at 96^3 (net
            # ~1.4x faster sweeps) but ~2.5x the iterations at 300^3 (net
            # LOSS) — the coarse-grid correction needs more mantissa as
            # conditioning grows.  Hence default f32; opt in per problem.
            # The padded/Pallas path keeps f32 (the kernel is f32-only).
            from tpusparse.amg.hierarchy import cast_hierarchy

            pc_state = cast_hierarchy(pc_state, jnp.bfloat16)
            m_of = lambda pc_state: (
                lambda r: vcycle(
                    pc_state, r.astype(jnp.bfloat16), gamma=gamma
                ).astype(r.dtype)
            )
        elif padded:
            # temporally-blocked fine level (amg/fused_cycle.py): the whole
            # downstroke and upstroke in one kernel launch each.  preflight
            # AOT-verifies the kernels' slab depths (Mosaic spill behavior
            # is not statically predictable); on failure the padded fields
            # run the standard XLA cycle instead
            from tpusparse.amg.fused_cycle import (
                preflight,
                vcycle_fused,
                vcycle_fused_dots,
                vcycle_fused_rupdate,
            )
            from tpusparse.amg.hierarchy import cast_coarse_coefs

            # halve the operator-data traffic of the coarse levels (safe:
            # vectors stay f32 — measured same iterations, -7% solve time)
            _t0 = time.perf_counter()
            pc_state = cast_coarse_coefs(pc_state)
            # drain the casts AND any hierarchy arrays still materializing
            # behind the levels[-1].rho fetch above, so this line item —
            # not the unattributed remainder — carries the device work
            # (round-4 verdict weak #7: other_plumbing was the largest
            # setup line with no attribution)
            jax.block_until_ready(jax.tree.leaves(pc_state))
            breakdown["coarse_cast_drain"] = round(
                time.perf_counter() - _t0, 4
            )
            _t0 = time.perf_counter()
            ok = preflight(pc_state)
            # the dot-fused kernel variants feed cg's m_mv_dots interface
            # (the CG shell's <r,z> / ||r||^2 without their own HBM passes);
            # verified separately so a spill there degrades gracefully to
            # the plain fused cycle rather than losing it entirely
            dots_ok = ok and ksp == "cg" and preflight(
                pc_state, with_dots=True
            )
            # full-fusion CG (round 5): the whole iteration in two
            # composite kernel calls + the coarse cycle — zero standalone
            # XLA vector passes.  MEASURED NET-NEGATIVE on the tunneled
            # v5e at 300^3 (bench 0.3138 vs 0.3092 s; itprof full-body
            # 8.26 vs 7.75 ms/iter): XLA overlaps the replaced glue passes
            # almost for free (~0.4 ms in context), while the kernels pay
            # real time for the extra operands and in-kernel reductions.
            # Kept as an opt-in — the byte accounting favors it 2.0 vs
            # 2.6 GB/iter, so faster kernels or a multi-chip setting
            # (where the fused dots also save collective rounds) can
            # flip the verdict.
            import os as _os

            cg_fusion_ok = (
                bool(_os.environ.get("TPUSPARSE_CG_FUSION"))
                and dots_ok and n_devices == 1
                and preflight(pc_state, with_cg=True)
            )
            breakdown["preflight"] = round(time.perf_counter() - _t0, 4)
            m_dots_of = None
            if ok:
                m_of = lambda pc_state: (
                    lambda r: vcycle_fused(pc_state, r, gamma=gamma)
                )
                if dots_ok:
                    m_dots_of = lambda pc_state: (
                        lambda r: vcycle_fused_dots(pc_state, r, gamma=gamma)
                    )
            else:
                m_of = lambda pc_state: (
                    lambda r: vcycle(pc_state, r, gamma=gamma)
                )
        else:
            m_of = lambda pc_state: (
                lambda r: vcycle(pc_state, r, gamma=gamma)
            )
    elif pc == "jacobi":
        pc_state = 1.0 / op_lo.diagonal_field()
        m_of = lambda pc_state: (lambda r: pc_state * r)
    elif pc == "sor":
        # standalone PCSOR, in the CG-compatible SSOR form (PETSc's
        # -pc_sor_symmetric): one forward + one reversed multicolor GS
        # sweep — masked simultaneous updates within a color ARE a GS
        # ordering (amg/hierarchy._smooth's 'sor' smoother, as its own PC)
        if not hasattr(op_lo, "gs_color_masks"):
            raise ValueError(
                "pc_type='sor' needs a colorable grid operator"
                f" (gs_color_masks); {type(op_lo).__name__} has none"
            )
        # the operator rides INSIDE pc_state (m_of only receives
        # pc_state; a python closure over op_lo would bake its fields
        # into the HLO as literals — the driver-wide rule)
        pc_state = (
            1.0 / op_lo.diagonal_field(),
            tuple(op_lo.gs_color_masks()),
            op_lo,
        )

        def m_of(pc_state):
            dinv, masks, sop = pc_state

            def apply(r):
                x = None
                for m in masks + masks[::-1]:
                    if x is None:
                        x = jnp.where(m, dinv * r, jnp.zeros_like(r))
                    else:
                        x = jnp.where(m, x + dinv * (r - sop.mv(x)), x)
                return x

            return apply
    elif pc == "none":
        pc_state = jnp.zeros(())
        m_of = lambda pc_state: None
    else:
        raise ValueError(f"unknown pc {pc!r}")

    # dispatch-fixed-cost lever: each dynamic-loop trip on the tunneled
    # v5e costs ~0.6 ms regardless of body (bench/ovprobe.py), so the
    # production inner CG checks convergence every 2 iterations (PETSc
    # checks every iteration; CG overshoot is harmless — see solve/cg.py)
    # round-4 measurement (loop-trip cost ~0.3 ms): check_every=2 overshoot
    # (+2 iters) outweighed the saving.  Round-5 itprof measured the trip
    # cost at ~1.3-1.5 ms on the same tunnel (it varies with the transport),
    # which flips the trade at 300^3 — env-tunable so deployments can match
    # their own dispatch latency; default from the round-5 on-chip A/B.
    import os as _os2

    inner_check_every = int(_os2.environ.get("TPUSPARSE_CHECK_EVERY", "1"))

    # fused mv+<p,Ap> (PaddedStar.mv_dot): kills the CG shell's standalone
    # alpha-denominator reduction.  Round-3 measured net-neutral; round-5
    # itprof measured mvdot <= mv outright (halo sharing changed the kernel
    # economics): the round-5 A/B measured a clear win (0.3021 vs 0.3063 s
    # at 300^3, same convergence) — production default ON for cg;
    # TPUSPARSE_MVDOT=0 opts out (the knob matters on hardware whose
    # in-kernel cross-sublane reduction is pricier than a memory pass).
    a_lo_mv_dot = None
    if (
        _os2.environ.get("TPUSPARSE_MVDOT", "1") != "0"
        and ksp == "cg" and hasattr(op_lo, "mv_dot")
    ):
        a_lo_mv_dot = lambda op_lo: op_lo.mv_dot

    if precision == "tf":
        # two-float outer: no f64 on the device hot path at all
        from tpusparse.solve.refine import cg_refined_tf

        op_df = op.to_df()

        def solve_fn(op_df, op_lo, pc_state, b):
            return cg_refined_tf(
                op_df, op_lo.mv, b, rtol=rtol, atol=atol, divtol=divtol,
                m_lo_mv=m_of(pc_state),
                m_lo_mv_dots=(
                    m_dots_of(pc_state) if m_dots_of is not None else None
                ),
                a_lo_mv_dot=(
                    a_lo_mv_dot(op_lo) if a_lo_mv_dot is not None else None
                ),
                **_cg_fusion_kw(cg_fusion_ok, op_lo, pc_state, gamma),
                check_every=inner_check_every,
                encode=encode, decode=decode,
                solver=ksp_solve, history=monitor,
            )
    elif mixed:
        from tpusparse.solve.refine import cg_refined

        # NOTE: the fused mv+dot kernel (PaddedStar.mv_dot / cg's a_mv_dot)
        # was measured net-neutral-to-slightly-negative here (0.335 vs
        # 0.331 s at 300^3): the in-kernel cross-sublane reduction costs
        # about what the saved <p, Ap> HBM pass buys back on one chip.  It
        # stays available for multi-chip use, where the fused dot also
        # saves a collective round on the critical path.
        def solve_fn(op, op_lo, pc_state, b):
            return cg_refined(
                op.mv, op_lo.mv, b, rtol=rtol, atol=atol, divtol=divtol,
                m_lo_mv=m_of(pc_state),
                m_lo_mv_dots=(
                    m_dots_of(pc_state) if m_dots_of is not None else None
                ),
                a_lo_mv_dot=(
                    a_lo_mv_dot(op_lo) if a_lo_mv_dot is not None else None
                ),
                **_cg_fusion_kw(cg_fusion_ok, op_lo, pc_state, gamma),
                check_every=inner_check_every,
                encode=encode, decode=decode,
                solver=ksp_solve, history=monitor,
            )
    else:
        def solve_fn(op, op_lo, pc_state, b):
            kw = dict(history=monitor)
            if eigs:
                kw = dict(spectrum=True)
            return ksp_solve(
                op.mv, b, rtol=rtol, atol=atol, divtol=divtol,
                maxiter=maxiter, m_mv=m_of(pc_state), **kw,
            )

    if n_devices > 1:
        from tpusparse.dist import (
            field_sharding,
            make_mesh,
            shard_hierarchy,
            shard_system,
        )

        if fused_sh:
            # z-slab mesh: the layout the per-shard fused kernels need
            from tpusparse.dist.fused_sharded import make_z_mesh

            mesh = make_z_mesh(n_devices)
        else:
            mesh = make_mesh(n_devices)
        op, b, exact = shard_system(op, b, exact, mesh)
        if mixed:
            from tpusparse.dist.mesh import _put

            op_lo = _put(op_lo, field_sharding(mesh))
            if precision == "tf":
                op_df = _put(op_df, field_sharding(mesh))
        else:
            op_lo = op
        if pc == "gamg":
            pc_state = shard_hierarchy(pc_state, mesh)
        elif pc == "jacobi":
            pc_state = jax.device_put(pc_state, field_sharding(mesh))
        if fused_sh and pc == "gamg":
            from tpusparse.dist.fused_sharded import (
                FusedSharded,
                fused_sharded_supported,
                preflight_sharded,
                vcycle_fused_sharded,
            )
            from tpusparse.kernels.stencil7 import is_tpu_backend

            # the fused kernels implement the DEGREE-2 chebyshev/richardson
            # smoother only; any other configuration must keep the plain
            # GSPMD cycle or the applied polynomial would silently differ
            # from the single-device path (review finding)
            fs = (
                FusedSharded.build(
                    op_lo, mesh, interpret=not is_tpu_backend()
                )
                if fused_sharded_supported(pc_state) else None
            )
            if fs is not None and preflight_sharded(fs):
                # ride the executor alongside the hierarchy through the
                # jit boundary (never closed over: diag_st is a big array)
                pc_state = (pc_state, fs)
                m_of = lambda ps: (
                    lambda r: vcycle_fused_sharded(
                        ps[1], ps[0], r, gamma=gamma
                    )
                )
            # else: keep the plain GSPMD cycle (kernel unsupported shape)

    op_hi = op_df if precision == "tf" else op
    jitted = jax.jit(solve_fn)
    solve = lambda b: jitted(op_hi, op_lo, pc_state, b)
    _t0 = time.perf_counter()
    jax.block_until_ready(jax.tree.leaves(op))
    if breakdown:
        breakdown["operator_drain"] = round(time.perf_counter() - _t0, 4)
    t_setup = time.perf_counter() - t0 + t_setup_seed
    if breakdown:
        # make the sub-phases sum to t_setup: the remainder is executor
        # plumbing (sharding placement, jit wrapper construction, syncs)
        breakdown["other_plumbing"] = round(
            max(0.0, t_setup - sum(breakdown.values())), 4
        )

    # NOTE: sync via scalar fetch, not block_until_ready — on tunneled
    # backends (axon) block_until_ready can return before execution finishes;
    # fetching an output scalar cannot.
    if warmup:
        out = solve(b)
        float((out[0] if (monitor or eigs) else out).resnorm)

    t0 = time.perf_counter()
    res = solve(b)
    hist = spec = None
    if monitor:
        res, hist = res
    elif eigs:
        res, spec = res
    resnorm = float(res.resnorm)
    t_solve = time.perf_counter() - t0

    reason = int(res.reason)
    if reason < 0:
        raise DivergedError(f"Diverged reason: {reason}")

    eig_list = None
    if spec is not None:
        from tpusparse.solve.spectrum import ritz_values

        eig_list = [
            float(v) for v in ritz_values(
                np.asarray(spec[0]), np.asarray(spec[1]), int(res.iters)
            )
        ]

    view_text = None
    if view:
        lines = [
            f"KSP Object: type {ksp}, rtol {rtol:g}, atol {atol:g},"
            f" maxit {maxiter}",
            f"  precision: {precision}"
            + (", layout: padded-resident (fused fine level)" if padded
               else ", layout: plain"),
        ]
        if view_extra:
            lines.append(f"  {view_extra}")
        if pc == "gamg":
            from tpusparse.amg.hierarchy import hierarchy_summary

            lines.append(hierarchy_summary(pc_state))
        else:
            lines.append(f"PC Object: type {pc}")
        view_text = "\n".join(lines)

    history = None
    if hist is not None:
        # trim to the recorded prefix: outer sweeps for mixed precision
        # (RefinedResult), plain iterations otherwise
        count = int(getattr(res, "outer_iters", None) or res.iters)
        history = [float(v) for v in np.asarray(hist)[: count + 1]]

    linf = float(jnp.abs(res.x - exact).max()) if check_error else float("nan")
    return SolveReport(
        nx=nx, ny=ny, nz=nz,
        iters=int(res.iters),
        resnorm=resnorm,
        linf_error=linf,
        reason=reason,
        t_init=t_init,
        t_setup=t_setup,
        t_solve=t_solve,
        rtol=rtol,
        atol=atol,
        pc=pc,
        precision=precision,
        mat_type=mat_type,
        outer_iters=int(getattr(res, "outer_iters", 0)),
        residual_history=history,
        solver_view=view_text,
        setup_breakdown={
            k: round(v, 4) for k, v in breakdown.items()
        } or None,
        eigenvalues=eig_list,
    )


def _solve_poisson_aij(
    nx: int,
    ny: int,
    nz: int,
    *,
    rtol: float,
    atol: float,
    maxiter: int,
    pc: str,
    divtol: float = 1e5,
    amg_params: AMGParams | None,
    precision: str,
    warmup: bool,
    check_error: bool,
    n_devices: int,
    ksp: str,
    mg_cycle: str,
    monitor: bool,
    view: bool,
    ksp_gmres_restart: int,
    ksp_richardson_scale: float,
    aggregation: str = "auto",
    extent: tuple[float, float, float] | None = None,
    assembly: str = "auto",
    structure_detect: bool = True,
    compute_eigenvalues: bool = False,
) -> SolveReport:
    """The general-matrix driver: the manufactured Poisson system ASSEMBLED
    as an arbitrary host CSR (MATAIJ parity — the reference's actual matrix
    type, ``DMSetMatType(MATAIJ)`` /root/reference/src/helper.cpp:39, solved
    through PETSc's patched general-CSR kernel
    ``src/openacc-step1/MatMult_SeqAIJ.patch:19-30``), then solved through
    gather-free DIA containers + unstructured smoothed-aggregation GAMG.

    Same phase protocol and output contract as the stencil driver
    (src/main_ksp.cpp:80-129): init = system assembly (ON DEVICE by
    default — ``poisson_dia_device``; ``assembly='host'`` forces the
    HostCSR oracle route), setup = GAMG hierarchy build (with a sub-phase
    breakdown in the JSON sidecar), solve = the pre-compiled solve.
    """
    import numpy as np

    from tpusparse.amg.unstructured import gamg_setup_unstructured
    from tpusparse.grid.poisson import assemble_poisson, poisson_dia_device
    from tpusparse.sparse.dia import DIA

    if precision not in ("mixed", "f64", "f32"):
        raise ValueError(
            f"mat_type=aij supports precision mixed|f64|f32, got {precision!r}"
        )
    if n_devices != 1 and not structure_detect:
        # the sharded GENERAL executor lives in dist.general (DistDIA /
        # DistHybridDIA, exercised by __graft_entry__.dryrun_multichip);
        # through THIS driver, multi-device aij requires the star lift —
        # proven-structured matrices ride the structured sharded pipeline
        raise NotImplementedError(
            "mat_type=aij multi-device driver requires structure_detect"
            " (general path: use dist.general.DistDIA)"
        )
    mixed = precision == "mixed"
    hi_dtype = np.float32 if precision == "f32" else np.float64
    if hi_dtype == np.float64 and not jax.config.jax_enable_x64:
        raise RuntimeError("enable jax_enable_x64 before building f64 systems")
    lo_dtype = np.float32
    ksp_solve = _pick_ksp(ksp, precision, ksp_gmres_restart,
                          ksp_richardson_scale)
    if mg_cycle not in ("v", "w"):
        raise ValueError(f"unknown mg_cycle {mg_cycle!r}")
    gamma = 1 if mg_cycle == "v" else 2

    # runtime bring-up outside the timed phases (PetscInitialize analogue)
    float(jax.jit(lambda: jnp.zeros(()))())

    if assembly not in ("auto", "device", "host"):
        raise ValueError(f"unknown assembly {assembly!r}")
    if assembly == "device" and not mixed:
        raise ValueError("assembly='device' requires precision='mixed'")
    if assembly == "device" and pc == "gamg" and (
        aggregation == "greedy" or (amg_params or AMGParams()).bjacobi_bs
    ):
        raise ValueError(
            "assembly='device' leaves no host CSR, but greedy aggregation"
            " / bjacobi_bs require one — use assembly='host'"
        )

    params = amg_params or AMGParams()
    # the fully device-resident setup route (no host matrix anywhere) is
    # taken only by the geometric compiled path, which additionally
    # requires bjacobi_bs == 0 (unstructured.py geo gate) — a device
    # assembly outside that route would leave greedy aggregation with no
    # host CSR to chew on
    geo_route = (
        pc != "gamg"
        or (aggregation != "greedy" and params.bjacobi_bs == 0)
    )
    t0 = time.perf_counter()
    lx, ly, lz = extent or (1.0, 1.0, 1.0)
    grid = Grid3D(nx, ny, nz, lx=lx, ly=ly, lz=lz)
    on_device = assembly == "device" or (
        assembly == "auto" and mixed and geo_route
        and min(nx, ny, nz) >= 2
    )
    if on_device:
        # Assemble ON the accelerator (grid/poisson.poisson_dia_device):
        # exact two-float band split + f64 fields, zero O(n) host work.
        # The host CSR form of the SAME matrix used to cost ~100 s of
        # single-core numpy at 300^3 — the entire init phase.  The setup
        # that follows is the device-resident geometric path, so no stage
        # needs a host matrix; ``assembly='host'`` keeps the original
        # HostCSR route as the parity oracle (and the only route for
        # greedy aggregation, whose graph pass is host-side).
        a = None
        op_hi, op_lo, b, exact = poisson_dia_device(grid)
    else:
        a, b_np, exact_np = assemble_poisson(grid, dtype=hi_dtype)
        b = jnp.asarray(b_np)
        exact = jnp.asarray(exact_np)
        if mixed:
            # ONE f32 upload serves both precisions: the f32 bands are the
            # hierarchy's fine operator AND the hi half of the two-float
            # outer operator (DFDIA); the lo half uploads only if A is not
            # exactly f32-representable.  A true-f64 band upload would cost
            # 8 B/entry of transfer AND HBM traffic (1.5 GB at 300^3).
            from tpusparse.sparse.dia import DFDIA

            bands64, offsets_, shp = DIA.host_bands(a)
            bands32_dev = jax.device_put(bands64.astype(np.float32))
            # NOTE: the 3-D grid-view container (sparse/griddia.py) was
            # measured SLOWER on the v5e (20.4 vs 13.0 ms per 7-band apply
            # at 300^3 — the non-tile-aligned field views relayout worse
            # than the flat shifts) and a small-shape variant miscompiles
            # inside jitted CG; production keeps the FLAT form
            # (results/README.md trail).
            op_lo = DIA(bands=bands32_dev, offsets=offsets_, shape=shp)
            op_hi = DFDIA.from_host_bands(
                bands64, offsets_, shp, hi_dev=bands32_dev,
            )
        else:
            op_hi = op_lo = DIA.from_csr(a)
    float(jnp.vdot(b, b))  # sync (tunnel-safe)
    t_init = time.perf_counter() - t0

    lift_overhead = 0.0  # failed-proof time, charged to the setup phase
    if (
        structure_detect and pc == "gamg"
        and aggregation != "greedy"  # explicit greedy = explicit request
        # for the unstructured machinery; detection is "auto" behavior
    ):
        # Structure detection (sparse/starlift.py): PROVE the assembled
        # matrix is an exact constant-coefficient 7-point star (+ pin) and,
        # on success, run the production structured pipeline — PaddedStar
        # + fused temporally-blocked kernels — instead of the generic
        # banded executor.  This is what a structure-aware Mat
        # implementation does with the reference's own benchmark matrix
        # (DMDA Poisson forced into MATAIJ, src/helper.cpp:39); matrices
        # that fail the proof keep the general DIA path below.  The proof
        # cost (one pass over the band data + a scalar fetch) is charged
        # to the setup phase.
        from tpusparse.sparse.starlift import star_lift

        if warmup:
            # proof-program build outside the timed phase (same prebuilt-
            # binaries protocol as every other phase); the timed call
            # below hits the in-process jit cache and measures the
            # one-band-pass numeric proof
            star_lift(op_lo, op_hi, grid.shape)
        _t0 = time.perf_counter()
        lifted = star_lift(op_lo, op_hi, grid.shape)
        lift_s = time.perf_counter() - _t0
        if lifted is not None:
            star_hi, star_lo = lifted
            from tpusparse.kernels.stencil7 import (
                is_tpu_backend,
                star7_supported,
            )

            plain_only = _plain_cycle_only(params)
            padded = (
                mixed and n_devices == 1 and is_tpu_backend()
                and not plain_only
                and star7_supported(grid.shape, np.float32)
            )
            # multi-device: the structured fused-sharded pipeline (same
            # resolution rule as the structured driver's layout="auto")
            fused_sh = (
                mixed and n_devices > 1 and not plain_only
                and grid.shape[0] % n_devices == 0
                and is_tpu_backend()
            )
            encode = decode = None
            if padded:
                from functools import partial as _partial

                from tpusparse.sparse.padded import (
                    PaddedStar,
                    crop_field,
                    pad_field,
                )

                star_lo = PaddedStar.from_star(star_lo)
                encode = pad_field
                decode = _partial(crop_field, shape=grid.shape)
            return _setup_and_solve(
                op=star_hi, op_lo=star_lo,
                b=b.reshape(grid.shape), exact=exact.reshape(grid.shape),
                nx=nx, ny=ny, nz=nz, t_init=t_init, padded=padded,
                fused_sh=fused_sh, encode=encode, decode=decode,
                mixed=mixed,
                precision=precision, pc=pc, pc_dtype="f32",
                mg_cycle=mg_cycle, amg_params=params, rtol=rtol,
                atol=atol, divtol=divtol, maxiter=maxiter, ksp=ksp,
                ksp_solve=ksp_solve,
                monitor=monitor, view=view, warmup=warmup,
                n_devices=n_devices,
                check_error=check_error, mat_type="aij",
                view_extra=(
                    "mat structure: constant-coefficient star DETECTED"
                    " (exact proof) -> structured executor"
                ),
                breakdown={"star_lift": round(lift_s, 4)},
                t_setup_seed=lift_s,
                eigs=compute_eigenvalues,
            )
        lift_overhead = lift_s

    if n_devices != 1:
        raise NotImplementedError(
            "mat_type=aij multi-device: the matrix did not prove star-"
            "structured (or pc/aggregation preclude the lift) — use "
            "dist.general.DistDIA for sharded general matrices"
        )

    eigs = compute_eigenvalues
    if eigs and (mixed or ksp != "cg" or monitor):
        import warnings

        warnings.warn(
            "-ksp_compute_eigenvalues needs uniform-precision -ksp_type cg"
            " without -ksp_monitor; skipping eigenvalue computation"
        )
        eigs = False
    if warmup and pc == "gamg" and geo_route:
        # Setup-program build outside the timed phase (same protocol as
        # the structured driver and the solve phase: the reference's
        # KSPSetUp runs prebuilt binaries, so timed setup = numeric work).
        # The pre-run pays every JIT trace + executable transport; the
        # timed re-run below executes the in-process-cached programs.
        # Geo-compiled route ONLY: the greedy/host route's dominant cost
        # is host-side scipy aggregation + Galerkin, which no cache
        # covers — a pre-run there would double total setup wall time.
        _pre = gamg_setup_unstructured(
            a, params, dtype=lo_dtype if mixed else None,
            timings={}, aggregation=aggregation, fine_op=op_lo,
        )
        from tpusparse.kernels.stencil7 import is_tpu_backend as _itb

        if _itb():
            # pre-build the Pallas-lift stacking programs too (the timed
            # setup below re-executes them from the in-process jit cache)
            from tpusparse.amg.unstructured import lift_pallas_levels

            _pre = lift_pallas_levels(_pre)
        float(_pre.levels[-1].rho)  # sync via scalar fetch (tunnel-safe)
        del _pre

    t0 = time.perf_counter() - lift_overhead
    breakdown: dict = {}
    if lift_overhead:
        breakdown["star_lift_refused"] = round(lift_overhead, 4)
    if pc == "gamg":
        pc_state = gamg_setup_unstructured(
            a, params, dtype=lo_dtype if mixed else None,
            timings=breakdown, aggregation=aggregation,
            fine_op=op_lo,
        )
        from tpusparse.kernels.stencil7 import is_tpu_backend

        if is_tpu_backend():
            # swap eligible DIA levels for the Pallas banded slab kernel
            # (the general-matrix MatMult_SeqAIJ hot kernel; 3.9x over
            # the XLA band shifts at 300^3 — see amg/unstructured.py)
            from tpusparse.amg.unstructured import lift_pallas_levels

            pc_state = lift_pallas_levels(pc_state)
        op_lo = pc_state.levels[0].op
        m_of = lambda pc_state: (
            lambda r: vcycle(pc_state, r, gamma=gamma)
        )
    elif pc == "jacobi":
        diag = (
            op_lo.diagonal() if a is None
            else jnp.asarray(a.diagonal(), lo_dtype if mixed else hi_dtype)
        )
        pc_state = 1.0 / diag
        m_of = lambda pc_state: (lambda r: pc_state * r)
    elif pc == "bjacobi":
        # standalone PCBJACOBI: batched inverted bs x bs diagonal blocks
        # (solve/bjacobi.py); bs = -pc_bjacobi_bs, 0 = the point-Jacobi
        # degeneracy (the one-block-per-process shape the reference's
        # sub-PC config reduces to)
        from tpusparse.solve.bjacobi import BlockJacobi

        bs = (amg_params or AMGParams()).bjacobi_bs
        if a is None:
            raise ValueError(
                "pc_type='bjacobi' needs the host CSR (assembly='host'"
                " or 'auto' with structure detection off keeps it)"
            )
        if bs and bs > 1:
            pc_state = BlockJacobi.build(
                a, bs, dtype=lo_dtype if mixed else hi_dtype
            )
            m_of = lambda pc_state: pc_state.apply
        else:
            pc_state = 1.0 / jnp.asarray(
                a.diagonal(), lo_dtype if mixed else hi_dtype
            )
            m_of = lambda pc_state: (lambda r: pc_state * r)
    elif pc == "none":
        pc_state = jnp.zeros(())
        m_of = lambda pc_state: None
    else:
        raise ValueError(f"unknown pc {pc!r}")

    if mixed:
        from tpusparse.solve.refine import cg_refined

        def solve_fn(op_hi, op_lo, pc_state, b):
            return cg_refined(
                op_hi.mv, op_lo.mv, b, rtol=rtol, atol=atol, divtol=divtol,
                m_lo_mv=m_of(pc_state), solver=ksp_solve, history=monitor,
            )
    else:
        def solve_fn(op_hi, op_lo, pc_state, b):
            kw = dict(history=monitor)
            if eigs:
                kw = dict(spectrum=True)
            return ksp_solve(
                op_hi.mv, b, rtol=rtol, atol=atol, divtol=divtol,
                maxiter=maxiter,
                m_mv=m_of(pc_state), **kw,
            )

    jitted = jax.jit(solve_fn)
    solve = lambda b: jitted(op_hi, op_lo, pc_state, b)
    float(jnp.sum(jax.tree.leaves(pc_state)[0]))  # sync setup products
    t_setup = time.perf_counter() - t0

    if warmup:
        out = solve(b)
        float((out[0] if (monitor or eigs) else out).resnorm)

    t0 = time.perf_counter()
    res = solve(b)
    hist = spec = None
    if monitor:
        res, hist = res
    elif eigs:
        res, spec = res
    resnorm = float(res.resnorm)
    t_solve = time.perf_counter() - t0

    reason = int(res.reason)
    if reason < 0:
        raise DivergedError(f"Diverged reason: {reason}")

    eig_list = None
    if spec is not None:
        from tpusparse.solve.spectrum import ritz_values

        eig_list = [
            float(v) for v in ritz_values(
                np.asarray(spec[0]), np.asarray(spec[1]), int(res.iters)
            )
        ]

    view_text = None
    if view:
        lines = [
            f"KSP Object: type {ksp}, rtol {rtol:g}, atol {atol:g},"
            f" maxit {maxiter}",
            f"  precision: {precision}, mat_type: aij"
            f" (DIA/HybridDIA containers)",
        ]
        if pc == "gamg":
            from tpusparse.amg.hierarchy import hierarchy_summary

            lines.append(hierarchy_summary(pc_state))
        else:
            lines.append(f"PC Object: type {pc}")
        view_text = "\n".join(lines)

    history = None
    if hist is not None:
        count = int(getattr(res, "outer_iters", None) or res.iters)
        history = [float(v) for v in np.asarray(hist)[: count + 1]]

    linf = float(jnp.abs(res.x - exact).max()) if check_error else float("nan")
    return SolveReport(
        nx=nx, ny=ny, nz=nz,
        iters=int(res.iters),
        resnorm=resnorm,
        linf_error=linf,
        reason=reason,
        t_init=t_init,
        t_setup=t_setup,
        t_solve=t_solve,
        rtol=rtol,
        atol=atol,
        pc=pc,
        precision=precision,
        outer_iters=int(getattr(res, "outer_iters", 0)),
        residual_history=history,
        solver_view=view_text,
        mat_type="aij",
        setup_breakdown={k: round(v, 4) for k, v in breakdown.items()} or None,
        eigenvalues=eig_list,
    )


def solve_diffusion(
    nx: int,
    ny: int | None = None,
    nz: int | None = None,
    *,
    contrast: float = 100.0,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    divtol: float = 1e5,
    maxiter: int = 10000,
    precision: str = "mixed",
    amg_params: AMGParams | None = None,
    mg_cycle: str = "v",
    warmup: bool = True,
    view: bool = False,
) -> SolveReport:
    """The framework's SECOND problem family through the driver protocol:
    variable-coefficient diffusion -div(kappa grad u) = f with a
    ``contrast``-to-1 inclusion field (``grid/diffusion.py``) — the
    matrix the reference's constant-coefficient benchmark never produces
    (position-dependent stencil coefficients; the star-structure proof
    fails by construction and the VarStencil27 fine level exercises the
    probed Galerkin on variable coefficients).

    The correctness gate is ALGEBRAIC: exact = smooth manufactured field,
    b = A exact computed in f64, Linf measured against exact — solver
    accuracy, not discretization error.  Phases follow
    ``main_ksp.cpp:80-106``.
    """
    import time

    from tpusparse.amg.hierarchy import gamg_setup_compiled
    from tpusparse.grid.diffusion import assemble_diffusion, default_kappa
    from tpusparse.solve.refine import cg_refined

    ny = ny or nx
    nz = nz or nx
    if precision not in ("mixed", "f64", "f32"):
        raise ValueError(
            f"problem=diffusion supports precision mixed|f64|f32,"
            f" got {precision!r}"
        )
    mixed = precision == "mixed"
    hi_dtype = np.float32 if precision == "f32" else np.float64
    if hi_dtype == np.float64 and not jax.config.jax_enable_x64:
        raise RuntimeError("enable jax_enable_x64 before building f64 systems")
    params = amg_params or AMGParams()
    gamma = 1 if mg_cycle == "v" else 2

    float(jax.jit(lambda: jnp.zeros(()))())  # bring-up outside phases

    t0 = time.perf_counter()
    grid = Grid3D(nx, ny, nz)
    kappa = default_kappa(grid, contrast=contrast)
    op, _, _ = assemble_diffusion(grid, kappa, dtype=hi_dtype)
    op_lo = (
        assemble_diffusion(grid, kappa, dtype=np.float32)[0] if mixed
        else op
    )
    # algebraic manufactured solution: exact is smooth + zero at the pin
    zc, yc, xc = np.meshgrid(
        grid.cell_centers("z"), grid.cell_centers("y"),
        grid.cell_centers("x"), indexing="ij",
    )
    exact = jnp.asarray(
        np.cos(2 * np.pi * xc) * np.cos(2 * np.pi * yc)
        * np.cos(2 * np.pi * zc) - 1.0,   # zero at the pinned cell 0
        hi_dtype,
    )
    b = op.mv(exact)
    float(b.reshape(-1)[0])  # sync assembly+apply into t_init
    t_init = time.perf_counter() - t0

    if warmup:
        _pre = gamg_setup_compiled(op_lo, params)
        float(_pre.levels[-1].rho)
        del _pre
    t0 = time.perf_counter()
    hier = gamg_setup_compiled(op_lo, params)
    jax.block_until_ready(hier.levels[-1].rho)
    t_setup = time.perf_counter() - t0

    if mixed:
        def solve_fn(op, op_lo, hier, b):
            return cg_refined(
                op.mv, op_lo.mv, b, rtol=rtol, atol=atol, divtol=divtol,
                m_lo_mv=lambda r: vcycle(hier, r, gamma=gamma),
            )
    else:
        def solve_fn(op, op_lo, hier, b):
            return cg(
                op.mv, b, rtol=rtol, atol=atol, divtol=divtol,
                maxiter=maxiter,
                m_mv=lambda r: vcycle(hier, r, gamma=gamma),
            )
    jitted = jax.jit(solve_fn)
    if warmup:
        float(jitted(op, op_lo, hier, b).resnorm)
    t0 = time.perf_counter()
    res = jitted(op, op_lo, hier, b)
    resnorm = float(res.resnorm)
    t_solve = time.perf_counter() - t0
    if int(res.reason) < 0:
        raise DivergedError(f"Diverged reason: {int(res.reason)}")

    view_text = None
    if view:
        from tpusparse.amg.hierarchy import hierarchy_summary

        view_text = "\n".join([
            f"KSP Object: type cg, rtol {rtol:g}, atol {atol:g},"
            f" maxit {maxiter}",
            f"  precision: {precision}, problem: diffusion"
            f" (contrast {contrast:g}, VarStencil27 fine level)",
            hierarchy_summary(hier),
        ])

    return SolveReport(
        nx=nx, ny=ny, nz=nz,
        iters=int(res.iters),
        resnorm=resnorm,
        linf_error=float(jnp.abs(res.x - exact).max()),
        reason=int(res.reason),
        t_init=t_init,
        t_setup=t_setup,
        t_solve=t_solve,
        rtol=rtol,
        atol=atol,
        pc="gamg",
        precision=precision,
        outer_iters=int(getattr(res, "outer_iters", 0)),
        mat_type="varstencil",
        solver_view=view_text,
        source=f"diffusion(contrast={contrast:g})",
    )


def solve_from_file(
    path: str,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-50,
    divtol: float = 1e5,
    maxiter: int = 10000,
    ksp: str = "cg",
    pc: str = "gamg",
    precision: str = "mixed",
    amg_params: AMGParams | None = None,
    mg_cycle: str = "v",
    ksp_gmres_restart: int = 30,
    ksp_richardson_scale: float = 1.0,
    view: bool = False,
    solution_out: str = "",
) -> SolveReport:
    """Solve a system read from a file — PETSc KSP tutorial ``ex10`` ("solve
    a linear system from a file") with ``MatLoad``/``VecLoad`` parity.

    ``solution_out``: write the solution vector to this path in PETSc
    binary format after a successful solve (``-ksp_view_solution
    binary:<file>`` — loadable by PETSc's ``VecLoad`` or
    ``sparse.io.load_petsc_vec`` here).

    ``path`` is a PETSc binary viewer file (``sparse/io.py``; the format
    ``-ksp_view_mat binary`` writes) or a MatrixMarket ``.mtx``.  Objects in
    a PETSc file, in order: the matrix, optionally the right-hand side,
    optionally the exact solution (then the report gates Linf against it —
    the manufactured-solution check of ``main_ksp.cpp:120-121``).  A file
    with no rhs gets b = ones, ex10's fallback.

    Phases mirror the reference protocol (``main_ksp.cpp:80-106``): t_init =
    file read + upload, t_setup = KSPSetUp (hierarchy build), t_solve = a
    warm KSPSolve (the compile belongs to setup, as in the Poisson driver).
    """
    import time

    from tpusparse.ksp import KSP
    from tpusparse.sparse.csr import HostCSR
    from tpusparse.sparse.io import load_matrix, read_petsc_objects

    t0 = time.perf_counter()
    exact = None
    if path.endswith((".mtx", ".mtx.gz", ".mm")):
        a, rhs = load_matrix(path)
    else:
        objs = read_petsc_objects(path)
        a = next((o for o in objs if isinstance(o, HostCSR)), None)
        if a is None:
            raise ValueError(f"no matrix object in {path}")
        vecs = [o for o in objs if not isinstance(o, HostCSR)]
        rhs = vecs[0] if vecs else None
        exact = vecs[1] if len(vecs) > 1 else None
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"matrix is {a.shape[0]} x {a.shape[1]}, not square")
    if rhs is not None and rhs.size != a.shape[0]:
        raise ValueError(f"rhs length {rhs.size} != rows {a.shape[0]}")
    b_host = np.ones(a.shape[0]) if rhs is None else rhs

    solver = KSP(
        ksp_type=ksp, pc_type=pc, rtol=rtol, atol=atol, divtol=divtol,
        maxiter=maxiter,
        precision=precision, amg_params=amg_params, mg_cycle=mg_cycle,
        gmres_restart=ksp_gmres_restart,
        richardson_scale=ksp_richardson_scale,
    )
    solver.set_operators(a)
    b = jnp.asarray(
        b_host,
        dtype=jnp.float32 if precision == "f32" else jnp.float64,
    )
    float(b[0])  # sync the upload into t_init
    t_init = time.perf_counter() - t0

    t0 = time.perf_counter()
    solver.setup()
    t_setup = time.perf_counter() - t0

    res = solver.solve(b)  # warmup carries the jit compile (KSPSetUp-like)
    t0 = time.perf_counter()
    res = solver.solve(b)
    t_solve = time.perf_counter() - t0

    if res.reason < 0:
        raise DivergedError(f"Diverged reason: {res.reason}")

    if solution_out:
        from tpusparse.sparse.io import save_petsc_vec

        save_petsc_vec(solution_out, np.asarray(res.x, dtype=np.float64))

    view_text = None
    if view:
        lines = [
            f"KSP Object: type {ksp}, rtol {rtol:g}, atol {atol:g},"
            f" maxit {maxiter}",
            f"  precision: {precision}, mat_type: aij"
            f" (loaded from {path})",
        ]
        if pc == "gamg":
            from tpusparse.amg.hierarchy import hierarchy_summary

            lines.append(hierarchy_summary(solver._pc_state))
        else:
            lines.append(f"PC Object: type {pc}")
        view_text = "\n".join(lines)

    linf = (
        float(jnp.abs(res.x - jnp.asarray(exact, res.x.dtype)).max())
        if exact is not None else -1.0
    )
    return SolveReport(
        nx=a.shape[0], ny=a.shape[1], nz=1,
        iters=res.iters,
        resnorm=res.resnorm,
        linf_error=linf,
        reason=res.reason,
        t_init=t_init,
        t_setup=t_setup,
        t_solve=t_solve,
        rtol=rtol,
        atol=atol,
        pc=pc,
        precision=precision,
        outer_iters=res.outer_iters,
        mat_type="aij",
        solver_view=view_text,
        source=path,
        source_is_file=True,
    )
