"""V-cycle with a temporally-blocked fine level — two kernel launches per
cycle instead of ~6 operator applies.

The fine level dominates a V-cycle's cost (27x the bytes of level 1 at the
reference's 3^3 aggregation).  ``vcycle_fused`` runs it with the
kernels/fused7.py 'descent' (pre-smooth both steps + residual + P^T
smoothing, 3 chained stencils in ~2 reads + 2 writes) and 'ascent'
(P smoothing + correction + both post-smoothing steps in ~4 reads + 1
write); the coarse hierarchy recurses through the standard ``vcycle``
unchanged.  Supported configuration = the reference's GAMG setup
(``configs/PETSc_SolverOptions_GAMG.info``): smoothed-aggregation transfer,
chebyshev or richardson smoother of degree 2; anything else falls back to
the standard cycle automatically.

The fused fine level reproduces ``hierarchy._smooth``/``vcycle`` math with
two benign reassociations (scalars multiplied as s0 = 1/theta instead of
dividing by theta; the diag*(D^-1 r) == r identity in the transfer pass), so
CG iteration counts match the unfused cycle to within rounding noise.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpusparse.amg.hierarchy import Hierarchy, vcycle
from tpusparse.kernels.fused7 import fused7_call, fused7_xla
from tpusparse.sparse.padded import PaddedStar, PaddedTransfer


def fused_fine_supported(hier: Hierarchy) -> bool:
    """True when the level-0 configuration maps onto the fused kernels
    (degree-2 composites, or the degree-1 variants for the verbatim
    reference config's Richardson(1) smoother)."""
    lev = hier.levels[0]
    sm0, dg0 = hier.level_cfg(0)
    return (
        isinstance(lev.op, PaddedStar)
        and isinstance(lev.transfer, PaddedTransfer)
        and sm0 in ("chebyshev", "richardson")
        and dg0 in (1, 2)
        and jnp.dtype(lev.op.dtype) == jnp.float32
        # a threshold-filtered P-smoothing operator (transfer.fop) rides
        # the fused kernels via per-axis leg overrides (fused7's flegs
        # scalars) when it is the star form _filtered_op produces —
        # scalar legs, same diag.  Variable-coefficient filters
        # (VarStencil27) still decline to the XLA cycle.
        and _flegs_ok(getattr(lev.transfer.inner, "fop", None))
    )


def _flegs_ok(fop) -> bool:
    return fop is None or (
        hasattr(fop, "cx") and getattr(fop, "coef", None) is None
        and jnp.ndim(fop.cx) == 0
    )


def _flegs_of(inner):
    """(fcx, fcy, fcz) f32 leg overrides from the transfer's filtered
    operator, or None for the unfiltered default."""
    fop = getattr(inner, "fop", None)
    if fop is None:
        return None
    f32 = jnp.float32
    return (fop.cx.astype(f32), fop.cy.astype(f32), fop.cz.astype(f32))


def _modes(hier: Hierarchy) -> tuple[str, str]:
    return (
        ("descent", "ascent") if hier.level_cfg(0)[1] == 2
        else ("descent1", "ascent1")
    )


def cg_fusion_supported(hier: Hierarchy) -> bool:
    """True when the full-fusion CG body can run: the fused fine level is
    available AND degree-2 (the 'descentu' downstroke-with-r-update kernel
    has no degree-1 twin; degree-1 configs keep the dot-fused cycle)."""
    return fused_fine_supported(hier) and hier.level_cfg(0)[1] == 2


def preflight(
    hier: Hierarchy, with_dots: bool = False, with_cg: bool = False
) -> bool:
    """AOT-verify the composite kernels for this hierarchy's fine shape.

    Mosaic's register-spill behavior has no reliable static predictor (see
    fused7.preflight_tz), so callers on real TPUs should run this EAGERLY
    (setup phase) before jitting a solve around ``vcycle_fused``: it walks a
    slab-depth ladder per kernel, caches the first depth that compiles, and
    returns False when none does (use the standard ``vcycle`` then).

    ``with_dots=True`` additionally verifies the dot-fused variants
    (``vcycle_fused_dots``'s descent_rr/ascent_rz kernels).
    ``with_cg=True`` verifies the full-fusion CG kernels instead
    (``cgmv`` + ``descentu`` + ``ascent_rz`` — solve/cg.py's fused body via
    ``vcycle_fused_rupdate``); requires a degree-2 hierarchy."""
    if with_cg and not cg_fusion_supported(hier):
        return False
    if not fused_fine_supported(hier):
        return False
    op = hier.levels[0].op
    if not op._use_pallas() or op.backend == "interpret":
        return True
    from tpusparse.kernels.fused7 import preflight_tz

    d_mode, a_mode = _modes(hier)
    if with_cg:
        modes = ["cgmv", "descentu", a_mode + "_rz"]
    else:
        modes = [d_mode, a_mode]
        if with_dots:
            modes += [d_mode + "_rr", a_mode + "_rz"]
    return all(
        preflight_tz(mode, op.true_shape, op.pinned) > 0
        for mode in modes
    )


def _fine_scalars(hier: Hierarchy, lev):
    """(s0, ad, g) smoother scalars: the degree-2 recurrence of
    hierarchy._smooth expressed as one fused step each for pre and post.
    Degree 1 uses only the g slot (one sweep: richardson damping, or
    chebyshev's 1/theta)."""
    f32 = jnp.float32
    smoother, degree = hier.level_cfg(0)
    if smoother == "richardson":
        w = hier.damping.astype(f32)
        return w, jnp.zeros((), f32), w
    if degree == 1:
        rho = lev.rho.astype(f32)
        theta = 0.5 * (hier.cheby_hi * rho + hier.cheby_lo * rho)
        s0 = (1.0 / theta).astype(f32)
        return s0, jnp.zeros((), f32), s0
    rho = lev.rho.astype(f32)
    lo = hier.cheby_lo * rho
    hi = hier.cheby_hi * rho
    theta = 0.5 * (hi + lo)
    delta = 0.5 * (hi - lo)
    sigma = theta / delta
    rho_c = 1.0 / sigma
    rho_new = 1.0 / (2.0 * sigma - rho_c)
    s0 = 1.0 / theta               # first-step scale (1/theta)
    ad = rho_new * rho_c           # d-recurrence coefficient
    g = 2.0 * rho_new / delta      # residual-term coefficient
    return s0.astype(f32), ad.astype(f32), g.astype(f32)


def vcycle_fused(hier: Hierarchy, b_p, gamma: int = 1):
    """One multigrid cycle from a zero guess with the fused fine level.

    Same contract as ``hierarchy.vcycle`` on a padded-resident fine level;
    falls back to it when the configuration is unsupported.
    """
    out = _vcycle_fused_impl(hier, b_p, gamma, with_dots=False)
    return out if out is not None else vcycle(hier, b_p, gamma=gamma)


def vcycle_fused_dots(hier: Hierarchy, b_p, gamma: int = 1):
    """``(z, rz, rr)`` where z = M^-1 b, rz = <b, z>, rr = <b, b>.

    The two dots ride INSIDE the fused kernels (descent_rr accumulates
    <b, b>, ascent_rz accumulates <b, out>), so a CG iteration using this
    form pays zero extra HBM passes for its ||r|| and <r, z> reductions.
    Falls back to the standard cycle + XLA dots when unsupported."""
    out = _vcycle_fused_impl(hier, b_p, gamma, with_dots=True)
    if out is not None:
        return out
    z = vcycle(hier, b_p, gamma=gamma)
    flat_b = b_p.reshape(-1)
    return (
        z,
        jnp.vdot(flat_b, z.reshape(-1)),
        jnp.vdot(flat_b, flat_b),
    )


def vcycle_fused_rupdate(hier: Hierarchy, r_p, ap_p, alpha, gamma: int = 1):
    """``(z, r_new, rz, rr)`` — the CG iteration's whole "bottom half" with
    the residual update fused into the downstroke kernel:
    ``r_new = r - alpha*ap`` is formed inside 'descentu' (one extra h3 read
    + one write instead of a separate full-field axpy pass), carried through
    pre-smooth/residual/P^T-smoothing, and ``rr = <r_new, r_new>`` /
    ``rz = <r_new, z>`` ride the kernels' fused dot outputs.  Callers must
    preflight with ``with_cg=True``; unsupported configurations fall back to
    an XLA r-update + ``vcycle_fused_dots`` (same math, more passes)."""
    if not (
        cg_fusion_supported(hier)
        and _vcycle_rupdate_ready(hier)
    ):
        r_new = r_p - alpha * ap_p
        z, rz, rr = vcycle_fused_dots(hier, r_new, gamma=gamma)
        return z, r_new, rz, rr
    lev = hier.levels[0]
    op: PaddedStar = lev.op
    tr: PaddedTransfer = lev.transfer
    inner = tr.inner
    s0, ad, g = _fine_scalars(hier, lev)
    gw = inner.omega.astype(jnp.float32)
    shape = op.true_shape
    interpret = op.backend == "interpret"
    alpha = jnp.asarray(alpha, jnp.float32)

    flegs = _flegs_of(inner)
    if op._use_pallas():
        from tpusparse.kernels.fused7 import fused7_call

        x1, s, r_new, rr = fused7_call(
            "descentu", op.diag, op.cx, op.cy, op.cz, r_p, ap_p, r_p,
            g, ad, s0, shape=shape, pinned=op.pinned,
            interpret=interpret, gw=gw, g2=alpha, flegs=flegs,
        )
    else:
        from tpusparse.kernels.fused7 import fused7_xla

        x1, s, r_new, rr = fused7_xla(
            "descentu", op, r_p, ap_p, r_p, g, ad, s0, gw=gw, g2=alpha,
            fop=inner.fop,
        )
    r_c = tr.tT_apply_padded(s)

    e = vcycle(hier, r_c, level=1, gamma=gamma)
    for _ in range(gamma - 1):
        r_c2 = r_c - hier.levels[1].op.mv(e)
        e = e + vcycle(hier, r_c2, level=1, gamma=gamma)

    t = tr.t_apply_padded(e)
    if op._use_pallas():
        z, rz = fused7_call(
            "ascent_rz", op.diag, op.cx, op.cy, op.cz, t, r_new, x1,
            s0, ad, s0, shape=shape, pinned=op.pinned,
            interpret=interpret, gw=gw, g2=g, flegs=flegs,
        )
    else:
        z, rz = fused7_xla(
            "ascent_rz", op, t, r_new, x1, s0, ad, s0, gw=gw, g2=g,
            fop=inner.fop,
        )
    return z, r_new, rz, rr


def _vcycle_rupdate_ready(hier: Hierarchy) -> bool:
    """Pallas eligibility for the full-fusion kernels (mirrors
    _vcycle_fused_impl's _TZ_CACHE gate)."""
    op = hier.levels[0].op
    if not op._use_pallas() or op.backend == "interpret":
        return True
    from tpusparse.kernels.fused7 import _TZ_CACHE

    return not any(
        _TZ_CACHE.get((m, tuple(op.true_shape))) == 0
        for m in ("cgmv", "descentu", "ascent_rz")
    )


def _vcycle_fused_impl(hier: Hierarchy, b_p, gamma: int, with_dots: bool):
    """Shared body; returns None when the fused fine level can't run."""
    if not fused_fine_supported(hier):
        return None
    lev = hier.levels[0]
    op: PaddedStar = lev.op
    tr: PaddedTransfer = lev.transfer
    inner = tr.inner
    s0, ad, g = _fine_scalars(hier, lev)
    gw = inner.omega.astype(jnp.float32)
    shape = op.true_shape
    interpret = op.backend == "interpret"
    d_mode, a_mode = _modes(hier)
    if with_dots:
        d_mode, a_mode = d_mode + "_rr", a_mode + "_rz"
    if op._use_pallas() and not interpret:
        from tpusparse.kernels.fused7 import _TZ_CACHE

        if any(
            _TZ_CACHE.get((m, tuple(shape))) == 0
            for m in (d_mode, a_mode)
        ):
            # preflight proved no slab depth compiles for this shape
            return None

    # scalar-slot assignment per mode (see fused7 kernel): descent uses
    # s0 (pre step 1), ad+g (pre step 2), gw; ascent uses gw, g-slot for
    # post step 1 (the 1/theta scale, i.e. s0 here) and ad+g2 for step 2.
    flegs = _flegs_of(inner)
    if op._use_pallas():
        def call(mode, x_p, d_p, g_slot, g2_slot):
            return fused7_call(
                mode, op.diag, op.cx, op.cy, op.cz, x_p, b_p, d_p,
                g_slot, ad, s0, shape=shape, pinned=op.pinned,
                interpret=interpret, gw=gw, g2=g2_slot, flegs=flegs,
            )
    else:
        def call(mode, x_p, d_p, g_slot, g2_slot):
            return fused7_xla(
                mode, op, x_p, b_p, d_p, g_slot, ad, s0, gw=gw,
                g2=g2_slot, fop=inner.fop,
            )

    # downstroke: pre-smooth + residual + P^T-smoothing pass, fused
    if with_dots:
        x1, s, rr = call(d_mode, b_p, b_p, g, g)
    else:
        x1, s = call(d_mode, b_p, b_p, g, g)
    r_c = tr.tT_apply_padded(s)

    e = vcycle(hier, r_c, level=1, gamma=gamma)
    for _ in range(gamma - 1):
        # W-cycle: re-enter the coarse hierarchy on the updated residual
        r_c2 = r_c - hier.levels[1].op.mv(e)
        e = e + vcycle(hier, r_c2, level=1, gamma=gamma)

    # upstroke: P smoothing + correction + post-smooth, fused (the transfer
    # einsums write the padded layout directly — no separate pad pass)
    t = tr.t_apply_padded(e)
    if a_mode.startswith("ascent1"):
        # degree-1 upstroke uses only the g slot (one post sweep)
        out = call(a_mode, t, x1, g, g)
    else:
        out = call(a_mode, t, x1, s0, g)
    if with_dots:
        z, rz = out
        return z, rz, rr
    return out
