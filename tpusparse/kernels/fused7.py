"""Fused 7-point-stencil kernels — the V-cycle's fine level in minimal HBM
passes.

Motivation (round-1 audit, results/README.md): the production V-cycle spends
~5.6 effective HBM passes per fine-level operator apply against a 3-pass
minimum, because each XLA ``lax.pad``-shift apply materializes intermediates
and the standalone-faster Pallas mv loses *in context* — the custom call
blocks XLA from fusing the surrounding smoother/residual elementwise work.
The fix is the reference's own step-4 lesson taken further
(``/root/reference/src/openacc-step4/MatMult_SeqAIJ.patch:50-91``: pipeline
the kernel against its transfers): pull the neighboring elementwise work
*into* the kernel, and **chain multiple stencil applications per HBM pass**
(temporal blocking over the FACE=3-deep halo planes of the padded layout).

Kernel family (one gridless double-buffered slab pipeline, output write DMAs
double-buffered so slab i's writeback overlaps slab i+1's compute):

=========== =================================================== =============
mode        computes                                            HBM passes
=========== =================================================== =============
mv          w = A x                                             3
residual    b - A x                                             4
rich        x + g * D^-1 (b - A x)                              5
cheb0       d' = g D^-1 (b - A x);  x' = x + d'                 6
cheb        d' = ad*d + g D^-1 (b - A x);  x' = x + d'          7
pre2        u = s0 D^-1 b;  d' = ad*u + g D^-1 (b - A u);       4
            x' = u + d'          (both pre-smoothing steps)
restrict    r - g * A (D^-1 r)     (P^T smoothing pass)         3
prolong     t - g * D^-1 (A t)     (P smoothing pass)           3
descent     the V-cycle's ENTIRE fine-level downstroke:         ~4.6*
            u  = s0 D^-1 b                 (pre-smooth 1)
            x1 = u + ad*u + g D^-1 (b-Au)  (pre-smooth 2)
            r  = b - A x1                  (residual)
            s  = r - gw A (D^-1 r)         (P^T smoothing)
            out: (x1, s)  — 3 chained stencils, 2 reads+2 writes
ascent      the ENTIRE fine-level upstroke:                     ~6*
            x2 = x1 + t - gw D^-1 (A t)    (P smoothing + add)
            d  = g0 D^-1 (b - A x2)        (post-smooth 1)
            x3 = x2 + d
            x4 = x3 + ad*d + g D^-1 (b-Ax3) (post-smooth 2)
            out: x4       — 3 chained stencils, 4 reads+1 write
=========== =================================================== =============

descent_rr / ascent_rz: the descent/ascent math plus a fused CG dot
(<b,b> resp. <b,out>) accumulated in VMEM and shipped via a small third
output — the CG shell's ||r||^2 / <r,z> reductions without their own
full-field HBM passes.  descent1_rr / ascent1_rz are the degree-1 twins.

(*) The pass counts above are now EXACT, not effective: consecutive slabs'
operand windows overlap by 2h planes, and the kernel carries that overlap
in per-operand VMEM tail buffers (halo sharing), so each operand is read
from HBM exactly once — the earlier (tz+2h)/tz re-read factor is gone.

A pass = one fine-field read or write of HBM traffic.  D is the ``diag``
field inverted on the VPU — reading diag instead of a separate dinv array is
what keeps the smoother modes lean.  One CG+AMG iteration's fine level drops
from ~40 XLA passes to descent + ascent + one mv ≈ 14.

Toolchain constraints honored (probed on the deployed v5e Mosaic — see
``kernels/stencil7.py``): gridless kernels only, explicit ``make_async_copy``
DMAs, i32 index math, no scalar VMEM stores, traced scalars ride in as
replicated (8, nxp) planes.

Layouts: padded-resident fields (``sparse/padded.py``): (nz+2*FACE, nyp,
nxp) with zero faces/pads; diag pads are 1.0 (safe to invert).  Chained
stencil steps re-zero out-of-domain planes after every step, preserving both
the Neumann dropped-entry boundary (``/root/reference/src/helper.cpp:229-233``)
and the pad-zero invariant.  f32 only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels.stencil7 import FACE, _pick_tz, padded_shape

# per-mode operand windows: slot -> halo depth (planes beyond the slab on
# each side).  Slots: p (primary stencil input), diag, b, d (fourth operand).
_WINDOWS = {
    "mv": {"p": 1, "diag": 0},
    "mvdot": {"p": 1, "diag": 0},   # y = A x  AND  partial <x, A x> sums
    "residual": {"p": 1, "diag": 0, "b": 0},
    "rich": {"p": 1, "diag": 0, "b": 0},
    "cheb0": {"p": 1, "diag": 0, "b": 0},
    "cheb": {"p": 1, "diag": 0, "b": 0, "d": 0},
    "pre2": {"p": 3, "diag": 3},             # p = b
    "restrict": {"p": 1, "diag": 1},         # p = r
    "prolong": {"p": 1, "diag": 0},          # p = t
    "descent": {"p": 3, "diag": 3},          # p = b
    "ascent": {"p": 3, "diag": 2, "b": 1, "d": 2},  # p = t, d = x1
    # dot-fused CG variants: same math as descent/ascent plus one fused
    # reduction over operands the kernel already holds in VMEM — descent_rr
    # also returns <b, b> (CG's ||r||^2: b IS the residual), ascent_rz also
    # returns <b, out> (CG's <r, z>: the V-cycle output IS z).  Both kill a
    # full-field XLA reduction pass per CG iteration.
    "descent_rr": {"p": 3, "diag": 3},       # p = b
    "ascent_rz": {"p": 3, "diag": 2, "b": 1, "d": 2},
    # degree-1 smoother variants (the verbatim reference config:
    # -mg_levels_ksp_type richardson -mg_levels_ksp_max_it 1): one
    # pre/post sweep, 2 chained stencils per launch
    "descent1": {"p": 2, "diag": 2},         # p = b
    "ascent1": {"p": 2, "diag": 1, "b": 0, "d": 1},  # p = t, d = x1
    "descent1_rr": {"p": 2, "diag": 2},
    "ascent1_rz": {"p": 2, "diag": 1, "b": 0, "d": 1},
    # full-fusion CG modes (round 5): every XLA vector pass of a CG+AMG
    # iteration folded into the kernels.  cgmv runs the CG "top half" —
    # p' = z + beta*p, the DEFERRED x update x' = x + alpha_prev*p, w = A p'
    # and the fused <p', A p'> — one pass instead of the p-update axpy +
    # mv + dot + half the x/r axpy pass (saves ~2 HBM passes + 3 XLA
    # dispatches per iteration).  descentu is descent_rr with the CG
    # r-update fused in front: r' = r - alpha*ap computed at h3 and carried
    # through the whole downstroke, with r' also written back (third
    # output) for the next iteration — kills the other half of the axpy
    # pass.  alpha rides in the g2 scalar slot (free in descent modes).
    "cgmv": {"p": 1, "diag": 0, "b": 1, "d": 0},  # p = z, b = p_old, d = x
    "descentu": {"p": 3, "diag": 3, "b": 3},      # p = r_old, b = ap
}
_TWO_OUT = {
    "cheb0", "cheb", "pre2", "descent", "descent1", "descent_rr",
    "descent1_rr",
}
_THREE_OUT = {"cgmv", "descentu"}
# modes that accumulate a fused dot and ship it via the small last output
_DOT_OUT = {
    "mvdot", "descent_rr", "ascent_rz", "descent1_rr", "ascent1_rz",
    "cgmv", "descentu",
}
MODES = tuple(_WINDOWS)


def _n_out(mode: str) -> int:
    return 3 if mode in _THREE_OUT else (2 if mode in _TWO_OUT else 1)


# (mode, shape) -> compile-verified tz, filled by ``preflight_tz``.  Mosaic's
# register-spill behavior for the composite kernels has NO reliable static
# predictor (measured on the v5e: a 1.99M-element window compiles at 144^3
# while 1.87M spills 71MB at 192^3), so the model pick below is only the
# first candidate of an AOT-verified ladder.  Verified results persist to a
# sidecar of the XLA compile cache so later processes skip the AOT round.
_TZ_CACHE: dict = {}
_TZ_CACHE_FILE = "/root/.cache/tpusparse_xla/fused7_tz.json"
_TZ_LOADED = False


def _toolchain_tag() -> str:
    """Verdicts are toolchain- AND kernel-version-specific: stale spill
    verdicts from an older jax/libtpu OR an older version of this kernel
    source would silently disable (cached 0) or mis-size the kernels."""
    try:
        import jaxlib

        lib = getattr(jaxlib, "__version__", "?")
    except Exception:
        lib = "?"
    try:
        import hashlib

        src = hashlib.sha1(open(__file__, "rb").read()).hexdigest()[:10]
    except OSError:
        src = "?"
    return f"jax{jax.__version__}-jaxlib{lib}-src{src}"


def _tz_cache_load():
    global _TZ_LOADED
    if _TZ_LOADED:
        return
    _TZ_LOADED = True
    import json

    try:
        with open(_TZ_CACHE_FILE) as f:
            payload = json.load(f)
        if payload.get("__toolchain__") != _toolchain_tag():
            return  # different jax/libtpu: re-verify everything
        for k, v in payload.items():
            if k.startswith("__"):
                continue
            mode, *dims = k.split(":")
            _TZ_CACHE.setdefault((mode, tuple(map(int, dims))), int(v))
    except (OSError, ValueError):
        pass


def _tz_cache_store():
    import json
    import os

    try:
        os.makedirs(os.path.dirname(_TZ_CACHE_FILE), exist_ok=True)
        data = {
            f"{m}:{':'.join(map(str, s))}": v
            for (m, s), v in _TZ_CACHE.items()
        }
        data["__toolchain__"] = _toolchain_tag()
        tmp = _TZ_CACHE_FILE + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, _TZ_CACHE_FILE)
    except OSError:
        pass


def _tz_candidates(nz: int, ny: int, nx: int, mode: str) -> list[int]:
    """Retry ladder: divisors at or below the model pick, ordered so depths
    inside the empirically-safe window-row region come first (v5e spill
    observations: descent OK at 4864 rows / spills at 5472; ascent OK at
    3648 / spills at 4864)."""
    from tpusparse.kernels.stencil7 import _pad_to

    first = _pick_tz_mode(nz, ny, nx, mode)
    nyp = _pad_to(ny, 8)
    soft_rows = 3700 if mode in ("ascent", "ascent_rz") else 5000
    divs = [
        tz for tz in range(first, 1, -1)
        if nz % tz == 0 and nz // tz >= 2
    ]
    safe = [t for t in divs if (t + 2 * FACE) * nyp <= soft_rows]
    risky = [t for t in divs if t not in safe]
    # one shot at the (possibly risky) model pick — it wins big when Mosaic
    # accepts it (e.g. tz=48 at 144^3) and the verdict is cached forever —
    # then the empirically-safe ladder, then the remaining risky depths
    order = [first] + safe + risky
    return list(dict.fromkeys(order))


def preflight_tz(mode: str, shape, pinned: bool) -> int:
    """AOT-compile the kernel down the tz ladder; cache and return the first
    slab depth Mosaic accepts (0 if none — callers fall back to XLA).

    Run this EAGERLY (e.g. at preconditioner setup) on the TPU backend; the
    in-solve compile then uses the verified tz."""
    _tz_cache_load()
    key = (mode, tuple(shape))
    if key in _TZ_CACHE:
        return _TZ_CACHE[key]
    nz, ny, nx = shape
    nzp, nyp, nxp = padded_shape(shape)
    field = jax.ShapeDtypeStruct((nzp, nyp, nxp), jnp.float32)
    s = jax.ShapeDtypeStruct((), jnp.float32)
    for tz in _tz_candidates(nz, ny, nx, mode):
        try:
            fused7_call.lower(
                mode, field, s, s, s, field, field, field, s, s, s,
                shape=tuple(shape), pinned=pinned, gw=s, g2=s,
                tz_override=tz,
            ).compile()
            _TZ_CACHE[key] = tz
            _tz_cache_store()
            return tz
        except Exception:
            continue
    _TZ_CACHE[key] = 0
    _tz_cache_store()
    return 0


def _pick_tz_mode(nz: int, ny: int, nx: int, mode: str) -> int:
    """Slab depth for the composite (3-chained-stencil) modes.

    Their VMEM pressure is dominated by Mosaic's live *temporaries* (the
    chained intermediate windows), not just the declared scratch — measured
    on the v5e: tz=20 at 300^3 wants 204MB of the 128MB VMEM.  The budget
    below models scratch + ~8 live window temporaries and is calibrated so
    300^3 lands on tz=10 (compiles with room to spare).  A verified entry
    in ``_TZ_CACHE`` (see ``preflight_tz``) always wins."""
    _tz_cache_load()
    cached = _TZ_CACHE.get((mode, (nz, ny, nx)))
    if cached:
        return cached
    if mode not in (
        "descent", "ascent", "pre2", "descent1", "ascent1",
        "descent_rr", "ascent_rz", "descent1_rr", "ascent1_rz",
        "cgmv", "descentu",
    ):
        return _pick_tz(nz)
    from tpusparse.kernels.stencil7 import _pad_to

    plane = _pad_to(ny, 8) * _pad_to(nx, 128) * 4
    budget = 118 * 1024 * 1024
    halos = _WINDOWS[mode]
    n_out = _n_out(mode)
    # live-temporary window count, calibrated on the v5e at 300^3:
    # descent compiles at tz=10 and OOMs at 12; ascent (deeper chain, four
    # buffered operands) compiles at tz=6 and OOMs at 10.  cgmv chains only
    # one stencil (few live windows); descentu = descent + one extra
    # h3 operand, same chain depth
    temps = (
        12 if mode.startswith("ascent")
        else 6 if mode == "cgmv"
        else 8
    )
    best = 0
    for tz in range(2, nz + 1):
        if nz % tz or nz // tz < 2:
            continue
        need = plane * (
            # dbl-buf inputs carry only the NEW tz planes; the 2h-plane
            # overlap rides in single-buffered tails (halo sharing)
            sum(2 * tz + 2 * h for h in halos.values())
            + 2 * n_out * tz                               # dbl-buf outputs
            + temps * (tz + 2 * FACE)                      # live temporaries
            + FACE
        )
        if need <= budget and tz > best:
            best = tz
    return best if best else _pick_tz(nz)


def _kernel(
    coef_ref, zref, p_hbm, d_hbm, b_hbm, dd_hbm, *rest,
    mode, tz, nz, ny, nx, nyp, pinned, nzg,
):
    """Gridless pair-pipelined slab loop over 2-D row views.

    A z-plane is ``nyp`` rows; slab i owns domain planes [i*tz, i*tz+tz),
    living at padded planes [i*tz + FACE, ...).

    Halo sharing: consecutive slabs' operand windows overlap by 2h planes.
    Each slab DMAs only its NEW tz planes (rows [i*rows + (FACE+h)*nyp,
    ... + rows)); the overlap is carried in a per-operand VMEM *tail* buffer
    (the top 2h planes of the previous window), so every operand is read
    from HBM exactly once regardless of halo depth — the (tz+2h)/tz re-read
    factor of the naive windowed pipeline is gone.  Slab 0's tail (the low
    z-face planes plus nothing else) is fetched by a one-time DMA.
    """
    n_out = _n_out(mode)
    # ``rest`` = n_out field outputs + the small dot output, then scratch
    y_hbms = rest[:n_out]
    dot_hbm = rest[n_out]
    (ps, ds, bs, dds, ys, zp_buf, acc, tp, td, tb, tdd,
     sp, sd, sb, sdd, swb, sz, st) = rest[n_out + 1:]
    nxp = ys.shape[-1]
    rows = tz * nyp
    grid = nz // tz
    i32 = jnp.int32
    halos = _WINDOWS[mode]

    # scalars ride in SMEM (legalizes in gridless kernels — probed; the
    # grid-kernel limitation recorded for round 1 does not apply here) and
    # read as true 0-d values: fully-replicated layouts that any later
    # value slice handles.  ((1, nxp) broadcast rows are NOT safe: Mosaic
    # pushes row-slices of their products onto the dim-1 operand and
    # SIGABRTs in ApplyVectorLayout.)
    cx = coef_ref[0, 0]
    cy = coef_ref[1, 0]
    cz = coef_ref[2, 0]
    g = coef_ref[3, 0]
    ad = coef_ref[4, 0]
    s0 = coef_ref[5, 0]
    gw = coef_ref[6, 0]
    g2 = coef_ref[7, 0]
    # filtered-operator legs for the P-smoothing passes only
    # (-pc_gamg_threshold semicoarsening zeroes weak-axis legs in the
    # prolongator smoother; the residual/relaxation passes keep the full
    # stencil).  Callers without a filter pass the full legs here.
    fcx = coef_ref[8, 0]
    fcy = coef_ref[9, 0]
    fcz = coef_ref[10, 0]
    # global-z placement (sharded operation): this block owns GLOBAL domain
    # planes [z0, z0 + nz) of a [0, nzg) grid; its z-face halo planes hold
    # refreshed neighbor data (not out-of-domain zeros) unless they fall
    # outside [0, nzg).  Single-device: z0 = 0, nzg = nz — identical masks.
    z0 = zref[0, 0]

    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    slots = [
        ("p", p_hbm, ps, sp, tp), ("diag", d_hbm, ds, sd, td),
        ("b", b_hbm, bs, sb, tb), ("d", dd_hbm, dds, sdd, tdd),
    ]
    active = [s for s in slots if s[0] in halos]

    def dma_in(name, hbm, buf_ref, sem, i, buf):
        # NEW part only: rows [i*rows + (FACE+h)*nyp, ... + rows); the
        # preceding 2h halo planes ride in the tail buffer (see _tail_dma)
        h = halos[name]
        start = i * i32(rows) + i32((FACE + h) * nyp)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, rows)],
            buf_ref.at[jnp.int32(buf)], sem.at[jnp.int32(buf)],
        )

    def tail_dma(idx, name, hbm, tail_ref):
        # slab 0's low-halo planes: padded rows [(FACE-h)*nyp, (FACE+h)*nyp)
        h = halos[name]
        return pltpu.make_async_copy(
            hbm.at[pl.ds(i32((FACE - h) * nyp), 2 * h * nyp)],
            tail_ref, st.at[jnp.int32(idx)],
        )

    def start_in(i, buf):
        for name, hbm, buf_ref, sem, _t in active:
            dma_in(name, hbm, buf_ref, sem, i, buf).start()

    def wait_in(i, buf):
        for name, hbm, buf_ref, sem, _t in active:
            dma_in(name, hbm, buf_ref, sem, i, buf).wait()

    def load_windows(buf):
        """Build each operand's full (tz+2h)-plane window from its tail +
        freshly DMA'd new part, and roll the tails forward for the next
        slab (the top 2h planes of the current window)."""
        wins = {}
        for name, _hbm, buf_ref, _sem, tail_ref in active:
            h = halos[name]
            new = buf_ref[jnp.int32(buf)]
            if h == 0:
                wins[name] = new
                continue
            w = jnp.concatenate([tail_ref[...], new], axis=0)
            tail_ref[...] = w[rows:rows + 2 * h * nyp]
            wins[name] = w
        return wins

    def wb_copy(i, buf, out):
        hbm = y_hbms[out]
        return pltpu.make_async_copy(
            ys.at[jnp.int32(out * 2 + buf)],
            hbm.at[pl.ds(i * i32(rows) + i32(FACE * nyp), rows)],
            swb.at[jnp.int32(out * 2 + buf)],
        )

    # --- window algebra ------------------------------------------------------
    def rlen(h):
        return rows + 2 * h * nyp

    def win(a, h_have, h_want):
        """Slice an h_have-halo window down to h_want halos."""
        off = (h_have - h_want) * nyp
        return a[off:off + rlen(h_want)] if off else a

    # Index arrays are built FRESH per window size, never sliced: iota
    # values carry replicated Mosaic layouts (column iotas replicate over
    # sublanes, row iotas over lanes), and slicing a replicated value trips
    # an ApplyVectorLayout crash once the sliced dim spans >1 tile
    # ("Check failed: limits[i] <= dim(i)", bisected on the v5e).  Fresh
    # iotas are free — same replicated vregs — and window starts are plane
    # multiples, so jj/kk0 are window-start independent.
    def iotas(h):
        """(ii, jj, kk0) index arrays for an h-halo window; kk0 + i*tz - h
        is the domain plane index."""
        R = rlen(h)
        rr = jax.lax.broadcasted_iota(i32, (R, nxp), 0)
        ii = jax.lax.broadcasted_iota(i32, (R, nxp), 1)
        return (ii, rr % i32(nyp), rr // i32(nyp))

    def mask_dom(v, h, i):
        """Zero everything outside the GLOBAL domain on an h-halo window —
        preserves both the pad-zero invariant and the Neumann boundary for
        the NEXT chained stencil step.  Halo planes belonging to a
        neighboring shard (0 <= kk + z0 < nzg but kk outside [0, nz)) are
        KEPT: chained steps need their intermediate values there."""
        ii, jj, kk0 = iotas(h)
        kk = i * i32(tz) + i32(-h) + kk0  # local domain plane index
        kg = kk + z0
        ok = (kg >= 0) & (kg < i32(nzg)) & (jj < ny) & (ii < nx)
        return jnp.where(ok, v, zero)

    def apply_a(u, center, h_out, i, legs=None):
        """w = A u on the h_out-halo window; ``u`` must carry h_out+1 halos
        and be zero outside the domain; ``center`` is the precomputed
        diagonal term on the h_out window.  ``legs`` overrides the off-
        diagonal coefficients (the filtered P-smoothing operator)."""
        a_x, a_y, a_z = legs if legs is not None else (cx, cy, cz)
        R = rlen(h_out)
        cur = u[nyp:nyp + R]
        dn = u[0:R]
        up = u[2 * nyp:2 * nyp + R]
        ii, jj, kk0 = iotas(h_out)

        xp = pltpu.roll(cur, i32(nxp - 1), 1)
        xm = pltpu.roll(cur, jnp.int32(1), 1)
        yp = pltpu.roll(cur, i32(R - 1), 0)
        ym = pltpu.roll(cur, jnp.int32(1), 0)
        zp = up
        zm = dn
        if nx == nxp:  # tile-aligned: no zero pad column, mask the edge
            xp = jnp.where(ii < nx - 1, xp, zero)
            xm = jnp.where(ii > 0, xm, zero)
        if ny == nyp:
            yp = jnp.where(jj < ny - 1, yp, zero)
            ym = jnp.where(jj > 0, ym, zero)
        if pinned:
            kg = i * i32(tz) + i32(-h_out) + kk0 + z0  # GLOBAL plane index
            # column-0 zeroing: only rows (0,0,1), (0,1,0), (1,0,0) read
            # x[0,0,0] as a neighbor — mask exactly those reads.  Global
            # coordinates: only the shard owning plane 0 ever matches.
            xm = jnp.where((kg == 0) & (jj == 0) & (ii == 1), zero, xm)
            ym = jnp.where((kg == 0) & (jj == 1) & (ii == 0), zero, ym)
            zm = jnp.where((kg == 1) & (jj == 0) & (ii == 0), zero, zm)
        w = center + a_x * (xp + xm) + a_y * (yp + ym) + a_z * (zp + zm)
        if pinned:
            origin = (kg == 0) & (jj == 0) & (ii == 0)
            w = jnp.where(origin, center, w)
        return w

    def compute(i, buf):
        """Output tuple for slab i from double buffer ``buf`` (static)."""
        wins = load_windows(buf)
        p = wins["p"]
        diag = wins["diag"]
        hp, hd = halos["p"], halos["diag"]

        if mode == "mv":
            w = apply_a(p, diag * win(p, 1, 0), 0, i)
            return (mask_dom(w, 0, i),)
        if mode == "mvdot":
            w = mask_dom(apply_a(p, diag * win(p, 1, 0), 0, i), 0, i)
            # partial <x, A x> accumulated across slabs (fused CG dot: the
            # caller's alpha denominator without re-reading x and y)
            part = jnp.sum(win(p, 1, 0) * w, axis=0, keepdims=True)
            acc[0:1, :] = acc[0:1, :] + part
            return (w,)
        if mode == "cgmv":
            # CG top half: p' = z + beta*p (h1, stays zero outside the
            # domain by linearity — both operands are maintained masked),
            # w = A p', deferred x' = x + alpha_prev*p, fused <p', A p'>.
            # Scalar slots: g = beta, ad = alpha_prev.
            z1 = p                       # primary = z (h1)
            pold1 = wins["b"]            # p_old (h1)
            xw = wins["d"]               # x (h0)
            pn1 = z1 + g * pold1
            w = mask_dom(apply_a(pn1, diag * win(pn1, 1, 0), 0, i), 0, i)
            pn0 = win(pn1, 1, 0)
            xn = xw + ad * win(pold1, 1, 0)
            acc[0:1, :] = acc[0:1, :] + jnp.sum(
                pn0 * w, axis=0, keepdims=True
            )
            return (w, pn0, xn)
        if mode == "residual":
            w = apply_a(p, diag * win(p, 1, 0), 0, i)
            return (mask_dom(wins["b"] - w, 0, i),)
        if mode == "restrict":
            u = p * (one / diag)                     # D^-1 r on h1
            w = apply_a(u, win(p, 1, 0), 0, i, legs=(fcx, fcy, fcz))
            # (center: diag*(D^-1 r) == r — the filter keeps the diagonal)
            return (mask_dom(win(p, 1, 0) - g * w, 0, i),)
        if mode == "prolong":
            w = apply_a(
                p, diag * win(p, 1, 0), 0, i, legs=(fcx, fcy, fcz)
            )
            return (
                mask_dom(win(p, 1, 0) - g * ((one / diag) * w), 0, i),
            )
        if mode in ("rich", "cheb0", "cheb"):
            cur = win(p, 1, 0)
            w = apply_a(p, diag * cur, 0, i)
            s = (one / diag) * (wins["b"] - w)
            if mode == "rich":
                return (mask_dom(cur + g * s, 0, i),)
            if mode == "cheb0":
                dnew = g * s
            else:
                dnew = ad * wins["d"] + g * s
            return (
                mask_dom(cur + dnew, 0, i), mask_dom(dnew, 0, i)
            )
        if mode == "pre2":
            dinv3 = one / diag
            u3 = (s0 * p) * dinv3                    # pre-smooth 1 (h3)
            w = apply_a(win(u3, 3, 1), s0 * win(p, 3, 0), 0, i)
            u0 = win(u3, 3, 0)
            dnew = ad * u0 + g * ((one / win(diag, 3, 0)) * (win(p, 3, 0) - w))
            return (
                mask_dom(u0 + dnew, 0, i), mask_dom(dnew, 0, i)
            )
        if mode in ("descent", "descent_rr"):
            b3, diag3 = p, diag
            dinv3 = one / diag3                      # ONE reciprocal; the
            # narrower windows below reuse slices of it (divides are the
            # costliest VPU op in the chain — 2 fewer per element)
            u3 = (s0 * b3) * dinv3                   # pre-smooth 1; zero at
            # pads by construction (b pads 0, diag pads 1)
            w1 = apply_a(u3, s0 * win(b3, 3, 2), 2, i)
            u2 = win(u3, 3, 2)
            x1_2 = u2 + ad * u2 + g * (
                win(dinv3, 3, 2) * (win(b3, 3, 2) - w1)
            )                                        # pre-smooth 2 (h2)
            x1_2 = mask_dom(x1_2, 2, i)
            w2 = apply_a(x1_2, win(diag3, 3, 1) * win(x1_2, 2, 1), 1, i)
            r1 = mask_dom(win(b3, 3, 1) - w2, 1, i)  # residual (h1)
            u1 = r1 * win(dinv3, 3, 1)
            w3 = apply_a(
                u1, win(r1, 1, 0), 0, i, legs=(fcx, fcy, fcz)
            )                                        # diag*(D^-1 r) == r
            s_ = mask_dom(win(r1, 1, 0) - gw * w3, 0, i)
            if mode == "descent_rr":
                # fused <b, b> (CG's ||r||^2) — domain-only: the h0 window
                # has no z-face planes and y/x pads are zero by invariant
                b0 = mask_dom(win(b3, 3, 0), 0, i)
                acc[0:1, :] = acc[0:1, :] + jnp.sum(
                    b0 * b0, axis=0, keepdims=True
                )
            return (win(x1_2, 2, 0), s_)
        if mode == "descentu":
            # descent_rr with the CG r-update fused in front: the updated
            # residual r' = r_old - alpha*ap (alpha in the g2 slot) is
            # formed at h3 — zero outside the domain by linearity (both
            # operands maintained masked) — carried through the whole
            # downstroke as b3, and its h0 window written back as a third
            # output for the next iteration.  The fused dot is <r', r'>.
            diag3 = diag
            b3 = p - g2 * wins["b"]                  # r' at h3
            dinv3 = one / diag3                      # one reciprocal, reused
            u3 = (s0 * b3) * dinv3                   # pre-smooth 1
            w1 = apply_a(u3, s0 * win(b3, 3, 2), 2, i)
            u2 = win(u3, 3, 2)
            x1_2 = u2 + ad * u2 + g * (
                win(dinv3, 3, 2) * (win(b3, 3, 2) - w1)
            )                                        # pre-smooth 2 (h2)
            x1_2 = mask_dom(x1_2, 2, i)
            w2 = apply_a(x1_2, win(diag3, 3, 1) * win(x1_2, 2, 1), 1, i)
            r1 = mask_dom(win(b3, 3, 1) - w2, 1, i)  # residual (h1)
            u1 = r1 * win(dinv3, 3, 1)
            w3 = apply_a(
                u1, win(r1, 1, 0), 0, i, legs=(fcx, fcy, fcz)
            )                                        # diag*(D^-1 r) == r
            s_ = mask_dom(win(r1, 1, 0) - gw * w3, 0, i)
            rnew0 = mask_dom(win(b3, 3, 0), 0, i)
            acc[0:1, :] = acc[0:1, :] + jnp.sum(
                rnew0 * rnew0, axis=0, keepdims=True
            )
            return (win(x1_2, 2, 0), s_, rnew0)
        if mode in ("descent1", "descent1_rr"):
            # degree-1 downstroke: pre-smooth(1) + residual + P^T smoothing
            b2, diag2 = p, diag
            dinv2 = one / diag2
            x1_2 = mask_dom(g * (b2 * dinv2), 2, i)   # one Richardson sweep
            w1 = apply_a(x1_2, win(diag2, 2, 1) * win(x1_2, 2, 1), 1, i)
            r1 = mask_dom(win(b2, 2, 1) - w1, 1, i)
            u1 = r1 * win(dinv2, 2, 1)
            w2 = apply_a(
                u1, win(r1, 1, 0), 0, i, legs=(fcx, fcy, fcz)
            )                                         # diag*(D^-1 r) == r
            s_ = mask_dom(win(r1, 1, 0) - gw * w2, 0, i)
            if mode == "descent1_rr":
                b0 = mask_dom(win(b2, 2, 0), 0, i)
                acc[0:1, :] = acc[0:1, :] + jnp.sum(
                    b0 * b0, axis=0, keepdims=True
                )
            return (win(x1_2, 2, 0), s_)
        if mode in ("ascent1", "ascent1_rz"):
            # degree-1 upstroke: P smoothing + correction + post-smooth(1)
            t2, diag1 = p, diag
            x1_1 = wins["d"]
            b0 = wins["b"]
            dinv1w = one / diag1                     # one reciprocal, reused
            wt = apply_a(
                t2, win(diag1, 1, 1) * win(t2, 2, 1), 1, i,
                legs=(fcx, fcy, fcz),
            )
            x2_1 = mask_dom(
                x1_1 + win(t2, 2, 1) - gw * (dinv1w * wt), 1, i
            )
            w1 = apply_a(x2_1, win(diag1, 1, 0) * win(x2_1, 1, 0), 0, i)
            x3 = mask_dom(
                win(x2_1, 1, 0)
                + g * (win(dinv1w, 1, 0) * (b0 - w1)), 0, i
            )
            if mode == "ascent1_rz":
                # fused <b, out> (CG's <r, z>: this kernel's output IS z)
                acc[0:1, :] = acc[0:1, :] + jnp.sum(
                    mask_dom(b0, 0, i) * x3, axis=0, keepdims=True
                )
            return (x3,)
        if mode in ("ascent", "ascent_rz"):
            t3, diag2 = p, diag
            x1_2 = wins["d"]
            b1 = wins["b"]
            dinv2 = one / diag2
            wt = apply_a(
                t3, win(diag2, 2, 2) * win(t3, 3, 2), 2, i,
                legs=(fcx, fcy, fcz),
            )
            x2_2 = mask_dom(
                x1_2 + win(t3, 3, 2) - gw * (dinv2 * wt), 2, i
            )                                        # prolong-smooth + add
            w1 = apply_a(x2_2, win(diag2, 2, 1) * win(x2_2, 2, 1), 1, i)
            d1 = mask_dom(
                g * (win(dinv2, 2, 1) * (b1 - w1)), 1, i
            )                                        # post-smooth 1
            x3_1 = mask_dom(win(x2_2, 2, 1) + d1, 1, i)
            w2 = apply_a(x3_1, win(diag2, 2, 0) * win(x3_1, 1, 0), 0, i)
            dnew = ad * win(d1, 1, 0) + g2 * (
                win(dinv2, 2, 0) * (win(b1, 1, 0) - w2)
            )                                        # post-smooth 2
            x4 = mask_dom(win(x3_1, 1, 0) + dnew, 0, i)
            if mode == "ascent_rz":
                acc[0:1, :] = acc[0:1, :] + jnp.sum(
                    mask_dom(win(b1, 1, 0), 0, i) * x4,
                    axis=0, keepdims=True,
                )
            return (x4,)
        raise AssertionError(mode)

    # zero the output face planes (padded-layout invariant) + dot accumulator
    zp_buf[:] = jnp.zeros_like(zp_buf)
    if mode in _DOT_OUT:
        acc[:] = jnp.zeros_like(acc)
    for hbm in y_hbms:
        lo = pltpu.make_async_copy(
            zp_buf, hbm.at[pl.ds(0, FACE * nyp)], sz
        )
        lo.start()
        lo.wait()
        hi = pltpu.make_async_copy(
            zp_buf, hbm.at[pl.ds(i32((nz + FACE) * nyp), FACE * nyp)], sz
        )
        hi.start()
        hi.wait()

    def run(i, buf, prefetch, pbuf, wait_wb):
        """Process slab i in buffer ``buf`` while ``prefetch`` loads; when
        ``wait_wb`` the previous writeback from this buffer (slab i-2) is
        drained before the staging buffer is overwritten."""
        start_in(prefetch, pbuf)
        wait_in(i, buf)
        if wait_wb:
            for out in range(n_out):
                wb_copy(i - i32(2), buf, out).wait()
        vals = compute(i, buf)
        for out in range(n_out):
            ys[jnp.int32(out * 2 + buf)] = vals[out]
            wb_copy(i, buf, out).start()

    # prime the tails with slab 0's low-halo planes (one-time DMAs,
    # overlapped with slab 0's new-part loads below)
    for idx, (name, hbm, _buf, _sem, tail_ref) in enumerate(slots):
        if name in halos and halos[name] > 0:
            tail_dma(idx, name, hbm, tail_ref).start()

    # peel the first pair: its buffers have no writeback to wait on
    start_in(i32(0), 0)
    for idx, (name, hbm, _buf, _sem, tail_ref) in enumerate(slots):
        if name in halos and halos[name] > 0:
            tail_dma(idx, name, hbm, tail_ref).wait()
    run(i32(0), 0, jax.lax.rem(i32(1), i32(grid)), 1, False)
    if grid > 1:
        run(i32(1), 1, jax.lax.rem(i32(2), i32(grid)), 0, False)

    def pair(j, carry):
        first = j * i32(2)
        run(first, 0, jax.lax.rem(first + 1, i32(grid)), 1, True)
        run(first + 1, 1, jax.lax.rem(first + 2, i32(grid)), 0, True)
        return carry

    n_pairs = grid // 2
    if n_pairs > 1:
        jax.lax.fori_loop(i32(1), i32(n_pairs), pair, i32(0), unroll=False)
    if grid % 2 and grid > 1:
        # odd tail: slab grid-1 was prefetched into buffer 0 by the last run
        last = i32(grid - 1)
        wait_in(last, 0)
        if grid > 2:
            for out in range(n_out):
                wb_copy(last - i32(2), 0, out).wait()
        vals = compute(last, 0)
        for out in range(n_out):
            ys[jnp.int32(out * 2 + 0)] = vals[out]
            wb_copy(last, 0, out).start()
    else:
        # even grid: the wrapped prefetch (slab 0) is in flight; drain it
        wait_in(i32(0), 0)

    # drain the final writebacks
    for out in range(n_out):
        wb_copy(i32(grid - 1), (grid - 1) % 2, out).wait()
        if grid > 1:
            wb_copy(i32(grid - 2), (grid - 2) % 2, out).wait()

    if mode in _DOT_OUT:
        # ship the accumulated partial dot sums via the small last output
        dot_wb = pltpu.make_async_copy(acc, dot_hbm, sz)
        dot_wb.start()
        dot_wb.wait()


def _coef_smem(vals, dtype):
    """(12, 1) SMEM scalar block: cx, cy, cz, g, ad, s0, gw, g2, fcx, fcy,
    fcz, pad."""
    return jnp.stack(
        [jnp.asarray(c, dtype).reshape(()) for c in vals]
    ).reshape(12, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "shape", "pinned", "interpret", "tz_override", "nzg"
    ),
)
def fused7_call(
    mode: str,
    diag_p, cx, cy, cz,
    x_p,
    b_p,
    d_p,
    g, ad, s0,
    shape: tuple[int, int, int],
    pinned: bool,
    interpret: bool = False,
    gw=0.0,
    g2=0.0,
    tz_override: int | None = None,
    z0=0,
    nzg: int | None = None,
    flegs=None,
):
    """Invoke one fused kernel.  All fields in the padded layout
    (``padded_shape(shape)``); pass ``x_p`` for unused operands (they are
    never read).  Scalars may be traced.  Returns one padded field, or a
    tuple of two for the two-output modes.

    Operand meaning per mode: ``x_p`` is the primary stencil input (x; r for
    'restrict'; t for 'prolong'/'ascent'; ignored for 'pre2'/'descent' whose
    primary is ``b_p``); ``d_p`` is the Chebyshev d for 'cheb' and x1 for
    'ascent'.

    Sharded operation (``dist/fused_sharded.py``): ``z0`` (traced i32) is
    the GLOBAL index of this block's first domain plane and ``nzg``
    (static) the global z extent; the block's z-face halo planes must then
    hold refreshed neighbor values.  Defaults (0, shape[0]) reproduce the
    single-device semantics exactly.
    """
    if mode not in MODES:
        raise ValueError(f"unknown mode {mode!r}")
    nz, ny, nx = shape
    nzp2, nyp, nxp = diag_p.shape
    tz = tz_override or _pick_tz_mode(nz, ny, nx, mode)
    if tz == 0:
        raise ValueError(f"unsupported nz={nz} for the fused star7 kernel")
    if (nzp2, nyp, nxp) != padded_shape(shape):
        raise ValueError(
            f"fields {diag_p.shape} != padded_shape({shape})="
            f"{padded_shape(shape)}"
        )
    f32 = jnp.float32
    # filtered-operator legs for the P-smoothing passes
    # (-pc_gamg_threshold semicoarsening; transfer.fop) — default: the
    # full stencil, i.e. no filtering
    fcx, fcy, fcz = flegs if flegs is not None else (cx, cy, cz)
    coef = _coef_smem(
        (cx, cy, cz, g, ad, s0, gw, g2, fcx, fcy, fcz, 0.0), f32
    )
    nzg = nz if nzg is None else int(nzg)
    zinfo = jnp.asarray(z0, jnp.int32).reshape(1, 1)
    halos = _WINDOWS[mode]
    primary = (
        b_p
        if mode in ("pre2", "descent", "descent1", "descent_rr",
                    "descent1_rr")
        else x_p
    )
    p2 = primary.reshape(nzp2 * nyp, nxp)
    d2 = diag_p.reshape(nzp2 * nyp, nxp)
    b2 = (b_p if "b" in halos else primary).reshape(nzp2 * nyp, nxp)
    dd2 = (d_p if "d" in halos else primary).reshape(nzp2 * nyp, nxp)

    rows = tz * nyp
    n_out = _n_out(mode)

    def buf(name):
        if name not in halos and name != "p":
            # unused operand slot: minimal placeholder, never DMA'd
            return pltpu.VMEM((1, 8, nxp), f32)
        # NEW-part double buffer only; the 2h halo overlap rides in the tail
        return pltpu.VMEM((2, rows, nxp), f32)

    def tail(name):
        h = halos.get(name, 0)
        if h == 0:
            return pltpu.VMEM((8, nxp), f32)  # placeholder, never touched
        return pltpu.VMEM((2 * h * nyp, nxp), f32)

    kernel = functools.partial(
        _kernel, mode=mode, tz=tz, nz=nz, ny=ny, nx=nx, nyp=nyp,
        pinned=pinned, nzg=nzg,
    )
    outs = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((12, 1), memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # z0 (global z)
            pl.BlockSpec(memory_space=pl.ANY),      # primary (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # diag (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # b (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # d (HBM)
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (n_out + 1),
        out_shape=(
            [jax.ShapeDtypeStruct((nzp2 * nyp, nxp), f32)] * n_out
            + [jax.ShapeDtypeStruct((8, nxp), f32)]  # fused-dot partials
        ),
        scratch_shapes=[
            buf("p"), buf("diag"), buf("b"), buf("d"),
            pltpu.VMEM((2 * n_out, rows, nxp), f32),     # out staging
            pltpu.VMEM((FACE * nyp, nxp), f32),          # zero faces
            pltpu.VMEM((8, nxp), f32),                   # dot accumulator
            tail("p"), tail("diag"), tail("b"), tail("d"),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2 * n_out,)),       # writebacks
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((4,)),               # tail primes
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * nz * ny * nx,
            bytes_accessed=(3 + n_out) * nz * ny * nx * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coef, zinfo, p2, d2, b2, dd2)
    fields = [outs[i].reshape(nzp2, nyp, nxp) for i in range(n_out)]
    dot = jnp.sum(outs[n_out]) if mode in _DOT_OUT else None
    if mode in ("mvdot", "ascent_rz", "ascent1_rz"):
        return fields[0], dot
    if mode in ("descent_rr", "descent1_rr"):
        return fields[0], fields[1], dot
    if mode in ("cgmv", "descentu"):
        return (*fields, dot)
    if n_out == 2:
        return fields[0], fields[1]
    return fields[0]


# ---------------------------------------------------------------------------
# XLA reference implementations (same formulations, same padded layout).
# These pin down kernel semantics in tests and serve as the CPU fallback.
# ---------------------------------------------------------------------------

def fused7_xla(mode, op, x_p, b_p, d_p, g, ad, s0, gw=0.0, g2=0.0,
               fop=None):
    """Reference/fallback math for each mode on a PaddedStar ``op``.

    ``fop``: the threshold-filtered P-smoothing operator (same diag,
    weak-axis legs zeroed) — used ONLY where the transfer smooths with it
    (the gw passes); defaults to ``op``."""
    one = jnp.ones((), jnp.float32)
    dinv = one / op.diag
    sm = fop if fop is not None else op  # P-smoothing operator
    if mode == "mv":
        return op.mv(x_p)
    if mode == "mvdot":
        y = op.mv(x_p)
        return y, jnp.vdot(x_p.reshape(-1), y.reshape(-1))
    if mode == "cgmv":
        # x_p = z, b_p = p_old, d_p = x; g = beta, ad = alpha_prev
        pn = x_p + g * b_p
        w = op.mv(pn)
        xn = d_p + ad * b_p
        return w, pn, xn, jnp.vdot(pn.reshape(-1), w.reshape(-1))
    if mode == "descentu":
        # x_p = r_old, b_p = ap; g2 = alpha; then descent math on r'
        r = x_p - g2 * b_p
        u = (s0 * r) * dinv
        x1 = u + ad * u + g * (dinv * (r - op.mv(u)))
        rr1 = r - op.mv(x1)
        s = rr1 - gw * sm.mv(dinv * rr1)
        return x1, s, r, jnp.vdot(r.reshape(-1), r.reshape(-1))
    if mode == "residual":
        return b_p - op.mv(x_p)
    if mode == "rich":
        return x_p + g * (dinv * (b_p - op.mv(x_p)))
    if mode == "cheb0":
        d = g * (dinv * (b_p - op.mv(x_p)))
        return x_p + d, d
    if mode == "cheb":
        d = ad * d_p + g * (dinv * (b_p - op.mv(x_p)))
        return x_p + d, d
    if mode == "pre2":
        u = (s0 * b_p) * dinv
        d = ad * u + g * (dinv * (b_p - op.mv(u)))
        return u + d, d
    if mode == "restrict":
        return x_p - g * sm.mv(dinv * x_p)
    if mode == "prolong":
        return x_p - g * (dinv * sm.mv(x_p))
    if mode in ("descent", "descent_rr"):
        u = (s0 * b_p) * dinv
        x1 = u + ad * u + g * (dinv * (b_p - op.mv(u)))
        r = b_p - op.mv(x1)
        s = r - gw * sm.mv(dinv * r)
        if mode == "descent_rr":
            return x1, s, jnp.vdot(b_p.reshape(-1), b_p.reshape(-1))
        return x1, s
    if mode in ("descent1", "descent1_rr"):
        x1 = g * (dinv * b_p)
        r = b_p - op.mv(x1)
        s = r - gw * sm.mv(dinv * r)
        if mode == "descent1_rr":
            return x1, s, jnp.vdot(b_p.reshape(-1), b_p.reshape(-1))
        return x1, s
    if mode in ("ascent1", "ascent1_rz"):
        t, x1 = x_p, d_p
        x2 = x1 + t - gw * (dinv * sm.mv(t))
        x3 = x2 + g * (dinv * (b_p - op.mv(x2)))
        if mode == "ascent1_rz":
            return x3, jnp.vdot(b_p.reshape(-1), x3.reshape(-1))
        return x3
    if mode in ("ascent", "ascent_rz"):
        t, x1 = x_p, d_p
        x2 = x1 + t - gw * (dinv * sm.mv(t))
        d = g * (dinv * (b_p - op.mv(x2)))
        x3 = x2 + d
        x4 = x3 + ad * d + g2 * (dinv * (b_p - op.mv(x3)))
        if mode == "ascent_rz":
            return x4, jnp.vdot(b_p.reshape(-1), x4.reshape(-1))
        return x4
    raise ValueError(f"unknown mode {mode!r}")
