"""Machine-check the weak-scaling comm model's VOLUME terms against the
collectives GSPMD actually emits (round-3 verdict item 4).

Compiles the sharded fine mv, the V-cycle, and the full inner CG body on
the 8-device virtual mesh and asserts the per-iteration collective bytes
match ``bench/scaling.comm_model``'s halo/seam formulas.  After this, only
the model's bandwidth/latency constants remain assumptions."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.utils.hlostats import collective_summary, compiled_collectives

NX, NY, NZ = 16, 16, 24  # 8-device mesh -> (pz, py) = (4, 2)


def _sharded_system():
    from tpusparse.amg import AMGParams, gamg_setup, vcycle  # noqa: F401
    from tpusparse.dist import (
        field_sharding,
        make_mesh,
        shard_hierarchy,
        shard_system,
    )
    from tpusparse.dist.mesh import _put
    from tpusparse.grid.grid3d import Grid3D
    from tpusparse.grid.poisson import poisson_stencil

    grid = Grid3D(NX, NY, NZ)
    op, b, exact = poisson_stencil(grid, dtype=np.float32)
    hier = gamg_setup(op, AMGParams(coarse_eq_limit=30))
    mesh = make_mesh(8)
    op_s, b_s, _ = shard_system(op, b, exact, mesh)
    hier_s = shard_hierarchy(hier, mesh)
    return mesh, op_s, hier_s, b_s


def _model_terms(mesh, c_shape):
    """The comm model's per-apply halo and per-cycle seam bytes for this
    grid/mesh — same formulas as bench/scaling.comm_model."""
    pz, py = mesh.devices.shape
    itemsize = 4
    plane_z = (NY // py) * NX * itemsize
    plane_y = (NZ // pz) * NX * itemsize
    halo_per_apply = (2 if pz > 1 else 0) * plane_z + (
        2 if py > 1 else 0
    ) * plane_y
    # seam-local transfer (dist/seam.py): one psum of the coarse field
    coarse_payload = int(np.prod(c_shape)) * itemsize
    return halo_per_apply, coarse_payload


def test_fine_mv_halo_bytes_match_model():
    mesh, op_s, hier_s, b_s = _sharded_system()
    halo_model, _ = _model_terms(mesh, hier_s.levels[0].transfer.c_shape)
    s = compiled_collectives(lambda o, x: o.mv(x), op_s, b_s)
    got = s.get("collective-permute", {"bytes": 0})["bytes"]
    # GSPMD emits exactly the boundary planes; equality, not tolerance
    assert got == halo_model, (s, halo_model)


def test_vcycle_collectives_match_model():
    from tpusparse.amg import vcycle

    mesh, _op, hier_s, b_s = _sharded_system()
    halo_model, seam_payload = _model_terms(
        mesh, hier_s.levels[0].transfer.c_shape
    )
    s = compiled_collectives(lambda h, r: vcycle(h, r), hier_s, b_s)
    cp = s.get("collective-permute", {"bytes": 0, "count": 0})
    # the model charges 6 fine applies per V-cycle (fine_applies_per_iter
    # = 7 includes CG's own mv); each apply is one halo volume
    assert cp["bytes"] == 6 * halo_model, (s, halo_model)
    # fine/coarse seam in the seam-local form (dist/seam.py): exactly ONE
    # all-reduce, of exactly the coarse field, and no all-gather — this is
    # the n/27 form; round 4's GSPMD default moved ~n/3 here (all-reduce
    # of the z-coarsened partial slab + all-gather, measured by this test)
    ar = s.get("all-reduce", {"bytes": 0, "count": 0})
    assert ar["count"] == 1, s
    assert ar["bytes"] == seam_payload, (s, seam_payload)
    assert "all-gather" not in s, s


def test_cg_iteration_psum_count():
    """The model prices 3 scalar reductions per CG iteration; the compiled
    while-loop body must contain exactly the scalar all-reduces the model
    charges (dots + norm), plus the coarse-seam collectives."""
    from tpusparse.amg import vcycle
    from tpusparse.solve import cg

    mesh, op_s, hier_s, b_s = _sharded_system()

    def solve(op, hier, b):
        return cg(
            op.mv, b, rtol=1e-6, maxiter=10,
            m_mv=lambda r: vcycle(hier, r),
        ).x

    compiled = jax.jit(solve).lower(op_s, hier_s, b_s).compile()
    txt = compiled.as_text()
    if isinstance(txt, (list, tuple)):
        txt = "\n".join(txt)
    s = collective_summary(txt)
    # scalar all-reduces: each is 4 bytes of payload
    from tpusparse.utils.hlostats import collective_ops

    scalar_ars = [
        r for r in collective_ops(txt)
        if r["op"] == "all-reduce" and r["bytes"] <= 16
    ]
    # the model prices 3 reduction rounds/iter as an upper bound; the
    # compiled loop body actually BATCHES the CG dots (the one-psum-dots
    # design) into <= 2 small all-reduces, plus setup-time norms outside
    # the loop — so the latency charge is conservative, never optimistic
    assert 1 <= len(scalar_ars) <= 6, (len(scalar_ars), s)


def test_weak_record_carries_hlo_validation():
    """comm_model volume terms vs HLO, shaped for the scaling record."""
    from tpusparse.bench.scaling import hlo_validate

    rec = hlo_validate(per_device=8, n_devices=8)
    assert rec["halo_bytes_per_apply"]["hlo"] == (
        rec["halo_bytes_per_apply"]["model"]
    )
    assert rec["match"] is True


def test_async_start_forms_counted_once():
    """TPU post-scheduling HLO emits async `X-start`/`X-done` pairs; the
    parser must (a) see them at all and (b) count the result member only
    — not operand+result — and skip the `-done` repeat."""
    txt = "\n".join([
        "  %ar = f32[256]{0} all-reduce-start(f32[256]{0} %p), to_apply=%add",
        "  %ard = f32[256]{0} all-reduce-done(f32[256]{0} %ar)",
        "  %cp = (f32[128,8]{1,0}, f32[128,8]{1,0}, u32[], u32[])"
        " collective-permute-start(f32[128,8]{1,0} %x),"
        " source_target_pairs={{0,1}}",
        "  %cpd = f32[128,8]{1,0} collective-permute-done(%cp)",
        "  %ag = (f32[64]{0}, f32[512]{0}) all-gather-start(f32[64]{0} %y),"
        " dimensions={0}",
        "  %agd = f32[512]{0} all-gather-done(%ag)",
    ])
    s = collective_summary(txt)
    assert s["all-reduce"] == {"count": 1, "bytes": 256 * 4}
    assert s["collective-permute"] == {"count": 1, "bytes": 128 * 8 * 4}
    assert s["all-gather"] == {"count": 1, "bytes": 512 * 4}
