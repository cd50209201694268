"""PETSc binary viewer I/O (MatLoad/VecLoad parity, sparse/io.py) and the
ex10-style ``-f <file>`` driver path."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.sparse.csr import HostCSR
from tpusparse.sparse.io import (
    MAT_FILE_CLASSID,
    VEC_FILE_CLASSID,
    load_matrix,
    load_petsc_mat,
    load_petsc_vec,
    read_petsc_objects,
    save_petsc_mat,
    save_petsc_vec,
)


def _random_csr(m, n, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    a = sp.random(m, n, density=density, random_state=rng, format="csr")
    a.data = rng.standard_normal(a.nnz)
    return a


def test_mat_roundtrip_exact(tmp_path):
    a = _random_csr(37, 23)
    path = str(tmp_path / "a.petsc")
    save_petsc_mat(path, a)
    back = load_petsc_mat(path)
    ref = HostCSR.from_scipy(a)
    np.testing.assert_array_equal(back.indptr, ref.indptr)
    np.testing.assert_array_equal(back.indices, ref.indices)
    np.testing.assert_array_equal(back.data, ref.data)  # bit-exact f64
    assert back.shape == (37, 23)


def test_mat_roundtrip_empty_rows(tmp_path):
    # rows 0 and 2 empty; PETSc row-lengths encoding must carry them
    a = sp.csr_matrix(
        (np.array([5.0, -1.0]), (np.array([1, 3]), np.array([0, 2]))),
        shape=(4, 3),
    )
    path = str(tmp_path / "e.petsc")
    save_petsc_mat(path, a)
    back = load_petsc_mat(path)
    np.testing.assert_array_equal(back.indptr, [0, 0, 1, 1, 2])
    np.testing.assert_array_equal(back.indices, [0, 2])


def test_vec_roundtrip(tmp_path):
    v = np.linspace(-3.0, 7.0, 11)
    path = str(tmp_path / "v.petsc")
    save_petsc_vec(path, v)
    np.testing.assert_array_equal(load_petsc_vec(path), v)


def test_exact_byte_layout(tmp_path):
    """Pin the on-disk format against PETSc's documented layout: big-endian
    int32 [classid, M, N, nnz], row lengths, col indices, f64 values."""
    a = sp.csr_matrix(np.array([[2.0, 0.0], [-1.0, 3.0]]))
    path = str(tmp_path / "p.petsc")
    save_petsc_mat(path, a)
    raw = open(path, "rb").read()
    ints = np.frombuffer(raw[: 4 * 8], dtype=">i4")
    np.testing.assert_array_equal(
        ints, [MAT_FILE_CLASSID, 2, 2, 3, 1, 2, 0, 0]
    )
    vals = np.frombuffer(raw[4 * 8 + 4:], dtype=">f8")
    np.testing.assert_array_equal(vals, [2.0, -1.0, 3.0])

    vpath = str(tmp_path / "pv.petsc")
    save_petsc_vec(vpath, [1.5, -2.5])
    raw = open(vpath, "rb").read()
    np.testing.assert_array_equal(
        np.frombuffer(raw[:8], dtype=">i4"), [VEC_FILE_CLASSID, 2]
    )
    np.testing.assert_array_equal(
        np.frombuffer(raw[8:], dtype=">f8"), [1.5, -2.5]
    )


def test_appended_objects_and_load_matrix(tmp_path):
    """ex10's single-file convention: matrix then rhs, read in order."""
    a = _random_csr(12, 12, seed=3)
    rhs = np.arange(12, dtype=np.float64)
    path = str(tmp_path / "sys.petsc")
    save_petsc_mat(path, a)
    save_petsc_vec(path, rhs, append=True)
    objs = read_petsc_objects(path)
    assert isinstance(objs[0], HostCSR) and len(objs) == 2
    mat, b = load_matrix(path)
    np.testing.assert_array_equal(b, rhs)
    np.testing.assert_array_equal(mat.data, HostCSR.from_scipy(a).data)


def test_truncated_and_garbage_files(tmp_path):
    path = str(tmp_path / "t.petsc")
    a = _random_csr(8, 8, seed=1)
    save_petsc_mat(path, a)
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-4])  # drop half a value
    with pytest.raises(ValueError, match="truncated"):
        load_petsc_mat(path)
    open(path, "wb").write(b"\x00\x01\x02\x03" * 4)
    with pytest.raises(ValueError, match="classid"):
        read_petsc_objects(path)


def test_matrixmarket(tmp_path):
    import scipy.io as sio

    a = _random_csr(9, 9, seed=2)
    path = str(tmp_path / "m.mtx")
    sio.mmwrite(path, a)
    mat, rhs = load_matrix(path)
    assert rhs is None
    np.testing.assert_allclose(
        mat.to_scipy().toarray() if hasattr(mat, "to_scipy")
        else sp.csr_matrix(
            (mat.data, mat.indices, mat.indptr), shape=mat.shape
        ).toarray(),
        a.toarray(),
    )


def _poisson2d(n):
    """SPD 2-D Poisson test matrix (scipy-assembled, independent of the
    package's own assembler)."""
    main = 4.0 * np.ones(n * n)
    side = -np.ones(n * n - 1)
    side[np.arange(1, n * n) % n == 0] = 0.0
    updown = -np.ones(n * n - n)
    a = sp.diags(
        [main, side, side, updown, updown], [0, -1, 1, -n, n], format="csr"
    )
    return a


def test_solve_from_file_vs_scipy(tmp_path):
    """End-to-end ex10: save A and b, solve via the file driver, compare to
    scipy's direct solve."""
    from tpusparse.bench.driver import solve_from_file

    n = 12
    a = _poisson2d(n)
    rng = np.random.default_rng(7)
    x_ref = rng.standard_normal(n * n)
    b = a @ x_ref
    path = str(tmp_path / "sys.petsc")
    save_petsc_mat(path, a)
    save_petsc_vec(path, b, append=True)
    save_petsc_vec(path, x_ref, append=True)  # exact soln => Linf gate

    rep = solve_from_file(
        path, rtol=1e-10, atol=1e-12, pc="jacobi", precision="f64",
    )
    assert rep.reason > 0
    assert rep.linf_error >= 0.0  # exact vector was found and used
    assert rep.linf_error < 1e-7 * np.abs(x_ref).max()
    assert rep.source == path
    assert "Matrix:" in rep.reference_block()
    assert "n/a" not in rep.reference_block()


def test_solve_from_file_gamg_defaults(tmp_path):
    """The production configuration (cg + gamg, mixed precision) over the
    general aij path, rhs defaulted to ones (no vector in the file)."""
    from tpusparse.bench.driver import solve_from_file

    a = _poisson2d(16)
    path = str(tmp_path / "a_only.petsc")
    save_petsc_mat(path, a)
    rep = solve_from_file(path, rtol=1e-8)
    assert rep.reason > 0
    assert rep.resnorm <= 1e-8 * np.linalg.norm(np.ones(a.shape[0])) * 1.01
    assert rep.linf_error < 0  # no exact solution in file
    assert "n/a" in rep.reference_block()


def test_mat_view_export_roundtrip(tmp_path, capsys):
    """-mat_view binary:<file> exports the assembled Poisson system; the
    file then solves via -f to the same answer the stencil path gives
    (MatView -> MatLoad round-trip, exact-solution Linf gate included)."""
    from tpusparse.__main__ import main

    path = str(tmp_path / "poisson14.petsc")
    rc = main([
        "-da_grid_x", "14", "-da_grid_y", "14", "-da_grid_z", "14",
        "-ksp_rtol", "1e-9", "-precision", "f64",
        "-mat_view", f"binary:{path}",
    ])
    out_stencil = capsys.readouterr().out
    assert rc == 0
    assert "written to" in out_stencil

    objs = read_petsc_objects(path)
    assert isinstance(objs[0], HostCSR) and len(objs) == 3
    assert objs[0].shape == (14**3, 14**3)

    rc = main(["-f", path, "-ksp_rtol", "1e-9", "-precision", "f64"])
    out_file = capsys.readouterr().out
    assert rc == 0
    import re

    linf_s = re.search(
        r"Maximum norm of error: ([0-9.e+-]+)", out_stencil
    ).group(1)
    linf_f = re.search(
        r"Maximum norm of error: ([0-9.e+-]+)", out_file
    ).group(1)
    # same system, same discretization error against the same exact vector
    assert abs(float(linf_s) - float(linf_f)) < 1e-6


def test_cli_f_flag(tmp_path, capsys):
    """python -m tpusparse -f file — ex10's CLI shape."""
    from tpusparse.__main__ import main

    a = _poisson2d(10)
    b = a @ np.ones(100)
    path = str(tmp_path / "cli.petsc")
    save_petsc_mat(path, a)
    save_petsc_vec(path, b, append=True)
    rc = main([
        "-f", path, "-ksp_rtol", "1e-9", "-pc_type", "jacobi",
        "-precision", "f64", "-ksp_converged_reason",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Linear solve converged" in out
    assert f"Matrix: {path}" in out
    assert "JSON:" in out


def test_solution_out_roundtrip(tmp_path):
    """-ksp_view_solution binary:<file>: the written solution reloads via
    VecLoad and solves the system (ex10 output side)."""
    from tpusparse.__main__ import main

    a = _poisson2d(10)
    x_ref = np.random.default_rng(5).standard_normal(100)
    b = a @ x_ref
    path = str(tmp_path / "s.petsc")
    save_petsc_mat(path, a)
    save_petsc_vec(path, b, append=True)
    out = str(tmp_path / "x.petsc")
    rc = main([
        "-f", path, "-ksp_rtol", "1e-11", "-pc_type", "jacobi",
        "-precision", "f64", "-ksp_view_solution", f"binary:{out}",
    ])
    assert rc == 0
    x = load_petsc_vec(out)
    np.testing.assert_allclose(x, x_ref, atol=1e-7)
