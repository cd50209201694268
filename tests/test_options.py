"""Options parsing tests — the reference's own config file must load."""

import shutil
from pathlib import Path

import pytest

from tpusparse.config import load_options, parse_options_file

REF_CONFIG = Path(__file__).parent / "data" / "SolverOptions_GAMG.info"


def test_reference_config_parses(tmp_path):
    opts = load_options(["-config", str(REF_CONFIG)])
    assert opts.ksp_type == "cg"
    assert opts.ksp_atol == 1e-12
    assert opts.ksp_rtol == 1e-14
    assert opts.ksp_max_it == 10000
    assert opts.pc_type == "gamg"
    assert opts.pc_gamg_agg_nsmooths == 1
    assert opts.pc_gamg_threshold == 0.0
    assert opts.mg_levels_ksp_type == "richardson"


def test_cli_overrides_file():
    opts = load_options(
        ["-config", str(REF_CONFIG), "-ksp_rtol", "1e-8", "-da_grid_x", "300"]
    )
    assert opts.ksp_rtol == 1e-8
    assert opts.da_grid_x == 300
    assert opts.da_grid_y == 100  # untouched default (main_ksp.cpp:33-35)


def test_unknown_option_rejected():
    with pytest.raises(ValueError, match="unknown options"):
        load_options(["-no_such_thing", "1"])


def test_unsupported_value_rejected():
    with pytest.raises(ValueError, match="ksp_type"):
        load_options(["-ksp_type", "gmres"])


def test_comments_and_blank_lines(tmp_path):
    p = tmp_path / "o.info"
    p.write_text("# comment\n\n-ksp_rtol 1e-9  # trailing\n-pc_type none\n")
    d = parse_options_file(p)
    assert d == {"ksp_rtol": "1e-9", "pc_type": "none"}
