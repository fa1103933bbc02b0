"""Input-file parsing: reference NAME=value format quirks."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig, read_input


def test_reference_format_parsing(tmp_path):
    p = tmp_path / "inputED.conf"
    p.write_text(
        "NLAT=4                 !number of cluster sites\n"
        "NORB=1\n"
        "NBATH=3\n"
        "ULOC=2.5d0,0.d0,0d0,0d0,0d0   !local interaction\n"
        "BETA=1.d2\n"
        "XMU=0.5\n"
        "ED_TWIN=T\n"
        "GF_FLAG=F\n"
        "CG_SCHEME=delta\n"
        "LANC_TOLERANCE=1.d-12\n"
        "# a comment line\n"
        "UNKNOWN_DRIVER_VAR=42    !drivers share the file\n")
    cfg = read_input(str(p), work_dir=str(tmp_path))
    assert cfg.nlat == 4 and cfg.nbath == 3
    assert cfg.uloc[0] == pytest.approx(2.5)
    assert cfg.beta == pytest.approx(100.0)
    assert cfg.xmu == pytest.approx(0.5)
    assert cfg.ed_twin is True and cfg.gf_flag is False
    assert cfg.cg_scheme == "delta"
    assert cfg.lanc_tolerance == pytest.approx(1e-12)
    # used.* file written (reference saves used input)
    assert (tmp_path / "used.inputED.conf").exists()


def test_keyword_overrides_win(tmp_path):
    p = tmp_path / "in.conf"
    p.write_text("NBATH=5\nBETA=10\n")
    cfg = read_input(str(p), nbath=2, work_dir=str(tmp_path))
    assert cfg.nbath == 2
    assert cfg.beta == 10.0


def test_xmu_restart(tmp_path):
    (tmp_path / "xmu.restart").write_text("0.7345 0.05\n")
    p = tmp_path / "in.conf"
    p.write_text("NREAD=1.0\n")
    cfg = read_input(str(p), work_dir=str(tmp_path))
    assert cfg.xmu == pytest.approx(0.7345)
    assert cfg.ndelta == pytest.approx(0.05 * cfg.ncoeff)


def test_validate_rejects_bad_values():
    with pytest.raises(ValueError):
        EDConfig(norb=6).validate()
    with pytest.raises(ValueError):
        EDConfig(bath_type="nonsense").validate()
    with pytest.raises(ValueError):
        EDConfig(lanc_method="lanczos", lanc_nstates_total=4).validate()
