"""End-to-end slice: 2x2 Hubbard plaquette, no bath (BASELINE config 1).

Mirrors the reference's first correctness milestone (README.md:28: "ED
checked against known plaquette data without bath").  Oracle: independent
dense Hamiltonian from tests/oracle.py + analytic U=0 limit.
"""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig, EDSolver
from cdmft_lanc_ed_tpu.utils import fock

import oracle


def plaquette_hloc(t=1.0, nspin=1):
    """2x2 plaquette: sites 0,1,2,3 with bonds (01)(02)(13)(23)."""
    h = np.zeros((4, 4, nspin, nspin, 1, 1), dtype=np.complex128)
    for (i, j) in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        for s in range(nspin):
            h[i, j, s, s, 0, 0] = -t
            h[j, i, s, s, 0, 0] = -t
    return h


def make_cfg(**kw):
    base = dict(nlat=4, norb=1, nspin=1, nbath=0, uloc=[4.0], xmu=0.0,
                beta=1000.0, lmats=64, lreal=64, lanc_ngfiter=64,
                ed_verbose=0, gf_flag=True, hfmode=True)
    base.update(kw)
    return EDConfig(**base)


def solve(cfg, hloc):
    s = EDSolver(cfg)
    s.init_solver()
    s.solve(np.zeros(0), hloc)
    return s


def test_plaquette_u0_gs_energy(tmp_path):
    """U=0: GS energy = 2 * sum of two lowest one-body levels = -4t."""
    cfg = make_cfg(uloc=[0.0], gf_flag=False, work_dir=str(tmp_path))
    s = solve(cfg, plaquette_hloc())
    assert s.egs == pytest.approx(-4.0, abs=1e-9)


def test_plaquette_u4_vs_dense_oracle(tmp_path):
    """U=4 half filling: full sector sweep GS vs brute-force dense ED."""
    cfg = make_cfg(work_dir=str(tmp_path))
    hloc = plaquette_hloc()
    s = solve(cfg, hloc)

    # oracle: dense H in the (2,2) sector (the GS sector at half filling)
    hrec = np.zeros((0, 4, 4, 1, 1, 1, 1), np.complex128)
    dhyb = np.zeros((4, 1, 1, 0))
    h22 = oracle.build_dense_oracle(cfg, hloc, hrec, dhyb, 2, 2)
    e_oracle = np.linalg.eigvalsh(h22)[0]
    assert s.egs == pytest.approx(e_oracle, abs=1e-8)
    # GS must live in the half-filled sector
    isec = s.diag_state.state_list[0].isector
    nup, ndw = fock.get_quantum_numbers(isec, cfg.ns)
    assert (nup, ndw) == (2, 2)

    # observables: half filling by PH symmetry
    assert s.dens().sum() == pytest.approx(4.0, abs=1e-8)
    np.testing.assert_allclose(s.dens(), 1.0, atol=1e-8)

    # energy consistency: <H> = Egs (no bath => Eknot+Epot = Egs)
    etot = s.energy.eknot + s.energy.epot
    assert etot == pytest.approx(s.egs, abs=1e-7)


def test_plaquette_gf_sumrule_and_sigma(tmp_path):
    """Diagonal GF pole weights sum to <{c,c+}> = 1; U=0 => Sigma = 0."""
    cfg = make_cfg(work_dir=str(tmp_path))
    s = solve(cfg, plaquette_hloc())
    spec = s.gf.spectrum
    for il in range(4):
        p, w = spec.flat((il, il, 0, 0, 0))
        assert w.real.sum() == pytest.approx(1.0, abs=1e-8)
        assert abs(w.imag.sum()) < 1e-10
    # high-frequency tail: G(z) ~ 1/z for |z| >> W
    g_hi = spec.evaluate((0, 0, 0, 0, 0), np.array([200j]))[0]
    assert g_hi.imag == pytest.approx(-1.0 / 200.0, rel=1e-3)

    # U=0 noninteracting: Sigma vanishes identically
    cfg0 = make_cfg(uloc=[0.0], hfmode=False, work_dir=str(tmp_path))
    s0 = solve(cfg0, plaquette_hloc())
    assert np.abs(s0.gf.smats).max() < 1e-7


def test_plaquette_offdiagonal_gf_hermiticity(tmp_path):
    """G_ij(iw) from the 4-channel recombination must satisfy
    G_ij(iw) = G_ji(iw) for a real-symmetric H (spin-diagonal, real basis)."""
    cfg = make_cfg(work_dir=str(tmp_path))
    s = solve(cfg, plaquette_hloc())
    g = s.gf.gmats
    np.testing.assert_allclose(g[0, 1, 0, 0, 0, 0], g[1, 0, 0, 0, 0, 0],
                               atol=1e-8)


def test_cluster_density_matrix_plaquette(tmp_path):
    """rho_IMP with no bath: pure state projector; trace 1; consistency
    of diagonal with densities."""
    cfg = make_cfg(dm_flag=True, gf_flag=False, work_dir=str(tmp_path))
    s = solve(cfg, plaquette_hloc())
    rho = s.cluster_dm()
    assert rho.shape == (256, 256)
    assert np.trace(rho).real == pytest.approx(1.0, abs=1e-10)
    # hermiticity
    np.testing.assert_allclose(rho, rho.conj().T, atol=1e-12)
    # <n_0up> from rho diagonal == dens_up
    # imp composite index io = Iup + 16*Idw; n_0up = bit0 of Iup
    diag = np.real(np.diag(rho))
    n0 = sum(diag[io] for io in range(256) if (io % 16) & 1)
    assert n0 == pytest.approx(s.obs.dens_up[0, 0], abs=1e-9)


def test_gf_symmetric_mode_agrees(tmp_path):
    """ed_gf_symmetric=True (2-channel mixing) must reproduce the default
    4-channel GF for a real-symmetric Hamiltonian."""
    cfg4 = make_cfg(work_dir=str(tmp_path))
    s4 = solve(cfg4, plaquette_hloc())
    cfg2 = make_cfg(ed_gf_symmetric=True, work_dir=str(tmp_path))
    s2 = solve(cfg2, plaquette_hloc())
    np.testing.assert_allclose(s2.gf.gmats, s4.gf.gmats, atol=1e-7)
    np.testing.assert_allclose(s2.gf.smats, s4.gf.smats, atol=1e-5)


def test_gtau_consistency(tmp_path):
    """G(tau) from the Lehmann poles: boundary sum rule
    G(0+) + G(beta-) = -<{c, c+}> = -1 and density consistency
    n = -G(tau -> beta-)."""
    cfg = make_cfg(beta=20.0, work_dir=str(tmp_path))
    s = solve(cfg, plaquette_hloc())
    spec = s.gf.spectrum
    g0 = spec.evaluate_tau((0, 0, 0, 0, 0), np.array([1e-12]), 20.0)[0]
    gb = spec.evaluate_tau((0, 0, 0, 0, 0), np.array([20.0 - 1e-12]),
                           20.0)[0]
    assert g0 + gb == pytest.approx(-1.0, abs=1e-8)
    assert -gb == pytest.approx(s.obs.dens_up[0, 0], abs=1e-6)


def test_lanc_method_lanczos(tmp_path):
    """lanc_method='lanczos' (plain GS Lanczos, T=0) reproduces the GS."""
    cfg = make_cfg(lanc_method="lanczos", gf_flag=False,
                   lanc_dim_threshold=8, work_dir=str(tmp_path))
    s = solve(cfg, plaquette_hloc())
    assert s.egs == pytest.approx(-6.102748483462073, abs=1e-7)
