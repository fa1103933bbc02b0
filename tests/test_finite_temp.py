"""Finite-temperature and twin-sector paths vs exact thermal oracles."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig, EDSolver
from cdmft_lanc_ed_tpu.utils import fock

import oracle


def tiny_system(tmp_path, **kw):
    """1 site + 1 bath replica: Ns=2, full Fock dim 16 — exactly solvable."""
    base = dict(nlat=1, norb=1, nspin=1, nbath=1, uloc=[3.0], xmu=0.2,
                beta=5.0, lmats=32, lreal=16, lanc_ngfiter=32,
                lanc_nstates_total=64, lanc_nstates_sector=6,
                cutoff=1e-12, ed_verbose=0, work_dir=str(tmp_path))
    base.update(kw)
    cfg = EDConfig(**base)
    s = EDSolver(cfg)
    s.set_hbath(np.ones((1, 1, 1, 1, 1, 1, 1)), np.array([[0.4]]))
    bath = s.init_solver()
    hloc = np.zeros((1, 1, 1, 1, 1, 1))
    return s, bath, hloc


def full_spectrum(cfg, hloc, hrec, dhyb):
    """All eigenpairs of every sector + sector labels (dense oracle)."""
    ns = cfg.ns
    out = []
    for nup in range(ns + 1):
        for ndw in range(ns + 1):
            h = oracle.build_dense_oracle(cfg, hloc, hrec, dhyb, nup, ndw)
            w, v = np.linalg.eigh(h)
            out.append((nup, ndw, w, v))
    return out


def thermal_averages(cfg, spectrum):
    """Exact <n_up>, <n_dw>, <d> on the impurity level 0."""
    ns = cfg.ns
    e0 = min(w[0] for _, _, w, _ in spectrum)
    z = 0.0
    nup_avg = ndw_avg = d_avg = 0.0
    for nup, ndw, w, v in spectrum:
        ups, dws = oracle.sector_basis(ns, nup, ndw)
        n_up = np.array([(m >> 0) & 1 for m in ups], float)
        n_dw = np.array([(m >> 0) & 1 for m in dws], float)
        du = len(ups)
        for ie, ei in enumerate(w):
            boltz = np.exp(-cfg.beta * (ei - e0))
            z += boltz
            psi2 = np.abs(v[:, ie]) ** 2
            # flat index i = iup + idw*DimUp
            p2 = psi2.reshape(-1, du)         # [idw, iup]
            nu = (p2.sum(axis=0) * n_up).sum()
            nd = (p2.sum(axis=1) * n_dw).sum()
            dd = (n_dw[:, None] * p2 * n_up[None, :]).sum()
            nup_avg += boltz * nu
            ndw_avg += boltz * nd
            d_avg += boltz * dd
    return nup_avg / z, ndw_avg / z, d_avg / z, z, e0


def lehmann_gf(cfg, spectrum, z_freqs):
    """Exact finite-T impurity G_00(z) by the Lehmann representation."""
    ns = cfg.ns
    e0 = min(w[0] for _, _, w, _ in spectrum)
    zpart = sum(np.exp(-cfg.beta * (w - e0)).sum()
                for _, _, w, _ in spectrum)
    sec = {(nup, ndw): (w, v) for nup, ndw, w, v in spectrum}
    g = np.zeros(len(z_freqs), complex)
    for (nup, ndw), (w, v) in sec.items():
        if (nup + 1, ndw) not in sec:
            continue
        wj, vj = sec[(nup + 1, ndw)]
        # matrix elements <n| c^+_0up |m> over dense bases
        ups, dws = oracle.sector_basis(ns, nup, ndw)
        upsj, _ = oracle.sector_basis(ns, nup + 1, ndw)
        du, dd_ = len(ups), len(dws)
        duj = len(upsj)
        upj_index = {m: i for i, m in enumerate(upsj)}
        op = np.zeros((duj * dd_, du * dd_))
        for iu, m in enumerate(ups):
            res = oracle.apply_cdg(m, 0)
            if res is None:
                continue
            m2, sg = res
            ju = upj_index[m2]
            for idw in range(dd_):
                op[ju + idw * duj, iu + idw * du] = sg
        m_elem = vj.conj().T @ op @ v        # [nj, nm]
        wm_b = np.exp(-cfg.beta * (w - e0))
        wj_b = np.exp(-cfg.beta * (wj - e0))
        for jn in range(len(wj)):
            for im in range(len(w)):
                amp = np.abs(m_elem[jn, im]) ** 2 * (wm_b[im] + wj_b[jn])
                if amp < 1e-16:
                    continue
                de = wj[jn] - w[im]
                g += amp / (z_freqs - de)
    return g / zpart


def test_finite_temperature_observables(tmp_path):
    s, bath, hloc = tiny_system(tmp_path, gf_flag=False)
    s.solve(bath, hloc)
    from cdmft_lanc_ed_tpu import bath as bm
    hrec = bm.bath_h_rec(s.cfg, s.hb, s.bath)
    dhyb = bm.diag_hybr_of(s.cfg, s.bath)
    spectrum = full_spectrum(s.cfg, hloc, hrec, dhyb)
    nu, nd, d, z, e0 = thermal_averages(s.cfg, spectrum)
    assert s.obs.dens_up[0, 0] == pytest.approx(nu, abs=1e-8)
    assert s.obs.dens_dw[0, 0] == pytest.approx(nd, abs=1e-8)
    assert s.obs.docc[0, 0] == pytest.approx(d, abs=1e-8)
    # partition function relative to its own ground state
    assert s.diag_state.zeta_function == pytest.approx(z, rel=1e-6)


def test_finite_temperature_gf_vs_lehmann(tmp_path):
    s, bath, hloc = tiny_system(tmp_path, gf_flag=True)
    s.solve(bath, hloc)
    from cdmft_lanc_ed_tpu import bath as bm
    hrec = bm.bath_h_rec(s.cfg, s.hb, s.bath)
    dhyb = bm.diag_hybr_of(s.cfg, s.bath)
    spectrum = full_spectrum(s.cfg, hloc, hrec, dhyb)
    wm = np.pi / s.cfg.beta * (2 * np.arange(s.cfg.lmats) + 1)
    g_exact = lehmann_gf(s.cfg, spectrum, 1j * wm)
    g_ours = s.gf.gmats[0, 0, 0, 0, 0, 0]
    np.testing.assert_allclose(g_ours, g_exact, atol=2e-6)


def test_twin_sectors_same_physics(tmp_path):
    """ed_twin=True must reproduce the full-scan results (GS energy, GF)."""
    s1, bath, hloc = tiny_system(tmp_path, lanc_nstates_total=1, beta=100.0)
    s1.solve(bath, hloc)
    s2, bath2, _ = tiny_system(tmp_path, lanc_nstates_total=1, beta=100.0,
                               ed_twin=True)
    s2.solve(bath2, hloc)
    assert s2.egs == pytest.approx(s1.egs, abs=1e-10)
    np.testing.assert_allclose(s2.gf.gmats, s1.gf.gmats, atol=1e-7)
    np.testing.assert_allclose(s2.obs.dens, s1.obs.dens, atol=1e-8)


def test_twin_sectors_magnetic_gs(tmp_path):
    """Twin reconstruction with a GS in an off-diagonal (nup != ndw) sector:
    solve at xmu such that the GS is polarized-degenerate."""
    s1, bath, hloc = tiny_system(tmp_path, lanc_nstates_total=1, beta=200.0,
                                 xmu=-1.2, uloc=[5.0])
    s1.solve(bath, hloc)
    s2, bath2, _ = tiny_system(tmp_path, lanc_nstates_total=1, beta=200.0,
                               xmu=-1.2, uloc=[5.0], ed_twin=True)
    s2.solve(bath2, hloc)
    assert s2.egs == pytest.approx(s1.egs, abs=1e-10)
    assert s2.diag_state.state_list.size == s1.diag_state.state_list.size
    np.testing.assert_allclose(s2.obs.dens, s1.obs.dens, atol=1e-8)
    np.testing.assert_allclose(s2.gf.gmats, s1.gf.gmats, atol=1e-6)
