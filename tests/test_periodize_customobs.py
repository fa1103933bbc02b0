"""Periodization schemes and custom observables."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig, EDSolver
from cdmft_lanc_ed_tpu import periodize
from cdmft_lanc_ed_tpu.custom_obs import CustomObservables
from cdmft_lanc_ed_tpu.utils.reshape import nnn2lso


def test_periodize_sigma_scheme_free():
    """Sigma=0: G_per must be the exact free lattice GF."""
    cfg = EDConfig(nlat=1, norb=1, nspin=1, nbath=0, xmu=0.3, beta=10.0)
    coords = periodize.cluster_coords(1, 1, 1)
    z = 1j * np.pi / 10.0 * (2 * np.arange(6) + 1)
    hk_per = np.array([[0.7]], complex)
    smats = np.zeros((1, 1, 1, 1, 1, 1, 6), complex)
    g, s = periodize.periodize_sigma_scheme(cfg, [0.0], coords, hk_per,
                                            smats, z)
    want = 1.0 / (z + 0.3 - 0.7)
    np.testing.assert_allclose(g[0, 0, 0, 0], want, atol=1e-12)
    assert np.abs(s).max() == 0.0


def test_periodize_schemes_agree_single_site():
    """Nlat=1: G-scheme and Sigma-scheme coincide."""
    cfg = EDConfig(nlat=1, norb=2, nspin=1, nbath=0, xmu=0.1)
    coords = periodize.cluster_coords(1, 1, 1)
    rng = np.random.default_rng(2)
    z = 1j * (2 * np.arange(5) + 1) * 0.2
    hk = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    hk = hk + hk.conj().T
    smats = 0.2 * (rng.normal(size=(1, 1, 1, 1, 2, 2, 5))
                   + 1j * rng.normal(size=(1, 1, 1, 1, 2, 2, 5)))
    g1, s1 = periodize.build_sigma_g_scheme(cfg, [0.0], coords, hk, hk,
                                            smats, z)
    g2, s2 = periodize.periodize_sigma_scheme(cfg, [0.0], coords, hk,
                                              smats, z)
    np.testing.assert_allclose(g1, g2, atol=1e-10)
    np.testing.assert_allclose(s1, s2, atol=1e-10)


def test_periodize_phases_sum_rule():
    """k=0 periodization is the plain site average."""
    cfg = EDConfig(nlat=2, norb=1, nspin=1, nbath=0, xmu=0.0)
    coords = periodize.cluster_coords(2, 2, 1)
    rng = np.random.default_rng(3)
    z = 1j * (2 * np.arange(3) + 1) * 0.5
    hk = rng.normal(size=(2, 2)) + 0j
    hk = hk + hk.conj().T
    smats = np.zeros((2, 2, 1, 1, 1, 1, 3), complex)
    g = periodize.periodize_g_scheme(cfg, [0.0], coords, hk, smats, z)
    # manual: average of all 4 cluster components of [(z-hk)^-1]
    for li, zz in enumerate(z):
        gfull = np.linalg.inv(zz * np.eye(2) - hk)
        want = gfull.sum() / 2
        assert g[0, 0, 0, 0, li] == pytest.approx(want, abs=1e-12)


def test_custom_observable_total_density(tmp_path):
    """Isolated cluster as 'lattice' (Nk=1, Hk=Hloc): the custom-observable
    integral of Tr[I G] must give the total density (T=0 path: Matsubara
    quadrature + Sigma rebuild at arbitrary z)."""
    h = np.zeros((4, 4, 1, 1, 1, 1), dtype=complex)
    for (i, j) in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        h[i, j, 0, 0, 0, 0] = h[j, i, 0, 0, 0, 0] = -1.0
    cfg = EDConfig(nlat=4, norb=1, nspin=1, nbath=0, uloc=[4.0], lmats=16,
                   lreal=16, lanc_ngfiter=48, ed_verbose=0,
                   work_dir=str(tmp_path))
    s = EDSolver(cfg)
    s.init_solver()
    s.solve(np.zeros(0), h)
    hk = nnn2lso(h, 4, 1, 1).reshape(1, 4, 4)
    co = CustomObservables(s, hk)
    co.add("ntot", np.eye(4))
    vals = co.compute()
    # spin multiplicity 2 (nspin=1): total N over both spins = 4.0
    assert vals["ntot"] == pytest.approx(4.0, abs=0.02)


def test_m_scheme_anchors():
    """Cumulant (M-scheme) periodization: Sigma=0 -> M_per=(z+mu)^-1 I and
    Sigma_per=0; site-constant diagonal Sigma is reproduced exactly."""
    from cdmft_lanc_ed_tpu import EDConfig
    from cdmft_lanc_ed_tpu.periodize import periodize_m_scheme
    cfg = EDConfig(nlat=4, norb=1, nspin=1, xmu=0.3)
    z = 1j * np.linspace(0.1, 2, 5)
    cell = np.repeat(np.arange(2.0), 2)
    sub = np.tile([0, 1], 2)
    s = np.zeros((4, 4, 1, 1, 1, 1, 5), complex)
    m, sp = periodize_m_scheme(cfg, [0.7], cell, sub, 2, s, z)
    for i in range(5):
        np.testing.assert_allclose(m[..., i], np.eye(2) / (z[i] + 0.3),
                                   atol=1e-13)
    np.testing.assert_allclose(sp, 0, atol=1e-12)
    s2 = np.zeros_like(s)
    for il in range(4):
        s2[il, il, 0, 0, 0, 0, :] = 0.8 - 0.2j
    _, sp2 = periodize_m_scheme(cfg, [1.1], cell, sub, 2, s2, z)
    for i in range(5):
        np.testing.assert_allclose(sp2[..., i], (0.8 - 0.2j) * np.eye(2),
                                   atol=1e-12)
