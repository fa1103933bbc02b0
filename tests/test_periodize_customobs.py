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


def _bhz_mscheme_setup(mh=1.0, ts=0.25, lam=0.3, nx=2, ny=2):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "drivers"))
    from cdn_bhz_postprocessing import cluster_hk_fn, single_cell_hk
    from cdmft_lanc_ed_tpu.models.bhz import bhz_cluster_hloc

    nlat = nx * ny
    cfg = EDConfig(nlat=nlat, norb=2, nspin=2, nbath=0, beta=50.0,
                   xmu=0.0)
    coords = periodize.cluster_coords(nlat, nx, ny)
    h_local = nnn2lso(bhz_cluster_hloc(nx, ny, mh, 0.0, 0.0), nlat, 2, 2)
    hk_hop = single_cell_hk(0.0, ts, lam)
    hk_full = single_cell_hk(mh, ts, lam)
    hk_cluster = cluster_hk_fn(nx, ny, mh, ts, lam)
    return cfg, coords, h_local, hk_hop, hk_full, hk_cluster


def test_m_scheme_local_equals_sigma_scheme_at_sigma0():
    """BHZ local-cumulant M-scheme (cdn_bhz_postprocessing.f90:641-712):
    with Sigma = 0 the cumulant periodization must reproduce the
    Sigma-scheme G exactly (the cumulant is then the local G0)."""
    cfg, coords, h_local, hk_hop, hk_full, _ = _bhz_mscheme_setup()
    z = 1j * np.pi / cfg.beta * (2 * np.arange(6) + 1)
    smats = np.zeros((4, 4, 2, 2, 2, 2, 6), complex)
    for k in ([0.0, 0.0], [0.7, 0.3], [np.pi, np.pi]):
        g_m, s_m = periodize.periodize_m_scheme_local(
            cfg, k, coords, h_local, hk_hop(k), hk_full(k), smats, z)
        g_s, s_s = periodize.periodize_sigma_scheme(
            cfg, k, coords, hk_full(k), smats, z)
        np.testing.assert_allclose(g_m, g_s, atol=1e-11)
        np.testing.assert_allclose(s_m, np.zeros_like(s_m), atol=1e-11)


def test_m_scheme_vs_sigma_scheme_weak_coupling():
    """Weak coupling: the two periodizations differ at O(Sigma^2) —
    with a small k-independent Sigma they must agree to first order
    (the reference uses them interchangeably in this regime)."""
    cfg, coords, h_local, hk_hop, hk_full, _ = _bhz_mscheme_setup()
    rng = np.random.default_rng(11)
    z = 1j * np.pi / cfg.beta * (2 * np.arange(4) + 1)
    eps = 0.02
    # small Hermitian static + 1/w dynamic Sigma, replicated per site
    s_so = eps * (rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4)))
    s_so = s_so + s_so.conj().T
    smats = np.zeros((4, 4, 2, 2, 2, 2, 4), complex)
    for il in range(4):
        blk = s_so.reshape(2, 2, 2, 2)            # [s,o,s,o]
        for li in range(len(z)):
            smats[il, il, :, :, :, :, li] = \
                blk.transpose(0, 2, 1, 3) / (1 + li)
    for k in ([0.4, 0.9], [np.pi / 2, 0.0]):
        g_m, _ = periodize.periodize_m_scheme_local(
            cfg, k, coords, h_local, hk_hop(k), hk_full(k), smats, z)
        g_s, _ = periodize.periodize_sigma_scheme(
            cfg, k, coords, hk_full(k), smats, z)
        scale = np.abs(g_s).max()
        # O(eps^2) agreement: eps=0.02 -> differences ~4e-4 * scale
        assert np.abs(g_m - g_s).max() < 25 * eps ** 2 * scale
        # and both differ from the free G at O(eps)
        g_0, _ = periodize.periodize_sigma_scheme(
            cfg, k, coords, hk_full(k), np.zeros_like(smats), z)
        assert np.abs(g_s - g_0).max() > eps * 0.05 * scale


def test_zmats_free_and_atomic_limit():
    """Z(k) of the reference BHZ postprocessing: identity at Sigma=0;
    for the Hubbard-atom Sigma = U^2/(4 i w) the diagonal weight is
    1/(1 + U^2/(4 w1^2)) (zmats, cdn_bhz_postprocessing.f90:273-289)."""
    from cdmft_lanc_ed_tpu.postprocess import zmats_component, zmats_matrix
    cfg = EDConfig(nlat=1, norb=2, nspin=1, nbath=0, beta=20.0)
    nso = 2
    z0 = zmats_matrix(cfg, np.zeros((nso, nso), complex))
    np.testing.assert_allclose(z0, np.eye(nso), atol=1e-14)
    u = 3.0
    w1 = np.pi / cfg.beta
    sig = np.diag([u ** 2 / (4 * 1j * w1)] * nso)
    zm = zmats_matrix(cfg, sig)
    want = 1.0 / (1.0 + u ** 2 / (4 * w1 ** 2))
    np.testing.assert_allclose(np.diag(zm), want, rtol=1e-12)
    zc = zmats_component(cfg, sig)
    assert zc[0, 0] == pytest.approx(zm[0, 0])
    assert zc[1, 1] == pytest.approx(zm[0, 1])


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
