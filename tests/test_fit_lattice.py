"""Tests for the chi^2 bath fit and the lattice/self-consistency layer."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig
from cdmft_lanc_ed_tpu import bath as bath_mod
from cdmft_lanc_ed_tpu.fit import chi2_fitgf
from cdmft_lanc_ed_tpu import lattice
from cdmft_lanc_ed_tpu.utils.reshape import lso2nnn, nnn2lso


def single_site_cfg(**kw):
    base = dict(nlat=1, norb=1, nspin=1, nbath=3, beta=50.0, lmats=200,
                lfit=200, ed_verbose=0, cg_scheme="delta", cg_ftol=1e-10,
                cg_niter=800)
    base.update(kw)
    return EDConfig(**base)


def make_target_bath(cfg):
    hb = bath_mod.set_hbath(np.ones((1, 1, 1, 1, 1, 1, 1)),
                            np.array([[0.7], [-0.1], [-0.9]]), cfg)
    target = bath_mod.DmftBath(v=np.full((3, 1), 0.45),
                               lam=np.array([[0.7], [-0.1], [-0.9]]))
    return hb, target


def test_chi2_fit_recovers_delta():
    """Fit from a perturbed start must reproduce the target hybridisation."""
    cfg = single_site_cfg()
    hb, target = make_target_bath(cfg)
    wm = np.pi / cfg.beta * (2 * np.arange(cfg.lmats) + 1)
    fg = bath_mod.delta_bath(cfg, hb, target, 1j * wm)

    start = bath_mod.DmftBath(v=np.full((3, 1), 0.3),
                              lam=np.array([[0.5], [0.0], [-0.5]]))
    b0 = bath_mod.pack_dmft_bath(cfg, start)
    bfit, chi2, nit = chi2_fitgf(cfg, hb, fg, b0)
    fitted = bath_mod.unpack_dmft_bath(cfg, bfit)
    d_fit = bath_mod.delta_bath(cfg, hb, fitted, 1j * wm)
    assert chi2 < 1e-10
    np.testing.assert_allclose(d_fit, fg, atol=1e-4)


def test_chi2_fit_weiss_scheme():
    cfg = single_site_cfg(cg_scheme="weiss")
    hb, target = make_target_bath(cfg)
    wm = np.pi / cfg.beta * (2 * np.arange(cfg.lmats) + 1)
    hloc = np.zeros((1, 1, 1, 1, 1, 1))
    fg = bath_mod.g0and_bath(cfg, hb, target, hloc, 1j * wm)

    start = bath_mod.DmftBath(v=np.full((3, 1), 0.35),
                              lam=np.array([[0.6], [0.05], [-0.6]]))
    b0 = bath_mod.pack_dmft_bath(cfg, start)
    bfit, chi2, _ = chi2_fitgf(cfg, hb, fg, b0, hloc_nnn=hloc)
    fitted = bath_mod.unpack_dmft_bath(cfg, bfit)
    g0_fit = bath_mod.g0and_bath(cfg, hb, fitted, hloc, 1j * wm)
    np.testing.assert_allclose(g0_fit, fg, atol=1e-4)


def test_chi2_fit_frobenius_norm():
    cfg = single_site_cfg(cg_norm="frobenius")
    hb, target = make_target_bath(cfg)
    wm = np.pi / cfg.beta * (2 * np.arange(cfg.lmats) + 1)
    fg = bath_mod.delta_bath(cfg, hb, target, 1j * wm)
    start = bath_mod.DmftBath(v=np.full((3, 1), 0.3),
                              lam=np.array([[0.6], [0.1], [-0.6]]))
    bfit, chi2, _ = chi2_fitgf(cfg, hb, fg,
                               bath_mod.pack_dmft_bath(cfg, start))
    fitted = bath_mod.unpack_dmft_bath(cfg, bfit)
    d_fit = bath_mod.delta_bath(cfg, hb, fitted, 1j * wm)
    np.testing.assert_allclose(d_fit, fg, atol=1e-3)


# ---------------------------------------------------------------------------
# lattice layer
# ---------------------------------------------------------------------------

def test_gloc_vs_numpy_reference():
    """Batched gloc against a plain numpy loop (independent evaluation)."""
    rng = np.random.default_rng(0)
    nk, n, l = 16, 3, 12
    hk = rng.normal(size=(nk, n, n)) + 1j * rng.normal(size=(nk, n, n))
    hk = 0.5 * (hk + hk.conj().transpose(0, 2, 1))
    sigma = 0.1 * (rng.normal(size=(l, n, n))
                   + 1j * rng.normal(size=(l, n, n)))
    z = 1j * (2 * np.arange(l) + 1) * np.pi / 10.0
    g = lattice.gloc_lattice(z, hk, sigma, xmu=0.3)
    for li in range(l):
        acc = np.zeros((n, n), complex)
        for k in range(nk):
            acc += np.linalg.inv((z[li] + 0.3) * np.eye(n) - hk[k]
                                 - sigma[li])
        np.testing.assert_allclose(g[li], acc / nk, atol=1e-12)


def test_self_consistency_weiss_noninteracting():
    """Sigma = 0  =>  Weiss G0 == G_loc."""
    cfg = EDConfig(nlat=2, norb=1, nspin=1, nbath=0, beta=20.0, lmats=8)
    l = 8
    rng = np.random.default_rng(1)
    g = rng.normal(size=(2, 2, 1, 1, 1, 1, l)) \
        + 1j * rng.normal(size=(2, 2, 1, 1, 1, 1, l))
    # make each frequency slice invertible & hermitian-ish
    s = np.zeros_like(g)
    weiss = lattice.dmft_self_consistency(cfg, g, s, scheme="weiss")
    np.testing.assert_allclose(weiss, g, atol=1e-10)


def test_kinetic_energy_free_electrons():
    """U=0 (Sigma=0): E_kin must equal the exact free value."""
    cfg = EDConfig(nlat=1, norb=1, nspin=1, nbath=0, beta=100.0, lmats=2000,
                   xmu=0.0)
    nk = 64
    kx = 2 * np.pi * np.arange(nk) / nk
    eps = -2.0 * np.cos(kx)           # 1d chain
    hk = eps.reshape(nk, 1, 1).astype(complex)
    smats = np.zeros((1, 1, 1, 1, 1, 1, cfg.lmats), complex)
    ek = lattice.dmft_kinetic_energy(cfg, hk, smats)
    occ = 1.0 / (1.0 + np.exp(cfg.beta * np.clip(eps, -5, 5)))
    exact = 2.0 * (eps * occ).sum() / nk
    assert ek == pytest.approx(exact, abs=1e-3)


def test_convergence_check():
    c = lattice.ConvergenceCheck(1e-3, nsuccess=2)
    f = np.ones(10)
    assert not c(f)
    assert not c(f * (1 + 1e-5))      # first success
    assert c(f * (1 + 1e-5))          # second success -> converged
    assert not lattice.ConvergenceCheck(1e-9)(np.ones(3))


def test_chi2_fit_general_bath():
    """General bath: per-lso-component V fit (GENERAL variant,
    ED_FIT_GENERAL.f90)."""
    cfg = EDConfig(nlat=1, norb=2, nspin=1, nbath=2, beta=40.0, lmats=150,
                   lfit=150, bath_type="general", cg_scheme="delta",
                   cg_ftol=1e-11, cg_niter=1500, ed_verbose=0)
    basis = np.zeros((2, 1, 1, 1, 1, 2, 2), complex)
    basis[0, 0, 0, 0, 0, 0, 0] = 1.0
    basis[1, 0, 0, 0, 0, 1, 1] = 1.0
    hb = bath_mod.set_hbath(basis, np.array([[0.5, -0.4], [-0.6, 0.3]]),
                            cfg)
    target = bath_mod.DmftBath(v=np.array([[0.4, 0.7], [0.6, 0.2]]),
                               lam=np.array([[0.5, -0.4], [-0.6, 0.3]]))
    wm = np.pi / cfg.beta * (2 * np.arange(cfg.lmats) + 1)
    fg = bath_mod.delta_bath(cfg, hb, target, 1j * wm)
    start = bath_mod.DmftBath(v=np.array([[0.3, 0.5], [0.5, 0.3]]),
                              lam=np.array([[0.4, -0.3], [-0.4, 0.2]]))
    bfit, chi2, _ = chi2_fitgf(cfg, hb, fg,
                               bath_mod.pack_dmft_bath(cfg, start))
    fitted = bath_mod.unpack_dmft_bath(cfg, bfit)
    d_fit = bath_mod.delta_bath(cfg, hb, fitted, 1j * wm)
    assert chi2 < 1e-9
    np.testing.assert_allclose(d_fit, fg, atol=1e-4)
