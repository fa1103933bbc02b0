"""Round-2 parity closures: chi2-fit result files + knob validation,
faithful mu-search (search_chemical_potential) with xmu.restart, and
atomic twin-pair capacity accounting in the eigenstate list."""
import glob
import os

import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig
from cdmft_lanc_ed_tpu import bath as bath_mod
from cdmft_lanc_ed_tpu.eigenspace import StateList
from cdmft_lanc_ed_tpu.fit import chi2_fitgf
from cdmft_lanc_ed_tpu.lattice import MuSearch, VariableSearch


def _fit_cfg(tmp_path, **kw):
    base = dict(nlat=1, norb=1, nspin=1, nbath=3, beta=50.0, lmats=100,
                lfit=100, ed_verbose=0, cg_scheme="delta", cg_ftol=1e-10,
                cg_niter=500, work_dir=str(tmp_path))
    base.update(kw)
    return EDConfig(**base)


def _run_fit(cfg):
    hb = bath_mod.set_hbath(np.ones((1, 1, 1, 1, 1, 1, 1)),
                            np.array([[0.7], [-0.1], [-0.9]]), cfg)
    target = bath_mod.DmftBath(v=np.full((3, 1), 0.45),
                               lam=np.array([[0.7], [-0.1], [-0.9]]))
    wm = np.pi / cfg.beta * (2 * np.arange(cfg.lmats) + 1)
    fg = bath_mod.delta_bath(cfg, hb, target, 1j * wm)
    start = bath_mod.DmftBath(v=np.full((3, 1), 0.3),
                              lam=np.array([[0.5], [0.0], [-0.5]]))
    b0 = bath_mod.pack_dmft_bath(cfg, start)
    return chi2_fitgf(cfg, hb, fg, b0)


def test_fit_writes_result_files(tmp_path):
    """fit_delta component files + chi2fit_results_ALLorb_ALLspins
    (ED_FIT_REPLICA.f90:228-291)."""
    cfg = _fit_cfg(tmp_path)
    _run_fit(cfg)
    res = os.path.join(str(tmp_path), "chi2fit_results_ALLorb_ALLspins.ed")
    assert os.path.exists(res)
    chi2, nit = open(res).read().split()
    assert float(chi2) < 1e-8 and int(nit) >= 1
    files = glob.glob(os.path.join(str(tmp_path), "fit_delta_*.ed"))
    assert len(files) == 1                     # Nlso=1 -> one component
    rows = np.loadtxt(files[0])
    assert rows.shape == (cfg.lmats, 5)
    # converged fit: model columns match target columns on the grid
    np.testing.assert_allclose(rows[:, 1], rows[:, 2], atol=1e-4)
    np.testing.assert_allclose(rows[:, 3], rows[:, 4], atol=1e-4)


def test_fit_weiss_files_and_knob_rejection(tmp_path):
    cfg = _fit_cfg(tmp_path, cg_scheme="weiss")
    hb = bath_mod.set_hbath(np.ones((1, 1, 1, 1, 1, 1, 1)),
                            np.array([[0.7], [-0.1], [-0.9]]), cfg)
    target = bath_mod.DmftBath(v=np.full((3, 1), 0.45),
                               lam=np.array([[0.7], [-0.1], [-0.9]]))
    wm = np.pi / cfg.beta * (2 * np.arange(cfg.lmats) + 1)
    hloc = np.zeros((1, 1, 1, 1, 1, 1))
    fg = bath_mod.g0and_bath(cfg, hb, target, hloc, 1j * wm)
    b0 = bath_mod.pack_dmft_bath(cfg, target)
    chi2_fitgf(cfg, hb, fg, b0, hloc_nnn=hloc)
    assert glob.glob(os.path.join(str(tmp_path), "fit_weiss_*.ed"))

    cfg_bad = _fit_cfg(tmp_path, cg_method=7)
    with pytest.raises(ValueError, match="cg_method"):
        chi2_fitgf(cfg_bad, hb, fg, b0)
    cfg_bad2 = _fit_cfg(tmp_path, cg_stop=5)
    with pytest.raises(ValueError, match="cg_stop"):
        chi2_fitgf(cfg_bad2, hb, fg, b0)


def test_cg_stop_criteria_run(tmp_path):
    """cg_stop=1 (C1) and 2 (C2) both converge the single-site fit."""
    for stop in (1, 2):
        cfg = _fit_cfg(tmp_path, cg_stop=stop, cg_ftol=1e-12)
        _, chi2, _ = _run_fit(cfg)
        assert chi2 < 1e-6


# ---------------------------------------------------------------------------
# mu search
# ---------------------------------------------------------------------------

def test_mu_search_converges_and_writes_restart(tmp_path):
    """Bracketing walk hits nread within nerr on a monotonic n(mu) model
    and persists xmu.restart (ED_AUX_FUNX.f90:701-853)."""
    nread, nerr = 1.0, 1e-4
    ms = MuSearch(nread, ndelta=0.3, nerr=nerr, niter=100,
                  work_dir=str(tmp_path))
    mu = -1.3
    dens = lambda m: 1.0 + np.tanh(0.8 * (m - 0.37))   # target mu=0.37
    conv = False
    for _ in range(200):
        n = dens(mu)
        mu, conv = ms.step(mu, n, converged=True)
        if conv:
            break
    assert conv
    assert abs(dens(mu) - nread) < 1e-2   # threshold floor reached
    restart = os.path.join(str(tmp_path), "xmu.restart")
    assert os.path.exists(restart)
    toks = open(restart).read().split()
    assert float(toks[0]) == pytest.approx(mu)
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "search_mu_iteration.ed"))


def test_mu_search_threshold_reduction(tmp_path):
    """Converged-at-threshold step must tighten nth and reset converged."""
    ms = MuSearch(1.0, ndelta=0.1, nerr=1e-6, niter=50,
                  work_dir=str(tmp_path))
    # density already within the initial nth=1e-2 of nread and DMFT converged
    mu, conv = ms.step(0.0, 1.0 + 5e-3, converged=True)
    assert not conv                       # reset by the reduction
    assert ms.nth == pytest.approx(1e-3)


def test_variable_search_secant(tmp_path):
    """ed_search_variable secant drive toward nread with restart files."""
    vs = VariableSearch(1.0, nerr=1e-5, ndelta=0.2, work_dir=str(tmp_path))
    mu = -0.8
    dens = lambda m: 1.0 + 0.5 * (m - 0.2)
    for _ in range(60):
        n = dens(mu)
        mu, conv = vs.step(mu, n, converged=True)
        if conv:
            break
    assert abs(dens(mu) - 1.0) < 1e-4
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "var_compressibility.restart"))
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "var_compressibility.used"))


# ---------------------------------------------------------------------------
# eigenstate list twin capacity
# ---------------------------------------------------------------------------

def test_statelist_twin_capacity_atomic():
    """Twin insertions occupy two slots; the list never exceeds capacity
    (VERDICT round-1 item 9; ED_EIGENSPACE.f90:197-220)."""
    ns = 4
    cap = 6
    sl = StateList()
    rng = np.random.default_rng(0)
    for i in range(20):
        # use asymmetric sectors so twin != self
        isector = (1) * (ns + 1) + 2      # (nup=1, ndw=2)
        sl.add(float(rng.normal()), np.ones(3), isector, ns,
               twin=True, size=cap)
        assert sl.size <= cap
    assert sl.size == cap
    # energies stay sorted and twins are paired
    es = [s.energy for s in sl]
    assert es == sorted(es)
    n_twin = sum(1 for s in sl if s.itwin)
    assert n_twin == cap // 2


def test_statelist_mixed_capacity():
    sl = StateList()
    ns = 4
    for e in [3.0, 1.0, 2.0]:
        sl.add(e, np.ones(2), 7, ns, twin=False, size=4)
    # inserting a low-energy twin pair must evict enough singles
    sl.add(0.5, np.ones(2), (1) * (ns + 1) + 2, ns, twin=True, size=4)
    assert sl.size <= 4
    assert sl.emin == pytest.approx(0.5)


def test_compat_bath_function_getters(tmp_path):
    """ed_get_delta/g0and/invG0and_{matsubara,realaxis} on the
    reference-named porting surface (ED_IO.f90:250-257) evaluate the
    analytic bath functions on both frequency axes (round-3 VERDICT
    missing item 5)."""
    from cdmft_lanc_ed_tpu import EDSolver, compat
    from cdmft_lanc_ed_tpu import bath as bm
    from cdmft_lanc_ed_tpu.gf import matsubara_grid, realaxis_grid

    cfg = EDConfig(nlat=2, norb=1, nspin=1, nbath=1, uloc=[2.0],
                   lmats=12, lreal=6, lanc_dim_threshold=64, gf_flag=False,
                   ed_verbose=0, work_dir=str(tmp_path))
    nn = (2, 2, 1, 1, 1, 1)
    hloc = np.zeros(nn, np.complex128)
    hloc[0, 1, 0, 0, 0, 0] = hloc[1, 0, 0, 0, 0, 0] = -1.0
    basis = np.zeros((1,) + nn, np.complex128)
    for il in range(2):
        basis[0, il, il, 0, 0, 0, 0] = 1.0
    s = EDSolver(cfg)
    s.set_hbath(basis, np.array([[0.35]]))
    b = s.init_solver()
    s.solve(b, hloc)

    zm = 1j * matsubara_grid(cfg)
    zr = realaxis_grid(cfg) + 1j * cfg.eps
    np.testing.assert_allclose(
        compat.ed_get_delta_matsubara(s),
        bm.delta_bath(cfg, s.hb, s.bath, zm), atol=1e-13)
    np.testing.assert_allclose(
        compat.ed_get_delta_realaxis(s),
        bm.delta_bath(cfg, s.hb, s.bath, zr), atol=1e-13)
    np.testing.assert_allclose(
        compat.ed_get_g0and_matsubara(s),
        bm.g0and_bath(cfg, s.hb, s.bath, hloc, zm), atol=1e-13)
    np.testing.assert_allclose(
        compat.ed_get_g0and_realaxis(s),
        bm.g0and_bath(cfg, s.hb, s.bath, hloc, zr), atol=1e-13)
    inv = compat.ed_get_invg0and_matsubara(s)
    np.testing.assert_allclose(
        inv, bm.invg0_bath(cfg, s.hb, s.bath, hloc, zm), atol=1e-13)
    # invG0and is the matrix inverse of G0and per frequency
    from cdmft_lanc_ed_tpu.utils.reshape import nnn2lso
    g0l = nnn2lso(compat.ed_get_g0and_matsubara(s), 2, 1, 1)
    invl = nnn2lso(inv, 2, 1, 1)
    for w in range(cfg.lmats):
        np.testing.assert_allclose(invl[..., w] @ g0l[..., w],
                                   np.eye(2), atol=1e-10)
    np.testing.assert_allclose(
        compat.ed_get_invg0and_realaxis(s),
        bm.invg0_bath(cfg, s.hb, s.bath, hloc, zr), atol=1e-13)
    # packed-bath override path matches the solver-state path
    np.testing.assert_allclose(compat.ed_get_delta_matsubara(s, bath=b),
                               compat.ed_get_delta_matsubara(s),
                               atol=1e-13)
