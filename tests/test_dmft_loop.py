"""Full CDMFT loop integration tests (cheap configurations)."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig, EDSolver
from cdmft_lanc_ed_tpu.dmft_loop import run_dmft_loop
from cdmft_lanc_ed_tpu.models.hubbard import square_cluster_hk


def setup_solver(tmp_path, nlat=1, nbath=3, **kw):
    base = dict(nlat=nlat, norb=1, nspin=1, nbath=nbath, uloc=[4.0],
                beta=10.0, lmats=64, lreal=32, lfit=64, lanc_ngfiter=64,
                dmft_error=5e-4, nloop=30, ed_verbose=0, cg_niter=300,
                cg_ftol=1e-8, work_dir=str(tmp_path))
    base.update(kw)
    cfg = EDConfig(**base)
    solver = EDSolver(cfg)
    basis = np.zeros((1, nlat, nlat, 1, 1, 1, 1), np.complex128)
    for il in range(nlat):
        basis[0, il, il, 0, 0, 0, 0] = 1.0
    lambdas = np.linspace(-1.0, 1.0, nbath)[:, None]
    solver.set_hbath(basis, lambdas)
    bath = solver.init_solver()
    return solver, bath


def test_single_site_dmft_converges(tmp_path):
    """Single-site DMFT on the 2d square lattice at half filling
    (BASELINE config 2 reduced): loop must converge, dens=1 by PH symm."""
    solver, bath = setup_solver(tmp_path)
    hk, hloc = square_cluster_hk(1, 1, nk=8)
    res = run_dmft_loop(solver, hk, hloc, bath, wmixing=0.7)
    assert res.converged, f"not converged: err={res.error}"
    assert res.solver.dens().sum() == pytest.approx(1.0, abs=1e-6)
    # insulating-ish at U=4, beta=10: docc well below the U=0 value 0.25
    assert 0.0 < float(res.solver.docc()[0, 0]) < 0.2
    # converged bath must reproduce itself within dmft_error under one more
    # iteration (self-consistency fixed point)
    prev_weiss = res.weiss.copy()
    res2 = run_dmft_loop(res.solver, hk, hloc, res.bath, wmixing=1.0,
                         max_loops=1)
    num = np.abs(res2.weiss - prev_weiss).sum()
    den = np.abs(prev_weiss).sum()
    assert num / den < 5e-3


def test_two_site_cluster_1dchain(tmp_path):
    """2-site cluster CDMFT for the 1d Hubbard chain (BASELINE config 3
    reduced): converges and is PH-symmetric at half filling."""
    solver, bath = setup_solver(tmp_path, nlat=2, nbath=2, dmft_error=1e-3)
    hk, hloc = square_cluster_hk(2, 1, nk=16)
    res = run_dmft_loop(solver, hk, hloc, bath, wmixing=0.6)
    assert res.converged, f"not converged: err={res.error}"
    np.testing.assert_allclose(res.solver.dens(), 1.0, atol=1e-5)
    # cluster symmetry: both sites equivalent
    d = res.solver.docc()
    assert d[0, 0] == pytest.approx(d[1, 0], abs=1e-6)


def test_2x2_plaquette_with_bath_cdmft(tmp_path):
    """2x2 cluster + 1 replica bath (BASELINE config 4 reduced): two DMFT
    iterations run end-to-end; PH symmetry holds; self-consistency error
    decreases."""
    solver, bath = setup_solver(tmp_path, nlat=4, nbath=1, beta=8.0,
                                lmats=32, lfit=32, lanc_ngfiter=32,
                                nloop=2, dmft_error=1e-10)
    hk, hloc = square_cluster_hk(2, 2, nk=4)
    res = run_dmft_loop(solver, hk, hloc, bath, wmixing=0.7, max_loops=2)
    assert res.iterations == 2
    np.testing.assert_allclose(res.solver.dens(), 1.0, atol=1e-5)
    d = res.solver.docc().ravel()
    np.testing.assert_allclose(d, d[0], atol=1e-6)   # C4 symmetry
    assert 0.0 < d[0] < 0.25
    # cluster symmetry of Sigma: site-diagonal entries all equal
    sm = res.solver.sigma_matsubara()
    diag0 = sm[0, 0, 0, 0, 0, 0, 0]
    for il in range(1, 4):
        assert sm[il, il, 0, 0, 0, 0, 0] == pytest.approx(diag0, abs=1e-6)


def test_adaptive_mixing_converges(tmp_path):
    solver, bath = setup_solver(tmp_path)
    hk, hloc = square_cluster_hk(1, 1, nk=8)
    res = run_dmft_loop(solver, hk, hloc, bath, wmixing=0.9,
                        adaptive_mixing=True)
    assert res.converged
    np.testing.assert_allclose(res.solver.dens(), 1.0, atol=1e-6)
