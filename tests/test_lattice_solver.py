"""Multi-inequivalent-cluster (real-space CDMFT) solver."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig
from cdmft_lanc_ed_tpu.lattice_solver import LatticeSolver


def test_lattice_solver_independent_clusters(tmp_path):
    """Two inequivalent single-site clusters with different U must produce
    different docc but the same half-filled density."""
    cfg = EDConfig(nlat=1, norb=1, nspin=1, nbath=2, beta=20.0, lmats=32,
                   lreal=16, lanc_ngfiter=32, ed_verbose=0,
                   work_dir=str(tmp_path))
    ls = LatticeSolver(cfg, nineq=2, uloc_ii=[[2.0], [6.0]])
    basis = np.ones((1, 1, 1, 1, 1, 1, 1))
    ls.set_hbath(basis, np.array([[0.5], [-0.5]]))
    baths = ls.init_solver()
    assert baths.shape[0] == 2
    hloc = np.zeros((1, 1, 1, 1, 1, 1))
    ls.solve(baths, hloc)

    dens = ls.dens()
    docc = ls.docc()
    assert dens.shape == (2, 1, 1)
    np.testing.assert_allclose(dens, 1.0, atol=1e-8)
    # U=6 cluster must have (much) smaller double occupancy than U=2
    assert docc[1, 0, 0] < docc[0, 0, 0] - 0.02
    # per-cluster restart files carry the ineq suffix
    import os
    assert os.path.exists(str(tmp_path / "hamiltonian_ineq0001.used"))
    assert os.path.exists(str(tmp_path / "hamiltonian_ineq0002.used"))

    sig = ls.sigma_matsubara()
    assert sig.shape == (2, 1, 1, 1, 1, 1, 1, 32)
    # stronger U -> larger self-energy
    assert np.abs(sig[1]).max() > np.abs(sig[0]).max()

    # per-cluster fit keeps shapes
    weiss = ls.gimp_matsubara()
    new_baths = ls.fit(weiss, baths, hloc_ineq=hloc)
    assert new_baths.shape == baths.shape
