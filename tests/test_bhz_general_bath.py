"""BHZ model slice: Nspin=2, Norb=2, complex H, general bath
(BASELINE config 5 reduced to a single-site cluster for CI speed)."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import EDConfig, EDSolver
from cdmft_lanc_ed_tpu import bath as bm
from cdmft_lanc_ed_tpu.models import bhz

import oracle


def make_bhz_solver(tmp_path, nbath=2, bath_type="general", **kw):
    base = dict(nlat=1, norb=2, nspin=2, nbath=nbath, uloc=[1.0, 1.0],
                ust=0.5, jh=0.1, beta=100.0, lmats=32, lreal=16,
                lanc_ngfiter=48, bath_type=bath_type, ed_verbose=0,
                lanc_dim_threshold=2048, work_dir=str(tmp_path))
    base.update(kw)
    cfg = EDConfig(**base)
    s = EDSolver(cfg)
    basis, lam0 = bhz.bhz_bath_basis(1, 1, mh=0.5, ts=0.25, lam=0.3)
    lams = np.tile(lam0, (nbath, 1)) * np.linspace(
        0.5, 1.5, nbath)[:, None]
    s.set_hbath(basis, lams)
    bath = s.init_solver()
    hloc = bhz.bhz_cluster_hloc(1, 1, mh=0.5, ts=0.25, lam=0.3)
    return s, bath, hloc


def test_general_bath_pack_roundtrip(tmp_path):
    s, bath_arr, _ = make_bhz_solver(tmp_path)
    cfg = s.cfg
    nsym = s.hb.nsym
    assert len(bath_arr) == bm.get_bath_dimension(cfg, nsym)
    b = bm.unpack_dmft_bath(cfg, bath_arr)
    # general bath: V has Nlso = 4 independent entries per replica
    b.v[0, 2] = 0.77
    arr2 = bm.pack_dmft_bath(cfg, b)
    b2 = bm.unpack_dmft_bath(cfg, arr2)
    np.testing.assert_allclose(b2.v, b.v)
    np.testing.assert_allclose(b2.lam, b.lam)


def test_bhz_sector_hamiltonian_vs_oracle(tmp_path):
    """Complex spin-dependent H against the dense brute-force oracle."""
    s, bath_arr, hloc = make_bhz_solver(tmp_path)
    cfg = s.cfg
    b = bm.unpack_dmft_bath(cfg, bath_arr)
    hrec = bm.bath_h_rec(cfg, s.hb, b)
    dhyb = bm.diag_hybr_of(cfg, b)
    from cdmft_lanc_ed_tpu.ops import sector_ham
    for (nup, ndw) in [(2, 2), (3, 2), (1, 4)]:
        op = sector_ham.build_sector_operator(cfg, hloc.astype(complex),
                                              hrec, dhyb, nup, ndw)
        h_dense = op.to_dense()
        h_oracle = oracle.build_dense_oracle(cfg, hloc.astype(complex),
                                             hrec, dhyb, nup, ndw)
        np.testing.assert_allclose(h_dense, h_oracle, atol=1e-12)


def test_bhz_solve_and_gf(tmp_path):
    s, bath_arr, hloc = make_bhz_solver(tmp_path)
    s.solve(bath_arr, hloc)
    # GS energy vs dense oracle over all sectors
    cfg = s.cfg
    b = bm.unpack_dmft_bath(cfg, bath_arr)
    hrec = bm.bath_h_rec(cfg, s.hb, b)
    dhyb = bm.diag_hybr_of(cfg, b)
    e0 = np.inf
    for nup in range(cfg.ns + 1):
        for ndw in range(cfg.ns + 1):
            h = oracle.build_dense_oracle(cfg, hloc.astype(complex), hrec,
                                          dhyb, nup, ndw)
            e0 = min(e0, np.linalg.eigvalsh(h)[0])
    assert s.egs == pytest.approx(e0, abs=1e-8)
    # GF sanity: Matsubara diagonal has negative imaginary part
    for o in range(2):
        for sp in range(2):
            g = s.gf.gmats[0, 0, sp, sp, o, o]
            assert np.all(g.imag < 0)
    # particle-hole structure: weights sum to 1 on the diagonal
    for o in range(2):
        for sp in range(2):
            p, w = s.gf.spectrum.flat((0, 0, sp, o, o))
            assert w.real.sum() == pytest.approx(1.0, abs=1e-7)


def test_bhz_delta_general_vs_replica_shapes(tmp_path):
    """General-bath Delta(z) has the full Nlso x Nlso structure."""
    s, bath_arr, hloc = make_bhz_solver(tmp_path)
    cfg = s.cfg
    b = bm.unpack_dmft_bath(cfg, bath_arr)
    b.v[:] = np.linspace(0.2, 0.9, b.v.size).reshape(b.v.shape)
    z = 1j * np.pi / cfg.beta * (2 * np.arange(8) + 1)
    d = bm.delta_bath(cfg, s.hb, b, z)
    assert d.shape == (1, 1, 2, 2, 2, 2, 8)
    # hermiticity in (orb x spin) at iw_n -> -iw_n: Delta(z)^H = Delta(z*)
    from cdmft_lanc_ed_tpu.utils.reshape import nnn2lso
    dl = nnn2lso(d, 1, 2, 2)
    dlc = nnn2lso(bm.delta_bath(cfg, s.hb, b, np.conj(z)), 1, 2, 2)
    for i in range(8):
        np.testing.assert_allclose(dl[:, :, i].conj().T, dlc[:, :, i],
                                   atol=1e-12)
