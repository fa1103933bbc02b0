"""Golden tests: vectorised sector assembly vs brute-force oracle."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu.config import EDConfig
from cdmft_lanc_ed_tpu.ops.sector_ham import build_sector_operator
from cdmft_lanc_ed_tpu.utils import fock

from oracle import build_dense_oracle


def rand_herm(rng, n):
    a = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    return (a + a.conj().T) / 2


def make_problem(nlat, norb, nspin, nbath, seed=0, jx=0.0, jp=0.0,
                 complex_hloc=True, **kw):
    rng = np.random.default_rng(seed)
    cfg = EDConfig(nlat=nlat, norb=norb, nspin=nspin, nbath=nbath,
                   uloc=[2.0, 1.5, 0, 0, 0], ust=0.7, jh=0.2, jx=jx, jp=jp,
                   xmu=0.3, **kw)
    nlso = nlat * nspin * norb
    # hermitian cluster Hamiltonian in lso space, spin-diagonal
    from cdmft_lanc_ed_tpu.utils.reshape import lso2nnn
    h = np.zeros((nlso, nlso), dtype=np.complex128)
    for s in range(nspin):
        blk = rand_herm(rng, nlat * norb)
        if not complex_hloc:
            blk = blk.real.astype(np.complex128)
        sl = slice(s * nlat * norb, (s + 1) * nlat * norb)
        h[sl, sl] = blk * (1.0 + 0.2 * s)
    imp_hloc = lso2nnn(h, nlat, nspin, norb)
    # bath: random hermitian replica matrices + random hybridisations
    hbath = np.zeros((nbath, nlat, nlat, nspin, nspin, norb, norb),
                     dtype=np.complex128)
    for ib in range(nbath):
        hb = np.zeros((nlso, nlso), dtype=np.complex128)
        for s in range(nspin):
            blk = rand_herm(rng, nlat * norb)
            if not complex_hloc:
                blk = blk.real.astype(np.complex128)
            sl = slice(s * nlat * norb, (s + 1) * nlat * norb)
            hb[sl, sl] = blk
        hbath[ib] = lso2nnn(hb, nlat, nspin, norb)
    diag_hybr = rng.normal(size=(nlat, nspin, norb, nbath))
    return cfg, imp_hloc, hbath, diag_hybr


CASES = [
    dict(nlat=2, norb=1, nspin=1, nbath=1),
    dict(nlat=2, norb=1, nspin=2, nbath=1, complex_hloc=False),
    dict(nlat=1, norb=2, nspin=1, nbath=1, jx=0.3, jp=0.25),
    dict(nlat=2, norb=1, nspin=1, nbath=0),       # no bath (plaquette case)
    dict(nlat=1, norb=2, nspin=2, nbath=1, jx=0.15, jp=0.1, hfmode=False),
]


@pytest.mark.parametrize("case", CASES)
def test_sector_dense_vs_oracle(case):
    cfg, ih, hb, dh = make_problem(**case)
    ns = cfg.ns
    # a representative set of sectors incl. edge cases
    sectors = [(0, 0), (1, 0), (1, 1), (ns // 2, ns // 2), (ns, ns),
               (2, 1)]
    for nup, ndw in sectors:
        if nup > ns or ndw > ns:
            continue
        op = build_sector_operator(cfg, ih, hb, dh, nup, ndw)
        h_ref = build_dense_oracle(cfg, ih, hb, dh, nup, ndw)
        h_new = op.to_dense()
        assert h_new.shape == h_ref.shape
        np.testing.assert_allclose(h_new, h_ref, atol=1e-12,
                                   err_msg=f"sector ({nup},{ndw})")
        # hermiticity
        np.testing.assert_allclose(h_new, h_new.conj().T, atol=1e-12)
        # matvec path agrees with dense
        rng = np.random.default_rng(1)
        v = rng.normal(size=op.dim) + 1j * rng.normal(size=op.dim)
        np.testing.assert_allclose(op.matvec_np(v), h_ref @ v, atol=1e-10)


def test_full_spectrum_consistency():
    """Σ over sectors of eigenvalues == spectrum of the full Fock H."""
    cfg, ih, hb, dh = make_problem(nlat=1, norb=2, nspin=1, nbath=1,
                                   jx=0.2, jp=0.2)
    ns = cfg.ns
    evs = []
    for nup in range(ns + 1):
        for ndw in range(ns + 1):
            op = build_sector_operator(cfg, ih, hb, dh, nup, ndw)
            evs.append(np.linalg.eigvalsh(op.to_dense()))
    evs = np.sort(np.concatenate(evs))
    assert len(evs) == 4 ** ns
    # trace check against sum of diagonal over all sectors
    tr = sum(np.trace(build_dense_oracle(cfg, ih, hb, dh, nu, nd)).real
             for nu in range(ns + 1) for nd in range(ns + 1))
    np.testing.assert_allclose(evs.sum(), tr, rtol=1e-10)


def test_sector_codec_roundtrip():
    ns = 7
    for nup in range(ns + 1):
        for ndw in range(ns + 1):
            isec = fock.get_sector(nup, ndw, ns)
            assert fock.get_quantum_numbers(isec, ns) == (nup, ndw)
    assert fock.get_sector(ns, ns, ns) == (ns + 1) ** 2


def test_sector_states_combinadic_matches_filter():
    for ns, n in [(6, 3), (10, 4), (12, 6)]:
        ref = fock.sector_states(ns, n)
        # exercise combinadic branch
        fock.sector_states.cache_clear()
        allstates = np.arange(1 << ns, dtype=np.int64)
        filt = allstates[fock.popcount(allstates) == n]
        np.testing.assert_array_equal(ref, filt)


def test_python_fallback_matches_native(monkeypatch):
    """CDMFT_NO_NATIVE=1 must produce identical sector tables."""
    import importlib
    from cdmft_lanc_ed_tpu.utils import fock
    from cdmft_lanc_ed_tpu.native import loader
    st_native = np.array(fock.sector_states(10, 4))
    r1, c1, s1 = fock.hop_entries(st_native, 2, 7)
    monkeypatch.setenv("CDMFT_NO_NATIVE", "1")
    monkeypatch.setattr(loader, "_lib", None)
    monkeypatch.setattr(loader, "_tried", False)
    fock.sector_states.cache_clear()
    try:
        st_py = np.array(fock.sector_states(10, 4))
        np.testing.assert_array_equal(st_py, st_native)
        r2, c2, s2 = fock.hop_entries(st_py, 2, 7)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(s1, s2)
    finally:
        fock.sector_states.cache_clear()
        monkeypatch.setattr(loader, "_tried", False)
