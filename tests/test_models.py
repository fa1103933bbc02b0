"""Model-family physics anchors: Kane-Mele, kagome, SSH, BHZ bands."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu.models import bhz, kagome, kanemele, ssh


def test_kanemele_geometry_counts():
    from collections import Counter
    nn, nnn = Counter(), Counter()
    for (i, j, cell, kind, nu) in kanemele._BONDS:
        (nn if kind == "nn" else nnn)[i] += 1
        if kind == "nnn":
            assert nu in (-1, 1)
    assert all(v == 3 for v in nn.values())
    assert all(v == 6 for v in nnn.values())


def test_kanemele_gap_and_graphene_limit():
    hk, _ = kanemele.kanemele_cluster_hk(6, 1.0, 0.0, 0.0)
    evs = np.sort(np.concatenate([np.linalg.eigvalsh(h) for h in hk]))
    assert abs(evs.min() + evs.max()) < 1e-8      # PH symmetric
    lam = 0.05
    hk2, _ = kanemele.kanemele_cluster_hk(24, 1.0, 0.0, lam)
    gap = min(np.linalg.eigvalsh(h)[6] - np.linalg.eigvalsh(h)[5]
              for h in hk2)
    assert gap == pytest.approx(6 * np.sqrt(3) * lam, abs=1e-6)
    for h in hk2[:4]:
        np.testing.assert_allclose(h, h.conj().T, atol=1e-12)


def test_kagome_flat_band():
    """Kagome with hopping -ts: flat band at +2*ts (top), Dirac bands
    below; bandwidth of dispersive bands = 6*ts."""
    ts = 1.0
    hk, hloc = kagome.kagome_cluster_hk(24, ts)
    evs = np.stack([np.linalg.eigvalsh(h) for h in hk])
    # the flat band: max eigenvalue = 2*ts everywhere
    np.testing.assert_allclose(evs[:, 2], 2.0 * ts, atol=1e-10)
    assert evs.min() == pytest.approx(-4.0 * ts, abs=1e-6)
    # 4 NN bonds per site inside the infinite lattice
    from collections import Counter
    cnt = Counter()
    for (i, j, c) in kagome._BONDS:
        cnt[i] += 1
    assert all(v == 4 for v in cnt.values())


def test_ssh_gap():
    """SSH: gap = 2*t*|(1+d) - (1-d)| = 4*t*|d| at k = pi."""
    t, d = 1.0, 0.2
    hk, _ = ssh.ssh_cluster_hk(1, 128, t, d)
    evs = np.stack([np.linalg.eigvalsh(h) for h in hk])
    gap = (evs[:, 1] - evs[:, 0]).min()
    assert gap == pytest.approx(4 * t * abs(d), abs=1e-3)
    # full bandwidth: 2*t*(1+d) + ... top of band at 2t
    assert evs.max() == pytest.approx(2.0 * t, abs=1e-3)


def test_bhz_band_inversion():
    """BHZ single cell: gap at Gamma = 2|Mh - 4 ts| -> closes at Mh=4ts."""
    ts = 0.25
    for mh, gapw in ((0.5, None), (4 * ts, 0.0)):
        hk, _ = bhz.bhz_cluster_hk(1, 1, 24, mh, ts, 0.3)
        evs = np.stack([np.linalg.eigvalsh(h) for h in hk])
        gap = (evs[:, 2] - evs[:, 1]).min()
        if gapw is not None:
            assert gap == pytest.approx(gapw, abs=0.05)
        else:
            assert gap > 0.1


def test_sg77_hermitian_and_local_part():
    """sg77: every H(k) Hermitian; the k-average over the full BZ grid
    reduces to the cluster-local part (all inter-cell phases average out)."""
    from cdmft_lanc_ed_tpu.models import sg77
    from cdmft_lanc_ed_tpu.utils.reshape import nnn2lso
    ts = 1.0
    hk, hloc = sg77.sg77_cluster_hk(2, 6, ts)
    assert hk.shape == (6 ** 3, 8, 8)
    for h in hk[:10]:
        np.testing.assert_allclose(h, h.conj().T, atol=1e-12)
    np.testing.assert_allclose(hk.mean(axis=0), nnn2lso(hloc, 2, 2, 2),
                               atol=1e-12)
    # spin blocks identical (model is spin-diagonal and spin-symmetric)
    np.testing.assert_allclose(hk[:, :4, :4], hk[:, 4:, 4:], atol=1e-14)
    np.testing.assert_allclose(hk[:, :4, 4:], 0, atol=1e-14)


def test_bhz_alternated_hermitian_and_local():
    """Alternated (checkerboard) BHZ tiling: Hermitian H(k); k-average over
    the sqrt(2)-superlattice BZ = cluster-local part."""
    hk, hloc = bhz.bhz_alternated_hk(12, 1.0, 0.25, 0.3)
    from cdmft_lanc_ed_tpu.utils.reshape import nnn2lso
    assert hk.shape == (144, 8, 8)
    for h in hk[:8]:
        np.testing.assert_allclose(h, h.conj().T, atol=1e-12)
    np.testing.assert_allclose(hk.mean(axis=0), nnn2lso(hloc, 2, 2, 2),
                               atol=1e-12)


def test_edge_hk_periodized_matches_chain_builder():
    """The postprocessing ribbon Hamiltonian (layer-major ordering) is
    unitarily equivalent to bhz_chain_hk(nx=1, ny=Ly): identical spectra
    at every kx."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "drivers"))
    from cdn_bhz_postprocessing_edge import edge_hk_periodized
    ly, mh, ts, lam = 3, 1.0, 0.25, 0.3
    nk = 6
    hk_chain, _ = bhz.bhz_chain_hk(1, ly, nk, mh, ts, lam)
    for ik, k in enumerate(2 * np.pi * np.arange(nk) / nk):
        h_edge = edge_hk_periodized(k, ly, mh, ts, lam)
        np.testing.assert_allclose(h_edge, h_edge.conj().T, atol=1e-13)
        np.testing.assert_allclose(np.linalg.eigvalsh(h_edge),
                                   np.linalg.eigvalsh(hk_chain[ik]),
                                   atol=1e-12)
