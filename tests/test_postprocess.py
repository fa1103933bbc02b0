"""Topology postprocessing: Chern numbers of BHZ and Kane-Mele."""
import numpy as np
import pytest

from cdmft_lanc_ed_tpu import postprocess
from cdmft_lanc_ed_tpu.models import bhz, kanemele
from cdmft_lanc_ed_tpu.utils.reshape import nnn2lso


def bhz_hk_fn(mh, ts, lam):
    def hk(k):
        # single-cell BHZ: nx=ny=1
        h = bhz.bhz_cluster_hloc(1, 1, mh, ts, lam).copy()
        for s in range(2):
            h[0, 0, s, s] += bhz.t_x(ts, lam, s).conj().T * np.exp(1j * k[0]) \
                + bhz.t_x(ts, lam, s) * np.exp(-1j * k[0]) \
                + bhz.t_y(ts, lam).T * np.exp(1j * k[1]) \
                + bhz.t_y(ts, lam) * np.exp(-1j * k[1])
        return nnn2lso(h, 1, 2, 2)
    return hk


RECIP = 2 * np.pi * np.eye(2)


def test_bhz_spin_chern_topological_phase():
    """BHZ with 0 < Mh < 4 ts: C_up = +-1, C_dw = -+1, Z2 = 1."""
    hk = bhz_hk_fn(mh=0.5, ts=0.25, lam=0.3)
    c_up, c_dw, z2 = postprocess.spin_chern_z2(hk, RECIP, 12, 4, 1)
    assert abs(c_up) == pytest.approx(1.0, abs=1e-6)
    assert c_dw == pytest.approx(-c_up, abs=1e-6)
    assert z2 == 1


def test_bhz_spin_chern_trivial_phase():
    """Mh > 4 ts: trivial insulator, all Chern numbers 0."""
    hk = bhz_hk_fn(mh=2.0, ts=0.25, lam=0.3)
    c_up, c_dw, z2 = postprocess.spin_chern_z2(hk, RECIP, 12, 4, 1)
    assert c_up == pytest.approx(0.0, abs=1e-6)
    assert c_dw == pytest.approx(0.0, abs=1e-6)
    assert z2 == 0


def test_kanemele_z2():
    """Kane-Mele with lam != 0, M = 0: Z2 = 1 per spin sector (folded
    6-site cluster: 3 filled bands per spin carry C = +-1)."""
    b = 2 * np.pi * np.linalg.inv(kanemele.SUPERCELL).T

    def hk_spin(s):
        def h(k):
            full = kanemele.kanemele_hk_at(k, 1.0, 0.0, 0.1)
            return nnn2lso(full, 6, 2, 1)[s * 6:(s + 1) * 6,
                                          s * 6:(s + 1) * 6]
        return h

    c_up = postprocess.chern_number(hk_spin(0), b, 10, range(3))
    c_dw = postprocess.chern_number(hk_spin(1), b, 10, range(3))
    assert abs(c_up) == pytest.approx(1.0, abs=1e-6)
    assert c_dw == pytest.approx(-c_up, abs=1e-6)


def test_quasiparticle_weight_free():
    """Sigma = 0 => Z = 1."""
    from cdmft_lanc_ed_tpu import EDConfig
    cfg = EDConfig(nlat=1, norb=2, nspin=2, nbath=0, beta=50.0)
    s = np.zeros((1, 1, 2, 2, 2, 2, 4), complex)
    z = postprocess.quasiparticle_weight(cfg, s)
    np.testing.assert_allclose(z, 1.0)


def test_band_structure_shape():
    hk = bhz_hk_fn(0.5, 0.25, 0.3)
    kd, bands = postprocess.band_structure(
        hk, [np.zeros(2), np.array([np.pi, 0.0]),
             np.array([np.pi, np.pi])], npts=10)
    assert bands.shape == (21, 4)
    assert np.all(np.diff(kd) >= 0)
