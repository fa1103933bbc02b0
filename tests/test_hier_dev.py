"""Hierarchical A/B-factor device kit (ops/hier_dev.py): the production
Ns>=16 apply — dense within-half chain + cross-hop tiles — checked
against dense assembly on real, complex, and batched paths, plus the
kit dispatch rules (nd terms and non-one-body factors fall back to the
tile kit of ops/large.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cdmft_lanc_ed_tpu.ops import hier, hier_dev, large

from test_large_sector import _hubbard_op


@pytest.mark.parametrize("nbath", [1, 2])
def test_hier_real_matches_dense(nbath):
    _, op = _hubbard_op(2, 2, nbath=nbath)
    kit = hier_dev.build_real_padded_hier(op, dtype=jnp.float64)
    assert kit is not None
    dev, dim_p, embed, extract = kit
    rng = np.random.default_rng(0)
    v = rng.normal(size=op.dim)
    dh = op.to_dense()
    w = extract(np.asarray(hier_dev.apply_hier_real_flat(
        dev, jnp.asarray(embed(v)))))
    np.testing.assert_allclose(w, dh @ v, rtol=1e-11, atol=1e-11)
    # batched applier == loop of singles
    vb = rng.normal(size=(3, op.dim))
    wb = extract(np.asarray(hier_dev.apply_hier_real_flat_batched(
        dev, jnp.asarray(embed(vb)))))
    np.testing.assert_allclose(wb, vb @ dh.T, rtol=1e-10, atol=1e-10)


def test_hier_pair_matches_dense_complex():
    _, op = _hubbard_op(2, 2, nbath=1, complex_h=True)
    kit = hier_dev.build_pair_padded_hier(op, dtype=jnp.float64)
    assert kit is not None
    dev, real, dim_p, embed, extract = kit
    assert not real
    rng = np.random.default_rng(1)
    v = rng.normal(size=op.dim) + 1j * rng.normal(size=op.dim)
    dh = op.to_dense()
    wr, wi = hier_dev.apply_hier_pair_flat(
        dev, jnp.asarray(embed(v.real)), jnp.asarray(embed(v.imag)))
    w = extract(np.asarray(wr)) + 1j * extract(np.asarray(wi))
    np.testing.assert_allclose(w, dh @ v, rtol=1e-11, atol=1e-11)
    xb = rng.normal(size=(3, op.dim)) + 1j * rng.normal(size=(3, op.dim))
    yr, yi = hier_dev.apply_hier_pair_flat_batched(
        dev, jnp.asarray(embed(xb.real)), jnp.asarray(embed(xb.imag)))
    wb = extract(np.asarray(yr)) + 1j * extract(np.asarray(yi))
    np.testing.assert_allclose(wb, xb @ dh.T, rtol=1e-10, atol=1e-10)


def test_hier_realpair_planes_never_mix():
    _, op = _hubbard_op(2, 2, nbath=1)
    dev, dim_p, embed, extract = hier_dev.build_real_padded_hier(
        op, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    v = rng.normal(size=op.dim) + 1j * rng.normal(size=op.dim)
    wr, wi = hier_dev.apply_hier_realpair_flat(
        dev, jnp.asarray(embed(v.real)), jnp.asarray(embed(v.imag)))
    w = extract(np.asarray(wr)) + 1j * extract(np.asarray(wi))
    np.testing.assert_allclose(w, op.to_dense() @ v, rtol=1e-10,
                               atol=1e-10)


def test_hier_refuses_nd_terms_and_falls_back():
    _, op = _hubbard_op(2, 2, nbath=1, jh=0.3)
    assert op.nd_terms
    assert hier_dev.build_real_padded_hier(op) is None
    assert hier_dev.build_pair_padded_hier(op) is None
    # the tile kit still serves it
    assert large.build_real_padded_large(op) is not None


def test_terms_from_ell_rejects_non_one_body():
    from cdmft_lanc_ed_tpu.ops.sector_ham import EllMatrix
    from cdmft_lanc_ed_tpu.utils import fock
    states = np.asarray(fock.sector_states(4, 2), np.int64)
    n = len(states)
    # a two-particle-looking matrix: connect states differing in 4 bits
    cols = np.zeros((n, 1), np.int32)
    vals = np.zeros((n, 1), complex)
    cols[0, 0] = n - 1
    vals[0, 0] = 1.0     # 0b0011 -> 0b1100: 4 differing bits
    ell = EllMatrix(cols, vals, n, 1)
    assert hier.terms_from_ell(states, ell) is None


def test_embed_extract_roundtrip_device_and_host():
    _, op = _hubbard_op(3, 2, nbath=1)
    kit = hier_dev.build_real_padded_hier(op, dtype=jnp.float64)
    dev, dim_p, embed, extract = kit
    rng = np.random.default_rng(3)
    v = rng.normal(size=(2, op.dim))
    np.testing.assert_allclose(extract(embed(v)), v)
    vd = jnp.asarray(v)
    np.testing.assert_allclose(np.asarray(extract(embed(vd))), v)
    # padding modes are zero after embed
    e = embed(v[0])
    assert e.shape[0] == dim_p
    assert np.count_nonzero(e) <= op.dim


def test_hier_f32_grade():
    _, op = _hubbard_op(3, 3, nbath=2)
    dev, dim_p, embed, extract = hier_dev.build_real_padded_hier(
        op, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    v = rng.normal(size=op.dim)
    w = extract(np.asarray(hier_dev.apply_hier_real_flat(
        dev, jnp.asarray(embed(v), jnp.float32))))
    dh = op.to_dense()
    rel = np.linalg.norm(w - dh @ v) / np.linalg.norm(dh @ v)
    assert rel < 1e-5


def test_diag_dispatch_prefers_hier(monkeypatch):
    """With DENSE_FACTOR_MAX forced tiny, the large-sector branch must
    route a plain-Hubbard sector through the hier kit (tracked via a
    build counter)."""
    from cdmft_lanc_ed_tpu.ops import split
    calls = {"hier": 0}
    orig = hier_dev.build_real_padded_hier

    def spy(op, dtype=jnp.float32, reuse=None):
        r = orig(op, dtype=dtype, reuse=reuse)
        if r is not None:
            calls["hier"] += 1
        return r

    monkeypatch.setenv("CDMFT_SPLIT_BACKEND", "1")
    monkeypatch.setattr(split, "DENSE_FACTOR_MAX", 2)
    monkeypatch.setattr(hier_dev, "build_real_padded_hier", spy)
    from cdmft_lanc_ed_tpu import EDConfig, EDSolver
    h = np.zeros((2, 2, 1, 1, 1, 1), complex)
    h[0, 1, 0, 0, 0, 0] = h[1, 0, 0, 0, 0, 0] = -1.0
    cfg = EDConfig(nlat=2, norb=1, nspin=1, nbath=1, uloc=[2.0],
                   lmats=8, lreal=8, ed_verbose=0,
                   lanc_dim_threshold=4)
    s = EDSolver(cfg)
    s.set_hbath(np.eye(2).reshape(2, 2, 1, 1, 1, 1, 1),
                np.full((1, 1), 0.3))
    b = s.init_solver()
    s.solve(b, h)
    assert calls["hier"] > 0
