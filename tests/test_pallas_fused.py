"""Fused Pallas SpMV kernel vs the XLA dense-factor oracle.

Runs in Pallas interpreter mode on the CPU test mesh; the compiled TPU
path is probed at runtime by ops/pallas_fused.pallas_ok() and exercised by
bench.py on the real chip.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cdmft_lanc_ed_tpu.ops import pallas_fused, sector_ham, split


def _rand_problem(rng, d, u):
    diag = rng.normal(size=(d, u)).astype(np.float32)
    hdw = rng.normal(size=(d, d)).astype(np.float32)
    hdw = (hdw + hdw.T) / 2
    hup = rng.normal(size=(u, u)).astype(np.float32)
    hup = (hup + hup.T) / 2
    x = rng.normal(size=(d, u)).astype(np.float32)
    return diag, hdw, hup, x


@pytest.mark.parametrize("d,u", [(128, 128), (256, 128), (128, 256),
                                 (384, 256), (512, 512)])
def test_fused_matches_dense(d, u):
    rng = np.random.default_rng(7)
    diag, hdw, hup, x = _rand_problem(rng, d, u)
    out = np.asarray(pallas_fused.fused_real_matvec(
        jnp.asarray(diag), jnp.asarray(hdw), jnp.asarray(hup),
        jnp.asarray(x), interpret=True))
    ref = diag * x + hdw @ x + x @ hup
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_fused_vmap_batched():
    """vmap over the kernel = the sector-parallel batched dispatch path."""
    import jax
    rng = np.random.default_rng(3)
    b, d, u = 3, 128, 256
    diag = rng.normal(size=(b, d, u)).astype(np.float32)
    hdw = rng.normal(size=(b, d, d)).astype(np.float32)
    hup = rng.normal(size=(b, u, u)).astype(np.float32)
    x = rng.normal(size=(b, d, u)).astype(np.float32)
    fn = jax.vmap(lambda dg, a, c, v: pallas_fused.fused_real_matvec(
        dg, a, c, v, interpret=True))
    out = np.asarray(fn(jnp.asarray(diag), jnp.asarray(hdw),
                        jnp.asarray(hup), jnp.asarray(x)))
    for i in range(b):
        ref = diag[i] * x[i] + hdw[i] @ x[i] + x[i] @ hup[i]
        np.testing.assert_allclose(out[i], ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("d,u", [(128, 128), (256, 128), (128, 384)])
def test_fused_pair_matches_complex(d, u):
    rng = np.random.default_rng(11)
    diag = rng.normal(size=(d, u)).astype(np.float32)
    hr = rng.normal(size=(d, d)).astype(np.float32)
    hi = rng.normal(size=(d, d)).astype(np.float32)
    ur = rng.normal(size=(u, u)).astype(np.float32)
    ui = rng.normal(size=(u, u)).astype(np.float32)
    xr = rng.normal(size=(d, u)).astype(np.float32)
    xi = rng.normal(size=(d, u)).astype(np.float32)
    outr, outi = pallas_fused.fused_pair_matvec(
        jnp.asarray(diag), jnp.asarray(hr), jnp.asarray(hi),
        jnp.asarray(hr + hi), jnp.asarray(ur), jnp.asarray(ui),
        jnp.asarray(ur + ui), jnp.asarray(xr), jnp.asarray(xi),
        interpret=True)
    hc = hr + 1j * hi
    uc = ur + 1j * ui
    xc = xr + 1j * xi
    ref = diag * xc + hc @ xc + xc @ uc
    np.testing.assert_allclose(np.asarray(outr), ref.real, rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(outi), ref.imag, rtol=1e-3,
                               atol=1e-3)


def test_supports_shape_gate():
    assert pallas_fused.supports(1024, 1024, jnp.float32)
    assert pallas_fused.supports(384, 128, jnp.float32)
    assert not pallas_fused.supports(1024, 1024, jnp.float64)
    assert not pallas_fused.supports(192, 128, jnp.float32)  # 192 % 128 != 0
    assert not pallas_fused.supports(64, 128, jnp.float32)


def test_fused_on_physical_sector():
    """Against the real sector operator: plaquette + 1 bath replica, f32
    plane, compared to the XLA matvec_dense_real on the same operator."""
    import __graft_entry__ as ge
    _, op = ge._plaquette_bath_op(nbath=2, nup=3, ndw=4)
    assert split.op_is_real(op)
    ddp, dup = split._bucket(op.dim_dw), split._bucket(op.dim_up)
    if ddp % 128 or dup % 128:
        pytest.skip("bucket not 128-aligned for this tiny sector")
    dev = split.to_device_dense_real(op, pad_to=(ddp, dup),
                                     dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(ddp, dup)).astype(np.float32)
    out = np.asarray(pallas_fused.fused_real_matvec(
        dev.diag, dev.hdw, dev.hupT, jnp.asarray(x), interpret=True))
    ref = np.asarray(split.matvec_dense_real(dev, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
