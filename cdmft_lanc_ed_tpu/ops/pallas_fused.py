"""Fused Pallas TPU kernel for the tensor-product sector SpMV.

The sector Hamiltonian acts on the state vector viewed as a [DimDw, DimUp]
matrix X (reference: ED_HAMILTONIAN_SPARSE_HxV.f90 four-term split):

    H·x = diag ⊙ X + H_dw · X + X · H_upᵀ

The XLA path (ops/split.matvec_dense_real) emits the two matmuls as
separate MXU kernels whose [D, U] intermediates round-trip HBM before the
elementwise combine.  This kernel fuses all three terms into ONE pass: the
output tile lives in VMEM across the shared contraction loop and each X
tile feeds both matmuls, cutting HBM traffic from ~5 to ~3 array reads +
1 write per H·v — the hot op of every Lanczos iteration (ED_DIAG.f90:150,
ED_GF_NORMAL.f90:215 in the reference).

f32 only: this serves the mixed-precision Krylov stage (f32 thick-restart
Lanczos refined by an f64 Rayleigh-Ritz pass — see ops/lanczos.py).  The
f64 path stays on XLA matmuls: Mosaic rejects f64 `dot` on TPU (probed
UNIMPLEMENTED), and XLA's emulated-f64 matmul already sits at its roofline.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_PREC = jax.lax.Precision.HIGHEST
_TILES = (512, 256, 128)


def _tile(n: int, cap: int = 512) -> int:
    for t in _TILES:
        if t <= cap and n % t == 0:
            return t
    return 0


def supports(dd: int, du: int, dtype, cap: int = 512) -> bool:
    """True when the fused kernel can run this shape: f32 data and both
    dims tileable to MXU-aligned (multiple-of-128) blocks no larger than
    the probed VMEM-safe tile cap."""
    return (jnp.dtype(dtype) == jnp.float32
            and _tile(dd, cap) > 0 and _tile(du, cap) > 0)


def _dot(a, b):
    return jnp.dot(a, b, precision=_PREC,
                   preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "cap"))
def fused_real_matvec(diag: jax.Array, hdw: jax.Array, hupT: jax.Array,
                      x: jax.Array, interpret: bool = False,
                      cap: int = 0) -> jax.Array:
    """out = diag ⊙ x + hdw @ x + x @ hupT, one fused Pallas kernel.

    diag, x: [D, U];  hdw: [D, D];  hupT: [U, U] — all f32, D and U
    multiples of 128 (the shape-bucket ladder guarantees this for every
    production sector, ops/split.py _BUCKETS).  ``cap=0`` uses the probed
    VMEM-safe tile cap.
    """
    d, u = x.shape
    if cap == 0:
        cap = tile_cap() or 512     # direct/interpret calls: full ladder
    tm, tn = _tile(d, cap), _tile(u, cap)
    tk = 128
    nkd, nku = d // tk, u // tk
    nk = max(nkd, nku)

    def kernel(diag_ref, xij_ref, hdw_ref, xk_ref, xi_ref, hup_ref,
               out_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            out_ref[:] = diag_ref[:] * xij_ref[:]

        @pl.when(k < nkd)
        def _():
            out_ref[:] += _dot(hdw_ref[:], xk_ref[:])

        @pl.when(k < nku)
        def _():
            out_ref[:] += _dot(xi_ref[:], hup_ref[:])

    def clamp_d(k):
        return jnp.minimum(k, nkd - 1)

    def clamp_u(k):
        return jnp.minimum(k, nku - 1)

    return pl.pallas_call(
        kernel,
        grid=(d // tm, u // tn, nk),
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),   # diag
            pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),   # x (diag term)
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, clamp_d(k))),  # hdw
            pl.BlockSpec((tk, tn), lambda i, j, k: (clamp_d(k), j)),  # x rows
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, clamp_u(k))),  # x cols
            pl.BlockSpec((tk, tn), lambda i, j, k: (clamp_u(k), j)),  # hupT
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((d, u), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * d * u * (d + u) + 2 * d * u,
            bytes_accessed=4 * (d * u * 3 + d * d + u * u),
            transcendentals=0,
        ),
        interpret=interpret,
    )(diag, x, hdw, x, x, hupT)


@functools.partial(jax.jit, static_argnames=("interpret", "cap"))
def fused_pair_matvec(diag: jax.Array, hdw_r: jax.Array, hdw_i: jax.Array,
                      hdw_s: jax.Array, hupT_r: jax.Array,
                      hupT_i: jax.Array, hupT_s: jax.Array,
                      xr: jax.Array, xi: jax.Array,
                      interpret: bool = False, cap: int = 0):
    """Split-complex H·x fused into one Pallas kernel (the f32 twin of
    ops/split.matvec_dense_pair): both output planes accumulate in VMEM,
    all six Karatsuba MXU products per tile share one pass over (xr, xi).

      out_r = diag⊙xr + (P1−P2) + (Q1−Q2)
      out_i = diag⊙xi + (P3−P1−P2) + (Q3−Q1−Q2)
      P1 = hdw_r·xr, P2 = hdw_i·xi, P3 = hdw_s·(xr+xi)  (hdw_s = Re+Im)
      Q1 = xr·hupT_r, Q2 = xi·hupT_i, Q3 = (xr+xi)·hupT_s
    """
    d, u = xr.shape
    if cap == 0:
        cap = tile_cap() or 512     # direct/interpret calls: full ladder
    tm, tn = _tile(d, cap), _tile(u, cap)
    tk = 128
    nkd, nku = d // tk, u // tk
    nk = max(nkd, nku)

    def kernel(diag_ref, xr_ij, xi_ij, hr_ref, hi_ref, hs_ref,
               xrk_ref, xik_ref, xri_ref, xii_ref,
               ur_ref, ui_ref, us_ref, outr_ref, outi_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            outr_ref[:] = diag_ref[:] * xr_ij[:]
            outi_ref[:] = diag_ref[:] * xi_ij[:]

        @pl.when(k < nkd)
        def _():
            p1 = _dot(hr_ref[:], xrk_ref[:])
            p2 = _dot(hi_ref[:], xik_ref[:])
            p3 = _dot(hs_ref[:], xrk_ref[:] + xik_ref[:])
            outr_ref[:] += p1 - p2
            outi_ref[:] += p3 - p1 - p2

        @pl.when(k < nku)
        def _():
            q1 = _dot(xri_ref[:], ur_ref[:])
            q2 = _dot(xii_ref[:], ui_ref[:])
            q3 = _dot(xri_ref[:] + xii_ref[:], us_ref[:])
            outr_ref[:] += q1 - q2
            outi_ref[:] += q3 - q1 - q2

    def cd(k):
        return jnp.minimum(k, nkd - 1)

    def cu(k):
        return jnp.minimum(k, nku - 1)

    ij = pl.BlockSpec((tm, tn), lambda i, j, k: (i, j))
    hdw_spec = pl.BlockSpec((tm, tk), lambda i, j, k: (i, cd(k)))
    xk_spec = pl.BlockSpec((tk, tn), lambda i, j, k: (cd(k), j))
    xi_spec = pl.BlockSpec((tm, tk), lambda i, j, k: (i, cu(k)))
    hup_spec = pl.BlockSpec((tk, tn), lambda i, j, k: (cu(k), j))

    return pl.pallas_call(
        kernel,
        grid=(d // tm, u // tn, nk),
        in_specs=[ij, ij, ij, hdw_spec, hdw_spec, hdw_spec,
                  xk_spec, xk_spec, xi_spec, xi_spec,
                  hup_spec, hup_spec, hup_spec],
        out_specs=(ij, ij),
        out_shape=(jax.ShapeDtypeStruct((d, u), jnp.float32),
                   jax.ShapeDtypeStruct((d, u), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=6 * d * u * (d + u) + 4 * d * u,
            bytes_accessed=4 * (d * u * 5 + 3 * d * d + 3 * u * u),
            transcendentals=0,
        ),
        interpret=interpret,
    )(diag, xr, xi, hdw_r, hdw_i, hdw_s, xr, xi, xr, xi,
      hupT_r, hupT_i, hupT_s)


_DISABLED = bool(int(os.environ.get("CDMFT_NO_PALLAS", "0") or "0"))
# Default OFF (opt-in via CDMFT_PALLAS_FUSED=1): with the corrected timing
# harness (difference method + forced readback — the tunnel's
# block_until_ready can return early, see bench.py), the fused kernel
# measures ~184us/Hv on the flagship vs ~147us for the plain XLA matmul
# path (which sits at 0.98 of the bare-matmul envelope).  XLA's own
# matmul+epilogue fusion already captures the HBM saving; Mosaic's dot at
# these shapes is slower than XLA's.  The kernel is kept (correct,
# probed, tested) for backends where the balance differs.
_OPT_IN = bool(int(os.environ.get("CDMFT_PALLAS_FUSED", "0") or "0"))


@functools.lru_cache(maxsize=None)
def _probe_tile(t: int) -> bool:
    """Compile + run BOTH fused kernels at the exact (tm=tn=t) tile
    configuration — the VMEM worst case production can select.  The pair
    kernel at t=512 holds ~13 input blocks + 2 output tiles (~15 MB with
    double buffering), which can exceed VMEM on some chips: a per-shape
    Mosaic failure at solve time would otherwise surface as an uncaught
    exception inside the jitted Lanczos scan (ADVICE round 1)."""
    try:
        d = u = t
        rng = np.random.default_rng(0)
        diag = jnp.asarray(rng.normal(size=(d, u)), jnp.float32)
        hdw = jnp.asarray(rng.normal(size=(d, d)), jnp.float32)
        hup = jnp.asarray(rng.normal(size=(u, u)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(d, u)), jnp.float32)
        out = np.asarray(fused_real_matvec(diag, hdw, hup, x, cap=t))
        ref = np.asarray(diag) * np.asarray(x) \
            + np.asarray(hdw) @ np.asarray(x) \
            + np.asarray(x) @ np.asarray(hup)
        if not np.allclose(out, ref, rtol=1e-3, atol=1e-3):
            return False
        hdw_i = jnp.asarray(rng.normal(size=(d, d)), jnp.float32)
        hup_i = jnp.asarray(rng.normal(size=(u, u)), jnp.float32)
        xi = jnp.asarray(rng.normal(size=(d, u)), jnp.float32)
        outr, outi = fused_pair_matvec(diag, hdw, hdw_i, hdw + hdw_i,
                                       hup, hup_i, hup + hup_i, x, xi,
                                       cap=t)
        hc = np.asarray(hdw) + 1j * np.asarray(hdw_i)
        uc = np.asarray(hup) + 1j * np.asarray(hup_i)
        xc = np.asarray(x) + 1j * np.asarray(xi)
        refc = np.asarray(diag) * xc + hc @ xc + xc @ uc
        return bool(np.allclose(np.asarray(outr), refc.real, rtol=1e-2,
                                atol=1e-2)
                    and np.allclose(np.asarray(outi), refc.imag, rtol=1e-2,
                                    atol=1e-2))
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def tile_cap() -> int:
    """Largest probe-validated tile size (0 = Pallas disabled).  Probing
    descends the tile ladder so an over-VMEM 512 config degrades the
    dispatch to 256/128 tiles instead of disabling Pallas outright."""
    if _DISABLED or not _OPT_IN or jax.default_backend() != "tpu":
        return 0
    for t in _TILES:
        if _probe_tile(t):
            return t
    return 0


def pallas_ok() -> bool:
    """Back-compat boolean probe."""
    return tile_cap() > 0


def should_use(shape, dtype) -> bool:
    """Trace-time dispatch decision for ops/split.matvec_dense_real."""
    dd, du = shape
    cap = tile_cap()
    return cap > 0 and supports(dd, du, dtype, cap)
