"""Split-complex (re/im f64) device kernels — the TPU production path.

TPUs have no native complex128: on the target backend complex128 ops hang or
fail to compile, while float64 works (software-extended).  The hot kernels
therefore run on **split representation**: a complex vector is an f64 array
``x[2, ...]`` with x[0]=Re, x[1]=Im, and complex arithmetic is expanded into
real einsums — which is also what a good TPU kernel would do by hand (VPU
operates on real lanes; no wasted complex shuffles).

This module mirrors ops/spmv.py for the split representation.  The complex
path (ops/spmv.py) remains the CPU/test oracle.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .sector_ham import SectorOperator

jax.config.update("jax_enable_x64", True)


@jax.tree_util.register_pytree_node_class
@dataclass
class SplitSectorOp:
    """Sector Hamiltonian with complex data split into re/im f64 planes."""
    diag: jax.Array        # [DimDw, DimUp] f64 (H diagonal is real)
    up_cols: jax.Array     # [DimUp, Ku] i32
    up_vals: jax.Array     # [2, DimUp, Ku] f64
    dw_cols: jax.Array     # [DimDw, Kd] i32
    dw_vals: jax.Array     # [2, DimDw, Kd] f64
    nd_amp: jax.Array      # [2, T] f64
    nd_up_src: jax.Array   # [T, DimUp] i32
    nd_up_sgn: jax.Array   # [T, DimUp] i8
    nd_dw_src: jax.Array   # [T, DimDw] i32
    nd_dw_sgn: jax.Array   # [T, DimDw] i8

    def tree_flatten(self):
        return ((self.diag, self.up_cols, self.up_vals, self.dw_cols,
                 self.dw_vals, self.nd_amp, self.nd_up_src, self.nd_up_sgn,
                 self.nd_dw_src, self.nd_dw_sgn), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def dim(self):
        return self.diag.shape[0] * self.diag.shape[1]


def to_device_split(op: SectorOperator, f32: bool = False) -> SplitSectorOp:
    ftype = jnp.float32 if f32 else jnp.float64
    t = len(op.nd_terms)
    if t:
        amp = np.array([x.amp for x in op.nd_terms])
        nd_amp = np.stack([amp.real, amp.imag])
        nd_us = np.stack([x.up_src for x in op.nd_terms])
        nd_ug = np.stack([x.up_sgn for x in op.nd_terms])
        nd_ds = np.stack([x.dw_src for x in op.nd_terms])
        nd_dg = np.stack([x.dw_sgn for x in op.nd_terms])
    else:
        nd_amp = np.zeros((2, 0))
        nd_us = np.zeros((0, op.dim_up), np.int32)
        nd_ug = np.zeros((0, op.dim_up), np.int8)
        nd_ds = np.zeros((0, op.dim_dw), np.int32)
        nd_dg = np.zeros((0, op.dim_dw), np.int8)
    uv = op.h_up.vals
    dv = op.h_dw.vals
    return SplitSectorOp(
        diag=jnp.asarray(op.diag(), ftype),
        up_cols=jnp.asarray(op.h_up.cols, jnp.int32),
        up_vals=jnp.asarray(np.stack([uv.real, uv.imag]), ftype),
        dw_cols=jnp.asarray(op.h_dw.cols, jnp.int32),
        dw_vals=jnp.asarray(np.stack([dv.real, dv.imag]), ftype),
        nd_amp=jnp.asarray(nd_amp, ftype),
        nd_up_src=jnp.asarray(nd_us, jnp.int32),
        nd_up_sgn=jnp.asarray(nd_ug, jnp.int8),
        nd_dw_src=jnp.asarray(nd_ds, jnp.int32),
        nd_dw_sgn=jnp.asarray(nd_dg, jnp.int8),
    )


def _ell_split(cols, vr, vi, x):
    """Row-gather SpMM with complex (vr+i vi) matrix applied to x[2, R, C]
    along the leading row axis: out[2, R, C]."""
    g = x[:, cols, :]                       # [2, R, K, C]
    ar = jnp.einsum("rk,rkc->rc", vr, g[0]) \
        - jnp.einsum("rk,rkc->rc", vi, g[1])
    ai = jnp.einsum("rk,rkc->rc", vr, g[1]) \
        + jnp.einsum("rk,rkc->rc", vi, g[0])
    return jnp.stack([ar, ai])


def matvec_2d_split(op: SplitSectorOp, x: jax.Array) -> jax.Array:
    """H·x with x [2, DimDw, DimUp] f64 (re/im planes)."""
    out = op.diag[None] * x
    out = out + _ell_split(op.dw_cols, op.dw_vals[0], op.dw_vals[1], x)
    xt = x.transpose(0, 2, 1)
    yt = _ell_split(op.up_cols, op.up_vals[0], op.up_vals[1], xt)
    out = out + yt.transpose(0, 2, 1)
    if op.nd_amp.shape[1]:
        def one(ar, ai, usrc, usgn, dsrc, dsgn):
            g = x[:, jnp.maximum(dsrc, 0)][:, :, jnp.maximum(usrc, 0)]
            mask = (dsgn[:, None] * usgn[None, :]).astype(x.dtype)
            gr, gi = g[0] * mask, g[1] * mask
            return jnp.stack([ar * gr - ai * gi, ar * gi + ai * gr])
        contrib = jax.vmap(one)(op.nd_amp[0], op.nd_amp[1], op.nd_up_src,
                                op.nd_up_sgn, op.nd_dw_src, op.nd_dw_sgn)
        out = out + contrib.sum(axis=0)
    return out


def make_matvec_split(op: SplitSectorOp):
    """Flat split matvec: [2, dim] -> [2, dim] (jitted once per shape)."""
    dd, du = op.diag.shape

    @jax.jit
    def mv(x):
        return matvec_2d_split(op, x.reshape(2, dd, du)).reshape(2, -1)

    return mv


# -- representation converters (host boundary only) -------------------------

def split_of(v: np.ndarray) -> np.ndarray:
    """complex [.., n] -> f64 [.., 2, n] with the split axis SECOND-TO-LAST
    is avoided: we use leading [2, ...] convention: complex [n] -> [2, n];
    complex [B, n] -> [B, 2, n]."""
    v = np.asarray(v)
    return np.stack([v.real, v.imag], axis=-2) if v.ndim > 1 \
        else np.stack([v.real, v.imag])


def unsplit(x: np.ndarray) -> np.ndarray:
    """f64 [..., 2, n] or [2, n] -> complex."""
    x = np.asarray(x)
    return x[..., 0, :] + 1j * x[..., 1, :]
