#!/usr/bin/env python
"""Postprocessing driver: BHZ ribbon (edge geometry) spectral function.

Counterpart of /root/reference/drivers/cdn_bhz_postprocessing_edge.f90:
reads the per-layer (inequivalent-site) impurity self-energies of a
finished BHZ-edge CDMFT run (Ly layers, Nx-site cluster per layer,
optional left-right mirror symmetry), periodizes each layer's Sigma along
x with the cumulant scheme keeping the layer's Mh term inside the
cumulant (periodize_sigma_block_real, :553-605), assembles the
layer-block-diagonal ribbon Sigma, and writes the momentum-resolved
spectral map A(kx, w) = log(|det G(kx, w)|/pi/Niso) along kx: 0 -> 2pi
(get_Akw, :611-674) -> Akw_real_nso.dat.
"""
import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdmft_lanc_ed_tpu import read_input
from cdmft_lanc_ed_tpu import io as edio
from cdmft_lanc_ed_tpu.models.bhz import t_m, t_x, t_y
from cdmft_lanc_ed_tpu.periodize import periodize_m_scheme


def edge_hk_periodized(kx: float, ly: int, mh: float, ts: float,
                       lam: float) -> np.ndarray:
    """x-periodized (1-site cell), y-open BHZ ribbon Hamiltonian
    [Ly*4, Ly*4] (bhz_edge_model_periodized, :528-547): per-layer block
    t_m + t_x e^{ikx} + t_x^H e^{-ikx}, inter-layer t_y blocks."""
    nso = 4
    h = np.zeros((ly, ly, nso, nso), np.complex128)
    for iy in range(ly):
        blk = np.zeros((nso, nso), np.complex128)
        for s in range(2):
            sl = slice(2 * s, 2 * s + 2)
            blk[sl, sl] = (t_m(mh) + t_x(ts, lam, s) * np.exp(1j * kx)
                           + t_x(ts, lam, s).conj().T * np.exp(-1j * kx))
        h[iy, iy] = blk
        if iy + 1 < ly:
            for s in range(2):
                sl = slice(2 * s, 2 * s + 2)
                h[iy + 1, iy][sl, sl] = t_y(ts, lam)
                h[iy, iy + 1][sl, sl] = t_y(ts, lam).T
    return h.transpose(0, 2, 1, 3).reshape(ly * nso, ly * nso)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="inputED.conf")
    ap.add_argument("--nx", type=int, default=2,
                    help="cluster sites along x per layer")
    ap.add_argument("--ly", type=int, default=2,
                    help="ribbon width (number of layers)")
    ap.add_argument("--lrsym", action="store_true", default=True)
    ap.add_argument("--no-lrsym", dest="lrsym", action="store_false")
    ap.add_argument("--nkpath", type=int, default=100)
    ap.add_argument("--ts", type=float, default=0.25)
    ap.add_argument("--mh", type=float, default=1.0)
    ap.add_argument("--lam", type=float, default=0.3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    nineq = args.ly // 2 if args.lrsym else args.ly
    if args.lrsym and args.ly % 2:
        sys.exit("LRSYM requires even Ly")
    cfg = read_input(args.input, nlat=args.nx, norb=2, nspin=2)
    print(f"BHZ edge postprocessing: Nx={args.nx}, Ly={args.ly}, "
          f"Nineq={nineq}")
    wr = np.linspace(cfg.wini, cfg.wfin, cfg.lreal)
    z = wr + 1j * cfg.eps
    nso = 4
    niso = args.ly * nso

    # per-layer M-scheme periodized Sigma block, with the layer Mh term
    # carried inside the cumulant and subtracted after periodization
    hmh_nnn = np.zeros((args.nx, args.nx, 2, 2, 2, 2), np.complex128)
    for il in range(args.nx):
        for s in range(2):
            hmh_nnn[il, il, s, s] = t_m(args.mh)
    hmh_per = np.kron(np.eye(2), t_m(args.mh))
    cell = np.arange(args.nx, dtype=float)
    sub = np.zeros(args.nx, int)

    def layer_sigma_per(sreal_nnn, kx):
        s_eff = sreal_nnn + hmh_nnn[..., None]
        _, s_per = periodize_m_scheme(cfg, [kx], cell, sub, 1, s_eff, z)
        return s_per - hmh_per[..., None]          # [nso, nso, L]

    # read per-inequivalent-layer self-energies (ed_read_impSigma(Nineq))
    sreal_ineq = []
    for ineq in range(nineq):
        ci = dataclasses.replace(cfg,
                                 ed_file_suffix=f"_ineq{ineq + 1:04d}")
        _, sr = edio.read_impsigma(ci)
        if not np.any(sr):
            print(f"WARNING: no impSigma*_ineq{ineq+1:04d}*realw*.ed in "
                  f"{cfg.work_dir}", file=sys.stderr)
        sreal_ineq.append(sr)

    def ineq_of(layer):                            # isites2ineq, :328-333
        return layer if layer < nineq or not args.lrsym \
            else args.ly - layer - 1

    ks = 2.0 * np.pi * np.arange(2 * args.nkpath) / (2 * args.nkpath)
    ak = np.empty((len(ks), cfg.lreal))
    for ik, kx in enumerate(ks):
        sig = np.zeros((cfg.lreal, niso, niso), np.complex128)
        done = {}
        for layer in range(args.ly):
            ineq = ineq_of(layer)
            if ineq not in done:
                done[ineq] = np.moveaxis(
                    layer_sigma_per(sreal_ineq[ineq], kx), -1, 0)
            sl = slice(layer * nso, (layer + 1) * nso)
            sig[:, sl, sl] = done[ineq]
        a = (wr[:, None, None] + cfg.xmu) * np.eye(niso) \
            - edge_hk_periodized(kx, args.ly, args.mh, args.ts,
                                 args.lam)[None] - sig
        gk = np.linalg.inv(a)
        ak[ik] = np.log(np.abs(np.linalg.det(gk)) / np.pi / niso)
    out = os.path.join(cfg.work_dir, "Akw_real_nso.dat")
    with open(out, "w") as fh:
        for ik, kx in enumerate(ks):
            for iw, w in enumerate(wr):
                fh.write(f"{kx:.9e} {w:.9e} {ak[ik, iw]:.9e}\n")
            fh.write("\n")
    print(f"A(k,w) map written to {out}")


if __name__ == "__main__":
    main()
