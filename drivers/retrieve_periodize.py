#!/usr/bin/env python
"""Retrieve a saved self-energy and periodize along a k-path.

Counterpart of /root/reference/drivers/retrieve_periodize_xy.f90 /
cdn_ssh_postprocessing.f90: postprocessing-only program — no solve.
Reads impSigma files from work_dir, computes the k-resolved periodized
G/Sigma (G-scheme or Sigma-scheme) on Matsubara and real axes and the
k-summed local GF, writes text files.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdmft_lanc_ed_tpu import read_input
from cdmft_lanc_ed_tpu import io as ed_io
from cdmft_lanc_ed_tpu.lattice import dmft_gloc_realaxis
from cdmft_lanc_ed_tpu.models.hubbard import square_cluster_hk
from cdmft_lanc_ed_tpu.periodize import build_sigma_g_scheme, \
    cluster_coords, periodize_sigma_scheme


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="inputHM2D.conf")
    ap.add_argument("--nx", type=int, default=2)
    ap.add_argument("--ny", type=int, default=2)
    ap.add_argument("--nk", type=int, default=16)
    ap.add_argument("--ts", type=float, default=1.0)
    ap.add_argument("--scheme", choices=["sigma", "g"], default="g")
    ap.add_argument("--nkpath", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    nlat = args.nx * args.ny
    cfg = read_input(args.input, nlat=nlat)
    smats, sreal = ed_io.read_impsigma(cfg)
    if np.abs(smats).max() == 0:
        print("WARNING: no impSigma found; using Sigma=0")

    hk, hloc = square_cluster_hk(args.nx, args.ny, args.nk, args.ts,
                                 cfg.nspin, cfg.norb)
    # local lattice GF on the real axis (spectral function input)
    greal_loc = dmft_gloc_realaxis(cfg, hk, sreal)
    wr = np.linspace(cfg.wini, cfg.wfin, cfg.lreal)
    ed_io.splot(os.path.join(cfg.work_dir, "Gloc_realw.ed"), wr,
                greal_loc[0, 0, 0, 0, 0, 0])

    # periodized Sigma along Gamma-X-M-Gamma
    coords = cluster_coords(nlat, args.nx, args.ny)
    wm = np.pi / cfg.beta * (2 * np.arange(min(32, cfg.lmats)) + 1)
    kpts = []
    segs = [(np.zeros(2), np.array([np.pi, 0])),
            (np.array([np.pi, 0]), np.array([np.pi, np.pi])),
            (np.array([np.pi, np.pi]), np.zeros(2))]
    for a, b in segs:
        for t in np.linspace(0, 1, args.nkpath, endpoint=False):
            kpts.append(a + t * (b - a))
    out = []
    hk1, _ = square_cluster_hk(1, 1, 1, args.ts, cfg.nspin, cfg.norb)
    for k in kpts:
        eps_k = -2 * args.ts * (np.cos(k[0]) + np.cos(k[1]))
        hk_per = np.full((cfg.nspin * cfg.norb, cfg.nspin * cfg.norb), 0.0,
                         complex)
        np.fill_diagonal(hk_per, eps_k)
        if args.scheme == "sigma":
            g_per, s_per = periodize_sigma_scheme(
                cfg, k, coords, hk_per, smats[..., :len(wm)], 1j * wm)
        else:
            g_per, s_per = build_sigma_g_scheme(
                cfg, k, coords, hk[0], hk_per, smats[..., :len(wm)],
                1j * wm)
        out.append([k[0], k[1], s_per[0, 0, 0, 0, 0].real,
                    s_per[0, 0, 0, 0, 0].imag,
                    g_per[0, 0, 0, 0, 0].real, g_per[0, 0, 0, 0, 0].imag])
    np.savetxt(os.path.join(cfg.work_dir,
                            f"periodized_{args.scheme}scheme_kpath.ed"),
               np.asarray(out))
    print(f"wrote Gloc_realw.ed and periodized_{args.scheme}scheme_kpath.ed "
          f"({len(kpts)} k-points)")


if __name__ == "__main__":
    main()
