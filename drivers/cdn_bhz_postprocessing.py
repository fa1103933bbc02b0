#!/usr/bin/env python
"""BHZ postprocessing: periodized Sigma, topological Hamiltonian, Z2.

Counterpart of /root/reference/drivers/cdn_bhz_postprocessing.f90: reads a
converged self-energy (impSigma files produced by cdn_bhz_2d.py), builds
periodized quantities, the topological Hamiltonian
H_top(k) = H_per(k) + Re Sigma_per(k, w->0), band structures along
Gamma-X-M-Gamma, quasiparticle weights, and the interacting Z2 invariant.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdmft_lanc_ed_tpu import read_input, postprocess
from cdmft_lanc_ed_tpu import io as ed_io
from cdmft_lanc_ed_tpu.models.bhz import bhz_cluster_hk, t_m, t_x, t_y, \
    bhz_cluster_hloc
from cdmft_lanc_ed_tpu.periodize import build_sigma_g_scheme, \
    cluster_coords, periodize_sigma_scheme
from cdmft_lanc_ed_tpu.utils.reshape import nn2so, nnn2lso


def single_cell_hk(mh, ts, lam):
    def hk(k):
        h = bhz_cluster_hloc(1, 1, mh, ts, lam).copy()
        for s in range(2):
            h[0, 0, s, s] += t_x(ts, lam, s).conj().T * np.exp(1j * k[0]) \
                + t_x(ts, lam, s) * np.exp(-1j * k[0]) \
                + t_y(ts, lam).T * np.exp(1j * k[1]) \
                + t_y(ts, lam) * np.exp(-1j * k[1])
        return nnn2lso(h, 1, 2, 2)
    return hk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="inputBHZ.conf")
    ap.add_argument("--nx", type=int, default=2)
    ap.add_argument("--ny", type=int, default=2)
    ap.add_argument("--ts", type=float, default=0.25)
    ap.add_argument("--mh", type=float, default=1.0)
    ap.add_argument("--lam", type=float, default=0.3)
    ap.add_argument("--scheme", choices=["sigma", "g"], default="sigma")
    ap.add_argument("--nk-chern", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    nlat = args.nx * args.ny
    cfg = read_input(args.input, nlat=nlat, norb=2, nspin=2,
                     bath_type="general")
    smats, sreal = ed_io.read_impsigma(cfg)
    if np.abs(smats).max() == 0.0:
        print("WARNING: no impSigma files found in work_dir; "
              "using Sigma=0 (non-interacting postprocessing)")

    coords = cluster_coords(nlat, args.nx, args.ny)
    hk_unper, _ = bhz_cluster_hk(args.nx, args.ny, 1, args.mh, args.ts,
                                 args.lam)
    hk_per_fn = single_cell_hk(args.mh, args.ts, args.lam)
    wm = np.pi / cfg.beta * (2 * np.arange(min(8, cfg.lmats)) + 1)

    # quasiparticle weight from the cluster Sigma
    z = postprocess.quasiparticle_weight(cfg, smats)
    print("Z (diagonal lso):", z)

    def sigma0_of_k(k):
        if args.scheme == "sigma":
            _, s_per = periodize_sigma_scheme(cfg, k, coords, hk_per_fn(k),
                                              smats[..., :len(wm)], 1j * wm)
        else:
            _, s_per = build_sigma_g_scheme(cfg, k, coords, hk_unper[0],
                                            hk_per_fn(k),
                                            smats[..., :len(wm)], 1j * wm)
        return nn2so(s_per[..., 0], cfg.nspin, cfg.norb)

    htop = postprocess.topological_hamiltonian(hk_per_fn, sigma0_of_k)

    # band structure along Gamma-X-M-Gamma
    kpath = [np.zeros(2), np.array([np.pi, 0]), np.array([np.pi, np.pi]),
             np.zeros(2)]
    kd, bands = postprocess.band_structure(htop, kpath, npts=30)
    out = os.path.join(cfg.work_dir, "topological_bands.ed")
    np.savetxt(out, np.column_stack([kd, bands]))
    print(f"bands written to {out}; gap at half filling: "
          f"{(bands[:, 2] - bands[:, 1]).min():.6f}")

    # interacting Z2 from the topological Hamiltonian
    recip = 2 * np.pi * np.eye(2)
    c_up, c_dw, z2 = postprocess.spin_chern_z2(htop, recip, args.nk_chern,
                                               4, 1)
    print(f"C_up={c_up:+.4f} C_dw={c_dw:+.4f}  Z2={z2}")


if __name__ == "__main__":
    main()
