#!/usr/bin/env python
"""CDMFT driver: BHZ ribbon with per-layer inequivalent clusters.

Counterpart of /root/reference/drivers/cdn_bhz_2d_edge.f90: an Ly-layer
ribbon (x-periodic, open y), each layer an Nx-site cluster solved as an
inequivalent impurity problem (real-space CDMFT via the LatticeSolver),
with optional left-right mirror symmetry halving the number of solved
layers (lrsym, :76-82).  The lattice G is the full ribbon k-sum with the
layer-block-diagonal self-energy (:146-152); self-consistency and the
bath fit run per layer.
"""
import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdmft_lanc_ed_tpu import read_input
from cdmft_lanc_ed_tpu.lattice import (ConvergenceCheck,
                                       dmft_gloc_matsubara,
                                       dmft_self_consistency)
from cdmft_lanc_ed_tpu.lattice_solver import LatticeSolver
from cdmft_lanc_ed_tpu.models.bhz import (bhz_bath_basis, bhz_chain_hk,
                                          bhz_cluster_hloc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="inputED.conf")
    ap.add_argument("--nx", type=int, default=2,
                    help="cluster sites along x per layer")
    ap.add_argument("--ly", type=int, default=2,
                    help="ribbon width (layers along open y)")
    ap.add_argument("--lrsym", action="store_true", default=True)
    ap.add_argument("--no-lrsym", dest="lrsym", action="store_false")
    ap.add_argument("--nk", type=int, default=32)
    ap.add_argument("--ts", type=float, default=0.25)
    ap.add_argument("--mh", type=float, default=1.0)
    ap.add_argument("--lam", type=float, default=0.3)
    ap.add_argument("--wmixing", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    nx, ly = args.nx, args.ly
    if args.lrsym and ly % 2:
        sys.exit("LRSYM requires even Ly")
    nineq = ly // 2 if args.lrsym else ly
    cfg = read_input(args.input, nlat=nx, norb=2, nspin=2,
                     bath_type="replica")
    print(f"CDMFT BHZ edge: Nx={nx} x Ly={ly} ribbon, Nineq={nineq}, "
          f"Nbath={cfg.nbath}")

    # ribbon H(kx): x-periodic Nx-cluster per layer + t_y between layers
    hk, _ = bhz_chain_hk(nx, ly, args.nk, args.mh, args.ts, args.lam)
    hloc_layer = bhz_cluster_hloc(nx, 1, args.mh, args.ts, args.lam)
    hloc_ineq = np.broadcast_to(hloc_layer,
                                (nineq,) + hloc_layer.shape).copy()
    cfg_big = dataclasses.replace(cfg, nlat=nx * ly)

    def ineq_of(layer):                           # isites2ineq
        return layer if layer < nineq or not args.lrsym \
            else ly - layer - 1

    ls = LatticeSolver(cfg, nineq=nineq)
    basis, lam0 = bhz_bath_basis(nx, 1, args.mh, args.ts, args.lam)
    ls.set_hbath(basis, np.tile(lam0, (nineq, cfg.nbath, 1)))
    baths = ls.init_solver()
    baths_prev = None

    conv = ConvergenceCheck(cfg.dmft_error, cfg.nsuccess)
    nlat_big = nx * ly
    for iloop in range(1, cfg.nloop + 1):
        print(f"DMFT loop {iloop}/{cfg.nloop}", flush=True)
        ls.solve(baths, hloc_ineq)
        smats_ineq = ls.sigma_matsubara()         # [nineq, nx, nx, ...]

        # layer-block-diagonal ribbon Sigma (site i = ix + layer*nx)
        smats_big = np.zeros((nlat_big, nlat_big) + smats_ineq.shape[3:],
                             np.complex128)
        for layer in range(ly):
            sl = slice(layer * nx, (layer + 1) * nx)
            smats_big[sl, sl] = smats_ineq[ineq_of(layer)]
        gloc_big = dmft_gloc_matsubara(cfg_big, hk, smats_big)

        # per-inequivalent-layer self-consistency
        weiss_ineq = np.empty_like(smats_ineq)
        for ineq in range(nineq):
            sl = slice(ineq * nx, (ineq + 1) * nx)
            weiss_ineq[ineq] = dmft_self_consistency(
                cfg, gloc_big[sl, sl], smats_ineq[ineq],
                hloc_ineq[ineq], scheme=cfg.cg_scheme)

        new_baths = ls.fit(weiss_ineq, baths, hloc_ineq=hloc_ineq)
        if baths_prev is not None:
            new_baths = args.wmixing * new_baths \
                + (1 - args.wmixing) * baths_prev
        baths_prev = new_baths.copy()
        baths = new_baths

        done = conv(weiss_ineq.ravel())
        print(f"  error={conv.error:.3e} "
              f"dens={ls.dens().sum():.6f}", flush=True)
        if done:
            break

    print(f"converged={done} after {iloop} loops (err={conv.error:.3e})")
    print("dens per layer =", ls.dens().reshape(nineq, -1).sum(axis=1))
    print("docc =", ls.docc().ravel())


if __name__ == "__main__":
    main()
