#!/usr/bin/env python
"""CDMFT driver: BHZ chain (1d), Nx-site cluster.

Counterpart of /root/reference/drivers/cdn_bhz_1d.f90 (Ny=1, x-periodic).
With --ny > 1 this becomes the ribbon/edge geometry of
cdn_bhz_2d_edge.f90 (x-periodic strip, open y boundaries).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdmft_lanc_ed_tpu import EDSolver, read_input
from cdmft_lanc_ed_tpu.dmft_loop import run_dmft_loop
from cdmft_lanc_ed_tpu.models.bhz import bhz_bath_basis, bhz_chain_hk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="inputBHZ1D.conf")
    ap.add_argument("--nx", type=int, default=2)
    ap.add_argument("--ny", type=int, default=1,
                    help=">1 gives the edge/ribbon geometry")
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

    nlat = args.nx * args.ny
    cfg = read_input(args.input, nlat=nlat, norb=2, nspin=2,
                     bath_type="general")
    geom = "chain" if args.ny == 1 else f"ribbon(ny={args.ny})"
    print(f"CDMFT BHZ {geom}: Nx={args.nx}, Nbath={cfg.nbath}, "
          f"Mh={args.mh}")
    hk, hloc = bhz_chain_hk(args.nx, args.ny, args.nk, args.mh, args.ts,
                            args.lam)
    solver = EDSolver(cfg)
    basis, lam0 = bhz_bath_basis(args.nx, args.ny, args.mh, args.ts,
                                 args.lam)
    solver.set_hbath(basis, np.tile(lam0, (cfg.nbath, 1)))
    bath = solver.init_solver()
    res = run_dmft_loop(solver, hk, hloc, bath, wmixing=args.wmixing,
                        log=lambda s: print(s, flush=True))
    print(f"converged={res.converged} after {res.iterations} loops")
    print("dens =", res.solver.dens())
    print("docc =", res.solver.docc())


if __name__ == "__main__":
    main()
