#!/usr/bin/env python
"""CDMFT driver: kagome lattice, 3-site triangle cluster.

Counterpart of /root/reference/drivers/cdn_kagome.f90 (Nlat=3).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdmft_lanc_ed_tpu import EDSolver, read_input
from cdmft_lanc_ed_tpu.dmft_loop import run_dmft_loop
from cdmft_lanc_ed_tpu.models.kagome import kagome_cluster_hk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="inputKAGOME.conf")
    ap.add_argument("--nk", type=int, default=10)
    ap.add_argument("--ts", type=float, default=1.0)
    ap.add_argument("--wmixing", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    cfg = read_input(args.input, nlat=3, norb=1)
    print(f"CDMFT kagome: Nbath={cfg.nbath}, U={cfg.uloc[0]}")
    hk, hloc = kagome_cluster_hk(args.nk, args.ts, cfg.nspin)

    solver = EDSolver(cfg)
    basis = np.zeros((1, 3, 3, cfg.nspin, cfg.nspin, 1, 1), np.complex128)
    for il in range(3):
        basis[0, il, il, :, :, 0, 0] = np.eye(cfg.nspin)
    solver.set_hbath(basis, np.linspace(-cfg.hwband, cfg.hwband,
                                        cfg.nbath)[:, None])
    bath = solver.init_solver()

    res = run_dmft_loop(solver, hk, hloc, bath, wmixing=args.wmixing,
                        log=lambda s: print(s, flush=True))
    print(f"converged={res.converged} after {res.iterations} loops")
    print("dens =", res.solver.dens().ravel())
    print("docc =", res.solver.docc().ravel())


if __name__ == "__main__":
    main()
