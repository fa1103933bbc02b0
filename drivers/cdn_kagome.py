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
    ap.add_argument("--bands", action="store_true",
                    help="write band structure (cdn_kagome_bands variant)")
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

    if args.bands:
        # cdn_kagome_bands variant: topological-Hamiltonian band structure
        from cdmft_lanc_ed_tpu.models.kagome import SUPERCELL, kagome_hk_at
        from cdmft_lanc_ed_tpu.periodize import cluster_coords
        from cdmft_lanc_ed_tpu import postprocess
        from cdmft_lanc_ed_tpu.utils.reshape import nnn2lso
        b = 2 * np.pi * np.linalg.inv(SUPERCELL).T

        def hk_fn(k):
            return nnn2lso(kagome_hk_at(k, args.ts, cfg.nspin), 3,
                           cfg.nspin, 1)

        kpath = [np.zeros(2), b[0] / 2, (b[0] + b[1]) / 3, np.zeros(2)]
        kd, bands = postprocess.band_structure(hk_fn, kpath, npts=40)
        np.savetxt(os.path.join(cfg.work_dir, "kagome_bands.ed"),
                   np.column_stack([kd, bands]))
        print("bands written to kagome_bands.ed")


if __name__ == "__main__":
    main()
