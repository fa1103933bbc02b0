#!/usr/bin/env python
"""Minimal smoke-test driver: single-site DMFT on the 2d square lattice.

Counterpart of /root/reference/drivers/cdn_test.f90 (the reference's only
"test" program): 1-orbital, replica bath, few loops, prints observables.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdmft_lanc_ed_tpu import EDSolver, read_input
from cdmft_lanc_ed_tpu.dmft_loop import run_dmft_loop
from cdmft_lanc_ed_tpu.models.hubbard import square_cluster_hk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="inputTEST.conf")
    ap.add_argument("--nk", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    cfg = read_input(args.input, nlat=1, norb=1)
    hk, hloc = square_cluster_hk(1, 1, args.nk)
    solver = EDSolver(cfg)
    basis = np.zeros((1, 1, 1, cfg.nspin, cfg.nspin, 1, 1), np.complex128)
    basis[0, 0, 0, :, :, 0, 0] = np.eye(cfg.nspin)
    solver.set_hbath(basis,
                     np.linspace(-cfg.hwband, cfg.hwband,
                                 cfg.nbath)[:, None])
    bath = solver.init_solver()
    res = run_dmft_loop(solver, hk, hloc, bath,
                        log=lambda s: print(s, flush=True))
    print(f"converged={res.converged} dens={res.solver.dens().ravel()} "
          f"docc={res.solver.docc().ravel()} egs={res.solver.egs:.8f}")


if __name__ == "__main__":
    main()
