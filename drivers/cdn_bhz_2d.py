#!/usr/bin/env python
"""CDMFT driver: BHZ model on the 2d square lattice, Nx x Ny cluster.

Counterpart of /root/reference/drivers/cdn_bhz_2d.f90: Norb=2, Nspin=2,
complex spin-dependent hopping, general bath, custom observables
(orbital density + kinetic energy), periodized postprocessing.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdmft_lanc_ed_tpu import EDSolver, read_input
from cdmft_lanc_ed_tpu.custom_obs import CustomObservables
from cdmft_lanc_ed_tpu.dmft_loop import run_dmft_loop
from cdmft_lanc_ed_tpu.lattice import dmft_kinetic_energy
from cdmft_lanc_ed_tpu.models.bhz import bhz_bath_basis, bhz_cluster_hk
from cdmft_lanc_ed_tpu.periodize import build_sigma_g_scheme, cluster_coords


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="inputBHZ.conf")
    ap.add_argument("--nx", type=int, default=2)
    ap.add_argument("--ny", type=int, default=2)
    ap.add_argument("--nk", type=int, default=10)
    ap.add_argument("--ts", type=float, default=0.25)
    ap.add_argument("--mh", type=float, default=1.0)
    ap.add_argument("--lam", type=float, default=0.3)
    ap.add_argument("--wmixing", type=float, default=0.5)
    ap.add_argument("--adaptive-mix", action="store_true",
                    help="error-adaptive bath mixing "
                         "(cdn_bhz_2d_adaptive_mix variant)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    nlat = args.nx * args.ny
    cfg = read_input(args.input, nlat=nlat, norb=2, nspin=2,
                     bath_type="general")
    print(f"CDMFT BHZ 2d: {args.nx}x{args.ny} cluster, Nbath={cfg.nbath}, "
          f"Mh={args.mh}, lambda={args.lam}")
    hk, hloc = bhz_cluster_hk(args.nx, args.ny, args.nk, args.mh, args.ts,
                              args.lam)
    solver = EDSolver(cfg)
    basis, lam0 = bhz_bath_basis(args.nx, args.ny, args.mh, args.ts,
                                 args.lam)
    solver.set_hbath(basis, np.tile(lam0, (cfg.nbath, 1)))
    bath = solver.init_solver()

    res = run_dmft_loop(solver, hk, hloc, bath, wmixing=args.wmixing,
                        adaptive_mixing=args.adaptive_mix,
                        log=lambda s: print(s, flush=True))
    print(f"converged={res.converged} after {res.iterations} loops "
          f"(err={res.error:.3e})")
    print("dens =", res.solver.dens())
    print("docc =", res.solver.docc())

    # custom observables: orbital-2 density (cdn_bhz_2d.f90:94-103)
    obs_mat = np.zeros((cfg.nlso, cfg.nlso), complex)
    for il in range(nlat):
        for sp in range(2):
            io = 1 + il * 2 + sp * 2 * nlat
            obs_mat[io, io] = 1.0 / nlat
    co = CustomObservables(res.solver, hk)
    co.add("n2", obs_mat)
    print("custom:", co.compute())

    # periodized Sigma at the Gamma point (postprocessing sample)
    coords = cluster_coords(nlat, args.nx, args.ny)
    wm = np.pi / cfg.beta * (2 * np.arange(8) + 1)
    hk_per, _ = bhz_cluster_hk(1, 1, 1, args.mh, args.ts, args.lam)
    g_per, s_per = build_sigma_g_scheme(
        cfg, [0.0, 0.0], coords, hk[0], hk_per[0],
        res.solver.sigma_matsubara()[..., :8], 1j * wm)
    print("Sigma_per(Gamma, iw0) diag:",
          np.real(np.diagonal(s_per[..., 0].reshape(4, 4))))
    print("Ekin =", dmft_kinetic_energy(cfg, hk,
                                        res.solver.sigma_matsubara()))


if __name__ == "__main__":
    main()
