#!/usr/bin/env python
"""Time-to-converged DMFT loop on the 2x2 plaquette (BASELINE metric 2).

Runs the full production CDMFT loop — mixed-precision diagonalization,
batched GF-Lanczos, k-summed G_loc, Weiss self-consistency, autodiff chi2
bath fit, bath mixing, convergence check — on the real attached chip and
prints one JSON line with the converged-loop wall time.

Configuration: 2x2 Hubbard plaquette + 2 replica baths (Ns=12 — the
largest flagship a single chip serves with dense factors; the 4-replica
north-star variant is the multi-host Ns=20 regime).
"""
import faulthandler
import json
import sys
import time

import numpy as np


def main():
    faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)
    import jax
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, ".")
    from cdmft_lanc_ed_tpu import EDConfig, EDSolver
    from cdmft_lanc_ed_tpu.dmft_loop import run_dmft_loop
    from cdmft_lanc_ed_tpu.models.hubbard import square_cluster_hk

    import os
    import tempfile
    wd = tempfile.mkdtemp(prefix="bench_dmft_")
    cfg = EDConfig(nlat=4, norb=1, nspin=1, nbath=2, uloc=[4.0],
                   beta=100.0, lmats=256, lreal=32, lfit=128,
                   nloop=20, dmft_error=2e-5, nsuccess=1,
                   ed_precision="mixed", ed_verbose=3, work_dir=wd)
    hk, hloc = square_cluster_hk(2, 2, nk=10)
    solver = EDSolver(cfg)
    basis = np.zeros((1, 4, 4, 1, 1, 1, 1), complex)
    for i in range(4):
        basis[0, i, i, 0, 0, 0, 0] = 1.0
    solver.set_hbath(basis, np.linspace(-1.0, 1.0, cfg.nbath)[:, None])
    bath = solver.init_solver()

    t0 = time.time()
    res = run_dmft_loop(solver, hk, hloc, bath, wmixing=0.6,
                        log=lambda s: print("#", s, file=sys.stderr,
                                            flush=True))
    dt = time.time() - t0
    print(json.dumps({
        "metric": "dmft_loop_2x2_plaquette_s",
        "value": float(f"{dt:.4g}"),
        "unit": "s",
        "vs_baseline": float(res.error),
    }))
    print(f"# converged={res.converged} iters={res.iterations} "
          f"err={res.error:.3e} egs={res.solver.egs:.8f} "
          f"dens={float(np.sum(res.solver.dens())):.6f} "
          f"device={jax.devices()[0].device_kind} workdir={wd}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
