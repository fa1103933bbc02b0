#!/usr/bin/env python
"""Measure the sector-parallel pad-slot accounting on the virtual CPU
mesh (round-4 VERDICT weak 5 / item 7): run a full plaquette solve with
a (sector x dw) mesh installed and report DiagState.pad_stats — how many
pad slots the batched dispatch created to round groups up to the sector
axis, how many were FILLED with real singleton sectors (round-5 change)
vs duplicated-and-discarded.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python tools/measure_pad_fraction.py
Appends one JSON line suitable for SCALING_r{N}.jsonl.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("CDMFT_SPLIT_BACKEND", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                                    # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np                                            # noqa: E402


def main():
    import tempfile
    from cdmft_lanc_ed_tpu import EDConfig, EDSolver
    from cdmft_lanc_ed_tpu.parallel import multichip

    nsec = int(os.environ.get("CDMFT_PAD_NSEC", "4"))
    mesh = multichip.make_mesh(len(jax.devices()), n_sector=nsec)
    multichip.set_solver_mesh(mesh)
    wd = tempfile.mkdtemp(prefix="pad_measure_")
    cfg = EDConfig(nlat=4, norb=1, nspin=1, nbath=1, uloc=[4.0],
                   lmats=16, lreal=16, ed_verbose=0,
                   lanc_dim_threshold=24, gf_flag=False,
                   work_dir=wd)
    h = np.zeros((4, 4, 1, 1, 1, 1), complex)
    for (i, j) in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        h[i, j, 0, 0, 0, 0] = h[j, i, 0, 0, 0, 0] = -1.0
    s = EDSolver(cfg)
    s.set_hbath(np.eye(4).reshape(4, 4, 1, 1, 1, 1, 1),
                np.full((cfg.nbath, 1), 0.4))
    b = s.init_solver()
    s.solve(b, h)
    ps = dict(s.diag_state.pad_stats)
    slots = ps.get("pad_slots", 0)
    filled = ps.get("filled_slots", 0)
    batched = ps.get("batched_sectors", 0)
    out = {
        "metric": "sector_parallel_pad_accounting",
        "mesh": f"sector={nsec} x dw={len(jax.devices()) // nsec}",
        "pad_slots": slots,
        "filled_with_real_sectors": filled,
        "duplicated_discarded": slots - filled,
        "batched_sectors": batched,
        "duplicate_work_fraction": (round((slots - filled)
                                          / max(batched + slots - filled,
                                                1), 4)),
        "egs": float(f"{s.egs:.8f}"),
    }
    print(json.dumps(out))
    multichip.set_solver_mesh(None)


if __name__ == "__main__":
    main()
