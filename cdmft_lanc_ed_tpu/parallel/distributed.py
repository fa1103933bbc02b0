"""Multi-host initialisation and mesh construction.

Entry point for pod-slice runs (SURVEY.md section 7 step 10): wraps
``jax.distributed.initialize`` and builds the (sector x dw) mesh over all
hosts' devices.  On a single host this degrades gracefully to the local
mesh.  The reference's multi-node story is mpirun + MPI communicators;
here every process runs the same SPMD program and the collectives ride
ICI/DCN via the mesh.

Typical pod usage (one process per host):

    from cdmft_lanc_ed_tpu.parallel.distributed import init_distributed
    mesh = init_distributed(n_sector=2)     # env-driven coordinator
    from cdmft_lanc_ed_tpu.parallel import multichip
    multichip.set_solver_mesh(mesh)
    ... EDSolver runs with large sectors sharded across all hosts ...
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     n_sector: int = 1):
    """Initialise multi-process JAX (no-op when single-process) and return
    the global ("sector", "dw") mesh over all devices."""
    import jax
    from jax.sharding import Mesh

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    else:
        # env-driven auto-init (TPU pods set the cluster env); tolerate
        # single-process runs where initialize() is unnecessary
        try:
            jax.distributed.initialize()
        except Exception:
            pass

    devices = jax.devices()
    n = len(devices)
    while n % n_sector != 0:
        n_sector -= 1
    arr = np.asarray(devices).reshape(n_sector, n // n_sector)
    return Mesh(arr, ("sector", "dw"))
