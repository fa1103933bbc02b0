"""cdmft_lanc_ed_tpu — TPU-native Cluster-DMFT Lanczos-ED framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference Fortran CDMFT-LANC-ED code (/root/reference): exact
diagonalization of cluster-impurity+bath Hamiltonians with conserved
(N_up, N_dw), Lanczos Green's functions, chi^2 bath fitting, and the
lattice self-consistency layer, designed TPU-first (static shapes,
batched device linear algebra, sharded SpMM Lanczos).

The public facade mirrors the reference's ``USE CDMFT_ED`` API
(/root/reference/CDMFT_ED.f90:4-52) with pythonic names.
"""
import os as _os

import jax as _jax

# Persistent XLA compilation cache: sector-shaped kernels recompile across
# runs otherwise (TPU compiles via the tunnel cost 10-200 s each).
if not _os.environ.get("CDMFT_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "CDMFT_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "cdmft_jax"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .config import EDConfig, ed_read_input, read_input
from .bath import (BathBasis, DmftBath, get_bath_dimension,
                   pack_dmft_bath, unpack_dmft_bath, set_hbath,
                   hbath_basis_from_hloc, delta_bath, g0and_bath, invg0_bath)
from .solver import EDSolver
from .eigenspace import EigenState, StateList
from .utils.reshape import lso2nnn, nnn2lso, so2nn, nn2so

__version__ = "0.1.0"
