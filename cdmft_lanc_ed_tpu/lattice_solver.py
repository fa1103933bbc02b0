"""Real-space CDMFT: multiple inequivalent clusters.

TPU-first re-implementation of the reference "lattice" solver variants
(`ed_init_solver_lattice_mpi` / `ed_solve_lattice_mpi`, ED_MAIN.f90:287-374):
``Nineq`` inequivalent clusters are solved per DMFT iteration, each an
independent impurity problem with its own bath and (optionally) its own
local interaction (the reference's per-site ``Uloc_ii`` overrides).

The reference loops clusters serially with MPI-parallel Lanczos inside each
(ED_MAIN.f90:292,314,337).  Here each cluster is an independent
:class:`~.solver.EDSolver`; on a multi-chip mesh the natural mapping is
cluster-per-chip-group (data parallelism) — clusters share compiled kernels
because equal cluster geometry means equal sector shapes (one jit cache).
"""
from __future__ import annotations

import copy
from typing import List, Optional

import numpy as np

from .config import EDConfig
from .fit import chi2_fitgf
from .solver import EDSolver


class LatticeSolver:
    """ed_*_lattice equivalent over Nineq inequivalent clusters."""

    def __init__(self, cfg: EDConfig, nineq: int,
                 uloc_ii: Optional[np.ndarray] = None,
                 xmu_ii: Optional[np.ndarray] = None):
        self.nineq = nineq
        self.solvers: List[EDSolver] = []
        for ineq in range(nineq):
            c = copy.deepcopy(cfg)
            c.ed_file_suffix = f"_ineq{ineq + 1:04d}"
            if uloc_ii is not None:
                c.uloc = list(np.atleast_2d(uloc_ii)[ineq])
            if xmu_ii is not None:
                c.xmu = float(np.asarray(xmu_ii)[ineq])
            self.solvers.append(EDSolver(c))

    def set_hbath(self, basis, lambdas_ineq) -> None:
        """lambdas_ineq: [Nineq, Nbath, Nsym] (or shared [Nbath, Nsym])."""
        lam = np.asarray(lambdas_ineq, dtype=np.float64)
        if lam.ndim == 2:
            lam = np.tile(lam, (self.nineq, 1, 1))
        for ineq, s in enumerate(self.solvers):
            s.set_hbath(basis, lam[ineq])

    def init_solver(self) -> np.ndarray:
        """Returns stacked bath array [Nineq, Nb]."""
        return np.stack([s.init_solver() for s in self.solvers])

    def solve(self, bath_ineq: np.ndarray, hloc_ineq: np.ndarray) -> None:
        """hloc_ineq: [Nineq, ...nnn...] (or shared single hloc)."""
        hloc = np.asarray(hloc_ineq)
        if hloc.ndim == 6:
            hloc = np.broadcast_to(hloc, (self.nineq,) + hloc.shape)
        for ineq, s in enumerate(self.solvers):
            s.solve(bath_ineq[ineq], hloc[ineq])

    def fit(self, weiss_ineq: np.ndarray, bath_ineq: np.ndarray,
            hloc_ineq: Optional[np.ndarray] = None) -> np.ndarray:
        """Per-cluster chi^2 bath fit (ed_chi2_fitgf lattice wrapper,
        ED_FIT_CHI2.f90:88-111)."""
        out = []
        for ineq, s in enumerate(self.solvers):
            hloc = None
            if hloc_ineq is not None:
                h = np.asarray(hloc_ineq)
                hloc = h[ineq] if h.ndim == 7 else h
            b, _, _ = chi2_fitgf(s.cfg, s.hb, weiss_ineq[ineq],
                                 bath_ineq[ineq], hloc_nnn=hloc)
            out.append(b)
        return np.stack(out)

    # -- stacked getters (*_ineq arrays, ED_MAIN.f90:357-370; the full
    # [Nineq,...] getter family of ED_IO/lattice/*.f90) -----------------
    def sigma_matsubara(self) -> np.ndarray:
        return np.stack([s.sigma_matsubara() for s in self.solvers])

    def sigma_realaxis(self) -> np.ndarray:
        return np.stack([s.sigma_realaxis() for s in self.solvers])

    def gimp_matsubara(self) -> np.ndarray:
        return np.stack([s.gimp_matsubara() for s in self.solvers])

    def gimp_realaxis(self) -> np.ndarray:
        return np.stack([s.gimp_realaxis() for s in self.solvers])

    def g0imp_matsubara(self) -> np.ndarray:
        return np.stack([s.g0imp_matsubara() for s in self.solvers])

    def g0imp_realaxis(self) -> np.ndarray:
        return np.stack([s.g0imp_realaxis() for s in self.solvers])

    def dens(self) -> np.ndarray:
        return np.stack([s.dens() for s in self.solvers])

    def docc(self) -> np.ndarray:
        return np.stack([s.docc() for s in self.solvers])

    def mag(self) -> np.ndarray:
        return np.stack([s.mag() for s in self.solvers])

    def egs(self) -> np.ndarray:
        return np.array([s.egs for s in self.solvers])

    def eimp(self) -> np.ndarray:
        """[Nineq, 4]: (epot, eint, ehartree, eknot) — the ed_get_eimp
        lattice layout (ED_MAIN.f90:365, ED_IO/lattice/get_eimp.f90).
        The reference never assigns ed_Eint (always 0); here eint is the
        meaningful epot - ehartree."""
        return np.array([[s.energy.epot,
                          s.energy.epot - s.energy.ehartree,
                          s.energy.ehartree, s.energy.eknot]
                         for s in self.solvers])

    def doubles(self) -> np.ndarray:
        """[Nineq, 4]: (dust, dund, dse, dph)
        (ed_get_doubles lattice, ED_IO/lattice/get_doubles.f90)."""
        return np.array([[s.energy.dust, s.energy.dund, s.energy.dse,
                          s.energy.dph] for s in self.solvers])

    def cluster_dm(self) -> np.ndarray:
        """[Nineq, 4^Nimp, 4^Nimp] (ed_get_cluster_dm lattice)."""
        return np.stack([s.cluster_dm() for s in self.solvers])

    def reduced_dm(self, orbital_mask) -> np.ndarray:
        """[Nineq, ...] partial-traced DMs (ed_get_reduced_dm lattice,
        ED_IO.f90:205-211)."""
        return np.stack([s.reduced_dm(orbital_mask)
                         for s in self.solvers])

    def sp_dm(self) -> np.ndarray:
        """[Nineq, ...] single-particle DMs (ed_get_sp_dm lattice)."""
        return np.stack([s.sp_dm() for s in self.solvers])

    # -- readers (ed_read_impSigma/ed_read_impG lattice variants,
    # ED_IO.f90:661-687,719-744): restore per-ineq printed functions ----
    def read_impsigma(self) -> np.ndarray:
        """Read every cluster's impSigma files back into its solver;
        returns the stacked [Nineq,...] Matsubara array."""
        for s in self.solvers:
            s.read_impsigma()
        return self.sigma_matsubara()

    def read_impg(self) -> np.ndarray:
        """Restart-from-G: read every cluster's impG files back."""
        for s in self.solvers:
            s.read_impg()
        return self.gimp_matsubara()
