"""Periodization of cluster quantities to lattice quantities.

TPU-native replacement for the reference driver postprocessing
(/root/reference/drivers/auxiliary_routines.f90:8-188): the cluster-matrix
Green's function / self-energy is reduced to a periodized (Nspin*Norb)
lattice function by the Fourier phase sum over cluster sites,

    X_per(k, z) = 1/Nlat sum_{IJ} e^{-i k (R_I - R_J)} X_IJ(k, z)

Implemented as one batched einsum over (frequency, site-pair) instead of
the reference's serial loops; the per-frequency matrix inversions are
batched `jnp.linalg` calls.

Schemes (cdn_bhz_postprocessing.f90:354-568):
  * G-scheme     : periodize G, then Sigma_per = G0_per^{-1} - G_per^{-1}
  * Sigma-scheme : periodize Sigma directly, then G from it
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import EDConfig
from .utils.reshape import lso2nnn, nnn2lso, nn2so, so2nn

jax.config.update("jax_enable_x64", True)


def cluster_coords(nlat: int, nx: int, ny: int) -> np.ndarray:
    """[Nlat, ndim] integer coordinates of cluster sites (site = ix+iy*Nx,
    the drivers' indices2N convention)."""
    assert nx * ny == nlat
    if ny == 1:
        return np.arange(nx).reshape(-1, 1).astype(float)
    coords = [(ix, iy) for iy in range(ny) for ix in range(nx)]
    return np.array(coords, dtype=float)


def _phases(kpoint: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """[Nlat, Nlat]: e^{-i k (R_I - R_J)} / Nlat."""
    kr = coords @ np.asarray(kpoint)[: coords.shape[1]]
    return np.exp(-1j * (kr[:, None] - kr[None, :])) / len(coords)


def periodize_g_scheme(cfg: EDConfig, kpoint, coords: np.ndarray,
                       hk_unper: np.ndarray, smats_nnn: np.ndarray,
                       z: np.ndarray) -> np.ndarray:
    """G-scheme periodized GF at one k over frequencies ``z``:
    returns [Nspin, Nspin, Norb, Norb, L]
    (periodize_g_scheme, auxiliary_routines.f90:8-70)."""
    nlat, nspin, norb = cfg.nlat, cfg.nspin, cfg.norb
    nlso = cfg.nlso
    s_lso = jnp.asarray(np.moveaxis(nnn2lso(smats_nnn, nlat, nspin, norb),
                                    -1, 0))
    eye = jnp.eye(nlso, dtype=jnp.complex128)
    a = (jnp.asarray(z)[:, None, None] + cfg.xmu) * eye \
        - jnp.asarray(hk_unper)[None] - s_lso
    g_lso = jnp.linalg.inv(a)                       # [L, nlso, nlso]
    g_nnn = lso2nnn(jnp.moveaxis(g_lso, 0, -1), nlat, nspin, norb)
    ph = jnp.asarray(_phases(kpoint, coords))
    g_per = jnp.einsum("ij,ijabcdl->abcdl", ph, g_nnn)
    return np.asarray(g_per)


def build_sigma_g_scheme(cfg: EDConfig, kpoint, coords: np.ndarray,
                         hk_unper: np.ndarray, hk_per: np.ndarray,
                         smats_nnn: np.ndarray, z: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(G_per, Sigma_per) at one k: Sigma_per = G0_per^{-1} - G_per^{-1}
    (build_sigma_g_scheme, auxiliary_routines.f90:74-131)."""
    nspin, norb = cfg.nspin, cfg.norb
    nso = nspin * norb
    g_per = periodize_g_scheme(cfg, kpoint, coords, hk_unper, smats_nnn, z)
    g_so = jnp.asarray(np.moveaxis(nn2so(g_per, nspin, norb), -1, 0))
    eye = jnp.eye(nso, dtype=jnp.complex128)
    invg0 = (jnp.asarray(z)[:, None, None] + cfg.xmu) * eye \
        - jnp.asarray(hk_per)[None]
    s_so = invg0 - jnp.linalg.inv(g_so)
    s_per = so2nn(np.moveaxis(np.asarray(s_so), 0, -1), nspin, norb)
    return g_per, s_per


def periodize_sigma_scheme(cfg: EDConfig, kpoint, coords: np.ndarray,
                           hk_per: np.ndarray, smats_nnn: np.ndarray,
                           z: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Sigma-scheme: periodize Sigma directly, then
    G_per = [(z+mu) - Hk_per - Sigma_per]^{-1}
    (periodize_sigma_scheme, auxiliary_routines.f90:135-188)."""
    nlat, nspin, norb = cfg.nlat, cfg.nspin, cfg.norb
    nso = nspin * norb
    ph = jnp.asarray(_phases(kpoint, coords))
    s_per = jnp.einsum("ij,ijabcdl->abcdl", ph, jnp.asarray(smats_nnn))
    s_so = jnp.moveaxis(jnp.asarray(
        nn2so(np.asarray(s_per), nspin, norb)), -1, 0)
    eye = jnp.eye(nso, dtype=jnp.complex128)
    a = (jnp.asarray(z)[:, None, None] + cfg.xmu) * eye \
        - jnp.asarray(hk_per)[None] - s_so
    g_so = jnp.linalg.inv(a)
    g_per = so2nn(np.moveaxis(np.asarray(g_so), 0, -1), nspin, norb)
    return g_per, np.asarray(s_per)
