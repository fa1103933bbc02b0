"""Independent brute-force dense Hamiltonian oracle for tests.

Deliberately written as a *separate* code path from the package builders
(dict/bit loops over full Fock states, no shared helper code) so it can act
as ground truth for the vectorised sector assembly.  Physics follows the
reference definitions in ED_HAMILTONIAN/sparse/*.f90.
"""
from __future__ import annotations

import numpy as np
from math import comb


def popcount_int(x: int) -> int:
    return bin(x).count("1")


def sign_c(m: int, b: int) -> int:
    """Sign of applying c_b or c^+_b: parity of bits below b."""
    return -1 if popcount_int(m & ((1 << b) - 1)) % 2 else 1


def apply_c(m: int, b: int):
    if not (m >> b) & 1:
        return None
    return m & ~(1 << b), sign_c(m, b)


def apply_cdg(m: int, b: int):
    if (m >> b) & 1:
        return None
    return m | (1 << b), sign_c(m, b)


def sector_basis(ns: int, nup: int, ndw: int):
    ups = [m for m in range(1 << ns) if popcount_int(m) == nup]
    dws = [m for m in range(1 << ns) if popcount_int(m) == ndw]
    # flat index i = iup + idw*DimUp
    return ups, dws


def build_dense_oracle(cfg, imp_hloc, hbath_rec, diag_hybr, nup, ndw):
    """Dense sector Hamiltonian by state-by-state operator application."""
    ns, nimp = cfg.ns, cfg.nimp
    nlat, norb, nbath = cfg.nlat, cfg.norb, cfg.nbath
    uloc = cfg.uloc_arr
    ups, dws = sector_basis(ns, nup, ndw)
    du, dd = len(ups), len(dws)
    upidx = {m: i for i, m in enumerate(ups)}
    dwidx = {m: i for i, m in enumerate(dws)}
    dim = du * dd
    H = np.zeros((dim, dim), dtype=np.complex128)

    def lvl_imp(il, io):
        return io + il * norb

    def lvl_bath(il, io, ib):
        return nlat * norb * (1 + ib) + io + il * norb

    # one-body matrices per spin over all Ns levels (off-diagonal only)
    def one_body(s):
        h = np.zeros((ns, ns), dtype=np.complex128)
        for il in range(nlat):
            for jl in range(nlat):
                for io in range(norb):
                    for jo in range(norb):
                        a, b = lvl_imp(il, io), lvl_imp(jl, jo)
                        if a != b:
                            h[a, b] += imp_hloc[il, jl, s, s, io, jo]
                        for ib in range(nbath):
                            ab = lvl_bath(il, io, ib)
                            bb = lvl_bath(jl, jo, ib)
                            if ab != bb:
                                h[ab, bb] += hbath_rec[ib, il, jl, s, s, io, jo]
        for il in range(nlat):
            for io in range(norb):
                for ib in range(nbath):
                    v = diag_hybr[il, s, io, ib]
                    h[lvl_bath(il, io, ib), lvl_imp(il, io)] += v
                    h[lvl_imp(il, io), lvl_bath(il, io, ib)] += v
        return h

    h_up1 = one_body(0)
    h_dw1 = one_body(cfg.nspin - 1)

    for idw, mdw in enumerate(dws):
        for iup, mup in enumerate(ups):
            i = iup + idw * du
            nu = [(mup >> lvl_imp(il, io)) & 1
                  for il in range(nlat) for io in range(norb)]
            nd = [(mdw >> lvl_imp(il, io)) & 1
                  for il in range(nlat) for io in range(norb)]
            # diagonal
            e = 0.0
            for il in range(nlat):
                for io in range(norb):
                    a = lvl_imp(il, io)
                    e += (imp_hloc[il, il, 0, 0, io, io].real - cfg.xmu) * \
                        ((mup >> a) & 1)
                    e += (imp_hloc[il, il, cfg.nspin - 1, cfg.nspin - 1,
                                   io, io].real - cfg.xmu) * ((mdw >> a) & 1)
                    e += uloc[io] * nu[a] * nd[a]
                    for ib in range(nbath):
                        blv = lvl_bath(il, io, ib)
                        e += hbath_rec[ib, il, il, 0, 0, io, io].real * \
                            ((mup >> blv) & 1)
                        e += hbath_rec[ib, il, il, cfg.nspin - 1,
                                       cfg.nspin - 1, io, io].real * \
                            ((mdw >> blv) & 1)
                for io in range(norb):
                    for jo in range(io + 1, norb):
                        a, b = lvl_imp(il, io), lvl_imp(il, jo)
                        e += cfg.ust * (nu[a] * nd[b] + nu[b] * nd[a])
                        e += (cfg.ust - cfg.jh) * (nu[a] * nu[b] + nd[a] * nd[b])
                if cfg.hfmode:
                    for io in range(norb):
                        a = lvl_imp(il, io)
                        e += -0.5 * uloc[io] * (nu[a] + nd[a]) + 0.25 * uloc[io]
                    for io in range(norb):
                        for jo in range(io + 1, norb):
                            a, b = lvl_imp(il, io), lvl_imp(il, jo)
                            s4 = nu[a] + nd[a] + nu[b] + nd[b]
                            e += -0.5 * cfg.ust * s4 + 0.25 * cfg.ust
                            e += -0.5 * (cfg.ust - cfg.jh) * s4 \
                                + 0.25 * (cfg.ust - cfg.jh)
            H[i, i] += e
            # up hopping
            for a in range(ns):
                for b in range(ns):
                    if a == b or h_up1[a, b] == 0:
                        continue
                    r1 = apply_c(mup, b)
                    if r1 is None:
                        continue
                    k1, s1 = r1
                    r2 = apply_cdg(k1, a)
                    if r2 is None:
                        continue
                    k2, s2 = r2
                    j = upidx[k2] + idw * du
                    H[j, i] += h_up1[a, b] * s1 * s2
            # dw hopping
            for a in range(ns):
                for b in range(ns):
                    if a == b or h_dw1[a, b] == 0:
                        continue
                    r1 = apply_c(mdw, b)
                    if r1 is None:
                        continue
                    k1, s1 = r1
                    r2 = apply_cdg(k1, a)
                    if r2 is None:
                        continue
                    k2, s2 = r2
                    j = iup + dwidx[k2] * du
                    H[j, i] += h_dw1[a, b] * s1 * s2
            # Jx spin exchange + Jp pair hopping (H_non_local.f90:23-98)
            if cfg.norb > 1 and (cfg.jx != 0 or cfg.jp != 0):
                for il in range(nlat):
                    for io in range(norb):
                        for jo in range(norb):
                            if io == jo:
                                continue
                            a, b = lvl_imp(il, io), lvl_imp(il, jo)
                            if cfg.jx != 0:
                                # dw: c^+_b c_a ; up: c^+_a c_b
                                r1 = apply_c(mdw, a)
                                if r1 is not None:
                                    k1, s1 = r1
                                    r2 = apply_cdg(k1, b)
                                    if r2 is not None:
                                        k2, s2 = r2
                                        r3 = apply_c(mup, b)
                                        if r3 is not None:
                                            k3, s3 = r3
                                            r4 = apply_cdg(k3, a)
                                            if r4 is not None:
                                                k4, s4 = r4
                                                j = upidx[k4] + dwidx[k2] * du
                                                H[j, i] += cfg.jx * s1 * s2 * s3 * s4
                            if cfg.jp != 0:
                                # dw: c^+_a c_b ; up: c^+_a c_b
                                r1 = apply_c(mdw, b)
                                if r1 is not None:
                                    k1, s1 = r1
                                    r2 = apply_cdg(k1, a)
                                    if r2 is not None:
                                        k2, s2 = r2
                                        r3 = apply_c(mup, b)
                                        if r3 is not None:
                                            k3, s3 = r3
                                            r4 = apply_cdg(k3, a)
                                            if r4 is not None:
                                                k4, s4 = r4
                                                j = upidx[k4] + dwidx[k2] * du
                                                H[j, i] += cfg.jp * s1 * s2 * s3 * s4
    return H
