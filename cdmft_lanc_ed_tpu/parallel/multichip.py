"""Multi-chip orchestration: 2-D (sector x dw) mesh and batched dispatch.

New capability relative to the reference (SURVEY.md section 2.3 item 7: the
reference's sector loop is strictly serial): a 2-D device mesh with axes

    ("sector", "dw")

runs B same-shape sectors data-parallel along "sector" while each sector's
vector is sharded along "dw" with the all-to-all transpose SpMV
(sharded_spmv).  This is the dp x sp composition of the framework; the bath
chi^2 fit and the frequency-batched linear algebra are embarrassingly
parallel and ride the same mesh.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sector_ham import SectorOperator
from ..ops.spmv import DeviceSectorOp
from .sharded_spmv import pad_device_op, shard_local_kernel

jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# active solver mesh: set once by the user/driver; the diagonalization and
# GF stages route large sectors through the sharded kernels when present
# ---------------------------------------------------------------------------

_ACTIVE_MESH: Mesh = None


def set_solver_mesh(mesh: Mesh) -> None:
    """Install a device mesh for the solver hot paths (axis 'dw' is used to
    shard sector vectors; 'sector' for batched dispatch)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_solver_mesh() -> Mesh:
    return _ACTIVE_MESH


def make_mesh(n_devices: int, n_sector: int = 1,
              devices=None) -> Mesh:
    """2-D mesh with n_sector x (n_devices//n_sector) layout."""
    if devices is None:
        devices = jax.devices()[:n_devices]
    assert n_devices % n_sector == 0
    arr = np.asarray(devices).reshape(n_sector, n_devices // n_sector)
    return Mesh(arr, ("sector", "dw"))


def sector_axis_size(mesh) -> int:
    """Size of the 'sector' axis of the installed mesh (1 when absent):
    the sector-parallel dispatch width of the production batched
    eigensolver (SURVEY 2.3 item 7)."""
    if mesh is None:
        return 1
    return int(dict(mesh.shape).get("sector", 1))


def shard_batched_stack(stack, mesh, axis: str = "sector"):
    """Shard every array of a stacked same-bucket operator pytree on its
    LEADING batch axis over ``mesh`` axis ``axis``.  With the Krylov
    basis sharded the same way (lanczos batch_mesh), GSPMD runs each
    batch member's restarts entirely on its own device column — the
    production sector-parallel path (the reference solves sectors
    serially, ED_DIAG.f90:78)."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, stack)


def stack_device_ops(ops: Sequence[SectorOperator], ndev_dw: int
                     ) -> DeviceSectorOp:
    """Stack same-shape sector operators along a leading batch axis."""
    devs = [pad_device_op(o, ndev_dw) for o in ops]
    fields = ("diag", "up_cols", "up_vals", "dw_cols", "dw_vals", "nd_amp",
              "nd_up_src", "nd_up_sgn", "nd_dw_src", "nd_dw_sgn")
    return DeviceSectorOp(**{
        f: jnp.stack([getattr(d, f) for d in devs]) for f in fields})


def make_batched_sharded_matvec(batched: DeviceSectorOp, mesh: Mesh):
    """H·v over a [B, DimDw_p, DimUp_p] batch: B sectors sharded along
    "sector", each vector sharded along "dw"."""
    spec_op = {
        "diag": P("sector", "dw", None),
        "up_cols": P("sector", None, None),
        "up_vals": P("sector", None, None),
        "dw_cols": P("sector", None, None),
        "dw_vals": P("sector", None, None),
        "nd_amp": P("sector", None),
        "nd_up_src": P("sector", None, None),
        "nd_up_sgn": P("sector", None, None),
        "nd_dw_src": P("sector", None, None),
        "nd_dw_sgn": P("sector", None, None),
    }
    op_sh = DeviceSectorOp(**{
        f: jax.device_put(getattr(batched, f), NamedSharding(mesh, spec))
        for f, spec in spec_op.items()})
    vspec = P("sector", "dw", None)
    kernel = jax.vmap(shard_local_kernel("dw"))

    @jax.jit
    def matvec(v):
        return jax.shard_map(
            kernel, mesh=mesh,
            in_specs=tuple(spec_op[f] for f in
                           ("diag", "up_cols", "up_vals", "dw_cols",
                            "dw_vals", "nd_amp", "nd_up_src", "nd_up_sgn",
                            "nd_dw_src", "nd_dw_sgn")) + (vspec,),
            out_specs=vspec,
            check_vma=False,
        )(op_sh.diag, op_sh.up_cols, op_sh.up_vals, op_sh.dw_cols,
          op_sh.dw_vals, op_sh.nd_amp, op_sh.nd_up_src, op_sh.nd_up_sgn,
          op_sh.nd_dw_src, op_sh.nd_dw_sgn, v)

    return matvec, NamedSharding(mesh, vspec)


def lanczos_step(matvec, carry):
    """One (batched) Lanczos iteration — the framework's 'training step':
    SpMV + orthogonalisation + normalisation, fully jittable over the mesh.

    carry = (v_prev, v, beta_prev) with leading batch axes as in matvec."""
    v_prev, v, beta_prev = carry
    w = matvec(v)
    axes = tuple(range(1, v.ndim))
    alpha = jnp.real(jnp.sum(v.conj() * w, axis=axes))
    shape = alpha.shape + (1,) * (v.ndim - 1)
    w = w - alpha.reshape(shape).astype(v.dtype) * v \
        - beta_prev.reshape(shape).astype(v.dtype) * v_prev
    beta = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2, axis=axes))
    v_next = w / jnp.maximum(beta, 1e-300).reshape(shape).astype(v.dtype)
    return (v, v_next, beta), (alpha, beta)
