#!/usr/bin/env python
"""Round benchmark: Lanczos H·v throughput (nnz/s) on the flagship sector.

Prints ONE JSON line:
  {"metric": "lanczos_spmv_nnz_per_s", "value": N, "unit": "nnz/s",
   "vs_baseline": R}

The flagship problem is the 2x2 Hubbard plaquette + 2 replica baths
(Ns=12), half-filled sector (6,6): dim = 924^2 = 853,776 — the BASELINE.json
"Lanczos H·v nnz/s per chip" metric on config 1's big brother.
``vs_baseline`` is the fraction of the HBM-bandwidth roofline achieved
(the reference publishes no numbers, SURVEY.md section 6; the north-star
target is >= 0.7 of roofline).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from cdmft_lanc_ed_tpu.ops import split

    _, op = ge._plaquette_bath_op(nbath=2, nup=6, ndw=6)
    # the production kernel: dense factors bucketed to MXU-aligned shapes.
    # The flagship Hubbard sector is REAL symmetric, so the production GS
    # Lanczos runs the one-plane real kernel (2 MXU matmuls per H·v instead
    # of the split-complex kernel's 6 — ops/split.py real fast path).
    assert split.op_is_real(op)
    dd = split._bucket(op.dim_dw)
    du = split._bucket(op.dim_up)
    dev = split.to_device_dense_real(
        op, pad_to=(dd, du) if (dd, du) != (op.dim_dw, op.dim_up) else None)
    nnz = op.nnz

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def chain(v, steps):
        def body(v, _):
            w = split.matvec_dense_real(dev, v)
            return w / jnp.linalg.norm(w), None
        c, _ = jax.lax.scan(body, v, None, length=steps)
        return c

    rng = np.random.default_rng(0)
    # zero padding region (decoupled +1e6 modes stay exactly zero)
    v0 = np.zeros((dd, du))
    v0[:op.dim_dw, :op.dim_up] = rng.normal(
        size=(op.dim_dw, op.dim_up)) / np.sqrt(op.dim)
    v = jnp.asarray(v0)

    # warmup/compile THE SAME static shape that is timed
    steps = 30
    out = chain(v, steps)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = chain(v, steps)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    nnz_per_s = nnz * steps / dt

    # The kernel is compute-bound: the tensor-product factors are applied as
    # dense f64 MXU matmuls, one per spin side for the real kernel.
    # Roofline = executed f64 FLOP rate vs the ~2 TFLOP/s ceiling of XLA's
    # emulated-f64 matmul on this chip (measured envelope).
    flops_exec = 2 * (dd * dd * du + du * du * dd)  # 2 real matmuls
    tflops = flops_exec * steps / dt / 1e12
    roof_tflops = 2.0
    print(json.dumps({
        "metric": "lanczos_spmv_nnz_per_s",
        "value": float(f"{nnz_per_s:.4g}"),
        "unit": "nnz/s",
        "vs_baseline": float(f"{tflops / roof_tflops:.4g}"),
    }))
    print(f"# dim={op.dim} nnz={nnz} steps={steps} dt={dt:.3f}s "
          f"f64_tflops={tflops:.3f} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
