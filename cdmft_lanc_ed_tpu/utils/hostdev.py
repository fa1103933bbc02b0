"""Complex-computation device routing.

The target TPU backend cannot run complex128 programs (they hang in
compilation) nor LU-based linear algebra (inv/solve custom calls fail),
while the f64 matvec/matmul hot path works.  The solver therefore splits:

* Hilbert-space kernels (Lanczos H·v, CGS2, tridiag) — TPU, real/split
  f64 (ops/split.py);
* frequency-axis complex linear algebra (Sigma = G0^{-1} - G^{-1}, the
  lattice G_loc k-sums, the chi^2 bath-fit autodiff, periodization,
  custom observables) — the host CPU backend via
  :func:`complex_compute`, still jitted/batched XLA, just placed on
  CPU.  On complex-capable backends (plain CPU sessions, GPU) the
  context is a no-op and everything stays on the default device.

This mirrors the hardware reality rather than the reference's layout
(the Fortran code does ALL of this on CPU; we keep only the
exponentially large part on the accelerator).
"""
from __future__ import annotations

import contextlib
import functools

import jax


def complex_device_ok() -> bool:
    """True when the default backend can execute complex128 programs."""
    return jax.default_backend() != "tpu"


def complex_compute():
    """Context manager placing jnp work on a complex-capable device."""
    if complex_device_ok():
        return contextlib.nullcontext()
    return jax.default_device(jax.devices("cpu")[0])


def complex_safe(fn):
    """Decorator: run ``fn`` under :func:`complex_compute`."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with complex_compute():
            return fn(*args, **kwargs)

    return wrapped
