import os

# Tests run on a virtual 8-device CPU mesh; the real TPU path is exercised by
# bench.py / __graft_entry__.py.  Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The session harness pre-imports jax with the axon/TPU platform pinned via
# sitecustomize; env vars alone are too late, so force CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
