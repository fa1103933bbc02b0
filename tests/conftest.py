import os

# Tests run on a virtual 8-device CPU mesh; the real TPU path is exercised by
# bench.py / __graft_entry__.py.  Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The session harness pre-imports jax with the axon/TPU platform pinned via
# sitecustomize; env vars alone are too late, so force CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True)
def _isolate_cwd(tmp_path, monkeypatch):
    """Run every test from a scratch cwd so writers with the default
    ``work_dir='.'`` (reference parity: the Fortran code writes to cwd)
    never litter the repo root with fit_*/chi2fit_* output files."""
    monkeypatch.chdir(tmp_path)
    yield
