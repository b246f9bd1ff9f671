"""Test config: run on a virtual 8-device CPU mesh so sharding tests work
anywhere. Mirrors the reference's CPU/GPU duality testing with mesh-shape
duality (SURVEY.md §4)."""
import os

# NOTE: on this machine the axon sitecustomize (PYTHONPATH) pins the platform
# before conftest runs; use scripts/run_tests.sh to force the CPU mesh.
# These settings still apply in clean environments.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The axon sitecustomize pins the platform via env before conftest runs;
# jax.config wins over env as long as the backend is uninitialized, so
# re-pin here — the suite is defined to run on the virtual CPU mesh.
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REFERENCE_DIR = Path("/root/reference")


def reference_scene(name: str) -> Path:
    return REFERENCE_DIR / "scenes" / name
