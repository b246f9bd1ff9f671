#!/bin/sh
# Run the test suite on a virtual 8-device CPU mesh (no TPU needed).
# PYTHONPATH is cleared to bypass the axon sitecustomize that pins the
# platform to the TPU backend.
cd "$(dirname "$0")/.." || exit 1
PYTHONPATH= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    exec python -m pytest tests/ -q "$@"
