"""Test config: force CPU platform with 8 virtual devices (multi-chip tests).

Must run before any jax import (SURVEY.md §4 test strategy item 3).
"""

import os

# Force CPU even when the ambient environment selects a TPU platform
# (JAX_PLATFORMS=axon): unit tests exercise kernels in interpret/scan mode on
# an 8-virtual-device CPU mesh. Set SCTAG_TEST_TPU=1 to run on real hardware.
if not os.environ.get("SCTAG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if not os.environ.get("SCTAG_TEST_TPU"):
    # The axon sitecustomize pins jax_platforms="axon,cpu" via jax.config at
    # interpreter startup, overriding the env var — override it back before
    # any backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")
