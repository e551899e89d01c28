"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU analog of a fake backend (SURVEY.md §4): meshes, expert
all-to-all, and data-parallel psum all execute unmodified on 8 host devices.
Must run before the first `import jax` anywhere in the test process.
"""

import os

# Force, don't setdefault: the ambient environment pins JAX_PLATFORMS=axon
# (the real TPU tunnel) and tests must stay off the hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
# subprocess-spawning tests must not boot the tunnel either
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize (interpreter start, before this file) calls
# jax.config.update("jax_platforms", "axon,cpu"), which OVERRIDES the
# JAX_PLATFORMS env var — force the config back to cpu before any
# backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
