"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native analogue of a fake multi-device backend — all sharding
and collective paths are exercised on CPU with
``xla_force_host_platform_device_count=8`` (see SURVEY.md §4f).
"""

import os

# Force CPU: unit tests exercise sharding on a virtual 8-device mesh.
# Set SEGTPU_TEST_TPU=1 to run the suite on real TPU hardware instead.
if os.environ.get("SEGTPU_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("SEGTPU_TEST_TPU") != "1":
    # The axon sitecustomize pins jax_platforms via config at interpreter
    # start; override it so tests run on the virtual CPU mesh.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
