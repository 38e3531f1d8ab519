"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native analogue of a fake multi-device backend — all sharding
and collective paths are exercised on CPU with
``xla_force_host_platform_device_count=8`` (see SURVEY.md §4f).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
