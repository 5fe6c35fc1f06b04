"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

Kernels run in Pallas interpret mode on CPU (the reference has no
CPU-runnable path; this is the TPU rebuild's answer per SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # overwrite: the box presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored on this image (an axon TPU plugin wins);
# the config update reliably forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
