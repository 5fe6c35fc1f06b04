"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

Kernels run in Pallas interpret mode on CPU (the reference has no
CPU-runnable path; this is the TPU rebuild's answer per SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # overwrite: the box presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Serialize XLA:CPU's LLVM codegen: the parallel split path segfaults
# rarely-but-fatally in long pytest processes (hundreds of compilations);
# one crash kills the whole suite.
os.environ["XLA_FLAGS"] = (
    os.environ["XLA_FLAGS"] + " --xla_cpu_parallel_codegen_split_count=1"
)

import jax  # noqa: E402

# The env var alone is not honored on this image (an axon TPU plugin wins);
# the config update reliably forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: reruns skip LLVM entirely (faster suite,
# fewer in-process compilations -> less exposure to compiler flakes).
jax.config.update("jax_compilation_cache_dir", "/tmp/mfa_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
