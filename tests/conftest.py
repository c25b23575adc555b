"""Test configuration: run everything on CPU with 8 virtual devices.

This simulates a TPU v5e-8 style mesh without hardware, per the reference's
missing distributed-test story (SURVEY.md §4): multi-device behavior must be
testable single-process.
"""
import os

# Must be set before jax initializes its backends.  The ambient axon TPU
# plugin ignores the JAX_PLATFORMS env var, so use jax.config (which wins);
# TPU bf16 matmuls would otherwise break fp32 parity tolerances.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
