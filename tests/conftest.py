"""Test config: force CPU JAX with an 8-device virtual mesh (stands in for a
v5e-8 slice; SURVEY §4 test strategy) before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# XLA:CPU's default matmul path (oneDNN) is low-precision (~bf16-level error
# vs torch fp32); golden parity tests need true fp32 accumulation.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
