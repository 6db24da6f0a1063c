"""Test configuration: run on a virtual 8-device CPU mesh.

Real TPU hardware (single chip) is only used by bench.py; tests exercise
numerics and multi-device sharding on host CPU devices, per the project's
test strategy (SURVEY.md section 4.5).

Note: this container's sitecustomize registers the axon TPU plugin and
hard-sets jax_platforms='axon,cpu' at interpreter start, so plain
JAX_PLATFORMS/XLA_FLAGS env vars are ignored; the overrides must go through
jax.config before the first backend use.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # belt and braces
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
