"""Test configuration: run on CPU with 8 virtual devices and x64 enabled.

The driver's bench runs on the real TPU chip; tests run on the host CPU so
that (a) f64 goldens hit the 1e-12 parity target and (b) multi-chip sharding
is exercised on a virtual 8-device mesh (the standard
--xla_force_host_platform_device_count trick, SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
