"""Test harness config: run JAX on CPU with 8 virtual devices.

jax is preimported by the environment with a TPU ('axon') platform already
registered, so env vars alone are not enough — we must flip jax.config before
any backend is initialized.  Tests therefore run on an 8-device virtual CPU
mesh; TPU execution is exercised by bench.py and the driver's compile checks.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
