"""Test configuration: force a virtual 8-device CPU mesh so sharding/collective
code paths are exercised without TPU hardware (and without occupying the real
chip during CI-style runs)."""

import os

# Must be set before jax is imported anywhere. Force (not setdefault): the
# surrounding shell may export JAX_PLATFORMS=axon for the real chip, and the
# CLIs re-apply the env var in-process (jax_setup.honor_platform_env), which
# would flip an in-process CLI test -- and every test after it -- onto the
# tunneled TPU (1 device, hangs if the chip is held elsewhere).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The JAX_PLATFORMS env var is not honored by this jax build when the axon TPU
# plugin is present; force CPU through the config API before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
