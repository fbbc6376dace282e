"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on virtual CPU devices (the driver separately dry-runs the multi-chip path).
The environment pins JAX_PLATFORMS=axon (single real TPU via a tunnel) and
overrides env-var changes, so we force CPU through jax.config — unit tests
must not burn TPU time (set JTPU_TEST_TPU=1 to override).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("JTPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
