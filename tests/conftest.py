"""Test configuration: force an 8-device virtual CPU platform.

The image's sitecustomize pins jax_platforms to the 'axon' TPU tunnel, so
an env var alone is not enough — we override the config knob directly
(before any backend is initialized) and request 8 virtual CPU devices so
the multi-chip sharding paths are testable without TPUs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
