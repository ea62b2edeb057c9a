"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (SURVEY.md §4 implication (d)).

Note: this image's sitecustomize pre-registers the `axon` TPU platform and
pins JAX_PLATFORMS=axon, so a plain env var is not enough — we must override
via jax.config before any backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
