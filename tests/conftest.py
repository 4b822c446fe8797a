"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Mirrors the idiomatic "fake backend" for testing TPU mesh code
(SURVEY.md §4): sharding/collective paths compile and execute on host CPU
devices; numerical comparisons against the reference semantics use float64.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the environment's sitecustomize pins JAX_PLATFORMS to the TPU tunnel;
# config.update after import reliably forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REFERENCE_TESTCASES = "/root/reference/OpenHyperFLOW2D/TestCases"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-horizon golden/scaling runs (deselect with "
        "-m 'not slow')")
