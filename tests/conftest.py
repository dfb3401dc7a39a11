"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding behaviour is
validated on ``xla_force_host_platform_device_count=8`` CPU devices, exactly
as the driver's ``dryrun_multichip`` does.  Must run before jax is imported.
"""

import os

# Force, don't setdefault: this environment pins JAX_PLATFORMS=axon (the
# tunnelled TPU); tests must run on host CPU or every jit goes through the
# remote-compile tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter startup (to
# register the axon TPU plugin), so jax's config already captured
# JAX_PLATFORMS=axon from the environment — override it via the live config
# too (effective as long as no backend has been initialised yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests")


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices[:8]
