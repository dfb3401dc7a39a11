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
    config.addinivalue_line(
        "markers",
        "smoke: fast green-ness subset (<10 min on this 1-core host): "
        "config merge, expansion math, LR schedule, train/eval steps, "
        "transform geometry oracles, param-count parity.  Run with "
        "`pytest -m smoke`; the full suite is unchanged.")


# Smoke tier membership (VERDICT r4 #4): cheap to check, wide blast
# radius — these cover the invariants every other feature builds on.
_SMOKE_MODULES = {"test_config", "test_expansion", "test_train"}
_SMOKE_TESTS = {
    "test_param_count_parity",                       # the param oracle
    "test_train_sampling_matches_reference_oracle",  # temporal indices
    "test_eval_sampling_matches_reference_oracle",
    "test_uniform_crop_center_offsets",              # crop geometry
    "test_uniform_crop_left_right",
    "test_short_side_resize_geometry",
    "test_flip_bug_replication_flag",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if item.module.__name__ in _SMOKE_MODULES or base in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices[:8]
