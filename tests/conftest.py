"""Test configuration.

Multi-chip logic is exercised on a virtual 8-device CPU mesh
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`), per SURVEY.md
section 4.  These env vars must be set before jax is imported anywhere.
"""

import os
import sys

# The image pre-sets JAX_PLATFORMS=axon (the TPU tunnel); tests must force
# CPU *unconditionally* — setdefault is not enough, and the axon plugin can
# even override the env var, so we also pin the jax config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()

from msc_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture(scope="session")
def mock_loader():
    from msc_tpu.data.nuscenes import MockNuScenesLoader

    return MockNuScenesLoader()


@pytest.fixture(scope="session")
def mock_sample(mock_loader):
    return mock_loader.get_sample_by_scene_index(0, 0)
