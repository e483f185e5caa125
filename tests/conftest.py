"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
without TPU hardware.  Environment must be set before JAX initializes its
backends, hence module-level assignment here (pytest imports conftest first).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config update wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pvot.io.synthetic import SyntheticSpec, generate_gray_video  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop JAX's in-process executable caches after each test module.

    The full suite (but no file subset — bisected) deterministically
    segfaults inside jaxlib's native deserialize_executable
    (compilation_cache.get_executable_and_time) when a persistent-cache
    READ happens late in a long process: ~200 tests of accumulated live
    CPU executables, then the big serving program's warm-cache hit crashes
    (fds=11, threads=20, RSS 6.7 GB at crash — not resource exhaustion;
    the same entry deserializes fine at low accumulation).  Clearing the
    in-process caches between modules keeps every module's accumulation at
    the level the bisect runs proved safe; recompiles across modules stay
    cheap through the persistent cache."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def small_spec():
    """Small clip: fast on CPU, still exercises real geometry."""
    return SyntheticSpec(
        width=320, height=240, num_frames=40, target_w=32, target_h=32, seed=7
    )


@pytest.fixture(scope="session")
def small_video(small_spec):
    return generate_gray_video(small_spec)


@pytest.fixture(scope="session")
def reenter_spec():
    """Clip where the target exits and re-enters the frame (global search)."""
    return SyntheticSpec(
        width=320,
        height=240,
        num_frames=60,
        target_w=32,
        target_h=32,
        seed=3,
        exit_and_reenter=True,
    )


@pytest.fixture(scope="session")
def reenter_video(reenter_spec):
    return generate_gray_video(reenter_spec)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
