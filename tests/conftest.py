"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests emulate a TPU slice via
``--xla_force_host_platform_device_count`` (the standard JAX recipe for
testing pjit/shard_map layouts without hardware). Must be set before jax
imports anywhere.

Exception: the TPU test lane (``tools/run_tpu_tests.py``) sets
OGT_TPU_TESTS=1 to keep the attached TPU backend so that the
hardware-PRNG-gated exactness tests (marked ``tpu``) actually execute.
"""

import os

_TPU_LANE = os.environ.get("OGT_TPU_TESTS") == "1"

if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so
# env vars alone are too late — force the platform via config as well.
import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

# A developer's lingering OGT_AGENTS shell variable must not leak into the
# suite (it filters benchmark rosters and can SystemExit when empty).
os.environ.pop("OGT_AGENTS", None)

REFERENCE_DIR = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_DIR / "newsvendor.py").exists()


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference envs as a live oracle (dev-time only).

    Tests using this fixture are skipped when the reference checkout is not
    present; the hardcoded goldens in test_parity_golden.py are the permanent
    record.
    """
    if not reference_available():
        pytest.skip("reference repo not available")
    sys.path.insert(0, str(REFERENCE_DIR))
    import newsvendor as ref_newsvendor  # noqa
    import inventory_management as ref_inv  # noqa
    import network_management as ref_net  # noqa
    import network_management_custom as ref_net_custom  # noqa
    return dict(newsvendor=ref_newsvendor, inv=ref_inv, net=ref_net,
                net_custom=ref_net_custom)
