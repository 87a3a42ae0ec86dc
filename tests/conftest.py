"""Test harness config: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding paths compile and execute without TPU hardware (the driver separately
dry-runs the multichip path via __graft_entry__.dryrun_multichip).

Note: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel plugin) and
the plugin does not honor a later env-var override, so the platform is forced
through jax.config instead.
"""

import os
import sys

# FAC_REAL_DEVICE=1 keeps the real accelerator visible — used by the
# throughput-floor test (tests/test_perf_floor.py), which is meaningless on
# the CPU mesh. Everything else runs on the virtual 8-device CPU mesh.
if os.environ.get("FAC_REAL_DEVICE") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

# Keep the persistent capacity cache (ops/packed_bitap._PersistentCaps) out
# of the user's real cache dir: tests build hundreds of tiny engines and
# would otherwise litter it. A test that wants the real behavior overrides
# FAC_CAP_CACHE itself.
if "FAC_CAP_CACHE" not in os.environ and "FAC_NO_CAP_CACHE" not in os.environ:
    import tempfile

    os.environ["FAC_CAP_CACHE"] = tempfile.mkdtemp(prefix="fac_caps_")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("FAC_REAL_DEVICE") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --- fast default subset -----------------------------------------------------
# The heaviest interpret-mode differential tests are marked ``slow`` and
# skipped by default so the standard `pytest tests/` run stays under ~3
# minutes (it grew ~3x per round). The CI "full" job (and any local run)
# re-enables them with FAC_FULL_TESTS=1 or `-m slow`.

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy interpret-mode differential suites; skipped unless "
        "FAC_FULL_TESTS=1 or an explicit -m expression selects them",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("FAC_FULL_TESTS") == "1":
        return
    if config.getoption("-m"):
        return  # an explicit marker expression overrides the default skip
    skip = pytest.mark.skip(
        reason="slow differential suite: run with FAC_FULL_TESTS=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
