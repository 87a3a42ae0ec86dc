"""Test harness config: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding paths compile and execute without TPU hardware (the driver separately
dry-runs the multichip path via __graft_entry__.dryrun_multichip).

Note: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel plugin) and
the plugin does not honor a later env-var override, so the platform is forced
through jax.config instead.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
