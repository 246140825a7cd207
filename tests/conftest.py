"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that sharding/collective
code paths are exercised without TPU hardware (the driver's
``dryrun_multichip`` does the same). These env vars must be set before
JAX initialises its backends, hence the top-of-file placement.
"""

import os
import sys

# hard override: the container sets JAX_PLATFORMS=axon (remote TPU
# tunnel); tests must run on local virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
