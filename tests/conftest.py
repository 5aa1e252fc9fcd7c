"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; pjit/shard_map correctness
is validated on virtual CPU devices instead (the TPU-native analog of a
fake backend).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms='axon,cpu' at interpreter
# start, which would route every test compile through the remote TPU tunnel
# (~80s per compile). Override it back to CPU before any backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
