"""Test harness: hermetic 8-device virtual CPU mesh.

Tests must not depend on the real TPU chip: numerical checks assume true
IEEE f64 (the TPU demotes f64 matmuls), and sharding tests want 8 virtual
devices. Two layers of defense because this environment's sitecustomize
registers an ``axon`` TPU platform and force-selects it via
``jax.config.jax_platforms`` before conftest runs:

1. env vars (effective when the sitecustomize registration is skipped), and
2. an explicit ``jax.config.update`` which wins over the plugin's selection
   as long as no backend has been initialized yet.

Fast local loop: ``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest``
skips the ~60s axon tunnel registration entirely.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
