"""Test fixture: a virtual 8-device CPU mesh.

TPU-equivalent of the reference's multi-process localhost launcher
(`python/hetu/launcher.py`, `tests/pstests/local_s2_w2.yml`): distributed
semantics are tested on N virtual CPU devices instead of real chips.

The environment's sitecustomize pins `jax_platforms` to the TPU plugin, so
the override must go through jax.config, not the JAX_PLATFORMS env var.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
