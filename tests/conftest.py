"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

The container's sitecustomize registers the axon TPU backend and exports
JAX_PLATFORMS=axon, so an explicit jax.config.update is required — env vars
alone don't stick.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# keep HF/transformers fully offline in tests
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
