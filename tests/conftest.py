"""Test harness: 8 virtual CPU devices (SURVEY.md §4 item 3 — JAX's analog of
Spark's local[K]: the full shard_map/all_to_all/psum path runs unmodified on
fake devices).

Note: this environment's sitecustomize registers the experimental ``axon``
TPU backend and re-sets ``jax_platforms`` at import time, so the env var
alone is not enough — we must also update the config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["RECMODELS_FORCE_REFERENCE"] = "1"  # jnp ops on CPU; kernel parity tests opt in

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
