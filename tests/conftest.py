"""Test harness: 8 virtual CPU devices (SURVEY.md §4 item 3 — JAX's analog of
Spark's local[K]: the full shard_map/all_to_all/psum path runs unmodified on
fake devices).

Two lanes (SURVEY.md §4 item 1 "on CPU and TPU"):
  * default        — CPU backend, jnp reference ops, Pallas in interpret mode;
  * RECMODELS_TPU_TESTS=1 — real-chip lane: keeps the attached TPU backend so
    ``pytest -m tpu`` COMPILES the Pallas kernels on hardware and checks
    their numerics against the jnp references (tests/test_tpu_kernels.py).
    Non-tpu tests are not supported in this lane (they assume CPU).

Note: this environment's sitecustomize registers the experimental ``axon``
TPU backend and re-sets ``jax_platforms`` at import time, so the env var
alone is not enough — we must also update the config after import.
"""

import os

import pytest

TPU_LANE = bool(os.environ.get("RECMODELS_TPU_TESTS"))

if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["RECMODELS_FORCE_REFERENCE"] = "1"  # jnp ops on CPU; kernel parity tests opt in
else:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_collection_modifyitems(config, items):
    marker = (
        pytest.mark.skip(reason="tpu lane: RECMODELS_TPU_TESTS=1 pytest -m tpu")
        if not TPU_LANE
        else pytest.mark.skip(reason="CPU-lane test (run without RECMODELS_TPU_TESTS)")
    )
    want_tpu = TPU_LANE
    for it in items:
        if ("tpu" in it.keywords) != want_tpu:
            it.add_marker(marker)
