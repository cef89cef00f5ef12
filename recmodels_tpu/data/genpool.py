"""Jax-free batch-generation pool workers (used by train.loop).

Lives in its own module so spawned children import ONLY numpy-side code:
importing jax in a worker is both slow and dangerous on this platform —
the environment's sitecustomize registers the tunneled TPU backend in
every python process, and a worker's register() can block on the chip
grant the parent already holds (observed as a wedged Pool with zero
children doing work). ``spawn_env()`` additionally strips the TPU
registration variables so even an accidental jax import in a child stays
CPU-only.
"""

from __future__ import annotations

import contextlib
import os
import pickle

_POOL_SRC = None


def pool_init(src_bytes: bytes) -> None:
    global _POOL_SRC
    _POOL_SRC = pickle.loads(src_bytes)


def pool_make(step: int):
    b = _POOL_SRC._make(step)
    return b.dense, b.ids, b.labels


@contextlib.contextmanager
def spawn_env():
    """Temporarily scrub TPU/tunnel env vars so spawned children (which
    inherit os.environ) never register the tunneled backend."""
    saved = {}
    for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS"):
        if k in os.environ:
            saved[k] = os.environ.pop(k)
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        yield
    finally:
        os.environ.pop("JAX_PLATFORMS", None)
        os.environ.update(saved)


def make_pool(source, workers: int):
    """Spawn a generation pool for a random-access source (pure
    ``_make(step)``); returns None when unsupported."""
    import multiprocessing as mp

    from recmodels_tpu.data.criteo import SyntheticSource

    if not isinstance(source, SyntheticSource) or workers <= 1:
        return None
    ctx = mp.get_context("spawn")
    with spawn_env():
        return ctx.Pool(workers, initializer=pool_init,
                        initargs=(pickle.dumps(source),))
