"""Op dispatch: fused Pallas TPU kernels with jnp reference fallbacks.

Every interaction op has a jnp reference implementation (the ground truth,
ops/interactions.py) and may have a Pallas TPU kernel (ops/pallas/). Kernels
are used automatically when (a) the default backend is TPU and (b) they are
registered; ``RECMODELS_FORCE_REFERENCE=1`` or ``use_reference()`` forces the
jnp path everywhere (CPU tests, debugging, and the §4-item-1 kernel-vs-
reference parity tests).
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Dict

import jax

from recmodels_tpu.ops import interactions

_REFERENCE: Dict[str, Callable] = {
    "fm_pairwise": interactions.fm_pairwise,
    "dcn_cross_layer": interactions.dcn_cross_layer,
    "dcn_cross_stack": interactions.dcn_cross_stack,
    "pnn_inner_products": interactions.pnn_inner_products,
    "pnn_outer_product": interactions.pnn_outer_product,
    "cin_layer": interactions.cin_layer,
    "cin_stack": interactions.cin_stack,
    "cin_stack_dm": interactions.cin_stack_dm,
    "cin_stack_flat": interactions.cin_stack_flat,
    "cin_stack_dm_flat": interactions.cin_stack_dm_flat,
    "split_fused_rows": interactions.split_fused_rows,
}

_PALLAS: Dict[str, Callable] = {}

_force_reference = False


def register_pallas(name: str, fn: Callable) -> None:
    if name not in _REFERENCE:
        raise KeyError(f"unknown op: {name}")
    _PALLAS[name] = fn


@contextlib.contextmanager
def use_reference():
    """Force jnp reference implementations within the context."""
    global _force_reference
    prev = _force_reference
    _force_reference = True
    try:
        yield
    finally:
        _force_reference = prev


def _pallas_enabled() -> bool:
    if _force_reference or os.environ.get("RECMODELS_FORCE_REFERENCE") == "1":
        return False
    return jax.default_backend() not in ("cpu",)


def get_op(name: str) -> Callable:
    if name not in _REFERENCE:
        raise KeyError(f"unknown op: {name}")
    if _pallas_enabled() and name in _PALLAS:
        return _PALLAS[name]
    return _REFERENCE[name]


def _register_default_kernels() -> None:
    """Import Pallas kernels lazily; tolerate platforms without Mosaic."""
    try:
        from recmodels_tpu.ops.pallas import register_all

        register_all()
    except Exception:  # pragma: no cover - platform without Pallas support
        pass


_register_default_kernels()
