"""Pallas TPU kernels for the interaction ops.

Populated in P3 (SURVEY.md §7). ``register_all()`` installs every available
kernel into the dispatch table; it is safe to call on any platform (kernels
only *run* on TPU — dispatch gates on backend).
"""


def register_all() -> None:
    from recmodels_tpu.ops import dispatch

    try:
        from recmodels_tpu.ops.pallas import interactions_tpu
    except ImportError:  # Pallas unavailable on this platform
        return
    for name, fn in interactions_tpu.KERNELS.items():
        dispatch.register_pallas(name, fn)
    for name, fn in interactions_tpu.FUSED.items():
        dispatch.register_pallas(name, fn)
