"""Platform helpers: detect TPU vs CPU and pick Pallas interpret mode."""

import functools

import jax


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    """True when the default JAX backend is a TPU-like device."""
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    plat = dev.platform.lower()
    return "tpu" in plat or plat == "axon"


def default_interpret_mode() -> bool:
    """Pallas kernels run interpreted off-TPU so tests pass on CPU."""
    return not on_tpu()
