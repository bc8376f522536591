"""Device→host transfer helpers.

Some PJRT backends (including the remote-TPU tunnel this framework is
developed against) do not implement complex-array host transfers; fetching
the real and imaginary parts separately works everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def device_get(arr) -> np.ndarray:
    """np.asarray that is safe for complex arrays on any backend."""
    if jnp.iscomplexobj(arr):
        re = np.asarray(jnp.real(arr))
        im = np.asarray(jnp.imag(arr))
        return re + 1j * im
    return np.asarray(arr)


def device_get_scalar(x):
    """Python scalar from a 0-d device value (complex-safe)."""
    if jnp.iscomplexobj(x):
        return complex(float(jnp.real(x)), float(jnp.imag(x)))
    return float(x)
