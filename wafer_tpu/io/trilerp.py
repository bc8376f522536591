"""Trilinear resampling for resolution-changing restarts.

Matches the reference ``trilerp_resize`` (src/input.rs:667-716) exactly: the
output grid is ``linspace(0, n_src−1, n_out)`` per axis, the bracketing cell
is the first source index strictly greater than the lookup (clamped to the
last cell), and corners blend with unit-spacing weights. This enables the
documented coarse→fine restart speedup (src/config.rs:156-160).
"""

from __future__ import annotations

import numpy as np


def _brackets(n_src_minus1: int, look: np.ndarray):
    """(x0, x1) per reference rule: first xx in 0..n−1 with xx > look, else
    (n−1, n)."""
    x1 = np.floor(look).astype(np.int64) + 1
    x1 = np.clip(x1, 1, n_src_minus1)
    x0 = x1 - 1
    return x0, x1


def trilerp_resize(v: np.ndarray, size) -> np.ndarray:
    """Resample ``v`` to ``size`` with trilinear interpolation."""
    v = np.asarray(v)
    nx, ny, nz = v.shape[0] - 1, v.shape[1] - 1, v.shape[2] - 1

    xi = np.linspace(0.0, nx, size[0])
    yi = np.linspace(0.0, ny, size[1])
    zi = np.linspace(0.0, nz, size[2])

    x0, x1 = _brackets(nx, xi)
    y0, y1 = _brackets(ny, yi)
    z0, z1 = _brackets(nz, zi)

    xd = (xi - x0)[:, None, None]
    yd = (yi - y0)[None, :, None]
    zd = (zi - z0)[None, None, :]

    def g(a, b, c):
        return v[np.ix_(a, b, c)]

    c00 = g(x0, y0, z0) * (1 - xd) + g(x1, y0, z0) * xd
    c01 = g(x0, y0, z1) * (1 - xd) + g(x1, y0, z1) * xd
    c10 = g(x0, y1, z0) * (1 - xd) + g(x1, y1, z0) * xd
    c11 = g(x0, y1, z1) * (1 - xd) + g(x1, y1, z1) * xd

    c0 = c00 * (1 - yd) + c10 * yd
    c1 = c01 * (1 - yd) + c11 * yd

    return c0 * (1 - zd) + c1 * zd
