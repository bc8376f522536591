"""Grid geometry: padded arrays, work-area views, coordinate fields.

The reference allocates every field at ``(N + bb)³`` with a ``bb = 2·ext``
bounding box and slices off an ``ext``-wide halo for compute
(src/grid.rs:505-534, src/config.rs:222-239). The halo holds the Dirichlet
zero shell on the global boundary and is the seam along which sharded runs
exchange ghost cells.

All functions are pure and jit-safe (static shapes only).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def work_area(arr: jnp.ndarray, ext: int) -> jnp.ndarray:
    """Interior view: drop an ``ext``-wide frame from all six faces
    (reference: src/grid.rs:505-513)."""
    if ext == 0:
        return arr
    return arr[ext:-ext, ext:-ext, ext:-ext]


def set_work_area(arr: jnp.ndarray, ext: int, value: jnp.ndarray) -> jnp.ndarray:
    """Functional counterpart of the reference's mutable work-area view
    (src/grid.rs:526-534): returns ``arr`` with its interior replaced."""
    if ext == 0:
        return value
    return arr.at[ext:-ext, ext:-ext, ext:-ext].set(value)


def frame_with_halo(interior: jnp.ndarray, ext: int) -> jnp.ndarray:
    """Embed an interior-size array into a zero-framed padded array."""
    if ext == 0:
        return interior
    return jnp.pad(interior, ext)


def zero_boundary(arr: jnp.ndarray, ext: int) -> jnp.ndarray:
    """Force the ``ext``-wide Dirichlet shell on all six faces to zero
    (reference: src/config.rs:597-622)."""
    if ext == 0:
        return arr
    interior = arr[ext:-ext, ext:-ext, ext:-ext]
    return jnp.pad(interior, ext)


def padded_index_grids(padded_size: Tuple[int, int, int], dtype=jnp.float64):
    """Float index coordinates (i, j, k) over the full padded array.

    The reference evaluates built-in potentials on *padded* indices
    (src/potential.rs:46-62), so the potential centre sits at
    ``(N+1)/2`` in padded coordinates."""
    i = jnp.arange(padded_size[0], dtype=dtype)[:, None, None]
    j = jnp.arange(padded_size[1], dtype=dtype)[None, :, None]
    k = jnp.arange(padded_size[2], dtype=dtype)[None, None, :]
    return i, j, k


def r2_index_grid(
    size: Tuple[int, int, int],
    grid_size: Tuple[int, int, int],
    dtype=jnp.float64,
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """Squared index-space distance from the grid centre.

    Implements ``calculate_r2`` (reference: src/potential.rs:366-371):
    ``dx = i − (Nx+1)/2`` etc., evaluated on index grids of shape ``size``
    (optionally shifted by ``offset``, used for sharded sub-blocks). Note the
    result is in *index* units — the caller multiplies by ``dn²`` if physical
    distance is required; the ⟨r²⟩ observable uses raw index units, matching
    the reference (src/grid.rs:428-437)."""
    cx = (grid_size[0] + 1.0) / 2.0
    cy = (grid_size[1] + 1.0) / 2.0
    cz = (grid_size[2] + 1.0) / 2.0
    i = jnp.arange(size[0], dtype=dtype)[:, None, None] + offset[0]
    j = jnp.arange(size[1], dtype=dtype)[None, :, None] + offset[1]
    k = jnp.arange(size[2], dtype=dtype)[None, None, :] + offset[2]
    dx = i - cx
    dy = j - cy
    dz = k - cz
    return dx * dx + dy * dy + dz * dz


def calculate_r2(idx: Tuple[int, int, int], grid_size: Tuple[int, int, int], ) -> float:
    """Scalar version of :func:`r2_index_grid` for tests/goldens
    (reference: src/potential.rs:366-371)."""
    dx = idx[0] - (grid_size[0] + 1.0) / 2.0
    dy = idx[1] - (grid_size[1] + 1.0) / 2.0
    dz = idx[2] - (grid_size[2] + 1.0) / 2.0
    return float(dx * dx + dy * dy + dz * dz)


def block_slices(global_size: Tuple[int, int, int], mesh_shape: Tuple[int, int, int],
                 coords: Tuple[int, int, int]):
    """Slices of the global interior owned by mesh block ``coords``.

    Axes must divide evenly (enforced by the sharded solver)."""
    out = []
    for n, m, c in zip(global_size, mesh_shape, coords):
        if n % m != 0:
            raise ValueError(f"grid axis {n} not divisible by mesh axis {m}")
        step = n // m
        out.append(slice(c * step, (c + 1) * step))
    return tuple(out)


def stencil_coefficients(order: str):
    """Per-axis central-difference tap weights and normalisation.

    Returns ``(offsets, coeffs, center, k)`` such that the 3D Laplacian-like
    numerator used by the reference is
    ``Σ_axis Σ_o coeffs[o]·ψ(shift o) − center·ψ`` with denominator
    ``k·dn²·mass`` *including* the factor 2 from ∇²/(2m)
    (reference: src/grid.rs:568-663):

    - ThreePoint: taps ±1 → [1, 1], center 6, k = 2
    - FivePoint:  taps ±1, ±2 → [16, −1], center 90, k = 24
    - SevenPoint: taps ±1..±3 → [270, −27, 2], center 1470, k = 360
    """
    if order == "ThreePoint":
        return ((1,), (1.0,), 6.0, 2.0)
    if order == "FivePoint":
        return ((1, 2), (16.0, -1.0), 90.0, 24.0)
    if order == "SevenPoint":
        return ((1, 2, 3), (270.0, -27.0, 2.0), 1470.0, 360.0)
    raise ValueError(f"unknown central difference order: {order}")
