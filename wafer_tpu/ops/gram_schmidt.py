"""Normalisation and Gram-Schmidt orthogonalisation.

The reference projects the active state against every converged lower state
sequentially, allocating a fresh overlap buffer per state
(src/grid.rs:454-492). Here overlaps are single fused reductions; the
sequential subtraction order is preserved (stored states need not be exactly
mutually orthogonal, so order matters).

Unlike the reference (its TODO at src/grid.rs:311,456), inner products use
complex conjugation, so the complex-ψ path is correct.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def get_norm_squared(w: jnp.ndarray) -> jnp.ndarray:
    """⟨ψ|ψ⟩ (reference: src/grid.rs:454-457). Real, even for complex ψ.

    Computed over the full padded array: the halo is identically zero, so
    this equals the reference's work-area reduction."""
    if jnp.iscomplexobj(w):
        return jnp.sum(jnp.real(w) ** 2 + jnp.imag(w) ** 2)
    return jnp.sum(w * w)


def normalise_wavefunction(w: jnp.ndarray, norm2) -> jnp.ndarray:
    """ψ / √norm2 (reference: src/grid.rs:459-468)."""
    return w / jnp.sqrt(norm2).astype(w.dtype)


def orthogonalise_wavefunction(
    w: jnp.ndarray, w_store: Optional[jnp.ndarray], n_lower: int
) -> jnp.ndarray:
    """Sequentially project out each stored lower state
    (reference: src/grid.rs:477-492):

        for each lower: ψ ← ψ − lower·⟨lower|ψ⟩

    ``w_store`` is a stacked ``(n_states, ...)`` array; ``n_lower`` is static
    so the (small) loop unrolls inside jit."""
    if n_lower == 0 or w_store is None:
        return w
    for s in range(n_lower):
        lower = w_store[s]
        overlap = jnp.sum(jnp.conj(lower) * w)
        w = w - lower * overlap
    return w
