"""Probe: MXU (banded-matmul) formulation of the stencil sweep.

The resident kernel is VPU-bound (~1.27e11 updates/s at 256³, far below
the HBM ceiling in bytes), so VERDICT r2 #9 asks whether the derivative
can ride the MXU instead: each axis's stencil is a banded matrix, so
one sweep = three dense (N×N)@(N×N²) contractions + the elementwise
split-operator combine. The band is only (2·ext+1) wide — a dense MXU
contraction spends N/(2·ext+1) ≈ 85× the useful flops at 256³ — so the
expectation is negative; this probe measures it honestly (XLA-level,
letting the compiler schedule the MXU).

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/mxu_probe.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wafer_tpu import geometry  # noqa: E402
from wafer_tpu.ops.stencil import evolve_step  # noqa: E402

N = 256
STEPS = 50


def main() -> None:
    order, ext = "ThreePoint", 1
    dn, dt, mass = 0.01, 3e-5, 1.0
    offsets, coeffs, center_c, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    rng = np.random.default_rng(0)
    phi_int = jnp.asarray(rng.normal(size=(N, N, N)).astype(np.float32))

    # banded derivative matrix (Dirichlet: zero outside)
    d = np.zeros((N, N), np.float32)
    for j in range(N):
        d[j, j] = -center_c / 3.0  # split the centre across the three axes
        for off, cf in zip(offsets, coeffs):
            if j - off >= 0:
                d[j, j - off] = cf
            if j + off < N:
                d[j, j + off] = cf
    d = jnp.asarray(d)
    # B from the harmonic formula on interior coordinates
    idx = np.arange(N, dtype=np.float32) + 1.0 - (N + 1.0) / 2.0
    r2 = (
        idx[:, None, None] ** 2 + idx[None, :, None] ** 2
        + idx[None, None, :] ** 2
    )
    v = 0.5 * dn * dn * r2
    b = jnp.asarray(1.0 / (1.0 + 0.5 * dt * v))

    @jax.jit
    def mxu_chunk(p):
        def body(_i, q):
            acc = jnp.einsum(
                "ij,jyz->iyz", d, q, preferred_element_type=jnp.float32
            )
            acc += jnp.einsum(
                "ij,xjz->xiz", d, q, preferred_element_type=jnp.float32
            )
            acc += jnp.einsum(
                "ij,xyj->xyi", d, q, preferred_element_type=jnp.float32
            )
            return b * (2.0 * q + scale * acc) - q

        return jax.lax.fori_loop(0, STEPS, body, p)

    v_pad = jnp.pad(v, 1)
    bb = 1.0 / (1.0 + 0.5 * dt * v_pad)
    aa = (1.0 - 0.5 * dt * v_pad) * bb

    @jax.jit
    def xla_chunk(p):
        def body(_i, q):
            return evolve_step(q, aa, bb, order, dt, dn, mass)

        return jax.lax.fori_loop(0, STEPS, body, p)

    def run(chunk, p, label):
        def chain(p_, reps):
            t0 = time.perf_counter()
            for _ in range(reps):
                p_ = chunk(p_)
            np.asarray(p_[:1, :1, :8])
            return time.perf_counter() - t0, p_

        _t, p = chain(p, 1)
        best = 0.0
        for _ in range(3):
            t1, p = chain(p, 1)
            t3, p = chain(p, 3)
            per = max((t3 - t1) / 2.0, 1e-9)
            best = max(best, N ** 3 * STEPS / per)
        print(f"[mxu-probe] {label}: {best:.4g} updates/s", flush=True)
        return p

    run(mxu_chunk, phi_int, "einsum/MXU sweep (interior-only)")
    run(xla_chunk, jnp.pad(phi_int, 1), "XLA shifted-slice sweep")


if __name__ == "__main__":
    main()
