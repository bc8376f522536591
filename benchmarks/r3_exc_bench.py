"""Excited-state resident kernel: bf16 vs f32 l/Sl streams at 256³.

Measures sustained complex... real grid-point updates/s for S=1 and S=2
through ops/pallas_stencil.evolve_chunk_resident, with the stored-state
streams in f32 (round-2 baseline: 7.89e10 / 4.43e10) and bf16 (half the
HBM stream bytes — VERDICT r2 #5), plus the projection-quality check:
orthogonality of the evolved state against the f32 store.

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/r3_exc_bench.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wafer_tpu import geometry  # noqa: E402
from wafer_tpu.ops import pallas_stencil as pk  # noqa: E402

N = 256
STEPS = 200


def bench(n_lower: int, stream_dtype) -> None:
    order, ext = "ThreePoint", 1
    dn, dt, mass = 0.01, 3e-5, 1.0
    an = ("Harmonic", dn, dt, mass, N, N, N)
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    rng = np.random.default_rng(0)

    def rand_xpad():
        p = np.zeros((N + 2 * ext, N, N), np.float32)
        p[ext:-ext] = rng.normal(size=(N, N, N)).astype(np.float32)
        p[ext:-ext] /= np.sqrt(
            np.sum(p.astype(np.float64) ** 2)
        ).astype(np.float32)
        return jnp.asarray(p)

    phi = rand_xpad()
    lowers = [rand_xpad() for _ in range(n_lower)]
    store = jnp.stack(lowers)
    sls = []
    for w in lowers:
        sl, _n2, _ov = pk.evolve_step_fused(
            w, None, None, order, scale, 0, False, analytic=an
        )
        sls.append(sl)
    sstore = jnp.stack(sls)
    store_s = store.astype(stream_dtype)
    sstore_s = sstore.astype(stream_dtype)

    def chunk(p):
        return pk.evolve_chunk_resident(
            p, order, dt, dn, mass, STEPS, an,
            store_xpad=store_s, sstore_xpad=sstore_s,
        )

    def run_chain(p, reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            p = chunk(p)
        np.asarray(p[:1, :1, :8])
        return time.perf_counter() - t0, p

    tag = f"S={n_lower} {jnp.dtype(stream_dtype).name}"
    t0 = time.perf_counter()
    _t, p = run_chain(phi, 1)
    print(f"[exc {tag}] compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    best = 0.0
    for _ in range(3):
        t1, p = run_chain(p, 1)
        t3, p = run_chain(p, 3)
        per = max((t3 - t1) / 2.0, 1e-9)
        best = max(best, N ** 3 * STEPS / per)
    # projection quality vs the f32 store
    pn = np.asarray(p, np.float64)
    n2 = float(np.sum(pn * pn))
    ovs = [
        abs(float(np.sum(pn * np.asarray(w, np.float64)))) / np.sqrt(n2)
        for w in lowers
    ]
    print(
        f"[exc {tag}] sustained: {best:.4g} updates/s; "
        f"max |<l|psi>|/||psi|| = {max(ovs):.2e}",
        flush=True,
    )


if __name__ == "__main__":
    for nl in (1, 2):
        for sd in (jnp.float32, jnp.bfloat16):
            bench(nl, sd)
