"""256³ split-complex ground: x-blocked deep-halo resident vs K=2.

The round-2 number was 3.35e10 complex updates/s (K=2 split kernel —
the (re, im) pair misses whole-array VMEM residency at 129 MiB). The
blocked kernel holds both components of one x-block resident (VERDICT r2
#4: "256³ complex ≥ 6e10 on chip"). Correctness vs the 1-step fused
split sweep on-chip, then sustained throughput.

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/r3_split_bench.py
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wafer_tpu import geometry  # noqa: E402
from wafer_tpu.ops import pallas_split as ps  # noqa: E402

N = 256
STEPS = 200


def main() -> None:
    order, ext = "ThreePoint", 1
    dn, dt, mass, absorb = 0.01, 3e-5, 1.0, 0.2
    an = ("Harmonic", dn, dt, mass, N, N, N, 1.0, 0.0, absorb)
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    force = os.environ.get("WAFER_RESB_SC_FORCE")
    plan = ps.pick_resb_sc(N, N, N, ext, 4, STEPS)
    print(f"[split {N}^3] pick_resb_sc -> {plan}", flush=True)
    if force:
        parts = [int(x) for x in force.split(",")]
        bx, r, tx = parts[:3]
        pf = bool(parts[3]) if len(parts) > 3 else False
    elif plan is None:
        return
    else:
        bx, r, tx, pf, _rate = plan
    print(f"[split {N}^3] using bx={bx} r={r} tx={tx} prefetch={pf}", flush=True)

    rng = np.random.default_rng(0)
    pr = np.zeros((N + 2 * ext,) * 3, np.float32)
    pi = np.zeros((N + 2 * ext,) * 3, np.float32)
    pr[ext:-ext, ext:-ext, ext:-ext] = rng.normal(size=(N, N, N)).astype(
        np.float32
    )
    pi[ext:-ext, ext:-ext, ext:-ext] = rng.normal(size=(N, N, N)).astype(
        np.float32
    )
    pr, pi = jnp.asarray(pr), jnp.asarray(pi)

    # correctness: r blocked steps vs the 1-step fused split sweep
    ref2 = ps.to_xpad_sc(pr, pi, ext)
    for _ in range(r):
        ref2, _n2, _ov = ps.evolve_step_fused_sc(
            ref2, None, None, order, scale, 0, False, analytic=an
        )
    rr, ri = ps.from_xpad_sc(ref2, ext)
    t0 = time.perf_counter()
    out2 = ps.evolve_chunk_resident_blocked_sc(
        ps.to_xpad_k_sc(pr, pi, ext, r), order, dt, dn, mass, r, an,
        bx=bx, r_steps=r, tx=tx, prefetch=pf,
    )
    or_, oi_ = ps.from_xpad_k_sc(out2, ext, r)
    dev = max(
        np.abs(np.asarray(or_) - np.asarray(rr)).max(),
        np.abs(np.asarray(oi_) - np.asarray(ri)).max(),
    )
    print(
        f"[split {N}^3] bx={bx} r={r} tx={tx} compile+first "
        f"{time.perf_counter() - t0:.1f}s; max dev vs 1-step after {r} "
        f"steps: {dev:.3g}",
        flush=True,
    )

    def chunk(p2):
        return ps.evolve_chunk_resident_blocked_sc(
            p2, order, dt, dn, mass, STEPS, an, bx=bx, r_steps=r, tx=tx,
            prefetch=pf,
        )

    def run_chain(p2, reps):
        t0_ = time.perf_counter()
        for _ in range(reps):
            p2 = chunk(p2)
        np.asarray(p2[:1, :1, :8])
        return time.perf_counter() - t0_, p2

    p2 = ps.to_xpad_k_sc(pr, pi, ext, r)
    _t, p2 = run_chain(p2, 1)
    best = 0.0
    for _ in range(3):
        t1, p2 = run_chain(p2, 1)
        t3, p2 = run_chain(p2, 3)
        per = max((t3 - t1) / 2.0, 1e-9)
        best = max(best, N ** 3 * STEPS / per)
    print(
        f"[split {N}^3] blocked-resident sustained: {best:.4g} complex "
        "updates/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
