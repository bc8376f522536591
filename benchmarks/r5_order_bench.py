"""5/7-point stencil perf at production size (VERDICT r4 #3).

Usage (through the axon tunnel):
    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/r5_order_bench.py [N ...]

For every central-difference order at each grid size (default 256):
  1. dispatch check: print the exact ladder rung the solver's gates pick
     (resident / blocked deep-halo / K-fused) — a silent eligibility-gate
     fallback to a slow path at ext=2,3 would show up here;
  2. correctness: a few resident steps vs the XLA shifted-slice sweep at
     128^3 on-chip (max interior deviation);
  3. throughput: sustained grid-point updates/s of the picked kernel over
     STEPS-step chunks, chained-dispatch difference timing (see bench.py).

The reference's CentralDifference trade (src/config.rs:211-249) is
7-point accuracy per wall-clock vs 3-point at finer dn; these rows price
the wall side (the accuracy side: 64x64x128 harmonic measured offsets are
2.1e-3 at ThreePoint vs 7e-7 at SevenPoint, BASELINE.md round 2).
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)  # match the CLI's dtype policy

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wafer_tpu import geometry  # noqa: E402
from wafer_tpu.config import Config  # noqa: E402
from wafer_tpu.models import initial, potentials as pmod  # noqa: E402
from wafer_tpu.ops import pallas_stencil as pk  # noqa: E402
from wafer_tpu.ops.stencil import evolve_step  # noqa: E402

STEPS = 200
ORDERS = ["ThreePoint", "FivePoint", "SevenPoint"]


def make_config(n: int, order: str) -> Config:
    return Config.from_dict(
        {
            "project_name": "r5-order-bench",
            "grid": {"size": {"x": n, "y": n, "z": n}, "dn": 0.01, "dt": 3e-5},
            "tolerance": 1e-6,
            "central_difference": order,
            "wavenum": 0,
            "wavemax": 0,
            "output": {
                "screen_update": STEPS,
                "file_type": "Json",
                "save_wavefns": False,
                "save_potential": False,
            },
            "potential": "Harmonic",
            "mass": 1.0,
            "init_condition": "Boolean",
            "sig": 1.0,
            "init_symmetry": "NotConstrained",
            "precision": "f32",
        }
    )


def run_chain(chunk, p, reps):
    t0 = time.perf_counter()
    for _ in range(reps):
        p = chunk(p)
    np.asarray(p[:1, :1, :8])
    return time.perf_counter() - t0, p


def correctness(order: str) -> None:
    """128^3 on-chip: 4 resident steps vs the XLA array-factor sweep."""
    n = 128
    cfg = make_config(n, order)
    ext = cfg.central_difference.ext
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    an = ("Harmonic", dn, dt, mass, n, n, n)
    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, dt)
    ref = phi
    for _ in range(4):
        ref = evolve_step(
            ref, a.astype(jnp.float32), b.astype(jnp.float32), order, dt, dn,
            mass,
        )
    ref_int = np.asarray(geometry.work_area(ref, ext))
    del v, a, b
    t0 = time.perf_counter()
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, dt, dn, mass, 4, an
    )
    out_int = np.asarray(pk.from_xpad(out, ext))[ext:-ext, ext:-ext, ext:-ext]
    print(
        f"[{order} 128^3] compile+4 steps {time.perf_counter() - t0:.1f}s; "
        f"max dev vs XLA: {np.abs(out_int - ref_int).max():.3g} "
        f"(field rms {np.sqrt(np.mean(ref_int ** 2)):.3g})",
        flush=True,
    )


def probe(n: int, order: str) -> None:
    cfg = make_config(n, order)
    ext = cfg.central_difference.ext
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    an = ("Harmonic", dn, dt, mass, n, n, n)

    # -- dispatch check: what would solver.solve pick here? ---------------
    use_res = pk.resident_supported(n, n, n, ext, 4, True)
    resb = None if use_res else pk.pick_resb(n, n, n, ext, 4, STEPS)
    rung = (
        "VMEM-resident" if use_res
        else f"x-blocked deep-halo {resb}" if resb is not None
        else f"K-fused K={pk.pick_k_fuse(n, n, n, ext, 4, True)}"
    )
    print(f"[{order} {n}^3] solver rung: {rung}", flush=True)

    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)

    if use_res:
        def chunk(p):
            return pk.evolve_chunk_resident(p, order, dt, dn, mass, STEPS, an)

        p = pk.to_xpad(phi, ext)
    elif resb is not None:
        bx, r, tx, pf, _rate = resb

        def chunk(p):
            return pk.evolve_chunk_resident_blocked(
                p, order, dt, dn, mass, STEPS, an, bx=bx, r_steps=r, tx=tx,
                prefetch=pf,
            )

        p = pk.to_xpad_k(phi, ext, r)
    else:
        print(f"[{order} {n}^3] no kernel rung — skipping rate", flush=True)
        return

    t0 = time.perf_counter()
    _t, p = run_chain(chunk, p, 1)  # warm (compile)
    print(f"[{order} {n}^3] compile+first chunk {time.perf_counter() - t0:.1f}s",
          flush=True)
    rates = []
    for _ in range(5):
        t1, p = run_chain(chunk, p, 1)
        t3, p = run_chain(chunk, p, 3)
        per_chunk = max((t3 - t1) / 2.0, 1e-9)
        rates.append(n ** 3 * STEPS / per_chunk)
    med = sorted(rates)[len(rates) // 2]
    print(
        f"[{order} {n}^3] sustained: median {med:.4g} updates/s "
        f"(spread {min(rates):.3g}-{max(rates):.3g})",
        flush=True,
    )


if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [256]
    for order_ in ORDERS:
        correctness(order_)
        for n_ in sizes:
            probe(n_, order_)
