"""On-chip validation + benchmark of the x-blocked deep-halo resident kernel.

Usage (through the axon tunnel):
    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/resb_probe.py [N]

For each grid size (default 512, or the sizes given as args):
  1. correctness: a few blocked deep-halo steps vs the XLA shifted-slice
     sweep with array A/B factors (the reference rule, src/grid.rs:544-687)
     — max interior deviation printed;
  2. throughput: sustained grid-point updates/s over 200-step chunks with
     chained-dispatch difference timing (see bench.py for why).
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


def make_config(n: int) -> Config:
    return Config.from_dict(
        {
            "project_name": "resb-probe",
            "grid": {"size": {"x": n, "y": n, "z": n}, "dn": 0.01, "dt": 3e-5},
            "tolerance": 1e-6,
            "central_difference": "ThreePoint",
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


def probe(n: int) -> None:
    cfg = make_config(n)
    order = cfg.central_difference.value
    ext = cfg.central_difference.ext
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    an = ("Harmonic", dn, dt, mass, n, n, n)
    import os

    force = os.environ.get("WAFER_RESB_FORCE")  # "bx,r,tx,prefetch" override
    plan = pk.pick_resb(n, n, n, ext, 4, STEPS)
    print(f"[{n}^3] pick_resb -> {plan}", flush=True)
    if force:
        parts = [int(x) for x in force.split(",")]
        bx, r, tx = parts[:3]
        pf = bool(parts[3]) if len(parts) > 3 else False
        rate = 0.0
    elif plan is None:
        return
    else:
        bx, r, tx, pf, rate = plan
    print(
        f"[{n}^3] bx={bx} r={r} tx={tx} prefetch={pf} modeled "
        f"{rate * 1.27e11:.3g} updates/s",
        flush=True,
    )

    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)

    # -- correctness: r blocked steps vs the XLA array-factor sweep -------
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, dt)
    ref = phi
    for _ in range(r):
        ref = evolve_step(
            ref, a.astype(jnp.float32), b.astype(jnp.float32), order, dt, dn,
            mass,
        )
    ref_int = np.asarray(geometry.work_area(ref, ext))
    del v, a, b
    t0 = time.perf_counter()
    out = pk.evolve_chunk_resident_blocked(
        pk.to_xpad_k(phi, ext, r), order, dt, dn, mass, r, an, bx=bx,
        r_steps=r, tx=tx, prefetch=pf,
    )
    out_int = np.asarray(pk.from_xpad_k(out, ext, r))[
        ext:-ext, ext:-ext, ext:-ext
    ]
    print(
        f"[{n}^3] compile+first pass {time.perf_counter() - t0:.1f}s; "
        f"max dev vs XLA after {r} steps: "
        f"{np.abs(out_int - ref_int).max():.3g} "
        f"(field rms {np.sqrt(np.mean(ref_int ** 2)):.3g})",
        flush=True,
    )

    # -- throughput -------------------------------------------------------
    def chunk(p):
        return pk.evolve_chunk_resident_blocked(
            p, order, dt, dn, mass, STEPS, an, bx=bx, r_steps=r, tx=tx,
            prefetch=pf,
        )

    p = pk.to_xpad_k(phi, ext, r)
    _t, p = run_chain(chunk, p, 1)  # warm (chunk graph compile)
    best = 0.0
    for _ in range(3):
        t1, p = run_chain(chunk, p, 1)
        t3, p = run_chain(chunk, p, 3)
        per_chunk = max((t3 - t1) / 2.0, 1e-9)
        best = max(best, n ** 3 * STEPS / per_chunk)
    print(f"[{n}^3] blocked-resident sustained: {best:.4g} updates/s", flush=True)


if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [512]
    for n_ in sizes:
        probe(n_)
