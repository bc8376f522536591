"""Excited-state throughput with delayed re-orthogonalisation (VERDICT r4 #4).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/r5_dgs_bench.py [N]

Measures at N^3 (default 256), f32, ThreePoint:
  1. per-step-GS resident excited kernel, S=1 and S=2 (bf16 l/Sl streams)
     — the reference-cadence path (src/grid.rs:674-681);
  2. the per-step-norm ground resident kernel — what an excited chunk runs
     when solver.delayed_gram_gate engages (no l/Sl streams at all; the
     projection moves to the measure boundary, amortised over
     screen_update steps).

The delayed rate is S-independent: every stored state drops out of the
hot loop. Plus correctness: one delayed cadence (psn chunk + boundary
projection) vs per-step GS on-chip at 128^3 — orthogonality and field
agreement at the gate's predicted bound.
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wafer_tpu import geometry  # noqa: E402
from wafer_tpu.config import Config  # noqa: E402
from wafer_tpu.models import initial  # noqa: E402
from wafer_tpu.ops import pallas_stencil as pk  # noqa: E402

STEPS = 200


def make_config(n: int) -> Config:
    return Config.from_dict(
        {
            "project_name": "r5-dgs",
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


def median_rate(chunk, p, n_updates, label):
    t0 = time.perf_counter()
    _t, p = run_chain(chunk, p, 1)
    print(f"  [{label}] compile+first chunk {time.perf_counter() - t0:.1f}s",
          flush=True)
    rates = []
    for _ in range(5):
        t1, p = run_chain(chunk, p, 1)
        t3, p = run_chain(chunk, p, 3)
        rates.append(n_updates / max((t3 - t1) / 2.0, 1e-9))
    med = sorted(rates)[len(rates) // 2]
    print(f"  [{label}] median {med:.4g} updates/s "
          f"(spread {min(rates):.3g}-{max(rates):.3g})", flush=True)
    return med


def normalised_states(cfg, seeds):
    rng_states = []
    for s in seeds:
        rng = np.random.default_rng(s)
        w = geometry.zero_boundary(
            jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32),
            1,
        )
        w = w / jnp.sqrt(jnp.sum(w.astype(jnp.float64) ** 2)).astype(jnp.float32)
        rng_states.append(w)
    return rng_states


def bench(n: int) -> None:
    cfg = make_config(n)
    ext = 1
    order = "ThreePoint"
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    an = ("Harmonic", dn, dt, mass, n, n, n)
    scale_denom = geometry.stencil_coefficients(order)[3] * dn * dn * mass
    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)
    print(f"[{n}^3 f32 3pt] delayed-GS vs per-step-GS excited", flush=True)

    # --- per-step GS resident excited, S = 1, 2 (bf16 streams) ----------
    for s_count in (1, 2):
        lows = normalised_states(cfg, range(100, 100 + s_count))
        store = jnp.stack([pk.to_xpad(w, ext) for w in lows])
        sls = []
        for w in lows:
            sl, _n2, _ov = pk.evolve_step_fused(
                pk.to_xpad(w, ext), None, None, order, dt / scale_denom, 0,
                False, False, analytic=an,
            )
            sls.append(sl)
        # both streams ride bf16, as the solver's default dispatch
        # (solver.py exc_bf16: store AND the Sl images)
        sstore = jnp.stack(sls).astype(jnp.bfloat16)
        store_b = store.astype(jnp.bfloat16)

        def chunk_exc(p, _st=store_b, _ss=sstore):
            return pk.evolve_chunk_resident(
                p, order, dt, dn, mass, STEPS, an,
                store_xpad=_st, sstore_xpad=_ss,
            )

        median_rate(chunk_exc, pk.to_xpad(phi, ext), n ** 3 * STEPS,
                    f"per-step GS S={s_count}")

    # --- delayed: per-step-norm ground resident (S-independent) ---------
    def chunk_psn(p):
        return pk.evolve_chunk_resident(
            p, order, dt, dn, mass, STEPS, an, per_step_norm=True,
        )

    median_rate(chunk_psn, pk.to_xpad(phi, ext), n ** 3 * STEPS,
                "delayed (psn ground, any S)")


def correctness() -> None:
    """One chunk of delayed cadence vs per-step GS at 128^3 on-chip: the
    field difference must sit at the gate's predicted regrowth scale and
    the boundary projection must restore orthogonality."""
    n = 128
    cfg = make_config(n)
    ext, order = 1, "ThreePoint"
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    an = ("Harmonic", dn, dt, mass, n, n, n)
    scale_denom = geometry.stencil_coefficients(order)[3] * dn * dn * mass
    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)
    low = normalised_states(cfg, [100])[0]
    # orthogonalise phi against low first (the measure-boundary state)
    ov = jnp.sum(low.astype(jnp.float64) * phi.astype(jnp.float64))
    phi = (phi.astype(jnp.float64) - ov * low.astype(jnp.float64)).astype(
        jnp.float32
    )
    phi = phi / jnp.sqrt(
        jnp.sum(phi.astype(jnp.float64) ** 2)
    ).astype(jnp.float32)

    sl, _n2, _ov2 = pk.evolve_step_fused(
        pk.to_xpad(low, ext), None, None, order, dt / scale_denom, 0, False,
        False, analytic=an,
    )
    ref = pk.from_xpad(
        pk.evolve_chunk_resident(
            pk.to_xpad(phi, ext), order, dt, dn, mass, 50, an,
            store_xpad=jnp.stack([pk.to_xpad(low, ext)]),
            sstore_xpad=jnp.stack([sl]),
        ),
        ext,
    )
    out = pk.from_xpad(
        pk.evolve_chunk_resident(
            pk.to_xpad(phi, ext), order, dt, dn, mass, 50, an,
            per_step_norm=True,
        ),
        ext,
    )
    # boundary projection (what the measure does)
    o = jnp.sum(low.astype(jnp.float64) * out.astype(jnp.float64))
    out_p = out.astype(jnp.float64) - o * low.astype(jnp.float64)
    out_p = out_p / jnp.sqrt(jnp.sum(out_p ** 2))
    refn = ref.astype(jnp.float64)
    refn = refn / jnp.sqrt(jnp.sum(refn ** 2))
    dev = float(jnp.max(jnp.abs(out_p - refn)))
    admix = float(jnp.abs(o) / jnp.sqrt(jnp.sum(out.astype(jnp.float64) ** 2)))
    orth = float(jnp.abs(jnp.sum(low.astype(jnp.float64) * out_p)))
    print(
        f"[128^3 correctness] 50-step delayed vs per-step GS: "
        f"pre-projection admixture {admix:.3g} (gate budget 1e-4), "
        f"post-projection field maxdev {dev:.3g}, orthogonality {orth:.3g}",
        flush=True,
    )


if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [256]
    correctness()
    for n_ in sizes:
        bench(n_)
