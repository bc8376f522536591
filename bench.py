"""Benchmark: sustained stencil grid-point updates/sec on the flagship sweep.

BASELINE.md: the reference publishes no numbers (README.md:1-25, cargo bench
disabled), so the primary metric is grid-point updates/sec at 256³
(BASELINE.json north star). ``vs_baseline`` compares the accelerator result
against the same sweep executed on this machine's host CPU via XLA — a proxy
for the reference's rayon/ndarray CPU implementation (both are
memory-bandwidth-bound CPU stencils; XLA-CPU is, if anything, a *stronger*
baseline than the per-cell-window rayon loop).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# A CPU platform must exist for the baseline leg even under the TPU plugin.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=1").strip()

import jax
import jax.numpy as jnp
import numpy as np

from wafer_tpu import geometry
from wafer_tpu.config import Config
from wafer_tpu.models import potentials as pmod
from wafer_tpu.ops.stencil import evolve_step

N = int(os.environ.get("WAFER_BENCH_N", "256"))
N_CPU = int(os.environ.get("WAFER_BENCH_N_CPU", "128"))
STEPS = int(os.environ.get("WAFER_BENCH_STEPS", "200"))
REPEATS = 5


def _make_config(n: int) -> Config:
    return Config.from_dict(
        {
            "project_name": "bench",
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
            "init_condition": "Boolean",  # the reference's benchmark IC
            "sig": 1.0,
            "init_symmetry": "NotConstrained",
            "precision": "f32",
        }
    )


def _bench_on(device, n: int, use_pallas: bool) -> float:
    """Sustained updates/sec for the evolve sweep on one device."""
    cfg = _make_config(n)
    order = cfg.central_difference.value
    ext = cfg.central_difference.ext
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass

    with jax.default_device(device):
        v = pmod.generate(cfg).astype(jnp.float32)
        a, b = pmod.build_ab(v, dt)
        from wafer_tpu.models import initial

        phi = initial.set_initial_conditions(cfg).astype(jnp.float32)

        if use_pallas:
            from wafer_tpu import geometry
            from wafer_tpu.ops import pallas_stencil as pk

            # harmonic is analytic: B computed in-kernel from coordinates
            g = cfg.grid
            analytic = ("Harmonic", g.dn, g.dt, cfg.mass, n, n, n)
            if pk.resident_supported(n, n, n, ext, 4, True):
                # whole-chunk VMEM-resident kernel (solver's first choice)
                phi = pk.to_xpad(phi, ext)

                def chunk(p):
                    return pk.evolve_chunk_resident(
                        p, order, dt, dn, mass, STEPS, analytic
                    )

            elif (resb_plan := pk.pick_resb(n, n, n, ext, 4, STEPS)) is not None:
                # x-blocked deep-halo resident chunks (HBM-sized grids,
                # e.g. WAFER_BENCH_N=512) — the solver's second rung
                bx_b, r_b, tx_b, pf_b, _rate = resb_plan
                phi = pk.to_xpad_k(phi, ext, r_b)

                def chunk(p):
                    return pk.evolve_chunk_resident_blocked(
                        p, order, dt, dn, mass, STEPS, analytic,
                        bx=bx_b, r_steps=r_b, tx=tx_b, prefetch=pf_b,
                    )

            else:
                # K depth mirrors the solver's cost-model choice
                k_fuse = pk.pick_k_fuse(n, n, n, ext, 4, True)
                phi = pk.to_xpad_k(phi, ext, k_fuse)

                def chunk(p):
                    return pk.evolve_chunk_fused_k(
                        p, None, order, dt, dn, mass, STEPS, k_fuse,
                        analytic=analytic,
                    )

        else:

            @jax.jit
            def chunk(p):
                def body(_i, q):
                    return evolve_step(q, a, b, order, dt, dn, mass)

                return jax.lax.fori_loop(0, STEPS, body, p)

        import numpy as np

        def run_chain(p, reps):
            """Execute ``reps`` chained chunks and force completion with a
            tiny host fetch. Through remote-device tunnels
            ``block_until_ready`` may be asynchronous, so wall-clock is
            measured on chains of two lengths and differenced — the constant
            dispatch/fetch overhead cancels."""
            t0 = time.perf_counter()
            for _ in range(reps):
                p = chunk(p)
            np.asarray(p[:1, :1, :8])  # true sync
            return time.perf_counter() - t0, p

        _t, phi = run_chain(phi, 1)  # compile + warm

        # median of the repeats: single differenced readings through the
        # tunnel occasionally report wildly high (a hiccup shrinking the
        # difference; observed 2.7e11 for a ~1.3e11 kernel) or nonphysical
        # values, so neither max nor a lone sample is trustworthy. The
        # chain lengths (2 vs 12 → 10 differenced chunks ≈ 0.27 s of
        # compute at 256³) keep the measurement window an order of
        # magnitude above the tunnel's ~10 ms jitter; the earlier 1-vs-5
        # scheme differenced only ~0.1 s and showed a ±8% roll spread.
        lo_reps, hi_reps = 2, 12
        samples = []
        for _ in range(REPEATS):
            t_lo, phi = run_chain(phi, lo_reps)
            t_hi, phi = run_chain(phi, hi_reps)
            if t_hi - t_lo <= 0.05 * t_hi:
                # nonphysical differencing (observed once: a transient
                # tunnel hiccup made the long chain no slower) — fall back
                # to the longer chain's absolute wall, a conservative LOWER
                # bound on the rate (it still contains the constant
                # dispatch/fetch overhead)
                samples.append((n ** 3) * STEPS * hi_reps / max(t_hi, 1e-9))
            else:
                samples.append(
                    (n ** 3) * STEPS * (hi_reps - lo_reps) / (t_hi - t_lo)
                )
        samples.sort()
        return samples[len(samples) // 2]


def _devices_with_retry():
    """The axon tunnel occasionally reports UNAVAILABLE for minutes at a
    time (observed: a multi-hour grant outage mid-round). jax caches a
    failed backend init for the process lifetime, so retry by re-exec'ing
    this script with a bumped attempt counter instead of looping
    in-process."""
    try:
        return jax.devices()
    except RuntimeError as exc:
        attempt = int(os.environ.get("WAFER_BENCH_ATTEMPT", "0"))
        max_attempts = int(os.environ.get("WAFER_BENCH_INIT_RETRIES", "8"))
        if attempt >= max_attempts:
            raise
        print(
            f"# backend init failed (attempt {attempt + 1}/{max_attempts}): "
            f"{exc}; retrying in 60 s",
            file=sys.stderr,
        )
        time.sleep(60)
        os.environ["WAFER_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    accel = _devices_with_retry()[0]
    use_pallas = accel.platform != "cpu"
    value = _bench_on(accel, N, use_pallas)

    # host-CPU baseline proxy (scaled-down grid to keep wall-clock sane)
    try:
        cpu = jax.devices("cpu")[0]
        baseline = _bench_on(cpu, N_CPU, False)
    except Exception:
        baseline = None

    out = {
        "metric": f"stencil grid-point updates/sec/chip at {N}^3 "
        f"(f32, 3-point CD, {'fused pallas' if use_pallas else 'xla'} sweep)",
        "value": round(value, 1),
        "unit": "updates/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        # disclosure: the host-CPU XLA baseline runs a smaller grid to keep
        # wall-clock sane; updates/s is ~size-invariant for a bandwidth-bound
        # sweep (measured 128³ vs 256³ on CPU within a few %)
        "baseline": f"host-CPU XLA sweep at {N_CPU}^3" if baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
