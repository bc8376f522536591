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
STEPS = int(os.environ.get("WAFER_BENCH_STEPS", "50"))
REPEATS = 3


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


def _bench_on(device, n: int) -> float:
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

        @jax.jit
        def chunk(phi):
            def body(_i, p):
                return evolve_step(p, a, b, order, dt, dn, mass)

            return jax.lax.fori_loop(0, STEPS, body, phi)

        phi = chunk(phi)  # compile + warm
        phi.block_until_ready()

        best = 0.0
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            phi = chunk(phi)
            phi.block_until_ready()
            dt_wall = time.perf_counter() - t0
            ups = (n ** 3) * STEPS / dt_wall
            best = max(best, ups)
        return best


def main() -> None:
    accel = jax.devices()[0]
    value = _bench_on(accel, N)

    # host-CPU baseline proxy (scaled-down grid to keep wall-clock sane)
    try:
        cpu = jax.devices("cpu")[0]
        baseline = _bench_on(cpu, N_CPU)
    except Exception:
        baseline = None

    out = {
        "metric": f"stencil grid-point updates/sec/chip at {N}^3 (f32, 3-point CD)",
        "value": round(value, 1),
        "unit": "updates/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
