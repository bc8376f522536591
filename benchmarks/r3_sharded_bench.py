"""Sharded-path sanity bench on a 1×1×1 mesh (one real chip).

Measures ShardedOps.evolve_chunk sustained updates/s at 256³ for the
ground state (resident deep-halo chunks) and S=1 excited (per-step
ψ-resident sweeps with bf16 l/Sl streams) — the per-chip numbers the
sharded machinery delivers vs the single-chip ladder (BASELINE.md).

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/r3_sharded_bench.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wafer_tpu import geometry  # noqa: E402
from wafer_tpu.config import Config  # noqa: E402
from wafer_tpu.models import potentials as pmod  # noqa: E402
from wafer_tpu.parallel.mesh import make_mesh  # noqa: E402
from wafer_tpu.parallel.sharded import ShardedOps  # noqa: E402

N = 256
STEPS = 200


def make_config(n: int) -> Config:
    return Config.from_dict(
        {
            "project_name": "r3-sharded-bench",
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


def bench(n_lower: int) -> None:
    cfg = make_config(N)
    ext = cfg.central_difference.ext
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    ops = ShardedOps(cfg, mesh, n_lower)
    print(
        f"[sharded 1x1x1 S={n_lower}] pallas={ops.use_pallas} "
        f"mode={ops.pallas_mode} res_steps={ops.res_steps} "
        f"k_fuse={ops.k_fuse} res_exc={getattr(ops, 'use_res_exc', False)}",
        flush=True,
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    rng = np.random.default_rng(0)
    phi = ops.put(rng.normal(size=cfg.work_size()).astype(np.float32))
    a_d = ops.put(geometry.work_area(a, ext))
    b_d = ops.put(geometry.work_area(b, ext))
    if n_lower:
        lowers = []
        for _ in range(n_lower):
            w = rng.normal(size=cfg.work_size()).astype(np.float32)
            w /= np.sqrt(np.sum(w.astype(np.float64) ** 2)).astype(np.float32)
            lowers.append(jnp.asarray(w))
        store = ops.put_store(jnp.stack(lowers))
    else:
        store = ops.put_store(None)

    def run_chain(p, reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            p = ops.evolve_chunk(p, a_d, b_d, store)
        # tiny dependent fetch: whole-array device_get is asynchronous
        # through the tunnel (see bench.py)
        np.asarray(p[:1, :1, :8])
        return time.perf_counter() - t0, p

    t0 = time.perf_counter()
    _t, phi = run_chain(phi, 1)
    print(
        f"[sharded 1x1x1 S={n_lower}] compile+first chunk "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    best = 0.0
    for _ in range(3):
        t1, phi = run_chain(phi, 1)
        t3, phi = run_chain(phi, 3)
        per_chunk = max((t3 - t1) / 2.0, 1e-9)
        best = max(best, N ** 3 * STEPS / per_chunk)
    print(
        f"[sharded 1x1x1 S={n_lower}] sustained: {best:.4g} updates/s",
        flush=True,
    )


if __name__ == "__main__":
    import sys

    for nl in [int(x) for x in sys.argv[1:]] or [0, 1]:
        bench(nl)
