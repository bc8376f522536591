"""Sharded split-complex sanity bench on a 1×1×1 mesh (one real chip).

Measures ShardedSplitOps.evolve_chunk sustained complex updates/s for the
ground state through the round-3 resident ladder: 128³ rides the
whole-chunk resident pair (ONE kernel call per chunk), 256³ the x-blocked
deep-halo resident shortcut — the per-chip numbers the sharded split
machinery delivers vs the single-chip ladder (BASELINE.md). The
deep-ghost-zone windowed path (nsh > 1) is interpret-validated in
tests/test_sharding.py; `WAFER_SPLIT_BENCH_ICI=1` loopback-measures the
whole-chunk in-kernel-ICI mode instead (self remote DMAs on a forced
1-shard ring, with the whole-chunk shortcut disabled so the ici branch is
reachable).

    PYTHONPATH=/root/repo:/root/.axon_site \
        python -u benchmarks/r3_sharded_split_bench.py [N ...]
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wafer_tpu import geometry  # noqa: E402
from wafer_tpu.config import Config  # noqa: E402
from wafer_tpu.models import potentials as pmod  # noqa: E402
from wafer_tpu.parallel.mesh import make_mesh  # noqa: E402
from wafer_tpu.parallel.sharded_split import ShardedSplitOps  # noqa: E402

STEPS = 200


def make_config(n: int) -> Config:
    return Config.from_dict(
        {
            "project_name": "r3-sharded-split-bench",
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
            "potential": "ComplexHarmonic",
            "absorb": 0.2,
            "mass": 1.0,
            "init_condition": "Boolean",
            "sig": 1.0,
            "init_symmetry": "NotConstrained",
            "precision": "f32",
        }
    )


def bench(n: int) -> None:
    cfg = make_config(n)
    ext = cfg.central_difference.ext
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    if os.environ.get("WAFER_SPLIT_BENCH_ICI") == "1":
        import wafer_tpu.ops.pallas_split as ps_mod

        ps_mod.resident_sc_supported = lambda *a: False
        ps_mod.pick_resb_sc = lambda *a: None
        os.environ["WAFER_SHARDED_ICI"] = "force"
    ops = ShardedSplitOps(cfg, mesh, 0)
    print(
        f"[sharded-split 1x1x1 {n}^3] pallas={ops.use_pallas} "
        f"whole_chunk={ops.sc_whole_chunk} resb={ops.sc_resb_plan} "
        f"res_steps={ops.sc_res_steps} ici={getattr(ops, 'sc_ici', False)}",
        flush=True,
    )
    vr, vi = pmod.generate_split(cfg)
    vr, vi = vr.astype(jnp.float32), vi.astype(jnp.float32)
    ar, ai, br, bi = pmod.build_ab_split(vr, vi, cfg.grid.dt)
    w = geometry.work_area
    rng = np.random.default_rng(0)
    pr = ops.put(rng.normal(size=cfg.work_size()).astype(np.float32))
    pi = ops.put(rng.normal(size=cfg.work_size()).astype(np.float32))
    args = (
        ops.put(w(ar, ext)), ops.put(w(ai, ext)),
        ops.put(w(br, ext)), ops.put(w(bi, ext)),
        ops.put_store(None), ops.put_store(None),
    )

    def run_chain(p2, reps):
        prc, pic = p2
        t0 = time.perf_counter()
        for _ in range(reps):
            prc, pic = ops.evolve_chunk(prc, pic, *args)
        np.asarray(pic[:1, :1, :8])
        return time.perf_counter() - t0, (prc, pic)

    t0 = time.perf_counter()
    _t, p2 = run_chain((pr, pi), 1)
    print(
        f"[sharded-split 1x1x1 {n}^3] compile+first chunk "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    best = 0.0
    for _ in range(3):
        t1, p2 = run_chain(p2, 1)
        t3, p2 = run_chain(p2, 3)
        per_chunk = max((t3 - t1) / 2.0, 1e-9)
        best = max(best, n ** 3 * STEPS / per_chunk)
    print(
        f"[sharded-split 1x1x1 {n}^3] sustained: {best:.4g} "
        f"complex updates/s",
        flush=True,
    )


if __name__ == "__main__":
    for n in [int(x) for x in sys.argv[1:]] or [128, 256]:
        bench(n)
