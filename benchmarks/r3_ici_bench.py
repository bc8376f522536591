"""In-kernel-ICI resident path: loopback measurement on one real chip.

The ICI-resident sharded ground mode (parallel/sharded.py ``ici_res``) keeps
ψ VMEM-resident for the whole chunk and refreshes the deep halo at every
R-step window boundary with in-kernel remote DMAs. Multi-chip hardware is
not reachable here, so this harness measures the path on a 1×1×1 mesh
(``WAFER_SHARDED_ICI=force`` → self-loopback remote DMAs): the number
isolates the in-kernel exchange + landing overhead against

the whole-chunk resident branch (no exchanges at all — the nsh=1 fast path
and the per-chip ceiling). The per-window ppermute path is unreachable on a
1×1×1 mesh since the whole-chunk branch landed; its historical 1×1×1
number is BASELINE.md's 9.1e10 (256³, R=16).

    PYTHONPATH=/root/repo:/root/.axon_site \
        python -u benchmarks/r3_ici_bench.py [N [R]]
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
from benchmarks.r3_sharded_bench import make_config  # noqa: E402
from wafer_tpu.models import potentials as pmod  # noqa: E402
from wafer_tpu.parallel.mesh import make_mesh  # noqa: E402
from wafer_tpu.parallel.sharded import ShardedOps  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
STEPS = 200


def _feasible_ici_r(cfg, mesh, r0: int):
    """Largest R ≤ r0 whose ici_res budget gate engages (the ψ block plus
    4·R·ext landing strips must fit the resident budget — at 256³ R=8 is
    76 MiB and fails, R=4 fits)."""
    os.environ["WAFER_SHARDED_ICI"] = "force"
    r = r0
    while r >= 2:
        if ShardedOps(cfg, mesh, 0, res_steps=r).ici_res:
            return r
        r //= 2
    raise SystemExit(f"no feasible ici R at {N}^3 (asked {r0})")


def bench(label: str, ici_env: str, res_steps, n_lower: int = 0):
    os.environ["WAFER_SHARDED_ICI"] = ici_env
    cfg = make_config(N)
    ext = cfg.central_difference.ext
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    if ici_env == "force" and res_steps is not None:
        res_steps = _feasible_ici_r(cfg, mesh, res_steps)
        label = label.replace(f"R={R}", f"R={res_steps}")
    ops = ShardedOps(cfg, mesh, n_lower, res_steps=res_steps)
    print(
        f"[{label}] pallas={ops.use_pallas} res_steps={ops.res_steps} "
        f"ici={ops.ici_res} ici_exc_r={getattr(ops, 'ici_exc_r', 0)} "
        f"res_exc={getattr(ops, 'use_res_exc', False)}",
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
            w /= np.sqrt(np.sum(w.astype(np.float64) ** 2)).astype(
                np.float32
            )
            lowers.append(jnp.asarray(w))
        store = ops.put_store(jnp.stack(lowers))
    else:
        store = ops.put_store(None)

    def run_chain(p, reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            p = ops.evolve_chunk(p, a_d, b_d, store)
        np.asarray(p[:1, :1, :8])  # tiny dependent fetch (tunnel async)
        return time.perf_counter() - t0, p

    t0 = time.perf_counter()
    _t, phi = run_chain(phi, 1)
    print(f"[{label}] compile+first chunk {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = 0.0
    for _ in range(3):
        t1, phi = run_chain(phi, 1)
        t3, phi = run_chain(phi, 3)
        per_chunk = max((t3 - t1) / 2.0, 1e-9)
        best = max(best, N ** 3 * STEPS / per_chunk)
    print(f"[{label}] sustained: {best:.4g} updates/s", flush=True)
    return best


if __name__ == "__main__":
    def equiv():
        """One chunk from the same IC through both paths, on chip."""
        cfg = make_config(N)
        ext = cfg.central_difference.ext
        mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
        os.environ["WAFER_SHARDED_ICI"] = "0"
        ops_a = ShardedOps(cfg, mesh, 0)
        r_ok = _feasible_ici_r(cfg, mesh, R)
        ops_b = ShardedOps(cfg, mesh, 0, res_steps=r_ok)
        assert ops_b.ici_res, "ici gate must engage under force"
        v = pmod.generate(cfg).astype(jnp.float32)
        a, b = pmod.build_ab(v, cfg.grid.dt)
        rng = np.random.default_rng(42)
        phi0 = rng.normal(size=cfg.work_size()).astype(np.float32)
        outs = []
        for ops in (ops_a, ops_b):
            p = ops.evolve_chunk(
                ops.put(phi0), ops.put(geometry.work_area(a, ext)),
                ops.put(geometry.work_area(b, ext)), ops.put_store(None),
            )
            outs.append(np.asarray(ops.get(p)))
        scale = max(np.abs(outs[0]).max(), 1e-30)
        dev = np.abs(outs[0] - outs[1]).max() / scale
        print(f"[equiv {N}^3] whole-chunk vs ici-loopback maxdev {dev:.2e}",
              flush=True)
        assert dev < 1e-5, dev

    if os.environ.get("WAFER_ICI_BENCH_EXC", "0") != "0":
        # S≥1 excited loopback: ψ resident across windows + per-step
        # coefficient recursion (local == global at nsh=1); compare with
        # BASELINE.md's windowed sharded S=1 and the single-chip
        # resident-exc numbers. WAFER_ICI_BENCH_EXC = n_lower (S=2 drives
        # the multi-(state, parity) scalar all-to-all slot indexing that
        # VERDICT r3 weak #5 flagged as the bug-prone surface)
        s_n = int(os.environ["WAFER_ICI_BENCH_EXC"])
        bench(
            f"ici excited S={s_n} {N}^3 (loopback)", "force", None,
            n_lower=s_n,
        )
    else:
        bench(f"whole-chunk resident {N}^3", "0", None)
        bench(f"in-kernel ICI R={R} {N}^3 (loopback)", "force", R)
        equiv()
