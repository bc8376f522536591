"""Isolate the batched-convergence graph's slowdown at 256³.

Times (after warmup), 8 chunk-iterations each:
  plain : python loop of 8 × [measure; resident chunk] with one sync at end
  fori  : jit(fori_loop of 8 × [measure; resident chunk])
  scan  : jit(scan of 8 × [measure; resident chunk]) emitting per-iter obs
  cond  : the scan with the lax.cond(done/idle) wrapper — the solver's
          _batched shape

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/batch_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from wafer_tpu import geometry
from wafer_tpu.models import initial, potentials as pmod
from wafer_tpu.ops import pallas_stencil as pk
from wafer_tpu.solver import _measure_and_prepare

N, STEPS, K = 256, 500, 8


def main():
    from wafer_tpu.config import Config

    cfg = Config.from_dict({
        "project_name": "bp",
        "grid": {"size": {"x": N, "y": N, "z": N}, "dn": 0.0625, "dt": 1.3e-3},
        "tolerance": 1e-30,
        "central_difference": "ThreePoint",
        "wavenum": 0,
        "wavemax": 0,
        "output": {"screen_update": STEPS, "file_type": "Json",
                   "save_wavefns": False, "save_potential": False},
        "potential": "Harmonic",
        "mass": 1.0,
        "init_condition": "Boolean",
        "sig": 1.0,
        "init_symmetry": "NotConstrained",
        "precision": "f32",
    })
    order, ext = "ThreePoint", 1
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    analytic = ("Harmonic", dn, dt, mass, N, N, N, cfg.sig, 0.0)
    v = pmod.generate(cfg).astype(jnp.float32)
    r2 = geometry.r2_index_grid(cfg.work_size(), (N, N, N), dtype=jnp.float32)
    phi0 = initial.set_initial_conditions(cfg).astype(jnp.float32)

    def measure(p):
        return _measure_and_prepare(p, v, r2, None, None, None, order, dn,
                                    mass, 0)

    def evolve(p):
        return pk.from_xpad(
            pk.evolve_chunk_resident(
                pk.to_xpad(p, ext), order, dt, dn, mass, STEPS, analytic
            ),
            ext,
        )

    def timed(name, fn, p):
        out = fn(p)  # warm/compile
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = 1e99
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(p)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f} s for {K} chunks "
              f"({N**3*STEPS*K/best:.3e} up/s)", flush=True)

    # plain
    def plain(p):
        for _ in range(K):
            _obs, p = measure(p)
            p = evolve(p)
        return p

    timed("plain", plain, phi0)

    # fori
    @jax.jit
    def fori(p):
        def body(_i, q):
            _obs, q2 = measure(q)
            return evolve(q2)
        return jax.lax.fori_loop(0, K, body, p)

    timed("fori ", fori, phi0)

    # scan emitting obs
    @jax.jit
    def scan(p):
        def body(q, _):
            (e, n2, vinf, r2s), q2 = measure(q)
            return evolve(q2), (e, n2, vinf, r2s)
        return jax.lax.scan(body, p, None, length=K)

    timed("scan ", scan, phi0)

    # scan + cond (solver's _batched shape)
    @jax.jit
    def cond(p):
        def body(carry, _):
            q, qc, last_e, done = carry

            def work(args):
                q, qc, last_e = args
                (e, n2, vinf, r2s), q2 = measure(q)
                ne = (e.astype(jnp.float64) / n2.astype(jnp.float64)).astype(
                    last_e.dtype
                )
                done_now = jnp.abs(ne - last_e) < 1e-30
                q3 = jax.lax.cond(done_now, lambda z: z, evolve, q2)
                qc2 = jax.lax.cond(done_now, lambda _: q2, lambda _: qc, None)
                return (q3, qc2, ne, done_now), (e, n2, vinf, r2s,
                                                 jnp.bool_(True), done_now)

            def idle(args):
                q, qc, last_e = args
                z = jnp.zeros((), last_e.dtype)
                o = jnp.ones((), jnp.float64)
                return (q, qc, last_e, jnp.bool_(True)), (
                    z, o, o * 0, o * 0, jnp.bool_(False), jnp.bool_(True)
                )

            nc, out = jax.lax.cond(done, idle, work, (q, qc, last_e))
            return nc, out

        init = (p, p, jnp.asarray(jnp.inf, jnp.float64), jnp.bool_(False))
        (pf, pc, _le, _d), rows = jax.lax.scan(body, init, None, length=K)
        return pf, rows

    timed("cond ", cond, phi0)


if __name__ == "__main__":
    main()
