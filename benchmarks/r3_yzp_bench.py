"""Per-chip rates for the multi-axis (y/z-padded) kernel family.

One real chip cannot host a multi-axis mesh, so this harness runs the
per-SHARD workload single-device: the local block of a (4,2,1) / (2,2,2)
mesh at 256³/512³, with the window-boundary halo refresh emulated by the
same zero-fill updates an edge shard performs (ppermute transit itself is
not on the measured path — the ICI hop is ~µs against ~ms windows).
Reported rate = interior updates/s for ONE shard = the per-chip rate of
the real mesh.

Paths measured per block:
  1step : the streaming y/z-padded kernel (evolve_step_fused_yzp), the
          round-2 multi-axis default — one ψ HBM round trip per step
  resw  : resident windows (evolve_window_res_yzp) — R blind in-kernel
          sweeps per ψ HBM pass, R·ext-deep halos refreshed per window

Timing through the axon tunnel: chained-dispatch differences (bench.py,
memory/axon-tpu-quirks.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r3_yzp_bench.py [case...]
Cases: 256-421 (default), 256-222, 512-421
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wafer_tpu.ops import pallas_stencil as pk

CASES = {
    # name: (block (bx, by, bz), zp, what it emulates)
    "256-421": ((64, 128, 256), 0, "(4,2,1) mesh @ 256^3, zp=0"),
    "256-222": ((128, 128, 128), pk._YZP_ZPAD, "(2,2,2) mesh @ 256^3"),
    "512-421": ((128, 256, 512), 0, "(4,2,1) mesh @ 512^3, zp=0"),
}

ORDER = "ThreePoint"
EXT = 1
DN, DT, MASS = 0.1, 0.003, 1.0
SCREEN = 32  # steps per chunk dispatch


def _mk_analytic(bx, by, bz):
    # analytic harmonic B on the global grid the block belongs to (the
    # kernel only reads permuted extents + origins)
    return ("Harmonic", DN, DT, MASS, bx, by, bz, 1.0, 0.0)


def chunk_1step(block, zp, analytic, steps):
    yp = pk._YZP_YPAD
    e = EXT
    pads = ((e, e), (yp, yp), (zp, zp))
    origin = jnp.zeros((3, 1), jnp.int32)
    scale = DT / (2.0 * DN * DN * MASS)

    def refresh(pp):
        # edge-shard refresh: zero the innermost ext pad rows per step
        z0 = jnp.zeros((e,) + pp.shape[1:], pp.dtype)
        pp = lax.dynamic_update_slice_in_dim(pp, z0, e - e, 0)
        pp = lax.dynamic_update_slice_in_dim(pp, z0, e + block.shape[0], 0)
        zy = jnp.zeros((pp.shape[0], e, pp.shape[2]), pp.dtype)
        pp = lax.dynamic_update_slice_in_dim(pp, zy, yp - e, 1)
        pp = lax.dynamic_update_slice_in_dim(pp, zy, yp + block.shape[1], 1)
        if zp > 0:
            zz = jnp.zeros((pp.shape[0], pp.shape[1], e), pp.dtype)
            pp = lax.dynamic_update_slice_in_dim(pp, zz, zp - e, 2)
            pp = lax.dynamic_update_slice_in_dim(pp, zz, zp + block.shape[2], 2)
        return pp

    def body(_i, pp):
        pp = refresh(pp)
        out, _n2, _ov = pk.evolve_step_fused_yzp(
            pp, None, None, ORDER, scale, 0, False, False,
            analytic=analytic, origin=origin, zp=zp,
        )
        return out

    @jax.jit
    def run(pp):
        return lax.fori_loop(0, steps, body, pp)

    return run, jnp.pad(block, pads)


def chunk_resw(block, zp, analytic, steps, plan):
    r_w, yp = plan
    e = EXT
    h = r_w * e
    pads = ((h, h), (yp, yp), (zp, zp))
    origin = jnp.zeros((3, 1), jnp.int32)
    edges = jnp.ones((6, 1), jnp.int32)  # single shard: all global edges
    scale = DT / (2.0 * DN * DN * MASS)

    def refresh_deep(pp):
        zx = jnp.zeros((h,) + pp.shape[1:], pp.dtype)
        pp = lax.dynamic_update_slice_in_dim(pp, zx, 0, 0)
        pp = lax.dynamic_update_slice_in_dim(pp, zx, h + block.shape[0], 0)
        zy = jnp.zeros((pp.shape[0], h, pp.shape[2]), pp.dtype)
        pp = lax.dynamic_update_slice_in_dim(pp, zy, yp - h, 1)
        pp = lax.dynamic_update_slice_in_dim(pp, zy, yp + block.shape[1], 1)
        if zp > 0:
            zz = jnp.zeros((pp.shape[0], pp.shape[1], h), pp.dtype)
            pp = lax.dynamic_update_slice_in_dim(pp, zz, zp - h, 2)
            pp = lax.dynamic_update_slice_in_dim(pp, zz, zp + block.shape[2], 2)
        return pp

    def body(_i, pp):
        pp = refresh_deep(pp)
        return pk.evolve_window_res_yzp(
            pp, ORDER, scale, r_w, analytic, origin, edges, h, yp, zp, False,
        )

    @jax.jit
    def run(pp):
        return lax.fori_loop(0, steps // r_w, body, pp)

    return run, jnp.pad(block, pads)


def chunk_resbw(block, zp, analytic, steps, plan):
    """x-blocked windows (evolve_window_resb_yzp) — the round-4 path for
    >VMEM blocks (512³-class shards); same window cadence as resw."""
    bxk, r_w, tx, yp = plan
    e = EXT
    h = r_w * e
    pads = ((h, h), (yp, yp), (zp, zp))
    origin = jnp.zeros((3, 1), jnp.int32)
    edges = jnp.ones((6, 1), jnp.int32)
    scale = DT / (2.0 * DN * DN * MASS)

    def refresh_deep(pp):
        zx = jnp.zeros((h,) + pp.shape[1:], pp.dtype)
        pp = lax.dynamic_update_slice_in_dim(pp, zx, 0, 0)
        pp = lax.dynamic_update_slice_in_dim(pp, zx, h + block.shape[0], 0)
        zy = jnp.zeros((pp.shape[0], h, pp.shape[2]), pp.dtype)
        pp = lax.dynamic_update_slice_in_dim(pp, zy, yp - h, 1)
        pp = lax.dynamic_update_slice_in_dim(pp, zy, yp + block.shape[1], 1)
        if zp > 0:
            zz = jnp.zeros((pp.shape[0], pp.shape[1], h), pp.dtype)
            pp = lax.dynamic_update_slice_in_dim(pp, zz, zp - h, 2)
            pp = lax.dynamic_update_slice_in_dim(pp, zz, zp + block.shape[2], 2)
        return pp

    def body(_i, pp):
        pp = refresh_deep(pp)
        return pk.evolve_window_resb_yzp(
            pp, ORDER, scale, r_w, analytic, origin, edges, h, yp, zp,
            bxk, tx, False,
        )

    @jax.jit
    def run(pp):
        return lax.fori_loop(0, steps // r_w, body, pp)

    return run, jnp.pad(block, pads)


def rate(run, pp0, steps, interior, chains=(2, 6)):
    """Chained-dispatch difference timing (see bench.py)."""
    pp = run(pp0)
    pp.block_until_ready()  # compile + warm

    def chain(n):
        t0 = time.perf_counter()
        p = pp0
        for _ in range(n):
            p = run(p)
        p.block_until_ready()
        return time.perf_counter() - t0

    best = None
    for _ in range(3):
        t_short = chain(chains[0])
        t_long = chain(chains[1])
        dt_ = (t_long - t_short) / (chains[1] - chains[0])
        r = interior * steps / dt_
        best = r if best is None else max(best, r)
    return best


def main(argv):
    names = argv or ["256-421"]
    out = {}
    for name in names:
        (bx, by, bz), zp, desc = CASES[name]
        rng = np.random.default_rng(0)
        block = jnp.asarray(
            rng.normal(size=(bx, by, bz)).astype(np.float32)
        )
        analytic = _mk_analytic(4 * bx, 2 * by, bz if zp == 0 else 2 * bz)
        interior = bx * by * bz
        plan = pk.pick_res_yzp(bx, by, bz, EXT, 4, SCREEN, zp)
        print(f"[{name}] {desc}: block {bx}x{by}x{bz} resw plan {plan}")

        run1, pp1 = chunk_1step(block, zp, analytic, SCREEN)
        r1 = rate(run1, pp1, SCREEN, interior)
        print(f"[{name}] 1step  {r1:.3e} updates/s/chip")
        out[f"{name}-1step"] = r1

        if plan is not None:
            runw, ppw = chunk_resw(block, zp, analytic, SCREEN, plan)
            rw = rate(runw, ppw, SCREEN, interior)
            print(f"[{name}] resw   {rw:.3e} updates/s/chip (R={plan[0]})")
            out[f"{name}-resw"] = rw

        planb = pk.pick_resb_yzp(bx, by, bz, EXT, 4, SCREEN, zp)
        if planb is not None and plan is None:
            # on-chip correctness vs the 1-step path before timing: one
            # SCREEN-step chunk, interior max deviation
            runb, ppb = chunk_resbw(block, zp, analytic, SCREEN, planb)
            h_b, yp_b = planb[1] * EXT, planb[3]
            o1 = np.asarray(run1(pp1))[
                EXT : EXT + bx,
                pk._YZP_YPAD : pk._YZP_YPAD + by,
                zp : zp + bz,
            ]
            ob = np.asarray(runb(ppb))[
                h_b : h_b + bx, yp_b : yp_b + by, zp : zp + bz
            ]
            dev = float(np.max(np.abs(o1 - ob)))
            print(f"[{name}] resbw max dev vs 1step: {dev:.3g}")
            out[f"{name}-resbw-dev"] = dev
            rb = rate(runb, ppb, SCREEN, interior)
            print(
                f"[{name}] resbw  {rb:.3e} updates/s/chip "
                f"(bxk={planb[0]}, R={planb[1]}, tx={planb[2]})"
            )
            out[f"{name}-resbw"] = rb

    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
