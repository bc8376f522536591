"""VPU roofline for the resident sweep: where do the cycles go?

The 256³ resident kernel is VPU-bound (BASELINE.md: ~1.2e11 updates/s while
HBM traffic is ~zero), so its ceiling is set by vector-op count per update,
not bandwidth. This probe measures VMEM-resident microkernels with the
sweep's structure (grid = steps, ψ-sized buffer resident, tx-row slabs,
in-place) but stripped op mixes:

  fma    : new = B₀·(2c + s·(−6c)) − c        — scalar B, no taps: the
           pure-FMA speed of light for this loop structure
  taps   : + the 6 neighbour taps (1 x-concat + x-slice, 2 y-concats,
           2 z-concats, 3 tap-pair adds) — the real op mix minus analytic B
  full   : + analytic harmonic B per slab (broadcast add + reciprocal) —
           the real resident ground mix (cf. pallas_stencil._res_b_slab)

rate(fma) − rate(taps) prices the shift copies; rate(taps) − rate(full)
prices the per-step analytic-B recompute. Compare `full` against the
official bench (same mix at 256³) to see how much of the remaining gap is
the probe's smaller block vs. real headroom.

Timing through the axon tunnel: chained-dispatch differences (bench.py,
memory/axon-tpu-quirks.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/vpu_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wafer_tpu.ops.pallas_stencil import _shift_y, _shift_z

N = int(os.environ.get("VPU_PROBE_N", "128"))
STEPS = int(os.environ.get("VPU_PROBE_STEPS", "100"))
TX = 16
SCALE = 0.001


def _kernel(x_hbm, o_hbm, buf, rplane, sem, *, mix: str):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _load():
        cp = pltpu.make_async_copy(x_hbm, buf, sem)
        cp.start()
        cp.wait()
        # hoisted reciprocal plane r = 1/P_yz (the "horner" mix's
        # once-per-chunk precompute; others ignore it)
        dy = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0).astype(
            jnp.float32
        ) - jnp.float32(N / 2)
        dz = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1).astype(
            jnp.float32
        ) - jnp.float32(N / 2)
        rplane[...] = 1.0 / (1.0 + jnp.float32(0.25 * 1e-4) * (dy * dy + dz * dz))

    for rs in range(0, N, TX):
        c = buf[rs : rs + TX]
        if mix == "fma":
            acc = (-6.0) * c
        elif mix == "rowtaps":
            # shuffle-free upper bound: all six taps read as axis-0 row
            # windows (physically wrong — it prices the hypothetical where
            # no lane/sublane shuffles exist, i.e. the ceiling for ANY
            # "plane-reuse"/layout scheme; a 3D array has one row axis, so
            # two of the three tap axes must pay shuffles — this bound is
            # unreachable, see docs/KERNEL.md round-4 notes)
            acc = (-6.0) * c
            for off in (-1, 1, -2, 2, -3, 3):
                ro = min(max(rs + off, 0), N - TX)
                acc += buf[ro : ro + TX]
        else:
            # 6 taps with the sweep's real shift lowering (x: slice pair —
            # ascending in-place sweeps make one side a plain slice;
            # y/z: the measured concat-based shifts)
            acc = (-6.0) * c
            xm = buf[max(rs - 1, 0) : max(rs - 1, 0) + TX]
            xp = buf[min(rs + 1, N - TX) : min(rs + 1, N - TX) + TX]
            acc += xm + xp
            acc += _shift_y(c, 1) + _shift_y(c, -1)
            acc += _shift_z(c, 1) + _shift_z(c, -1)
        if mix == "full":
            # analytic harmonic B: per-row x² scalar + broadcast add +
            # reciprocal (pallas_stencil._res_b_slab "Harmonic")
            dx = jax.lax.broadcasted_iota(jnp.int32, (TX, 1, 1), 0).astype(
                jnp.float32
            ) + jnp.float32(rs - N / 2)
            q = jnp.float32(0.25 * 1e-4) * (dx * dx)
            yz = buf[rs : rs + TX] * jnp.float32(0.0) + jnp.float32(1.0)
            b = 1.0 / (yz + q)
        elif mix == "horner":
            # divide-free analytic B: b = 1/(P + q) = r·1/(1 + g), g = q·r,
            # expanded as a 4-term alternating Horner series (exact to f32
            # when g_max^4 < eps — true for every stability-bounded
            # harmonic config, where g = dt/4·x_phys² ≤ ~0.02)
            dx = jax.lax.broadcasted_iota(jnp.int32, (TX, 1, 1), 0).astype(
                jnp.float32
            ) + jnp.float32(rs - N / 2)
            q = jnp.float32(0.25 * 1e-4) * (dx * dx)
            r = rplane[...][None, :, :]
            g = q * r
            b = r * (1.0 - g * (1.0 - g * (1.0 - g)))
        else:
            b = jnp.float32(0.98)
        buf[rs : rs + TX] = b * (2.0 * c + SCALE * acc) - c

    @pl.when(i == n_steps - 1)
    def _store():
        cp = pltpu.make_async_copy(buf, o_hbm, sem)
        cp.start()
        cp.wait()


def _make_chain(mix: str, reps: int):
    kern = functools.partial(_kernel, mix=mix)

    @jax.jit
    def chain(x):
        def body(_i, p):
            return pl.pallas_call(
                kern,
                grid=(STEPS,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((N, N, N), jnp.float32),
                    pltpu.VMEM((N, N), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=int(N * N * N * 4 + (8 << 20))
                ),
            )(p)

        return jax.lax.fori_loop(0, reps, body, x)

    return chain


def _sync(x):
    np.asarray(x[:1, :1, :8])


def measure(mix: str):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, N, N)).astype(np.float32) * 1e-3)
    c1, c5 = _make_chain(mix, 4), _make_chain(mix, 16)
    _sync(c1(x))  # compile + warm
    _sync(c5(x))
    # median-of-5 differenced readings; single differences through the
    # tunnel can collapse to ~0 when queue drain overlaps (a raw run once
    # read 2e17 "updates/s")
    rates = []
    for _ in range(5):
        t0 = time.perf_counter(); _sync(c1(x)); t1 = time.perf_counter()
        _sync(c5(x)); t2 = time.perf_counter()
        per = ((t2 - t1) - (t1 - t0)) / 12.0
        if per > 1e-6:
            rates.append(STEPS * (N ** 3) / per)
    rates.sort()
    best = rates[len(rates) // 2] if rates else float("nan")
    print(json.dumps({"mix": mix, "updates_per_s": f"{best:.3e}",
                      "n_valid": len(rates)}))
    return best


def main():
    print(f"# VPU probe: N={N} STEPS={STEPS} TX={TX} "
          f"(VMEM-resident, no HBM traffic between load/store)")
    r_fma = measure("fma")
    r_taps = measure("taps")
    r_full = measure("full")
    r_rows = measure("rowtaps")
    r_horn = measure("horner")
    print(json.dumps({
        "shift_cost_pct": round(100 * (r_fma - r_taps) / r_fma, 1),
        "analyticB_cost_pct": round(100 * (r_taps - r_full) / max(r_taps, 1), 1),
        "full_rate": f"{r_full:.3e}",
        # round-4 probes: the shuffle-free tap bound (ceiling for any
        # plane-reuse/layout scheme) and the divide-free Horner-B mix
        "rowtaps_bound": f"{r_rows:.3e}",
        "horner_rate": f"{r_horn:.3e}",
        "horner_vs_full_pct": round(100 * (r_horn - r_full) / max(r_full, 1), 1),
    }))


if __name__ == "__main__":
    main()
