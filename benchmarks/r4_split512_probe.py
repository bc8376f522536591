"""512³ split-complex throughput: single chip and per-shard emulation.

Round 4 extends the complex perf surface past 256³ (BASELINE config 4's
size). Two legs:

- ``512``: the full single-chip 512³ complex chunk on the solver's
  dispatch for that size — the x-blocked deep-halo resident PAIR
  (``pick_resb_sc`` plan; mixed residency declines: re alone is 514 MiB).
- ``512-shard8``: per-chip rate for one (8,1,1)-mesh shard
  (64×512×512 block) through the sharded window cadence
  (parallel/sharded_split.py ``sc_resb_sharded``): an R·ext-deep halo
  refresh per window (emulated by zero installs — the global-edge
  shard's exact work) followed by ``evolve_steps_resident_blocked_sc``
  blind sweeps, exactly the multi-shard body. The windowed MIXED variant
  is assessed analytically in docs/KERNEL.md (round-5 leads): at this
  geometry it fits only at R=2, the measured VMEM-marginal-negative
  regime.

Capability referent: the reference stubs complex propagation entirely
(/root/reference/src/potential.rs:222,271).

    PYTHONPATH=/root/repo:/root/.axon_site \
        python -u benchmarks/r4_split512_probe.py [512|512-shard8 ...]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from wafer_tpu import geometry  # noqa: E402
from wafer_tpu.ops import pallas_split as ps  # noqa: E402

N = 512
STEPS = 200
ORDER, EXT = "ThreePoint", 1
DN, DT, MASS, ABSORB = 0.01, 3e-5, 1.0, 0.2


def _median_rate(chunk, p, updates_per_chunk: int, repeats: int = 3):
    def run_chain(p, reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            p = chunk(p)
        np.asarray(p[:1, :1, :8])
        return time.perf_counter() - t0, p

    t0 = time.perf_counter()
    _t, p = run_chain(p, 1)  # compile + warm
    print(f"  compile+first chunk {time.perf_counter() - t0:.1f}s", flush=True)
    samples = []
    for _ in range(repeats):
        t_lo, p = run_chain(p, 1)
        t_hi, p = run_chain(p, 3)
        if t_hi - t_lo <= 0.05 * t_hi:
            samples.append(updates_per_chunk * 3 / max(t_hi, 1e-9))
        else:
            samples.append(updates_per_chunk * 2 / (t_hi - t_lo))
    samples.sort()
    return samples[len(samples) // 2]


def leg_512() -> None:
    an = ("Harmonic", DN, DT, MASS, N, N, N, 1.0, 0.0, ABSORB)
    plan = ps.pick_resb_sc(N, N, N, EXT, 4, STEPS)
    print(f"[split {N}^3 single-chip] pick_resb_sc -> {plan}", flush=True)
    assert plan is not None
    bx, r, tx, pf = plan[0], plan[1], plan[2], plan[3]
    rng = np.random.default_rng(0)
    pr = np.zeros((N + 2 * EXT,) * 3, np.float32)
    pi = np.zeros((N + 2 * EXT,) * 3, np.float32)
    sl = slice(EXT, -EXT)
    pr[sl, sl, sl] = rng.normal(size=(N, N, N)).astype(np.float32) * 0.01
    pi[sl, sl, sl] = rng.normal(size=(N, N, N)).astype(np.float32) * 0.01
    p2 = ps.to_xpad_k_sc(jnp.asarray(pr), jnp.asarray(pi), EXT, r)

    def chunk(p):
        return ps.evolve_chunk_resident_blocked_sc(
            p, ORDER, DT, DN, MASS, STEPS, an, bx=bx, r_steps=r,
            tx=tx, prefetch=pf,
        )

    rate = _median_rate(chunk, p2, N ** 3 * STEPS)
    print(
        f"[split {N}^3 single-chip] blocked pair (bx={bx}, R={r}, tx={tx}):"
        f" {rate:.4g} complex updates/s",
        flush=True,
    )


def leg_shard8() -> None:
    bxl = N // 8
    an = ("Harmonic", DN, DT, MASS, N, N, N, 1.0, 0.0, ABSORB)
    _o, _c, _cc, k = geometry.stencil_coefficients(ORDER)
    scale = DT / (k * DN * DN * MASS)
    plan = ps.pick_resb_sc(bxl, N, N, EXT, 4, STEPS)
    print(f"[split {N}^3 shard {bxl}x{N}x{N}] pick_resb_sc -> {plan}",
          flush=True)
    assert plan is not None
    bx, r, tx, pf = plan[0], plan[1], plan[2], plan[3]
    h = r * EXT
    rng = np.random.default_rng(0)
    blk = rng.normal(size=(2, bxl, N, N)).astype(np.float32) * 0.01
    pad = ((h, h), (0, 0), (0, 0))
    p2 = jnp.concatenate(
        [jnp.pad(jnp.asarray(blk[0]), pad), jnp.pad(jnp.asarray(blk[1]), pad)],
        axis=0,
    )
    bxp = bxl + 2 * h
    zx = jnp.zeros((h, N, N), jnp.float32)

    def refresh(pp):
        # window-boundary halo refresh, emulated by zero installs on both
        # x sides of both components — the global-edge shard's exact work
        # (an interior shard installs ppermute'd rows of the same shape)
        for base in (0, bxp):
            pp = lax.dynamic_update_slice_in_dim(pp, zx, base, 0)
            pp = lax.dynamic_update_slice_in_dim(pp, zx, base + h + bxl, 0)
        return pp

    @jax.jit
    def chunk(pp):
        def body(_i, q):
            q = refresh(q)
            return ps.evolve_steps_resident_blocked_sc(
                q, ORDER, scale, bx, r, an, False, tx, pf,
                edges=jnp.zeros((2, 1), jnp.int32),
            )

        return lax.fori_loop(0, STEPS // r, body, pp)

    rate = _median_rate(chunk, p2, bxl * N * N * (STEPS // r) * r)
    print(
        f"[split {N}^3 shard8] window cadence (bx={bx}, R={r}, tx={tx}):"
        f" {rate:.4g} complex updates/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    legs = sys.argv[1:] or ["512", "512-shard8"]
    for leg in legs:
        {"512": leg_512, "512-shard8": leg_shard8}[leg]()
