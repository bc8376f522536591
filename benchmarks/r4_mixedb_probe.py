"""256³ streamed-B split-complex: K=2 pair vs the streamed-B mixed kernel.

Non-analytic complex potentials (ComplexFullCornell — the finite-T
quarkonium flagship, BASELINE config 4 literal) cannot use the in-kernel
analytic-B recompute, so until round 4 they rode the K=2 streamed-B split
pair. This probe prices the new streamed-B MIXED-residency kernel against
it: re VMEM-resident for the whole chunk, im + the (Br, Bi) slab windows
streamed double-buffered (16 B/update vs the K pair's amplified windows +
mid-step recompute at the pair's small tx).

Legs: ``k2`` (the old dispatch), ``mixed-b`` (the new one), ``fused1``
(1-step streamed fused, the ladder floor). B contents don't affect speed,
so the streams carry synthetic (Br, Bi) arrays of the Cornell shape.

Capability referent: the reference stubs complex Cornell physics as real
(/root/reference/src/potential.rs:222,250-271).

    PYTHONPATH=/root/repo:/root/.axon_site \
        python -u benchmarks/r4_mixedb_probe.py [k2|mixed-b|fused1 ...]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wafer_tpu.ops import pallas_split as ps  # noqa: E402

N = 256
STEPS = 200
ORDER, EXT = "ThreePoint", 1
DN, DT, MASS = 0.0625, 1.3e-3, 1.0


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
            # degenerate sample (async-tunnel timing noise): enlarge the
            # chain-length delta to 1 vs 5 instead of falling back to an
            # absolute wall, which would fold per-chain dispatch overhead
            # into the rate (CLAUDE.md timing discipline / ADVICE r4)
            t_lo, p = run_chain(p, 1)
            t_hi, p = run_chain(p, 5)
            samples.append(updates_per_chunk * 4 / max(t_hi - t_lo, 1e-9))
        else:
            samples.append(updates_per_chunk * 2 / (t_hi - t_lo))
    samples.sort()
    return samples[len(samples) // 2]


def _fields(seed=0):
    rng = np.random.default_rng(seed)
    pr = np.zeros((N + 2 * EXT,) * 3, np.float32)
    pi = np.zeros_like(pr)
    sl = slice(EXT, -EXT)
    pr[sl, sl, sl] = rng.normal(size=(N, N, N)).astype(np.float32) * 0.01
    pi[sl, sl, sl] = rng.normal(size=(N, N, N)).astype(np.float32) * 0.01
    # synthetic (Br, Bi) streams, work-area stacked — contents are
    # speed-irrelevant, the shape/dtype is the Cornell case's
    br = rng.uniform(0.9, 1.0, size=(N, N, N)).astype(np.float32)
    bi = rng.uniform(-0.05, 0.0, size=(N, N, N)).astype(np.float32)
    b2 = jnp.concatenate([jnp.asarray(br), jnp.asarray(bi)], axis=0)
    return jnp.asarray(pr), jnp.asarray(pi), b2


def leg_k2() -> None:
    k = 2
    assert ps.k_fuse_sc_supported(N, N, N, EXT, 4, k, False)
    pr, pi, b2 = _fields()
    e1 = (k - 1) * EXT
    pad = ((e1, e1), (0, 0), (0, 0))
    b2k = jnp.concatenate(
        [jnp.pad(b2[:N], pad), jnp.pad(b2[N:], pad)], axis=0
    )
    p2 = ps.to_xpad_k_sc(pr, pi, EXT, k)

    def chunk(p):
        return ps.evolve_chunk_fused_k_sc(
            p, b2k, ORDER, DT, DN, MASS, STEPS, k, analytic=None
        )

    rate = _median_rate(chunk, p2, N ** 3 * STEPS)
    print(f"[{N}^3 streamed-B K=2 pair] {rate:.4g} complex updates/s",
          flush=True)


def leg_mixed_b() -> None:
    tx = ps.pick_tx_mixed_sc(N, N, N, EXT, 4, analytic_b=False)
    print(f"[{N}^3 streamed-B mixed] tx -> {tx}", flush=True)
    assert tx is not None
    pr, pi, b2 = _fields()
    p2 = ps.to_xpad_sc(pr, pi, EXT)

    def chunk(p):
        return ps.evolve_chunk_resident_mixed_sc(
            p, ORDER, DT, DN, MASS, STEPS, None, tx=tx, b2=b2
        )

    rate = _median_rate(chunk, p2, N ** 3 * STEPS)
    print(
        f"[{N}^3 streamed-B mixed] re resident, im+(Br,Bi) streamed "
        f"(tx={tx}): {rate:.4g} complex updates/s",
        flush=True,
    )


def leg_fused1() -> None:
    pr, pi, b2 = _fields()
    p2 = ps.to_xpad_sc(pr, pi, EXT)

    def chunk(p):
        return ps.evolve_chunk_fused_sc(
            p, b2, None, ORDER, DT, DN, MASS, STEPS, 0, analytic=None
        )

    rate = _median_rate(chunk, p2, N ** 3 * STEPS)
    print(f"[{N}^3 streamed-B 1-step fused] {rate:.4g} complex updates/s",
          flush=True)


if __name__ == "__main__":
    legs = sys.argv[1:] or ["k2", "mixed-b"]
    for leg in legs:
        {"k2": leg_k2, "mixed-b": leg_mixed_b, "fused1": leg_fused1}[leg]()
