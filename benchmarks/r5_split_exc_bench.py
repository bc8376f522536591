"""256³ split-complex EXCITED rates: per-step GS vs the delayed-GS chunk.

The split excited dispatch at 256³ (past pair residency) is the 1-step
fused pair with the stored-state (re, im) pairs streamed per slab and the
per-step Gram-Schmidt reductions fused in (solver._solve_split, last
pallas branch). When the delayed re-orthogonalisation gate engages
(PARITY #12) the chunk drops the stores and runs the same fused kernel
with per-step norm only — structurally a strict subset of the work. This
probe prices both so the split excited perf story is measured, not
inferred (the real path's delayed-GS rates are BASELINE round-5 rows).

    PYTHONPATH=/root/repo:/root/.axon_site \
        python -u benchmarks/r5_split_exc_bench.py [exc1|exc2|dgs ...]
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
AN = ("Harmonic", DN, DT, MASS, N, N, N, 1.0, 0.0, 0.2)


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
            t_lo, p = run_chain(p, 1)
            t_hi, p = run_chain(p, 5)
            samples.append(updates_per_chunk * 4 / max(t_hi - t_lo, 1e-9))
        else:
            samples.append(updates_per_chunk * 2 / (t_hi - t_lo))
    samples.sort()
    return samples[len(samples) // 2]


def _pair(seed=0):
    rng = np.random.default_rng(seed)
    pr = np.zeros((N + 2 * EXT,) * 3, np.float32)
    pi = np.zeros_like(pr)
    sl = slice(EXT, -EXT)
    pr[sl, sl, sl] = rng.normal(size=(N, N, N)).astype(np.float32) * 0.01
    pi[sl, sl, sl] = rng.normal(size=(N, N, N)).astype(np.float32) * 0.01
    return jnp.asarray(pr), jnp.asarray(pi)


def _store2(n_lower: int):
    # solver layout (solver.py _solve_split): per-state x-padded pairs,
    # stacked on a leading state axis
    rng = np.random.default_rng(9)
    states = []
    for _s in range(n_lower):
        wr = np.zeros((N + 2 * EXT,) * 3, np.float32)
        wi = np.zeros_like(wr)
        sl = slice(EXT, -EXT)
        w = rng.normal(size=(N, N, N)).astype(np.float32)
        wr[sl, sl, sl] = w / np.sqrt(np.sum(w * w))
        states.append(ps.to_xpad_sc(jnp.asarray(wr), jnp.asarray(wi), EXT))
    return jnp.stack(states)


def leg_exc(n_lower: int) -> None:
    pr, pi = _pair()
    store2 = _store2(n_lower)
    p2 = ps.to_xpad_sc(pr, pi, EXT)

    def chunk(p):
        return ps.evolve_chunk_fused_sc(
            p, None, store2, ORDER, DT, DN, MASS, STEPS, n_lower,
            per_step_norm=True, analytic=AN,
        )

    rate = _median_rate(chunk, p2, N * N * N * STEPS)
    print(f"[exc S={n_lower}] per-step-GS fused pair: {rate:.3e} updates/s",
          flush=True)


def leg_dgs_mixed() -> None:
    pr, pi = _pair()
    p2 = ps.to_xpad_sc(pr, pi, EXT)
    tx = ps.pick_tx_mixed_sc(N, N, N, EXT, 4, analytic_b=True)

    def chunk(p):
        return ps.evolve_chunk_resident_mixed_sc(
            p, ORDER, DT, DN, MASS, STEPS, AN, tx=tx, per_step_norm=True,
        )

    rate = _median_rate(chunk, p2, N * N * N * STEPS)
    print(f"[dgs-mixed] delayed-GS psn MIXED-residency (tx={tx}): "
          f"{rate:.3e} updates/s", flush=True)


def leg_dgs() -> None:
    pr, pi = _pair()
    p2 = ps.to_xpad_sc(pr, pi, EXT)

    def chunk(p):
        return ps.evolve_chunk_fused_sc(
            p, None, None, ORDER, DT, DN, MASS, STEPS, 0,
            per_step_norm=True, analytic=AN,
        )

    rate = _median_rate(chunk, p2, N * N * N * STEPS)
    print(f"[dgs] delayed-GS psn fused pair (no stores): {rate:.3e} "
          f"updates/s", flush=True)


if __name__ == "__main__":
    legs = sys.argv[1:] or ["exc1", "dgs"]
    for leg in legs:
        if leg == "exc1":
            leg_exc(1)
        elif leg == "exc2":
            leg_exc(2)
        elif leg == "dgs":
            leg_dgs()
        elif leg == "dgs-mixed":
            leg_dgs_mixed()
        else:
            raise SystemExit(f"unknown leg {leg}")
