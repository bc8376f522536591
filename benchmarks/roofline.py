"""Measure this chip's achievable HBM bandwidth (the sweep's roofline).

BASELINE.json sets the kernel target at >=80% of the TPU HBM roofline; this
script measures the *achievable* ceiling with trivial Pallas streaming
kernels at the sweep's own shape (256^3 f32), so the sweep's GB/s can be
reported as a percentage of something measured rather than a datasheet
number.

Kernels:
  copy : out = in                 (2 streams, the sweep's minimal pattern)
  triad: out = a + 2*b            (3 streams, STREAM-triad style)
  read : s += sum(in)             (1 stream, read-only)

Timing through the axon tunnel uses the chained-dispatch difference method
(see bench.py and memory/axon-tpu-quirks.md): block_until_ready is async, so
each measurement runs chains of R-fold fori_loop kernels at two chain
lengths and differences the wall-clocks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
N = int(os.environ.get("ROOFLINE_N", "256"))
# slab height: the widest of the kernels (triad) double-buffers 3 blocks —
# keep 6·TX·N²·4 B inside a ~11 MiB budget
TX = next(t for t in (8, 4, 2, 1) if N % t == 0 and 6 * t * N * N * 4 <= 11e6)
R = 50  # kernel invocations per jit call


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def _triad_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + 2.0 * b_ref[...]


def _read_kernel(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[0, 0] = jnp.zeros((), o_ref.dtype)

    o_ref[0, 0] += jnp.sum(x_ref[...])


def _spec(tx=TX):
    return pl.BlockSpec((tx, N, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@jax.jit
def copy_chain(x):
    def body(_i, p):
        return pl.pallas_call(
            _copy_kernel,
            grid=(N // TX,),
            in_specs=[_spec()],
            out_specs=_spec(),
            out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        )(p)

    return jax.lax.fori_loop(0, R, body, x)


@jax.jit
def triad_chain(x):
    def body(_i, p):
        return pl.pallas_call(
            _triad_kernel,
            grid=(N // TX,),
            in_specs=[_spec(), _spec()],
            out_specs=_spec(),
            out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        )(p, p)

    return jax.lax.fori_loop(0, R, body, x)


@jax.jit
def read_chain(x):
    def body(_i, carry):
        p, acc = carry
        s = pl.pallas_call(
            _read_kernel,
            grid=(N // TX,),
            in_specs=[_spec()],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(p)
        # poke the sum back into one cell so the R reads stay data-dependent
        # (prevents CSE of identical pure calls); in-place inside fori_loop,
        # so no extra HBM pass
        p = jax.lax.dynamic_update_slice(
            p, (s * 1e-30).reshape(1, 1, 1), (0, 0, 0)
        )
        return p, acc + s[0, 0]

    p, acc = jax.lax.fori_loop(0, R, body, (x, jnp.float32(0.0)))
    return p + 0.0 * acc


@jax.jit
def xla_chain(x):
    # XLA elementwise pass for cross-checking the pallas pipelines
    return jax.lax.fori_loop(0, R, lambda _i, p: p * 1.0000001 + 1e-12, x)


def _time_chain(fn, x, reps):
    t0 = time.perf_counter()
    for _ in range(reps):
        x = fn(x)
    np.asarray(x[:1, :1, :8])  # true sync through the tunnel
    return time.perf_counter() - t0, x


def measure(fn, x, streams, label):
    _t, x = _time_chain(fn, x, 1)  # compile + warm
    best = 0.0
    for _ in range(3):
        t1, x = _time_chain(fn, x, 1)
        t5, x = _time_chain(fn, x, 5)
        per_call = max((t5 - t1) / 4.0, 1e-9)
        gbs = R * streams * (N ** 3) * 4 / per_call / 1e9
        best = max(best, gbs)
    print(json.dumps({"kernel": label, "streams": streams, "GB/s": round(best, 1)}))
    return best


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  grid {N}^3 f32")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(N, N, N)).astype(np.float32))
    x = jax.device_put(x, dev)
    results = {}
    results["copy"] = measure(copy_chain, x, 2, "pallas copy (r+w)")
    results["triad"] = measure(triad_chain, x, 3, "pallas triad (2r+w)")
    results["read"] = measure(read_chain, x, 1, "pallas read-reduce")
    results["xla"] = measure(xla_chain, x, 2, "xla elementwise (r+w)")
    # Ceiling = best HBM-streaming kernel. Caveat: when an array fits VMEM
    # (~128 MiB), XLA keeps the loop carry resident and the "bandwidth" is
    # VMEM's, not HBM's — run with ROOFLINE_N=384 (226 MiB arrays) for the
    # honest HBM ceiling.
    print(json.dumps({"N": N, "ceiling_GB_s": round(max(results["copy"], results["triad"]), 1)}))


if __name__ == "__main__":
    main()
