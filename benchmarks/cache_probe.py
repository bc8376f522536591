"""Probe: does JAX's persistent compilation cache work through the axon tunnel?

Remote Pallas compiles through the tunnel cost 1-5 min per new kernel shape
(resident family: 2-12 min at 256^3) and dominate end-to-end walls for short
runs.  JAX's persistent compilation cache stores serialized PJRT executables
keyed by HLO fingerprint; whether the axon PJRT client supports executable
serialization/deserialization decides if repeat runs skip the remote compile.

Run twice in fresh processes:
    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/cache_probe.py
First run populates WAFER_COMPILE_CACHE (default /root/.cache/wafer_tpu_xla);
second run reports whether the compile was served from cache (wall << first).
"""

from __future__ import annotations

import os
import sys
import time

import jax

CACHE_DIR = os.environ.get("WAFER_COMPILE_CACHE", "/root/.cache/wafer_tpu_xla")

jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    n = int(os.environ.get("WAFER_CACHE_PROBE_N", "128"))
    dev = jax.devices()[0]
    print(f"platform={dev.platform} cache_dir={CACHE_DIR}", flush=True)

    from wafer_tpu.ops import pallas_stencil as pk

    ext = 1
    assert pk.resident_supported(n, n, n, ext, 4, True), "pick a resident shape"
    x = np.zeros((n + 2 * ext,) * 3, np.float32)  # fully-padded layout
    x[ext:-ext, ext:-ext, ext:-ext] = (
        np.random.default_rng(0).standard_normal((n, n, n)).astype(np.float32)
    )
    phi = pk.to_xpad(jax.device_put(jnp.asarray(x), dev), ext)
    analytic = ("Harmonic", 0.05, 1e-4, 1.0, n, n, n)

    t0 = time.perf_counter()
    out = pk.evolve_chunk_resident(phi, "ThreePoint", 1e-4, 0.05, 1.0, 4, analytic)
    np.asarray(out[:1, :1, :8])
    t_first = time.perf_counter() - t0
    print(f"first-dispatch wall (compile + run): {t_first:.2f} s", flush=True)

    t0 = time.perf_counter()
    out = pk.evolve_chunk_resident(out, "ThreePoint", 1e-4, 0.05, 1.0, 4, analytic)
    np.asarray(out[:1, :1, :8])
    t_warm = time.perf_counter() - t0
    print(f"warm dispatch wall: {t_warm:.2f} s", flush=True)

    try:
        entries = os.listdir(CACHE_DIR)
    except OSError:
        entries = []
    print(f"cache entries now: {len(entries)}", flush=True)


if __name__ == "__main__":
    main()
