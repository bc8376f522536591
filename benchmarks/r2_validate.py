"""Round-2 on-chip validation & benchmarks.

Subcommands (run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/r2_validate.py <cmd>):

  kgs_bench     excited-state K=2 GS-fused sweep throughput at 256^3, S=1,
                vs the 1-step carried-coefficient path (BASELINE.md 2.89e10)
  kgs_e2e       solver end-to-end harmonic excited state through the kgs
                dispatch (64x64x128): E1 vs the 2.5 oracle
  sharded_bench 1x1x1-mesh ShardedOps K=2 analytic-B throughput at 256^3
                (VERDICT: within ~10% of the single-chip 7.33e10)
  cornell4      BASELINE config 3: SimpleCornell 128^3, 4 states, with a
                restart-from-snapshot mid-run (phase 1 interrupts during
                state 1; phase 2 resumes from the partial)

Timing uses the chained-dispatch difference method (see bench.py).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_chain(chunk, p, n_steps, n_points, label):
    def run(p, reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            p = chunk(p)
        np.asarray(p[:1, :1, :8])
        return time.perf_counter() - t0, p

    _t, p = run(p, 1)  # compile + warm
    best = 0.0
    for _ in range(3):
        t1, p = run(p, 1)
        t5, p = run(p, 5)
        per_chunk = max((t5 - t1) / 4.0, 1e-9)
        best = max(best, n_points * n_steps / per_chunk)
    print(json.dumps({"bench": label, "updates_per_s": f"{best:.3e}"}))
    return best


def _harmonic_cfg(nx, ny, nz, steps, **over):
    from wafer_tpu.config import Config

    raw = {
        "project_name": "r2v",
        "grid": {"size": {"x": nx, "y": ny, "z": nz}, "dn": 0.01, "dt": 3e-5},
        "tolerance": 1e-6,
        "central_difference": "ThreePoint",
        "wavenum": 0,
        "wavemax": 0,
        "output": {
            "screen_update": steps,
            "file_type": "Json",
            "save_wavefns": False,
            "save_potential": False,
        },
        "potential": "Harmonic",
        "mass": 1.0,
        "init_condition": "Boolean",
        "sig": 1.0,
        "init_symmetry": "NotConstrained",
        "precision": "f32",
    }
    for k, v in over.items():
        if isinstance(v, dict):
            raw[k].update(v)
        else:
            raw[k] = v
    return Config.from_dict(raw)


def kgs_bench():
    import os

    from wafer_tpu import geometry
    from wafer_tpu.models import initial, potentials as pmod
    from wafer_tpu.ops import pallas_stencil as pk

    n, steps = int(os.environ.get("KGS_N", "256")), 200
    cfg = _harmonic_cfg(n, n, n, steps)
    order, ext = "ThreePoint", 1
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    analytic = ("Harmonic", dn, dt, mass, n, n, n)

    rng = np.random.default_rng(0)
    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)
    lower = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()).astype(np.float32)), ext
    )
    lower = lower / jnp.sqrt(jnp.sum(lower * lower))

    # 1-step carried path (the round-1 number)
    store_x = jnp.stack([pk.to_xpad(lower, ext)])

    def chunk1(p):
        return pk.evolve_chunk_fused(
            p, None, store_x, order, dt, dn, mass, steps, 1, analytic=analytic
        )

    time_chain(chunk1, pk.to_xpad(phi, ext), steps, n ** 3, "excited 1-step S=1 analytic")

    # kgs K=2 path
    sl_x, _n2, _ov = pk.evolve_step_fused(
        pk.to_xpad(lower, ext), None, None, order, scale, 0, False, analytic=analytic
    )
    sl = pk.from_xpad(sl_x, ext)
    store2 = jnp.stack([pk.to_xpad_k(w, ext, 2) for w in (lower, sl)])
    l_flat = lower.reshape(1, -1)
    sl_flat = sl.reshape(1, -1)
    gram_g = sl_flat @ sl_flat.T
    gram_h = l_flat @ sl_flat.T

    def chunk2(p):
        return pk.evolve_chunk_fused_kgs(
            p, None, store2, gram_g, gram_h, order, dt, dn, mass, steps, 1,
            analytic=analytic,
        )

    time_chain(chunk2, pk.to_xpad_k(phi, ext, 2), steps, n ** 3, "excited kgs K=2 S=1 analytic")

    # kgs S=0 (per-step-norm ground guard)
    def chunk0(p):
        return pk.evolve_chunk_fused_kgs(
            p, None, None, None, None, order, dt, dn, mass, steps, 0,
            analytic=analytic,
        )

    time_chain(chunk0, pk.to_xpad_k(phi, ext, 2), steps, n ** 3, "psn ground kgs K=2 analytic")


def k3_bench():
    """Ground-state K=2 vs K=3 analytic-B at 256^3: the measured roofline
    (benchmarks/roofline.py: copy ~690 GB/s) shows headroom above the K=2
    number, so deeper temporal blocking may now pay off."""
    from wafer_tpu import geometry
    from wafer_tpu.models import initial
    from wafer_tpu.ops import pallas_stencil as pk

    n, steps = 256, 198  # divisible by 2 and 3
    cfg = _harmonic_cfg(n, n, n, steps)
    order, ext = "ThreePoint", 1
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    analytic = ("Harmonic", dn, dt, mass, n, n, n)
    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)

    for kf in (2, 3, 4):
        itemsize = 4
        if not pk.k_fuse_supported(n, n, n, ext, itemsize, kf, True):
            print(json.dumps({"k": kf, "skipped": "VMEM"}))
            continue

        def chunk(p, _kf=kf):
            return pk.evolve_chunk_fused_k(
                p, None, order, dt, dn, mass, steps - steps % _kf, _kf,
                analytic=analytic,
            )

        time_chain(
            chunk, pk.to_xpad_k(phi, ext, kf), steps - steps % kf, n ** 3,
            f"ground K={kf} analytic",
        )


def f64_bench():
    """f64 sweep throughput on this chip (XLA path — the Pallas kernels are
    f32-only; TPU f64 is emulated). Feeds the BASELINE.md dtype-policy row:
    below the f32 1e-6 noise floor users switch to precision: f64."""
    import jax.numpy as jnp

    from wafer_tpu.models import initial, potentials as pmod
    from wafer_tpu.ops.stencil import evolve_step

    jax.config.update("jax_enable_x64", True)
    n, steps = 128, 100
    cfg = _harmonic_cfg(n, n, n, steps, precision="f64")
    order = cfg.central_difference.value
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    v = pmod.generate(cfg).astype(jnp.float64)
    a, b = pmod.build_ab(v, dt)
    phi = initial.set_initial_conditions(cfg).astype(jnp.float64)

    @jax.jit
    def chunk(p):
        return jax.lax.fori_loop(
            0, steps, lambda _i, q: evolve_step(q, a, b, order, dt, dn, mass), p
        )

    time_chain(chunk, phi, steps, n ** 3, f"f64 XLA sweep {n}^3")


def kgs_e2e():
    import os
    import tempfile

    d = tempfile.mkdtemp()
    os.chdir(d)
    os.makedirs("input", exist_ok=True)
    from wafer_tpu import solver
    from wafer_tpu.io import run_dir

    # Gaussian (noisy) IC: state 1 starts from the ground-state clone, whose
    # post-projection residual carries the ground solve's own IC spectrum —
    # a purely even IC (Constant) leaves the odd true-E₁ modes seeded only
    # by rounding noise, and which excited level wins is then a race between
    # noise growth and the tolerance check (the reference behaves the same,
    # src/grid.rs:60-100; its own default guidance is a noisy IC,
    # wafer.yaml:79-80).
    cfg = _harmonic_cfg(
        64, 64, 128, 200,
        grid={"dn": 0.15, "dt": 0.005},
        wavemax=1,
        max_steps=200000,
        init_condition="Gaussian",
    )
    run_dir.check_output_dir(cfg.project_name)
    t0 = time.perf_counter()
    results = solver.run(cfg, seed=3)
    wall = time.perf_counter() - t0
    for r in results:
        e = r.observables.energy / r.observables.norm2
        print(json.dumps({"state": r.wnum, "E": float(np.real(e)), "steps": r.steps}))
    print(json.dumps({"bench": "kgs_e2e harmonic 64x64x128", "wall_s": round(wall, 1)}))


def resident_e2e():
    """Solver end-to-end through both VMEM-resident dispatches:
    harmonic 128³ ground (plain resident; E₀ vs the 1.5 oracle) and
    SimpleCornell 128³ ground (per-step-norm drift-guard resident;
    binding < 0 oracle, BASELINE.md has −0.27163)."""
    import os
    import tempfile

    d = tempfile.mkdtemp()
    os.chdir(d)
    os.makedirs("input", exist_ok=True)
    from wafer_tpu import solver
    from wafer_tpu.config import Config
    from wafer_tpu.io import run_dir

    cfg = _harmonic_cfg(
        128, 128, 128, 200,
        grid={"dn": 0.15, "dt": 0.005},
        max_steps=200000,
        init_condition="Constant",
    )
    run_dir.check_output_dir(cfg.project_name)
    t0 = time.perf_counter()
    results = solver.run(cfg, seed=3)
    wall = time.perf_counter() - t0
    e0 = float(np.real(results[0].observables.energy / results[0].observables.norm2))
    print(json.dumps({
        "bench": "resident_e2e harmonic 128^3",
        "E0": e0, "oracle": 1.5, "steps": results[0].steps,
        "wall_s": round(wall, 1),
        "updates_per_s": f"{128**3 * results[0].steps / wall:.3e}",
    }))
    assert abs(e0 - 1.5) < 5e-3, e0

    cfgc = Config.from_dict({
        "project_name": "res-cornell",
        "grid": {"size": {"x": 128, "y": 128, "z": 128}, "dn": 0.35, "dt": 0.04},
        "tolerance": 1e-6,
        "central_difference": "ThreePoint",
        "wavenum": 0,
        "wavemax": 0,
        "max_steps": 200000,
        "output": {
            "screen_update": 500,
            "file_type": "Json",
            "save_wavefns": False,
            "save_potential": False,
        },
        "potential": "SimpleCornell",
        "mass": 4.65,
        "sig": 0.223,
        "init_condition": "Gaussian",
        "init_symmetry": "NotConstrained",
        "precision": "f32",
    })
    run_dir.check_output_dir(cfgc.project_name)
    t0 = time.perf_counter()
    resc = solver.run(cfgc, seed=5)
    wall = time.perf_counter() - t0
    oc = resc[0].observables
    binding = float(np.real(oc.energy / oc.norm2)) - float(oc.v_infinity / oc.norm2)
    print(json.dumps({
        "bench": "resident_e2e cornell 128^3 (per-step-norm guard)",
        "binding": round(binding, 5), "expected": -0.27163,
        "steps": resc[0].steps, "wall_s": round(wall, 1),
        "updates_per_s": f"{128**3 * resc[0].steps / wall:.3e}",
    }))
    assert binding < 0, binding

    # streamed-B resident (no analytic formula): Dodecahedron, a deep
    # (−100) well — also engages the per-step-norm drift guard, so this
    # exercises the resident kernel's B-window DMA + SMEM-carried inv
    cfgd = _harmonic_cfg(
        128, 128, 128, 200,
        grid={"dn": 0.1, "dt": 0.003},
        max_steps=200000,
        potential="Dodecahedron",
        init_condition="Gaussian",
    )
    run_dir.check_output_dir(cfgd.project_name)
    t0 = time.perf_counter()
    resd = solver.run(cfgd, seed=7)
    wall = time.perf_counter() - t0
    ed = float(np.real(resd[0].observables.energy / resd[0].observables.norm2))
    print(json.dumps({
        "bench": "resident_e2e dodecahedron 128^3 (streamed-B + psn guard)",
        "E0": round(ed, 4), "steps": resd[0].steps, "wall_s": round(wall, 1),
    }))
    assert -100.0 < ed < 0.0, ed


def complex_e2e():
    """Absorptive oscillator V = (1+0.2i)·r²/2 at 64×64×128 through the
    solver — on the tunnel (no complex dtypes) this runs the split-complex
    path, now through the (re, im)-resident kernel. Oracle:
    E = 1.5·√(1+0.2i) = 1.50741 + 0.14926i (BASELINE recorded
    1.50522 + 0.14923i for the discretised operator)."""
    import os
    import tempfile

    d = tempfile.mkdtemp()
    os.chdir(d)
    os.makedirs("input", exist_ok=True)
    from wafer_tpu import solver
    from wafer_tpu.io import run_dir

    cfg = _harmonic_cfg(
        64, 64, 128, 200,
        grid={"dn": 0.15, "dt": 0.004},
        potential="ComplexHarmonic",
        absorb=0.2,
        max_steps=200000,
        init_condition="Gaussian",
    )
    run_dir.check_output_dir(cfg.project_name)
    t0 = time.perf_counter()
    results = solver.run(cfg, seed=3)
    wall = time.perf_counter() - t0
    e = results[0].observables.energy / results[0].observables.norm2
    e = complex(e)
    print(json.dumps({
        "bench": "complex_e2e absorptive oscillator 64x64x128 (split path)",
        "E0": [round(e.real, 5), round(e.imag, 5)],
        "oracle": [1.50741, 0.14926],
        "steps": results[0].steps, "wall_s": round(wall, 1),
    }))
    assert abs(e.real - 1.507) < 0.02 and abs(e.imag - 0.1493) < 0.005, e


def sync_bench():
    """Steady-state host-sync cost: 256³ harmonic ground, fixed 40 chunks
    (tolerance unreachable), sync_update 1 vs 8, with the solver's
    per-chunk/per-batch debug timings printed. The first line of each run
    includes the compile; later lines are steady state."""
    import logging as _logging
    import os
    import tempfile

    d = tempfile.mkdtemp()
    os.chdir(d)
    os.makedirs("input", exist_ok=True)
    from wafer_tpu import errors, solver
    from wafer_tpu.io import run_dir

    lg = _logging.getLogger("wafer")
    lg.setLevel(_logging.DEBUG)
    h = _logging.StreamHandler()
    h.setLevel(_logging.DEBUG)
    h.addFilter(lambda r: "updates/s" in r.getMessage())
    lg.addHandler(h)

    for sync in (8, 1):
        cfg = _harmonic_cfg(
            256, 256, 256, 500,
            grid={"dn": 0.0625, "dt": 1.3e-3},
            tolerance=1e-30,
            max_steps=20000,
        )
        cfg.sync_update = sync
        run_dir.check_output_dir(cfg.project_name)
        t0 = time.perf_counter()
        try:
            solver.run(cfg, seed=2)
        except errors.MaxStepError:
            pass
        wall = time.perf_counter() - t0
        print(json.dumps({
            "bench": f"sync_bench 256^3 ground, sync_update={sync}",
            "chunks": 41, "wall_s": round(wall, 1),
            "per_chunk_s": round(wall / 41, 3),
        }), flush=True)


def northstar():
    """BASELINE north star: 256³ Coulomb, ground + two excited states to
    1e-6, one chip. Round-2 prior: 562 s wall (K-ladder ground + 1-step
    carried excited); the resident kernels should roughly halve it."""
    import os
    import tempfile

    d = tempfile.mkdtemp()
    os.chdir(d)
    os.makedirs("input", exist_ok=True)
    from wafer_tpu import solver
    from wafer_tpu.config import Config
    from wafer_tpu.io import run_dir

    cfg = Config.from_dict({
        "project_name": "northstar",
        "grid": {"size": {"x": 256, "y": 256, "z": 256}, "dn": 0.0625,
                 "dt": 1.3e-3},
        "tolerance": 1e-6,
        "central_difference": "ThreePoint",
        "wavenum": 0,
        "wavemax": 2,
        "max_steps": 500000,
        "output": {
            "screen_update": 500,
            "file_type": "Json",
            "save_wavefns": False,
            "save_potential": False,
        },
        "potential": "Coulomb",
        "mass": 1.0,
        "init_condition": "Coulomb",
        "sig": 1.0,
        "init_symmetry": "NotConstrained",
        "precision": "f32",
    })
    run_dir.check_output_dir(cfg.project_name)
    t0 = time.perf_counter()
    results = solver.run(cfg, seed=1)
    wall = time.perf_counter() - t0
    total_steps = sum(r.steps for r in results)
    for r in results:
        e = float(np.real(r.observables.energy / r.observables.norm2))
        print(json.dumps({"state": r.wnum, "E": round(e, 6), "steps": r.steps}))
    print(json.dumps({
        "bench": "northstar 256^3 Coulomb 3 states 1e-6",
        "wall_s": round(wall, 1), "total_steps": total_steps,
        "sustained_updates_per_s": f"{256**3 * total_steps / wall:.3e}",
    }))


def sharded_bench():
    from wafer_tpu import geometry
    from wafer_tpu.models import initial, potentials as pmod
    from wafer_tpu.parallel.mesh import make_mesh
    from wafer_tpu.parallel.sharded import ShardedOps

    n, steps = 256, 200
    cfg = _harmonic_cfg(n, n, n, steps)
    ext = 1
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    ops = ShardedOps(cfg, mesh, 0, use_pallas=True)
    print(json.dumps({
        "k_fuse": ops.k_fuse, "res_steps": ops.res_steps,
        "analytic": ops.analytic is not None,
    }))
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    phi = ops.put(geometry.work_area(initial.set_initial_conditions(cfg), ext).astype(jnp.float32))
    a_d = ops.put(geometry.work_area(a, ext))
    b_d = ops.put(geometry.work_area(b, ext))
    store = ops.put_store(None)

    def chunk(p):
        return ops.evolve_chunk(p, a_d, b_d, store)

    time_chain(chunk, phi, steps, n ** 3, "sharded 1x1x1 ground (resident/K ladder) analytic")


def cornell4():
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp()
    os.chdir(d)
    os.makedirs("input", exist_ok=True)
    from wafer_tpu import errors, solver
    from wafer_tpu.config import Config
    from wafer_tpu.io import run_dir

    def cfg_raw(wavenum, wavemax, max_steps):
        return Config.from_dict(
            {
                "project_name": "cornell4",
                "grid": {"size": {"x": 128, "y": 128, "z": 128}, "dn": 0.35, "dt": 0.04},
                "tolerance": 1e-6,
                "central_difference": "ThreePoint",
                "wavenum": wavenum,
                "wavemax": wavemax,
                "max_steps": max_steps,
                "output": {
                    "screen_update": 500,
                    "snap_update": 2000,
                    "file_type": "Json",
                    "save_wavefns": True,
                    "save_potential": False,
                },
                "potential": "SimpleCornell",
                "mass": 4.65,
                "sig": 0.223,
                "init_condition": "Gaussian",
                "init_symmetry": "NotConstrained",
                "precision": "f32",
                "seed": 11,
            }
        )

    # Phase 1a: converge the ground state; 1b: start state 1 and interrupt
    # it mid-flight (max_steps), leaving its _partial snapshot on disk
    t0 = time.perf_counter()
    cfg1 = cfg_raw(0, 0, 400000)
    run_dir.check_output_dir(cfg1.project_name)
    solver.run(cfg1, seed=11)
    out_dir = run_dir.get_project_dir(cfg1.project_name)
    shutil.copy(
        os.path.join(out_dir, "wavefunction_0.json"), "input/wavefunction_0.json"
    )
    run_dir.reset_proj_date()
    cfg1b = cfg_raw(1, 1, 1500)
    cfg1b.output.snap_update = 500
    run_dir.check_output_dir(cfg1b.project_name)
    interrupted = False
    try:
        solver.run(cfg1b, seed=11)
    except errors.MaxStepError:
        interrupted = True
    wall1 = time.perf_counter() - t0
    print(json.dumps({"phase": 1, "interrupted": interrupted, "wall_s": round(wall1, 1)}))

    # Stage the interrupted state 1's partial snapshot as input
    out_dir1b = run_dir.get_project_dir(cfg1b.project_name)
    for f in os.listdir(out_dir1b):
        if f.startswith("wavefunction_"):
            shutil.copy(os.path.join(out_dir1b, f), os.path.join("input", f))
            print(json.dumps({"staged": f}))

    # Phase 2: resume state 1 from its _partial, converge states 1..3
    run_dir.reset_proj_date()
    cfg2 = cfg_raw(1, 3, 400000)
    run_dir.check_output_dir(cfg2.project_name)
    t0 = time.perf_counter()
    results = solver.run(cfg2, seed=11)
    wall2 = time.perf_counter() - t0
    n_pts = 128 ** 3
    tot_steps = sum(r.steps for r in results)
    for r in results:
        e = float(np.real(r.observables.energy / r.observables.norm2))
        vinf = r.observables.v_infinity / r.observables.norm2
        print(json.dumps({
            "state": r.wnum, "E_GeV": round(e, 6),
            "binding_GeV": round(e - float(vinf), 6), "steps": r.steps,
        }))
    print(json.dumps({
        "phase": 2, "wall_s": round(wall2, 1),
        "updates_per_s": f"{n_pts * tot_steps / wall2:.3e}",
    }))




def yt_bench():
    """512^3 ground sweep: y-tiled kernel (8-sublane halo granularity) vs
    the z-tiled kernel it supersedes (128-lane halo refetch ~doubles reads).
    Round-1 zt number: 2.43e10 analytic."""
    import unittest.mock as mock

    from wafer_tpu import geometry
    from wafer_tpu.models import initial
    from wafer_tpu.ops import pallas_stencil as pk

    n, steps = 512, 50
    cfg = _harmonic_cfg(n, n, n, steps)
    order, ext = "ThreePoint", 1
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    analytic = ("Harmonic", dn, dt, mass, n, n, n)
    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)
    print(json.dumps({"yt pick": pk._pick_tx_yt(n, n, n, ext, 4, 0, True),
                      "zt pick": pk._pick_tx_zt(n, n, n, ext, 4, 0, True)}))

    def chunk(p):
        return pk.evolve_chunk_fused(
            p, None, None, order, dt, dn, mass, steps, 0, analytic=analytic
        )

    time_chain(chunk, pk.to_xpad(phi, ext), steps, n ** 3, "512^3 ground yt analytic")

    with mock.patch.object(pk, "_pick_tx_yt", lambda *a, **k: None):
        def chunk_zt(p):
            return pk.evolve_chunk_fused(
                p, None, None, order, dt, dn, mass, steps, 0, analytic=analytic
            )

        time_chain(
            chunk_zt, pk.to_xpad(phi, ext), steps, n ** 3, "512^3 ground zt analytic"
        )


def tx_sweep():
    """Empirical slab-height sweep at 256^3: the VMEM budget now admits
    tx up to 64, but measured throughput peaks at moderate tx (pipeline
    granularity vs window amplification). Feeds the picker caps."""
    import unittest.mock as mock

    from wafer_tpu import geometry
    from wafer_tpu.models import initial
    from wafer_tpu.ops import pallas_stencil as pk

    n, steps = 256, 200
    cfg = _harmonic_cfg(n, n, n, steps)
    order, ext = "ThreePoint", 1
    dn, dt, mass = cfg.grid.dn, cfg.grid.dt, cfg.mass
    analytic = ("Harmonic", dn, dt, mass, n, n, n)
    phi = initial.set_initial_conditions(cfg).astype(jnp.float32)

    for kf in (2, 4):
        for tx in (8, 16, 32):
            with mock.patch.object(pk, "_pick_tx_k", lambda *a, _tx=tx, **k: _tx):
                def chunk(p, _kf=kf):
                    return pk.evolve_chunk_fused_k(
                        p, None, order, dt, dn, mass, steps, _kf, analytic=analytic
                    )

                time_chain(
                    chunk, pk.to_xpad_k(phi, ext, kf), steps, n ** 3,
                    f"K={kf} tx={tx}",
                )

    # excited kgs tx sweep
    rng = np.random.default_rng(0)
    lower = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()).astype(np.float32)), ext
    )
    lower = lower / jnp.sqrt(jnp.sum(lower * lower))
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    sl_x, _n2, _ov = pk.evolve_step_fused(
        pk.to_xpad(lower, ext), None, None, order, scale, 0, False, analytic=analytic
    )
    sl = pk.from_xpad(sl_x, ext)
    store2 = jnp.stack([pk.to_xpad_k(w, ext, 2) for w in (lower, sl)])
    gram_g = sl.reshape(1, -1) @ sl.reshape(-1, 1)
    gram_h = lower.reshape(1, -1) @ sl.reshape(-1, 1)
    for tx in (8, 16, 32):
        with mock.patch.object(pk, "_pick_tx_kgs", lambda *a, _tx=tx, **k: _tx):
            def chunk2(p):
                return pk.evolve_chunk_fused_kgs(
                    p, None, store2, gram_g, gram_h, order, dt, dn, mass,
                    steps, 1, analytic=analytic,
                )

            time_chain(chunk2, pk.to_xpad_k(phi, ext, 2), steps, n ** 3,
                       f"kgs S=1 tx={tx}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "kgs_bench"
    # CLI parity: the wafer CLI always enables x64 (f64 observables
    # accumulation and f64 convergence quotients; f32 arrays stay f32) —
    # without it |E| > ~2 loses the 1e-6 tolerance signal to f32 ulps.
    if cmd.endswith("_e2e") or cmd in ("northstar", "cornell4", "sync_bench"):
        jax.config.update("jax_enable_x64", True)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  cmd={cmd}")
    {
        "kgs_bench": kgs_bench,
        "k3_bench": k3_bench,
        "f64_bench": f64_bench,
        "yt_bench": yt_bench,
        "tx_sweep": tx_sweep,
        "kgs_e2e": kgs_e2e,
        "resident_e2e": resident_e2e,
        "sync_bench": sync_bench,
        "complex_e2e": complex_e2e,
        "northstar": northstar,
        "sharded_bench": sharded_bench,
        "cornell4": cornell4,
    }[cmd]()
