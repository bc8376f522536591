"""Prototype: fully VMEM-resident multi-step stencil kernel.

Thesis: at 256³ f32 the x-padded ψ (64.5 MiB) fits in the v5e's 128 MiB
VMEM, so an entire ``screen_update`` chunk can run on-chip — one HBM read
and one write per *chunk* instead of per K steps. The K=3 ladder
(8.7e10 up/s) is VPU/recompute-bound at ~1.4× compute amplification from
trapezoidal halo recompute; a resident in-place sweep has **zero**
recompute (a lag buffer carries the ext old planes across slabs), so the
expected rate is the raw VPU stencil speed ~1.2e11 up/s.

Modes:
  python benchmarks/resident_probe.py check   # interpret-mode numerics (CPU)
  python benchmarks/resident_probe.py bench   # TPU timing vs the K-fused path
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wafer_tpu import geometry
from wafer_tpu.ops import pallas_stencil as pk


def _shift_sum_roll(c, off):
    """roll-based shift(+off)+shift(−off) with Dirichlet edge correction —
    the experimental alternative to two zero-concat shifts per tap."""
    import jax.numpy as _jnp
    from jax.experimental.pallas import tpu as _pltpu

    tx_, ny_, nz_ = c.shape

    def one(axis, n_ax):
        # pltpu.roll requires non-negative shifts: −off ≡ n_ax − off
        up = _pltpu.roll(c, n_ax - off, axis)  # c[i+off] at i (wraps at top)
        dn_ = _pltpu.roll(c, off, axis)
        iota = jax.lax.broadcasted_iota(_jnp.int32, c.shape, axis)
        up = _jnp.where(iota >= n_ax - off, 0.0, up)
        dn_ = _jnp.where(iota < off, 0.0, dn_)
        return up + dn_

    return one


def _evolve_kernel_resident(
    phi_hbm,  # (NX+2e, NY, NZ) ANY
    out_hbm,  # (NX+2e, NY, NZ) ANY
    psi_buf,  # (NX+2e, NY, NZ) VMEM scratch — resident across all programs
    lag,      # (ext, NY, NZ) VMEM — old planes already overwritten in place
    yz_buf,   # (NY, NZ) VMEM — analytic-B y/z precompute
    sem_in,
    sem_out,
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    analytic,
    nx: int,
    fast_b: bool = False,
    roll_shifts: bool = False,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    ny, nz = psi_buf.shape[1], psi_buf.shape[2]
    kind, dn, dt_, _mass, ngx, ngy, ngz = analytic[:7]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0

    @pl.when(i == 0)
    def _load():
        cp = pltpu.make_async_copy(phi_hbm, psi_buf, sem_in)
        cp.start()
        cp.wait()
        yz = pk._analytic_yz(analytic, ny, nz, ext, ext)
        if fast_b:
            # Harmonic: b = 1/(1 + dt/2·(0.5·dn²·(dx²+yz) − vshift))
            #             = 1/(P + q_x); P hoisted across all steps
            yz_buf[...] = (1.0 - 0.5 * dt_ * vshift) + (0.25 * dt_ * dn * dn) * yz
        else:
            yz_buf[...] = yz

    # one step, in place: ascending slabs; lag carries the ext planes below
    # the current slab that the previous slab already overwrote
    lag[...] = jnp.zeros_like(lag)  # rows [0, ext) = Dirichlet halo, zero
    for s in range(nx // tx):
        rs = ext + s * tx
        c = psi_buf[rs : rs + tx]
        acc = (-float(center_c)) * c
        for off, cf in zip(offsets, coeffs):
            cf = float(cf)
            xm = jnp.concatenate(
                [lag[ext - off : ext], psi_buf[rs : rs + tx - off]], axis=0
            )
            xp = psi_buf[rs + off : rs + tx + off]
            acc += cf * (xm + xp)
            if roll_shifts:
                one = _shift_sum_roll(c, off)
                acc += cf * one(1, c.shape[1])
                acc += cf * one(2, c.shape[2])
            else:
                acc += cf * (pk._shift_y(c, off) + pk._shift_y(c, -off))
                acc += cf * (pk._shift_z(c, off) + pk._shift_z(c, -off))
        if fast_b:
            # x-dependent part: q = 0.25·dt·dn²·dx², one row-scalar per plane
            dx = jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0).astype(
                jnp.float32
            ) + (float(rs) - (ngx + 1.0) / 2.0)
            q = (0.25 * dt_ * dn * dn) * (dx * dx)
            b = 1.0 / (yz_buf[...][None, :, :] + q)
        else:
            b = pk._analytic_b(
                analytic, (tx, ny, nz), jnp.float32(rs), ext, ext, yz=yz_buf[...]
            )
        new = b * (2.0 * c + scale * acc) - c
        lag[...] = psi_buf[rs + tx - ext : rs + tx]  # old top rows, pre-write
        psi_buf[rs : rs + tx] = new

    @pl.when(i == n_steps - 1)
    def _store():
        cp = pltpu.make_async_copy(psi_buf, out_hbm, sem_out)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "scale", "n_steps", "tx", "analytic", "interpret", "fast_b",
        "roll_shifts",
    ),
)
def evolve_chunk_resident(
    phi_xpad, order, scale, n_steps, tx, analytic, interpret=False,
    fast_b=False, roll_shifts=False,
):
    ext = pk._EXT[order]
    nxp, ny, nz = phi_xpad.shape
    nx = nxp - 2 * ext
    kernel = functools.partial(
        _evolve_kernel_resident,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        analytic=analytic,
        nx=nx,
        fast_b=fast_b,
        roll_shifts=roll_shifts,
    )
    need = (nxp + ext + 4 * tx) * ny * nz * 4 + ny * nz * 4
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nxp, ny, nz), phi_xpad.dtype),
            scratch_shapes=[
                pltpu.VMEM((nxp, ny, nz), phi_xpad.dtype),
                pltpu.VMEM((ext, ny, nz), phi_xpad.dtype),
                pltpu.VMEM((ny, nz), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(phi_xpad)


def _setup(n, order="ThreePoint", dn=0.1, dt=3e-3, mass=1.0, seed=0):
    ext = pk._EXT[order]
    rng = np.random.default_rng(seed)
    phi = np.zeros((n + 2 * ext,) * 3, np.float32)
    phi[ext:-ext, ext:-ext, ext:-ext] = rng.normal(size=(n, n, n)).astype(
        np.float32
    )
    analytic = ("Harmonic", dn, dt, mass, n, n, n)
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    return jnp.asarray(phi), analytic, scale, ext


def check(order="ThreePoint"):
    jax.config.update("jax_platforms", "cpu")
    from wafer_tpu.config import Config
    from wafer_tpu.models import potentials as pmod
    from wafer_tpu.ops.stencil import evolve_step

    n, steps = 16, 5
    dn, dt, mass = 0.1, 3e-3, 1.0
    cfg = Config.from_dict(
        {
            "project_name": "probe",
            "grid": {"size": {"x": n, "y": n, "z": n}, "dn": dn, "dt": dt},
            "tolerance": 1e-6,
            "central_difference": order,
            "wavenum": 0,
            "wavemax": 0,
            "output": {
                "screen_update": steps,
                "file_type": "Json",
                "save_wavefns": False,
                "save_potential": False,
            },
            "potential": "Harmonic",
            "mass": mass,
            "init_condition": "Boolean",
            "sig": 1.0,
            "init_symmetry": "NotConstrained",
            "precision": "f32",
        }
    )
    phi, analytic, scale, ext = _setup(n, order, dn, dt, mass)
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, dt)

    ref = phi
    for _ in range(steps):
        ref = evolve_step(ref, a, b, order, dt, dn, mass)

    for tx in (8, 4):
        for fast_b in (False, True):
            got_x = evolve_chunk_resident(
                pk.to_xpad(phi, ext), order, scale, steps, tx, analytic,
                interpret=True, fast_b=fast_b,
            )
            got = pk.from_xpad(got_x, ext)
            err = float(jnp.max(jnp.abs(got - ref)))
            rel = err / float(jnp.max(jnp.abs(ref)))
            print(
                f"{order} tx={tx} fast_b={fast_b}: max abs dev {err:.3e} "
                f"(rel {rel:.3e})"
            )
            assert rel < 5e-6, rel


def bench(n=256, steps=200, reps=3):
    order = "ThreePoint"
    phi, analytic, scale, ext = _setup(n, order)
    dn, dt, mass = 0.1, 3e-3, 1.0

    phi_x = pk.to_xpad(phi, ext)

    def mk_res(tx, fast_b, roll=False):
        def chunk_res(p):
            return evolve_chunk_resident(
                p, order, scale, steps, tx, analytic, fast_b=fast_b,
                roll_shifts=roll,
            )
        return chunk_res

    variants = []
    import os
    roll = os.environ.get("RES_ROLL", "0") == "1"
    for tx in (int(v) for v in os.environ.get("RES_TX", "32").split(",")):
        for fast_b in (True, False) if os.environ.get("RES_FASTB", "1") == "1" else (False,):
            variants.append((f"resident tx={tx} fast_b={fast_b} roll={roll}", mk_res(tx, fast_b, roll), phi_x))

    if os.environ.get("RES_KREF", "0") == "1":
        k_fuse = pk.pick_k_fuse(n, n, n, ext, 4, True)
        phi_k = pk.to_xpad_k(phi, ext, k_fuse)

        def chunk_k(p):
            return pk.evolve_chunk_fused_k(
                p, None, order, dt, dn, mass, steps, k_fuse, analytic=analytic
            )

        variants.append((f"k-fused K={k_fuse}", chunk_k, phi_k))

    for name, fn, p0 in variants:
        def run_chain(p, r):
            t0 = time.perf_counter()
            for _ in range(r):
                p = fn(p)
            np.asarray(p[:1, :1, :8])
            return time.perf_counter() - t0, p

        t0 = time.perf_counter()
        _t, p = run_chain(p0, 1)
        print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
        best = 0.0
        for _ in range(reps):
            t1, p = run_chain(p0, 1)
            t5, p = run_chain(p0, 5)
            per = max((t5 - t1) / 4.0, 1e-9)
            best = max(best, n**3 * steps / per)
        print(f"{name}: {best:.3e} updates/s", flush=True)


def bench_exc(n=256, steps=200, n_lower=1, reps=3):
    """ψ-resident excited path (production kernel) vs the 1-step
    carried-coefficient path at S = n_lower."""
    order = "ThreePoint"
    phi, analytic, scale, ext = _setup(n, order)
    dn, dt, mass = 0.1, 3e-3, 1.0

    rng = np.random.default_rng(1)
    lowers = []
    for _ in range(n_lower):
        w = rng.normal(size=(n + 2 * ext,) * 3).astype(np.float32)
        w /= np.sqrt(np.sum(w.astype(np.float64) ** 2)).astype(np.float32)
        lowers.append(jnp.asarray(w))
    store_x = jnp.stack([pk.to_xpad(w, ext) for w in lowers])
    sls = []
    for w in lowers:
        sl, _n2, _ov = pk.evolve_step_fused(
            pk.to_xpad(w, ext), None, None, order, scale, 0, False,
            analytic=analytic,
        )
        sls.append(sl)
    sstore_x = jnp.stack(sls)

    def chunk_res(p):
        return pk.evolve_chunk_resident(
            p, order, dt, dn, mass, steps, analytic,
            store_xpad=store_x, sstore_xpad=sstore_x,
        )

    def chunk_1s(p):
        return pk.evolve_chunk_fused(
            p, None, store_x, order, dt, dn, mass, steps, n_lower,
            analytic=analytic,
        )

    phi_x = pk.to_xpad(phi, ext)
    for name, fn in (
        (f"resident-exc S={n_lower}", chunk_res),
        (f"1-step carried S={n_lower}", chunk_1s),
    ):
        def run_chain(p, r):
            t0 = time.perf_counter()
            for _ in range(r):
                p = fn(p)
            np.asarray(p[:1, :1, :8])
            return time.perf_counter() - t0, p

        t0 = time.perf_counter()
        _t, p = run_chain(phi_x, 1)
        print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
        best = 0.0
        for _ in range(reps):
            t1, p = run_chain(phi_x, 1)
            t5, p = run_chain(phi_x, 5)
            per = max((t5 - t1) / 4.0, 1e-9)
            best = max(best, n**3 * steps / per)
        print(f"{name}: {best:.3e} updates/s", flush=True)


def bench_streamb(n=256, steps=200, reps=3):
    """Production resident kernel: streamed-B vs analytic-B at n³."""
    order = "ThreePoint"
    phi, analytic, scale, ext = _setup(n, order)
    dn, dt, mass = 0.1, 3e-3, 1.0
    # a synthetic B array (harmonic formula, computed host-side)
    from wafer_tpu.config import Config
    from wafer_tpu.models import potentials as pmod

    cfg = Config.from_dict(
        {
            "project_name": "probe",
            "grid": {"size": {"x": n, "y": n, "z": n}, "dn": dn, "dt": dt},
            "tolerance": 1e-6,
            "central_difference": order,
            "wavenum": 0,
            "wavemax": 0,
            "output": {
                "screen_update": steps,
                "file_type": "Json",
                "save_wavefns": False,
                "save_potential": False,
            },
            "potential": "Harmonic",
            "mass": mass,
            "init_condition": "Boolean",
            "sig": 1.0,
            "init_symmetry": "NotConstrained",
            "precision": "f32",
        }
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    b_int = pk.geometry.work_area(pmod.build_ab(v, dt)[1].astype(jnp.float32), ext)
    phi_x = pk.to_xpad(phi, ext)

    def chunk_stream(p):
        return pk.evolve_chunk_resident(
            p, order, dt, dn, mass, steps, None, b_int=b_int
        )

    def chunk_analytic(p):
        return pk.evolve_chunk_resident(p, order, dt, dn, mass, steps, analytic)

    for name, fn in (("resident streamed-B", chunk_stream),
                     ("resident analytic-B", chunk_analytic)):
        def run_chain(p, r):
            t0 = time.perf_counter()
            for _ in range(r):
                p = fn(p)
            np.asarray(p[:1, :1, :8])
            return time.perf_counter() - t0, p

        t0 = time.perf_counter()
        _t, p = run_chain(phi_x, 1)
        print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
        best = 0.0
        for _ in range(reps):
            t1, p = run_chain(phi_x, 1)
            t5, p = run_chain(phi_x, 5)
            per = max((t5 - t1) / 4.0, 1e-9)
            best = max(best, n**3 * steps / per)
        print(f"{name}: {best:.3e} updates/s", flush=True)


def bench_sc(n=128, steps=200, reps=3):
    """Split-complex resident vs 1-step fused at n³ (ComplexHarmonic)."""
    from wafer_tpu.config import Config
    from wafer_tpu.models import potentials as pmod
    from wafer_tpu.ops import pallas_split as ps

    order, ext = "ThreePoint", 1
    dn, dt, mass, absorb = 0.1, 3e-3, 1.0, 0.2
    cfg = Config.from_dict({
        "project_name": "probe",
        "grid": {"size": {"x": n, "y": n, "z": n}, "dn": dn, "dt": dt},
        "tolerance": 1e-6,
        "central_difference": order,
        "wavenum": 0,
        "wavemax": 0,
        "output": {"screen_update": steps, "file_type": "Json",
                   "save_wavefns": False, "save_potential": False},
        "potential": "ComplexHarmonic",
        "absorb": absorb,
        "mass": mass,
        "init_condition": "Boolean",
        "sig": 1.0,
        "init_symmetry": "NotConstrained",
        "precision": "f32",
    })
    rng = np.random.default_rng(0)
    pr = np.zeros(cfg.padded_size(), np.float32)
    pi_ = np.zeros(cfg.padded_size(), np.float32)
    pr[ext:-ext, ext:-ext, ext:-ext] = rng.normal(size=(n, n, n))
    pi_[ext:-ext, ext:-ext, ext:-ext] = rng.normal(size=(n, n, n))
    psi2 = ps.to_xpad_sc(jnp.asarray(pr), jnp.asarray(pi_), ext)
    analytic = ("Harmonic", dn, dt, mass, n, n, n, cfg.sig, 0.0, absorb)

    def chunk_res(p):
        return ps.evolve_chunk_resident_sc(
            p, order, dt, dn, mass, steps, analytic
        )

    def chunk_1s(p):
        return ps.evolve_chunk_fused_sc(
            p, None, None, order, dt, dn, mass, steps, 0, analytic=analytic
        )

    def mk_chunk_k(kf):
        def chunk_k(p):
            return ps.evolve_chunk_fused_k_sc(
                p, None, order, dt, dn, mass, steps, kf, analytic=analytic
            )
        return chunk_k

    variants = [("sc 1-step", chunk_1s, psi2)]
    if ps.resident_sc_supported(n, n, n, ext, 4):
        variants.insert(0, ("sc resident", chunk_res, psi2))
    pr_j, pi_j = jnp.asarray(pr), jnp.asarray(pi_)
    for kf in (2, 3):
        if ps.k_fuse_sc_supported(n, n, n, ext, 4, kf, True):
            variants.insert(
                0,
                (f"sc K={kf}", mk_chunk_k(kf),
                 ps.to_xpad_k_sc(pr_j, pi_j, ext, kf)),
            )

    for name, fn, psi2 in variants:
        def run_chain(p, r):
            t0 = time.perf_counter()
            for _ in range(r):
                p = fn(p)
            np.asarray(p[:1, :1, :8])
            return time.perf_counter() - t0, p

        t0 = time.perf_counter()
        _t, p = run_chain(psi2, 1)
        print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
        best = 0.0
        for _ in range(reps):
            t1, p = run_chain(psi2, 1)
            t5, p = run_chain(psi2, 5)
            per = max((t5 - t1) / 4.0, 1e-9)
            best = max(best, n**3 * steps / per)
        print(f"{name}: {best:.3e} updates/s", flush=True)


# --------------------------------------------------------------------------- #
# compile-time experiment: slab loop as a grid dimension (vs unrolled)
# --------------------------------------------------------------------------- #


def _evolve_kernel_res_grid(
    phi_hbm, out_hbm, psi_buf, lag, yz_buf, sem_in, sem_out,
    *, order, scale, tx, ext, analytic, nx,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)   # step
    s = pl.program_id(1)   # slab
    n_steps = pl.num_programs(0)
    nslab = pl.num_programs(1)
    ny, nz = psi_buf.shape[1], psi_buf.shape[2]
    kind, dn, dt_, _mass, ngx, ngy, ngz = analytic[:7]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0

    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _load():
        cp = pltpu.make_async_copy(phi_hbm, psi_buf, sem_in)
        cp.start()
        cp.wait()
        yz = pk._analytic_yz(analytic, ny, nz, ext, ext)
        yz_buf[...] = (1.0 - 0.5 * dt_ * vshift) + (0.25 * dt_ * dn * dn) * yz

    @pl.when(s == 0)
    def _lag_seed():
        lag[...] = psi_buf[0:ext]

    rs = s * tx + ext
    c = psi_buf[pl.ds(rs, tx)]
    acc = (-float(center_c)) * c
    for off, cf in zip(offsets, coeffs):
        cf = float(cf)
        xm = jnp.concatenate(
            [lag[ext - off : ext], psi_buf[pl.ds(rs, tx - off)]], axis=0
        )
        xp = psi_buf[pl.ds(rs + off, tx)]
        acc += cf * (xm + xp)
        acc += cf * (pk._shift_y(c, off) + pk._shift_y(c, -off))
        acc += cf * (pk._shift_z(c, off) + pk._shift_z(c, -off))
    dx = jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0).astype(
        jnp.float32
    ) + (rs.astype(jnp.float32) - (ngx + 1.0) / 2.0)
    q = (0.25 * dt_ * dn * dn) * (dx * dx)
    b = 1.0 / (yz_buf[...][None, :, :] + q)
    new = b * (2.0 * c + scale * acc) - c
    lag[...] = psi_buf[pl.ds(rs + tx - ext, ext)]
    psi_buf[pl.ds(rs, tx)] = new

    @pl.when(jnp.logical_and(i == n_steps - 1, s == nslab - 1))
    def _store():
        cp = pltpu.make_async_copy(psi_buf, out_hbm, sem_out)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("order", "scale", "n_steps", "tx", "analytic", "interpret"),
)
def evolve_chunk_resident_grid(
    phi_xpad, order, scale, n_steps, tx, analytic, interpret=False
):
    ext = pk._EXT[order]
    nxp, ny, nz = phi_xpad.shape
    nx = nxp - 2 * ext
    assert nx % tx == 0
    kernel = functools.partial(
        _evolve_kernel_res_grid,
        order=order, scale=scale, tx=tx, ext=ext, analytic=analytic, nx=nx,
    )
    need = (nxp + ext + 4 * tx) * ny * nz * 4 + ny * nz * 4
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(n_steps, nx // tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nxp, ny, nz), phi_xpad.dtype),
            scratch_shapes=[
                pltpu.VMEM((nxp, ny, nz), phi_xpad.dtype),
                pltpu.VMEM((ext, ny, nz), phi_xpad.dtype),
                pltpu.VMEM((ny, nz), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(phi_xpad)


def bench_grid(n=256, steps=200, reps=3):
    """Compile-time + runtime: grid-per-slab vs unrolled resident kernel.

    Measured (256³, v5e, same session): grid-slab compiles 463 s and runs
    1.231e11 vs the unrolled kernel's 47 s / 1.260e11 — dynamic pl.ds
    leading-axis slab indexing costs Mosaic ~10× the compile effort of
    unrolled static slices and loses 2% runtime. The shipped kernel stays
    unrolled."""
    order = "ThreePoint"
    phi, analytic, scale, ext = _setup(n, order)
    tx = 64 if n % 64 == 0 else 32
    phi_x = pk.to_xpad(phi, ext)

    for name, fn in (
        ("grid-slab", lambda p: evolve_chunk_resident_grid(
            p, order, scale, steps, tx, analytic)),
        ("unrolled ", lambda p: evolve_chunk_resident(
            p, order, scale, steps, tx, analytic, fast_b=True)),
    ):
        def run_chain(p, r):
            t0 = time.perf_counter()
            for _ in range(r):
                p = fn(p)
            np.asarray(p[:1, :1, :8])
            return time.perf_counter() - t0, p

        t0 = time.perf_counter()
        _t, p = run_chain(phi_x, 1)
        print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
        best = 0.0
        for _ in range(reps):
            t1, p = run_chain(phi_x, 1)
            t5, p = run_chain(phi_x, 5)
            per = max((t5 - t1) / 4.0, 1e-9)
            best = max(best, n**3 * steps / per)
        print(f"{name}: {best:.3e} updates/s", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check("ThreePoint")
        check("SevenPoint")
    elif mode == "grid":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        bench_grid(n)
    elif mode == "sc":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        bench_sc(n)
    elif mode == "streamb":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        bench_streamb(n)
    elif mode == "exc":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        s = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        bench_exc(n, n_lower=s)
    else:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        bench(n)