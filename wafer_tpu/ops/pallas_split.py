"""Fused split-complex Pallas sweep.

Complex-ψ propagation carried as (re, im) f32 pairs — the fast path for
backends without complex dtypes (and for f32 complex runs generally). The
reference cannot run complex propagation at all (its complex potentials are
real stubs, src/potential.rs:222,271); the XLA split path
(ops/split_complex.py) is the semantics oracle this kernel is tested
against.

Layout mirrors ops/pallas_stencil.py's real kernel with re/im stacked along
the leading (x) axis: ψ is (2·(NX+2e), NY, NZ) with re rows first, B is
(2·NX, NY, NZ) as (Br, Bi), stored states are (S·2·(NX+2e), NY, NZ). The
A-array elimination survives complex algebra: A = (1−z)/(1+z) = 2B−1 with
z = dt·V/2, so

  ψ' = (2B−1)ψ + B·s·∇²̃ψ, expanded over real pairs:
  re' = 2(Br·re − Bi·im) − re + s(Br·Tr − Bi·Ti)
  im' = 2(Br·im + Bi·re) − im + s(Br·Ti + Bi·Tr)

with Tr/Ti the stencil taps of re/im. Per-step reductions are the complex
norm Σ(re'² + im'²) and complex overlaps ⟨l|ψ'⟩ = Σ(lr·re' + li·im') +
i·Σ(lr·im' − li·re'), fed back as a carried affine correction
[inv, cr₀, ci₀, …]: ψ̃ = inv·ψ − Σ (cr+i·ci)·lowerₛ (normalise-then-project,
src/grid.rs:674-681).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wafer_tpu import geometry
from wafer_tpu.ops.pallas_stencil import (
    _EXT,
    _analytic_v,
    _analytic_yz,
    _lag_xm,
    _shift_y,
    _shift_z,
    to_xpad,
)


def _analytic_b_sc(analytic, shp, x0, y0, z0):
    """Complex B = 1/(1 + dt·V/2) with V = vr + i·absorb·vr from
    coordinates, returned as (Br, Bi). ``analytic`` extends the real tuple
    with [8] = vshift (real-part gauge) and [9] = absorb (imaginary scale,
    models/potentials.generate_split)."""
    dt_ = analytic[2]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    absorb = float(analytic[9]) if len(analytic) > 9 else 0.0
    v_raw = _analytic_v(analytic, shp, x0, y0, z0)
    dr = 1.0 + (0.5 * dt_) * (v_raw - vshift)
    di = (0.5 * dt_) * (absorb * v_raw)
    mag = dr * dr + di * di
    return dr / mag, -di / mag


def _sc_series_terms(analytic) -> Optional[int]:
    """Static choice of the divide-free complex Horner-B series length for
    the Harmonic split resident kernels, or None → per-slab exact B.

    The complex denominator factors D = P_yz + q_x·(1+i·a) with
    P_yz = 1 − dt/2·vshift + c₄(1+i·a)(dy²+dz²), c₄ = dt·dn²/4,
    q_x = c₄·dx², a = absorb — so 1/D = R·1/(1+G) with the reciprocal
    plane R = 1/P_yz hoisted once per chunk (one complex plane divide)
    and G = q·(1+i·a)·R. The alternating series Σ(−G)ᵏ truncated at n
    terms carries relative error ≤ |G|_maxⁿ⁺¹; |G| ≤ c₄·√(1+a²)·dx_max²
    / |P|_min with |P| ≥ Re P ≥ 1 − dt/2·vshift (the c₄·yz real term is
    ≥ 0). Same per-slab-divide-elimination win as the real kernel's
    _harmonic_series_terms (vpu_probe r4: +46%) — doubled here, since the
    exact path pays TWO divides plus a per-slab yz-plane rebuild."""
    kind, dn, dt_ = analytic[0], analytic[1], analytic[2]
    if kind != "Harmonic":
        return None
    ngx = analytic[4]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    absorb = float(analytic[9]) if len(analytic) > 9 else 0.0
    p_min = 1.0 - 0.5 * dt_ * vshift
    if p_min <= 1e-3:
        return None
    dx_max = 0.5 * ngx + 8.0
    g_max = (
        (0.25 * dt_ * dn * dn) * dx_max * dx_max
        * (1.0 + absorb * absorb) ** 0.5 / p_min
    )
    if g_max >= 0.25:
        return None
    eps_half = 5.96e-8  # 0.5 · f32 eps
    n = 1
    err = g_max * g_max  # truncation after n terms: |G|^(n+1)
    while err > eps_half:
        n += 1
        err *= g_max
        if n > 6:
            return None
    return n


def _sc_hoist_rt(analytic, ny, nz, y0, z0):
    """(4, ny, nz) chunk-hoisted planes [Rr, Ri, Tr, Ti] for the Horner-B
    path: R = 1/P_yz (complex reciprocal of the yz plane, see
    _sc_series_terms) and T = (1+i·a)·R, so the per-slab complex
    G = q_x·T costs two real multiplies."""
    dn, dt_ = analytic[1], analytic[2]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    absorb = float(analytic[9]) if len(analytic) > 9 else 0.0
    yz = _analytic_yz(analytic, ny, nz, y0, z0)
    c4 = 0.25 * dt_ * dn * dn
    p_r = (1.0 - 0.5 * dt_ * vshift) + c4 * yz
    p_i = (c4 * absorb) * yz
    mag = p_r * p_r + p_i * p_i
    rr = p_r / mag
    ri = -p_i / mag
    return jnp.stack([rr, ri, rr - absorb * ri, ri + absorb * rr])


def _sc_b_slab(analytic, rt, x0f, txs, n_terms):
    """Divide-free complex (Br, Bi) for one slab from the hoisted planes:
    B = R·S with S the n-term complex Horner evaluation of 1/(1+G),
    G = c₄·dx²·T. Truncation ≤ |G|ⁿ⁺¹ < f32 eps/2 by the static
    series-length choice (_sc_series_terms)."""
    dn, dt_, ngx = analytic[1], analytic[2], analytic[4]
    dx = jax.lax.broadcasted_iota(jnp.int32, (txs, 1, 1), 0).astype(
        jnp.float32
    ) + (x0f - (ngx + 1.0) / 2.0)
    q = jnp.float32(0.25 * dt_ * dn * dn) * (dx * dx)
    rr = rt[0][None, :, :]
    ri = rt[1][None, :, :]
    gr = q * rt[2][None, :, :]
    gi = q * rt[3][None, :, :]
    sr = 1.0 - gr
    si = -gi
    for _ in range(n_terms - 1):
        sr, si = 1.0 - (gr * sr - gi * si), -(gr * si + gi * sr)
    return rr * sr - ri * si, rr * si + ri * sr


# Tighter than the real kernel's 11 MB: Mosaic's scoped-vmem accounting for
# this kernel runs ~35% above the raw scratch sum (measured on v5e: a 12.7 MB
# naive sum compiled to a 17.1 MB scoped allocation), so size against 8 MB.
# See pallas_stencil._VMEM_BUDGET: Mosaic's default scoped limit (16 MiB)
# is raised via compiler_params; 40 MiB raw keeps the measured ~1.35×
# scoped-accounting overhead of this kernel family well under the 128 MiB
# v5e VMEM.
_SC_VMEM_BUDGET = 40 * 1024 * 1024


def _pick_tx_sc(nx: int, ny: int, nz: int, ext: int, itemsize: int, n_lower: int,
                analytic_b: bool = False):
    """Largest slab height fitting VMEM for the split kernel (everything is
    doubled vs the real kernel), or None → caller falls back to XLA."""
    plane = ny * nz * itemsize
    for tx in (32, 16, 8, 4, 2, 1):
        if nx % tx:
            continue
        need = (
            2 * 2 * (tx + 2 * ext) * plane  # double-buffered re+im windows
            + 2 * 2 * tx * plane            # double-buffered re+im results
            + (0 if analytic_b else 2 * tx * plane)  # Br+Bi chunk
            + n_lower * 2 * (tx + 2 * ext) * plane
        )
        if need <= _SC_VMEM_BUDGET:
            return tx
    return None


def step_fused_sc_supported(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                            n_lower: int) -> bool:
    return _pick_tx_sc(nx, ny, nz, ext, itemsize, n_lower) is not None


def _evolve_kernel_sc(
    # inputs
    psi_hbm,  # (2·NXP, NY, NZ) ANY — re rows [0, NXP), im rows [NXP, 2·NXP)
    b_hbm,  # (2·NX, NY, NZ) ANY — (Br, Bi) stacked
    store_hbm,  # (S·2·NXP, NY, NZ) ANY
    coef_smem,  # (1+2S, 1) SMEM: [inv, cr_0, ci_0, ...]
    xorg_smem,  # (1, 1) SMEM i32 — shard's global interior x origin
    # outputs
    out_hbm,  # (2·NXP, NY, NZ) ANY
    norm_out,  # (1, 1) SMEM
    over_out,  # (2S, 1) SMEM — [re_0, im_0, re_1, ...]
    # scratch
    slab,  # (2, 2·(TX+2e), NY, NZ) VMEM — re window rows first
    b_slab,  # (2·TX, NY, NZ) VMEM
    result,  # (2, 2·TX, NY, NZ) VMEM
    lower_slab,  # (S·2·(TX+2e), NY, NZ) VMEM
    zeros_halo,  # (ext, NY, NZ) VMEM
    sem_in,  # DMA (2,)
    sem_b,
    sem_lower,  # DMA (S,)
    sem_out,  # DMA (2,)
    sem_halo,
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    n_lower: int,
    with_norm: bool,
    analytic=None,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    next_slot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
    win = tx + 2 * ext
    nxp = psi_hbm.shape[0] // 2
    nx = nxp - 2 * ext

    def in_copies(window, to_slot):
        return [
            pltpu.make_async_copy(
                psi_hbm.at[pl.ds(window * tx, win)],
                slab.at[to_slot, pl.ds(0, win)],
                sem_in.at[to_slot],
            ),
            pltpu.make_async_copy(
                psi_hbm.at[pl.ds(jnp.int32(nxp) + window * tx, win)],
                slab.at[to_slot, pl.ds(win, win)],
                sem_in.at[to_slot],
            ),
        ]

    @pl.when(i == 0)
    def _first_window():
        for c_ in in_copies(jnp.int32(0), jnp.int32(0)):
            c_.start()

    @pl.when(i + 1 < nprog)
    def _prefetch():
        for c_ in in_copies(i + 1, next_slot):
            c_.start()

    if analytic is None:
        b_copies = [
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(i * tx, tx)], b_slab.at[pl.ds(0, tx)], sem_b
            ),
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(jnp.int32(nx) + i * tx, tx)],
                b_slab.at[pl.ds(tx, tx)],
                sem_b,
            ),
        ]
        for bc in b_copies:
            bc.start()

    lower_copies = []
    for s_idx in range(2 * n_lower):  # re/im blocks of each stored state
        lc = pltpu.make_async_copy(
            store_hbm.at[pl.ds(jnp.int32(s_idx * nxp) + i * tx, win)],
            lower_slab.at[pl.ds(jnp.int32(s_idx * win), win)],
            sem_lower.at[jnp.int32(s_idx // 2)],
        )
        lc.start()
        lower_copies.append(lc)

    # Dirichlet halo rows of the output: re lo/hi and im lo/hi
    @pl.when(i == 0)
    def _zero_lo():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        for row0 in (0, nxp):
            hc = pltpu.make_async_copy(
                zeros_halo, out_hbm.at[pl.ds(row0, ext)], sem_halo
            )
            hc.start()
            hc.wait()

    @pl.when(i == nprog - 1)
    def _zero_hi():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        for row0 in (nxp - ext, 2 * nxp - ext):
            hc = pltpu.make_async_copy(
                zeros_halo, out_hbm.at[pl.ds(row0, ext)], sem_halo
            )
            hc.start()
            hc.wait()

    def out_copies(x_idx, from_slot):
        return [
            pltpu.make_async_copy(
                result.at[from_slot, pl.ds(0, tx)],
                out_hbm.at[pl.ds(x_idx * tx + ext, tx)],
                sem_out.at[from_slot],
            ),
            pltpu.make_async_copy(
                result.at[from_slot, pl.ds(tx, tx)],
                out_hbm.at[pl.ds(jnp.int32(nxp) + x_idx * tx + ext, tx)],
                sem_out.at[from_slot],
            ),
        ]

    @pl.when(i >= 2)
    def _drain_prev_out():
        for oc in out_copies(i - 2, slot):
            oc.wait()

    for c_ in in_copies(i, slot):
        c_.wait()

    if n_lower > 0 or with_norm:
        for lc in lower_copies:
            lc.wait()
        inv = coef_smem[0, 0]
        win_r = slab[slot, 0:win] * inv
        win_i = slab[slot, win : 2 * win] * inv
        for s_idx in range(n_lower):
            cr = coef_smem[1 + 2 * s_idx, 0]
            ci = coef_smem[2 + 2 * s_idx, 0]
            lr = lower_slab[(2 * s_idx) * win : (2 * s_idx + 1) * win]
            li = lower_slab[(2 * s_idx + 1) * win : (2 * s_idx + 2) * win]
            win_r = win_r - (cr * lr - ci * li)
            win_i = win_i - (cr * li + ci * lr)

        def read_r(r0, rows):
            return win_r[r0 : r0 + rows]

        def read_i(r0, rows):
            return win_i[r0 : r0 + rows]
    else:
        def read_r(r0, rows):
            return slab[slot, r0 : r0 + rows]

        def read_i(r0, rows):
            return slab[slot, win + r0 : win + r0 + rows]

    cr_ = read_r(ext, tx)
    ci_ = read_i(ext, tx)
    acc_r = -center_c * cr_
    acc_i = -center_c * ci_
    for off, cf in zip(offsets, coeffs):
        acc_r = acc_r + cf * (read_r(ext + off, tx) + read_r(ext - off, tx))
        acc_r = acc_r + cf * (_shift_y(cr_, off) + _shift_y(cr_, -off))
        acc_r = acc_r + cf * (_shift_z(cr_, off) + _shift_z(cr_, -off))
        acc_i = acc_i + cf * (read_i(ext + off, tx) + read_i(ext - off, tx))
        acc_i = acc_i + cf * (_shift_y(ci_, off) + _shift_y(ci_, -off))
        acc_i = acc_i + cf * (_shift_z(ci_, off) + _shift_z(ci_, -off))

    if analytic is None:
        for bc in b_copies:
            bc.wait()
        br = b_slab[0:tx]
        bi = b_slab[tx : 2 * tx]
    else:
        x0 = (i * tx + jnp.int32(ext) + xorg_smem[0, 0]).astype(jnp.float32)
        br, bi = _analytic_b_sc(
            analytic, (tx, psi_hbm.shape[1], psi_hbm.shape[2]), x0, ext, ext
        )
    # factored: br/bi each multiply (2c + s·acc) once — four fewer vector
    # multiplies than expanding 2(b·c) and b·s·acc separately
    ur = 2.0 * cr_ + scale * acc_r
    ui = 2.0 * ci_ + scale * acc_i
    new_r = br * ur - bi * ui - cr_
    new_i = br * ui + bi * ur - ci_
    result[slot, 0:tx] = new_r
    result[slot, tx : 2 * tx] = new_i

    for oc in out_copies(i, slot):
        oc.start()

    if with_norm or n_lower > 0:
        @pl.when(i == 0)
        def _init():
            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)
            for s in range(2 * n_lower):
                over_out[s, 0] = jnp.zeros((), over_out.dtype)

        norm_out[0, 0] += jnp.sum(new_r * new_r) + jnp.sum(new_i * new_i)
    for s_idx in range(n_lower):
        lr = lower_slab[
            (2 * s_idx) * win + ext : (2 * s_idx) * win + ext + tx
        ]
        li = lower_slab[
            (2 * s_idx + 1) * win + ext : (2 * s_idx + 1) * win + ext + tx
        ]
        over_out[2 * s_idx, 0] += jnp.sum(lr * new_r) + jnp.sum(li * new_i)
        over_out[2 * s_idx + 1, 0] += jnp.sum(lr * new_i) - jnp.sum(li * new_r)

    @pl.when(i == nprog - 1)
    def _drain_tail():
        for oc in out_copies(i, slot):
            oc.wait()

    if nprog > 1:

        @pl.when(i == nprog - 1)
        def _drain_other():
            for oc in out_copies(i - 1, next_slot):
                oc.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "scale", "n_lower", "with_norm", "interpret", "analytic"
    ),
)
def evolve_step_fused_sc(
    psi2: jnp.ndarray,
    b2: Optional[jnp.ndarray],
    store2: Optional[jnp.ndarray],
    order: str,
    scale: float,
    n_lower: int = 0,
    with_norm: bool = True,
    interpret: bool = False,
    coef: Optional[jnp.ndarray] = None,
    analytic=None,
    x_origin=None,
):
    """One fused split-complex sweep.

    Args:
      psi2: (2·NXP, NY, NZ) stacked x-padded (re, im), halo rows zero
        (single device) or neighbour data (sharded callers).
      b2: (2·NX, NY, NZ) stacked interior (Br, Bi).
      store2: (S, 2·NXP, NY, NZ) stacked stored states, or None.
      coef: (1+2S, 1) [inv, cr_0, ci_0, ...] affine correction.
      x_origin: (1, 1) i32 global interior x offset (sharded analytic-B
        callers; defaults to 0).

    Returns:
      (ψ'2, norm2, overlaps[2S]) — reductions on the raw output.
    """
    ext = _EXT[order]
    nxp = psi2.shape[0] // 2
    ny, nz = psi2.shape[1], psi2.shape[2]
    nx = nxp - 2 * ext
    dtype = psi2.dtype
    if b2 is None:
        assert analytic is not None
        b2 = jnp.zeros((2, 1, 1), dtype=dtype)
    tx = _pick_tx_sc(nx, ny, nz, ext, dtype.itemsize, n_lower, analytic is not None)
    if tx is None:
        raise ValueError(
            f"fused split sweep does not fit VMEM for plane {ny}x{nz}; "
            "use the XLA split path"
        )
    if store2 is None or n_lower == 0:
        store2 = jnp.zeros((1, 2 * nxp, ny, nz), dtype=dtype)
    n_store = store2.shape[0]
    store_flat = store2.reshape(n_store * 2 * nxp, ny, nz)
    if coef is None:
        coef = jnp.concatenate(
            [jnp.ones((1, 1), dtype), jnp.zeros((2 * n_store, 1), dtype)]
        )
    if x_origin is None:
        x_origin = jnp.zeros((1, 1), jnp.int32)
    else:
        x_origin = jnp.asarray(x_origin, jnp.int32).reshape(1, 1)

    kernel = functools.partial(
        _evolve_kernel_sc,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        n_lower=n_lower,
        with_norm=with_norm,
        analytic=analytic,
    )
    win = tx + 2 * ext
    with jax.enable_x64(False):
        out2, norm2, overlaps = pl.pallas_call(
            kernel,
            grid=(nx // tx,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2 * nxp, ny, nz), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
                jax.ShapeDtypeStruct((2 * n_store, 1), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 2 * win, ny, nz), dtype),
                pltpu.VMEM(
                    (1, 1, 128) if analytic is not None else (2 * tx, ny, nz),
                    dtype,
                ),
                pltpu.VMEM((2, 2 * tx, ny, nz), dtype),
                # minimal when unused: the dummy store must not eat VMEM
                pltpu.VMEM(
                    (n_store * 2 * win, ny, nz) if n_lower > 0 else (1, 1, 128),
                    dtype,
                ),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((max(n_store, 1),)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(psi2, b2, store_flat, coef, x_origin)
    return out2, norm2[0, 0], overlaps[: 2 * (n_lower or 1), 0]


def to_xpad_sc(pr: jnp.ndarray, pi: jnp.ndarray, ext: int) -> jnp.ndarray:
    """Stack fully-padded (re, im) into the kernel's (2·NXP, NY, NZ) layout."""
    return jnp.concatenate([to_xpad(pr, ext), to_xpad(pi, ext)], axis=0)


def from_xpad_sc(psi2: jnp.ndarray, ext: int):
    """Back to fully-padded (re, im) arrays."""
    from wafer_tpu.ops.pallas_stencil import from_xpad

    nxp = psi2.shape[0] // 2
    return from_xpad(psi2[:nxp], ext), from_xpad(psi2[nxp:], ext)


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "dt", "dn", "mass", "n_steps", "n_lower", "interpret",
        "per_step_norm", "analytic",
    ),
)
def evolve_chunk_fused_sc(
    psi2: jnp.ndarray,
    b2: Optional[jnp.ndarray],
    store2: Optional[jnp.ndarray],
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    n_lower: int,
    interpret: bool = False,
    per_step_norm: bool = False,
    analytic=None,
):
    """``n_steps`` fused split-complex sweeps with the same carried-coef
    cadence as ops/pallas_stencil.evolve_chunk_fused (oracle:
    ops/split_complex.evolve_chunk_sc)."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    dtype = psi2.dtype

    if n_lower == 0 and not per_step_norm:
        def body(_i, p):
            p, _n2, _ov = evolve_step_fused_sc(
                p, b2, None, order, scale, 0, False, interpret,
                analytic=analytic,
            )
            return p

        return jax.lax.fori_loop(0, n_steps, body, psi2)

    if n_lower == 0:
        def body_norm(_i, carry):
            p, coef = carry
            p, norm2, _ov = evolve_step_fused_sc(
                p, b2, None, order, scale, 0, True, interpret, coef,
                analytic,
            )
            inv = (1.0 / jnp.sqrt(norm2)).astype(dtype)
            return p, inv.reshape(1, 1)

        coef0 = jnp.ones((1, 1), dtype)
        p, coef = jax.lax.fori_loop(0, n_steps, body_norm, (psi2, coef0))
        return p * coef[0, 0]

    coef0 = jnp.concatenate(
        [jnp.ones((1, 1), dtype), jnp.zeros((2 * n_lower, 1), dtype)]
    )

    def body(_i, carry):
        p, coef = carry
        p, norm2, overlaps = evolve_step_fused_sc(
            p, b2, store2, order, scale, n_lower, True, interpret, coef,
            analytic,
        )
        inv = (1.0 / jnp.sqrt(norm2)).astype(dtype)
        coef = jnp.concatenate(
            [inv.reshape(1, 1), (overlaps * inv).reshape(2 * n_lower, 1)]
        )
        return p, coef

    p, coef = jax.lax.fori_loop(0, n_steps, body, (psi2, coef0))
    # materialise the pending correction: ψ·inv − Σ (cr+i·ci)·lowerₛ
    nxp = psi2.shape[0] // 2
    out_r = p[:nxp] * coef[0, 0]
    out_i = p[nxp:] * coef[0, 0]
    for s in range(n_lower):
        cr = coef[1 + 2 * s, 0]
        ci = coef[2 + 2 * s, 0]
        lr = store2[s, :nxp]
        li = store2[s, nxp:]
        out_r = out_r - (cr * lr - ci * li)
        out_i = out_i - (cr * li + ci * lr)
    return jnp.concatenate([out_r, out_i], axis=0)


# --------------------------------------------------------------------------- #
# VMEM-resident split-complex chunk kernel (ground state)
# --------------------------------------------------------------------------- #
#
# The split-complex counterpart of ops/pallas_stencil's resident kernel: the
# whole stacked (re, im) ψ — (2·(NX+2e), NY, NZ), 2·psi bytes — stays in
# VMEM for a full screen_update chunk, updated in place per slab with two
# lag buffers (one per component; the complex update mixes Tr/Ti so both
# components advance together within a slab). Complex B comes from
# coordinates per slab (ComplexHarmonic/ComplexCoulomb) or streams as
# double-buffered (Br, Bi) windows. Fits grids up to ~200³ f32
# (2·field ≤ the resident budget); 256³ complex stays on the 1-step
# streamed kernel. Ground state only (per-step reductions for excited
# states remain on the carried-coefficient path).

from wafer_tpu.ops import pallas_stencil as _pk


def resident_sc_supported(nx: int, ny: int, nz: int, ext: int,
                          itemsize: int) -> bool:
    if itemsize != 4:
        return False
    if _pk._pick_tx_res(nx, ext) is None:
        return False
    return 2 * (nx + 2 * ext) * ny * nz * itemsize <= _pk._RES_BUDGET


def _evolve_kernel_res_sc(
    psi_hbm,   # (2·NXE, NY, NZ) ANY — re rows [0, NXE), im rows [NXE, 2·NXE)
    b_hbm,     # (2·NX, NY, NZ) ANY — (Br, Bi) stacked (stub when analytic)
    xorg_smem,  # (1, 1) SMEM i32 — shard's global interior x origin
    edge_smem,  # (2, 1) SMEM i32 — [at_global_lo, at_global_hi]
    out_hbm,   # (2·NXE, NY, NZ) ANY
    red_out,   # (1, 1) SMEM — final step's ‖ψ‖² (with_norm)
    psi_buf,   # (2·NXE, NY, NZ) VMEM — resident across all grid programs
    lag_r,     # (ext, NY, NZ) VMEM
    lag_i,     # (ext, NY, NZ) VMEM
    racc,      # (2, 1) SMEM f32 — per-step norm² ping-pong (with_norm)
    bbuf,      # (4·tx, NY, NZ) VMEM — double-buffered (Br, Bi) slab windows
    sem_in,
    sem_out,
    sem_b,     # DMA (4,)
    land,      # (8·halo, NY, NZ) VMEM — ICI landing strips: 2 parity slots
    # × (re lo, re hi, im lo, im hi); (1,1,1) dummy when ici_r == 0
    sem_snd,   # DMA (4,) — ICI sends (re→right, re→left, im→right, im→left)
    sem_rcv,   # DMA (8,) — ICI recvs, indexed parity·4 + strip
    # (strip: re lo, re hi, im lo, im hi)
    yzrt,      # (4, NY, NZ) VMEM — hoisted Horner-B planes ((1,1,1) stub
    # when the series is gated off)
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    analytic,
    nx: int,
    with_norm: bool = False,
    halo: int = 0,
    ici_r: int = 0,
    ici_axis=None,
    ici_nsh: int = 1,
):
    # Sharded deep-halo mode (halo = R·ext > ext): the pair carries a deep
    # ghost zone exchanged once per R = n_steps in-kernel steps; the sweep
    # runs blind over every non-edge row (the real kernel's deep-ghost-zone
    # schedule, _evolve_kernel_res) and global-edge shards re-zero their
    # halo side of BOTH components after every step.
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    ny, nz = psi_buf.shape[1], psi_buf.shape[2]
    nxe = nx + 2 * ext
    halo = halo or ext
    # padded x coordinate of psi_buf row 0 (row ``halo`` is local interior
    # row 0, i.e. padded coordinate ext + xorg)
    x_row0 = xorg_smem[0, 0].astype(jnp.float32) + jnp.float32(ext - halo)

    n_horner = None if analytic is None else _sc_series_terms(analytic)

    @pl.when(i == 0)
    def _load():
        cp = pltpu.make_async_copy(psi_hbm, psi_buf, sem_in)
        cp.start()
        cp.wait()
        if n_horner is not None:
            yzrt[...] = _sc_hoist_rt(analytic, ny, nz, ext, ext)

    if ici_r > 0:
        # In-kernel ICI halo exchange for the pair (sharded split ground):
        # at every window boundary the still-exact interior edge strips of
        # BOTH components ride remote DMAs into parity-slotted landing
        # strips on the ring neighbours — the same two-parity slot chain as
        # the real kernel (ops/pallas_stencil._evolve_kernel_res ici mode);
        # the pair never leaves VMEM between the chunk's load and store.
        nxe_k = nxe

        @pl.when(
            jnp.logical_and(i > 0, jax.lax.rem(i, jnp.int32(ici_r)) == 0)
        )
        def _ici_exchange():
            w = i // jnp.int32(ici_r)
            slot = jax.lax.rem(w, jnp.int32(2))
            my = jax.lax.axis_index(ici_axis)
            right = jax.lax.rem(my + 1, jnp.int32(ici_nsh))
            left = jax.lax.rem(
                my + jnp.int32(ici_nsh - 1), jnp.int32(ici_nsh)
            )
            base = slot * jnp.int32(4 * halo)
            sbase = slot * jnp.int32(4)
            # (src rows, landing offset within slot, target, sem idx):
            # hi edges feed the right neighbour's LO landings, lo edges
            # the left neighbour's HI landings. Recv semaphores are
            # indexed (parity, strip) — the same stale-signal argument as
            # the real kernel's exchange (pallas_stencil._evolve_kernel_res
            # ici mode): a shared counting wait could be satisfied by the
            # neighbour's next window's signal while this window's strip
            # is in flight.
            dmas = [
                pltpu.make_async_remote_copy(
                    psi_buf.at[pl.ds(nxe_k - 2 * halo, halo)],
                    land.at[pl.ds(base, halo)],
                    sem_snd.at[0], sem_rcv.at[sbase],
                    device_id={ici_axis: right},
                ),
                pltpu.make_async_remote_copy(
                    psi_buf.at[pl.ds(halo, halo)],
                    land.at[pl.ds(base + jnp.int32(halo), halo)],
                    sem_snd.at[1], sem_rcv.at[sbase + jnp.int32(1)],
                    device_id={ici_axis: left},
                ),
                pltpu.make_async_remote_copy(
                    psi_buf.at[pl.ds(2 * nxe_k - 2 * halo, halo)],
                    land.at[pl.ds(base + jnp.int32(2 * halo), halo)],
                    sem_snd.at[2], sem_rcv.at[sbase + jnp.int32(2)],
                    device_id={ici_axis: right},
                ),
                pltpu.make_async_remote_copy(
                    psi_buf.at[pl.ds(nxe_k + halo, halo)],
                    land.at[pl.ds(base + jnp.int32(3 * halo), halo)],
                    sem_snd.at[3], sem_rcv.at[sbase + jnp.int32(3)],
                    device_id={ici_axis: left},
                ),
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait_send()
            for d in dmas:
                d.wait_recv()

            @pl.when(slot == 0)
            def _land0():
                psi_buf[0:halo] = land[0:halo]
                psi_buf[nxe_k - halo : nxe_k] = land[halo : 2 * halo]
                psi_buf[nxe_k : nxe_k + halo] = land[2 * halo : 3 * halo]
                psi_buf[2 * nxe_k - halo : 2 * nxe_k] = land[
                    3 * halo : 4 * halo
                ]

            @pl.when(slot == 1)
            def _land1():
                psi_buf[0:halo] = land[4 * halo : 5 * halo]
                psi_buf[nxe_k - halo : nxe_k] = land[5 * halo : 6 * halo]
                psi_buf[nxe_k : nxe_k + halo] = land[6 * halo : 7 * halo]
                psi_buf[2 * nxe_k - halo : 2 * nxe_k] = land[
                    7 * halo : 8 * halo
                ]

            @pl.when(edge_smem[0, 0] == 1)
            def _mask_lo_x():
                z = jnp.zeros((halo, ny, nz), psi_buf.dtype)
                psi_buf[0:halo] = z
                psi_buf[nxe_k : nxe_k + halo] = z

            @pl.when(edge_smem[1, 0] == 1)
            def _mask_hi_x():
                z = jnp.zeros((halo, ny, nz), psi_buf.dtype)
                psi_buf[nxe_k - halo : nxe_k] = z
                psi_buf[2 * nxe_k - halo : 2 * nxe_k] = z

    if with_norm:
        slot = jax.lax.rem(i, jnp.int32(2))
        prev = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
        inv = jnp.where(
            i == 0,
            jnp.float32(1.0),
            jax.lax.rsqrt(jnp.maximum(racc[prev, 0], jnp.float32(1e-37))),
        )
        racc[slot, 0] = jnp.float32(0.0)

    slabs = [(ext + s * tx, tx) for s in range(nx // tx)]
    if nx % tx:
        slabs.append((ext + (nx // tx) * tx, nx % tx))
    nslabs = len(slabs)

    if analytic is None:
        def b_dma(s_idx, bslot):
            rs_s, tx_s = slabs[s_idx]
            return [
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(rs_s - ext, tx_s)],
                    bbuf.at[pl.ds((bslot * 2) * tx, tx_s)],
                    sem_b.at[bslot * 2],
                ),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(nx + rs_s - ext, tx_s)],
                    bbuf.at[pl.ds((bslot * 2 + 1) * tx, tx_s)],
                    sem_b.at[bslot * 2 + 1],
                ),
            ]

        for c_ in b_dma(0, 0):
            c_.start()

    # one sweep, ascending slabs, both components in place
    lag_r[...] = psi_buf[0:ext]
    lag_i[...] = psi_buf[nxe : nxe + ext]
    for s, (rs, txs) in enumerate(slabs):
        bslot = s % 2
        if analytic is None:
            if s + 1 < nslabs:
                for c_ in b_dma(s + 1, (s + 1) % 2):
                    c_.start()
            for c_ in b_dma(s, bslot):
                c_.wait()
        cr = psi_buf[rs : rs + txs]
        ci = psi_buf[nxe + rs : nxe + rs + txs]
        acc_r = (-float(center_c)) * cr
        acc_i = (-float(center_c)) * ci
        for off, cf in zip(offsets, coeffs):
            cf = float(cf)
            xm_r = _lag_xm(lag_r, psi_buf, rs, txs, off, ext)
            xp_r = psi_buf[rs + off : rs + txs + off]
            acc_r += cf * (xm_r + xp_r)
            acc_r += cf * (_shift_y(cr, off) + _shift_y(cr, -off))
            acc_r += cf * (_shift_z(cr, off) + _shift_z(cr, -off))
            xm_i = _lag_xm(lag_i, psi_buf, nxe + rs, txs, off, ext)
            xp_i = psi_buf[nxe + rs + off : nxe + rs + txs + off]
            acc_i += cf * (xm_i + xp_i)
            acc_i += cf * (_shift_y(ci, off) + _shift_y(ci, -off))
            acc_i += cf * (_shift_z(ci, off) + _shift_z(ci, -off))
        if analytic is None:
            br = bbuf[(bslot * 2) * tx : (bslot * 2) * tx + txs]
            bi = bbuf[(bslot * 2 + 1) * tx : (bslot * 2 + 1) * tx + txs]
        elif n_horner is not None:
            br, bi = _sc_b_slab(
                analytic, yzrt[...], x_row0 + jnp.float32(rs), txs, n_horner
            )
        else:
            br, bi = _analytic_b_sc(
                analytic, (txs, ny, nz), x_row0 + jnp.float32(rs), ext, ext
            )
        tr = 2.0 * cr + scale * acc_r
        ti = 2.0 * ci + scale * acc_i
        new_r = br * tr - bi * ti - cr
        new_i = br * ti + bi * tr - ci
        if with_norm:
            new_r = inv * new_r
            new_i = inv * new_i
            racc[slot, 0] += jnp.sum(new_r * new_r) + jnp.sum(new_i * new_i)
        lag_r[...] = psi_buf[rs + txs - ext : rs + txs]
        lag_i[...] = psi_buf[nxe + rs + txs - ext : nxe + rs + txs]
        psi_buf[rs : rs + txs] = new_r
        psi_buf[nxe + rs : nxe + rs + txs] = new_i

    if halo > ext:
        # deep-halo Dirichlet: global-edge shards re-zero their halo side
        # of both components after every blind step
        @pl.when(edge_smem[0, 0] == 1)
        def _mask_lo():
            z = jnp.zeros((halo, ny, nz), psi_buf.dtype)
            psi_buf[0:halo] = z
            psi_buf[nxe : nxe + halo] = z

        @pl.when(edge_smem[1, 0] == 1)
        def _mask_hi():
            z = jnp.zeros((halo, ny, nz), psi_buf.dtype)
            psi_buf[nxe - halo : nxe] = z
            psi_buf[2 * nxe - halo : 2 * nxe] = z

    @pl.when(i == n_steps - 1)
    def _store():
        if with_norm:
            r = jax.lax.rsqrt(jnp.maximum(racc[slot, 0], jnp.float32(1e-37)))
            for rs, txs in slabs:
                psi_buf[rs : rs + txs] = r * psi_buf[rs : rs + txs]
                psi_buf[nxe + rs : nxe + rs + txs] = (
                    r * psi_buf[nxe + rs : nxe + rs + txs]
                )
            red_out[0, 0] = racc[slot, 0]
        else:
            red_out[0, 0] = jnp.float32(0.0)
        cp = pltpu.make_async_copy(psi_buf, out_hbm, sem_out)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dn", "mass", "n_steps", "analytic",
                     "interpret", "per_step_norm", "halo", "ici_steps",
                     "ici_axis", "ici_nsh"),
)
def evolve_chunk_resident_sc(
    psi2: jnp.ndarray,
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    analytic,
    interpret: bool = False,
    per_step_norm: bool = False,
    b2: Optional[jnp.ndarray] = None,
    x_origin=None,
    edges=None,
    halo: int = 0,
    ici_steps: int = 0,
    ici_axis=None,
    ici_nsh: int = 1,
) -> jnp.ndarray:
    """A full chunk of ground-state split-complex sweeps with (re, im)
    VMEM-resident; trajectory-identical to ``n_steps`` 1-step fused split
    sweeps (oracle: ops/split_complex.evolve_chunk_sc). ``per_step_norm``
    carries the inverse complex norm across grid programs in SMEM (the f32
    drift guard, reference per-step semantics src/grid.rs:674-681).

    Sharded mode (``halo = R·ext > ext``): ``psi2`` is the stacked pair
    with an R·ext-deep exchanged ghost zone per component, ``x_origin``
    the shard's global interior x origin, and ``edges`` the global-edge
    flags for the per-step Dirichlet re-masking; after ``n_steps = R``
    blind in-kernel sweeps the interior is exact (the real kernel's
    deep-ghost-zone schedule, ops/pallas_stencil._evolve_kernel_res).
    Ground state only (per-step global norms across shards would need the
    in-kernel scalar all-to-all).

    In-kernel ICI mode (``ici_steps > 0``): one call spans the whole
    chunk (``n_steps = screen_update``); at every ``ici_steps``-step
    window boundary the still-exact interior edge strips of BOTH
    components ride remote DMAs into parity-slotted landing strips on the
    mesh-ring neighbours — the pair never returns to HBM inside the
    chunk. The caller seeds the first window's deep halo (one host-side
    ppermute), which is also the cross-chunk slot barrier."""
    ext = _EXT[order]
    nxp2, ny, nz = psi2.shape
    nxe = nxp2 // 2
    nx = nxe - 2 * ext
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    dtype = psi2.dtype
    if analytic is None and b2 is None:
        raise ValueError("resident split sweep needs analytic or b2")
    if halo and analytic is None:
        raise ValueError("sharded resident split mode is analytic-B only")
    if halo and per_step_norm:
        raise ValueError("sharded resident split mode is ground-state only")
    if ici_steps and (not halo or ici_axis is None):
        raise ValueError("ici mode needs halo = R·ext and a mesh axis")
    tx = _pk._pick_tx_res(nx, ext)
    if tx is None:
        raise ValueError(f"no resident slab height fits NX={nx}")
    if x_origin is None:
        x_origin = jnp.zeros((1, 1), jnp.int32)
    else:
        x_origin = jnp.asarray(x_origin, jnp.int32).reshape(1, 1)
    if edges is None:
        edges = jnp.ones((2, 1), jnp.int32)
    else:
        edges = jnp.asarray(edges, jnp.int32).reshape(2, 1)
    kernel = functools.partial(
        _evolve_kernel_res_sc,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        analytic=analytic,
        nx=nx,
        with_norm=per_step_norm,
        halo=halo,
        ici_r=ici_steps,
        ici_axis=ici_axis,
        ici_nsh=ici_nsh,
    )
    b_arg = b2 if analytic is None else jnp.zeros((1, 1, 1), dtype)
    brows = 4 * tx if analytic is None else 1
    land_rows = 8 * halo if ici_steps else 1
    horner = analytic is not None and _sc_series_terms(analytic) is not None
    rt_rows = 4 if horner else 1
    plane = ny * nz * dtype.itemsize
    need = (
        nxp2 + 2 * ext + 6 * tx + land_rows + rt_rows
    ) * plane + brows * plane
    with jax.enable_x64(False):
        out, _red = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nxp2, ny, nz), dtype),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nxp2, ny, nz), dtype),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.SMEM((2, 1), jnp.float32),
                pltpu.VMEM((brows, ny, nz), dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.VMEM(
                    (land_rows, ny, nz) if ici_steps else (1, 1, 1), dtype
                ),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((8,)),  # recv: parity·4 + strip
                pltpu.VMEM(
                    (rt_rows, ny, nz) if horner else (1, 1, 1), jnp.float32
                ),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(psi2, b_arg, x_origin, edges)
    return out


# --------------------------------------------------------------------------- #
# x-blocked deep-halo resident kernel for the split pair (256³ complex)
# --------------------------------------------------------------------------- #
#
# The stacked (re, im) pair misses whole-array residency just past ~200³
# (256³ f32 pair = 129 MiB), so it gets the real kernel's x-blocked
# deep-ghost-zone treatment (ops/pallas_stencil._evolve_kernel_resb): NX is
# split into blocks whose *pair* fits VMEM; each block + an R·ext ghost zone
# is swept blind R times on-chip (both components stepping together — the
# complex update mixes Tr/Ti), then its interior is written back. Passes are
# out-of-place, so the deep-ghost-zone validity argument is exact. Analytic
# complex B only (ComplexHarmonic/ComplexCoulomb — the BASELINE config-4
# family); streamed-B grids keep the split K ladder. Ground state only.


def pick_resb_sc(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                 n_steps: int):
    """(bx, r, tx, prefetch, modeled_rate) for the split blocked kernel, or
    None. Mirrors ops/pallas_stencil.pick_resb with pair-doubled buffers:
    without the ping-pong second buffer the DMA serialises against the
    in-place sweep (measured on the real kernel); with it only the
    residual slack remains."""
    if itemsize != 4:
        return None
    plane = ny * nz * itemsize
    best = None
    best_rate = 0.0
    for bx in (256, 192, 128, 96, 64, 48, 32, 16):
        if nx % bx or nx // bx < 2 or bx <= ext:
            continue
        for r in range(min(n_steps, 8), 1, -1):
            h = r * ext
            bxp = bx + 2 * h
            if 2 * bxp * plane > _pk._RES_BUDGET:
                continue
            rows = bxp - 2 * ext

            def _tx_under(cap_rows):
                for cand in (32, 16, 8, 4):
                    if cand > rows or cand <= ext or not (
                        rows % cand == 0 or rows % cand > ext
                    ):
                        continue
                    # +4 rows: the hoisted Horner-B planes (_sc_hoist_rt)
                    if (cap_rows + 12 * cand + 4) * plane <= (
                        _pk._RESB_NEED_CAP
                    ):
                        return cand
                return None

            vpu_rows = r * (bx + 2 * (r - 1) * ext)
            # serial by default (overlap variants measured no better on the
            # real kernel — see ops/pallas_stencil.pick_resb); ping-pong
            # behind WAFER_RESB_PREFETCH=1
            if _os.environ.get("WAFER_RESB_PREFETCH") == "1":
                tx_pf = None
                if 4 * bxp * plane <= 2 * _pk._RES_BUDGET:
                    tx_pf = _tx_under(4 * bxp + 2 * ext + h)
                if tx_pf is not None:
                    rate = bx * r / (vpu_rows + 0.25 * bxp)
                    if rate > best_rate:
                        best, best_rate = (bx, r, tx_pf, True), rate
            tx = _tx_under(2 * bxp + 2 * ext + h)
            if tx is not None:
                rate = bx * r / (vpu_rows + 0.73 * 2 * (bxp + bx))
                if rate > best_rate:
                    best, best_rate = (bx, r, tx, False), rate
    if best is None:
        return None
    return best[0], best[1], best[2], best[3], best_rate


def resident_blocked_sc_supported(nx: int, ny: int, nz: int, ext: int,
                                  itemsize: int, n_steps: int,
                                  analytic_b: bool) -> bool:
    return (
        analytic_b
        and pick_resb_sc(nx, ny, nz, ext, itemsize, n_steps) is not None
    )


def _evolve_kernel_resb_sc(
    psi_hbm,    # (2·NXH, NY, NZ) ANY — deep layout, NXH = NX+2H, re rows first
    xorg_smem,  # (1, 1) SMEM i32 — shard's global interior x origin
    edge_smem,  # (2, 1) SMEM i32 — [at_global_lo, at_global_hi]
    out_hbm,    # (2·NXH, NY, NZ) ANY
    psi_a,      # (2·BXP, NY, NZ) VMEM — block pair, re rows [0, BXP)
    psi_b,      # (2·BXP, NY, NZ) VMEM — slot-1 pair (1-row stub when the
    # ping-pong prefetch is off)
    lag_r,      # (ext, NY, NZ) VMEM
    lag_i,      # (ext, NY, NZ) VMEM
    zeros_halo, # (H, NY, NZ) VMEM
    sem_in,     # DMA (2·2·nslabs,)
    sem_out,    # DMA (2·2·nslabs,)
    sem_halo,
    yzrt,       # (4, NY, NZ) VMEM — hoisted Horner-B planes ((1,1,1) stub
    # when the series is gated off)
    *,
    order: str,
    scale: float,
    bx: int,
    tx: int,
    ext: int,
    analytic,
    r_steps: int,
    prefetch: bool = False,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    # 1-D grid: see ops/pallas_stencil._evolve_kernel_resb
    idx = pl.program_id(0)
    nblk = pl.num_programs(0) // r_steps
    i = idx // r_steps
    t = idx - i * r_steps
    ny, nz = psi_a.shape[1], psi_a.shape[2]
    h = r_steps * ext
    bxp = bx + 2 * h
    nxh = psi_hbm.shape[0] // 2
    x_row0 = (
        (i * bx).astype(jnp.float32)
        + xorg_smem[0, 0].astype(jnp.float32)
        + jnp.float32(ext - h)
    )
    last_t = t == r_steps - 1
    n_horner = _sc_series_terms(analytic)

    if n_horner is not None:
        @pl.when(idx == 0)
        def _hoist_rt():
            yzrt[...] = _sc_hoist_rt(analytic, ny, nz, ext, ext)

    rows_swept = bxp - 2 * ext
    slabs = [(ext + s * tx, tx) for s in range(rows_swept // tx)]
    if rows_swept % tx:
        slabs.append((ext + (rows_swept // tx) * tx, rows_swept % tx))
    nslabs = len(slabs)

    seg_lo = [0] + [rs for rs, _t in slabs[1:]]
    seg_hi = seg_lo[1:] + [bxp]
    out_rng = []
    for rs, txs in slabs:
        lo = max(rs, h)
        hi = min(rs + txs, h + bx)
        out_rng.append((lo, hi) if hi > lo else None)

    def in_seg(blk, s, comp, buf, base):
        src0 = comp * nxh + blk * bx + seg_lo[s]
        dst0 = comp * bxp + seg_lo[s]
        return pltpu.make_async_copy(
            psi_hbm.at[pl.ds(src0, seg_hi[s] - seg_lo[s])],
            buf.at[pl.ds(dst0, seg_hi[s] - seg_lo[s])],
            sem_in.at[(base * 2 + comp) * nslabs + s],
        )

    def out_seg(blk, s, comp, buf, base):
        lo, hi = out_rng[s]
        return pltpu.make_async_copy(
            buf.at[pl.ds(comp * bxp + lo, hi - lo)],
            out_hbm.at[pl.ds(comp * nxh + blk * bx + lo, hi - lo)],
            sem_out.at[(base * 2 + comp) * nslabs + s],
        )

    def sweep(buf, cold_waits, base):
        lag_r[...] = buf[0:ext]
        lag_i[...] = buf[bxp : bxp + ext]
        for s_idx, (rs, txs) in enumerate(slabs):
            if cold_waits is not None and s_idx + 1 < nslabs:

                @pl.when(cold_waits)
                def _wait_next_seg(_s=s_idx + 1):
                    in_seg(i, _s, 0, buf, base).wait()
                    in_seg(i, _s, 1, buf, base).wait()

            cr = buf[rs : rs + txs]
            ci = buf[bxp + rs : bxp + rs + txs]
            acc_r = (-float(center_c)) * cr
            acc_i = (-float(center_c)) * ci
            for off, cf in zip(offsets, coeffs):
                cf = float(cf)
                xm_r = _lag_xm(lag_r, buf, rs, txs, off, ext)
                xp_r = buf[rs + off : rs + txs + off]
                acc_r += cf * (xm_r + xp_r)
                acc_r += cf * (_shift_y(cr, off) + _shift_y(cr, -off))
                acc_r += cf * (_shift_z(cr, off) + _shift_z(cr, -off))
                xm_i = _lag_xm(lag_i, buf, bxp + rs, txs, off, ext)
                xp_i = buf[bxp + rs + off : bxp + rs + txs + off]
                acc_i += cf * (xm_i + xp_i)
                acc_i += cf * (_shift_y(ci, off) + _shift_y(ci, -off))
                acc_i += cf * (_shift_z(ci, off) + _shift_z(ci, -off))
            if n_horner is not None:
                br, bi = _sc_b_slab(
                    analytic, yzrt[...], x_row0 + jnp.float32(rs), txs,
                    n_horner,
                )
            else:
                br, bi = _analytic_b_sc(
                    analytic, (txs, ny, nz), x_row0 + jnp.float32(rs), ext,
                    ext,
                )
            tr = 2.0 * cr + scale * acc_r
            ti = 2.0 * ci + scale * acc_i
            new_r = br * tr - bi * ti - cr
            new_i = br * ti + bi * tr - ci
            lag_r[...] = buf[rs + txs - ext : rs + txs]
            lag_i[...] = buf[bxp + rs + txs - ext : bxp + rs + txs]
            buf[rs : rs + txs] = new_r
            buf[bxp + rs : bxp + rs + txs] = new_i

    def dirichlet(buf):
        # edges-gated: sharded callers clear the flag on shard-interior
        # sides (exchanged neighbour rows, see the real kernel)
        @pl.when(jnp.logical_and(i == 0, edge_smem[0, 0] == 1))
        def _lo():
            buf[0:h] = jnp.zeros((h, ny, nz), buf.dtype)
            buf[bxp : bxp + h] = jnp.zeros((h, ny, nz), buf.dtype)

        @pl.when(jnp.logical_and(i == nblk - 1, edge_smem[1, 0] == 1))
        def _hi():
            buf[bxp - h : bxp] = jnp.zeros((h, ny, nz), buf.dtype)
            buf[2 * bxp - h : 2 * bxp] = jnp.zeros((h, ny, nz), buf.dtype)

    def start_all(blk, buf, base):
        for s in range(nslabs):
            in_seg(blk, s, 0, buf, base).start()
            in_seg(blk, s, 1, buf, base).start()

    def wait_all_in(blk, buf, base):
        for s in range(nslabs):
            in_seg(blk, s, 0, buf, base).wait()
            in_seg(blk, s, 1, buf, base).wait()

    def emit_outs(blk, buf, base):
        for s in range(nslabs):
            if out_rng[s] is not None:
                out_seg(blk, s, 0, buf, base).start()
                out_seg(blk, s, 1, buf, base).start()

    def drain_outs(blk, buf, base):
        for s in range(nslabs):
            if out_rng[s] is not None:
                out_seg(blk, s, 0, buf, base).wait()
                out_seg(blk, s, 1, buf, base).wait()

    if not prefetch:
        @pl.when(jnp.logical_and(t == 0, i >= 1))
        def _drain_prev():
            drain_outs(i - 1, psi_a, 0)

        @pl.when(t == 0)
        def _load():
            start_all(i, psi_a, 0)
            in_seg(i, 0, 0, psi_a, 0).wait()
            in_seg(i, 0, 1, psi_a, 0).wait()

        sweep(psi_a, t == 0, 0)
        dirichlet(psi_a)

        @pl.when(last_t)
        def _emit():
            emit_outs(i, psi_a, 0)

        @pl.when(jnp.logical_and(last_t, i == nblk - 1))
        def _drain_tail():
            drain_outs(i, psi_a, 0)
    else:
        # two-buffer ping-pong: see ops/pallas_stencil._evolve_kernel_resb —
        # compute never shares a buffer with in-flight DMA
        assert r_steps >= 2, "ping-pong prefetch needs R >= 2"
        bufs = (psi_a, psi_b)
        slot = jax.lax.rem(i, jnp.int32(2))
        for sl in (0, 1):
            p_slot = slot == sl
            buf = bufs[sl]
            other = bufs[1 - sl]

            if sl == 0:

                @pl.when(jnp.logical_and(p_slot, jnp.logical_and(t == 0, i == 0)))
                def _cold_load():
                    start_all(i, psi_a, 0)
                    in_seg(i, 0, 0, psi_a, 0).wait()
                    in_seg(i, 0, 1, psi_a, 0).wait()

            @pl.when(jnp.logical_and(p_slot, jnp.logical_and(t == 0, i >= 1)))
            def _wait_staged(_buf=buf, _sl=sl):
                wait_all_in(i, _buf, _sl)

            @pl.when(
                jnp.logical_and(
                    p_slot,
                    jnp.logical_and(t == 1, jnp.logical_and(i >= 1, i + 1 < nblk)),
                )
            )
            def _drain_prev_outs(_other=other, _osl=1 - sl):
                drain_outs(i - 1, _other, _osl)

            @pl.when(jnp.logical_and(p_slot, jnp.logical_and(t == 1, i + 1 < nblk)))
            def _stage_next(_other=other, _osl=1 - sl):
                start_all(i + 1, _other, _osl)

            @pl.when(p_slot)
            def _sweep(_buf=buf, _sl=sl):
                cold = jnp.logical_and(t == 0, i == 0) if _sl == 0 else None
                sweep(_buf, cold, _sl)
                dirichlet(_buf)

            @pl.when(jnp.logical_and(p_slot, last_t))
            def _emit(_buf=buf, _sl=sl):
                emit_outs(i, _buf, _sl)

            @pl.when(
                jnp.logical_and(p_slot, jnp.logical_and(last_t, i == nblk - 1))
            )
            def _drain_tail(_buf=buf, _sl=sl, _other=other, _osl=1 - sl):
                drain_outs(i, _buf, _sl)

                @pl.when(i >= 1)
                def _drain_second_last():
                    drain_outs(i - 1, _other, _osl)

    @pl.when(jnp.logical_and(last_t, i == 0))
    def _zero_lo():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        for row0 in (0, nxh):
            hc = pltpu.make_async_copy(
                zeros_halo, out_hbm.at[pl.ds(row0, h)], sem_halo
            )
            hc.start()
            hc.wait()

    @pl.when(jnp.logical_and(last_t, i == nblk - 1))
    def _zero_hi():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        for row0 in (nxh - h, 2 * nxh - h):
            hc = pltpu.make_async_copy(
                zeros_halo, out_hbm.at[pl.ds(row0, h)], sem_halo
            )
            hc.start()
            hc.wait()


@functools.partial(
    jax.jit,
    static_argnames=("order", "scale", "bx", "r_steps", "analytic",
                     "interpret", "tx", "prefetch"),
)
def evolve_steps_resident_blocked_sc(
    psi2_h: jnp.ndarray,
    order: str,
    scale: float,
    bx: int,
    r_steps: int,
    analytic,
    interpret: bool = False,
    tx: Optional[int] = None,
    prefetch: bool = False,
    x_origin=None,
    edges=None,
) -> jnp.ndarray:
    """One out-of-place pass of ``r_steps`` blind deep-halo split sweeps
    over VMEM-sized x-blocks. ``psi2_h`` is the stacked deep layout
    (:func:`to_xpad_k_sc` with ``k_steps = r_steps``). ``x_origin`` and
    ``edges`` make the pass a sharded exchange window, exactly as the real
    kernel (ops/pallas_stencil.evolve_steps_resident_blocked)."""
    ext = _EXT[order]
    h = r_steps * ext
    nxh2, ny, nz = psi2_h.shape
    nxh = nxh2 // 2
    nx = nxh - 2 * h
    dtype = psi2_h.dtype
    assert analytic is not None, "blocked split sweep is analytic-B only"
    if nx % bx:
        raise ValueError(f"bx={bx} does not divide NX={nx}")
    bxp = bx + 2 * h
    plane = ny * nz * dtype.itemsize
    if tx is None:
        # cap-aware pick from the ACTUAL block geometry (a pick_resb_sc
        # plan may carry a different r whose tx was sized for a smaller
        # block — see the real kernel's wrapper)
        rows = bxp - 2 * ext
        for cand in (32, 16, 8, 4):
            if cand > rows or cand <= ext or not (
                rows % cand == 0 or rows % cand > ext
            ):
                continue
            if (2 * bxp + 2 * ext + h + 12 * cand + 4) * plane <= (
                _pk._RESB_NEED_CAP
            ):
                tx = cand
                break
    if tx is None:
        raise ValueError(f"no slab height fits block {bxp} rows")
    kernel = functools.partial(
        _evolve_kernel_resb_sc,
        order=order,
        scale=scale,
        bx=bx,
        tx=tx,
        ext=ext,
        analytic=analytic,
        r_steps=r_steps,
        prefetch=prefetch,
    )
    rows_swept = bxp - 2 * ext
    nslabs = rows_swept // tx + (1 if rows_swept % tx else 0)
    slot_rows = 2 * bxp if prefetch else 1
    if x_origin is None:
        x_origin = jnp.zeros((1, 1), jnp.int32)
    else:
        x_origin = jnp.asarray(x_origin, jnp.int32).reshape(1, 1)
    if edges is None:
        edges = jnp.ones((2, 1), jnp.int32)
    else:
        edges = jnp.asarray(edges, jnp.int32).reshape(2, 1)
    horner = _sc_series_terms(analytic) is not None
    rt_rows = 4 if horner else 1
    need = (2 * bxp + slot_rows + 2 * ext + h + 12 * tx + rt_rows) * plane
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=((nx // bx) * r_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nxh2, ny, nz), dtype),
            scratch_shapes=[
                pltpu.VMEM((2 * bxp, ny, nz), dtype),
                pltpu.VMEM((slot_rows, ny, nz), dtype),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.VMEM((h, ny, nz), dtype),
                pltpu.SemaphoreType.DMA((4 * nslabs,)),
                pltpu.SemaphoreType.DMA((4 * nslabs,)),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM(
                    (rt_rows, ny, nz) if horner else (1, 1, 1), jnp.float32
                ),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(psi2_h, x_origin, edges)


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dn", "mass", "n_steps", "analytic",
                     "bx", "r_steps", "interpret", "tx", "prefetch"),
)
def evolve_chunk_resident_blocked_sc(
    psi2_h: jnp.ndarray,
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    analytic,
    bx: int,
    r_steps: int,
    interpret: bool = False,
    tx: Optional[int] = None,
    prefetch: bool = False,
) -> jnp.ndarray:
    """A split-complex ground chunk through the x-blocked deep-halo
    resident kernel; remainder steps run as 1-step fused split sweeps
    (exact n_steps cadence, src/grid.rs:544-687)."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    ext = _EXT[order]

    def body(_i, p):
        return evolve_steps_resident_blocked_sc(
            p, order, scale, bx, r_steps, analytic, interpret, tx, prefetch
        )

    psi2 = jax.lax.fori_loop(0, n_steps // r_steps, body, psi2_h)
    rem = n_steps % r_steps
    if rem:
        extra = (r_steps - 1) * ext
        nxh = psi2.shape[0] // 2
        xr, xi = psi2[:nxh], psi2[nxh:]
        if extra:
            xr, xi = xr[extra:-extra], xi[extra:-extra]
        p1 = jnp.concatenate([xr, xi], axis=0)
        for _ in range(rem):
            p1, _n2, _ov = evolve_step_fused_sc(
                p1, None, None, order, scale, 0, False, interpret,
                analytic=analytic,
            )
        if extra:
            nx1 = p1.shape[0] // 2
            pad = ((extra, extra), (0, 0), (0, 0))
            psi2 = jnp.concatenate(
                [jnp.pad(p1[:nx1], pad), jnp.pad(p1[nx1:], pad)], axis=0
            )
        else:
            psi2 = p1
    return psi2


# --------------------------------------------------------------------------- #
# mixed-residency resident kernel: re on-chip for the whole chunk, im
# streamed (256³ complex)
# --------------------------------------------------------------------------- #
#
# The stacked (re, im) pair misses whole-chunk VMEM just past ~200³, but the
# RE component alone fits to ~268³ — exactly the real kernel's resident
# envelope. This kernel keeps re VMEM-resident across every step of the
# chunk (zero re HBM traffic between load and store) and streams only im:
# per step, double-buffered (tx+2·ext)-row im windows ride in from one half
# of a ping-pong HBM pair while finished im' slabs ride out to the other
# half — streamed window DMA genuinely overlaps compute (unlike the
# block-granular staging of the resident kernels' measured DMA-overlap
# negative, the windows land in buffers the sweep is not updating in
# place). Exact per-step cadence (no deep halos, no blind recompute): HBM
# traffic is 8 B/update (im read+write) against the pair-blocked kernel's
# ~2.2× VPU amplification + serial DMA. Ground-SHAPED chunks only (no
# stored-state streams); a per-step-norm variant (the deferred racc
# recursion of _evolve_kernel_res_sc, final rescale host-side) serves the
# drift guard and the delayed-GS excited chunks. B sources: the
# in-kernel analytic complex B, or — for non-analytic complex potentials
# (e.g. ComplexFullCornell) — a double-buffered streamed (Br, Bi) slab
# window pair at 16 B/update total (same prefetch cadence as the im
# windows; measured 3.84e10 at 256³, 1.83× the K=2 streamed pair,
# BASELINE.md round 4). Capability referent: the reference stubs complex
# propagation entirely (src/potential.rs:222,271).


def pick_tx_mixed_sc(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                     analytic_b: bool = True):
    """Slab height for the mixed-residency kernel, or None (re must fit
    whole-chunk; windows + pair-sweep temporaries under the scoped cap).
    ``analytic_b=False`` budgets the double-buffered (Br, Bi) slab windows
    the streamed-B variant adds (non-analytic complex potentials, e.g.
    ComplexFullCornell)."""
    if itemsize != 4:
        return None
    plane = ny * nz * itemsize
    nxe = nx + 2 * ext
    if nxe * plane > _pk._RES_BUDGET:
        return None
    for tx in (16, 8, 4):
        if tx <= ext or not (nx % tx == 0 or nx % tx > ext):
            continue
        # 8·tx temporaries margin: measured — the 256³ tx=16 build
        # (258-row resident re + 36+32 window rows) compiles and runs at
        # 6.22e10 vs tx=8's 5.98e10 (BASELINE.md round 4)
        need = (
            nxe + ext + 4 + 2 * (tx + 2 * ext) + 2 * tx + 8 * tx
            + (0 if analytic_b else 4 * tx)
        ) * plane
        if need <= _pk._RESB_NEED_CAP:
            return tx
    return None


def resident_mixed_sc_supported(nx: int, ny: int, nz: int, ext: int,
                                itemsize: int, analytic_b: bool) -> bool:
    return pick_tx_mixed_sc(nx, ny, nz, ext, itemsize, analytic_b) is not None


def _evolve_kernel_res_mixed_sc(
    re_hbm,     # (NXE, NY, NZ) ANY — re input (consumed at i == 0)
    im2_hbm,    # (NXE, NY, NZ) ANY — step-0 im (copied out at i == 0)
    b2_hbm,     # (2·NX, NY, NZ) ANY — (Br, Bi) stacked (stub when analytic)
    xorg_smem,  # (1, 1) SMEM i32
    re_out,     # (NXE, NY, NZ) ANY — re' written once at the last step
    im2_out,    # (2·NXE, NY, NZ) ANY — im ping-pong pair; ALL in-kernel im
    # DMA rides this ref (even steps read rows [0, NXE) and write
    # [NXE, 2·NXE); odd steps the reverse)
    red_out,    # (1, 1) SMEM
    re_buf,     # (NXE, NY, NZ) VMEM — resident across all steps
    win,        # (2·(tx+2·ext), NY, NZ) VMEM — im in-windows, 2 slots
    wout,       # (2·tx, NY, NZ) VMEM — im' out slabs, 2 slots
    lag_r,      # (ext, NY, NZ) VMEM
    yzrt,       # (4, NY, NZ) VMEM — Horner-B planes ((1,1,1) stub)
    zeros_x,    # (ext, NY, NZ) VMEM
    bbuf,       # (4·tx, NY, NZ) VMEM — double-buffered (Br, Bi) slab
    # windows ((1,1,1) stub when analytic)
    racc,       # (2, 1) SMEM f32 — per-step norm² ping-pong (with_norm)
    sem_in,
    sem_out,
    sem_win,    # DMA (2,)
    sem_wout,   # DMA (2,)
    sem_z,
    sem_b,      # DMA (4,)
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    analytic,
    nx: int,
    with_norm: bool = False,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    ny, nz = re_buf.shape[1], re_buf.shape[2]
    nxe = nx + 2 * ext
    wrows = tx + 2 * ext
    x_row0 = xorg_smem[0, 0].astype(jnp.float32)
    n_horner = None if analytic is None else _sc_series_terms(analytic)

    @pl.when(i == 0)
    def _load():
        cp = pltpu.make_async_copy(re_hbm, re_buf, sem_in)
        cp.start()
        # all in-kernel im traffic rides the OUTPUT pair: seed its ping
        # half from the input (one extra im pass per chunk — amortised
        # over n_steps; sidesteps input-aliasing semantics entirely)
        sc_ = pltpu.make_async_copy(
            im2_hbm.at[pl.ds(0, nxe)], im2_out.at[pl.ds(0, nxe)], sem_z
        )
        sc_.start()
        cp.wait()
        sc_.wait()
        if n_horner is not None:
            yzrt[...] = _sc_hoist_rt(analytic, ny, nz, ext, ext)
        # the pong half's x-halo rows are uninitialised until zeroed (the
        # in-windows read them at step 1; interior writes never touch them)
        zeros_x[...] = jnp.zeros_like(zeros_x)
        for row0 in (nxe, 2 * nxe - ext):
            zc = pltpu.make_async_copy(
                zeros_x, im2_out.at[pl.ds(row0, ext)], sem_z
            )
            zc.start()
            zc.wait()

    # step parity: even steps read im from rows [0, NXE) and write
    # [NXE, 2·NXE); odd steps the reverse — dynamic row bases, one ref
    parity = jax.lax.rem(i, jnp.int32(2))
    src_base = parity * jnp.int32(nxe)
    dst_base = jnp.int32(nxe) - src_base

    if with_norm:
        # deferred per-step normalisation (exact by linearity — the racc
        # recursion of _evolve_kernel_res_sc): step i scales its outputs by
        # rsqrt of step i−1's accumulated ‖ψ‖² and accumulates its own; the
        # WRAPPER applies the final step's scale to both halves (the last
        # im' slabs are already in HBM when the chunk ends, so the final
        # rescale cannot happen in VMEM here).
        nslot = jax.lax.rem(i, jnp.int32(2))
        nprev = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
        inv = jnp.where(
            i == 0,
            jnp.float32(1.0),
            jax.lax.rsqrt(jnp.maximum(racc[nprev, 0], jnp.float32(1e-37))),
        )
        racc[nslot, 0] = jnp.float32(0.0)

    slabs = [(ext + s * tx, tx) for s in range(nx // tx)]
    if nx % tx:
        slabs.append((ext + (nx // tx) * tx, nx % tx))
    nslabs = len(slabs)

    def win_in(s_idx, slot):
        rs, txs = slabs[s_idx]
        return pltpu.make_async_copy(
            im2_out.at[pl.ds(src_base + jnp.int32(rs - ext), txs + 2 * ext)],
            win.at[pl.ds(slot * wrows, txs + 2 * ext)],
            sem_win.at[slot],
        )

    def w_out(s_idx, slot):
        rs, txs = slabs[s_idx]
        return pltpu.make_async_copy(
            wout.at[pl.ds(slot * tx, txs)],
            im2_out.at[pl.ds(dst_base + jnp.int32(rs), txs)],
            sem_wout.at[slot],
        )

    if analytic is None:
        # streamed-B mode (non-analytic complex potentials, e.g.
        # ComplexFullCornell): (Br, Bi) slab windows ride in double-buffered
        # alongside the im windows — B is step-constant, so this re-reads it
        # every step (16 B/update total stream vs the analytic variant's 8)
        def b_dma(s_idx, bslot):
            rs_s, tx_s = slabs[s_idx]
            return [
                pltpu.make_async_copy(
                    b2_hbm.at[pl.ds(rs_s - ext, tx_s)],
                    bbuf.at[pl.ds((bslot * 2) * tx, tx_s)],
                    sem_b.at[bslot * 2],
                ),
                pltpu.make_async_copy(
                    b2_hbm.at[pl.ds(nx + rs_s - ext, tx_s)],
                    bbuf.at[pl.ds((bslot * 2 + 1) * tx, tx_s)],
                    sem_b.at[bslot * 2 + 1],
                ),
            ]

        for c_ in b_dma(0, 0):
            c_.start()

    win_in(0, 0).start()
    lag_r[...] = re_buf[0:ext]
    for s, (rs, txs) in enumerate(slabs):
        slot = s % 2
        if s + 1 < nslabs:
            win_in(s + 1, 1 - slot).start()
            if analytic is None:
                for c_ in b_dma(s + 1, 1 - slot):
                    c_.start()
        win_in(s, slot).wait()
        if analytic is None:
            for c_ in b_dma(s, slot):
                c_.wait()
        if s >= 2:
            # the out slot is re-used every other slab — drain before reuse
            w_out(s - 2, slot).wait()
        cr = re_buf[rs : rs + txs]
        base = slot * wrows + ext
        ci = win[base : base + txs]
        acc_r = (-float(center_c)) * cr
        acc_i = (-float(center_c)) * ci
        for off, cf in zip(offsets, coeffs):
            cf = float(cf)
            xm_r = _lag_xm(lag_r, re_buf, rs, txs, off, ext)
            xp_r = re_buf[rs + off : rs + txs + off]
            acc_r += cf * (xm_r + xp_r)
            acc_r += cf * (_shift_y(cr, off) + _shift_y(cr, -off))
            acc_r += cf * (_shift_z(cr, off) + _shift_z(cr, -off))
            # the im window carries its own ±ext x-halo — pre-step rows
            # throughout (im[t−1] lives in the src half, never written
            # this step), so no im lag buffer exists
            xm_i = win[base - off : base - off + txs]
            xp_i = win[base + off : base + off + txs]
            acc_i += cf * (xm_i + xp_i)
            acc_i += cf * (_shift_y(ci, off) + _shift_y(ci, -off))
            acc_i += cf * (_shift_z(ci, off) + _shift_z(ci, -off))
        if analytic is None:
            br = bbuf[(slot * 2) * tx : (slot * 2) * tx + txs]
            bi = bbuf[(slot * 2 + 1) * tx : (slot * 2 + 1) * tx + txs]
        elif n_horner is not None:
            br, bi = _sc_b_slab(
                analytic, yzrt[...], x_row0 + jnp.float32(rs), txs, n_horner
            )
        else:
            br, bi = _analytic_b_sc(
                analytic, (txs, ny, nz), x_row0 + jnp.float32(rs), ext, ext
            )
        tr = 2.0 * cr + scale * acc_r
        ti = 2.0 * ci + scale * acc_i
        new_r = br * tr - bi * ti - cr
        new_i = br * ti + bi * tr - ci
        if with_norm:
            new_r = inv * new_r
            new_i = inv * new_i
            racc[nslot, 0] += jnp.sum(new_r * new_r) + jnp.sum(new_i * new_i)
        lag_r[...] = re_buf[rs + txs - ext : rs + txs]
        re_buf[rs : rs + txs] = new_r
        wout[slot * tx : slot * tx + txs] = new_i
        w_out(s, slot).start()
    for s in range(max(nslabs - 2, 0), nslabs):
        w_out(s, s % 2).wait()

    @pl.when(i == n_steps - 1)
    def _store():
        if with_norm:
            red_out[0, 0] = racc[nslot, 0]
        else:
            red_out[0, 0] = jnp.float32(0.0)
        cp = pltpu.make_async_copy(re_buf, re_out, sem_out)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dn", "mass", "n_steps", "analytic",
                     "interpret", "tx", "per_step_norm"),
)
def evolve_chunk_resident_mixed_sc(
    psi2: jnp.ndarray,
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    analytic,
    interpret: bool = False,
    tx: Optional[int] = None,
    b2: Optional[jnp.ndarray] = None,
    per_step_norm: bool = False,
) -> jnp.ndarray:
    """A split-complex ground chunk with re VMEM-resident throughout and im
    streamed through a ping-pong HBM pair (see the section comment).
    ``psi2`` is the stacked xpad layout (:func:`to_xpad_sc`); exact
    per-step cadence (src/grid.rs:544-687). Non-analytic complex potentials
    pass ``b2`` ((Br, Bi) work-area stacked) and the kernel streams it
    double-buffered alongside im. ``per_step_norm`` runs the deferred
    per-step normalisation recursion (drift-guard psn and delayed-GS
    chunks, oracle ops/split_complex.evolve_chunk_sc): the final step's
    scale is applied here, host-side, because the last im' slabs are
    already in HBM when the kernel ends."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    ext = _EXT[order]
    nxp2, ny, nz = psi2.shape
    nxe = nxp2 // 2
    nx = nxe - 2 * ext
    dtype = psi2.dtype
    if analytic is None and b2 is None:
        raise ValueError("mixed-residency split sweep needs analytic or b2")
    if tx is None:
        tx = pick_tx_mixed_sc(nx, ny, nz, ext, dtype.itemsize,
                              analytic is not None)
    if tx is None:
        raise ValueError(f"no mixed-residency slab plan for NX={nx}")
    kernel = functools.partial(
        _evolve_kernel_res_mixed_sc,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        analytic=analytic,
        nx=nx,
        with_norm=per_step_norm,
    )
    re = psi2[:nxe]
    # only the ping half is consumed (copied into the output pair at
    # i == 0); the input stays (NXE,) tall
    im2 = psi2[nxe:]
    xorg = jnp.zeros((1, 1), jnp.int32)
    wrows = tx + 2 * ext
    plane = ny * nz * dtype.itemsize
    horner = analytic is not None and _sc_series_terms(analytic) is not None
    rt_rows = 4 if horner else 1
    b_arg = b2 if analytic is None else jnp.zeros((1, 1, 1), dtype)
    brows = 4 * tx if analytic is None else 1
    need = (
        nxe + ext + rt_rows + 2 * wrows + 2 * tx + 12 * tx
        + (brows if analytic is None else 0)
    ) * plane
    with jax.enable_x64(False):
        re_o, im2_o, _red = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nxe, ny, nz), dtype),
                jax.ShapeDtypeStruct((2 * nxe, ny, nz), dtype),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nxe, ny, nz), dtype),
                pltpu.VMEM((2 * wrows, ny, nz), dtype),
                pltpu.VMEM((2 * tx, ny, nz), dtype),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.VMEM(
                    (rt_rows, ny, nz) if horner else (1, 1, 1), jnp.float32
                ),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.VMEM(
                    (brows, ny, nz) if analytic is None else (1, 1, 1),
                    dtype,
                ),
                pltpu.SMEM((2, 1), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(re, im2, b_arg, xorg)
    im_final = im2_o[nxe:] if n_steps % 2 == 1 else im2_o[:nxe]
    out = jnp.concatenate([re_o, im_final], axis=0)
    if per_step_norm:
        # the deferred recursion leaves the last step unnormalised (its im'
        # slabs are already in HBM); _red carries that step's ‖ψ‖²
        out = out * jax.lax.rsqrt(
            jnp.maximum(_red[0, 0], jnp.float32(1e-37))
        ).astype(dtype)
    return out


# --------------------------------------------------------------------------- #
# K-step temporal blocking for split-complex ground states
# --------------------------------------------------------------------------- #
#
# The complex 256³ pair exceeds the resident budget, so the streamed split
# kernel gets the same trapezoidal K-fusion as the real kernel
# (ops/pallas_stencil._evolve_kernel_k): K sweeps per HBM pass with
# intermediate rows re-zeroed at the global Dirichlet edges after every
# inner step. Ground states only (no per-step reductions). Single-device
# layout: (2·(NX+2Ke), NY, NZ) with re rows first.


def _pick_tx_k_sc(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                  k_steps: int, analytic_b: bool):
    plane = ny * nz * itemsize
    mid = 2 * (k_steps - 1) * ext
    for tx in (32, 16, 8, 4, 2):
        if nx % tx:
            continue
        need = (
            4 * (tx + 2 * k_steps * ext) * plane   # 2 slots × (re+im) windows
            + 2 * (tx + mid) * plane               # pong (re+im)
            + (0 if analytic_b else 2 * (tx + mid) * plane)
            + 2 * tx * plane                       # single-buffered result
        )
        if need <= _SC_VMEM_BUDGET:
            return tx
    return None


def k_fuse_sc_supported(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                        k_steps: int, analytic_b: bool) -> bool:
    return _pick_tx_k_sc(nx, ny, nz, ext, itemsize, k_steps, analytic_b) is not None


def _evolve_kernel_k_sc(
    psi_hbm,  # (2·(NX+2Ke), NY, NZ) ANY — re rows then im rows
    b_hbm,    # (2·(NX+2(K−1)e), NY, NZ) ANY — (Br, Bi) stacked (stub if analytic)
    out_hbm,  # (2·(NX+2Ke), NY, NZ) ANY
    window,   # (2, 2·(TX+2Ke), NY, NZ) VMEM — double-buffered (re, im) windows
    pong,     # (2·(TX+2(K−1)e), NY, NZ) VMEM — intermediate (re, im)
    b_slab,   # (2·(TX+2(K−1)e), NY, NZ) VMEM
    result,   # (2·TX, NY, NZ) VMEM — single-buffered
    zeros_halo,  # (K·ext, NY, NZ) VMEM
    sem_in,   # DMA (2,)
    sem_b,    # DMA (2,)
    sem_out,
    sem_halo,
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    k_steps: int,
    analytic=None,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    next_slot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
    pad = k_steps * ext
    win = tx + 2 * pad
    mid = tx + 2 * (k_steps - 1) * ext
    nxp = psi_hbm.shape[0] // 2
    ny, nz = psi_hbm.shape[1], psi_hbm.shape[2]

    def in_copies(w, to_slot):
        return [
            pltpu.make_async_copy(
                psi_hbm.at[pl.ds(w * tx, win)],
                window.at[to_slot, pl.ds(0, win)],
                sem_in.at[to_slot],
            ),
            pltpu.make_async_copy(
                psi_hbm.at[pl.ds(jnp.int32(nxp) + w * tx, win)],
                window.at[to_slot, pl.ds(win, win)],
                sem_in.at[to_slot],
            ),
        ]

    @pl.when(i == 0)
    def _first_window():
        for c_ in in_copies(jnp.int32(0), jnp.int32(0)):
            c_.start()

    @pl.when(i + 1 < nprog)
    def _prefetch():
        for c_ in in_copies(i + 1, next_slot):
            c_.start()

    if analytic is None:
        nb = nxp - 2 * ext  # b rows per component: NX + 2(K−1)e
        b_copies = [
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(i * tx, mid)], b_slab.at[pl.ds(0, mid)],
                sem_b.at[0],
            ),
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(jnp.int32(nb) + i * tx, mid)],
                b_slab.at[pl.ds(mid, mid)],
                sem_b.at[1],
            ),
        ]
        for bc in b_copies:
            bc.start()

    @pl.when(i == 0)
    def _zero_lo():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        for row0 in (0, nxp):
            c_ = pltpu.make_async_copy(
                zeros_halo, out_hbm.at[pl.ds(row0, pad)], sem_halo
            )
            c_.start()
            c_.wait()

    @pl.when(i == nprog - 1)
    def _zero_hi():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        for row0 in (nxp - pad, 2 * nxp - pad):
            c_ = pltpu.make_async_copy(
                zeros_halo, out_hbm.at[pl.ds(row0, pad)], sem_halo
            )
            c_.start()
            c_.wait()

    for c_ in in_copies(i, slot):
        c_.wait()
    if analytic is None:
        for bc in b_copies:
            bc.wait()

    def b_pair(rows_out, b_off):
        if analytic is None:
            return (
                b_slab[b_off : b_off + rows_out],
                b_slab[mid + b_off : mid + b_off + rows_out],
            )
        x0 = (i * tx + jnp.int32(b_off - (k_steps - 1) * ext + ext)).astype(
            jnp.float32
        )
        return _analytic_b_sc(analytic, (rows_out, ny, nz), x0, ext, ext)

    def step(read_r, read_i, rows_out, b_off):
        cr_ = read_r(ext, rows_out)
        ci_ = read_i(ext, rows_out)
        acc_r = -center_c * cr_
        acc_i = -center_c * ci_
        for off, cf in zip(offsets, coeffs):
            acc_r = acc_r + cf * (
                read_r(ext + off, rows_out) + read_r(ext - off, rows_out)
            )
            acc_r = acc_r + cf * (_shift_y(cr_, off) + _shift_y(cr_, -off))
            acc_r = acc_r + cf * (_shift_z(cr_, off) + _shift_z(cr_, -off))
            acc_i = acc_i + cf * (
                read_i(ext + off, rows_out) + read_i(ext - off, rows_out)
            )
            acc_i = acc_i + cf * (_shift_y(ci_, off) + _shift_y(ci_, -off))
            acc_i = acc_i + cf * (_shift_z(ci_, off) + _shift_z(ci_, -off))
        br, bi = b_pair(rows_out, b_off)
        ur = 2.0 * cr_ + scale * acc_r
        ui = 2.0 * ci_ + scale * acc_i
        return br * ur - bi * ui - cr_, br * ui + bi * ur - ci_

    for s in range(1, k_steps + 1):
        rows_out = tx + 2 * (k_steps - s) * ext
        b_off = (s - 1) * ext
        if s == 1:
            def read_r(r0, rows, _slot=slot):
                return window[_slot, r0 : r0 + rows]

            def read_i(r0, rows, _slot=slot):
                return window[_slot, win + r0 : win + r0 + rows]
        else:
            _prev_rows = tx + 2 * (k_steps - s + 1) * ext

            def read_r(r0, rows):
                return pong[r0 : r0 + rows]

            def read_i(r0, rows, _pr=_prev_rows):
                return pong[mid + r0 : mid + r0 + rows]
        val_r, val_i = step(read_r, read_i, rows_out, b_off)
        edge = (k_steps - s) * ext
        if s < k_steps:
            pong[:rows_out] = val_r
            pong[mid : mid + rows_out] = val_i
            if edge > 0:
                @pl.when(i == 0)
                def _mask_lo(_rows=rows_out, _edge=edge):
                    pong[0:_edge] = jnp.zeros_like(pong[0:_edge])
                    pong[mid : mid + _edge] = jnp.zeros_like(
                        pong[mid : mid + _edge]
                    )

                @pl.when(i == nprog - 1)
                def _mask_hi(_rows=rows_out, _edge=edge):
                    pong[_rows - _edge : _rows] = jnp.zeros_like(
                        pong[_rows - _edge : _rows]
                    )
                    pong[mid + _rows - _edge : mid + _rows] = jnp.zeros_like(
                        pong[mid + _rows - _edge : mid + _rows]
                    )
        else:
            @pl.when(i >= 1)
            def _drain_prev_out():
                for row0 in (0, nxp):
                    pltpu.make_async_copy(
                        result.at[pl.ds(0 if row0 == 0 else tx, tx)],
                        out_hbm.at[pl.ds(row0 + (i - 1) * tx + pad, tx)],
                        sem_out,
                    ).wait()

            result[0:tx] = val_r
            result[tx : 2 * tx] = val_i

    for row0, r_off in ((0, 0), (nxp, tx)):
        pltpu.make_async_copy(
            result.at[pl.ds(r_off, tx)],
            out_hbm.at[pl.ds(row0 + i * tx + pad, tx)],
            sem_out,
        ).start()

    @pl.when(i == nprog - 1)
    def _drain_tail():
        for row0, r_off in ((0, 0), (nxp, tx)):
            pltpu.make_async_copy(
                result.at[pl.ds(r_off, tx)],
                out_hbm.at[pl.ds(row0 + i * tx + pad, tx)],
                sem_out,
            ).wait()


def to_xpad_k_sc(pr: jnp.ndarray, pi: jnp.ndarray, ext: int,
                 k_steps: int) -> jnp.ndarray:
    """Fully-padded (re, im) → K-layout stacked (2·(NX+2Ke), NY, NZ)."""
    extra = (k_steps - 1) * ext
    xr = to_xpad(pr, ext)
    xi = to_xpad(pi, ext)
    if extra:
        xr = jnp.pad(xr, ((extra, extra), (0, 0), (0, 0)))
        xi = jnp.pad(xi, ((extra, extra), (0, 0), (0, 0)))
    return jnp.concatenate([xr, xi], axis=0)


def from_xpad_k_sc(psi2: jnp.ndarray, ext: int, k_steps: int):
    """K-layout stacked → fully-padded (re, im)."""
    nxp = psi2.shape[0] // 2
    extra = (k_steps - 1) * ext
    xr, xi = psi2[:nxp], psi2[nxp:]
    if extra:
        xr, xi = xr[extra:-extra], xi[extra:-extra]
    pad = ((0, 0), (ext, ext), (ext, ext))
    return jnp.pad(xr, pad), jnp.pad(xi, pad)


@functools.partial(
    jax.jit,
    static_argnames=("order", "scale", "k_steps", "analytic", "interpret"),
)
def evolve_steps_fused_k_sc(
    psi2: jnp.ndarray,
    b2k: Optional[jnp.ndarray],
    order: str,
    scale: float,
    k_steps: int,
    analytic=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """K fused split-complex sweeps in one HBM pass (ground state)."""
    ext = _EXT[order]
    nxp2, ny, nz = psi2.shape
    nxp = nxp2 // 2
    nx = nxp - 2 * k_steps * ext
    dtype = psi2.dtype
    tx = _pick_tx_k_sc(nx, ny, nz, ext, dtype.itemsize, k_steps,
                       analytic is not None)
    if tx is None:
        raise ValueError(
            f"split K={k_steps} fused sweep does not fit VMEM for {ny}x{nz}"
        )
    mid = tx + 2 * (k_steps - 1) * ext
    kernel = functools.partial(
        _evolve_kernel_k_sc,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        k_steps=k_steps,
        analytic=analytic,
    )
    if b2k is None:
        b2k = jnp.zeros((1, 1, 1), dtype)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(nx // tx,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nxp2, ny, nz), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, 2 * (tx + 2 * k_steps * ext), ny, nz), dtype),
                pltpu.VMEM((2 * mid, ny, nz), dtype),
                pltpu.VMEM(
                    (2 * mid if analytic is None else 1, ny, nz), dtype
                ),
                pltpu.VMEM((2 * tx, ny, nz), dtype),
                pltpu.VMEM((k_steps * ext, ny, nz), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            # Mosaic's scoped accounting for the split-kernel family runs
            # well above the raw scratch sum (measured 60.2 MiB scoped for
            # a 37 MiB raw K=2 tile at 256³) — size the limit accordingly
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(2.2 * _SC_VMEM_BUDGET)
            ),
        )(psi2, b2k)


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "dt", "dn", "mass", "n_steps", "k_steps", "analytic",
        "interpret",
    ),
)
def evolve_chunk_fused_k_sc(
    psi2_k: jnp.ndarray,
    b2k: Optional[jnp.ndarray],
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    k_steps: int,
    analytic=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Ground-state split-complex chunk via K-step fused sweeps; remainder
    steps run as in-chunk 1-step fused sweeps (exact n_steps cadence)."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    ext = _EXT[order]

    def body(_i, p):
        return evolve_steps_fused_k_sc(
            p, b2k, order, scale, k_steps, analytic, interpret
        )

    psi2_k = jax.lax.fori_loop(0, n_steps // k_steps, body, psi2_k)
    rem = n_steps % k_steps
    if rem:
        extra = (k_steps - 1) * ext
        nxp = psi2_k.shape[0] // 2
        xr, xi = psi2_k[:nxp], psi2_k[nxp:]
        if extra:
            xr, xi = xr[extra:-extra], xi[extra:-extra]
        p1 = jnp.concatenate([xr, xi], axis=0)
        nb = nxp - 2 * ext
        if b2k is not None and extra:
            b1 = jnp.concatenate(
                [b2k[extra : nb - extra], b2k[nb + extra : 2 * nb - extra]],
                axis=0,
            )
        else:
            b1 = b2k
        for _ in range(rem):
            p1, _n2, _ov = evolve_step_fused_sc(
                p1, b1, None, order, scale, 0, False, interpret,
                analytic=analytic,
            )
        if extra:
            nx1 = p1.shape[0] // 2
            xr, xi = p1[:nx1], p1[nx1:]
            pad = ((extra, extra), (0, 0), (0, 0))
            psi2_k = jnp.concatenate(
                [jnp.pad(xr, pad), jnp.pad(xi, pad)], axis=0
            )
        else:
            psi2_k = p1
    return psi2_k


# --------------------------------------------------------------------------- #
# Multi-axis-mesh split kernel: y/z-padded local blocks (the split-complex
# counterpart of pallas_stencil._evolve_kernel_yzp). The (re, im) pair rides
# the x-concatenated layout of _evolve_kernel_sc; y/z alignment pads carry
# exchanged neighbour rows (or zeros at global edges), refreshed by the
# sharded caller each step. With zp == 0 (z axis unsharded) the kernel keeps
# the global z Dirichlet in-register — no 128-lane pads. The reference has
# no counterpart (complex potentials are real stubs, src/potential.rs:222,271
# and no distribution layer, src/grid.rs:551).
# --------------------------------------------------------------------------- #


def _pick_tx_sc_yzp(bx: int, byp: int, bzp: int, by: int, bz: int, ext: int,
                    itemsize: int, n_lower: int, analytic_b: bool = False):
    plane = byp * bzp * itemsize
    iplane = by * bz * itemsize
    for tx in (32, 16, 8, 4, 2, 1):
        if bx % tx:
            continue
        need = (
            2 * 2 * (tx + 2 * ext) * plane      # re+im windows, double-buffered
            + 2 * tx * iplane                    # result (re+im, single-buffered)
            + (0 if analytic_b else 2 * tx * iplane)  # Br+Bi chunk
            + n_lower * 2 * (tx + 2 * ext) * plane    # lower re+im windows
        )
        if need <= _SC_VMEM_BUDGET:
            return tx
    return None


def step_fused_sc_yzp_supported(bx: int, by: int, bz: int, ext: int,
                                itemsize: int, n_lower: int,
                                zp: int = _pk._YZP_ZPAD) -> bool:
    byp = by + 2 * _pk._YZP_YPAD
    bzp = bz + 2 * zp
    return (
        by % 8 == 0
        and bz % 128 == 0
        and bx >= ext
        and _pick_tx_sc_yzp(bx, byp, bzp, by, bz, ext, itemsize, n_lower)
        is not None
    )


def _evolve_kernel_sc_yzp(
    psi_hbm,    # (2·BXP, BYP, BZP) ANY — re rows [0, BXP), im rows [BXP, …)
    b_hbm,      # (2·BX, BYP, BZP) ANY — (Br, Bi); pads unread (stub if analytic)
    store_hbm,  # (S·2·BXP, BYP, BZP) ANY
    coef_smem,  # (1+2S, 1) SMEM: [inv, cr_0, ci_0, …]
    org_smem,   # (3, 1) SMEM i32 — shard's global interior (x, y, z) origin
    out_hbm,    # (2·BXP, BYP, BZP) ANY — interiors + zeroed x-halos written;
    # y/z pads left unwritten (the caller refreshes the ext rows read)
    norm_out,   # (1, 1) SMEM
    over_out,   # (2S, 1) SMEM
    slab,       # (2, 2·(TX+2e), BYP, BZP) VMEM — re window rows first
    b_slab,     # (2·TX, BY, BZ) VMEM
    result,     # (2·TX, BY, BZ) VMEM — single-buffered
    lower_slab,  # (S·2·(TX+2e), BYP, BZP) VMEM
    zeros_xhalo,  # (ext, BYP, BZP) VMEM
    sem_in,     # DMA (2,)
    sem_b,
    sem_lower,  # DMA (S,)
    sem_out,
    sem_halo,
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    by: int,
    bz: int,
    n_lower: int,
    with_norm: bool,
    analytic=None,
    zp: int = _pk._YZP_ZPAD,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    next_slot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
    win = tx + 2 * ext
    yp = _pk._YZP_YPAD
    byp = by + 2 * yp
    bzp = bz + 2 * zp
    bxp = psi_hbm.shape[0] // 2
    bx = bxp - 2 * ext

    def in_copies(window, to_slot):
        return [
            pltpu.make_async_copy(
                psi_hbm.at[pl.ds(window * tx, win)],
                slab.at[to_slot, pl.ds(0, win)],
                sem_in.at[to_slot],
            ),
            pltpu.make_async_copy(
                psi_hbm.at[pl.ds(jnp.int32(bxp) + window * tx, win)],
                slab.at[to_slot, pl.ds(win, win)],
                sem_in.at[to_slot],
            ),
        ]

    @pl.when(i == 0)
    def _first_window():
        for c_ in in_copies(jnp.int32(0), jnp.int32(0)):
            c_.start()

    @pl.when(i + 1 < nprog)
    def _prefetch():
        for c_ in in_copies(i + 1, next_slot):
            c_.start()

    if analytic is None:
        b_copies = [
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(i * tx, tx), pl.ds(yp, by), pl.ds(zp, bz)],
                b_slab.at[pl.ds(0, tx)],
                sem_b,
            ),
            pltpu.make_async_copy(
                b_hbm.at[
                    pl.ds(jnp.int32(bx) + i * tx, tx), pl.ds(yp, by),
                    pl.ds(zp, bz),
                ],
                b_slab.at[pl.ds(tx, tx)],
                sem_b,
            ),
        ]
        for bc in b_copies:
            bc.start()

    lower_copies = []
    for s_idx in range(2 * n_lower):  # re/im blocks of each stored state
        lc = pltpu.make_async_copy(
            store_hbm.at[pl.ds(jnp.int32(s_idx * bxp) + i * tx, win)],
            lower_slab.at[pl.ds(jnp.int32(s_idx * win), win)],
            sem_lower.at[jnp.int32(s_idx // 2)],
        )
        lc.start()
        lower_copies.append(lc)

    # x-halo rows of the output (re lo/hi, im lo/hi): zeroed unconditionally —
    # the sharded caller refreshes them from neighbours each step; at global
    # edges the zeros ARE the Dirichlet condition
    @pl.when(i == 0)
    def _zero_xlo():
        zeros_xhalo[...] = jnp.zeros_like(zeros_xhalo)
        for row0 in (0, bxp):
            hc = pltpu.make_async_copy(
                zeros_xhalo, out_hbm.at[pl.ds(row0, ext)], sem_halo
            )
            hc.start()
            hc.wait()

    @pl.when(i == nprog - 1)
    def _zero_xhi():
        zeros_xhalo[...] = jnp.zeros_like(zeros_xhalo)
        for row0 in (bxp - ext, 2 * bxp - ext):
            hc = pltpu.make_async_copy(
                zeros_xhalo, out_hbm.at[pl.ds(row0, ext)], sem_halo
            )
            hc.start()
            hc.wait()

    for c_ in in_copies(i, slot):
        c_.wait()

    if n_lower > 0 or with_norm:
        for lc in lower_copies:
            lc.wait()
        inv = coef_smem[0, 0]
        win_r = slab[slot, 0:win] * inv
        win_i = slab[slot, win : 2 * win] * inv
        for s_idx in range(n_lower):
            crc = coef_smem[1 + 2 * s_idx, 0]
            cic = coef_smem[2 + 2 * s_idx, 0]
            lr = lower_slab[(2 * s_idx) * win : (2 * s_idx + 1) * win]
            li = lower_slab[(2 * s_idx + 1) * win : (2 * s_idx + 2) * win]
            win_r = win_r - (crc * lr - cic * li)
            win_i = win_i - (crc * li + cic * lr)
    else:
        win_r = slab[slot, 0:win]
        win_i = slab[slot, win : 2 * win]

    def center(w, x0):
        return w[x0 : x0 + tx, yp : yp + by, zp : zp + bz]

    cr_w = win_r[ext : ext + tx]  # full padded cross-section (rolled taps)
    ci_w = win_i[ext : ext + tx]
    c_r = center(win_r, ext)
    c_i = center(win_i, ext)
    acc_r = -center_c * c_r
    acc_i = -center_c * c_i
    for off, cf in zip(offsets, coeffs):
        acc_r = acc_r + cf * (center(win_r, ext + off) + center(win_r, ext - off))
        acc_i = acc_i + cf * (center(win_i, ext + off) + center(win_i, ext - off))
        # y taps read the exchanged pad rows via aligned rolls
        acc_r = acc_r + cf * (
            pltpu.roll(cr_w, byp - off, 1)[:, yp : yp + by, zp : zp + bz]
            + pltpu.roll(cr_w, off, 1)[:, yp : yp + by, zp : zp + bz]
        )
        acc_i = acc_i + cf * (
            pltpu.roll(ci_w, byp - off, 1)[:, yp : yp + by, zp : zp + bz]
            + pltpu.roll(ci_w, off, 1)[:, yp : yp + by, zp : zp + bz]
        )
        if zp > 0:
            acc_r = acc_r + cf * (
                pltpu.roll(cr_w, bzp - off, 2)[:, yp : yp + by, zp : zp + bz]
                + pltpu.roll(cr_w, off, 2)[:, yp : yp + by, zp : zp + bz]
            )
            acc_i = acc_i + cf * (
                pltpu.roll(ci_w, bzp - off, 2)[:, yp : yp + by, zp : zp + bz]
                + pltpu.roll(ci_w, off, 2)[:, yp : yp + by, zp : zp + bz]
            )
        else:
            acc_r = acc_r + cf * (
                _shift_z(cr_w, off) + _shift_z(cr_w, -off)
            )[:, yp : yp + by, :]
            acc_i = acc_i + cf * (
                _shift_z(ci_w, off) + _shift_z(ci_w, -off)
            )[:, yp : yp + by, :]

    if analytic is None:
        for bc in b_copies:
            bc.wait()
        br = b_slab[0:tx]
        bi = b_slab[tx : 2 * tx]
    else:
        x0 = (i * tx + jnp.int32(ext) + org_smem[0, 0]).astype(jnp.float32)
        y0 = (jnp.int32(ext) + org_smem[1, 0]).astype(jnp.float32)
        z0 = (jnp.int32(ext) + org_smem[2, 0]).astype(jnp.float32)
        br, bi = _analytic_b_sc(analytic, (tx, by, bz), x0, y0, z0)
    # factored complex update (see _evolve_kernel_sc)
    ur = 2.0 * c_r + scale * acc_r
    ui = 2.0 * c_i + scale * acc_i
    new_r = br * ur - bi * ui - c_r
    new_i = br * ui + bi * ur - c_i

    @pl.when(i >= 1)
    def _drain_prev_out():
        for row0 in (0, tx):
            pltpu.make_async_copy(
                result.at[pl.ds(row0, tx)],
                out_hbm.at[
                    pl.ds(
                        (jnp.int32(0) if row0 == 0 else jnp.int32(bxp))
                        + (i - 1) * tx + ext,
                        tx,
                    ),
                    pl.ds(yp, by),
                    pl.ds(zp, bz),
                ],
                sem_out,
            ).wait()

    result[0:tx] = new_r
    result[tx : 2 * tx] = new_i

    def out_copies(x_idx):
        return [
            pltpu.make_async_copy(
                result.at[pl.ds(0, tx)],
                out_hbm.at[pl.ds(x_idx * tx + ext, tx), pl.ds(yp, by),
                           pl.ds(zp, bz)],
                sem_out,
            ),
            pltpu.make_async_copy(
                result.at[pl.ds(tx, tx)],
                out_hbm.at[
                    pl.ds(jnp.int32(bxp) + x_idx * tx + ext, tx),
                    pl.ds(yp, by), pl.ds(zp, bz),
                ],
                sem_out,
            ),
        ]

    for oc in out_copies(i):
        oc.start()

    if with_norm or n_lower > 0:
        @pl.when(i == 0)
        def _init():
            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)
            for s in range(2 * n_lower):
                over_out[s, 0] = jnp.zeros((), over_out.dtype)

        norm_out[0, 0] += jnp.sum(new_r * new_r) + jnp.sum(new_i * new_i)
    for s_idx in range(n_lower):
        lr = lower_slab[
            (2 * s_idx) * win + ext : (2 * s_idx) * win + ext + tx,
            yp : yp + by,
            zp : zp + bz,
        ]
        li = lower_slab[
            (2 * s_idx + 1) * win + ext : (2 * s_idx + 1) * win + ext + tx,
            yp : yp + by,
            zp : zp + bz,
        ]
        over_out[2 * s_idx, 0] += jnp.sum(lr * new_r) + jnp.sum(li * new_i)
        over_out[2 * s_idx + 1, 0] += jnp.sum(lr * new_i) - jnp.sum(li * new_r)

    @pl.when(i == nprog - 1)
    def _drain_tail():
        for oc in out_copies(i):
            oc.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "scale", "n_lower", "with_norm", "interpret", "analytic",
        "zp",
    ),
)
def evolve_step_fused_sc_yzp(
    psi2_pad3: jnp.ndarray,
    b2_pad3: Optional[jnp.ndarray],
    store2_pad3: Optional[jnp.ndarray],
    order: str,
    scale: float,
    n_lower: int = 0,
    with_norm: bool = True,
    interpret: bool = False,
    coef: Optional[jnp.ndarray] = None,
    analytic=None,
    origin=None,
    zp: int = _pk._YZP_ZPAD,
):
    """One fused split-complex sweep on a y/z-padded local block.

    Args:
      psi2_pad3: (2·(BX+2e), BY+16, BZ+2·zp) — x-concatenated (re, im),
        each x-padded by ext and y/z padded by the alignment pads; the
        innermost ext pad rows hold neighbour data (or zeros at global
        edges), refreshed by the caller per step.
      b2_pad3: (2·BX, BY+16, BZ+2·zp) stacked (Br, Bi) interior rows in the
        same y/z-padded layout (pads unread), or None with ``analytic``.
      store2_pad3: (S, 2·(BX+2e), BY+16, BZ+2·zp) stored pairs, halos/pads
        filled like ψ's.
      coef: (1+2S, 1) [inv, cr_0, ci_0, …] affine correction.
      origin: (3, 1) i32 global interior (x, y, z) origin of this shard.

    Returns:
      (ψ'2_pad3, norm2, overlaps[2S]) — y/z pads of ψ' unwritten (the
      caller must refresh before the next read); reductions cover the
      interior block only.
    """
    ext = _EXT[order]
    bxp2, byp, bzp = psi2_pad3.shape
    bxp = bxp2 // 2
    bx = bxp - 2 * ext
    by = byp - 2 * _pk._YZP_YPAD
    bz = bzp - 2 * zp
    dtype = psi2_pad3.dtype
    tx = _pick_tx_sc_yzp(bx, byp, bzp, by, bz, ext, dtype.itemsize, n_lower,
                         analytic is not None)
    if tx is None:
        raise ValueError(
            f"y/z-padded split sweep does not fit VMEM for block {by}x{bz}"
        )
    if b2_pad3 is None:
        assert analytic is not None
        b2_pad3 = jnp.zeros((2, 1, 1), dtype=dtype)
    if store2_pad3 is None or n_lower == 0:
        store2_pad3 = jnp.zeros((1, 2 * bxp, byp, bzp), dtype=dtype)
    n_store = store2_pad3.shape[0]
    store_flat = store2_pad3.reshape(n_store * 2 * bxp, byp, bzp)
    if coef is None:
        coef = jnp.concatenate(
            [jnp.ones((1, 1), dtype), jnp.zeros((2 * n_store, 1), dtype)]
        )
    if origin is None:
        origin = jnp.zeros((3, 1), jnp.int32)
    else:
        origin = jnp.asarray(origin, jnp.int32).reshape(3, 1)

    kernel = functools.partial(
        _evolve_kernel_sc_yzp,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        by=by,
        bz=bz,
        n_lower=n_lower,
        with_norm=with_norm,
        analytic=analytic,
        zp=zp,
    )
    win = tx + 2 * ext
    b_slab_shape = (1, 8, 128) if analytic is not None else (2 * tx, by, bz)
    with jax.enable_x64(False):
        out2, norm2, overlaps = pl.pallas_call(
            kernel,
            grid=(bx // tx,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2 * bxp, byp, bzp), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
                jax.ShapeDtypeStruct((2 * n_store, 1), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 2 * win, byp, bzp), dtype),
                pltpu.VMEM(b_slab_shape, dtype),
                pltpu.VMEM((2 * tx, by, bz), dtype),
                pltpu.VMEM(
                    (n_store * 2 * win, byp, bzp) if n_lower > 0
                    else (1, 1, 128),
                    dtype,
                ),
                pltpu.VMEM((ext, byp, bzp), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((max(n_store, 1),)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(psi2_pad3, b2_pad3, store_flat, coef, origin)
    return out2, norm2[0, 0], overlaps[: 2 * (n_lower or 1), 0]
