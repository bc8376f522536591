"""Fused Pallas stencil kernel — the TPU-native hot loop.

Replaces the XLA shifted-slice sweep (ops/stencil.py) with a hand-scheduled
kernel that streams X-slabs of the grid HBM→VMEM and fuses, in one pass:

    ψ' = A∘ψ + B·(dt/(k·dn²·m))·(Σ cᵢ·ψ(shifts) − c₀·ψ)
    [optional] norm² partial    Σ ψ'²
    [optional] overlap partials Σ lowerₛ·ψ'   (Gram-Schmidt, per stored state)

This is the counterpart of the reference's per-cell-window rayon sweep
(src/grid.rs:544-687) plus the norm/overlap reductions it runs as separate
array passes (src/grid.rs:674-681) — here the reductions ride along with the
update for free (the sweep is HBM-bandwidth-bound; the reduction inputs are
already in VMEM).

Layout: arrays are padded by ``ext`` along **X only** — the leading axis has
no TPU tiling constraint, so (N+2e, N, N) keeps the last two dims perfectly
lane/sublane-aligned (a fully padded (N+2e)³ array would waste ~1.5× HBM
bandwidth on 258-lane rows). The X halo rows hold the Dirichlet zeros and
stay zero; Y/Z Dirichlet boundaries are applied by zero-filled in-register
shifts.

ψ slabs overlap by 2·ext rows (a window BlockSpec cannot express), so ψ and
the output use manual async DMA; A and B ride the automatic BlockSpec
pipeline.

Excited-state Gram-Schmidt note: the fused path measures all overlaps in the
same pass and projects them *jointly* (classical GS), while the reference
projects sequentially (modified GS, src/grid.rs:477-492). For one stored
state they are identical; for several, stored states are mutually orthogonal
to convergence tolerance, making the difference O(ε²) — covered by an
equivalence test with tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wafer_tpu import geometry

_EXT = {"ThreePoint": 1, "FivePoint": 2, "SevenPoint": 3}


def _analytic_v(analytic, shp, x0, y0, z0):
    """Raw V (unshifted) from padded-grid coordinates — see _analytic_b."""
    return _analytic_b(analytic, shp, x0, y0, z0, _raw_v=True)


def _analytic_yz(analytic, ny, nz, y0, z0):
    """Per-program precomputable (ny, nz) part of the analytic potential:
    the stencil rows share their y/z coordinates, so only the x term varies
    per row. Radial kinds return dy²+dz²; Periodic returns sin²y·sin²z."""
    kind, _dn, _dt, _mass, _ngx, ngy, ngz = analytic[:7]
    f32 = jnp.float32
    dy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0).astype(f32) + (
        y0 - (ngy + 1.0) / 2.0
    )
    dz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1).astype(f32) + (
        z0 - (ngz + 1.0) / 2.0
    )
    if kind == "Periodic":
        py = dy + (ngy + 1.0) / 2.0
        pz = dz + (ngz + 1.0) / 2.0
        two_pi = 2.0 * 3.14159265358979323846
        sy = jnp.sin(two_pi * (py - 1.0) / (ngy - 1.0)) ** 2
        sz = jnp.sin(two_pi * (pz - 1.0) / (ngz - 1.0)) ** 2
        return sy * sz
    return dy * dy + dz * dz


def _analytic_b(analytic, shp, x0, y0, z0, _raw_v: bool = False, yz=None):
    """B = 1/(1 + dt·V/2) computed from padded-grid coordinates.

    ``analytic`` = (kind, dn, dt, mass, ngx, ngy, ngz[, sig[, vshift]]);
    ``x0/y0/z0`` are the padded coordinates of element (0,0,0) of ``shp``
    (x0 may be traced; y0/z0 static). Eliminates the B HBM stream for
    formula potentials (V evaluated on padded indices, matching
    models/potentials.generate and src/potential.rs:46-62). ``vshift`` is
    the energy-gauge shift also baked into the array factors (see
    models/potentials.build_ab) — it must match them so the array-B and
    analytic-B paths produce identical trajectories. ``yz`` is the
    :func:`_analytic_yz` precompute (built here when absent); kernels with
    several B evaluations per program hoist it."""
    kind, dn, dt_, _mass, ngx, ngy, ngz = analytic[:7]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    f32 = jnp.float32
    # tpu.iota is integer-only: generate i32, convert to f32
    dx = jax.lax.broadcasted_iota(jnp.int32, shp, 0).astype(f32) + (
        x0 - (ngx + 1.0) / 2.0
    )
    if yz is None:
        yz = _analytic_yz(analytic, shp[1], shp[2], y0, z0)
    yz = yz[None, :, :]
    if kind == "Periodic":
        # sin² products on (idx−1)/(N−1) padded coords
        # (src/potential.rs:212-219); coordinate grids reused as indices
        px = dx + (ngx + 1.0) / 2.0
        two_pi = 2.0 * 3.14159265358979323846
        sx = jnp.sin(two_pi * (px - 1.0) / (ngx - 1.0)) ** 2
        v = 1.0 - sx * yz
    else:
        r2 = dx * dx + yz
        if kind == "NoPotential":
            v = jnp.zeros(shp, f32)
        elif kind == "Harmonic":
            v = (0.5 * dn * dn) * r2
        elif kind == "Coulomb":
            r = dn * jnp.sqrt(r2)
            r_safe = jnp.maximum(r, dn)
            v = jnp.where(r < dn, -1.0 / dn, -1.0 / r_safe)
        elif kind == "SimpleCornell":
            # GeV units (src/potential.rs:241-249); sig = string tension
            sig = analytic[7]
            r = dn * jnp.sqrt(r2)
            r_safe = jnp.maximum(r, dn)
            far = -0.5 * (4.0 / 3.0) / r_safe + sig * r_safe + 4.0 * _mass
            v = jnp.where(r < dn, 4.0 * _mass, far)
        else:  # pragma: no cover
            raise ValueError(f"unsupported analytic potential {kind}")
    if _raw_v:
        return v
    return 1.0 / (1.0 + (0.5 * dt_) * (v - vshift))


def _shift_y(c: jnp.ndarray, off: int) -> jnp.ndarray:
    """Center block shifted along y with Dirichlet zero fill."""
    tx, ny, nz = c.shape
    z = jnp.zeros((tx, abs(off), nz), dtype=c.dtype)
    if off > 0:
        return jnp.concatenate([c[:, off:, :], z], axis=1)
    return jnp.concatenate([z, c[:, :off, :]], axis=1)


def _shift_z(c: jnp.ndarray, off: int) -> jnp.ndarray:
    tx, ny, nz = c.shape
    z = jnp.zeros((tx, ny, abs(off)), dtype=c.dtype)
    if off > 0:
        return jnp.concatenate([c[:, :, off:], z], axis=2)
    return jnp.concatenate([z, c[:, :, :off]], axis=2)


def _lag_xm(lag, buf, lo, txs, off, ext):
    """Pre-update x−off window rows [rs−off, rs+txs−off) for one slab of an
    in-place sweep.

    The first min(off, txs) rows come from the lag buffer (copies of the
    ext rows just below the slab, saved before they were overwritten); the
    rest are the slab's own not-yet-swept rows starting at buf row ``lo``.
    Remainder slabs shorter than the tap offset (txs ≤ off — reachable at
    ext ≥ 2 with an explicit tx; the pickers avoid it) live entirely inside
    the lag buffer, and branching here avoids a zero-row concat operand.
    """
    if txs > off:
        return jnp.concatenate(
            [lag[ext - off : ext], buf[lo : lo + txs - off]], axis=0
        )
    return lag[ext - off : ext - off + txs]


def _evolve_kernel(
    # inputs
    phi_hbm,  # (NX+2e, NY, NZ) ANY — manual overlapping-window DMA
    b_blk,  # (TX, NY, NZ) VMEM (pipelined); A is derived as 2B − 1
    store_hbm,  # (S·(NX+2e), NY, NZ) ANY — stored states concatenated along
    # x (rank-3: rank-4 refs break Mosaic's (sublane, lane) tiling on DMA)
    coef_smem,  # (1+S, 1) SMEM: [inv_norm, corr_0..corr_{S-1}] from the
    # previous step — the normalise+project update is applied as an affine
    # correction of the input window, saving the separate XLA pass
    xorg_smem,  # (1, 1) SMEM i32: global x offset of this block's interior
    # (non-zero under shard_map, where the shard origin is traced)
    # outputs
    out_hbm,  # (NX+2e, NY, NZ) ANY — manual DMA out
    norm_out,  # (1, 1) SMEM
    over_out,  # (S, 1) SMEM
    # scratch
    slab,  # (2, TX+2e, NY, NZ) VMEM — double-buffered ψ windows
    result,  # (TX, NY, NZ) VMEM — single-buffered (drained just before the
    # next program overwrites it; frees VMEM for a taller slab)
    lower_slab,  # (S·(TX+2e), NY, NZ) VMEM — lower-state windows
    zeros_halo,  # (ext, NY, NZ) VMEM
    sem_in,  # DMA (2,)
    sem_lower,
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
    win_rows = tx + 2 * ext

    def in_copy(window, to_slot):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(window * tx, win_rows)],
            slab.at[to_slot],
            sem_in.at[to_slot],
        )

    # prologue: program 0 kicks off its own window
    @pl.when(i == 0)
    def _first_window():
        in_copy(jnp.int32(0), jnp.int32(0)).start()

    # prefetch the next window while this one computes
    @pl.when(i + 1 < nprog)
    def _prefetch():
        in_copy(i + 1, next_slot).start()

    nxp_rows = phi_hbm.shape[0]
    if n_lower > 0:
        lower_copies = []
        for s_idx in range(n_lower):
            lc = pltpu.make_async_copy(
                store_hbm.at[pl.ds(jnp.int32(s_idx * nxp_rows) + i * tx, win_rows)],
                lower_slab.at[pl.ds(jnp.int32(s_idx * win_rows), win_rows)],
                sem_lower.at[jnp.int32(s_idx)],
            )
            lc.start()
            lower_copies.append(lc)

    # keep the output's Dirichlet halo rows zero
    @pl.when(i == 0)
    def _zero_lo():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        halo_copy = pltpu.make_async_copy(
            zeros_halo, out_hbm.at[pl.ds(0, ext)], sem_halo
        )
        halo_copy.start()
        halo_copy.wait()

    @pl.when(i == nprog - 1)
    def _zero_hi():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        nxp = out_hbm.shape[0]
        halo_copy = pltpu.make_async_copy(
            zeros_halo, out_hbm.at[pl.ds(nxp - ext, ext)], sem_halo
        )
        halo_copy.start()
        halo_copy.wait()

    in_copy(i, slot).wait()

    if n_lower > 0 or with_norm:
        # affine correction from the previous step's reductions:
        # ψ̃ = inv·ψ − Σ corrₛ·lowerₛ (normalise-then-project, applied lazily
        # so the whole update stays one HBM pass per step). The ground-state
        # per-step-norm mode (with_norm, n_lower=0) carries only the inverse
        # norm.
        if n_lower > 0:
            for lc in lower_copies:
                lc.wait()
        win = slab[slot] * coef_smem[0, 0]
        for s_idx in range(n_lower):
            # stored-state windows may stream in bf16 (half the HBM
            # bytes); compute stays in the ψ dtype
            win = win - coef_smem[s_idx + 1, 0] * lower_slab[
                s_idx * win_rows : (s_idx + 1) * win_rows
            ].astype(win.dtype)
        def read(row0, rows):
            return win[row0 : row0 + rows]
    else:
        def read(row0, rows):
            return slab[slot, row0 : row0 + rows]

    c = read(ext, tx)
    acc = -center_c * c
    for off, cf in zip(offsets, coeffs):
        acc += cf * (read(ext + off, tx) + read(ext - off, tx))
        acc += cf * (_shift_y(c, off) + _shift_y(c, -off))
        acc += cf * (_shift_z(c, off) + _shift_z(c, -off))

    # A = (1−dt·V/2)/(1+dt·V/2) = 2B − 1, so the A array is never read:
    # one full HBM stream saved per step (≈22% of sweep traffic). With an
    # analytic potential B is computed from coordinates — no B stream at all.
    if analytic is None:
        b = b_blk[:]
    else:
        x0 = (i * tx + jnp.int32(ext) + xorg_smem[0, 0]).astype(jnp.float32)
        b = _analytic_b(
            analytic, (tx, phi_hbm.shape[1], phi_hbm.shape[2]), x0, ext, ext
        )
    # factored update: b·(2c + s·acc) − c == 2(bc) − c + b·s·acc, one fewer
    # vector multiply
    new = b * (2.0 * c + scale * acc) - c

    # single-buffered result: drain the previous program's out-DMA (issued
    # one full compute phase ago) just before overwriting
    @pl.when(i >= 1)
    def _drain_prev_out():
        pltpu.make_async_copy(
            result, out_hbm.at[pl.ds((i - 1) * tx + ext, tx)], sem_out
        ).wait()

    result[...] = new

    pltpu.make_async_copy(
        result, out_hbm.at[pl.ds(i * tx + ext, tx)], sem_out
    ).start()

    # fused reductions (TPU grid runs sequentially → SMEM accumulation is ok)
    if with_norm or n_lower > 0:
        @pl.when(i == 0)
        def _init():
            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)
            for s in range(n_lower):
                over_out[s, 0] = jnp.zeros((), over_out.dtype)

        norm_out[0, 0] += jnp.sum(new * new)
    if n_lower > 0:
        for s_idx in range(n_lower):
            over_out[s_idx, 0] += jnp.sum(
                lower_slab[
                    s_idx * win_rows + ext : s_idx * win_rows + ext + tx
                ].astype(new.dtype)
                * new
            )

    # epilogue: drain the in-flight out-DMA (nprog is static)
    @pl.when(i == nprog - 1)
    def _drain_tail():
        pltpu.make_async_copy(
            result, out_hbm.at[pl.ds(i * tx + ext, tx)], sem_out
        ).wait()


# Slab-height budget for the kernel pickers. Mosaic's DEFAULT scoped-VMEM
# limit is 16 MiB, but v5e hardware has 128 MiB — pallas_calls raise it via
# compiler_params. Measured trade-off (256³ K=2): the limit itself taxes
# throughput (the compiler reserves VMEM the pipeline otherwise uses):
# no param/tx8 7.89e10, limit 100 MiB/tx32 6.25e10, but limit 32 MiB/tx16
# is the sweet spot at 8.25e10 — so the default budget/limit sit there.
# Env overrides for experiments: WAFER_VMEM_BUDGET_MB / WAFER_VMEM_LIMIT_MB
# (limit 0 → no compiler param, Mosaic default 16 MiB).
import os as _os

_VMEM_BUDGET = int(_os.environ.get("WAFER_VMEM_BUDGET_MB", "24")) * 1024 * 1024
_VMEM_LIMIT_BYTES = int(_os.environ.get("WAFER_VMEM_LIMIT_MB", "32")) * 1024 * 1024
# Second tier for big-plane K-fusion: at 512³ the K=2 window needs ~42 MiB —
# the limit tax at 64 MiB is far outweighed by halving the HBM passes
# (measured: 6.34e10 vs 2.99e10 for the tier-1 1-step path).
_VMEM_BUDGET_T2 = int(_os.environ.get("WAFER_VMEM_BUDGET_T2_MB", "48")) * 1024 * 1024
_VMEM_LIMIT_T2 = int(_os.environ.get("WAFER_VMEM_LIMIT_T2_MB", "64")) * 1024 * 1024


def _compiler_params(need_bytes: int = 0):
    """Compiler params for a kernel whose raw scratch need is known: tier-1
    tiles get the low-tax 32 MiB limit; bigger tiles the 64 MiB tier."""
    if need_bytes > _VMEM_BUDGET:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_T2)
    if _VMEM_LIMIT_BYTES <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _need_k(tx: int, ny: int, nz: int, ext: int, itemsize: int, k_steps: int,
            analytic_b: bool) -> int:
    plane = ny * nz * itemsize
    return (
        2 * (tx + 2 * k_steps * ext) * plane
        + (tx + 2 * (k_steps - 1) * ext) * plane
        + (0 if analytic_b else (tx + 2 * (k_steps - 1) * ext) * plane)
        + tx * plane
    )


def _pick_tx(nx: int, ny: int, nz: int, ext: int, itemsize: int, n_lower: int,
             analytic_b: bool = False):
    """Largest slab height that fits the VMEM budget and divides NX, or
    None when nothing fits (caller falls back to the XLA sweep)."""
    plane = ny * nz * itemsize
    for tx in (64, 32, 16, 8, 4, 2, 1):
        if nx % tx:
            continue
        # 2× ψ windows + single result + double-buffered b + lower windows
        need = (
            2 * (tx + 2 * ext) * plane
            + tx * plane
            + (0 if analytic_b else 2 * tx * plane)
            + n_lower * (tx + 2 * ext) * plane
        )
        if need <= _VMEM_BUDGET:
            return tx
    return None


def step_fused_supported(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                         n_lower: int) -> bool:
    return (
        _pick_tx(nx, ny, nz, ext, itemsize, n_lower) is not None
        or _pick_tx_yt(nx, ny, nz, ext, itemsize, n_lower) is not None
        or _pick_tx_zt(nx, ny, nz, ext, itemsize, n_lower) is not None
    )


# --------------------------------------------------------------------------- #
# z-tiled variant: planes too large for VMEM (≥512² f32) stream in z-chunks
# --------------------------------------------------------------------------- #
#
# Each x-program statically unrolls over z-chunks, so every chunk's edge
# handling (global Dirichlet pads at the first/last chunk, DMA widths) is
# compile-time. The ψ/lower windows overlap by ext in BOTH x and z.
#
# Lane alignment: Mosaic cannot mix vector operands with different lane
# phases ("offset mismatch on non-concat dimension"), so the window is
# placed at an aligned base (ZPAD = 128) inside the slab and z-shifts are
# computed with pltpu.roll on aligned full-extent reads — every vector slice
# in the kernel then starts at a lane-tile boundary with a 128-multiple
# width.


_ZPAD = 128  # aligned window base inside the z-tiled slab


def _pick_tx_zt(nx: int, ny: int, nz: int, ext: int, itemsize: int, n_lower: int,
                analytic_b: bool = False):
    """(tx, tz) for the z-tiled kernel, or None. tz must be a lane-tile
    multiple; the slab carries 2·ZPAD extra lanes for the aligned window."""
    for tz in (256, 128):
        if nz % tz or nz // tz < 2:
            continue
        pcz = ny * (tz + 2 * _ZPAD) * itemsize
        pc = ny * tz * itemsize
        for tx in (32, 16, 8, 4, 2, 1):
            if nx % tx:
                continue
            need = (
                2 * (tx + 2 * ext) * pcz      # ψ windows (double-buffered)
                + (0 if analytic_b else tx * pc)  # b chunk
                + tx * pc                      # result (single-buffered)
                + n_lower * (tx + 2 * ext) * pcz  # lower windows
            )
            if need <= _VMEM_BUDGET:
                return tx, tz
    return None


def _evolve_kernel_zt(
    # inputs
    phi_hbm,  # (NX+2e, NY, NZ) ANY
    b_hbm,  # (NX, NY, NZ) ANY (dummy (1,1,1) when analytic)
    store_hbm,  # (S·(NX+2e), NY, NZ) ANY
    coef_smem,  # (1+S, 1) SMEM
    xorg_smem,  # (1, 1) SMEM i32 — shard's global x origin (0 single-device)
    # outputs
    out_hbm,  # (NX+2e, NY, NZ) ANY
    norm_out,  # (1, 1) SMEM
    over_out,  # (S, 1) SMEM
    # scratch
    slab,  # (2, TX+2e, NY, TZ+2·ZPAD) VMEM — window at [ZPAD−e, ZPAD+tz+e)
    b_slab,  # (TX, NY, TZ) VMEM
    result,  # (TX, NY, TZ) VMEM — single-buffered (see _evolve_kernel)
    lower_slab,  # (S·(TX+2e), NY, TZ+2·ZPAD) VMEM
    zeros_xhalo,  # (ext, NY, TZ) VMEM
    sem_in,  # DMA (2,)
    sem_b,
    sem_lower,  # DMA (S,)
    sem_out,  # DMA (2,)
    sem_halo,
    *,
    order: str,
    scale: float,
    tx: int,
    tz: int,
    ext: int,
    nz: int,
    n_lower: int,
    with_norm: bool,
    analytic=None,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    nzc = nz // tz
    win_rows = tx + 2 * ext
    nxp_rows = phi_hbm.shape[0]

    # DMA lane slices must be 128-multiples, so halos are fetched as full
    # ZPAD-wide aligned blocks (extra read bandwidth, but legal): center
    # [z0, z0+tz) plus, where a neighbour chunk exists, [z0−ZPAD, z0) and
    # [z0+tz, z0+tz+ZPAD). Global edges are zero-filled instead.
    def in_copies(x_idx, zi: int, to_slot):
        z0 = zi * tz
        copies = [
            pltpu.make_async_copy(
                phi_hbm.at[pl.ds(x_idx * tx, win_rows), :, pl.ds(z0, tz)],
                slab.at[to_slot, :, :, pl.ds(_ZPAD, tz)],
                sem_in.at[to_slot],
            )
        ]
        if zi > 0:
            copies.append(
                pltpu.make_async_copy(
                    phi_hbm.at[pl.ds(x_idx * tx, win_rows), :, pl.ds(z0 - _ZPAD, _ZPAD)],
                    slab.at[to_slot, :, :, pl.ds(0, _ZPAD)],
                    sem_in.at[to_slot],
                )
            )
        if zi < nzc - 1:
            copies.append(
                pltpu.make_async_copy(
                    phi_hbm.at[pl.ds(x_idx * tx, win_rows), :, pl.ds(z0 + tz, _ZPAD)],
                    slab.at[to_slot, :, :, pl.ds(_ZPAD + tz, _ZPAD)],
                    sem_in.at[to_slot],
                )
            )
        return copies

    def out_copy(x_idx, zi: int):
        z0 = zi * tz
        return pltpu.make_async_copy(
            result,
            out_hbm.at[pl.ds(x_idx * tx + ext, tx), :, pl.ds(z0, tz)],
            sem_out,
        )

    def slot_of(zi: int):
        return jax.lax.rem(i * jnp.int32(nzc) + jnp.int32(zi), jnp.int32(2))

    # prologue
    @pl.when(i == 0)
    def _first():
        for c_ in in_copies(jnp.int32(0), 0, jnp.int32(0)):
            c_.start()

    if with_norm or n_lower > 0:

        @pl.when(i == 0)
        def _init_reductions():
            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)
            for si in range(n_lower):
                over_out[si, 0] = jnp.zeros((), over_out.dtype)

    for zi in range(nzc):
        slot = slot_of(zi)
        z0 = zi * tz
        pad_lo = _ZPAD if zi == 0 else 0
        pad_hi = _ZPAD if zi == nzc - 1 else 0

        # b chunk for this (i, zi) — skipped entirely for analytic potentials
        if analytic is None:
            b_copy = pltpu.make_async_copy(
                b_hbm.at[pl.ds(i * tx, tx), :, pl.ds(z0, tz)], b_slab, sem_b
            )
            b_copy.start()

        lower_copies = []
        for si in range(n_lower):
            segs = [(z0, tz, _ZPAD)]
            if zi > 0:
                segs.append((z0 - _ZPAD, _ZPAD, 0))
            if zi < nzc - 1:
                segs.append((z0 + tz, _ZPAD, _ZPAD + tz))
            for src0, w_, dst0 in segs:
                lc = pltpu.make_async_copy(
                    store_hbm.at[
                        pl.ds(jnp.int32(si * nxp_rows) + i * tx, win_rows),
                        :,
                        pl.ds(src0, w_),
                    ],
                    lower_slab.at[
                        pl.ds(jnp.int32(si * win_rows), win_rows), :, pl.ds(dst0, w_)
                    ],
                    sem_lower.at[jnp.int32(si)],
                )
                lc.start()
                lower_copies.append(lc)

        # prefetch the next window
        if zi + 1 < nzc:
            for c_ in in_copies(i, zi + 1, slot_of(zi + 1)):
                c_.start()
        else:

            @pl.when(i + 1 < nprog)
            def _prefetch_next_program():
                nslot = jax.lax.rem((i + 1) * jnp.int32(nzc), jnp.int32(2))
                for c_ in in_copies(i + 1, 0, nslot):
                    c_.start()

        # zero the output's global-x Dirichlet halo rows (once per z-chunk)
        @pl.when(i == 0)
        def _zero_xlo():
            zeros_xhalo[...] = jnp.zeros_like(zeros_xhalo)
            hc = pltpu.make_async_copy(
                zeros_xhalo, out_hbm.at[pl.ds(0, ext), :, pl.ds(z0, tz)], sem_halo
            )
            hc.start()
            hc.wait()

        @pl.when(i == nprog - 1)
        def _zero_xhi():
            zeros_xhalo[...] = jnp.zeros_like(zeros_xhalo)
            hc = pltpu.make_async_copy(
                zeros_xhalo,
                out_hbm.at[pl.ds(nxp_rows - ext, ext), :, pl.ds(z0, tz)],
                sem_halo,
            )
            hc.start()
            hc.wait()

        for c_ in in_copies(i, zi, slot):
            c_.wait()

        # global-z Dirichlet pads: zero the window edges the DMA skipped.
        # Widths are padded up to the lane tile (aligned stores); the extra
        # zeroed lanes lie outside the window and are never read.
        if pad_lo > 0:
            slab[slot, :, :, 0:_ZPAD] = jnp.zeros_like(slab[slot, :, :, 0:_ZPAD])
        if pad_hi > 0:
            zs = tz + 2 * _ZPAD
            slab[slot, :, :, zs - _ZPAD : zs] = jnp.zeros_like(
                slab[slot, :, :, zs - _ZPAD : zs]
            )

        if n_lower > 0:
            for lc in lower_copies:
                lc.wait()
            if pad_lo > 0:
                lower_slab[:, :, 0:_ZPAD] = jnp.zeros_like(lower_slab[:, :, 0:_ZPAD])
            if pad_hi > 0:
                zs = tz + 2 * _ZPAD
                lower_slab[:, :, zs - _ZPAD : zs] = jnp.zeros_like(
                    lower_slab[:, :, zs - _ZPAD : zs]
                )
        if n_lower > 0 or with_norm:
            # affine correction (see _evolve_kernel); per-step-norm ground
            # mode carries only the inverse norm
            win = slab[slot] * coef_smem[0, 0]
            for si in range(n_lower):
                win = win - coef_smem[si + 1, 0] * lower_slab[
                    si * win_rows : (si + 1) * win_rows
                ]
        else:
            win = slab[slot]

        def rows(x0):
            return win[x0 : x0 + tx]

        def center(x0):
            return rows(x0)[:, :, _ZPAD : _ZPAD + tz]

        c = center(ext)
        cr = rows(ext)
        acc = -center_c * c
        for off, cf in zip(offsets, coeffs):
            acc = acc + cf * (center(ext + off) + center(ext - off))
            acc = acc + cf * (_shift_y(c, off) + _shift_y(c, -off))
            # z-shifts as aligned rolls (lane-phase-safe; shift must be
            # non-negative, so the negative direction wraps by the extent)
            zs_len = tz + 2 * _ZPAD
            acc = acc + cf * (
                pltpu.roll(cr, zs_len - off, 2)[:, :, _ZPAD : _ZPAD + tz]
                + pltpu.roll(cr, off, 2)[:, :, _ZPAD : _ZPAD + tz]
            )

        if analytic is None:
            b_copy.wait()
            b = b_slab[...]
        else:
            # B from coordinates: x rows are i·tx+ext.. in padded coords
            # (plus the shard origin), y spans the interior from padded ext,
            # z starts at this chunk's static offset zi·tz+ext
            x0 = (i * tx + jnp.int32(ext) + xorg_smem[0, 0]).astype(jnp.float32)
            b = _analytic_b(analytic, (tx, phi_hbm.shape[1], tz), x0, ext, z0 + ext)
        new = b * (2.0 * c + scale * acc) - c
        # single-buffered result: drain the previous chunk's out-DMA (one
        # full compute phase old) just before overwriting
        if zi >= 1:
            out_copy(i, zi - 1).wait()
        else:

            @pl.when(i >= 1)
            def _drain_prev_program():
                out_copy(i - 1, nzc - 1).wait()

        result[...] = new
        out_copy(i, zi).start()

        if with_norm or n_lower > 0:
            norm_out[0, 0] += jnp.sum(new * new)
        for si in range(n_lower):
            over_out[si, 0] += jnp.sum(
                lower_slab[
                    si * win_rows + ext : si * win_rows + ext + tx,
                    :,
                    _ZPAD : _ZPAD + tz,
                ]
                * new
            )

    # epilogue: the last program drains its final out-DMA
    @pl.when(i == nprog - 1)
    def _drain_last():
        out_copy(i, nzc - 1).wait()


# --------------------------------------------------------------------------- #
# y-tiled variant: planes too large for VMEM stream in Y-chunks
# --------------------------------------------------------------------------- #
#
# Supersedes the z-tiled kernel for large planes: tiling along the sublane
# axis needs only 8-element DMA granularity, so the halo refetch overhead is
# (ty+2·YPAD)/ty with YPAD = 8 (~6% at ty = 128) instead of the z-tiled
# kernel's (tz+2·128)/tz (100% at tz = 256). Each x-program statically
# unrolls over y-chunks; the ψ/lower windows overlap by ext in x and y.
# y-shifts are computed with pltpu.roll on the YPAD-padded window (aligned
# slices: offsets/widths are 8-multiples); z keeps the full extent with the
# in-register Dirichlet shifts; x uses window rows.


_YPAD = 8  # sublane-aligned window pad (≥ max ext = 3)


def _pick_tx_yt(nx: int, ny: int, nz: int, ext: int, itemsize: int, n_lower: int,
                analytic_b: bool = False):
    """(tx, ty) minimising the read amplification (tx+2e)/tx · (ty+16)/ty
    within the VMEM budget, or None."""
    best = None
    best_amp = None
    for ty in (256, 128, 64, 32, 16, 8):
        if ny % ty or ty < 2 * _YPAD or ny // ty < 2:
            continue
        pcy = (ty + 2 * _YPAD) * nz * itemsize
        pc = ty * nz * itemsize
        for tx in (16, 8, 4, 2, 1):
            if nx % tx:
                continue
            need = (
                2 * (tx + 2 * ext) * pcy        # ψ windows (double-buffered)
                + (0 if analytic_b else tx * pc)  # b chunk
                + tx * pc                        # result (single-buffered)
                + n_lower * (tx + 2 * ext) * pcy  # lower windows
            )
            if need > _VMEM_BUDGET:
                continue
            amp = ((tx + 2 * ext) / tx) * ((ty + 2 * _YPAD) / ty)
            if best_amp is None or amp < best_amp - 1e-9:
                best, best_amp = (tx, ty), amp
            break  # larger tx within this ty cannot fit; move on
    return best


def _evolve_kernel_yt(
    # inputs
    phi_hbm,  # (NX+2e, NY, NZ) ANY
    b_hbm,  # (NX, NY, NZ) ANY (dummy (1,1,1) when analytic)
    store_hbm,  # (S·(NX+2e), NY, NZ) ANY
    coef_smem,  # (1+S, 1) SMEM
    xorg_smem,  # (1, 1) SMEM i32 — shard's global x origin (0 single-device)
    # outputs
    out_hbm,  # (NX+2e, NY, NZ) ANY
    norm_out,  # (1, 1) SMEM
    over_out,  # (S, 1) SMEM
    # scratch
    slab,  # (2, TX+2e, TY+2·YPAD, NZ) VMEM — window at [YPAD−e, YPAD+ty+e)
    b_slab,  # (TX, TY, NZ) VMEM
    result,  # (TX, TY, NZ) VMEM — single-buffered
    lower_slab,  # (S·(TX+2e), TY+2·YPAD, NZ) VMEM
    zeros_xhalo,  # (ext, TY, NZ) VMEM
    sem_in,  # DMA (2,)
    sem_b,
    sem_lower,  # DMA (S,)
    sem_out,
    sem_halo,
    *,
    order: str,
    scale: float,
    tx: int,
    ty: int,
    ext: int,
    ny: int,
    n_lower: int,
    with_norm: bool,
    analytic=None,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    nyc = ny // ty
    win_rows = tx + 2 * ext
    nxp_rows = phi_hbm.shape[0]
    yw = ty + 2 * _YPAD

    def in_copies(x_idx, yi: int, to_slot):
        y0 = yi * ty
        copies = [
            pltpu.make_async_copy(
                phi_hbm.at[pl.ds(x_idx * tx, win_rows), pl.ds(y0, ty), :],
                slab.at[to_slot, :, pl.ds(_YPAD, ty), :],
                sem_in.at[to_slot],
            )
        ]
        if yi > 0:
            copies.append(
                pltpu.make_async_copy(
                    phi_hbm.at[pl.ds(x_idx * tx, win_rows), pl.ds(y0 - _YPAD, _YPAD), :],
                    slab.at[to_slot, :, pl.ds(0, _YPAD), :],
                    sem_in.at[to_slot],
                )
            )
        if yi < nyc - 1:
            copies.append(
                pltpu.make_async_copy(
                    phi_hbm.at[pl.ds(x_idx * tx, win_rows), pl.ds(y0 + ty, _YPAD), :],
                    slab.at[to_slot, :, pl.ds(_YPAD + ty, _YPAD), :],
                    sem_in.at[to_slot],
                )
            )
        return copies

    def out_copy(x_idx, yi: int):
        y0 = yi * ty
        return pltpu.make_async_copy(
            result,
            out_hbm.at[pl.ds(x_idx * tx + ext, tx), pl.ds(y0, ty), :],
            sem_out,
        )

    def slot_of(yi: int):
        return jax.lax.rem(i * jnp.int32(nyc) + jnp.int32(yi), jnp.int32(2))

    # prologue
    @pl.when(i == 0)
    def _first():
        for c_ in in_copies(jnp.int32(0), 0, jnp.int32(0)):
            c_.start()

    if with_norm or n_lower > 0:

        @pl.when(i == 0)
        def _init_reductions():
            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)
            for si in range(n_lower):
                over_out[si, 0] = jnp.zeros((), over_out.dtype)

    for yi in range(nyc):
        slot = slot_of(yi)
        y0 = yi * ty
        pad_lo = yi == 0
        pad_hi = yi == nyc - 1

        if analytic is None:
            b_copy = pltpu.make_async_copy(
                b_hbm.at[pl.ds(i * tx, tx), pl.ds(y0, ty), :], b_slab, sem_b
            )
            b_copy.start()

        lower_copies = []
        for si in range(n_lower):
            segs = [(y0, ty, _YPAD)]
            if yi > 0:
                segs.append((y0 - _YPAD, _YPAD, 0))
            if yi < nyc - 1:
                segs.append((y0 + ty, _YPAD, _YPAD + ty))
            for src0, w_, dst0 in segs:
                lc = pltpu.make_async_copy(
                    store_hbm.at[
                        pl.ds(jnp.int32(si * nxp_rows) + i * tx, win_rows),
                        pl.ds(src0, w_),
                        :,
                    ],
                    lower_slab.at[
                        pl.ds(jnp.int32(si * win_rows), win_rows), pl.ds(dst0, w_), :
                    ],
                    sem_lower.at[jnp.int32(si)],
                )
                lc.start()
                lower_copies.append(lc)

        # prefetch the next window
        if yi + 1 < nyc:
            for c_ in in_copies(i, yi + 1, slot_of(yi + 1)):
                c_.start()
        else:

            @pl.when(i + 1 < nprog)
            def _prefetch_next_program():
                nslot = jax.lax.rem((i + 1) * jnp.int32(nyc), jnp.int32(2))
                for c_ in in_copies(i + 1, 0, nslot):
                    c_.start()

        # zero the output's global-x Dirichlet halo rows (once per y-chunk)
        @pl.when(i == 0)
        def _zero_xlo():
            zeros_xhalo[...] = jnp.zeros_like(zeros_xhalo)
            hc = pltpu.make_async_copy(
                zeros_xhalo, out_hbm.at[pl.ds(0, ext), pl.ds(y0, ty), :], sem_halo
            )
            hc.start()
            hc.wait()

        @pl.when(i == nprog - 1)
        def _zero_xhi():
            zeros_xhalo[...] = jnp.zeros_like(zeros_xhalo)
            hc = pltpu.make_async_copy(
                zeros_xhalo,
                out_hbm.at[pl.ds(nxp_rows - ext, ext), pl.ds(y0, ty), :],
                sem_halo,
            )
            hc.start()
            hc.wait()

        for c_ in in_copies(i, yi, slot):
            c_.wait()

        # global-y Dirichlet pads: zero the window edges the DMA skipped
        if pad_lo:
            slab[slot, :, 0:_YPAD, :] = jnp.zeros_like(slab[slot, :, 0:_YPAD, :])
        if pad_hi:
            slab[slot, :, yw - _YPAD : yw, :] = jnp.zeros_like(
                slab[slot, :, yw - _YPAD : yw, :]
            )

        if n_lower > 0:
            for lc in lower_copies:
                lc.wait()
            if pad_lo:
                lower_slab[:, 0:_YPAD, :] = jnp.zeros_like(lower_slab[:, 0:_YPAD, :])
            if pad_hi:
                lower_slab[:, yw - _YPAD : yw, :] = jnp.zeros_like(
                    lower_slab[:, yw - _YPAD : yw, :]
                )
        if n_lower > 0 or with_norm:
            # affine correction (see _evolve_kernel)
            win = slab[slot] * coef_smem[0, 0]
            for si in range(n_lower):
                win = win - coef_smem[si + 1, 0] * lower_slab[
                    si * win_rows : (si + 1) * win_rows
                ]
        else:
            win = slab[slot]

        def rows(x0):
            return win[x0 : x0 + tx]

        def center(x0):
            return rows(x0)[:, _YPAD : _YPAD + ty, :]

        c = center(ext)
        cr = rows(ext)
        acc = -center_c * c
        for off, cf in zip(offsets, coeffs):
            acc = acc + cf * (center(ext + off) + center(ext - off))
            # y-shifts as aligned sublane rolls on the padded window
            acc = acc + cf * (
                pltpu.roll(cr, yw - off, 1)[:, _YPAD : _YPAD + ty, :]
                + pltpu.roll(cr, off, 1)[:, _YPAD : _YPAD + ty, :]
            )
            acc = acc + cf * (_shift_z(c, off) + _shift_z(c, -off))

        if analytic is None:
            b_copy.wait()
            b = b_slab[...]
        else:
            x0 = (i * tx + jnp.int32(ext) + xorg_smem[0, 0]).astype(jnp.float32)
            b = _analytic_b(analytic, (tx, ty, phi_hbm.shape[2]), x0, y0 + ext, ext)
        new = b * (2.0 * c + scale * acc) - c

        # single-buffered result (see _evolve_kernel)
        if yi >= 1:
            out_copy(i, yi - 1).wait()
        else:

            @pl.when(i >= 1)
            def _drain_prev_program():
                out_copy(i - 1, nyc - 1).wait()

        result[...] = new
        out_copy(i, yi).start()

        if with_norm or n_lower > 0:
            norm_out[0, 0] += jnp.sum(new * new)
        for si in range(n_lower):
            over_out[si, 0] += jnp.sum(
                lower_slab[
                    si * win_rows + ext : si * win_rows + ext + tx,
                    _YPAD : _YPAD + ty,
                    :,
                ]
                * new
            )

    # epilogue: the last program drains its final out-DMA
    @pl.when(i == nprog - 1)
    def _drain_last():
        out_copy(i, nyc - 1).wait()


# --------------------------------------------------------------------------- #
# y/z-padded variant: multi-axis meshes consume exchanged y/z halos
# --------------------------------------------------------------------------- #
#
# On a multi-axis device mesh ((2,2,2), (4,2,1) — the v5p ICI torus shapes)
# the local block has *interior* shard boundaries along y/z, so the plain
# kernel's zero-filled in-register shifts are wrong there. This variant
# carries the block in a y/z-padded layout — pads of 8 sublanes / 128 lanes
# keep every vector slice tile-aligned — whose innermost ``ext`` pad rows
# the caller refreshes each step (ppermute faces; zeros at global edges).
# y/z taps become aligned pltpu.roll reads of the padded extent (the yt/zt
# windowing mechanics at full extent); x keeps the overlapping-window DMA.
# Corners never matter: the stencil is an axis-aligned star, x-taps read
# interior y/z and y/z-taps read interior x. Reference seam:
# src/config.rs:222-239; SURVEY §5 (spatial scaling over ICI tori).

_YZP_YPAD = 8
_YZP_ZPAD = 128


def _pick_tx_yzp(bx: int, byp: int, bzp: int, by: int, bz: int, ext: int,
                 itemsize: int, n_lower: int, analytic_b: bool = False):
    plane = byp * bzp * itemsize
    iplane = by * bz * itemsize
    for tx in (32, 16, 8, 4, 2, 1):
        if bx % tx:
            continue
        need = (
            2 * (tx + 2 * ext) * plane          # ψ windows (double-buffered)
            + tx * iplane                        # result (single-buffered)
            + (0 if analytic_b else tx * iplane)  # b chunk
            + n_lower * (tx + 2 * ext) * plane   # lower windows
        )
        if need <= _VMEM_BUDGET:
            return tx
    return None


def step_fused_yzp_supported(bx: int, by: int, bz: int, ext: int,
                             itemsize: int, n_lower: int,
                             zp: int = _YZP_ZPAD) -> bool:
    """``zp`` is the z alignment pad: ``_YZP_ZPAD`` (128 lanes) when the z
    axis is sharded, 0 when it is global (the kernel then applies the z
    Dirichlet with in-register zero shifts — no 128-lane pads, which at
    128-lane blocks triple the VPU work)."""
    byp = by + 2 * _YZP_YPAD
    bzp = bz + 2 * zp
    return (
        by % 8 == 0
        and bz % 128 == 0
        and bx >= ext
        and _pick_tx_yzp(bx, byp, bzp, by, bz, ext, itemsize, n_lower)
        is not None
    )


def _evolve_kernel_yzp(
    phi_hbm,    # (BX+2e, BYP, BZP) ANY — y/z-padded local block
    b_hbm,      # (BX, BYP, BZP) ANY (stub when analytic; pads unread)
    store_hbm,  # (S·(BX+2e), BYP, BZP) ANY
    coef_smem,  # (1+S, 1) SMEM
    org_smem,   # (3, 1) SMEM i32 — shard's global interior (x, y, z) origin
    out_hbm,    # (BX+2e, BYP, BZP) ANY — interior + zeroed x-halos written;
    # y/z pads are left unwritten (the caller refreshes the ext rows read)
    norm_out,   # (1, 1) SMEM
    over_out,   # (S, 1) SMEM
    slab,       # (2, TX+2e, BYP, BZP) VMEM
    b_slab,     # (TX, BY, BZ) VMEM
    result,     # (TX, BY, BZ) VMEM — single-buffered
    lower_slab, # (S·(TX+2e), BYP, BZP) VMEM
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
    zp: int = _YZP_ZPAD,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    next_slot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
    win_rows = tx + 2 * ext
    byp = by + 2 * _YZP_YPAD
    bzp = bz + 2 * zp
    nxp_rows = phi_hbm.shape[0]
    yp = _YZP_YPAD

    def in_copy(window, to_slot):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(window * tx, win_rows)],
            slab.at[to_slot],
            sem_in.at[to_slot],
        )

    @pl.when(i == 0)
    def _first_window():
        in_copy(jnp.int32(0), jnp.int32(0)).start()

    @pl.when(i + 1 < nprog)
    def _prefetch():
        in_copy(i + 1, next_slot).start()

    if analytic is None:
        b_copy = pltpu.make_async_copy(
            b_hbm.at[pl.ds(i * tx, tx), pl.ds(yp, by), pl.ds(zp, bz)],
            b_slab,
            sem_b,
        )
        b_copy.start()

    lower_copies = []
    for s_idx in range(n_lower):
        lc = pltpu.make_async_copy(
            store_hbm.at[pl.ds(jnp.int32(s_idx * nxp_rows) + i * tx, win_rows)],
            lower_slab.at[pl.ds(jnp.int32(s_idx * win_rows), win_rows)],
            sem_lower.at[jnp.int32(s_idx)],
        )
        lc.start()
        lower_copies.append(lc)

    # x-halo rows of the output: zeroed unconditionally (the sharded caller
    # refreshes them from neighbours each step; at global edges the zeros
    # ARE the Dirichlet condition — same composition as _evolve_kernel)
    @pl.when(i == 0)
    def _zero_xlo():
        zeros_xhalo[...] = jnp.zeros_like(zeros_xhalo)
        hc = pltpu.make_async_copy(
            zeros_xhalo, out_hbm.at[pl.ds(0, ext)], sem_halo
        )
        hc.start()
        hc.wait()

    @pl.when(i == nprog - 1)
    def _zero_xhi():
        zeros_xhalo[...] = jnp.zeros_like(zeros_xhalo)
        hc = pltpu.make_async_copy(
            zeros_xhalo, out_hbm.at[pl.ds(nxp_rows - ext, ext)], sem_halo
        )
        hc.start()
        hc.wait()

    in_copy(i, slot).wait()

    if n_lower > 0 or with_norm:
        if n_lower > 0:
            for lc in lower_copies:
                lc.wait()
        win = slab[slot] * coef_smem[0, 0]
        for s_idx in range(n_lower):
            win = win - coef_smem[s_idx + 1, 0] * lower_slab[
                s_idx * win_rows : (s_idx + 1) * win_rows
            ]
    else:
        win = slab[slot]

    def rows(x0):
        return win[x0 : x0 + tx]

    def center(x0):
        return rows(x0)[:, yp : yp + by, zp : zp + bz]

    c = center(ext)
    cr = rows(ext)
    acc = -center_c * c
    for off, cf in zip(offsets, coeffs):
        acc = acc + cf * (center(ext + off) + center(ext - off))
        # y/z taps read the exchanged pad rows via aligned rolls; with
        # zp == 0 (global z axis) the z Dirichlet rides in-register zero
        # shifts instead — no 128-lane pads
        acc = acc + cf * (
            pltpu.roll(cr, byp - off, 1)[:, yp : yp + by, zp : zp + bz]
            + pltpu.roll(cr, off, 1)[:, yp : yp + by, zp : zp + bz]
        )
        if zp > 0:
            acc = acc + cf * (
                pltpu.roll(cr, bzp - off, 2)[:, yp : yp + by, zp : zp + bz]
                + pltpu.roll(cr, off, 2)[:, yp : yp + by, zp : zp + bz]
            )
        else:
            acc = acc + cf * (
                _shift_z(cr, off) + _shift_z(cr, -off)
            )[:, yp : yp + by, :]

    if analytic is None:
        b_copy.wait()
        b = b_slab[...]
    else:
        x0 = (i * tx + jnp.int32(ext) + org_smem[0, 0]).astype(jnp.float32)
        y0 = (jnp.int32(ext) + org_smem[1, 0]).astype(jnp.float32)
        z0 = (jnp.int32(ext) + org_smem[2, 0]).astype(jnp.float32)
        b = _analytic_b(analytic, (tx, by, bz), x0, y0, z0)
    new = b * (2.0 * c + scale * acc) - c

    @pl.when(i >= 1)
    def _drain_prev_out():
        pltpu.make_async_copy(
            result,
            out_hbm.at[pl.ds((i - 1) * tx + ext, tx), pl.ds(yp, by), pl.ds(zp, bz)],
            sem_out,
        ).wait()

    result[...] = new
    pltpu.make_async_copy(
        result,
        out_hbm.at[pl.ds(i * tx + ext, tx), pl.ds(yp, by), pl.ds(zp, bz)],
        sem_out,
    ).start()

    if with_norm or n_lower > 0:
        @pl.when(i == 0)
        def _init():
            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)
            for s in range(n_lower):
                over_out[s, 0] = jnp.zeros((), over_out.dtype)

        norm_out[0, 0] += jnp.sum(new * new)
    for s_idx in range(n_lower):
        over_out[s_idx, 0] += jnp.sum(
            lower_slab[
                s_idx * win_rows + ext : s_idx * win_rows + ext + tx,
                yp : yp + by,
                zp : zp + bz,
            ]
            * new
        )

    @pl.when(i == nprog - 1)
    def _drain_tail():
        pltpu.make_async_copy(
            result,
            out_hbm.at[pl.ds(i * tx + ext, tx), pl.ds(yp, by), pl.ds(zp, bz)],
            sem_out,
        ).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "scale", "n_lower", "with_norm", "interpret", "analytic",
        "zp",
    ),
)
def evolve_step_fused_yzp(
    phi_pad3: jnp.ndarray,
    b_pad3: Optional[jnp.ndarray],
    store_pad3: Optional[jnp.ndarray],
    order: str,
    scale: float,
    n_lower: int = 0,
    with_norm: bool = True,
    interpret: bool = False,
    coef: Optional[jnp.ndarray] = None,
    analytic=None,
    origin=None,
    zp: int = _YZP_ZPAD,
):
    """One fused sweep on a y/z-padded local block (multi-axis meshes).

    Args:
      phi_pad3: (BX+2e, BY+16, BZ+256) — x-padded by ext, y/z padded by
        the alignment pads; the innermost ext pad rows hold neighbour data
        (or zeros at global edges), refreshed by the caller per step.
      b_pad3: interior-rows B in the same y/z-padded layout (pads unread),
        or None with ``analytic``.
      store_pad3: (S, BX+2e, BY+16, BZ+256) stored states, halos/pads
        filled like ψ's.
      origin: (3, 1) i32 global interior (x, y, z) origin of this shard.

    Returns:
      (ψ'_pad3, norm2, overlaps[S]) — y/z pads of ψ' are unwritten (the
      caller must refresh before the next read); reductions cover the
      interior block only.
    """
    ext = _EXT[order]
    bxp, byp, bzp = phi_pad3.shape
    bx = bxp - 2 * ext
    by = byp - 2 * _YZP_YPAD
    bz = bzp - 2 * zp
    dtype = phi_pad3.dtype
    tx = _pick_tx_yzp(bx, byp, bzp, by, bz, ext, dtype.itemsize, n_lower,
                      analytic is not None)
    if tx is None:
        raise ValueError(
            f"y/z-padded fused sweep does not fit VMEM for block {by}x{bz}"
        )
    if b_pad3 is None:
        assert analytic is not None
        b_pad3 = jnp.zeros((1, 1, 1), dtype=dtype)
    if store_pad3 is None or n_lower == 0:
        store_pad3 = jnp.zeros((1, bxp, byp, bzp), dtype=dtype)
    n_store = store_pad3.shape[0]
    store_flat = store_pad3.reshape(n_store * bxp, byp, bzp)
    if coef is None:
        coef = jnp.concatenate(
            [jnp.ones((1, 1), dtype), jnp.zeros((n_store, 1), dtype)]
        )
    if origin is None:
        origin = jnp.zeros((3, 1), jnp.int32)
    else:
        origin = jnp.asarray(origin, jnp.int32).reshape(3, 1)

    kernel = functools.partial(
        _evolve_kernel_yzp,
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
    win_rows = tx + 2 * ext
    b_slab_shape = (1, 8, 128) if analytic is not None else (tx, by, bz)
    with jax.enable_x64(False):
        out_pad3, norm2, overlaps = pl.pallas_call(
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
                jax.ShapeDtypeStruct((bxp, byp, bzp), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
                jax.ShapeDtypeStruct((n_store, 1), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, win_rows, byp, bzp), dtype),
                pltpu.VMEM(b_slab_shape, dtype),
                pltpu.VMEM((tx, by, bz), dtype),
                pltpu.VMEM((max(n_store, 1) * win_rows, byp, bzp), dtype),
                pltpu.VMEM((ext, byp, bzp), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((max(n_store, 1),)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(phi_pad3, b_pad3, store_flat, coef, origin)
    return out_pad3, norm2[0, 0], overlaps[:n_lower or 1, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "scale", "n_lower", "with_norm", "interpret", "analytic"
    ),
)
def evolve_step_fused(
    phi_xpad: jnp.ndarray,
    b_int: Optional[jnp.ndarray],
    store_xpad: Optional[jnp.ndarray],
    order: str,
    scale: float,
    n_lower: int = 0,
    with_norm: bool = True,
    interpret: bool = False,
    coef: Optional[jnp.ndarray] = None,
    analytic=None,
    x_origin=None,
):
    """One fused sweep.

    Args:
      phi_xpad: (NX+2e, NY, NZ) x-padded ψ, halo rows zero.
      b_int: (NX, NY, NZ) interior ancillary B array (A is derived: 2B−1).
      store_xpad: (S, NX+2e, NY, NZ) x-padded stored lower states, or None.
      scale: dt/(k·dn²·mass).
      coef: (1+S, 1) [inv_norm, corr...] affine correction applied to the
        input in-kernel (excited path); identity when None.

    Returns:
      (ψ'_xpad, norm2, overlaps[S]) — norm²/overlaps measured on the *raw*
      (uncorrected-output) ψ', for the next step's coef. Halo rows zero.
    """
    ext = _EXT[order]
    nxp, ny, nz = phi_xpad.shape
    nx = nxp - 2 * ext
    dtype = phi_xpad.dtype
    if b_int is None:
        assert analytic is not None
        b_int = jnp.zeros((1, 1, 1), dtype=dtype)
    tx = _pick_tx(nx, ny, nz, ext, dtype.itemsize, n_lower, analytic is not None)
    txty = None
    txtz = None
    if tx is None:
        txty = _pick_tx_yt(
            nx, ny, nz, ext, dtype.itemsize, n_lower, analytic is not None
        )
    if tx is None and txty is None:
        txtz = _pick_tx_zt(
            nx, ny, nz, ext, dtype.itemsize, n_lower, analytic is not None
        )
        if txtz is None:
            raise ValueError(
                f"fused sweep does not fit VMEM for plane {ny}x{nz} "
                f"({dtype.itemsize}B items); use the XLA backend"
            )

    if store_xpad is None or n_lower == 0:
        store_xpad = jnp.zeros((1, nxp, ny, nz), dtype=dtype)
    if store_xpad.dtype != dtype and (tx is None or ny % 16 != 0):
        # bf16 store windows need the plain kernel's full-extent slices
        # (yt/zt window offsets are 8-sublane-aligned, under the (16, 128)
        # bf16 tile) and a 16-aligned NY
        store_xpad = store_xpad.astype(dtype)
    stream_dtype = store_xpad.dtype
    n_store = store_xpad.shape[0]
    store_flat = store_xpad.reshape(n_store * nxp, ny, nz)
    if coef is None:
        coef = jnp.concatenate(
            [jnp.ones((1, 1), dtype), jnp.zeros((n_store, 1), dtype)]
        )
    if x_origin is None:
        x_origin = jnp.zeros((1, 1), jnp.int32)
    else:
        x_origin = jnp.asarray(x_origin, jnp.int32).reshape(1, 1)

    if txty is not None:
        tx_y, ty = txty
        kernel_yt = functools.partial(
            _evolve_kernel_yt,
            order=order,
            scale=scale,
            tx=tx_y,
            ty=ty,
            ext=ext,
            ny=ny,
            n_lower=n_lower,
            with_norm=with_norm,
            analytic=analytic,
        )
        win_rows = tx_y + 2 * ext
        b_slab_shape = (1, 1, _YPAD * 16) if analytic is not None else (tx_y, ty, nz)
        with jax.enable_x64(False):
            out_xpad, norm2, overlaps = pl.pallas_call(
                kernel_yt,
                grid=(nx // tx_y,),
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
                    jax.ShapeDtypeStruct((nxp, ny, nz), dtype),
                    jax.ShapeDtypeStruct((1, 1), dtype),
                    jax.ShapeDtypeStruct((n_store, 1), dtype),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, win_rows, ty + 2 * _YPAD, nz), dtype),
                    pltpu.VMEM(b_slab_shape, dtype),
                    pltpu.VMEM((tx_y, ty, nz), dtype),
                    pltpu.VMEM(
                        (max(n_store, 1) * win_rows, ty + 2 * _YPAD, nz), dtype
                    ),
                    pltpu.VMEM((ext, ty, nz), dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA((max(n_store, 1),)),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
                interpret=interpret,
                compiler_params=_compiler_params(),
            )(phi_xpad, b_int, store_flat, coef, x_origin)
        return out_xpad, norm2[0, 0], overlaps[:n_lower or 1, 0]

    if txtz is not None:
        tx_z, tz = txtz
        kernel_zt = functools.partial(
            _evolve_kernel_zt,
            order=order,
            scale=scale,
            tx=tx_z,
            tz=tz,
            ext=ext,
            nz=nz,
            n_lower=n_lower,
            with_norm=with_norm,
            analytic=analytic,
        )
        win_rows = tx_z + 2 * ext
        # the b slab is a placeholder when B is computed from coordinates
        b_slab_shape = (1, 1, _ZPAD) if analytic is not None else (tx_z, ny, tz)
        with jax.enable_x64(False):
            out_xpad, norm2, overlaps = pl.pallas_call(
                kernel_zt,
                grid=(nx // tx_z,),
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
                    jax.ShapeDtypeStruct((nxp, ny, nz), dtype),
                    jax.ShapeDtypeStruct((1, 1), dtype),
                    jax.ShapeDtypeStruct((n_store, 1), dtype),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, win_rows, ny, tz + 2 * _ZPAD), dtype),
                    pltpu.VMEM(b_slab_shape, dtype),
                    pltpu.VMEM((tx_z, ny, tz), dtype),
                    pltpu.VMEM((n_store * win_rows, ny, tz + 2 * _ZPAD), dtype),
                    pltpu.VMEM((ext, ny, tz), dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA((max(n_store, 1),)),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
                interpret=interpret,
                compiler_params=_compiler_params(),
            )(phi_xpad, b_int, store_flat, coef, x_origin)
        return out_xpad, norm2[0, 0], overlaps[:n_lower or 1, 0]

    kernel = functools.partial(
        _evolve_kernel,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        n_lower=n_lower,
        with_norm=with_norm,
        analytic=analytic,
    )
    b_spec = (
        pl.BlockSpec(memory_space=pl.ANY)
        if analytic is not None
        else pl.BlockSpec(
            (tx, ny, nz),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )

    # Trace under 32-bit index semantics: with jax_enable_x64 the default
    # BlockSpec index maps emit i64 literals, which Mosaic rejects.
    with jax.enable_x64(False):
        out_xpad, norm2, overlaps = pl.pallas_call(
            kernel,
            grid=(nx // tx,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                b_spec,
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
                jax.ShapeDtypeStruct((nxp, ny, nz), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
                jax.ShapeDtypeStruct((n_store, 1), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, tx + 2 * ext, ny, nz), dtype),
                pltpu.VMEM((tx, ny, nz), dtype),
                pltpu.VMEM((n_store * (tx + 2 * ext), ny, nz), stream_dtype),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((max(n_store, 1),)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(phi_xpad, b_int, store_flat, coef, x_origin)

    return out_xpad, norm2[0, 0], overlaps[:n_lower or 1, 0]


# --------------------------------------------------------------------------- #
# K-step temporal blocking: fuse K sweeps per HBM pass
# --------------------------------------------------------------------------- #
#
# The sweep is HBM-bandwidth-bound, so fusing K time steps inside VMEM cuts
# the ψ/B streaming traffic nearly K-fold (a trapezoidal space-time tile: a
# slab of TX output rows needs TX + 2K·ext input rows). The global Dirichlet
# boundary makes this exact: intermediate halo rows are re-zeroed after every
# inner step, which is precisely what the single-step schedule produces.
# Applicable to the ground-state path only — excited states renormalise and
# Gram-Schmidt-project (global reductions) after *every* step
# (src/grid.rs:674-681), which forbids cross-step fusion.


def _evolve_kernel_k(
    # inputs
    phi_hbm,  # (NX+2Ke, NY, NZ) ANY
    b_hbm,  # (NX+2(K-1)e, NY, NZ) ANY
    xorg_smem,  # (1, 1) SMEM i32: global x offset of this block's interior
    # (non-zero under shard_map; feeds the analytic-B coordinates)
    edge_smem,  # (2, 1) SMEM i32: [at_global_lo, at_global_hi] — whether the
    # block's x edges are the *global* Dirichlet boundary (both 1 on a single
    # device). Interior shards carry real neighbour data in their halos, so
    # the intermediate-step edge masking and output-halo zeroing must be
    # skipped there (the halo is refreshed by ppermute each fused call).
    # outputs
    out_hbm,  # (NX+2Ke, NY, NZ) ANY
    # scratch
    window,  # (2, TX+2Ke, NY, NZ) VMEM — double-buffered ψ windows
    pong,  # (TX+2(K-1)e, NY, NZ) VMEM — intermediate steps ping-pong
    b_slab,  # (TX+2(K-1)e, NY, NZ) VMEM
    result,  # (TX, NY, NZ) VMEM — single-buffered: the out-DMA drains
    # during the next program's compute, and the freed VMEM buys a larger
    # slab height (tx 4 → 8 at 256³ K=2 analytic: read amplification
    # (tx+2Ke)/tx drops 2.0 → 1.5)
    zeros_halo,  # (K·ext, NY, NZ) VMEM
    sem_in,  # DMA (2,)
    sem_b,
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
    at_lo = edge_smem[0, 0] == 1
    at_hi = edge_smem[1, 0] == 1

    def in_copy(win, to_slot):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(win * tx, tx + 2 * pad)],
            window.at[to_slot],
            sem_in.at[to_slot],
        )

    @pl.when(i == 0)
    def _first_window():
        in_copy(jnp.int32(0), jnp.int32(0)).start()

    @pl.when(i + 1 < nprog)
    def _prefetch():
        in_copy(i + 1, next_slot).start()

    if analytic is None:
        b_copy = pltpu.make_async_copy(
            b_hbm.at[pl.ds(i * tx, tx + 2 * (k_steps - 1) * ext)], b_slab, sem_b
        )
        b_copy.start()

    @pl.when(jnp.logical_and(i == 0, at_lo))
    def _zero_lo():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        c = pltpu.make_async_copy(zeros_halo, out_hbm.at[pl.ds(0, pad)], sem_halo)
        c.start()
        c.wait()

    @pl.when(jnp.logical_and(i == nprog - 1, at_hi))
    def _zero_hi():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        nxp = out_hbm.shape[0]
        c = pltpu.make_async_copy(
            zeros_halo, out_hbm.at[pl.ds(nxp - pad, pad)], sem_halo
        )
        c.start()
        c.wait()

    in_copy(i, slot).wait()
    if analytic is None:
        b_copy.wait()
        yz = None
    else:
        # y/z coordinate term shared by all K in-pass B evaluations
        yz = _analytic_yz(analytic, b_slab.shape[1], b_slab.shape[2], ext, ext)

    def b_rows(rows_out, b_off):
        """Split-operator B — streamed from HBM, or computed from
        coordinates for analytic potentials (one HBM stream saved)."""
        if analytic is None:
            return b_slab[b_off : b_off + rows_out]
        # padded coordinate of output row r: i·tx + b_off − (K−1)·ext + ext + r
        # (plus the shard's global interior origin)
        x0 = (
            i * tx + jnp.int32(b_off - (k_steps - 1) * ext + ext) + xorg_smem[0, 0]
        ).astype(jnp.float32)
        shp = (rows_out, b_slab.shape[1], b_slab.shape[2])
        return _analytic_b(analytic, shp, x0, ext, ext, yz=yz)

    def step(read, rows_out, b_off):
        """One inner sweep producing ``rows_out`` rows from ``read`` (a
        function row-slice → array)."""
        c = read(ext, rows_out)
        acc = -center_c * c
        for off, cf in zip(offsets, coeffs):
            acc = acc + cf * (read(ext + off, rows_out) + read(ext - off, rows_out))
            acc = acc + cf * (_shift_y(c, off) + _shift_y(c, -off))
            acc = acc + cf * (_shift_z(c, off) + _shift_z(c, -off))
        b = b_rows(rows_out, b_off)
        return b * (2.0 * c + scale * acc) - c

    # step 1 reads the DMA'd window; later steps read the previous result.
    # Dirichlet: after each inner step, re-zero intermediate rows that fall
    # outside the global interior (predicated ref stores — scalar selects
    # do not legalize in Mosaic). Skipped on shard edges that carry real
    # neighbour data (edge_smem 0): there the intermediate edge rows are
    # exactly what the neighbour computes for them.
    cur = None
    for s in range(1, k_steps + 1):
        rows_out = tx + 2 * (k_steps - s) * ext
        b_off = (s - 1) * ext
        if s == 1:
            def read(row0, rows, _slot=slot):
                return window[_slot, row0 : row0 + rows]
        else:
            prev = cur

            def read(row0, rows, _prev=prev):
                return _prev[row0 : row0 + rows]
        val = step(read, rows_out, b_off)
        edge = (k_steps - s) * ext
        if s < k_steps:
            pong[:rows_out] = val
            if edge > 0:
                @pl.when(jnp.logical_and(i == 0, at_lo))
                def _mask_lo(_rows=rows_out, _edge=edge):
                    pong[0:_edge] = jnp.zeros_like(pong[0:_edge])

                @pl.when(jnp.logical_and(i == nprog - 1, at_hi))
                def _mask_hi(_rows=rows_out, _edge=edge):
                    pong[_rows - _edge : _rows] = jnp.zeros_like(
                        pong[_rows - _edge : _rows]
                    )
            cur = pong[:rows_out]
        else:
            # single-buffered result: drain the previous program's out-DMA
            # (issued one full compute phase ago) just before overwriting
            @pl.when(i >= 1)
            def _drain_prev_out():
                pltpu.make_async_copy(
                    result, out_hbm.at[pl.ds((i - 1) * tx + pad, tx)], sem_out
                ).wait()

            result[...] = val
    pltpu.make_async_copy(
        result, out_hbm.at[pl.ds(i * tx + pad, tx)], sem_out
    ).start()

    @pl.when(i == nprog - 1)
    def _drain_tail():
        pltpu.make_async_copy(
            result, out_hbm.at[pl.ds(i * tx + pad, tx)], sem_out
        ).wait()


def _tile_cost_k(tx: int, ext: int, k_steps: int, analytic_b: bool,
                 tax: float) -> float:
    """Predicted HBM planes per step for a K-fused tile: window read
    amplification + 1 write + B stream, divided by K, times the VMEM-tier
    tax (the higher vmem_limit taxes throughput ~25%, measured)."""
    amp = (tx + 2 * k_steps * ext) / tx
    b_stream = 0.0 if analytic_b else (tx + 2 * (k_steps - 1) * ext) / tx
    return (amp + 1.0 + b_stream) / k_steps * tax


def _pick_tx_k(nx: int, ny: int, nz: int, ext: int, itemsize: int, k_steps: int,
               analytic_b: bool = False, budget=None):
    """Cost-based two-tier search: within a tier the largest fitting tx has
    the lowest window amplification, so one candidate per tier is compared
    by :func:`_tile_cost_k` — a tier-2 tile (bigger budget, taxed VMEM
    limit) wins when tier-1 only fits amplification-heavy slivers (512³:
    tier-1 tx=2 at amp 4 loses to tier-2 tx=8 at amp 1.75)."""
    if budget is not None:
        for tx in (64, 32, 16, 8, 4, 2, 1):
            if nx % tx == 0 and _need_k(
                tx, ny, nz, ext, itemsize, k_steps, analytic_b
            ) <= budget:
                return tx
        return None
    best, best_cost = None, None
    for b, tax in ((_VMEM_BUDGET, 1.0), (_VMEM_BUDGET_T2, 1.25)):
        tx = _pick_tx_k(nx, ny, nz, ext, itemsize, k_steps, analytic_b, budget=b)
        if tx is None:
            continue
        cost = _tile_cost_k(tx, ext, k_steps, analytic_b, tax)
        if best_cost is None or cost < best_cost:
            best, best_cost = tx, cost
    return best


def k_fuse_supported(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                     k_steps: int, analytic_b: bool = False) -> bool:
    return _pick_tx_k(nx, ny, nz, ext, itemsize, k_steps, analytic_b) is not None


def pick_k_fuse(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                analytic_b: bool = False) -> int:
    """Choose the temporal-blocking depth by predicted per-step HBM traffic.

    cost(K) = (window amplification + 1 write + B stream) / K, with a 1.25×
    tax for tiles that need the tier-2 VMEM limit (measured overhead of the
    higher ``vmem_limit_bytes``) and an amplification cap of 2 (beyond it
    the window refetch erases the fusion gain — e.g. K=3 at tx=1). K=4 is
    excluded: measured slower than K=3 despite lower modelled traffic
    (edge-row recompute + VPU pressure; 8.88e10 vs 9.76e10 at 256³)."""
    best_k, best_cost = 1, None
    for k_steps in (3, 2):
        for budget, tax in ((_VMEM_BUDGET, 1.0), (_VMEM_BUDGET_T2, 1.25)):
            tx = _pick_tx_k(nx, ny, nz, ext, itemsize, k_steps, analytic_b,
                            budget=budget)
            if tx is None:
                continue
            if (tx + 2 * k_steps * ext) / tx > 2.0:
                continue
            cost = _tile_cost_k(tx, ext, k_steps, analytic_b, tax)
            if best_cost is None or cost < best_cost:
                best_k, best_cost = k_steps, cost
    return best_k


@functools.partial(
    jax.jit, static_argnames=("order", "scale", "k_steps", "analytic", "interpret")
)
def evolve_steps_fused_k(
    phi_xpad_k: jnp.ndarray,
    b_xpad: jnp.ndarray,
    order: str,
    scale: float,
    k_steps: int,
    analytic=None,
    interpret: bool = False,
    x_origin=None,
    edges=None,
) -> jnp.ndarray:
    """K fused sweeps in one HBM pass (ground-state path).

    Args:
      phi_xpad_k: (NX+2K·e, NY, NZ), halo rows zero (single device) or
        neighbour data (sharded callers).
      b_xpad: (NX+2(K−1)·e, NY, NZ) B array; pad rows ignored at global
        edges, neighbour B rows on interior shards.
      analytic: None, or a static tuple
        (kind, dn, dt, mass, ngx, ngy, ngz[, sig[, vshift]]) — B is then
        computed from coordinates inside the kernel and ``b_xpad`` is never
        read.
      x_origin: (1, 1) i32 global interior x offset of this block (sharded
        callers; defaults to 0).
      edges: (2, 1) i32 [at_global_lo, at_global_hi] flags controlling the
        Dirichlet masking of the block's x edges (default: both 1 — the
        single-device semantics).
    """
    ext = _EXT[order]
    nxp, ny, nz = phi_xpad_k.shape
    nx = nxp - 2 * k_steps * ext
    dtype = phi_xpad_k.dtype
    tx = _pick_tx_k(nx, ny, nz, ext, dtype.itemsize, k_steps, analytic is not None)
    if tx is None:
        raise ValueError(
            f"K={k_steps} fused sweep does not fit VMEM for plane {ny}x{nz}; "
            "reduce k_steps or use the XLA backend"
        )
    if x_origin is None:
        x_origin = jnp.zeros((1, 1), jnp.int32)
    else:
        x_origin = jnp.asarray(x_origin, jnp.int32).reshape(1, 1)
    if edges is None:
        edges = jnp.ones((2, 1), jnp.int32)
    else:
        edges = jnp.asarray(edges, jnp.int32).reshape(2, 1)

    kernel = functools.partial(
        _evolve_kernel_k,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        k_steps=k_steps,
        analytic=analytic,
    )
    mid = tx + 2 * (k_steps - 1) * ext
    # b scratch shrinks to a stub when B is computed in-kernel (its
    # y/z extents still feed the analytic-B shape computation)
    b_rows_alloc = 1 if analytic is not None else mid

    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(nx // tx,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nxp, ny, nz), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, tx + 2 * k_steps * ext, ny, nz), dtype),
                pltpu.VMEM((mid, ny, nz), dtype),
                pltpu.VMEM((b_rows_alloc, ny, nz), dtype),
                pltpu.VMEM((tx, ny, nz), dtype),
                pltpu.VMEM((k_steps * ext, ny, nz), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=_compiler_params(
                _need_k(tx, ny, nz, ext, dtype.itemsize, k_steps, analytic is not None)
            ),
        )(phi_xpad_k, b_xpad, x_origin, edges)


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "dt", "dn", "mass", "n_steps", "k_steps", "analytic", "interpret"
    ),
)
def evolve_chunk_fused_k(
    phi_xpad_k: jnp.ndarray,
    b_xpad: Optional[jnp.ndarray],
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    k_steps: int,
    analytic=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Ground-state chunk via K-step fused sweeps. ``n_steps`` need not be
    a multiple of ``k_steps``: the remainder runs as 1-step fused sweeps in
    the same chunk (identical cadence to the reference — a chunk is always
    exactly ``n_steps`` sweeps). With ``analytic`` set, B is computed
    in-kernel and ``b_xpad`` is ignored (pass None)."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    ext = _EXT[order]
    streamed = b_xpad is not None
    if b_xpad is None:
        b_xpad = jnp.zeros((1, 1, 1), dtype=phi_xpad_k.dtype)

    def body(_i, phi):
        return evolve_steps_fused_k(
            phi, b_xpad, order, scale, k_steps, analytic, interpret
        )

    phi = jax.lax.fori_loop(0, n_steps // k_steps, body, phi_xpad_k)
    rem = n_steps % k_steps
    if rem:
        extra = (k_steps - 1) * ext
        p1 = phi[extra:-extra] if extra else phi
        # b in the 1-step layout: the K layout's pad rows are ignored
        b_int = b_xpad[extra:-extra] if (streamed and extra) else (
            b_xpad if streamed else None
        )
        for _ in range(rem):
            p1, _n2, _ov = evolve_step_fused(
                p1, b_int, None, order, scale, 0, False, interpret,
                analytic=analytic,
            )
        if extra:
            phi = jnp.pad(p1, ((extra, extra), (0, 0), (0, 0)))
        else:
            phi = p1
    return phi


def to_xpad_k(phi_padded: jnp.ndarray, ext: int, k_steps: int) -> jnp.ndarray:
    """Fully-padded (N+2e)³ → K-fusion layout (N+2K·e, N, N)."""
    x = to_xpad(phi_padded, ext)
    extra = (k_steps - 1) * ext
    if extra == 0:
        return x
    return jnp.pad(x, ((extra, extra), (0, 0), (0, 0)))


def from_xpad_k(phi_xpad_k: jnp.ndarray, ext: int, k_steps: int) -> jnp.ndarray:
    """K-fusion layout → fully-padded (N+2e)³."""
    extra = (k_steps - 1) * ext
    if extra:
        phi_xpad_k = phi_xpad_k[extra:-extra]
    return from_xpad(phi_xpad_k, ext)


def b_to_xpad_k(b_int: jnp.ndarray, ext: int, k_steps: int) -> jnp.ndarray:
    """Interior B array → K-fusion layout with (K−1)·e ignored pad rows."""
    extra = (k_steps - 1) * ext
    if extra == 0:
        return b_int
    return jnp.pad(b_int, ((extra, extra), (0, 0), (0, 0)))


# --------------------------------------------------------------------------- #
# VMEM-resident chunk kernel: the whole ψ stays on-chip for a full chunk
# --------------------------------------------------------------------------- #
#
# When the x-padded ψ fits in VMEM (v5e: 128 MiB; 256³ f32 = 64.5 MiB), an
# entire ``screen_update`` chunk runs on-chip: one HBM read and one write per
# *chunk* instead of per K steps. Each grid program is one full sweep over
# all x-slabs, updated **in place** — a lag buffer carries the ``ext`` old
# planes the previous slab already overwrote, so there is zero halo
# recompute (the K-fused trapezoids recompute ~1.4× at K=3, which is what
# bounds them: the sweep is VPU-bound well below the HBM roofline).
# Measured at 256³ f32 3-point (TPU v5e): 1.16e11 updates/s vs 8.6e10 for
# the K=3 ladder. Analytic-B only (a streamed B would re-open an HBM stream
# per step); for Harmonic/NoPotential/Periodic the plane-constant part of B
# is hoisted across all steps (b = 1/(P_yz + q_x), two VPU ops per cell).
#
# This is the TPU-native counterpart of the reference's per-step rayon sweep
# (src/grid.rs:544-687) for the ground state (no per-step reductions,
# src/grid.rs:674-681 applies to excited states only).

def _harmonic_series_terms(analytic) -> Optional[int]:
    """Static choice of the divide-free Horner-B series length for the
    Harmonic resident kernels, or None → per-slab f32 divide.

    b = 1/(P_yz + q_x) = r·1/(1 + g) with r = 1/P_yz hoisted once per
    chunk and g = q_x·r; the alternating series Σ(−g)ᵏ truncated at n
    terms carries relative error ≤ g_maxⁿ⁺¹. The f32 divide is the single
    most expensive op in the resident sweep (benchmarks/vpu_probe.py
    round 4: divide-based mix 1.25e11 vs Horner 1.83e11, +46%), so any
    config whose static worst-case g needs ≤ 6 fma terms for sub-eps
    truncation takes the series. g_max = q_max/P_min with
    q_max = dt·dn²/4·dx_max² (dx_max ≤ ngx/2 + pads) and
    P_min = 1 − dt/2·vshift (the hoisted plane's minimum, dy=dz=0)."""
    _kind, dn, dt_, _mass, ngx, _ngy, _ngz = analytic[:7]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    p_min = 1.0 - 0.5 * dt_ * vshift
    if p_min <= 1e-3:
        return None
    dx_max = 0.5 * ngx + 8.0
    g_max = (0.25 * dt_ * dn * dn) * dx_max * dx_max / p_min
    if g_max >= 0.25:
        return None
    eps_half = 5.96e-8  # 0.5 · f32 eps
    n = 1
    err = g_max * g_max  # truncation after n terms: g^(n+1)
    while err > eps_half:
        n += 1
        err *= g_max
        if n > 6:
            return None
    return n


def _res_hoist_yz(kind, analytic, ny, nz, ext, y0=None, z0=None):
    """Plane-constant hoist for the resident kernels' in-kernel B: the
    value stored once in yz_buf and reused by every slab of every step.
    ``y0``/``z0`` override the padded coordinates of plane element (0, 0)
    (default ``ext`` — the single-device whole-plane layout); the
    y/z-padded resident kernel passes its shard's pad origins (traced)."""
    _kind, dn, dt_, _mass, _ngx, _ngy, _ngz = analytic[:7]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    yz = _analytic_yz(
        analytic, ny, nz,
        ext if y0 is None else y0,
        ext if z0 is None else z0,
    )
    if kind == "Harmonic":
        # b = 1/(P + q_x): P = 1 − dt/2·vshift + dt·dn²/4·(dy²+dz²);
        # when the Horner series engages the hoist is the RECIPROCAL
        # plane r = 1/P (one plane divide per chunk) — _res_b_slab
        # makes the same static choice
        p = (1.0 - 0.5 * dt_ * vshift) + (0.25 * dt_ * dn * dn) * yz
        if _harmonic_series_terms(analytic) is not None:
            return 1.0 / p
        return p
    if kind == "Periodic":
        # b = 1/(C − s_x·S): S = dt/2·sin²y·sin²z (yz is the product)
        return (0.5 * dt_) * yz
    return yz  # raw dy²+dz² for the generic per-slab B


def _res_b_slab(kind, analytic, yz_val, x0f, txs, ny, nz, ext):
    """Per-slab analytic B from the hoisted plane constant — the ONE
    source of truth for the resident-family factor arithmetic (shared by
    the whole-array and x-blocked kernels; the trajectory-equivalence
    tests assume both paths compute bit-identical factors). ``x0f`` is
    the padded x coordinate (f32, may be traced) of the slab's first
    row."""
    _kind, dn, dt_, _mass, ngx, _ngy, _ngz = analytic[:7]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    if kind == "NoPotential":
        return 1.0 / (1.0 - 0.5 * dt_ * vshift)  # python float: scalar B
    if kind == "Harmonic":
        dx = jax.lax.broadcasted_iota(jnp.int32, (txs, 1, 1), 0).astype(
            jnp.float32
        ) + (x0f - (ngx + 1.0) / 2.0)
        q = (0.25 * dt_ * dn * dn) * (dx * dx)
        n_terms = _harmonic_series_terms(analytic)
        if n_terms is not None:
            # divide-free B: yz_val is the hoisted reciprocal plane
            # r = 1/P; b = r·(1 − g + g² − …) with g = q·r — truncation
            # ≤ g_maxⁿ⁺¹ < eps/2 by the static series-length choice
            # (probe: +46% over the per-slab divide, vpu_probe.py r4)
            r = yz_val[None, :, :]
            g = q * r
            acc = 1.0 - g
            for _ in range(n_terms - 1):
                acc = 1.0 - g * acc
            return r * acc
        return 1.0 / (yz_val[None, :, :] + q)
    if kind == "Periodic":
        px = jax.lax.broadcasted_iota(jnp.int32, (txs, 1, 1), 0).astype(
            jnp.float32
        ) + x0f
        two_pi = 2.0 * 3.14159265358979323846
        sx = jnp.sin(two_pi * (px - 1.0) / (ngx - 1.0)) ** 2
        cconst = 1.0 + 0.5 * dt_ * (1.0 - vshift)
        return 1.0 / (cconst - sx * yz_val[None, :, :])
    return _analytic_b(analytic, (txs, ny, nz), x0f, ext, ext, yz=yz_val)


_RES_BUDGET = int(_os.environ.get("WAFER_RES_BUDGET_MB", "72")) * 1024 * 1024


def _pick_tx_res(nx: int, ext: int):
    """Largest slab height whose remainder (the trailing short slab) is
    either zero or wide enough for the lag/concat slices (> ext)."""
    for tx in (64, 32, 16, 8):
        if tx <= nx and tx > ext and (nx % tx == 0 or nx % tx > ext):
            return tx
    return None


def resident_supported(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                       analytic_b: bool) -> bool:
    """Whether the VMEM-resident chunk kernel applies: f32, x-padded ψ
    within the resident budget, and a slab height dividing NX. With
    ``analytic_b`` False the B array streams from HBM per slab (double-
    buffered) — one 4 B/update stream, still far under the resident
    compute rate."""
    if itemsize != 4:
        return False
    if _pick_tx_res(nx, ext) is None:
        return False
    return (nx + 2 * ext) * ny * nz * itemsize <= _RES_BUDGET


# excited-state variant: ψ resident + 2 double-buffered tx-row windows per
# stored state (l and Sl) — real VMEM use ≈ ψ + (4S+3)·tx planes
_RES_LIMIT_EXC = int(_os.environ.get("WAFER_RES_LIMIT_EXC_MB", "100")) * 1024 * 1024


def _pick_tx_res_exc(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                     n_lower: int, analytic_b: bool = True,
                     stream_itemsize: Optional[int] = None):
    plane = ny * nz * itemsize
    # l/Sl windows may stream in bf16 (half the bytes — see the bf16-stream
    # note on evolve_chunk_resident)
    splane = ny * nz * (stream_itemsize or itemsize)
    psi = (nx + 2 * ext) * plane
    extra = 0 if analytic_b else 2  # streamed-B double buffer
    for tx in (32, 16, 8, 4):
        if tx > nx or tx <= ext or not (nx % tx == 0 or nx % tx > ext):
            continue
        need = (
            psi
            + 4 * n_lower * tx * splane
            + (3 + extra) * tx * plane
        )
        if need <= _RES_LIMIT_EXC:
            return tx
    return None


def resident_exc_supported(nx: int, ny: int, nz: int, ext: int,
                           itemsize: int, n_lower: int,
                           analytic_b: bool,
                           stream_itemsize: Optional[int] = None) -> bool:
    """Excited-state resident gate: ψ on-chip plus double-buffered l/Sl
    slab windows for ``n_lower`` stored states (plus a streamed-B window
    pair when the potential has no analytic formula). ``stream_itemsize``
    reflects the l/Sl stream dtype (2 for bf16 streams)."""
    if itemsize != 4 or n_lower < 1:
        return False
    if (nx + 2 * ext) * ny * nz * itemsize > _RES_BUDGET:
        return False
    return (
        _pick_tx_res_exc(nx, ny, nz, ext, itemsize, n_lower, analytic_b,
                         stream_itemsize=stream_itemsize)
        is not None
    )


def _evolve_kernel_res(
    phi_hbm,    # (NX+2h, NY, NZ) ANY (h = halo; ext single-device)
    b_hbm,      # (NX, NY, NZ) ANY — streamed-B interior array (stub when
    # analytic: B is computed from coordinates instead)
    store_hbm,  # (S·NX, NY, NZ) ANY — lower states l_s, interior rows only
    sstore_hbm, # (S·NX, NY, NZ) ANY — swept lower states Sl_s = S(l_s)
    xorg_smem,  # (1, 1) SMEM i32 — global interior x offset (sharded)
    edge_smem,  # (2, 1) SMEM i32 — [at_global_lo, at_global_hi]
    coef0_smem, # (1+S, 1) SMEM f32 — step 0's pending [inv, corr…]
    # (identity single-device: the solver measures/normalises at the chunk
    # head; sharded per-step callers pass the previous step's psum'd coef)
    out_hbm,    # (NX+2h, NY, NZ) ANY
    red_out,    # (1+S, 1) SMEM — final step's [‖new‖², ⟨l_s|new⟩…]
    psi_buf,    # (NX+2h, NY, NZ) VMEM — resident across all grid programs
    lag,        # (ext, NY, NZ) VMEM — old planes the previous slab overwrote
    yz_buf,     # (NY, NZ) VMEM — per-kind hoisted plane constant (see below)
    racc,       # (2, 1+S) SMEM f32 — per-step reduction ping-pong
    lbuf,       # (2·S·tx, NY, NZ) VMEM — double-buffered l_s slab windows
    slbuf,      # (2·S·tx, NY, NZ) VMEM — double-buffered Sl_s slab windows
    bbuf,       # (2·tx, NY, NZ) VMEM — double-buffered B slab windows
    sem_in,
    sem_out,
    sem_l,      # DMA (2·S,)
    sem_sl,     # DMA (2·S,)
    sem_b,      # DMA (2,)
    land,       # (4·halo, NY, NZ) VMEM — ICI landing strips (2 parity
    # slots × 2 sides); (1,1,1) dummy when ici_r == 0
    sem_snd,    # DMA (2,) — ICI send (one per direction)
    sem_rcv,    # DMA (4,) — ICI recv, indexed parity·2 + side (0: lo, 1: hi)
    scal_snd,   # (1, 128) VMEM f32 — staged per-step reduction partials
    # (lanes 0..S) for the scalar all-to-all (sharded excited/psn ici mode)
    scal_land,  # (2·nsh, 128) VMEM f32 — parity-slotted landing rows, one
    # per peer (row = slot·nsh + sender)
    sem_sc_snd,  # DMA (1,)
    sem_sc_rcv,  # DMA (2·nsh,) — indexed parity·nsh + sender
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    analytic,
    nx: int,
    with_norm: bool = False,
    n_lower: int = 0,
    halo: int = 0,
    ici_r: int = 0,
    ici_axis: Optional[str] = None,
    ici_nsh: int = 1,
):
    # Sharded mode (halo = R·ext > ext): the buffer carries a deep halo of
    # neighbour data exchanged once per R = n_steps in-kernel steps. The
    # sweep runs blind over every non-edge row: rows within t·ext of the
    # buffer edge go stale at step t, but any row read by a still-valid row
    # was itself valid one step earlier, so after R steps the interior is
    # exact (the standard deep-ghost-zone argument). Global-edge shards
    # re-zero their halo side each step — the Dirichlet condition the
    # exchange's zero-fill established at step 0.
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    ny, nz = psi_buf.shape[1], psi_buf.shape[2]
    if analytic is not None:
        kind, dn, dt_, _mass, ngx, _ngy, _ngz = analytic[:7]
        vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    else:
        kind = None  # streamed B
    halo = halo or ext
    # padded x coordinate of psi_buf row 0: row ``halo`` is interior row 0,
    # i.e. padded coordinate ext + xorg (matches models/potentials.generate)
    x_row0 = (
        xorg_smem[0, 0].astype(jnp.float32) + jnp.float32(ext - halo)
    )
    # static slab plan: full tx-row slabs plus one remainder slab (the
    # picker guarantees any remainder exceeds ext, so the lag/concat slices
    # stay well-formed)
    slabs = [(ext + s * tx, tx) for s in range(nx // tx)]
    if nx % tx:
        slabs.append((ext + (nx // tx) * tx, nx % tx))
    nslabs = len(slabs)
    nxp_all = psi_buf.shape[0]

    # The chunk's one HBM load rides the first sweep: per-slab segments
    # are all started up front, and the first step's slab loop waits only
    # the segment it is about to read — everything later streams in behind
    # the compute (measured: the whole-buffer load+wait serialised ~8% of
    # a sharded R=8 call). seg 0 carries the leading halo, the last seg
    # the trailing halo.
    seg_lo = [0] + [rs for rs, _t in slabs[1:]]
    seg_hi = seg_lo[1:] + [nxp_all]

    def in_seg(s):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(seg_lo[s], seg_hi[s] - seg_lo[s])],
            psi_buf.at[pl.ds(seg_lo[s], seg_hi[s] - seg_lo[s])],
            sem_in.at[s],
        )

    @pl.when(i == 0)
    def _load():
        for s in range(nslabs):
            in_seg(s).start()
        in_seg(0).wait()
        if kind is None:
            yz_buf[...] = jnp.zeros_like(yz_buf)
            return
        yz_buf[...] = _res_hoist_yz(kind, analytic, ny, nz, ext)

    if ici_r > 0:
        # In-kernel ICI halo exchange (sharded ground resident mode): at
        # every window boundary the interior edge strips — exact after the
        # window's ici_r blind steps (the deep-ghost-zone argument) — are
        # remote-DMA'd to both ring neighbours' parity-slotted landing
        # strips, which then become the new deep halo. ψ never leaves VMEM
        # between the chunk's load and store. The ring wraps at the global
        # edges; edge shards re-mask their halo with the Dirichlet zeros
        # right after the copy (and after every step below). Slot safety:
        # a neighbour's window-(w+1) send needs its window-w recv, which
        # needs my window-w send, which follows my window-(w−1) landing
        # read — a slot is never overwritten before it is consumed (two
        # parity slots suffice; validated bit-exact under the interpret
        # race detector). Recv semaphores are indexed (parity, side): a
        # counting wait on one shared semaphore could be satisfied by a
        # neighbour's NEXT window's signal while this window's strip was
        # still in flight (signals from separate DMAs are unordered), and
        # the landing read would see the stale other-parity slot; with a
        # per-(parity, side) semaphore, the only signal that can exist at
        # window w's wait is window w's (the neighbour cannot reach window
        # w+2 — the next same-parity send — before my w+1 send). Across
        # chunk calls the host-side initial deep-halo ppermute is the
        # barrier.
        nxp_k = psi_buf.shape[0]

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
            base = slot * jnp.int32(2 * halo)
            d_r = pltpu.make_async_remote_copy(
                psi_buf.at[pl.ds(nxp_k - 2 * halo, halo)],
                land.at[pl.ds(base, halo)],
                sem_snd.at[0],
                sem_rcv.at[slot * jnp.int32(2)],
                device_id={ici_axis: right},
            )
            d_l = pltpu.make_async_remote_copy(
                psi_buf.at[pl.ds(halo, halo)],
                land.at[pl.ds(base + jnp.int32(halo), halo)],
                sem_snd.at[1],
                sem_rcv.at[slot * jnp.int32(2) + jnp.int32(1)],
                device_id={ici_axis: left},
            )
            d_r.start()
            d_l.start()
            d_r.wait_send()
            d_l.wait_send()
            d_r.wait_recv()  # my lo landing (sent by my left neighbour)
            d_l.wait_recv()  # my hi landing (sent by my right neighbour)

            @pl.when(slot == 0)
            def _land0():
                psi_buf[0:halo] = land[0:halo]
                psi_buf[nxp_k - halo : nxp_k] = land[halo : 2 * halo]

            @pl.when(slot == 1)
            def _land1():
                psi_buf[0:halo] = land[2 * halo : 3 * halo]
                psi_buf[nxp_k - halo : nxp_k] = land[3 * halo : 4 * halo]

            @pl.when(edge_smem[0, 0] == 1)
            def _mask_lo():
                psi_buf[0:halo] = jnp.zeros((halo, ny, nz), psi_buf.dtype)

            @pl.when(edge_smem[1, 0] == 1)
            def _mask_hi():
                psi_buf[nxp_k - halo : nxp_k] = jnp.zeros(
                    (halo, ny, nz), psi_buf.dtype
                )

    # Sharded ici mode with per-step reductions (excited / per-step-norm):
    # the coefficient recursion needs GLOBAL sums every step. Each device
    # stages its step-t partials into a 128-lane vector and remote-DMAs it
    # to every mesh peer's parity-slotted landing row (all-to-all of
    # (1+S)·4 bytes, self included for uniform semaphore counts); step t+1
    # begins by waiting each sender's incoming row of parity t%2 and
    # reducing them. Slot safety is the same two-parity chain as the ψ
    # strips: a peer's t+2 send (overwriting parity t%2) happens after its
    # t+2-start waits, which need my t+1 sends, which follow my t+1-start
    # read of parity t%2. The recv semaphores are indexed (parity, sender)
    # — one shared counting semaphore could reach its count with a fast
    # peer's step-(t+1) signal substituting for a slow peer's step-t one
    # (signals from separate DMAs are unordered), and the reduction would
    # read the slow peer's stale same-parity row from step t−2; with a
    # per-(parity, sender) semaphore the only signal that can exist at
    # step t's wait is that sender's step-t send (the two-parity chain
    # forbids it reaching step t+2). Across chunk calls the driver's
    # measure psum (or the seeding ppermute) is the barrier.
    ici_scal = ici_r > 0 and ici_nsh > 1 and (with_norm or n_lower > 0)
    if ici_scal:
        my_sc = jax.lax.axis_index(ici_axis).astype(jnp.int32)

        def _scal_copy(sender, tgt, slot_):
            """Descriptor for ``sender``'s staged row landing in the
            (parity, sender)-slotted row + recv semaphore on ``tgt``.
            Sends pass ``sender = my_sc``; waits pass the peer being
            waited on (``tgt``/``device_id`` is then irrelevant — the wait
            touches only the local semaphore)."""
            idx = slot_ * jnp.int32(ici_nsh) + sender
            return pltpu.make_async_remote_copy(
                scal_snd.at[pl.ds(0, 1)],
                scal_land.at[pl.ds(idx, 1)],
                sem_sc_snd.at[0],
                sem_sc_rcv.at[idx],
                device_id={ici_axis: tgt},
            )

        def _scal_send(k, slot_):
            tgt = jax.lax.rem(my_sc + jnp.int32(k), jnp.int32(ici_nsh))
            return _scal_copy(my_sc, tgt, slot_)

        def _scal_global(slot_):
            """Sum the nsh landed partial rows of the given parity: a
            (1+S)-vector of global reductions, read per lane."""
            rows = scal_land[...]
            par = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (2 * ici_nsh, 128), 0
                )
                // jnp.int32(ici_nsh)
            )
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (2 * ici_nsh, 128), 1
            )
            sel = par == slot_
            return [
                jnp.sum(
                    jnp.where(
                        jnp.logical_and(sel, lane == st), rows,
                        jnp.float32(0.0),
                    )
                )
                for st in range(1 + n_lower)
            ]

    # Per-step renormalise(+project) carried across grid programs (the
    # 1-step kernel's coefficient recursion, evolve_chunk_fused): the sweep
    # is linear, so the correction of step t applies to step t's *output*:
    #   ψ_{t+1}^raw = inv_t·S(ψ_t^raw) − Σ_s corr_{t,s}·Sl_s
    # with inv/corr computed from the previous program's fused reductions —
    # exact per-step reference semantics (src/grid.rs:674-681), no Gram
    # reconstruction (unlike kgs, no cancellation guard needed).
    if with_norm or n_lower > 0:
        slot = jax.lax.rem(i, jnp.int32(2))
        prev = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
        if ici_scal:

            @pl.when(i > 0)
            def _wait_prev_scal():
                for _k in range(ici_nsh):
                    _scal_copy(jnp.int32(_k), my_sc, prev).wait_recv()

            g_prev = _scal_global(prev)
            prev_n2 = g_prev[0]
            prev_ov = g_prev[1:]
        else:
            prev_n2 = racc[prev, 0]
            prev_ov = [racc[prev, 1 + st] for st in range(n_lower)]
        inv_rec = jax.lax.rsqrt(
            jnp.maximum(prev_n2, jnp.float32(1e-37))
        )
        inv = jnp.where(i == 0, coef0_smem[0, 0], inv_rec)
        corr = [
            jnp.where(
                i == 0, coef0_smem[1 + st, 0], prev_ov[st] * inv_rec
            )
            for st in range(n_lower)
        ]
        racc[slot, 0] = jnp.float32(0.0)
        for st in range(n_lower):
            racc[slot, 1 + st] = jnp.float32(0.0)

    # lower-state slab windows: interior rows only (the correction touches
    # written rows, the reductions read the same rows — no halo overlap),
    # double-buffered so the next slab's DMA rides this slab's compute
    if n_lower > 0:
        def l_dma(s_idx, st, bslot, swept):
            rs_s, tx_s = slabs[s_idx]
            src = sstore_hbm if swept else store_hbm
            buf = slbuf if swept else lbuf
            sem = sem_sl if swept else sem_l
            j = bslot * n_lower + st
            return pltpu.make_async_copy(
                src.at[pl.ds(st * nx + rs_s - ext, tx_s)],
                buf.at[pl.ds(j * tx, tx_s)],
                sem.at[j],
            )

        for st in range(n_lower):
            l_dma(0, st, 0, False).start()
            l_dma(0, st, 0, True).start()

    if kind is None:
        def b_dma(s_idx, bslot):
            rs_s, tx_s = slabs[s_idx]
            return pltpu.make_async_copy(
                b_hbm.at[pl.ds(rs_s - ext, tx_s)],
                bbuf.at[pl.ds(bslot * tx, tx_s)],
                sem_b.at[bslot],
            )

        b_dma(0, 0).start()

    # one sweep, ascending slabs, in place. The lag seed rows [0, ext) are
    # the Dirichlet zeros single-device (never written) or stale-but-valid
    # neighbour data in sharded deep-halo mode.
    plain_store = not (with_norm or n_lower > 0)
    lag[...] = psi_buf[0:ext]
    for s, (rs, txs) in enumerate(slabs):
        bslot = s % 2
        if s + 1 < nslabs:

            @pl.when(i == 0)
            def _wait_next_seg(_s=s + 1):
                in_seg(_s).wait()

        if n_lower > 0:
            if s + 1 < nslabs:
                for st in range(n_lower):
                    l_dma(s + 1, st, (s + 1) % 2, False).start()
                    l_dma(s + 1, st, (s + 1) % 2, True).start()
            for st in range(n_lower):
                l_dma(s, st, bslot, False).wait()
                l_dma(s, st, bslot, True).wait()
        if kind is None:
            if s + 1 < nslabs:
                b_dma(s + 1, (s + 1) % 2).start()
            b_dma(s, bslot).wait()
        c = psi_buf[rs : rs + txs]
        acc = (-float(center_c)) * c
        for off, cf in zip(offsets, coeffs):
            cf = float(cf)
            xm = _lag_xm(lag, psi_buf, rs, txs, off, ext)
            xp = psi_buf[rs + off : rs + txs + off]
            acc += cf * (xm + xp)
            acc += cf * (_shift_y(c, off) + _shift_y(c, -off))
            acc += cf * (_shift_z(c, off) + _shift_z(c, -off))
        if kind is None:
            b = bbuf[bslot * tx : bslot * tx + txs]
        else:
            b = _res_b_slab(
                kind, analytic, yz_buf[...], x_row0 + jnp.float32(rs), txs,
                ny, nz, ext,
            )
        new = b * (2.0 * c + scale * acc) - c
        if with_norm or n_lower > 0:
            new = inv * new
            for st in range(n_lower):
                j = bslot * n_lower + st
                # l/Sl may stream in bf16 (half the HBM bytes); compute in
                # the ψ dtype
                new = new - corr[st] * slbuf[j * tx : j * tx + txs].astype(
                    new.dtype
                )
            # deep-halo mode: reductions count only true-interior rows
            # [halo, nxp−halo) — halo rows are the neighbour's interior
            # (double-count) and go progressively stale. Slab bounds are
            # static, so the valid range is a compile-time slice.
            v_lo = max(rs, halo) - rs
            v_hi = min(rs + txs, nxp_all - halo) - rs
            if v_hi > v_lo:
                nm = new[v_lo:v_hi] if halo > ext else new
                racc[slot, 0] += jnp.sum(nm * nm)
                for st in range(n_lower):
                    j = bslot * n_lower + st
                    lwin = lbuf[j * tx : j * tx + txs].astype(new.dtype)
                    lw = lwin[v_lo:v_hi] if halo > ext else lwin
                    racc[slot, 1 + st] += jnp.sum(lw * nm)
        lag[...] = psi_buf[rs + txs - ext : rs + txs]  # old top rows, pre-write
        psi_buf[rs : rs + txs] = new
        if plain_store:
            # plain ground mode: the chunk's one HBM store rides the last
            # sweep — final interior rows go out as soon as they are
            # written (halo-side rows follow after the Dirichlet re-zero)
            olo = max(rs, halo)
            ohi = min(rs + txs, nxp_all - halo)
            if ohi > olo:

                @pl.when(i == n_steps - 1)
                def _store_slab(_lo=olo, _hi=ohi, _s=s):
                    pltpu.make_async_copy(
                        psi_buf.at[pl.ds(_lo, _hi - _lo)],
                        out_hbm.at[pl.ds(_lo, _hi - _lo)],
                        sem_out.at[_s],
                    ).start()

    if ici_scal:
        # broadcast this step's partials to every peer (self included):
        # stage the SMEM scalars into lanes 0..S of a 128-lane vector and
        # remote-DMA it to each peer's parity-slotted landing row
        lane_1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        vec = jnp.zeros((1, 128), jnp.float32)
        for st in range(1 + n_lower):
            vec = jnp.where(lane_1 == st, racc[slot, st], vec)
        scal_snd[...] = vec
        for k in range(ici_nsh):
            _scal_send(k, slot).start()
        for k in range(ici_nsh):
            _scal_send(k, slot).wait_send()

        @pl.when(i == n_steps - 1)
        def _wait_last_scal():
            # the final step's global sums are consumed below (red_out /
            # the with_norm rescale), not by a next program
            for _k in range(ici_nsh):
                _scal_copy(jnp.int32(_k), my_sc, slot).wait_recv()

    if halo > ext:
        # deep-halo Dirichlet: global-edge shards re-zero their halo side
        # after every step (the blind sweep wrote into it)
        nxp_rows = psi_buf.shape[0]

        @pl.when(edge_smem[0, 0] == 1)
        def _dirichlet_lo():
            psi_buf[0:halo] = jnp.zeros((halo, ny, nz), psi_buf.dtype)

        @pl.when(edge_smem[1, 0] == 1)
        def _dirichlet_hi():
            psi_buf[nxp_rows - halo : nxp_rows] = jnp.zeros(
                (halo, ny, nz), psi_buf.dtype
            )

    @pl.when(i == n_steps - 1)
    def _store():
        if (n_lower > 0 or with_norm) and ici_scal:
            fin = _scal_global(slot)  # globally-summed final reductions
        elif n_lower > 0 or with_norm:
            fin = [racc[slot, st] for st in range(1 + n_lower)]
        if n_lower > 0:
            # the last step's pending normalise+project needs the *unswept*
            # lower states — materialised by the host wrapper from these
            red_out[0, 0] = fin[0]
            for st in range(n_lower):
                red_out[1 + st, 0] = fin[1 + st]
        elif with_norm:
            # materialise the final pending rescale before the copy-out
            # (evolve_chunk_fused's trailing ``phi * coef``)
            r = jax.lax.rsqrt(
                jnp.maximum(fin[0], jnp.float32(1e-37))
            )
            for rs, txs in slabs:
                psi_buf[rs : rs + txs] = r * psi_buf[rs : rs + txs]
            red_out[0, 0] = fin[0]
        else:
            red_out[0, 0] = jnp.float32(0.0)
        if plain_store:
            # the interior went out per slab during the sweep; the halo-
            # side rows (post-re-zero) and the drains finish the chunk
            pltpu.make_async_copy(
                psi_buf.at[pl.ds(0, halo)],
                out_hbm.at[pl.ds(0, halo)],
                sem_out.at[nslabs],
            ).start()
            pltpu.make_async_copy(
                psi_buf.at[pl.ds(nxp_all - halo, halo)],
                out_hbm.at[pl.ds(nxp_all - halo, halo)],
                sem_out.at[nslabs + 1],
            ).start()
            for s in range(nslabs):
                rs, txs = slabs[s]
                olo = max(rs, halo)
                ohi = min(rs + txs, nxp_all - halo)
                if ohi > olo:
                    pltpu.make_async_copy(
                        psi_buf.at[pl.ds(olo, ohi - olo)],
                        out_hbm.at[pl.ds(olo, ohi - olo)],
                        sem_out.at[s],
                    ).wait()
            pltpu.make_async_copy(
                psi_buf.at[pl.ds(0, halo)],
                out_hbm.at[pl.ds(0, halo)],
                sem_out.at[nslabs],
            ).wait()
            pltpu.make_async_copy(
                psi_buf.at[pl.ds(nxp_all - halo, halo)],
                out_hbm.at[pl.ds(nxp_all - halo, halo)],
                sem_out.at[nslabs + 1],
            ).wait()
        else:
            cp = pltpu.make_async_copy(psi_buf, out_hbm, sem_out.at[nslabs])
            cp.start()
            cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dn", "mass", "n_steps", "analytic",
                     "interpret", "per_step_norm", "halo", "raw_reductions",
                     "ici_steps", "ici_axis", "ici_nsh"),
)
def evolve_chunk_resident(
    phi_xpad: jnp.ndarray,
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    analytic,
    interpret: bool = False,
    per_step_norm: bool = False,
    store_xpad: Optional[jnp.ndarray] = None,
    sstore_xpad: Optional[jnp.ndarray] = None,
    b_int: Optional[jnp.ndarray] = None,
    x_origin=None,
    edges=None,
    halo: int = 0,
    coef0=None,
    raw_reductions: bool = False,
    ici_steps: int = 0,
    ici_axis: Optional[str] = None,
    ici_nsh: int = 1,
):
    """A full chunk of ``n_steps`` sweeps with ψ VMEM-resident.

    ``phi_xpad``: (NX+2e, NY, NZ) x-padded layout (:func:`to_xpad`), halo
    rows zero. Requires an analytic potential (``analytic`` as in
    :func:`evolve_steps_fused_k`); callers gate on
    :func:`resident_supported` / :func:`resident_exc_supported`.
    Trajectory-identical to ``n_steps`` applications of the 1-step sweep
    (same per-step math and Dirichlet handling; reference cadence
    src/grid.rs:544-687). ``per_step_norm`` renormalises after every step
    like the reference's excited states (src/grid.rs:674-681) — the f32
    scale-drift guard — by carrying the inverse norm across grid programs
    in SMEM.

    Excited states: pass ``store_xpad`` (S, NX+2e, NY, NZ) stacked lower
    states and ``sstore_xpad`` their swept images S(l_s) (one 1-step sweep
    each, computed once per solve). ψ stays resident while tx-row windows
    of l/Sl stream per slab (double-buffered DMA); per-step coefficients
    come from the in-kernel reductions — the exact recursion of
    :func:`evolve_chunk_fused` (normalise-then-project per step,
    src/grid.rs:674-681) with the final pending correction materialised
    here from the kernel's reduction outputs.

    Without an analytic formula pass ``b_int`` (the interior B array,
    :func:`geometry.work_area` of models.potentials.build_ab's B) and
    ``analytic=None``: tx-row B windows then stream from HBM per slab,
    double-buffered — the only per-step HBM stream.

    Sharded callers pass ``halo = n_steps·ext`` (the deep ghost zone their
    ppermute exchange filled), the block's traced global ``x_origin``
    (analytic-B coordinates), and ``edges`` flags for the global Dirichlet
    masking — see parallel/sharded.py. ``phi_xpad`` is then
    (BX+2·halo, NY, NZ) and the interior is exact after the n_steps
    in-kernel sweeps.

    In-kernel ICI mode (``ici_steps > 0``, sharded callers): the chunk
    spans ``n_steps // ici_steps`` exchange windows; at every window
    boundary the still-exact interior edge strips ride remote DMAs into
    parity-slotted landing strips on the ring neighbours — ψ never
    returns to HBM inside the chunk. With per-step reductions (excited
    states / ``per_step_norm``) each step additionally all-to-alls its
    (1+S) reduction partials so the coefficient recursion uses GLOBAL
    sums (reference per-step Gram-Schmidt semantics, src/grid.rs:674-681,
    across shards); reductions count only true-interior rows, and the
    deep-padded ``store_xpad``/``sstore_xpad``/ψ halos carry real
    neighbour rows. ``red_out`` is then already globally summed — callers
    must not psum it again."""
    ext = _EXT[order]
    nxp, ny, nz = phi_xpad.shape
    nx = nxp - 2 * ext  # rows swept per step (includes deep-halo rows)
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    n_lower = 0 if store_xpad is None else store_xpad.shape[0]
    dtype = phi_xpad.dtype
    if analytic is None and b_int is None:
        raise ValueError("resident sweep needs either analytic or b_int")
    if halo and analytic is None:
        raise ValueError("sharded resident mode is analytic-B only")
    if halo and (n_lower > 0 or per_step_norm) and not ici_steps:
        # per-step global reductions inside an exchange window need the
        # in-kernel scalar all-to-all (ici mode)
        raise ValueError(
            "deep-halo excited/per-step-norm needs ici_steps > 0"
        )
    if ici_steps:
        # in-kernel ICI exchange mode: the chunk spans n_steps//ici_steps
        # exchange windows with ψ VMEM-resident throughout; the deep halo
        # must be exactly one window's ghost zone
        if halo != ici_steps * ext:
            raise ValueError("ici mode requires halo == ici_steps*ext")
        if n_steps % ici_steps:
            raise ValueError("ici mode requires n_steps % ici_steps == 0")
        if ici_axis is None:
            raise ValueError("ici mode requires the mesh axis name")
    if x_origin is None:
        x_origin = jnp.zeros((1, 1), jnp.int32)
    else:
        x_origin = jnp.asarray(x_origin, jnp.int32).reshape(1, 1)
    if edges is None:
        edges = jnp.ones((2, 1), jnp.int32)
    else:
        edges = jnp.asarray(edges, jnp.int32).reshape(2, 1)
    if coef0 is None:
        coef0 = jnp.concatenate(
            [
                jnp.ones((1, 1), jnp.float32),
                jnp.zeros((n_lower, 1), jnp.float32),
            ]
        )
    else:
        coef0 = jnp.asarray(coef0, jnp.float32).reshape(-1, 1)
    if n_lower > 0:
        # stored states may arrive in bf16 (the bf16-stream mode: half the
        # per-step HBM bytes for the l/Sl streams; the kernel computes in
        # the ψ dtype) — the windows' scratch dtype follows the store
        stream_dtype = store_xpad.dtype
        if sstore_xpad.dtype != stream_dtype:
            # a mismatch surfaces as a Mosaic-internal "DMA source and
            # target element type mismatch" — fail with the real cause
            raise ValueError(
                f"store/sstore dtype mismatch: {store_xpad.dtype} vs "
                f"{sstore_xpad.dtype} (the l/Sl streams must share a dtype)"
            )
        tx = _pick_tx_res_exc(
            nx, ny, nz, ext, dtype.itemsize, n_lower, analytic is not None,
            stream_itemsize=stream_dtype.itemsize,
        )
        store_int = store_xpad[:, ext : nxp - ext].reshape(
            n_lower * nx, ny, nz
        )
        sstore_int = sstore_xpad[:, ext : nxp - ext].reshape(
            n_lower * nx, ny, nz
        )
    else:
        stream_dtype = dtype
        tx = _pick_tx_res(nx, ext)
        store_int = sstore_int = jnp.zeros((1, 1, 1), dtype)
    if tx is None:
        raise ValueError(f"no resident slab height fits for NX={nx}")
    if analytic is None:
        b_arg, brows = b_int, 2 * tx
    else:
        b_arg, brows = jnp.zeros((1, 1, 1), dtype), 1
    kernel = functools.partial(
        _evolve_kernel_res,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        analytic=analytic,
        nx=nx,
        with_norm=per_step_norm,
        n_lower=n_lower,
        halo=halo,
        ici_r=ici_steps,
        ici_axis=ici_axis,
        ici_nsh=ici_nsh,
    )
    plane = ny * nz * dtype.itemsize
    splane = ny * nz * stream_dtype.itemsize
    land_rows = 4 * halo if ici_steps else 1
    need = (
        (nxp + ext + 4 * tx) * plane
        + 4 * n_lower * tx * splane
        + (0 if analytic is not None else 2) * tx * plane
        + (land_rows * plane if ici_steps else 0)
        + ny * nz * 4
    )
    lrows = max(2 * n_lower * tx, 1)
    nslabs_res = nx // tx + (1 if nx % tx else 0)
    with jax.enable_x64(False):
        out, red = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nxp, ny, nz), dtype),
                jax.ShapeDtypeStruct((1 + n_lower, 1), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nxp, ny, nz), dtype),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.VMEM((ny, nz), jnp.float32),
                pltpu.SMEM((2, 1 + n_lower), jnp.float32),
                pltpu.VMEM((lrows, ny, nz), stream_dtype),
                pltpu.VMEM((lrows, ny, nz), stream_dtype),
                pltpu.VMEM((brows, ny, nz), dtype),
                pltpu.SemaphoreType.DMA((nslabs_res,)),
                pltpu.SemaphoreType.DMA((nslabs_res + 2,)),
                pltpu.SemaphoreType.DMA((max(2 * n_lower, 1),)),
                pltpu.SemaphoreType.DMA((max(2 * n_lower, 1),)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM(
                    (land_rows, ny, nz) if ici_steps else (1, 1, 1), dtype
                ),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((4,)),  # recv: parity·2 + side
                pltpu.VMEM((1, 128), jnp.float32),
                pltpu.VMEM((max(2 * ici_nsh, 2), 128), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
                # scalar recv: parity·nsh + sender
                pltpu.SemaphoreType.DMA((max(2 * ici_nsh, 1),)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(phi_xpad, b_arg, store_int, sstore_int, x_origin, edges, coef0)
    if raw_reductions:
        # sharded per-step callers: the pending correction needs globally
        # psum'd reductions — return the raw output + local partials
        return out, red
    if n_lower == 0:
        return out
    # materialise the last step's pending correction (the unswept basis)
    inv = jax.lax.rsqrt(jnp.maximum(red[0, 0], jnp.float32(1e-37))).astype(
        dtype
    )
    coefs = (red[1:, 0] * inv).astype(dtype)
    proj = jnp.tensordot(coefs, store_xpad, axes=1)
    return out * inv - proj


# --------------------------------------------------------------------------- #
# x-blocked deep-halo resident kernel: resident-class throughput for grids
# whose ψ exceeds VMEM (512³, 288³+)
# --------------------------------------------------------------------------- #
#
# The whole-array resident kernel caps out where the x-padded ψ no longer
# fits on-chip (~268³ f32 at the 72 MiB budget); beyond it the K≤3 ladder is
# VPU/recompute-bound far below the resident rate. This kernel reuses the
# sharded path's deep-ghost-zone blind sweep (see _evolve_kernel_res,
# ``halo = R·ext``) *within one chip*: NX is split into VMEM-sized x-blocks,
# each block is loaded with an R·ext-deep ghost zone, swept blind R times
# entirely in VMEM (zero halo recompute inside the block — the lag-buffer
# in-place schedule), and its interior written back. One pass is
# out-of-place (in → out), so every block's ghost rows are pre-pass data and
# the deep-ghost-zone argument applies exactly: after R steps the block
# interior is bit-identical to R unblocked sweeps. HBM traffic per step ≈
# (1 + 1 + 2R·ext/BX)/R planes (vs the K=2 ladder's ~1.5); the VPU
# recompute amplification is (BX + 2(R−1)·ext)/BX.
#
# Grid = (n_blocks, R): the block dim is outer, the step dim inner; the
# VMEM block buffer persists across the R step programs (the TPU grid is
# sequential). Global-edge blocks re-zero their Dirichlet side after every
# step — exactly the single-device semantics the halo rows of the deep
# layout encode (reference seam: src/config.rs:222-239, src/grid.rs:505-534).
# Ground state, f32, analytic-B only (a streamed B would re-open a per-step
# HBM stream; those grids keep the K ladder).


# Total scoped-VMEM cap for the blocked kernel: block buffer + slab
# temporaries must leave Mosaic register/spill headroom within the 128 MiB
# v5e VMEM (a 512³ bx=64 tile with tx=64 slabs spilled 65 MiB and failed).
# Measured on-chip: a (64,4,8) tile with a 125 MiB computed limit compiles
# and runs (the hard wall is the 128 MiB VMEM itself; the tx-induced
# register spill is what kills tall slabs).
_RESB_NEED_CAP = int(
    _os.environ.get("WAFER_RESB_NEED_CAP_MB", "126")
) * 1024 * 1024

# ψ-block cap for pick_resb. The blocked kernel's real constraint is the
# need formula above (buffer + temporaries ≤ 126 MiB), NOT the whole-chunk
# kernel's 72 MiB _RES_BUDGET it originally inherited — deeper windows
# amortise the serial block DMA over more blind sweeps. Measured (512³,
# v5e, round 5): (64,4,8) under the 72 MiB cap = 8.40e10 updates/s;
# (64,8,4) at an 80 MiB block = 9.97e10 (+19%, dev vs XLA 2.5e-07).
_RESB_PSI_CAP = int(
    _os.environ.get("WAFER_RESB_PSI_MB", "102")
) * 1024 * 1024

# Fixed per-block-pass overhead (DMA issue, semaphore waits, grid
# re-entry), in VPU-row-equivalents — fitted on-chip at 512³ round 5:
# (64,4,8) 8.40e10 / (64,7,4) 9.50e10 / (64,8,4) 9.97e10 / (32,8,8)
# 8.21e10 give c0 ≈ 131; without it the model preferred (64,7) over the
# measured-faster (64,8) and under-rewarded deep windows generally.
_RESB_PASS_OVERHEAD_ROWS = 131.0


def _pick_tx_resb(bxp: int, ext: int, h: int, plane: int):
    """Largest slab height whose block buffer + ~6 slab-sized temporaries
    stay under the blocked kernel's VMEM cap (plane-size aware — at 512³ a
    plane is 1 MiB and tall slabs spill)."""
    rows = bxp - 2 * ext
    for tx in (64, 32, 16, 8, 4):
        if tx > rows or tx <= ext or not (rows % tx == 0 or rows % tx > ext):
            continue
        if (bxp + ext + h + 6 * tx) * plane <= _RESB_NEED_CAP:
            return tx
    return None


def pick_resb(nx: int, ny: int, nz: int, ext: int, itemsize: int,
              n_steps: int):
    """(bx, r, tx, modeled_rate) for the x-blocked resident kernel, or None.

    Returns (bx, r, tx, prefetch, modeled_rate). The model scores bx·r
    useful row-updates per block-pass against the VPU recompute rows
    r·(bx+2(r−1)e) plus the DMA cost — measured on-chip (512³): without the
    staging buffer the load/store do NOT overlap compute (Mosaic serialises
    the in-place buffer traffic), costing ~0.73 VPU-row-equivalents per DMA
    row; with ``prefetch`` (a second block-sized buffer staging the next
    block's window during compute) only the VMEM→VMEM install copy
    (~0.25·bxp rows) remains. Requires ≥2 blocks (one block ≡ the plain
    resident kernel)."""
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
            if bxp * plane > _RESB_PSI_CAP:
                continue
            vpu_rows = r * (bx + 2 * (r - 1) * ext)
            c0 = _RESB_PASS_OVERHEAD_ROWS
            # Default: the serial schedule. Every overlap variant measured
            # on-chip (512³: per-slab JIT waits, a staging buffer, and a
            # two-buffer ping-pong) failed to hide the block DMA behind
            # the in-place sweeps — best measured serial (64,4,8) 7.95e10
            # vs 5.6-7.2e10 for the overlap variants. The ping-pong path
            # survives behind WAFER_RESB_PREFETCH=1 for future probing.
            if _os.environ.get("WAFER_RESB_PREFETCH") == "1":
                tx_pf = None
                if 2 * bxp * plane <= _RES_BUDGET:
                    rows = bxp - 2 * ext
                    for cand in (64, 32, 16, 8, 4):
                        if cand > rows or cand <= ext or not (
                            rows % cand == 0 or rows % cand > ext
                        ):
                            continue
                        if (2 * bxp + ext + h + 6 * cand) * plane <= (
                            _RESB_NEED_CAP
                        ):
                            tx_pf = cand
                            break
                if tx_pf is not None:
                    rate = bx * r / (vpu_rows + 0.25 * bxp + c0)
                    if rate > best_rate:
                        best, best_rate = (bx, r, tx_pf, True), rate
            tx = _pick_tx_resb(bxp, ext, h, plane)
            if tx is not None:
                rate = bx * r / (vpu_rows + 0.73 * (bxp + bx) + c0)
                if rate > best_rate:
                    best, best_rate = (bx, r, tx, False), rate
    if best is None:
        return None
    return best[0], best[1], best[2], best[3], best_rate


def resident_blocked_supported(nx: int, ny: int, nz: int, ext: int,
                               itemsize: int, n_steps: int,
                               analytic_b: bool) -> bool:
    return analytic_b and pick_resb(nx, ny, nz, ext, itemsize, n_steps) is not None


def _evolve_kernel_resb(
    phi_hbm,    # (NX+2H, NY, NZ) ANY — deep x-padded layout, H = R·ext
    xorg_smem,  # (1, 1) SMEM i32 — shard's global interior x origin
    edge_smem,  # (2, 1) SMEM i32 — [at_global_lo, at_global_hi]
    out_hbm,    # (NX+2H, NY, NZ) ANY
    psi_a,      # (BX+2H, NY, NZ) VMEM — block buffer (slot 0)
    psi_b,      # (BX+2H, NY, NZ) VMEM — slot-1 buffer (1-row stub when the
    # ping-pong prefetch is off)
    lag,        # (ext, NY, NZ) VMEM
    yz_buf,     # (NY, NZ) VMEM — hoisted plane-constant (see _evolve_kernel_res)
    zeros_halo, # (H, NY, NZ) VMEM
    sem_in,     # DMA (2·nslabs,)
    sem_out,    # DMA (2·nslabs,)
    sem_halo,
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
    # 1-D grid (the proven-overlap layout: Mosaic's cross-program DMA
    # pipelining engages on flat grids); (block, step) derived
    idx = pl.program_id(0)
    nblk = pl.num_programs(0) // r_steps
    i = idx // r_steps         # block index (outer)
    t = idx - i * r_steps      # in-block step (inner, sequential)
    ny, nz = psi_a.shape[1], psi_a.shape[2]
    kind, dn, dt_, _mass, ngx, _ngy, _ngz = analytic[:7]
    vshift = float(analytic[8]) if len(analytic) > 8 else 0.0
    h = r_steps * ext
    bxp = bx + 2 * h
    # padded x coordinate of buffer row 0 for this block: interior row 0 of
    # block i sits at buffer row h ↔ padded coordinate ext + xorg + i·bx
    x_row0 = (
        (i * bx).astype(jnp.float32)
        + xorg_smem[0, 0].astype(jnp.float32)
        + jnp.float32(ext - h)
    )
    last_t = t == r_steps - 1

    # one blind sweep covers rows [ext, bxp−ext), ascending slabs, in place
    rows_swept = bxp - 2 * ext
    slabs = [(ext + s * tx, tx) for s in range(rows_swept // tx)]
    if rows_swept % tx:
        slabs.append((ext + (rows_swept // tx) * tx, rows_swept % tx))
    nslabs = len(slabs)
    # load segments: seg 0 = leading halo + slab 0, last seg extends to bxp
    seg_lo = [0] + [rs for rs, _t in slabs[1:]]
    seg_hi = seg_lo[1:] + [bxp]
    # interior rows each slab finalises: ∩ [h, h+bx)
    out_rng = []
    for rs, txs in slabs:
        lo = max(rs, h)
        hi = min(rs + txs, h + bx)
        out_rng.append((lo, hi) if hi > lo else None)

    def in_seg(blk, s, buf, base):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(blk * bx + seg_lo[s], seg_hi[s] - seg_lo[s])],
            buf.at[pl.ds(seg_lo[s], seg_hi[s] - seg_lo[s])],
            sem_in.at[base * nslabs + s],
        )

    def out_seg(blk, s, buf, base):
        lo, hi = out_rng[s]
        return pltpu.make_async_copy(
            buf.at[pl.ds(lo, hi - lo)],
            out_hbm.at[pl.ds(blk * bx + lo, hi - lo)],
            sem_out.at[base * nslabs + s],
        )

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _hoist_yz():
        yz_buf[...] = _res_hoist_yz(kind, analytic, ny, nz, ext)

    def sweep(buf, cold_waits, base):
        """One blind sweep over ``buf``, in place. ``cold_waits``: wait the
        next load segment just in time (block 0's cold start)."""
        lag[...] = buf[0:ext]
        for s_idx, (rs, txs) in enumerate(slabs):
            if cold_waits is not None and s_idx + 1 < nslabs:

                @pl.when(cold_waits)
                def _wait_next_seg(_s=s_idx + 1):
                    in_seg(i, _s, buf, base).wait()

            c = buf[rs : rs + txs]
            acc = (-float(center_c)) * c
            for off, cf in zip(offsets, coeffs):
                cf = float(cf)
                xm = _lag_xm(lag, buf, rs, txs, off, ext)
                xp = buf[rs + off : rs + txs + off]
                acc += cf * (xm + xp)
                acc += cf * (_shift_y(c, off) + _shift_y(c, -off))
                acc += cf * (_shift_z(c, off) + _shift_z(c, -off))
            b = _res_b_slab(
                kind, analytic, yz_buf[...], x_row0 + jnp.float32(rs), txs,
                ny, nz, ext,
            )
            new = b * (2.0 * c + scale * acc) - c
            lag[...] = buf[rs + txs - ext : rs + txs]
            buf[rs : rs + txs] = new

    def dirichlet(buf):
        # global Dirichlet: edge blocks re-zero their halo side each step
        # (the blind sweep wrote into it); sharded callers clear the flag
        # on shard-interior sides, whose halo rows carry real exchanged
        # neighbour data (exact to the window's blind-sweep depth)
        @pl.when(jnp.logical_and(i == 0, edge_smem[0, 0] == 1))
        def _lo():
            buf[0:h] = jnp.zeros((h, ny, nz), buf.dtype)

        @pl.when(jnp.logical_and(i == nblk - 1, edge_smem[1, 0] == 1))
        def _hi():
            buf[bxp - h : bxp] = jnp.zeros((h, ny, nz), buf.dtype)

    if not prefetch:
        # serial mode: one buffer; loads at t==0 with just-in-time waits,
        # per-slab write-back during the last sweep
        @pl.when(jnp.logical_and(t == 0, i >= 1))
        def _drain_prev():
            for s in range(nslabs):
                if out_rng[s] is not None:
                    out_seg(i - 1, s, psi_a, 0).wait()

        @pl.when(t == 0)
        def _load():
            for s in range(nslabs):
                in_seg(i, s, psi_a, 0).start()
            in_seg(i, 0, psi_a, 0).wait()

        sweep(psi_a, t == 0, 0)
        dirichlet(psi_a)

        @pl.when(last_t)
        def _emit_outs():
            for s in range(nslabs):
                if out_rng[s] is not None:
                    out_seg(i, s, psi_a, 0).start()

        @pl.when(jnp.logical_and(last_t, i == nblk - 1))
        def _drain_tail():
            for s in range(nslabs):
                if out_rng[s] is not None:
                    out_seg(i, s, psi_a, 0).wait()
    else:
        # Ping-pong prefetch: block i computes in place on buf[i%2] while
        # the DMA engine only touches the *other* buffer (loads for block
        # i+1, drains of block i-1's write-backs) — no compute↔DMA hazard
        # on a shared buffer, so the transfers genuinely hide behind the
        # sweeps (Mosaic serialises same-buffer traffic; measured 512³:
        # in-place single-buffer overlap never engaged). The slot is made
        # static by duplicating the schedule under two predicates.
        assert r_steps >= 2, "ping-pong prefetch needs R >= 2"
        bufs = (psi_a, psi_b)
        slot = jax.lax.rem(i, jnp.int32(2))
        for sl in (0, 1):
            p_slot = slot == sl
            buf = bufs[sl]
            other = bufs[1 - sl]

            # cold start (block 0 only lives in slot 0)
            if sl == 0:

                @pl.when(jnp.logical_and(p_slot, jnp.logical_and(t == 0, i == 0)))
                def _cold_load():
                    for s in range(nslabs):
                        in_seg(i, s, buf, sl).start()
                    in_seg(i, 0, buf, sl).wait()

            # later blocks: the window was staged by block i-1 — just wait
            @pl.when(jnp.logical_and(p_slot, jnp.logical_and(t == 0, i >= 1)))
            def _wait_staged(_buf=buf, _sl=sl):
                for s in range(nslabs):
                    in_seg(i, s, _buf, _sl).wait()

            # after the first step: drain block i-1's write-backs from the
            # other buffer, then stage block i+1's window into it
            @pl.when(
                jnp.logical_and(
                    p_slot,
                    jnp.logical_and(t == 1, jnp.logical_and(i >= 1, i + 1 < nblk)),
                )
            )
            def _drain_prev_outs(_other=other, _osl=1 - sl):
                for s in range(nslabs):
                    if out_rng[s] is not None:
                        out_seg(i - 1, s, _other, _osl).wait()

            @pl.when(jnp.logical_and(p_slot, jnp.logical_and(t == 1, i + 1 < nblk)))
            def _stage_next(_other=other, _osl=1 - sl):
                for s in range(nslabs):
                    in_seg(i + 1, s, _other, _osl).start()

            @pl.when(p_slot)
            def _sweep(_buf=buf, _sl=sl):
                cold = (
                    jnp.logical_and(t == 0, i == 0) if _sl == 0 else None
                )
                sweep(_buf, cold, _sl)
                dirichlet(_buf)

            # write-backs issued after the whole sweep: they drain during
            # the NEXT block's compute (which runs on the other buffer)
            @pl.when(jnp.logical_and(p_slot, last_t))
            def _emit_outs(_buf=buf, _sl=sl):
                for s in range(nslabs):
                    if out_rng[s] is not None:
                        out_seg(i, s, _buf, _sl).start()

            @pl.when(
                jnp.logical_and(p_slot, jnp.logical_and(last_t, i == nblk - 1))
            )
            def _drain_tail(_buf=buf, _sl=sl, _other=other, _osl=1 - sl):
                for s in range(nslabs):
                    if out_rng[s] is not None:
                        out_seg(i, s, _buf, _sl).wait()

                @pl.when(i >= 1)
                def _drain_second_last():
                    for s in range(nslabs):
                        if out_rng[s] is not None:
                            out_seg(i - 1, s, _other, _osl).wait()

    # the out array's halo rows are Dirichlet zeros
    @pl.when(jnp.logical_and(last_t, i == 0))
    def _zero_lo():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        hc = pltpu.make_async_copy(
            zeros_halo, out_hbm.at[pl.ds(0, h)], sem_halo
        )
        hc.start()
        hc.wait()

    @pl.when(jnp.logical_and(last_t, i == nblk - 1))
    def _zero_hi():
        nxp_rows = out_hbm.shape[0]
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        hc = pltpu.make_async_copy(
            zeros_halo, out_hbm.at[pl.ds(nxp_rows - h, h)], sem_halo
        )
        hc.start()
        hc.wait()


@functools.partial(
    jax.jit,
    static_argnames=("order", "scale", "bx", "r_steps", "analytic",
                     "interpret", "tx", "prefetch"),
)
def evolve_steps_resident_blocked(
    phi_h: jnp.ndarray,
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
    """One out-of-place pass of ``r_steps`` blind deep-halo sweeps over
    VMEM-sized x-blocks (see the section comment). ``phi_h`` is the deep
    x-padded layout (NX+2·R·ext, NY, NZ) with zero halo rows; the result is
    bit-identical to ``r_steps`` single sweeps in the same layout.
    ``prefetch`` stages the next block's window during this block's compute
    (a second block-sized VMEM buffer — the picker decides the fit).

    Sharded windows (``x_origin``/``edges``): ``phi_h`` is a SHARD's deep
    layout whose halo rows carry R·ext exchanged neighbour rows; the pass
    is one R-step exchange window (out-of-place, so every block reads
    pre-window data and the deep-ghost-zone argument applies per block AND
    at the shard seams). The output's halo rows are unwritten — callers
    refresh them before the next window."""
    ext = _EXT[order]
    h = r_steps * ext
    nxp, ny, nz = phi_h.shape
    nx = nxp - 2 * h
    dtype = phi_h.dtype
    assert analytic is not None, "blocked resident sweep is analytic-B only"
    if nx % bx:
        raise ValueError(f"bx={bx} does not divide NX={nx}")
    bxp = bx + 2 * h
    plane = ny * nz * dtype.itemsize
    if tx is None:
        tx = _pick_tx_resb(bxp, ext, h, plane)
    if tx is None:
        raise ValueError(f"no slab height fits block {bxp} rows")
    kernel = functools.partial(
        _evolve_kernel_resb,
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
    slot_rows = bxp if prefetch else 1
    if x_origin is None:
        x_origin = jnp.zeros((1, 1), jnp.int32)
    else:
        x_origin = jnp.asarray(x_origin, jnp.int32).reshape(1, 1)
    if edges is None:
        edges = jnp.ones((2, 1), jnp.int32)
    else:
        edges = jnp.asarray(edges, jnp.int32).reshape(2, 1)
    need = (
        (bxp + slot_rows + ext + h + 6 * tx) * plane + ny * nz * 4
    )
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
            out_shape=jax.ShapeDtypeStruct((nxp, ny, nz), dtype),
            scratch_shapes=[
                pltpu.VMEM((bxp, ny, nz), dtype),
                pltpu.VMEM((slot_rows, ny, nz), dtype),
                pltpu.VMEM((ext, ny, nz), dtype),
                pltpu.VMEM((ny, nz), jnp.float32),
                pltpu.VMEM((h, ny, nz), dtype),
                pltpu.SemaphoreType.DMA((2 * nslabs,)),
                pltpu.SemaphoreType.DMA((2 * nslabs,)),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(phi_h, x_origin, edges)


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dn", "mass", "n_steps", "analytic",
                     "bx", "r_steps", "interpret", "tx", "prefetch"),
)
def evolve_chunk_resident_blocked(
    phi_h: jnp.ndarray,
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
    """A ``screen_update`` chunk through the x-blocked deep-halo resident
    kernel. ``phi_h`` is the deep layout (:func:`to_xpad_k` with
    ``k_steps = r_steps``). Steps not divisible by ``r_steps`` run the
    remainder as 1-step fused sweeps inside the chunk — identical cadence
    to the reference (src/grid.rs:544-687)."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    ext = _EXT[order]

    def body(_i, p):
        return evolve_steps_resident_blocked(
            p, order, scale, bx, r_steps, analytic, interpret, tx, prefetch
        )

    phi = jax.lax.fori_loop(0, n_steps // r_steps, body, phi_h)
    rem = n_steps % r_steps
    if rem:
        extra = (r_steps - 1) * ext
        p1 = phi[extra:-extra] if extra else phi
        for _ in range(rem):
            p1, _n2, _ov = evolve_step_fused(
                p1, None, None, order, scale, 0, False, interpret,
                analytic=analytic,
            )
        if extra:
            phi = jnp.pad(p1, ((extra, extra), (0, 0), (0, 0)))
        else:
            phi = p1
    return phi


# --------------------------------------------------------------------------- #
# y/z-padded resident window kernel: multi-axis meshes, R steps per HBM pass
# --------------------------------------------------------------------------- #
#
# The 1-step y/z-padded kernel streams ψ from HBM every step. This variant
# holds the whole deep-padded local block in VMEM for R blind in-place
# sweeps per call: every axis carries an R·ext-deep exchanged halo (the
# host refreshes them once per window, full-cross-section strips sequenced
# x→y→z so edge/corner regions — which R steps of a star stencil DO read,
# unlike one step — compose from already-refreshed lower-axis halos), and
# the sweep runs blind over the full padded planes. Pad data goes stale /
# roll-wrap-garbage inward by ext per step; with pads ≥ R·ext the interior
# after R steps is exact (the deep-ghost-zone argument of
# _evolve_kernel_res, applied per axis). Global-edge Dirichlet: x-halo rows
# are re-zeroed per step under edge flags; y/z pad columns are masked with
# a plane mask built once from the flags (all-ones on interior shards).
# Ground state, analytic-B only — per-step-reduction paths (psn/excited)
# stay on the 1-step kernel. Decomposition seam:
# /root/reference/src/config.rs:222-239, src/grid.rs:505-534.


def _pick_tx_res_yzp(nx: int, ext: int, nxp: int, plane: int):
    """Largest slab height whose resident block + ~6 slab-sized sweep
    temporaries stay under the Mosaic scoped-VMEM cap (plane-size aware:
    a 512³-class padded plane is ~0.6 MiB and Mosaic accounts roughly one
    extra slab of vector temporaries per tx — measured: a 70 MiB block at
    tx=64 compiled to a 106 MiB scoped allocation)."""
    for tx in (64, 32, 16, 8, 4, 2):
        if tx <= nx and tx > ext and (nx % tx == 0 or nx % tx > ext):
            if (nxp + ext + 2 + 6 * tx) * plane <= _RESB_NEED_CAP:
                return tx
    return None


def pick_res_yzp(bx: int, by: int, bz: int, ext: int, itemsize: int,
                 screen_update: int, zp: int):
    """Window plan (R, yp) for the y/z-padded resident kernel, or None.

    R must divide screen_update (windows have no remainder path), every
    sharded extent must cover the R·ext-deep exchanged strip, and the
    deep-padded block + lag/plane scratch must fit the resident budget.
    ``zp`` is the z pad (128 when z is sharded, 0 when global — matching
    the 1-step yzp layout)."""
    if itemsize != 4:
        return None
    for r in (8, 4, 2):
        if screen_update % r:
            continue
        h = r * ext
        if bx < h or by < h or (zp > 0 and (bz < h or h > zp)):
            continue
        # blind-sweep recompute cap per deep axis: past ~1.5× amplification
        # the VPU recompute erases the windowing win
        if 4 * (r - 1) * ext > min(bx, by):
            continue
        yp = 8 * ((h + 7) // 8)
        nxp = bx + 2 * h
        byp = by + 2 * yp
        bzp = bz + 2 * zp
        plane = byp * bzp * itemsize
        # R=2 on big blocks loses to the 1-step stream: the window pays a
        # full-buffer serial HBM round trip per 2 steps (measured at the
        # (4,2,1)@512³ shard: 4.17e10 vs 4.42e10 1-step) — keep R=2 for
        # VMEM-class small blocks only
        if r == 2 and nxp * plane > 16 * 1024 * 1024:
            continue
        if _pick_tx_res_yzp(nxp - 2 * ext, ext, nxp, plane) is None:
            continue
        if (nxp + ext + 2) * plane <= _RES_BUDGET:
            return r, yp
    return None


def _evolve_kernel_res_yzp(
    phi_hbm,    # (NXP, BYP, BZP) ANY — deep-padded local block
    org_smem,   # (3, 1) SMEM i32 — global interior (x, y, z) origin
    edge_smem,  # (6, 1) SMEM i32 — [xlo, xhi, ylo, yhi, zlo, zhi]
    out_hbm,    # (NXP, BYP, BZP) ANY
    norm_out,   # (1, 1) SMEM — final step's LOCAL interior ‖ψ‖² (with_norm)
    psi_buf,    # (NXP, BYP, BZP) VMEM — resident across all steps
    lag,        # (ext, BYP, BZP) VMEM — pre-write planes of the prev slab
    yz_buf,     # (BYP, BZP) VMEM — hoisted plane constant (padded coords)
    mask_buf,   # (BYP, BZP) VMEM — y/z global-edge Dirichlet mask
    sem_in,
    sem_out,
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    analytic,
    halo: int,  # R·ext — x pad depth
    yp: int,
    zp: int,
    by: int,
    bz: int,
    with_norm: bool = False,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    nxp, byp, bzp = psi_buf.shape
    kind = analytic[0]
    x_row0 = org_smem[0, 0].astype(jnp.float32) + jnp.float32(ext - halo)

    nx_sweep = nxp - 2 * ext
    slabs = [(ext + s * tx, tx) for s in range(nx_sweep // tx)]
    if nx_sweep % tx:
        slabs.append((ext + (nx_sweep // tx) * tx, nx_sweep % tx))

    @pl.when(i == 0)
    def _load():
        cp = pltpu.make_async_copy(phi_hbm, psi_buf, sem_in)
        cp.start()
        cp.wait()
        # hoisted plane constant on the PADDED plane: pad columns map to
        # the neighbour's real global coordinates (out-of-domain values at
        # global edges are masked below)
        y0 = org_smem[1, 0].astype(jnp.float32) + jnp.float32(ext - yp)
        z0 = org_smem[2, 0].astype(jnp.float32) + jnp.float32(ext - zp)
        yz_buf[...] = _res_hoist_yz(kind, analytic, byp, bzp, ext, y0, z0)
        # y/z global-edge Dirichlet mask — all-ones on interior shards;
        # with zp == 0 the in-register z shifts are the z Dirichlet
        yi = jax.lax.broadcasted_iota(jnp.int32, (byp, bzp), 0)
        m = jnp.ones((byp, bzp), psi_buf.dtype)
        m = jnp.where(
            jnp.logical_and(edge_smem[2, 0] == 1, yi < yp), 0.0, m
        )
        m = jnp.where(
            jnp.logical_and(edge_smem[3, 0] == 1, yi >= yp + by), 0.0, m
        )
        if zp > 0:
            zi = jax.lax.broadcasted_iota(jnp.int32, (byp, bzp), 1)
            m = jnp.where(
                jnp.logical_and(edge_smem[4, 0] == 1, zi < zp), 0.0, m
            )
            m = jnp.where(
                jnp.logical_and(edge_smem[5, 0] == 1, zi >= zp + bz), 0.0, m
            )
        mask_buf[...] = m

    # one blind sweep, ascending slabs, in place — rows [0, ext) are the
    # lag seed (stale halo data, or per-step-zeroed Dirichlet at edges)
    lag[...] = psi_buf[0:ext]
    for rs, txs in slabs:
        c = psi_buf[rs : rs + txs]
        acc = (-float(center_c)) * c
        for off, cf in zip(offsets, coeffs):
            cf = float(cf)
            xm = _lag_xm(lag, psi_buf, rs, txs, off, ext)
            xp_ = psi_buf[rs + off : rs + txs + off]
            acc += cf * (xm + xp_)
            # full-padded-plane rolls: wrap garbage enters at the pad edge
            # and creeps inward ext/step — covered by pads ≥ R·ext
            acc += cf * (pltpu.roll(c, byp - off, 1) + pltpu.roll(c, off, 1))
            if zp > 0:
                acc += cf * (
                    pltpu.roll(c, bzp - off, 2) + pltpu.roll(c, off, 2)
                )
            else:
                acc += cf * (_shift_z(c, off) + _shift_z(c, -off))
        b = _res_b_slab(
            kind, analytic, yz_buf[...], x_row0 + jnp.float32(rs), txs,
            byp, bzp, ext,
        )
        new = (b * (2.0 * c + scale * acc) - c) * mask_buf[...][None]
        if with_norm:
            # final step's LOCAL interior norm² (windowed drift guard: the
            # host psums across shards and rescales once per window — a
            # pure rescaling of the per-step-renormalised trajectory,
            # docs/PARITY.md divergence 7)
            v_lo = max(rs, halo) - rs
            v_hi = min(rs + txs, nxp - halo) - rs
            first = rs == slabs[0][0]

            @pl.when(i == n_steps - 1)
            def _acc_norm(_vl=v_lo, _vh=v_hi, _first=first, _new=new):
                if _first:
                    norm_out[0, 0] = jnp.zeros((), norm_out.dtype)
                if _vh > _vl:
                    nm = _new[_vl:_vh, yp : yp + by, zp : zp + bz]
                    norm_out[0, 0] += jnp.sum(nm * nm)
        lag[...] = psi_buf[rs + txs - ext : rs + txs]
        psi_buf[rs : rs + txs] = new

    # deep-halo x Dirichlet: global-edge shards re-zero their halo rows
    # after every step (the blind sweep wrote into them)
    @pl.when(edge_smem[0, 0] == 1)
    def _dirichlet_xlo():
        psi_buf[0:halo] = jnp.zeros((halo, byp, bzp), psi_buf.dtype)

    @pl.when(edge_smem[1, 0] == 1)
    def _dirichlet_xhi():
        psi_buf[nxp - halo : nxp] = jnp.zeros((halo, byp, bzp), psi_buf.dtype)

    @pl.when(i == n_steps - 1)
    def _store():
        if not with_norm:
            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)
        cp = pltpu.make_async_copy(psi_buf, out_hbm, sem_out)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "scale", "n_steps", "analytic", "interpret", "halo", "yp",
        "zp", "with_norm",
    ),
)
def evolve_window_res_yzp(
    phi_pad3: jnp.ndarray,
    order: str,
    scale: float,
    n_steps: int,
    analytic,
    origin,
    edges,
    halo: int,
    yp: int,
    zp: int,
    interpret: bool = False,
    with_norm: bool = False,
):
    """``n_steps`` blind resident sweeps on a deep-padded local block.

    Args:
      phi_pad3: (BX+2·halo, BY+2·yp, BZ+2·zp) local block; the innermost
        ``halo`` = n_steps·ext rows/columns of every pad hold neighbour
        data exchanged at the window start (zeros at global edges).
      origin: (3, 1) i32 global interior (x, y, z) origin of this shard.
      edges: (6, 1) i32 [xlo, xhi, ylo, yhi, zlo, zhi] global-edge flags.

    Returns the full padded block after n_steps (with ``with_norm``, a
    (block, local_norm2) pair — the final step's interior ‖ψ‖² partial for
    the windowed drift guard); the interior is exact (deep-ghost-zone
    argument), pads are stale and must be re-exchanged before the next
    window."""
    ext = _EXT[order]
    nxp, byp, bzp = phi_pad3.shape
    by = byp - 2 * yp
    bz = bzp - 2 * zp
    dtype = phi_pad3.dtype
    plane = byp * bzp * dtype.itemsize
    tx = _pick_tx_res_yzp(nxp - 2 * ext, ext, nxp, plane)
    if tx is None:
        raise ValueError(
            f"resident y/z-padded window does not fit a slab plan for "
            f"nxp={nxp}"
        )
    kernel = functools.partial(
        _evolve_kernel_res_yzp,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        analytic=analytic,
        halo=halo,
        yp=yp,
        zp=zp,
        by=by,
        bz=bz,
        with_norm=with_norm,
    )
    # ψ + lag + yz/mask planes + ~6 slab temporaries; passed straight as
    # the Mosaic scoped-VMEM limit (the 32/64 MiB _compiler_params tiers
    # are below a resident block) — the picker guarantees this fits the
    # 126 MiB cap
    need = (nxp + ext + 2 + 6 * tx) * plane
    origin = jnp.asarray(origin, jnp.int32).reshape(3, 1)
    edges = jnp.asarray(edges, jnp.int32).reshape(6, 1)
    with jax.enable_x64(False):
        out, n2 = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nxp, byp, bzp), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((nxp, byp, bzp), dtype),
                pltpu.VMEM((ext, byp, bzp), dtype),
                pltpu.VMEM((byp, bzp), dtype),
                pltpu.VMEM((byp, bzp), dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(phi_pad3, origin, edges)
    if with_norm:
        return out, n2[0, 0]
    return out


# --------------------------------------------------------------------------- #
# x-blocked y/z-padded window kernel: multi-axis shards whose block > VMEM
# --------------------------------------------------------------------------- #
#
# At 512³ on a (4,2,1)-class mesh the deep-padded local block exceeds the
# resident budget, so pick_res_yzp declines and the driver fell back to the
# 1-step yzp stream (one ψ HBM read+write AND one per-axis ppermute round
# per step). This kernel composes the two proven pieces: the deep-padded
# window layout + once-per-R-steps exchange of _evolve_kernel_res_yzp, with
# _evolve_kernel_resb's x-blocked out-of-place streaming INSIDE the window —
# NX_local is split into VMEM-sized x-blocks, each loaded with an R·ext-deep
# x ghost zone and swept blind R times on-chip (y/z taps ride the full
# padded planes exactly as the whole-block kernel; y/z extents are never
# blocked). The pass is out-of-place, so every block reads pre-window data
# and the deep-ghost-zone exactness argument applies per block, per axis.
# Decomposition seam: /root/reference/src/config.rs:222-239,
# src/grid.rs:505-534. Ground state, analytic-B only.


def pick_resb_yzp(bx: int, by: int, bz: int, ext: int, itemsize: int,
                  screen_update: int, zp: int):
    """(bxk, r, tx, yp) window plan for the x-blocked y/z-padded kernel, or
    None. Tried by the sharded driver only where :func:`pick_res_yzp`
    declined (deep-padded block > VMEM); the rate model is pick_resb's
    (serial DMA at ~0.73 VPU-row-equivalents per transferred row)."""
    if itemsize != 4:
        return None
    best = None
    best_rate = 0.0
    for r in (8, 4, 2):
        if screen_update % r:
            continue
        h = r * ext
        if bx < h or by < h or (zp > 0 and (bz < h or h > zp)):
            continue
        yp = 8 * ((h + 7) // 8)
        byp = by + 2 * yp
        bzp = bz + 2 * zp
        plane = byp * bzp * itemsize
        for bxk in (256, 192, 128, 96, 64, 48, 32, 16):
            if bx % bxk or bxk <= ext:
                continue
            bxkp = bxk + 2 * h
            if bxkp * plane > _RES_BUDGET:
                continue
            tx = _pick_tx_resb(bxkp, ext, h, plane)
            if tx is None:
                continue
            vpu_rows = r * (bxk + 2 * (r - 1) * ext)
            rate = bxk * r / (vpu_rows + 0.73 * (bxkp + bxk))
            if rate > best_rate:
                best, best_rate = (bxk, r, tx, yp), rate
    return best


def _evolve_kernel_resb_yzp(
    phi_hbm,    # (BX+2H, BYP, BZP) ANY — deep-padded local block
    org_smem,   # (3, 1) SMEM i32 — global interior (x, y, z) origin
    edge_smem,  # (6, 1) SMEM i32 — [xlo, xhi, ylo, yhi, zlo, zhi]
    out_hbm,    # (BX+2H, BYP, BZP) ANY
    norm_out,   # (1, 1) SMEM — final step's LOCAL interior ‖ψ‖² (with_norm)
    psi_a,      # (BXK+2H, BYP, BZP) VMEM — block buffer
    lag,        # (ext, BYP, BZP) VMEM
    yz_buf,     # (BYP, BZP) VMEM — hoisted plane constant
    mask_buf,   # (BYP, BZP) VMEM — y/z global-edge Dirichlet mask
    zeros_halo, # (H, BYP, BZP) VMEM
    sem_in,     # DMA (nslabs,)
    sem_out,    # DMA (nslabs,)
    sem_halo,
    *,
    order: str,
    scale: float,
    bxk: int,
    tx: int,
    ext: int,
    analytic,
    halo: int,  # R·ext
    yp: int,
    zp: int,
    by: int,
    bz: int,
    r_steps: int,
    with_norm: bool = False,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    idx = pl.program_id(0)
    nblk = pl.num_programs(0) // r_steps
    i = idx // r_steps         # block index (outer)
    t = idx - i * r_steps      # in-block step (inner, sequential)
    byp, bzp = psi_a.shape[1], psi_a.shape[2]
    kind = analytic[0]
    h = halo
    bxp = bxk + 2 * h
    x_row0 = (
        (i * bxk).astype(jnp.float32)
        + org_smem[0, 0].astype(jnp.float32)
        + jnp.float32(ext - h)
    )
    last_t = t == r_steps - 1

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
        hi = min(rs + txs, h + bxk)
        out_rng.append((lo, hi) if hi > lo else None)

    def in_seg(blk, s, buf):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(blk * bxk + seg_lo[s], seg_hi[s] - seg_lo[s])],
            buf.at[pl.ds(seg_lo[s], seg_hi[s] - seg_lo[s])],
            sem_in.at[s],
        )

    def out_seg(blk, s, buf):
        lo, hi = out_rng[s]
        return pltpu.make_async_copy(
            buf.at[pl.ds(lo, hi - lo)],
            out_hbm.at[pl.ds(blk * bxk + lo, hi - lo)],
            sem_out.at[s],
        )

    @pl.when(idx == 0)
    def _hoist():
        # hoisted plane constant + y/z global-edge Dirichlet mask on the
        # PADDED plane — see _evolve_kernel_res_yzp._load
        y0 = org_smem[1, 0].astype(jnp.float32) + jnp.float32(ext - yp)
        z0 = org_smem[2, 0].astype(jnp.float32) + jnp.float32(ext - zp)
        yz_buf[...] = _res_hoist_yz(kind, analytic, byp, bzp, ext, y0, z0)
        yi = jax.lax.broadcasted_iota(jnp.int32, (byp, bzp), 0)
        m = jnp.ones((byp, bzp), psi_a.dtype)
        m = jnp.where(jnp.logical_and(edge_smem[2, 0] == 1, yi < yp), 0.0, m)
        m = jnp.where(
            jnp.logical_and(edge_smem[3, 0] == 1, yi >= yp + by), 0.0, m
        )
        if zp > 0:
            zi = jax.lax.broadcasted_iota(jnp.int32, (byp, bzp), 1)
            m = jnp.where(
                jnp.logical_and(edge_smem[4, 0] == 1, zi < zp), 0.0, m
            )
            m = jnp.where(
                jnp.logical_and(edge_smem[5, 0] == 1, zi >= zp + bz), 0.0, m
            )
        mask_buf[...] = m

    def sweep(buf, cold_waits):
        lag[...] = buf[0:ext]
        for s_idx, (rs, txs) in enumerate(slabs):
            if cold_waits is not None and s_idx + 1 < nslabs:

                @pl.when(cold_waits)
                def _wait_next_seg(_s=s_idx + 1):
                    in_seg(i, _s, buf).wait()

            c = buf[rs : rs + txs]
            acc = (-float(center_c)) * c
            for off, cf in zip(offsets, coeffs):
                cf = float(cf)
                xm = _lag_xm(lag, buf, rs, txs, off, ext)
                xp_ = buf[rs + off : rs + txs + off]
                acc += cf * (xm + xp_)
                # full-padded-plane rolls: wrap garbage enters at the pad
                # edge and creeps inward ext/step — covered by pads ≥ R·ext
                acc += cf * (
                    pltpu.roll(c, byp - off, 1) + pltpu.roll(c, off, 1)
                )
                if zp > 0:
                    acc += cf * (
                        pltpu.roll(c, bzp - off, 2) + pltpu.roll(c, off, 2)
                    )
                else:
                    acc += cf * (_shift_z(c, off) + _shift_z(c, -off))
            b = _res_b_slab(
                kind, analytic, yz_buf[...], x_row0 + jnp.float32(rs), txs,
                byp, bzp, ext,
            )
            new = (b * (2.0 * c + scale * acc) - c) * mask_buf[...][None]
            if with_norm:
                # final step's LOCAL interior norm² partial (windowed drift
                # guard — see _evolve_kernel_res_yzp); accumulated across
                # blocks (the grid is sequential)
                v_lo = max(rs, h) - rs
                v_hi = min(rs + txs, bxp - h) - rs
                first = rs == slabs[0][0]

                @pl.when(last_t)
                def _acc_norm(_vl=v_lo, _vh=v_hi, _first=first, _new=new):
                    if _first:

                        @pl.when(i == 0)
                        def _init():
                            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)

                    if _vh > _vl:
                        nm = _new[_vl:_vh, yp : yp + by, zp : zp + bz]
                        norm_out[0, 0] += jnp.sum(nm * nm)
            lag[...] = buf[rs + txs - ext : rs + txs]
            buf[rs : rs + txs] = new

    def dirichlet(buf):
        # deep-halo x Dirichlet: global-edge blocks re-zero their halo side
        # after every step (the blind sweep wrote into it); shard-interior
        # sides hold exchanged neighbour rows
        @pl.when(jnp.logical_and(i == 0, edge_smem[0, 0] == 1))
        def _lo():
            buf[0:h] = jnp.zeros((h, byp, bzp), buf.dtype)

        @pl.when(jnp.logical_and(i == nblk - 1, edge_smem[1, 0] == 1))
        def _hi():
            buf[bxp - h : bxp] = jnp.zeros((h, byp, bzp), buf.dtype)

    # serial schedule (the measured-best variant of _evolve_kernel_resb:
    # overlap schemes all ran at or below it on v5e)
    @pl.when(jnp.logical_and(t == 0, i >= 1))
    def _drain_prev():
        for s in range(nslabs):
            if out_rng[s] is not None:
                out_seg(i - 1, s, psi_a).wait()

    @pl.when(t == 0)
    def _load():
        for s in range(nslabs):
            in_seg(i, s, psi_a).start()
        in_seg(i, 0, psi_a).wait()

    sweep(psi_a, t == 0)
    dirichlet(psi_a)

    @pl.when(last_t)
    def _emit_outs():
        for s in range(nslabs):
            if out_rng[s] is not None:
                out_seg(i, s, psi_a).start()

    @pl.when(jnp.logical_and(last_t, i == nblk - 1))
    def _drain_tail():
        for s in range(nslabs):
            if out_rng[s] is not None:
                out_seg(i, s, psi_a).wait()

    if not with_norm:
        @pl.when(jnp.logical_and(last_t, i == nblk - 1))
        def _zero_norm():
            norm_out[0, 0] = jnp.zeros((), norm_out.dtype)

    # the out block's x-halo rows at GLOBAL edges are Dirichlet zeros; at
    # shard seams they are refreshed by the caller's exchange before the
    # next window (refresh_deep), so only edge flags need the zeros
    @pl.when(
        jnp.logical_and(
            jnp.logical_and(last_t, i == 0), edge_smem[0, 0] == 1
        )
    )
    def _zero_lo():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        hc = pltpu.make_async_copy(zeros_halo, out_hbm.at[pl.ds(0, h)],
                                   sem_halo)
        hc.start()
        hc.wait()

    @pl.when(
        jnp.logical_and(
            jnp.logical_and(last_t, i == nblk - 1), edge_smem[1, 0] == 1
        )
    )
    def _zero_hi():
        nxp_rows = out_hbm.shape[0]
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        hc = pltpu.make_async_copy(
            zeros_halo, out_hbm.at[pl.ds(nxp_rows - h, h)], sem_halo
        )
        hc.start()
        hc.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "scale", "n_steps", "analytic", "interpret", "halo", "yp",
        "zp", "bxk", "tx", "with_norm",
    ),
)
def evolve_window_resb_yzp(
    phi_pad3: jnp.ndarray,
    order: str,
    scale: float,
    n_steps: int,
    analytic,
    origin,
    edges,
    halo: int,
    yp: int,
    zp: int,
    bxk: int,
    tx: int,
    interpret: bool = False,
    with_norm: bool = False,
):
    """One x-blocked out-of-place pass of ``n_steps`` blind sweeps over a
    deep-padded local block (contract identical to
    :func:`evolve_window_res_yzp`, including the with_norm pair return);
    the x-halo rows at shard seams are unwritten on output — callers
    refresh every pad before the next window."""
    ext = _EXT[order]
    nxp, byp, bzp = phi_pad3.shape
    by = byp - 2 * yp
    bz = bzp - 2 * zp
    bx = nxp - 2 * halo
    dtype = phi_pad3.dtype
    if bx % bxk:
        raise ValueError(f"bxk={bxk} does not divide local BX={bx}")
    bxp = bxk + 2 * halo
    plane = byp * bzp * dtype.itemsize
    kernel = functools.partial(
        _evolve_kernel_resb_yzp,
        order=order,
        scale=scale,
        bxk=bxk,
        tx=tx,
        ext=ext,
        analytic=analytic,
        halo=halo,
        yp=yp,
        zp=zp,
        by=by,
        bz=bz,
        r_steps=n_steps,
        with_norm=with_norm,
    )
    rows_swept = bxp - 2 * ext
    nslabs = rows_swept // tx + (1 if rows_swept % tx else 0)
    origin = jnp.asarray(origin, jnp.int32).reshape(3, 1)
    edges = jnp.asarray(edges, jnp.int32).reshape(6, 1)
    need = (bxp + ext + halo + 2 + 6 * tx) * plane
    with jax.enable_x64(False):
        out, n2 = pl.pallas_call(
            kernel,
            grid=((bx // bxk) * n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nxp, byp, bzp), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((bxp, byp, bzp), dtype),
                pltpu.VMEM((ext, byp, bzp), dtype),
                pltpu.VMEM((byp, bzp), dtype),
                pltpu.VMEM((byp, bzp), dtype),
                pltpu.VMEM((halo, byp, bzp), dtype),
                pltpu.SemaphoreType.DMA((nslabs,)),
                pltpu.SemaphoreType.DMA((nslabs,)),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        )(phi_pad3, origin, edges)
    if with_norm:
        return out, n2[0, 0]
    return out


# --------------------------------------------------------------------------- #
# chunk driver: the pallas counterpart of ops.stencil.evolve_chunk
# --------------------------------------------------------------------------- #


def to_xpad(phi_padded: jnp.ndarray, ext: int) -> jnp.ndarray:
    """Fully-padded (N+2e)³ → x-padded (N+2e, N, N)."""
    if ext == 0:
        return phi_padded
    return phi_padded[:, ext:-ext, ext:-ext]


def from_xpad(phi_xpad: jnp.ndarray, ext: int) -> jnp.ndarray:
    """x-padded → fully-padded (zero y/z halos restored)."""
    if ext == 0:
        return phi_xpad
    return jnp.pad(phi_xpad, ((0, 0), (ext, ext), (ext, ext)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "dt", "dn", "mass", "n_steps", "n_lower", "interpret",
        "analytic", "per_step_norm",
    ),
)
def evolve_chunk_fused(
    phi_xpad: jnp.ndarray,
    b_int: Optional[jnp.ndarray],
    store_xpad: Optional[jnp.ndarray],
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    n_lower: int,
    interpret: bool = False,
    analytic=None,
    per_step_norm: bool = False,
):
    """``n_steps`` fused sweeps (reference ``evolve``, src/grid.rs:544-687).

    Excited states: norm² and overlaps come out of the sweep kernel and feed
    the next step's in-kernel affine correction — one HBM pass per step; the
    final step's pending correction is materialised once per chunk.

    ``per_step_norm`` applies the same carried-coefficient renormalisation
    to the ground state: needed in f32 when the potential's offset would
    drift ψ's scale out of range within one chunk (see
    ops/stencil.evolve_chunk); the normalisation is exact rescaling, so the
    trajectory is unchanged. Incompatible with K-fusion — callers must use
    this 1-step path."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)

    if n_lower == 0 and not per_step_norm:
        def body(_i, phi):
            phi, _n2, _ov = evolve_step_fused(
                phi, b_int, None, order, scale, 0, False, interpret,
                analytic=analytic,
            )
            return phi

        return jax.lax.fori_loop(0, n_steps, body, phi_xpad)

    if n_lower == 0:
        # ground state with carried per-step renormalisation: the inverse
        # norm of step i's raw output scales step i+1's input in-kernel
        dtype = phi_xpad.dtype

        def body_norm(_i, carry):
            phi, coef = carry
            phi, norm2, _ov = evolve_step_fused(
                phi, b_int, None, order, scale, 0, True, interpret, coef,
                analytic,
            )
            inv = (1.0 / jnp.sqrt(norm2)).astype(dtype)
            return phi, inv.reshape(1, 1)

        coef0 = jnp.ones((1, 1), dtype)
        phi, coef = jax.lax.fori_loop(0, n_steps, body_norm, (phi_xpad, coef0))
        return phi * coef[0, 0]

    # Excited path: the normalise+project update is carried as an affine
    # coefficient vector [inv, corr...] and applied *inside* the next sweep
    # (one HBM pass per step instead of two). ψ/√n − Σ lowerₛ·(⟨lowerₛ|ψ⟩/√n)
    # is exactly the reference's normalise-then-project order
    # (src/grid.rs:674-681).
    dtype = phi_xpad.dtype
    coef0 = jnp.concatenate(
        [jnp.ones((1, 1), dtype), jnp.zeros((n_lower, 1), dtype)]
    )

    def body(_i, carry):
        phi, coef = carry
        phi, norm2, overlaps = evolve_step_fused(
            phi, b_int, store_xpad, order, scale, n_lower, True, interpret, coef,
            analytic,
        )
        inv = (1.0 / jnp.sqrt(norm2)).astype(dtype)
        coef = jnp.concatenate(
            [inv.reshape(1, 1), (overlaps * inv).reshape(n_lower, 1)]
        )
        return phi, coef

    phi, coef = jax.lax.fori_loop(0, n_steps, body, (phi_xpad, coef0))
    # materialise the last step's pending correction
    proj = jnp.tensordot(coef[1:, 0], store_xpad, axes=1)
    return phi * coef[0, 0] - proj


# --------------------------------------------------------------------------- #
# K=2 temporal blocking WITH per-step normalise + Gram-Schmidt
# (excited states; also the per-step-norm ground-state guard at S=0)
# --------------------------------------------------------------------------- #
#
# The reference renormalises and projects after *every* step
# (src/grid.rs:674-681), which looks like it forbids temporal blocking. But
# the per-step correction is affine and the sweep S is linear:
#
#     ψ_{t+1}^raw = S(inv_t·ψ_t^raw − Σ_s corr_{t,s}·l_s)
#                 = inv_t·S(ψ_t^raw) − Σ_s corr_{t,s}·Sl_s ,   Sl_s ≡ S(l_s)
#
# with Sl_s precomputed once per state (l_s is fixed for the whole solve).
# One HBM pass can therefore run TWO trapezoidal sweeps and defer the
# mid-pass correction algebraically: the kernel emits w = S(S(ψ̃)) plus the
# reductions of the intermediate u = S(ψ̃) (‖u‖², ⟨l_s|u⟩ — accumulated over
# each program's exclusive rows, since neighbouring windows overlap) and of
# w (‖w‖², ⟨l_s|w⟩, ⟨Sl_s|w⟩). Scalar algebra between passes, using the
# per-state Gram matrices G_st = ⟨Sl_s|Sl_t⟩ and H_st = ⟨l_s|Sl_t⟩,
# reconstructs the exact next coefficients over the doubled basis
# {l_s, Sl_s}:
#
#     inv₁ = 1/‖u‖,  corr₁ₛ = ⟨l_s|u⟩·inv₁
#     ‖ψ₂‖² = inv₁²‖w‖² − 2·inv₁·Σₛ corr₁ₛ⟨Sl_s|w⟩ + corr₁ᵀ G corr₁
#     ⟨l_s|ψ₂⟩ = inv₁⟨l_s|w⟩ − Σ_t H_st corr₁_t
#
# Exact in exact arithmetic (per-step semantics preserved); f32 equivalence
# vs the sequential path is tested to tolerance. HBM traffic per two steps:
# ψ read + write + 2S lower streams, vs 2·(2+S) for two 1-step passes — a
# 1.5× cut at S=1 with analytic-B.


def _evolve_kernel_kgs(
    # inputs
    phi_hbm,  # (NX+4e, NY, NZ) ANY
    b_hbm,  # (NX+2e, NY, NZ) ANY (stub when analytic)
    store_hbm,  # (2S·(NX+4e), NY, NZ) ANY — [l_0..l_{S−1}, Sl_0..Sl_{S−1}]
    coef_smem,  # (1+2S, 1) SMEM: [c₀, c_l…, c_Sl…]
    xorg_smem,  # (1, 1) SMEM i32 — shard's global interior x origin
    edge_smem,  # (2, 1) SMEM i32 — [at_global_lo, at_global_hi]
    # outputs
    out_hbm,  # (NX+4e, NY, NZ) ANY
    red_u,  # (1+S, 1) SMEM: [‖u‖², ⟨l_s|u⟩…]
    red_w,  # (1+2S, 1) SMEM: [‖w‖², ⟨l_s|w⟩…, ⟨Sl_s|w⟩…]
    # scratch
    window,  # (2, TX+4e, NY, NZ) VMEM — double-buffered ψ windows
    pong,  # (TX+2e, NY, NZ) VMEM — intermediate u
    b_slab,  # (TX+2e, NY, NZ) VMEM (stub when analytic)
    result,  # (TX, NY, NZ) VMEM — single-buffered (see _evolve_kernel)
    lower_slab,  # (2S·(TX+4e), NY, NZ) VMEM
    zeros_halo,  # (2e, NY, NZ) VMEM
    sem_in,  # DMA (2,)
    sem_b,
    sem_lower,  # DMA (2S,)
    sem_out,  # DMA (2,)
    sem_halo,
    *,
    order: str,
    scale: float,
    tx: int,
    ext: int,
    n_lower: int,
    analytic=None,
):
    offsets, coeffs, center_c, _k = geometry.stencil_coefficients(order)
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    next_slot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
    pad = 2 * ext
    win_rows = tx + 2 * pad
    n_store = 2 * n_lower
    at_lo = edge_smem[0, 0] == 1
    at_hi = edge_smem[1, 0] == 1
    nxp_rows = phi_hbm.shape[0]

    def in_copy(win, to_slot):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(win * tx, win_rows)],
            window.at[to_slot],
            sem_in.at[to_slot],
        )

    @pl.when(i == 0)
    def _first_window():
        in_copy(jnp.int32(0), jnp.int32(0)).start()

    @pl.when(i + 1 < nprog)
    def _prefetch():
        in_copy(i + 1, next_slot).start()

    if analytic is None:
        b_copy = pltpu.make_async_copy(
            b_hbm.at[pl.ds(i * tx, tx + 2 * ext)], b_slab, sem_b
        )
        b_copy.start()

    lower_copies = []
    for j in range(n_store):
        lc = pltpu.make_async_copy(
            store_hbm.at[pl.ds(jnp.int32(j * nxp_rows) + i * tx, win_rows)],
            lower_slab.at[pl.ds(jnp.int32(j * win_rows), win_rows)],
            sem_lower.at[jnp.int32(j)],
        )
        lc.start()
        lower_copies.append(lc)

    @pl.when(jnp.logical_and(i == 0, at_lo))
    def _zero_lo():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        c = pltpu.make_async_copy(zeros_halo, out_hbm.at[pl.ds(0, pad)], sem_halo)
        c.start()
        c.wait()

    @pl.when(jnp.logical_and(i == nprog - 1, at_hi))
    def _zero_hi():
        zeros_halo[...] = jnp.zeros_like(zeros_halo)
        c = pltpu.make_async_copy(
            zeros_halo, out_hbm.at[pl.ds(nxp_rows - pad, pad)], sem_halo
        )
        c.start()
        c.wait()

    @pl.when(i == 0)
    def _init_reductions():
        for r in range(1 + n_lower):
            red_u[r, 0] = jnp.zeros((), red_u.dtype)
        for r in range(1 + n_store):
            red_w[r, 0] = jnp.zeros((), red_w.dtype)

    in_copy(i, slot).wait()
    for lc in lower_copies:
        lc.wait()
    if analytic is None:
        b_copy.wait()

    # pending affine correction: ψ̃ = c₀·ψ − Σⱼ cⱼ·lowerⱼ over {l_s, Sl_s}
    win = window[slot] * coef_smem[0, 0]
    for j in range(n_store):
        win = win - coef_smem[j + 1, 0] * lower_slab[
            j * win_rows : (j + 1) * win_rows
        ]

    yz = (
        None
        if analytic is None
        else _analytic_yz(analytic, phi_hbm.shape[1], phi_hbm.shape[2], ext, ext)
    )

    def b_rows(rows_out, b_off):
        if analytic is None:
            return b_slab[b_off : b_off + rows_out]
        # padded coord of output row r: i·tx + b_off − ext + ext + r + xorg
        x0 = (i * tx + jnp.int32(b_off) + xorg_smem[0, 0]).astype(jnp.float32)
        shp = (rows_out, phi_hbm.shape[1], phi_hbm.shape[2])
        return _analytic_b(analytic, shp, x0, ext, ext, yz=yz)

    def step(read, rows_out, b_off):
        c = read(ext, rows_out)
        acc = -center_c * c
        for off, cf in zip(offsets, coeffs):
            acc = acc + cf * (read(ext + off, rows_out) + read(ext - off, rows_out))
            acc = acc + cf * (_shift_y(c, off) + _shift_y(c, -off))
            acc = acc + cf * (_shift_z(c, off) + _shift_z(c, -off))
        b = b_rows(rows_out, b_off)
        return b * (2.0 * c + scale * acc) - c

    # step 1: u over tx+2e rows (coords [i·tx−e, i·tx+tx+e))
    u = step(lambda r0, rows: win[r0 : r0 + rows], tx + 2 * ext, 0)
    pong[...] = u
    # re-zero beyond-boundary intermediate rows at true global edges only
    @pl.when(jnp.logical_and(i == 0, at_lo))
    def _mask_lo():
        pong[0:ext] = jnp.zeros_like(pong[0:ext])

    @pl.when(jnp.logical_and(i == nprog - 1, at_hi))
    def _mask_hi():
        rows = tx + 2 * ext
        pong[rows - ext : rows] = jnp.zeros_like(pong[rows - ext : rows])

    # reductions of u over this program's exclusive rows [i·tx, i·tx+tx)
    u_ex = pong[ext : ext + tx]
    red_u[0, 0] += jnp.sum(u_ex * u_ex)
    for s in range(n_lower):
        red_u[s + 1, 0] += jnp.sum(
            lower_slab[s * win_rows + pad : s * win_rows + pad + tx] * u_ex
        )

    # step 2: w over tx rows
    w = step(lambda r0, rows: pong[r0 : r0 + rows], tx, ext)

    @pl.when(i >= 1)
    def _drain_prev_out():
        pltpu.make_async_copy(
            result, out_hbm.at[pl.ds((i - 1) * tx + pad, tx)], sem_out
        ).wait()

    result[...] = w
    pltpu.make_async_copy(
        result, out_hbm.at[pl.ds(i * tx + pad, tx)], sem_out
    ).start()

    red_w[0, 0] += jnp.sum(w * w)
    for j in range(n_store):
        red_w[j + 1, 0] += jnp.sum(
            lower_slab[j * win_rows + pad : j * win_rows + pad + tx] * w
        )

    @pl.when(i == nprog - 1)
    def _drain_tail():
        pltpu.make_async_copy(
            result, out_hbm.at[pl.ds(i * tx + pad, tx)], sem_out
        ).wait()


def _pick_tx_kgs(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                 n_lower: int, analytic_b: bool = False):
    plane = ny * nz * itemsize
    for tx in (32, 16, 8, 4, 2, 1):
        if nx % tx:
            continue
        need = (
            2 * (tx + 4 * ext) * plane       # ψ windows
            + (tx + 2 * ext) * plane          # pong (u)
            + (0 if analytic_b else (tx + 2 * ext) * plane)  # b
            + tx * plane                      # result (single-buffered)
            + 2 * n_lower * (tx + 4 * ext) * plane  # lower windows
        )
        if need <= _VMEM_BUDGET:
            return tx
    return None


def kgs_supported(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                  n_lower: int, analytic_b: bool = False) -> bool:
    return _pick_tx_kgs(nx, ny, nz, ext, itemsize, n_lower, analytic_b) is not None


def kgs_profitable(nx: int, ny: int, nz: int, ext: int, itemsize: int,
                   n_lower: int, analytic_b: bool = False) -> bool:
    """Whether the K=2 GS-fused pass beats two 1-step passes on predicted
    HBM traffic. The sweep is bandwidth-bound, and at VMEM-constrained slab
    heights the (tx+4e)/tx window-overlap amplification can eat the fusion
    gain — measured on-chip at 256³ S=1: ratio 0.80 predicted 4/5 by this
    model. Per-step plane-traffic model (amp = window rows / output rows):

      1-step:  amp₁·(1+S) + 1 + (B stream: 1 unless analytic)
      kgs/2:  (amp₂·(1+2S) + 1 + (B: (tx+2e)/tx unless analytic)) / 2
    """
    tx2 = _pick_tx_kgs(nx, ny, nz, ext, itemsize, n_lower, analytic_b)
    if tx2 is None:
        return False
    # VMEM-residency regime: pallas operands in ANY memory space stay
    # VMEM-resident when the 1-step working set (ψ in + out + S lowers)
    # fits on-chip — the sweep is then no longer HBM-bound and kgs's extra
    # compute only hurts (measured at 128³ S=1 on v5e: 1-step 8.8e10 vs
    # kgs 5.4e10 updates/s).
    if nx * ny * nz * itemsize * (2 + n_lower) <= 96 * 1024 * 1024:
        return False
    tx1 = _pick_tx(nx, ny, nz, ext, itemsize, n_lower, analytic_b)
    if tx1 is None:
        # the 1-step alternative is the z-tiled kernel (already paying halo
        # re-reads); treat fitting kgs as profitable
        return True
    amp1 = (tx1 + 2 * ext) / tx1
    amp2 = (tx2 + 4 * ext) / tx2
    t1 = amp1 * (1 + n_lower) + 1 + (0.0 if analytic_b else 1.0)
    t2 = (
        amp2 * (1 + 2 * n_lower)
        + 1
        + (0.0 if analytic_b else (tx2 + 2 * ext) / tx2)
    ) / 2.0
    return t2 < 0.95 * t1


@functools.partial(
    jax.jit,
    static_argnames=("order", "scale", "n_lower", "interpret", "analytic"),
)
def evolve_steps_fused_kgs(
    phi_xpad2: jnp.ndarray,
    b_xpad: Optional[jnp.ndarray],
    store2: Optional[jnp.ndarray],
    coef: jnp.ndarray,
    order: str,
    scale: float,
    n_lower: int,
    interpret: bool = False,
    analytic=None,
    x_origin=None,
    edges=None,
):
    """Two fused sweeps with deferred per-step normalise/GS (see above).

    Args:
      phi_xpad2: (NX+4e, NY, NZ) — the K=2 x-pad layout (``to_xpad_k`` k=2).
      b_xpad: (NX+2e, NY, NZ) or None (analytic).
      store2: (2S, NX+4e, NY, NZ) stacked [l_s…, Sl_s…] in the same layout,
        or None when ``n_lower == 0``.
      coef: (1+2S, 1) pending affine correction [c₀, c_l…, c_Sl…].

    Returns:
      (w_xpad2, red_u[(1+S,1)], red_w[(1+2S,1)]).
    """
    ext = _EXT[order]
    nxp, ny, nz = phi_xpad2.shape
    nx = nxp - 4 * ext
    dtype = phi_xpad2.dtype
    tx = _pick_tx_kgs(nx, ny, nz, ext, dtype.itemsize, n_lower, analytic is not None)
    if tx is None:
        raise ValueError(
            f"K=2 GS-fused sweep does not fit VMEM for plane {ny}x{nz}"
        )
    if b_xpad is None:
        assert analytic is not None
        b_xpad = jnp.zeros((1, 1, 1), dtype=dtype)
    if store2 is None or n_lower == 0:
        store2 = jnp.zeros((1, nxp, ny, nz), dtype=dtype)
    n_store = 2 * n_lower
    store_flat = store2.reshape(store2.shape[0] * nxp, ny, nz)
    if x_origin is None:
        x_origin = jnp.zeros((1, 1), jnp.int32)
    else:
        x_origin = jnp.asarray(x_origin, jnp.int32).reshape(1, 1)
    if edges is None:
        edges = jnp.ones((2, 1), jnp.int32)
    else:
        edges = jnp.asarray(edges, jnp.int32).reshape(2, 1)

    kernel = functools.partial(
        _evolve_kernel_kgs,
        order=order,
        scale=scale,
        tx=tx,
        ext=ext,
        n_lower=n_lower,
        analytic=analytic,
    )
    b_rows_alloc = 1 if analytic is not None else tx + 2 * ext
    lower_rows_alloc = max(n_store, 1) * (tx + 4 * ext)

    with jax.enable_x64(False):
        out, red_u, red_w = pl.pallas_call(
            kernel,
            grid=(nx // tx,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nxp, ny, nz), dtype),
                jax.ShapeDtypeStruct((1 + n_lower, 1), dtype),
                jax.ShapeDtypeStruct((1 + n_store, 1), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, tx + 4 * ext, ny, nz), dtype),
                pltpu.VMEM((tx + 2 * ext, ny, nz), dtype),
                pltpu.VMEM((b_rows_alloc, ny, nz), dtype),
                pltpu.VMEM((tx, ny, nz), dtype),
                pltpu.VMEM((lower_rows_alloc, ny, nz), dtype),
                pltpu.VMEM((2 * ext, ny, nz), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((max(n_store, 1),)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(phi_xpad2, b_xpad, store_flat, coef, x_origin, edges)
    return out, red_u, red_w


def kgs_coef_update(red_u, red_w, gram_g, gram_h, n_lower: int, dtype):
    """Scalar algebra between K=2 GS-fused passes (see module comment)."""
    inv1 = 1.0 / jnp.sqrt(red_u[0, 0])
    if n_lower == 0:
        inv2 = 1.0 / jnp.sqrt(inv1 * inv1 * red_w[0, 0])
        return (inv2 * inv1).reshape(1, 1).astype(dtype)
    s = n_lower
    corr1 = red_u[1:, 0] * inv1
    ov_l_w = red_w[1 : 1 + s, 0]
    ov_sl_w = red_w[1 + s :, 0]
    lead = inv1 * inv1 * red_w[0, 0]
    n2_2 = (
        lead
        - 2.0 * inv1 * jnp.dot(corr1, ov_sl_w)
        + corr1 @ gram_g @ corr1
    )
    # Cancellation guard: when ψ is nearly parallel to the stored states
    # (e.g. an excited state freshly cloned from its lower state), the
    # post-projection norm² is the difference of O(1) terms and f32 input
    # noise can drive it ≤ 0 → NaN. Flooring it only mis-scales ψ (pure
    # scale errors are re-measured away at the next loop head); the solver
    # additionally runs each state's first chunk on the 1-step path so this
    # regime is never steady-state.
    n2_2 = jnp.maximum(n2_2, 1e-6 * lead)
    ov2 = inv1 * ov_l_w - gram_h @ corr1
    inv2 = 1.0 / jnp.sqrt(n2_2)
    return jnp.concatenate(
        [
            (inv2 * inv1).reshape(1, 1),
            (ov2 * inv2).reshape(s, 1),
            (inv2 * corr1).reshape(s, 1),
        ]
    ).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "dt", "dn", "mass", "n_steps", "n_lower", "analytic", "interpret"
    ),
)
def evolve_chunk_fused_kgs(
    phi_xpad2: jnp.ndarray,
    b_xpad: Optional[jnp.ndarray],
    store2: Optional[jnp.ndarray],
    gram_g: Optional[jnp.ndarray],
    gram_h: Optional[jnp.ndarray],
    order: str,
    dt: float,
    dn: float,
    mass: float,
    n_steps: int,
    n_lower: int,
    analytic=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``n_steps`` sweeps (must be even) with per-step normalise + GS, two
    per HBM pass. Preserves the reference's per-step semantics
    (src/grid.rs:674-681) exactly in exact arithmetic; see the module
    comment for the deferred-correction algebra."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = dt / (k * dn * dn * mass)
    assert n_steps % 2 == 0
    dtype = phi_xpad2.dtype
    s = n_lower
    coef0 = jnp.concatenate(
        [jnp.ones((1, 1), dtype), jnp.zeros((2 * s, 1), dtype)]
    )

    def body(_i, carry):
        phi, coef = carry
        phi, red_u, red_w = evolve_steps_fused_kgs(
            phi, b_xpad, store2, coef, order, scale, s, interpret, analytic
        )
        coef = kgs_coef_update(red_u, red_w, gram_g, gram_h, s, dtype)
        return phi, coef

    phi, coef = jax.lax.fori_loop(0, n_steps // 2, body, (phi_xpad2, coef0))
    if s:
        proj = jnp.tensordot(coef[1:, 0], store2, axes=1)
        return phi * coef[0, 0] - proj
    return phi * coef[0, 0]
