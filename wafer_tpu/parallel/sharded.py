"""Sharded solver kernels: evolve + observables over a device mesh.

Layout: the sharded path stores *interior-only* arrays (N³ — the reference's
work area) block-partitioned over a 3D mesh. Halos are materialised per step
by :func:`wafer_tpu.parallel.halo.exchange_halos` (ppermute faces over ICI;
zeros at the global Dirichlet boundary), which reproduces the single-device
padded-array semantics exactly. Global reductions (energy, norm², V∞, ⟨r²⟩,
Gram-Schmidt overlaps) are block partials + ``psum``.

The per-state maths matches the single-device ops in wafer_tpu/ops (same
update rule as src/grid.rs:544-687 and reductions as src/grid.rs:303-445).
"""

from __future__ import annotations

import itertools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from wafer_tpu import geometry
from wafer_tpu.config import Config
from wafer_tpu.parallel.halo import edge_flags, exchange_halos, ici_interpret
from wafer_tpu.parallel.mesh import AXIS_NAMES

log = logging.getLogger("wafer")


def _abs2(w):
    if jnp.iscomplexobj(w):
        return jnp.real(w) ** 2 + jnp.imag(w) ** 2
    return w * w


def _psum(x):
    return lax.psum(x, AXIS_NAMES)


class ShardedOps:
    """Jitted sharded kernels for one (config, mesh, n_lower) combination.

    ``pot_sub`` mode is fixed at construction: ``pot_sub_scalar`` (constant
    V∞, folded into the reduction), a sharded pot_sub array (FullCornell), or
    neither.
    """

    def __init__(
        self,
        config: Config,
        mesh,
        n_lower: int,
        has_pot_sub_array: bool = False,
        pot_sub_scalar: Optional[float] = None,
        use_pallas: Optional[bool] = None,
        pallas_interpret: bool = False,
        v_shift: float = 0.0,
        k_fuse: Optional[int] = None,
        res_steps: Optional[int] = None,
        allow_ici: bool = True,
    ):
        self.config = config
        self.mesh = mesh
        self.n_lower = n_lower
        self.has_pot_sub_array = has_pot_sub_array
        natural_shape = tuple(int(mesh.shape[a]) for a in AXIS_NAMES)

        order = config.central_difference.value
        ext = config.central_difference.ext
        dn, dt, mass = config.grid.dn, config.grid.dt, config.mass
        _offs, _coeffs, _center, k = geometry.stencil_coefficients(order)
        denom = k * dn * dn * mass
        scale = dt / denom
        screen_update = config.output.screen_update

        from wafer_tpu.ops import pallas_stencil as pk
        from wafer_tpu.ops.stencil import stencil_taps
        from wafer_tpu.parallel.halo import _pad_axis

        dims = config.work_size()
        itemsize = jnp.dtype(config.real_dtype).itemsize

        # Transposed layout: local blocks are stored with the grid axes
        # permuted so the best kernel mode applies — the stencil and the
        # analytic radial/separable potentials are permutation-invariant
        # once the grid extents are permuted with the coordinates, and the
        # only cost is one transpose at the host↔mesh boundaries
        # (put/get). Candidate permutations are ranked by the kernel they
        # enable:
        #   3  "x"   — only the leading axis sharded: the whole single-axis
        #              fused-kernel ladder (windows/residency/ICI)
        #   2  "yzp", zp=0 — multi-axis with the UNsharded axis last: the
        #              y/z-padded kernel keeps the global z Dirichlet
        #              in-register (no 128-lane z pads, which at 128-lane
        #              blocks triple the VPU work)
        #   1  "yzp" — fully-sharded meshes: aligned pads on both y and z
        #   0  —       XLA shifted-slice fallback
        # The shard-count-sorted perm is tried first (ties → natural order,
        # so x-only and symmetric meshes keep identity and single-axis y/z
        # meshes keep their round-2 transposed layout), then identity, then
        # the remaining permutations.
        def _classify(p):
            ms = tuple(natural_shape[i] for i in p)
            nx_, ny_, nz_ = (dims[i] for i in p)
            bx_, by_, bz_ = nx_ // ms[0], ny_ // ms[1], nz_ // ms[2]
            if (
                config.potential.is_complex
                or config.real_dtype != jnp.float32
                or nx_ % ms[0]
                or ny_ % ms[1]
                or nz_ % ms[2]
                or bx_ < ext
            ):
                return 0, None, 0
            if (
                ms[1] == 1
                and ms[2] == 1
                and ny_ % 8 == 0
                and nz_ % 128 == 0
                and pk.step_fused_supported(bx_, ny_, nz_, ext, itemsize,
                                            n_lower)
            ):
                return 3, "x", 0
            if (ms[1] > 1 or ms[2] > 1) and by_ >= ext and bz_ >= ext:
                zp_ = 0 if ms[2] == 1 else pk._YZP_ZPAD
                if pk.step_fused_yzp_supported(bx_, by_, bz_, ext, itemsize,
                                               n_lower, zp_):
                    return (2 if zp_ == 0 else 1), "yzp", zp_
            return 0, None, 0

        _sorted_perm = tuple(sorted(range(3), key=lambda i: -natural_shape[i]))
        _cands = [_sorted_perm, (0, 1, 2)]
        _cands += [
            p for p in itertools.permutations(range(3)) if p not in _cands
        ]
        _best = max(range(len(_cands)), key=lambda j: _classify(_cands[j])[0])
        _rank, pallas_mode, yzp_zp = _classify(_cands[_best])
        perm = _cands[_best] if _rank > 0 else _sorted_perm
        self.perm = perm
        self.inv_perm = tuple(int(i) for i in np.argsort(perm))
        axis_names = tuple(AXIS_NAMES[i] for i in perm)
        self.axis_names = axis_names
        # local view: mesh extent per local-array axis
        self.mesh_shape = tuple(natural_shape[i] for i in perm)
        mesh_shape = self.mesh_shape
        self.yzp_zp = yzp_zp

        nx, ny, nz = (dims[i] for i in perm)
        bx = nx // mesh_shape[0]
        by = ny // mesh_shape[1]
        bz = nz // mesh_shape[2]
        if min(natural_shape) > 1:
            # every permutation of a fully-3D mesh shards the 128-lane
            # axis; the mandatory lane pads cost ~3.4× the interior VPU
            # work at 256³-class blocks (measured, BASELINE.md round 3) —
            # no relayout escapes it, so prefer 2-axis shapes
            log.info(
                "Fully-3D mesh %s: the sharded lane axis pays a ~3.4x "
                "padded-plane VPU tax — a 2-axis mesh over the same %d "
                "devices (e.g. %dx%dx1) is typically much faster",
                tuple(natural_shape),
                int(np.prod(natural_shape)),
                natural_shape[0] * natural_shape[2], natural_shape[1],
            )
        if use_pallas is None:
            use_pallas = (
                pallas_mode is not None
                and jax.default_backend() not in ("cpu",)
            )
        elif use_pallas and pallas_mode is None:
            raise ValueError(
                "sharded pallas sweep requires real f32, tile-aligned "
                "per-shard blocks and a VMEM-sized slab"
            )
        self.use_pallas = use_pallas
        self.pallas_mode = pallas_mode if use_pallas else None

        # analytic-B per shard: the kernel takes the shard's global x origin
        # as a traced SMEM scalar, so formula potentials skip the B stream
        from wafer_tpu.config import PotentialType

        analytic = None
        _analytic_kinds = {
            PotentialType.NO_POTENTIAL: "NoPotential",
            PotentialType.HARMONIC: "Harmonic",
            PotentialType.COULOMB: "Coulomb",
            PotentialType.SIMPLE_CORNELL: "SimpleCornell",
            PotentialType.PERIODIC: "Periodic",
        }
        if self.pallas_mode == "x":
            _analytic_fits = (
                pk._pick_tx(bx, ny, nz, ext, itemsize, n_lower, True) is not None
                or pk._pick_tx_yt(bx, ny, nz, ext, itemsize, n_lower, True)
                is not None
                or pk._pick_tx_zt(bx, ny, nz, ext, itemsize, n_lower, True)
                is not None
            )
        elif self.pallas_mode == "yzp":
            _analytic_fits = (
                pk._pick_tx_yzp(
                    bx, by + 2 * pk._YZP_YPAD, bz + 2 * yzp_zp, by, bz,
                    ext, itemsize, n_lower, True,
                )
                is not None
            )
        else:
            _analytic_fits = False
        if (
            use_pallas
            and config.potential in _analytic_kinds
            and _analytic_fits
        ):
            g = config.grid
            analytic = (
                _analytic_kinds[config.potential],
                g.dn,
                g.dt,
                config.mass,
                g.size.as_tuple()[perm[0]],
                g.size.as_tuple()[perm[1]],
                g.size.as_tuple()[perm[2]],
                config.sig,
                v_shift,  # gauge shift — must match the caller's a/b arrays
            )
        self.analytic = analytic

        # K-step temporal blocking on the ground state (see
        # ops/pallas_stencil._evolve_kernel_k): exchange K·ext-wide x-halos
        # per fused call instead of ext per step, halving the per-shard HBM
        # traffic like the single-chip ladder. The kernel's Dirichlet edge
        # masking is driven by per-shard global-edge flags.
        forced_k = k_fuse
        k_fuse = 1
        if use_pallas and self.pallas_mode == "x" and n_lower == 0:
            if forced_k is not None:  # explicit override (tests/benchmarks)
                k_fuse = forced_k
            else:
                k_fuse = pk.pick_k_fuse(bx, ny, nz, ext, itemsize, analytic is not None)
            if bx < k_fuse * ext:  # ppermute face must fit the block extent
                k_fuse = 2 if bx >= 2 * ext and pk.k_fuse_supported(
                    bx, ny, nz, ext, itemsize, 2, analytic is not None
                ) else 1
        self.k_fuse = k_fuse

        # Sharded VMEM-resident chunks (ground state, analytic-B): exchange
        # an R·ext-deep ghost zone once per R resident in-kernel steps —
        # zero HBM traffic between exchanges and an R× cut in ppermute
        # rounds (same exchanged volume). R is capped by the resident VMEM
        # budget for the (bx + 2R·ext) block and by screen_update.
        forced_res = res_steps
        res_steps = 0
        if (
            use_pallas
            and self.pallas_mode == "x"
            and n_lower == 0
            and analytic is not None
        ):
            candidates = (
                (forced_res,) if forced_res is not None else (16, 8, 4, 2)
            )
            for r in candidates:
                if r > screen_update or bx < r * ext:
                    continue
                # blind-sweep recompute amplification (bx + 2(R−1)e)/bx:
                # cap at 1.25 — past it the VPU recompute erases the win
                # over the K ladder (auto mode only)
                if forced_res is None and 8 * (r - 1) * ext > bx:
                    continue
                nxp_r = bx + 2 * r * ext
                if (
                    nxp_r * ny * nz * itemsize <= pk._RES_BUDGET
                    and pk._pick_tx_res(nxp_r - 2 * ext, ext) is not None
                ):
                    res_steps = r
                    break
        self.res_steps = res_steps

        # Degenerate 1-shard x axis with ψ past whole-array residency
        # (512³-class): ride the single-chip x-blocked deep-halo resident
        # kernel (its unconditional edge zeroing IS the global Dirichlet
        # here) instead of the K ladder
        resb_plan = None
        if (
            use_pallas
            and self.pallas_mode == "x"
            and n_lower == 0
            and mesh_shape[0] == 1
            and analytic is not None
            and not pk.resident_supported(bx, ny, nz, ext, itemsize, True)
        ):
            resb_plan = pk.pick_resb(bx, ny, nz, ext, itemsize, screen_update)
        self.resb_plan = resb_plan

        # Multi-shard axes whose block exceeds windowed residency
        # (512³-class shards on small meshes): exchange an R·ext-deep
        # ghost zone per window and run the window as ONE out-of-place
        # blocked pass (edges-gated Dirichlet; every block reads
        # pre-window data, so the deep-ghost-zone argument holds at the
        # shard seams too)
        resb_sharded = None
        if (
            use_pallas
            and self.pallas_mode == "x"
            and n_lower == 0
            and mesh_shape[0] > 1
            and analytic is not None
            and res_steps == 0
        ):
            resb_sharded = pk.pick_resb(
                bx, ny, nz, ext, itemsize, screen_update
            )
        self.resb_sharded = resb_sharded

        # In-kernel ICI residency (ground): ψ stays VMEM-resident for the
        # WHOLE chunk — at every R-step window boundary the still-exact
        # interior edge strips ride remote DMAs (pltpu.make_async_remote_copy
        # over the mesh ring) into parity-slotted landing strips that become
        # the next window's deep halo, replacing the per-window host
        # ppermute + full ψ HBM round trip (the measured ~25% sharded gap).
        # See ops/pallas_stencil._evolve_kernel_res (ici_r > 0).
        import os as _os_i

        _ici_env = _os_i.environ.get("WAFER_SHARDED_ICI", "1")
        ici_res = False
        if (
            _ici_env in ("1", "force")
            and allow_ici  # multi-slice rings: RDMA cannot cross DCN
            and use_pallas
            and self.pallas_mode == "x"
            and n_lower == 0
            and analytic is not None
            and res_steps > 1
            and (mesh_shape[0] > 1 or _ici_env == "force")
            and screen_update >= res_steps
        ):
            # ψ block + landing strips (4·halo planes) must fit the
            # resident budget together
            nxp_r = bx + 2 * res_steps * ext
            ici_res = (
                (nxp_r + 4 * res_steps * ext) * ny * nz * itemsize
                <= pk._RES_BUDGET
            )
        self.ici_res = ici_res

        # Sharded excited alternative: per-step ψ-resident sweeps (R = 1 —
        # the per-step global Gram-Schmidt reductions forbid deeper
        # residency without in-kernel collectives) with the l/Sl windows
        # streamed, in bf16 when the sublane tiling allows. Measured on a
        # 1×1×1 mesh at 256³: 2.38e10 vs the windowed carried-coefficient
        # path's ~3.2e10 — the per-step ψ load/store does NOT overlap the
        # sweep (v5e, see pick_resb's serial-DMA note), so this stays
        # opt-in (WAFER_SHARDED_RES_EXC=1) until residency can span an
        # exchange window.
        use_res_exc = False
        exc_stream_bf16 = False
        if (
            use_pallas
            and self.pallas_mode == "x"
            and n_lower > 0
        ):
            import os as _os_m

            exc_stream_bf16 = (
                _os_m.environ.get("WAFER_EXC_STREAM", "bf16") == "bf16"
                and ny % 16 == 0
            )
            use_res_exc = (
                _os_m.environ.get("WAFER_SHARDED_RES_EXC") == "1"
                and pk.resident_exc_supported(
                    bx, ny, nz, ext, itemsize, n_lower, analytic is not None,
                    stream_itemsize=2 if exc_stream_bf16 else None,
                )
            )
        self.use_res_exc = use_res_exc

        # ICI-resident excited states: ψ VMEM-resident across R-step
        # windows (deep ψ/l/Sl halos exchanged in-kernel) with the
        # per-step Gram coefficients globally reduced by the kernel's
        # scalar all-to-all — per-step reference semantics
        # (src/grid.rs:674-681) at resident-class throughput. R must
        # divide screen_update (no remainder path) and the ψ block +
        # landing strips + stream windows must fit the resident budget.
        # (engaged on 1-shard axes too: self-loopback remote DMAs measured
        # 1.014e11 at 256³ S=1 vs the windowed path's ~3.2e10 — residency
        # across windows pays for the self-copies)
        ici_exc_r = 0
        if (
            _ici_env in ("1", "force")
            and use_pallas
            and self.pallas_mode == "x"
            and n_lower > 0
            and analytic is not None
        ):
            _stream_is = 2 if exc_stream_bf16 else None
            for r in (8, 4, 2):
                if screen_update % r or bx < r * ext:
                    continue
                if 8 * (r - 1) * ext > bx:  # blind-sweep recompute cap
                    continue
                h = r * ext
                if not pk.resident_exc_supported(
                    bx + 2 * (h - ext), ny, nz, ext, itemsize, n_lower,
                    True, stream_itemsize=_stream_is,
                ):
                    continue
                if (bx + 6 * h) * ny * nz * itemsize > pk._RES_BUDGET:
                    continue  # ψ block + 4·halo landing strips
                ici_exc_r = r
                break
        self.ici_exc_r = ici_exc_r

        # Multi-axis meshes: y/z-padded resident windows (ground state,
        # analytic-B). R blind in-kernel sweeps per ψ HBM pass over a block
        # carrying R·ext-deep halos on EVERY axis, exchanged once per
        # window — see ops/pallas_stencil._evolve_kernel_res_yzp. Replaces
        # R per-step HBM streams + R per-axis ppermute rounds with one of
        # each.
        res_yzp = None
        if (
            use_pallas
            and self.pallas_mode == "yzp"
            and n_lower == 0
            and analytic is not None
        ):
            res_yzp = pk.pick_res_yzp(
                bx, by, bz, ext, itemsize, screen_update, yzp_zp
            )
        self.res_yzp = res_yzp

        # Deep-padded block exceeds VMEM (512³-class shards): the x-blocked
        # out-of-place window kernel keeps the once-per-R exchange cadence
        # while streaming VMEM-sized x-blocks — see
        # ops/pallas_stencil._evolve_kernel_resb_yzp
        resb_yzp = None
        if (
            use_pallas
            and self.pallas_mode == "yzp"
            and n_lower == 0
            and analytic is not None
            and res_yzp is None
        ):
            resb_yzp = pk.pick_resb_yzp(
                bx, by, bz, ext, itemsize, screen_update, yzp_zp
            )
        self.resb_yzp = resb_yzp

        def orthogonalise(phi, store):
            for s in range(n_lower):
                lower = store[s]
                overlap = _psum(jnp.sum(jnp.conj(lower) * phi))
                phi = phi - lower * overlap
            return phi

        def _make_evolve_chunk_local(per_step_norm: bool,
                                     psn_windowed: bool = False):
          # per_step_norm: renormalise the ground state every step too —
          # required in f32 when the potential's offset drifts ψ's scale out
          # of range within one chunk (see ops/stencil.evolve_chunk).
          # psn_windowed: on the yzp-resident path, renormalise once per
          # R-step window instead (a pure rescaling of the per-step-
          # renormalised trajectory — docs/PARITY.md divergence 7); only
          # engaged by the solver when the measured drift per window is
          # safely inside f32 range.

          def evolve_chunk_yzp(phi, b, store):
            """Multi-axis-mesh chunk via the y/z-padded kernel: the local
            block carries alignment pads (8 sublanes / 128 lanes) whose
            innermost ext rows are refreshed from neighbours (ppermute;
            zeros at global edges) every step — see
            ops/pallas_stencil._evolve_kernel_yzp. With ``yzp_zp == 0``
            (z axis unsharded) z carries no pads at all: the kernel's
            in-register zero shifts ARE the global z Dirichlet. Corners
            never exchange: the stencil is an axis-aligned star."""
            e = ext
            yp, zp = pk._YZP_YPAD, yzp_zp
            bx_l, by_l, bz_l = phi.shape
            dtype = phi.dtype
            pads = ((e, e), (yp, yp), (zp, zp))
            pad_off = (e, yp, zp)
            blens = (bx_l, by_l, bz_l)
            origin = jnp.stack(
                [
                    jax.lax.axis_index(axis_names[d]).astype(jnp.int32)
                    * jnp.int32(blens[d])
                    for d in range(3)
                ]
            ).reshape(3, 1)

            def to_pad3(p):
                return jnp.pad(p, pads)

            def refresh_axis(pp, axis):
                pad = pad_off[axis]
                blen = blens[axis]
                lo_face = lax.slice_in_dim(pp, pad, pad + e, axis=axis)
                if mesh_shape[axis] == 1:
                    # global Dirichlet on an unsharded axis: the pad rows
                    # the kernel reads must be zero every step
                    z = jnp.zeros_like(lo_face)
                    pp = lax.dynamic_update_slice_in_dim(pp, z, pad - e, axis)
                    return lax.dynamic_update_slice_in_dim(pp, z, pad + blen, axis)
                hi_face = lax.slice_in_dim(
                    pp, pad + blen - e, pad + blen, axis=axis
                )
                from_left = lax.ppermute(
                    hi_face, axis_names[axis],
                    [(j, j + 1) for j in range(mesh_shape[axis] - 1)],
                )
                from_right = lax.ppermute(
                    lo_face, axis_names[axis],
                    [(j + 1, j) for j in range(mesh_shape[axis] - 1)],
                )
                pp = lax.dynamic_update_slice_in_dim(pp, from_left, pad - e, axis)
                return lax.dynamic_update_slice_in_dim(
                    pp, from_right, pad + blen, axis
                )

            def refresh3(pp):
                # zp == 0: z is global and unpadded — nothing to refresh
                for axis in range(3 if zp > 0 else 2):
                    pp = refresh_axis(pp, axis)
                return pp

            b_p3 = (
                None
                if analytic is not None
                else jnp.pad(b, ((0, 0), (yp, yp), (zp, zp)))
            )
            store_p3 = (
                jnp.stack(
                    [refresh3(to_pad3(store[s])) for s in range(n_lower)]
                )
                if n_lower > 0
                else None
            )

            win_yzp = res_yzp if res_yzp is not None else resb_yzp
            if win_yzp is not None and n_lower == 0:
                # resident-window machinery: R blind in-kernel sweeps per ψ
                # HBM pass; R·ext-deep halos on every axis exchanged once
                # per window as full-cross-section strips sequenced x→y→z,
                # so the edge/corner regions R star-stencil steps read
                # compose from already-refreshed lower-axis halos (a y
                # strip spans the just-filled x halos, a z strip both)
                if res_yzp is not None:
                    r_w, yp_w = res_yzp
                else:
                    # >VMEM blocks: same window contract, x-blocked kernel
                    bxk_w, r_w, tx_w, yp_w = resb_yzp
                h = r_w * ext
                pad_off_w = (h, yp_w, zp)
                pads_w = ((h, h), (yp_w, yp_w), (zp, zp))
                edges = jnp.concatenate(
                    [
                        edge_flags(axis_names[d], mesh_shape[d])
                        for d in range(3)
                    ]
                )

                def refresh_deep(pp):
                    for axis in range(3 if zp > 0 else 2):
                        pad = pad_off_w[axis]
                        blen = blens[axis]
                        lo = lax.slice_in_dim(pp, pad, pad + h, axis=axis)
                        if mesh_shape[axis] == 1:
                            zer = jnp.zeros_like(lo)
                            pp = lax.dynamic_update_slice_in_dim(
                                pp, zer, pad - h, axis
                            )
                            pp = lax.dynamic_update_slice_in_dim(
                                pp, zer, pad + blen, axis
                            )
                            continue
                        hi = lax.slice_in_dim(
                            pp, pad + blen - h, pad + blen, axis=axis
                        )
                        from_left = lax.ppermute(
                            hi, axis_names[axis],
                            [(j, j + 1)
                             for j in range(mesh_shape[axis] - 1)],
                        )
                        from_right = lax.ppermute(
                            lo, axis_names[axis],
                            [(j + 1, j)
                             for j in range(mesh_shape[axis] - 1)],
                        )
                        pp = lax.dynamic_update_slice_in_dim(
                            pp, from_left, pad - h, axis
                        )
                        pp = lax.dynamic_update_slice_in_dim(
                            pp, from_right, pad + blen, axis
                        )
                    return pp

                if res_yzp is not None:
                    def call_window(pp, with_norm=False):
                        return pk.evolve_window_res_yzp(
                            pp, order, scale, r_w, analytic, origin, edges,
                            h, yp_w, zp, pallas_interpret,
                            with_norm=with_norm,
                        )
                else:
                    def call_window(pp, with_norm=False):
                        return pk.evolve_window_resb_yzp(
                            pp, order, scale, r_w, analytic, origin, edges,
                            h, yp_w, zp, bxk_w, tx_w, pallas_interpret,
                            with_norm=with_norm,
                        )

            if n_lower == 0 and not per_step_norm:
                if win_yzp is not None:

                    def body_w(_i, pp):
                        pp = refresh_deep(pp)
                        return call_window(pp)

                    pp = lax.fori_loop(
                        0, screen_update // r_w, body_w, jnp.pad(phi, pads_w)
                    )
                    return pp[
                        h : h + bx_l, yp_w : yp_w + by_l, zp : zp + bz_l
                    ]

                def body(_i, pp):
                    pp = refresh3(pp)
                    out, _n2, _ov = pk.evolve_step_fused_yzp(
                        pp, b_p3, None, order, scale, 0, False,
                        pallas_interpret, analytic=analytic, origin=origin,
                        zp=zp,
                    )
                    return out

                pp = lax.fori_loop(0, screen_update, body, to_pad3(phi))
                return pp[e : e + bx_l, yp : yp + by_l, zp : zp + bz_l]

            if n_lower == 0 and psn_windowed:
                assert win_yzp is not None

                def body_nw(_i, carry):
                    pp, n2 = carry
                    inv = (
                        1.0 / jnp.sqrt(jnp.maximum(n2, 1e-37))
                    ).astype(dtype)
                    pp = refresh_deep(pp * inv)
                    pp, n2_loc = call_window(pp, with_norm=True)
                    return pp, _psum(n2_loc)

                pp, n2 = lax.fori_loop(
                    0, screen_update // r_w, body_nw,
                    (jnp.pad(phi, pads_w), jnp.ones((), dtype)),
                )
                inv = (1.0 / jnp.sqrt(jnp.maximum(n2, 1e-37))).astype(dtype)
                return (
                    pp[h : h + bx_l, yp_w : yp_w + by_l, zp : zp + bz_l]
                    * inv
                )

            if n_lower == 0:

                def body_norm(_i, carry):
                    pp, coef = carry
                    pp = refresh3(pp)
                    out, n2_loc, _ov = pk.evolve_step_fused_yzp(
                        pp, b_p3, None, order, scale, 0, True,
                        pallas_interpret, coef, analytic, origin, zp,
                    )
                    inv = (1.0 / jnp.sqrt(_psum(n2_loc))).astype(dtype)
                    return out, inv.reshape(1, 1)

                coef0 = jnp.ones((1, 1), dtype)
                pp, coef = lax.fori_loop(
                    0, screen_update, body_norm, (to_pad3(phi), coef0)
                )
                return (
                    pp[e : e + bx_l, yp : yp + by_l, zp : zp + bz_l]
                    * coef[0, 0]
                )

            coef0 = jnp.concatenate(
                [jnp.ones((1, 1), dtype), jnp.zeros((n_lower, 1), dtype)]
            )

            def body_exc(_i, carry):
                pp, coef = carry
                pp = refresh3(pp)
                out, n2_loc, ov_loc = pk.evolve_step_fused_yzp(
                    pp, b_p3, store_p3, order, scale, n_lower, True,
                    pallas_interpret, coef, analytic, origin, zp,
                )
                inv = (1.0 / jnp.sqrt(_psum(n2_loc))).astype(dtype)
                ov = _psum(ov_loc)
                coef = jnp.concatenate(
                    [inv.reshape(1, 1), (ov * inv).reshape(n_lower, 1)]
                )
                return out, coef

            pp, coef = lax.fori_loop(
                0, screen_update, body_exc, (to_pad3(phi), coef0)
            )
            proj = jnp.tensordot(coef[1:, 0], store, axes=1)
            return (
                pp[e : e + bx_l, yp : yp + by_l, zp : zp + bz_l] * coef[0, 0]
                - proj
            )

          def step_local(phi, a, b, store):
            padded = exchange_halos(phi, ext, mesh_shape, axis_names)
            taps = stencil_taps(padded, order)
            phi = phi * a + b * (dt / denom) * taps
            if n_lower > 0 or per_step_norm:
                norm2 = _psum(jnp.sum(_abs2(phi)))
                phi = phi / jnp.sqrt(norm2).astype(phi.dtype)
            if n_lower > 0:
                phi = orthogonalise(phi, store)
            return phi

          def evolve_chunk_local(phi, a, b, store):
            if not use_pallas:
                return lax.fori_loop(
                    0, screen_update, lambda _i, p: step_local(p, a, b, store), phi
                )
            if self.pallas_mode == "yzp":
                return evolve_chunk_yzp(phi, b, store)

            # fused-kernel path: ppermute x-halo exchange + local pallas
            # sweep. Excited states carry the normalise+project update as an
            # affine coefficient vector (local reductions → psum → coef)
            # applied inside the next sweep. The stored states' x-halos must
            # hold *neighbour* rows (not zeros): the in-kernel correction
            # also applies to the exchanged ψ halo rows.
            store_x = (
                jnp.stack(
                    [
                        _pad_axis(store[s], ext, 0, axis_names[0], mesh_shape[0])
                        for s in range(n_lower)
                    ]
                )
                if n_lower > 0
                else None
            )
            # the windowed kernel streams stored-state windows in bf16
            # when the sublane tiling allows (evolve_step_fused upcasts
            # on the variants that cannot) — see docs/PARITY.md #10
            store_x_stream = store_x
            if store_x is not None and exc_stream_bf16:
                store_x_stream = store_x.astype(jnp.bfloat16)
            dtype = phi.dtype
            nxs = mesh_shape[0]

            x_org = (
                jax.lax.axis_index(axis_names[0]).astype(jnp.int32) * jnp.int32(bx)
            ).reshape(1, 1)

            def to_xpad(p, pad):
                return jnp.pad(p, ((pad, pad), (0, 0), (0, 0)))

            def refresh_halo(p_xpad, pad):
                """Refresh the x halo rows in place from the neighbours —
                no full-array pad/slice round trip per step (measured: the
                per-call pad+slice cost the 1×1×1 mesh ~17% vs the
                single-chip kernel). On an unsharded axis the kernel itself
                re-zeroes the global-Dirichlet pad rows every call, so
                nothing needs refreshing."""
                if nxs == 1:
                    return p_xpad
                bx_l = p_xpad.shape[0] - 2 * pad
                hi_face = lax.slice_in_dim(p_xpad, bx_l, bx_l + pad, axis=0)
                lo_face = lax.slice_in_dim(p_xpad, pad, 2 * pad, axis=0)
                from_left = lax.ppermute(
                    hi_face, axis_names[0], [(i, i + 1) for i in range(nxs - 1)]
                )
                from_right = lax.ppermute(
                    lo_face, axis_names[0], [(i + 1, i) for i in range(nxs - 1)]
                )
                p_xpad = lax.dynamic_update_slice_in_dim(p_xpad, from_left, 0, 0)
                return lax.dynamic_update_slice_in_dim(
                    p_xpad, from_right, pad + bx_l, 0
                )

            if n_lower == 0 and not per_step_norm:
                if self.ici_res:
                    # whole-chunk ψ residency with in-kernel ICI exchanges:
                    # ONE host-side deep-halo ppermute seeds window 0; the
                    # kernel's remote DMAs refresh the ghost zone at every
                    # R-step boundary. Old-style interpret (bool) cannot
                    # model remote DMAs — tests ride the TPU interpret mode.
                    ici_interp = ici_interpret(pallas_interpret)
                    edges = edge_flags(axis_names[0], mesh_shape[0])
                    pad = res_steps * ext
                    n_win = screen_update // res_steps
                    p = refresh_halo(to_xpad(phi, pad), pad)
                    p = pk.evolve_chunk_resident(
                        p, order, dt, dn, mass, n_win * res_steps, analytic,
                        interpret=ici_interp, x_origin=x_org, edges=edges,
                        halo=pad, ici_steps=res_steps,
                        ici_axis=axis_names[0], ici_nsh=mesh_shape[0],
                    )
                    p = p[pad:-pad]
                    for _ in range(screen_update % res_steps):
                        p1 = refresh_halo(to_xpad(p, ext), ext)
                        out1, _n2, _ov = pk.evolve_step_fused(
                            p1, None, None, order, scale, 0, False,
                            pallas_interpret, analytic=analytic,
                            x_origin=x_org,
                        )
                        p = out1[ext:-ext]
                    return p
                if (
                    nxs == 1
                    and analytic is not None
                    and pk.resident_supported(bx, ny, nz, ext, itemsize, True)
                ):
                    # degenerate unsharded x axis (1×1×1 mesh): there is
                    # nothing to exchange, so the whole chunk runs as ONE
                    # resident call — the per-R kernel re-entries would
                    # pay a full ψ HBM round trip each (serial DMA; the
                    # measured ~25% gap of the round-2/3 sanity bench)
                    p = pk.evolve_chunk_resident(
                        to_xpad(phi, ext), order, dt, dn, mass,
                        screen_update, analytic,
                        interpret=pallas_interpret, x_origin=x_org,
                    )
                    return p[ext:-ext]
                if nxs == 1 and self.resb_plan is not None:
                    # degenerate unsharded x axis, ψ exceeds whole-array
                    # residency (512³-class): the single-chip x-blocked
                    # deep-halo resident kernel applies unchanged
                    rb = self.resb_plan
                    pad_b = rb[1] * ext
                    p = pk.evolve_chunk_resident_blocked(
                        to_xpad(phi, pad_b), order, dt, dn, mass,
                        screen_update, analytic, bx=rb[0], r_steps=rb[1],
                        interpret=pallas_interpret, tx=rb[2],
                        prefetch=rb[3],
                    )
                    return p[pad_b:-pad_b]
                if res_steps > 1:
                    # VMEM-resident chunks with a deep ghost zone
                    edges = edge_flags(axis_names[0], mesh_shape[0])
                    pad = res_steps * ext

                    def body_r(_i, p):
                        p = refresh_halo(p, pad)
                        return pk.evolve_chunk_resident(
                            p, order, dt, dn, mass, res_steps, analytic,
                            interpret=pallas_interpret,
                            x_origin=x_org, edges=edges, halo=pad,
                        )

                    p = lax.fori_loop(
                        0, screen_update // res_steps, body_r, to_xpad(phi, pad)
                    )
                    p = p[pad:-pad]
                    # remainder steps via the 1-step body
                    for _ in range(screen_update % res_steps):
                        p1 = refresh_halo(to_xpad(p, ext), ext)
                        out1, _n2, _ov = pk.evolve_step_fused(
                            p1,
                            None if analytic is not None else b,
                            None,
                            order,
                            scale,
                            0,
                            False,
                            pallas_interpret,
                            analytic=analytic,
                            x_origin=x_org,
                        )
                        p = out1[ext:-ext]
                    return p
                if self.resb_sharded is not None:
                    # blocked exchange windows: R·ext-deep ghost zone per
                    # window, window = ONE out-of-place blocked pass
                    rb = self.resb_sharded
                    pad = rb[1] * ext
                    edges = edge_flags(axis_names[0], mesh_shape[0])

                    def body_rb(_i, p):
                        p = refresh_halo(p, pad)
                        return pk.evolve_steps_resident_blocked(
                            p, order, scale, rb[0], rb[1], analytic,
                            pallas_interpret, rb[2], rb[3],
                            x_origin=x_org, edges=edges,
                        )

                    p = lax.fori_loop(
                        0, screen_update // rb[1], body_rb, to_xpad(phi, pad)
                    )
                    p = p[pad:-pad]
                    for _ in range(screen_update % rb[1]):
                        p1 = refresh_halo(to_xpad(p, ext), ext)
                        out1, _n2, _ov = pk.evolve_step_fused(
                            p1, None, None, order, scale, 0, False,
                            pallas_interpret, analytic=analytic,
                            x_origin=x_org,
                        )
                        p = out1[ext:-ext]
                    return p
                if k_fuse > 1:
                    # K-fused chunk: one halo refresh of K·ext-wide faces
                    # per fused call; Dirichlet masking only on true global
                    # edges (interior halos hold real neighbour data). B's
                    # (K−1)·ext neighbour rows are exchanged once per chunk
                    # (B is static within a state).
                    edges = edge_flags(axis_names[0], mesh_shape[0])
                    pad = k_fuse * ext
                    if analytic is not None:
                        b_kpad = jnp.zeros((1, 1, 1), dtype=phi.dtype)
                    else:
                        b_kpad = _pad_axis(
                            b, (k_fuse - 1) * ext, 0, axis_names[0], mesh_shape[0]
                        )

                    def body_k(_i, p):
                        p = refresh_halo(p, pad)
                        return pk.evolve_steps_fused_k(
                            p,
                            b_kpad,
                            order,
                            scale,
                            k_fuse,
                            analytic,
                            pallas_interpret,
                            x_origin=x_org,
                            edges=edges,
                        )

                    p = lax.fori_loop(
                        0, screen_update // k_fuse, body_k, to_xpad(phi, pad)
                    )
                    p = p[pad:-pad]
                    # remainder steps (screen_update % K) via the 1-step body
                    for _ in range(screen_update % k_fuse):
                        p1 = refresh_halo(to_xpad(p, ext), ext)
                        out1, _n2, _ov = pk.evolve_step_fused(
                            p1,
                            None if analytic is not None else b,
                            None,
                            order,
                            scale,
                            0,
                            False,
                            pallas_interpret,
                            analytic=analytic,
                            x_origin=x_org,
                        )
                        p = out1[ext:-ext]
                    return p

                def body(_i, p):
                    p = refresh_halo(p, ext)
                    out_xpad, _n2, _ov = pk.evolve_step_fused(
                        p,
                        None if analytic is not None else b,
                        None,
                        order,
                        scale,
                        0,
                        False,
                        pallas_interpret,
                        analytic=analytic,
                        x_origin=x_org,
                    )
                    return out_xpad

                p = lax.fori_loop(0, screen_update, body, to_xpad(phi, ext))
                return p[ext:-ext]

            if n_lower == 0:
                # ground state, per-step renormalisation carried as the
                # inverse-norm coefficient (globally psum-reduced)
                def body_norm(_i, carry):
                    p, coef = carry
                    p = refresh_halo(p, ext)
                    out_xpad, n2_loc, _ov = pk.evolve_step_fused(
                        p,
                        None if analytic is not None else b,
                        None,
                        order,
                        scale,
                        0,
                        True,
                        pallas_interpret,
                        coef,
                        analytic,
                        x_org,
                    )
                    inv = (1.0 / jnp.sqrt(_psum(n2_loc))).astype(dtype)
                    return out_xpad, inv.reshape(1, 1)

                coef0 = jnp.ones((1, 1), dtype)
                p, coef = lax.fori_loop(
                    0, screen_update, body_norm, (to_xpad(phi, ext), coef0)
                )
                return p[ext:-ext] * coef[0, 0]

            if self.ici_exc_r:
                # ICI-resident excited chunk: ONE kernel call spans the
                # whole chunk; ψ/l/Sl carry R·ext-deep neighbour halos
                # (stores exchanged once per chunk — they are static), the
                # kernel exchanges ψ strips per window and reduction
                # scalars per step, and red returns GLOBAL sums (no psum).
                r_ici = self.ici_exc_r
                pad = r_ici * ext
                ici_interp = ici_interpret(pallas_interpret)
                edges = edge_flags(axis_names[0], mesh_shape[0])
                # deep-padded stores; their swept images are valid on all
                # streamed rows [ext, nxp−ext) because the sweep reads only
                # the outer ext rows blind (real neighbour data to depth
                # pad; zeros at global edges)
                x_org_deep = x_org - jnp.int32(pad - ext)
                store_deep = jnp.stack(
                    [
                        _pad_axis(store[s], pad, 0, axis_names[0],
                                  mesh_shape[0])
                        for s in range(n_lower)
                    ]
                )
                sls = []
                for s_i in range(n_lower):
                    sl_s, _n2s, _ovs = pk.evolve_step_fused(
                        store_deep[s_i], None, None, order, scale, 0,
                        False, pallas_interpret, analytic=analytic,
                        x_origin=x_org_deep,
                    )
                    sls.append(sl_s)
                sstore_deep = jnp.stack(sls)
                store_s, sstore_s = store_deep, sstore_deep
                if exc_stream_bf16:
                    store_s = store_deep.astype(jnp.bfloat16)
                    sstore_s = sstore_deep.astype(jnp.bfloat16)
                coef0_re = jnp.concatenate(
                    [
                        jnp.ones((1, 1), jnp.float32),
                        jnp.zeros((n_lower, 1), jnp.float32),
                    ]
                )
                p = refresh_halo(to_xpad(phi, pad), pad)
                out_x, red = pk.evolve_chunk_resident(
                    p, order, dt, dn, mass, screen_update, analytic,
                    interpret=ici_interp, store_xpad=store_s,
                    sstore_xpad=sstore_s, x_origin=x_org, edges=edges,
                    halo=pad, coef0=coef0_re, raw_reductions=True,
                    ici_steps=r_ici, ici_axis=axis_names[0],
                    ici_nsh=mesh_shape[0],
                )
                inv = jax.lax.rsqrt(
                    jnp.maximum(red[0, 0], jnp.float32(1e-37))
                )
                coefs = (red[1:, 0] * inv).astype(dtype)
                proj = jnp.tensordot(coefs, store, axes=1)
                return out_x[pad:-pad] * inv.astype(dtype) - proj

            if use_res_exc:
                # ψ-resident per-step sweeps: the swept images Sl_s = S(l_s)
                # are computed once per chunk (their own halos are never
                # read — the kernel windows the store interiors)
                sls = []
                for s_i in range(n_lower):
                    sl_s, _n2s, _ovs = pk.evolve_step_fused(
                        store_x[s_i],
                        None if analytic is not None else b,
                        None, order, scale, 0, False, pallas_interpret,
                        analytic=analytic, x_origin=x_org,
                    )
                    sls.append(sl_s)
                sstore_x = jnp.stack(sls)
                store_s, sstore_s = store_x, sstore_x
                if exc_stream_bf16:
                    store_s = store_x.astype(jnp.bfloat16)
                    sstore_s = sstore_x.astype(jnp.bfloat16)
                coef0_re = jnp.concatenate(
                    [
                        jnp.ones((1, 1), jnp.float32),
                        jnp.zeros((n_lower, 1), jnp.float32),
                    ]
                )

                def body_re(_i, carry):
                    p, coef = carry
                    p = refresh_halo(p, ext)
                    out_x, red = pk.evolve_chunk_resident(
                        p, order, dt, dn, mass, 1, analytic,
                        interpret=pallas_interpret,
                        store_xpad=store_s, sstore_xpad=sstore_s,
                        b_int=None if analytic is not None else b,
                        x_origin=x_org, coef0=coef, raw_reductions=True,
                    )
                    red_g = _psum(red[:, 0])
                    inv = jax.lax.rsqrt(
                        jnp.maximum(red_g[0], jnp.float32(1e-37))
                    )
                    coef = jnp.concatenate(
                        [
                            inv.reshape(1, 1),
                            (red_g[1:] * inv).reshape(n_lower, 1),
                        ]
                    ).astype(jnp.float32)
                    return out_x, coef

                p, coef = lax.fori_loop(
                    0, screen_update, body_re, (to_xpad(phi, ext), coef0_re)
                )
                proj = jnp.tensordot(coef[1:, 0].astype(dtype), store, axes=1)
                return p[ext:-ext] * coef[0, 0].astype(dtype) - proj

            coef0 = jnp.concatenate(
                [jnp.ones((1, 1), dtype), jnp.zeros((n_lower, 1), dtype)]
            )

            def body(_i, carry):
                p, coef = carry
                p = refresh_halo(p, ext)
                out_xpad, n2_loc, ov_loc = pk.evolve_step_fused(
                    p,
                    None if analytic is not None else b,
                    store_x_stream,
                    order,
                    scale,
                    n_lower,
                    True,
                    pallas_interpret,
                    coef,
                    analytic,
                    x_org,
                )
                inv = (1.0 / jnp.sqrt(_psum(n2_loc))).astype(dtype)
                ov = _psum(ov_loc)
                coef = jnp.concatenate(
                    [inv.reshape(1, 1), (ov * inv).reshape(n_lower, 1)]
                )
                return out_xpad, coef

            p, coef = lax.fori_loop(0, screen_update, body, (to_xpad(phi, ext), coef0))
            proj = jnp.tensordot(coef[1:, 0], store, axes=1)
            return p[ext:-ext] * coef[0, 0] - proj

          return evolve_chunk_local

        # hybrid f32/f64 accumulation — the shared precision-critical
        # reduction (ops/observables.hybrid_sum)
        from wafer_tpu.ops.observables import hybrid_sum as _sum_h

        def measure_local(phi, v, r2_grid, pot_sub, store):
            padded = exchange_halos(phi, ext, mesh_shape, axis_names)
            taps = stencil_taps(padded, order)
            wc = jnp.conj(phi) if jnp.iscomplexobj(phi) else phi
            abs2 = jnp.real(wc * phi)
            energy = _psum(_sum_h(v * wc * phi - wc * taps / denom))
            norm2 = _psum(_sum_h(abs2))
            if has_pot_sub_array:
                v_inf = _psum(_sum_h(abs2 * pot_sub))
            elif pot_sub_scalar is not None:
                v_inf = norm2 * pot_sub_scalar
            else:
                # norm2's dtype (f64 under x64 via hybrid_sum), matching
                # observables.py — an f32 zero here breaks the batched
                # scan's lax.cond branch typing at precision: f32
                v_inf = jnp.zeros((), dtype=norm2.dtype)
            r2 = _psum(_sum_h(abs2 * r2_grid))
            phi = phi / jnp.sqrt(norm2).astype(phi.dtype)
            phi = orthogonalise(phi, store)
            return (energy, norm2, v_inf, r2), phi

        grid = P(*axis_names)
        store_spec = P(None, *axis_names) if n_lower > 0 else P()
        sub_spec = grid if has_pot_sub_array else P()
        scalar = P()

        # check_vma=False: pallas_call inside shard_map does not carry
        # varying-mesh-axis metadata
        self.evolve_chunk = jax.jit(
            jax.shard_map(
                _make_evolve_chunk_local(False),
                mesh=mesh,
                in_specs=(grid, grid, grid, store_spec),
                out_specs=grid,
                check_vma=False,
            )
        )
        # per-step-norm ground variant (jit is lazy — compiled only if used;
        # identical to evolve_chunk for excited states, which already
        # renormalise every step)
        self.evolve_chunk_psn = (
            jax.jit(
                jax.shard_map(
                    _make_evolve_chunk_local(True),
                    mesh=mesh,
                    in_specs=(grid, grid, grid, store_spec),
                    out_specs=grid,
                    check_vma=False,
                )
            )
            if n_lower == 0
            else self.evolve_chunk
        )
        # windowed drift guard on the yzp-resident path: renormalise once
        # per R-step window (pure rescaling — docs/PARITY.md divergence 7).
        # The solver picks this over evolve_chunk_psn only when the
        # measured drift per window is safely inside f32 range (see
        # solver_sharded; self.psn_window_steps is the R it must bound).
        self.psn_window_steps = (
            res_yzp[0] if res_yzp is not None else resb_yzp[1]
        ) if (
            n_lower == 0 and (res_yzp is not None or resb_yzp is not None)
        ) else 0
        self.evolve_chunk_psn_win = (
            jax.jit(
                jax.shard_map(
                    _make_evolve_chunk_local(True, psn_windowed=True),
                    mesh=mesh,
                    in_specs=(grid, grid, grid, store_spec),
                    out_specs=grid,
                    check_vma=False,
                )
            )
            if self.psn_window_steps
            else None
        )
        self.measure = jax.jit(
            jax.shard_map(
                measure_local,
                mesh=mesh,
                in_specs=(grid, grid, grid, sub_spec, store_spec),
                out_specs=((scalar, scalar, scalar, scalar), grid),
                check_vma=False,
            )
        )

    # ------------------------------------------------------------------ #

    def sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(*self.axis_names))

    def put(self, arr):
        """Place a global interior array onto the mesh, block-partitioned
        (transposed so the sharded axis leads, for single-axis y/z meshes)."""
        return jax.device_put(
            jnp.transpose(jnp.asarray(arr), self.perm), self.sharding()
        )

    def put_blocks(self, build_block, dtype=None):
        """Assemble a sharded interior array from per-shard blocks —
        O(shard) host memory; see :func:`parallel.mesh.assemble_blocks`."""
        from wafer_tpu.parallel.mesh import assemble_blocks

        return assemble_blocks(self, build_block, dtype or self.config.dtype)

    def get(self, arr) -> jnp.ndarray:
        """Gather a mesh array back to a host-global interior array in the
        natural (x, y, z) layout (inverse of :meth:`put`)."""
        from wafer_tpu.utils.host import device_get

        return jnp.transpose(jnp.asarray(device_get(arr)), self.inv_perm)

    def put_replicated(self, arr):
        return jax.device_put(jnp.asarray(arr), NamedSharding(self.mesh, P()))

    def put_store(self, store):
        if self.n_lower == 0:
            return self.put_replicated(jnp.zeros((), dtype=self.config.dtype))
        return jax.device_put(
            jnp.transpose(jnp.asarray(store), (0,) + tuple(i + 1 for i in self.perm)),
            NamedSharding(self.mesh, P(None, *self.axis_names)),
        )

    def dummy_pot_sub(self):
        """Placeholder when no pot_sub array participates."""
        return self.put_replicated(jnp.zeros((), dtype=self.config.real_dtype))
