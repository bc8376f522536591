"""Sharded split-complex path: complex ψ as (re, im) real pairs over a mesh.

Backends without complex dtypes (see ops/split_complex.backend_supports_complex)
cannot run the native-complex sharded kernels, so this module re-expresses
the sharded evolve/measure (parallel/sharded.py) with the complex algebra
written out over real block-partitioned arrays — complex values exist only
host-side (file I/O). Same maths as ops/split_complex.py; same reference
semantics (update src/grid.rs:544-687, reductions src/grid.rs:303-445,
per-step normalise+GS src/grid.rs:674-681).
"""

from __future__ import annotations

import logging
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from wafer_tpu import errors, geometry
from wafer_tpu.config import Config
from wafer_tpu.ops.observables import Observables
from wafer_tpu.parallel.halo import edge_flags, exchange_halos, ici_interpret
from wafer_tpu.parallel.mesh import AXIS_NAMES, make_mesh


def _psum(x):
    return lax.psum(x, AXIS_NAMES)


class ShardedSplitOps:
    """Jitted sharded split-complex kernels for one (config, mesh, n_lower)."""

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
        res_steps: Optional[int] = None,
        allow_ici: bool = True,
    ):
        self.config = config
        self.mesh = mesh
        self.n_lower = n_lower
        natural_shape = tuple(int(mesh.shape[a]) for a in AXIS_NAMES)

        order = config.central_difference.value
        ext = config.central_difference.ext
        dn, dt, mass = config.grid.dn, config.grid.dt, config.mass
        _o, _c, _cc, k = geometry.stencil_coefficients(order)
        denom = k * dn * dn * mass
        s_ = dt / denom
        screen_update = config.output.screen_update

        from wafer_tpu.ops.stencil import stencil_taps

        # Fused split-kernel shards (single-axis meshes, like ShardedOps):
        # the exchanged x-halo rows of both components are exactly what the
        # kernel's windows expect; y/z keep the in-kernel global Dirichlet.
        from wafer_tpu.ops import pallas_split as ps_mod
        from wafer_tpu.parallel.halo import _pad_axis

        dims = config.work_size()
        itemsize = jnp.dtype(config.real_dtype).itemsize

        # Eligibility-ranked layout permutation, as in ShardedOps: a
        # single-axis y/z mesh transposes its sharded axis to x so the
        # whole split-kernel ladder applies unchanged (round-2 split ran
        # pallas only on NATURAL x-only meshes — a (1,8,1) complex run
        # fell all the way back to XLA). Multi-axis meshes ride the
        # y/z-padded split kernel (pallas_split._evolve_kernel_sc_yzp),
        # ranked like ShardedOps: prefer a permutation with the unsharded
        # axis last (zp=0 — the global z Dirichlet stays in-register, no
        # 128-lane pads).
        def _classify(p):
            ms = tuple(natural_shape[i] for i in p)
            nx_, ny_, nz_ = (dims[i] for i in p)
            bx_, by_, bz_ = nx_ // ms[0], ny_ // ms[1], nz_ // ms[2]
            if (
                config.real_dtype != jnp.float32
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
                and ps_mod.step_fused_sc_supported(
                    bx_, ny_, nz_, ext, itemsize, n_lower
                )
            ):
                return 3, "x", 0
            if (ms[1] > 1 or ms[2] > 1) and by_ >= ext and bz_ >= ext:
                zp_ = 0 if ms[2] == 1 else ps_mod._pk._YZP_ZPAD
                if ps_mod.step_fused_sc_yzp_supported(
                    bx_, by_, bz_, ext, itemsize, n_lower, zp_
                ):
                    return (2 if zp_ == 0 else 1), "yzp", zp_
            return 0, None, 0

        import itertools as _it

        _sorted_perm = tuple(
            sorted(range(3), key=lambda i: -natural_shape[i])
        )
        _cands = [_sorted_perm, (0, 1, 2)]
        _cands += [
            p for p in _it.permutations(range(3)) if p not in _cands
        ]
        _best = max(
            range(len(_cands)), key=lambda j: _classify(_cands[j])[0]
        )
        _rank, pallas_mode, yzp_zp = _classify(_cands[_best])
        pallas_ok = _rank > 0
        perm = _cands[_best] if pallas_ok else _sorted_perm
        self.perm = perm
        self.inv_perm = tuple(int(i) for i in np.argsort(perm))
        axis_names = tuple(AXIS_NAMES[i] for i in perm)
        self.axis_names = axis_names
        self.mesh_shape = tuple(natural_shape[i] for i in perm)
        mesh_shape = self.mesh_shape
        self.yzp_zp = yzp_zp
        nx, ny, nz = (dims[i] for i in perm)
        bx = nx // mesh_shape[0]
        by = ny // mesh_shape[1]
        bz = nz // mesh_shape[2]
        if use_pallas is None:
            use_pallas = pallas_ok and jax.default_backend() not in ("cpu",)
        elif use_pallas and not pallas_ok:
            raise ValueError(
                "sharded split pallas sweep requires f32, tile-aligned "
                "per-shard blocks and a VMEM-sized slab"
            )
        self.use_pallas = use_pallas
        self.pallas_mode = pallas_mode if use_pallas else None

        # analytic complex-B per shard (the shard's global x origin rides a
        # traced SMEM scalar, so the (Br, Bi) streams are skipped)
        from wafer_tpu.config import PotentialType

        sc_analytic = None
        _sc_kinds = {
            PotentialType.COMPLEX_HARMONIC: "Harmonic",
            PotentialType.COMPLEX_COULOMB: "Coulomb",
        }
        if self.pallas_mode == "x":
            _analytic_fits = (
                ps_mod._pick_tx_sc(bx, ny, nz, ext, itemsize, n_lower, True)
                is not None
            )
        elif self.pallas_mode == "yzp":
            _analytic_fits = (
                ps_mod._pick_tx_sc_yzp(
                    bx, by + 2 * ps_mod._pk._YZP_YPAD, bz + 2 * yzp_zp,
                    by, bz, ext, itemsize, n_lower, True,
                )
                is not None
            )
        else:
            _analytic_fits = False
        if (
            use_pallas
            and config.potential in _sc_kinds
            and _analytic_fits
        ):
            g = config.grid
            sc_analytic = (
                _sc_kinds[config.potential],
                g.dn,
                g.dt,
                config.mass,
                g.size.as_tuple()[perm[0]],
                g.size.as_tuple()[perm[1]],
                g.size.as_tuple()[perm[2]],
                config.sig,
                v_shift,
                config.absorb,
            )
        self.sc_analytic = sc_analytic

        # Sharded VMEM-resident pair chunks (ground state): exchange an
        # R·ext-deep ghost zone of BOTH components once per R blind
        # in-kernel sweeps (the real path's deep-ghost-zone ladder,
        # parallel/sharded.py res_steps; kernel:
        # ops/pallas_split.evolve_chunk_resident_sc halo mode). On a
        # 1-shard x axis the whole chunk runs as ONE resident call.
        forced_res = res_steps  # the multi-slice flat-ring cadence pin
        sc_res_steps = 0
        sc_whole_chunk = False
        sc_resb_plan = None
        sc_mixed_tx = None
        if use_pallas and self.pallas_mode == "x" and n_lower == 0:
            sc_whole_chunk = mesh_shape[0] == 1 and (
                ps_mod.resident_sc_supported(bx, ny, nz, ext, itemsize)
            )
            if not sc_whole_chunk and mesh_shape[0] == 1:
                # degenerate 1-shard axis, HBM-sized pair (256³-class):
                # the single-chip kernels apply unchanged (their
                # unconditional edge zeroing IS the global Dirichlet here)
                # — mixed residency first (measured fastest, BASELINE.md
                # round 4; streamed-(Br, Bi) variant for non-analytic
                # potentials), else the x-blocked deep-halo pair
                # (analytic-B only)
                sc_mixed_tx = ps_mod.pick_tx_mixed_sc(
                    bx, ny, nz, ext, itemsize,
                    analytic_b=sc_analytic is not None,
                )
                if sc_mixed_tx is None and sc_analytic is not None:
                    sc_resb_plan = ps_mod.pick_resb_sc(
                        bx, ny, nz, ext, itemsize, screen_update
                    )
            if not sc_whole_chunk and sc_analytic is not None:
                candidates = (
                    (forced_res,) if forced_res is not None else (16, 8, 4, 2)
                )
                for r in candidates:
                    if r > screen_update or bx < r * ext:
                        continue
                    # blind-sweep recompute cap, as the real ladder
                    # (auto mode only — a forced multi-slice cadence pin
                    # accepts the recompute cost to keep the DCN window)
                    if forced_res is None and 8 * (r - 1) * ext > bx:
                        continue
                    nxh_r = bx + 2 * r * ext
                    if (
                        2 * nxh_r * ny * nz * itemsize <= ps_mod._pk._RES_BUDGET
                        and ps_mod._pk._pick_tx_res(nxh_r - 2 * ext, ext)
                        is not None
                    ):
                        sc_res_steps = r
                        break
        self.sc_res_steps = sc_res_steps
        self.sc_whole_chunk = sc_whole_chunk
        self.sc_resb_plan = sc_resb_plan
        self.sc_mixed_tx = sc_mixed_tx

        # Multi-shard blocks past pair residency (512³-class complex
        # shards): blocked exchange windows, as the real family
        # (parallel/sharded.py resb_sharded)
        sc_resb_sharded = None
        if (
            use_pallas
            and self.pallas_mode == "x"
            and n_lower == 0
            and mesh_shape[0] > 1
            and sc_analytic is not None
            and sc_res_steps == 0
        ):
            sc_resb_sharded = ps_mod.pick_resb_sc(
                bx, ny, nz, ext, itemsize, screen_update
            )
        self.sc_resb_sharded = sc_resb_sharded

        # In-kernel ICI residency for the pair (multi-shard split ground):
        # the (re, im) pair stays VMEM-resident for the WHOLE chunk, with
        # both components' deep-halo strips exchanged by in-kernel remote
        # DMAs at every R-step window boundary (the real path's ici_res,
        # ops/pallas_split.evolve_chunk_resident_sc ici mode)
        import os as _os_i

        _ici_env = _os_i.environ.get("WAFER_SHARDED_ICI", "1")
        sc_ici = False
        if (
            _ici_env in ("1", "force")
            and allow_ici  # multi-slice rings: RDMA cannot cross DCN
            and sc_res_steps > 1
            and (mesh_shape[0] > 1 or _ici_env == "force")
        ):
            nxh_r = bx + 2 * sc_res_steps * ext
            # pair block + 8·halo landing strips must fit together
            sc_ici = (
                (2 * nxh_r + 8 * sc_res_steps * ext) * ny * nz * itemsize
                <= ps_mod._pk._RES_BUDGET
            )
        self.sc_ici = sc_ici

        def norm2_g(pr, pi):
            return _psum(jnp.sum(pr * pr + pi * pi))

        def orthogonalise(pr, pi, sr, si):
            for j in range(n_lower):
                o_re = _psum(jnp.sum(sr[j] * pr + si[j] * pi))
                o_im = _psum(jnp.sum(sr[j] * pi - si[j] * pr))
                pr = pr - (sr[j] * o_re - si[j] * o_im)
                pi = pi - (sr[j] * o_im + si[j] * o_re)
            return pr, pi

        def _make_evolve_chunk_local(per_step_norm: bool):
            def evolve_chunk_yzp_sc(pr, pi, br, bi, sr, si):
                """Multi-axis-mesh split chunk via the y/z-padded split
                kernel: the (re, im) pair rides the x-concatenated layout
                with alignment pads (8 sublanes / 128 lanes) whose innermost
                ext rows are refreshed from neighbours every step (one full
                y/z strip covers BOTH components; x faces per component).
                With ``yzp_zp == 0`` z carries no pads: the kernel's
                in-register zero shifts ARE the global z Dirichlet."""
                e = ext
                yp = ps_mod._pk._YZP_YPAD
                zp_l = yzp_zp
                bxl, byl, bzl = pr.shape
                bxp = bxl + 2 * e
                dtype = pr.dtype
                blens = (bxl, byl, bzl)
                pad_off = (e, yp, zp_l)
                pads = ((e, e), (yp, yp), (zp_l, zp_l))
                origin = jnp.stack(
                    [
                        jax.lax.axis_index(axis_names[d]).astype(jnp.int32)
                        * jnp.int32(blens[d])
                        for d in range(3)
                    ]
                ).reshape(3, 1)

                def to_p2(pr_, pi_):
                    return jnp.concatenate(
                        [jnp.pad(pr_, pads), jnp.pad(pi_, pads)], axis=0
                    )

                def refresh_x(p2):
                    # x faces per component band (re at 0, im at bxp)
                    if mesh_shape[0] == 1:
                        z = jnp.zeros((e,) + p2.shape[1:], dtype)
                        for base in (0, bxp):
                            p2 = lax.dynamic_update_slice_in_dim(
                                p2, z, base, 0
                            )
                            p2 = lax.dynamic_update_slice_in_dim(
                                p2, z, base + e + bxl, 0
                            )
                        return p2
                    for base in (0, bxp):
                        hi = lax.slice_in_dim(
                            p2, base + bxl, base + bxl + e, axis=0
                        )
                        lo = lax.slice_in_dim(
                            p2, base + e, base + 2 * e, axis=0
                        )
                        fl = lax.ppermute(
                            hi, axis_names[0],
                            [(j, j + 1) for j in range(mesh_shape[0] - 1)],
                        )
                        fr = lax.ppermute(
                            lo, axis_names[0],
                            [(j + 1, j) for j in range(mesh_shape[0] - 1)],
                        )
                        p2 = lax.dynamic_update_slice_in_dim(p2, fl, base, 0)
                        p2 = lax.dynamic_update_slice_in_dim(
                            p2, fr, base + e + bxl, 0
                        )
                    return p2

                def refresh_axis(p2, axis):
                    # y/z strips span the concatenated x extent — one
                    # ppermute refreshes both components at once
                    pad = pad_off[axis]
                    blen = blens[axis]
                    lo = lax.slice_in_dim(p2, pad, pad + e, axis=axis)
                    if mesh_shape[axis] == 1:
                        z = jnp.zeros_like(lo)
                        p2 = lax.dynamic_update_slice_in_dim(
                            p2, z, pad - e, axis
                        )
                        return lax.dynamic_update_slice_in_dim(
                            p2, z, pad + blen, axis
                        )
                    hi = lax.slice_in_dim(
                        p2, pad + blen - e, pad + blen, axis=axis
                    )
                    fl = lax.ppermute(
                        hi, axis_names[axis],
                        [(j, j + 1) for j in range(mesh_shape[axis] - 1)],
                    )
                    fr = lax.ppermute(
                        lo, axis_names[axis],
                        [(j + 1, j) for j in range(mesh_shape[axis] - 1)],
                    )
                    p2 = lax.dynamic_update_slice_in_dim(
                        p2, fl, pad - e, axis
                    )
                    return lax.dynamic_update_slice_in_dim(
                        p2, fr, pad + blen, axis
                    )

                def refresh3(p2):
                    p2 = refresh_x(p2)
                    p2 = refresh_axis(p2, 1)
                    if zp_l > 0:
                        p2 = refresh_axis(p2, 2)
                    return p2

                _o2, _c2, _cc2, k2 = geometry.stencil_coefficients(order)
                scale = dt / (k2 * dn * dn * mass)
                b2_p3 = (
                    None
                    if sc_analytic is not None
                    else jnp.concatenate(
                        [
                            jnp.pad(br, ((0, 0), (yp, yp), (zp_l, zp_l))),
                            jnp.pad(bi, ((0, 0), (yp, yp), (zp_l, zp_l))),
                        ],
                        axis=0,
                    )
                )
                store2_p3 = (
                    jnp.stack(
                        [
                            refresh3(to_p2(sr[s], si[s]))
                            for s in range(n_lower)
                        ]
                    )
                    if n_lower > 0
                    else None
                )

                def split_out(p2):
                    return (
                        p2[e : e + bxl, yp : yp + byl, zp_l : zp_l + bzl],
                        p2[
                            bxp + e : bxp + e + bxl,
                            yp : yp + byl,
                            zp_l : zp_l + bzl,
                        ],
                    )

                if n_lower == 0 and not per_step_norm:

                    def body(_i, p2):
                        p2 = refresh3(p2)
                        out2, _n2, _ov = ps_mod.evolve_step_fused_sc_yzp(
                            p2, b2_p3, None, order, scale, 0, False,
                            pallas_interpret, analytic=sc_analytic,
                            origin=origin, zp=zp_l,
                        )
                        return out2

                    p2 = lax.fori_loop(0, screen_update, body, to_p2(pr, pi))
                    return split_out(p2)

                if n_lower == 0:

                    def body_norm(_i, carry):
                        p2, coef = carry
                        p2 = refresh3(p2)
                        out2, n2_loc, _ov = ps_mod.evolve_step_fused_sc_yzp(
                            p2, b2_p3, None, order, scale, 0, True,
                            pallas_interpret, coef, sc_analytic, origin,
                            zp_l,
                        )
                        inv = (1.0 / jnp.sqrt(_psum(n2_loc))).astype(dtype)
                        return out2, inv.reshape(1, 1)

                    coef0 = jnp.ones((1, 1), dtype)
                    p2, coef = lax.fori_loop(
                        0, screen_update, body_norm, (to_p2(pr, pi), coef0)
                    )
                    out_r, out_i = split_out(p2)
                    return out_r * coef[0, 0], out_i * coef[0, 0]

                coef0 = jnp.concatenate(
                    [
                        jnp.ones((1, 1), dtype),
                        jnp.zeros((2 * n_lower, 1), dtype),
                    ]
                )

                def body_exc(_i, carry):
                    p2, coef = carry
                    p2 = refresh3(p2)
                    out2, n2_loc, ov_loc = ps_mod.evolve_step_fused_sc_yzp(
                        p2, b2_p3, store2_p3, order, scale, n_lower, True,
                        pallas_interpret, coef, sc_analytic, origin, zp_l,
                    )
                    inv = (1.0 / jnp.sqrt(_psum(n2_loc))).astype(dtype)
                    ov = _psum(ov_loc)
                    coef = jnp.concatenate(
                        [
                            inv.reshape(1, 1),
                            (ov * inv).reshape(2 * n_lower, 1),
                        ]
                    )
                    return out2, coef

                p2, coef = lax.fori_loop(
                    0, screen_update, body_exc, (to_p2(pr, pi), coef0)
                )
                out_r, out_i = split_out(p2)
                out_r = out_r * coef[0, 0]
                out_i = out_i * coef[0, 0]
                for s in range(n_lower):
                    cr = coef[1 + 2 * s, 0]
                    ci = coef[2 + 2 * s, 0]
                    out_r = out_r - (cr * sr[s] - ci * si[s])
                    out_i = out_i - (cr * si[s] + ci * sr[s])
                return out_r, out_i

            def step_local(pr, pi, ar, ai, br, bi, sr, si):
                tr = stencil_taps(
                    exchange_halos(pr, ext, mesh_shape, axis_names), order
                )
                ti = stencil_taps(
                    exchange_halos(pi, ext, mesh_shape, axis_names), order
                )
                new_r = ar * pr - ai * pi + s_ * (br * tr - bi * ti)
                new_i = ar * pi + ai * pr + s_ * (br * ti + bi * tr)
                pr, pi = new_r, new_i
                if n_lower > 0 or per_step_norm:
                    inv = (1.0 / jnp.sqrt(norm2_g(pr, pi))).astype(pr.dtype)
                    pr, pi = pr * inv, pi * inv
                if n_lower > 0:
                    pr, pi = orthogonalise(pr, pi, sr, si)
                return pr, pi

            def evolve_chunk_local(pr, pi, ar, ai, br, bi, sr, si):
                if not use_pallas:
                    return lax.fori_loop(
                        0,
                        screen_update,
                        lambda _i, c: step_local(c[0], c[1], ar, ai, br, bi, sr, si),
                        (pr, pi),
                    )
                if self.pallas_mode == "yzp":
                    return evolve_chunk_yzp_sc(pr, pi, br, bi, sr, si)

                # fused split-kernel path: ppermute x-halo refresh of both
                # components + the local pallas sweep; excited states carry
                # the complex normalise+project correction as a psum'd
                # coefficient vector applied inside the next sweep (the
                # single-device cadence of ops/pallas_split, reference
                # src/grid.rs:674-681)
                dtype = pr.dtype
                nxs = mesh_shape[0]
                bxl = pr.shape[0]
                bxp = bxl + 2 * ext
                x_org = (
                    jax.lax.axis_index(axis_names[0]).astype(jnp.int32)
                    * jnp.int32(bx)
                ).reshape(1, 1)

                def to_x2(pr_, pi_, pad=ext):
                    padt = ((pad, pad), (0, 0), (0, 0))
                    return jnp.concatenate(
                        [jnp.pad(pr_, padt), jnp.pad(pi_, padt)], axis=0
                    )

                def refresh_halo_sc(p2, pad=ext):
                    """In-place x-halo refresh of both components to depth
                    ``pad`` (the kernel re-zeros global-edge pads itself
                    each call; ppermute zero-fills at the global edges; on
                    a 1-shard axis nothing needs refreshing)."""
                    if nxs == 1:
                        return p2
                    bxp_ = bxl + 2 * pad
                    out = p2
                    for base in (0, bxp_):
                        hi_face = lax.slice_in_dim(
                            out, base + bxl, base + bxl + pad, axis=0
                        )
                        lo_face = lax.slice_in_dim(
                            out, base + pad, base + 2 * pad, axis=0
                        )
                        from_left = lax.ppermute(
                            hi_face, axis_names[0],
                            [(j, j + 1) for j in range(nxs - 1)],
                        )
                        from_right = lax.ppermute(
                            lo_face, axis_names[0],
                            [(j + 1, j) for j in range(nxs - 1)],
                        )
                        out = lax.dynamic_update_slice_in_dim(
                            out, from_left, base, 0
                        )
                        out = lax.dynamic_update_slice_in_dim(
                            out, from_right, base + pad + bxl, 0
                        )
                    return out

                b2_loc = (
                    None
                    if sc_analytic is not None
                    else jnp.concatenate([br, bi], axis=0)
                )
                if n_lower > 0:
                    store2 = jnp.stack(
                        [
                            jnp.concatenate(
                                [
                                    _pad_axis(sr[s], ext, 0, axis_names[0], nxs),
                                    _pad_axis(si[s], ext, 0, axis_names[0], nxs),
                                ],
                                axis=0,
                            )
                            for s in range(n_lower)
                        ]
                    )
                else:
                    store2 = None
                _o2, _c2, _cc2, k2 = geometry.stencil_coefficients(order)
                scale = dt / (k2 * dn * dn * mass)

                if n_lower == 0 and sc_whole_chunk:
                    # 1-shard x axis: nothing to exchange — the pair stays
                    # VMEM-resident for the whole chunk (one kernel call,
                    # per-step drift guard carried in SMEM when asked)
                    out2 = ps_mod.evolve_chunk_resident_sc(
                        to_x2(pr, pi), order, dt, dn, mass, screen_update,
                        sc_analytic, interpret=pallas_interpret,
                        per_step_norm=per_step_norm, b2=b2_loc,
                        x_origin=x_org,
                    )
                    return (
                        out2[ext : ext + bxl],
                        out2[bxp + ext : bxp + ext + bxl],
                    )

                if n_lower == 0 and sc_mixed_tx is not None:
                    # 1-shard axis, pair exceeds whole-array residency but
                    # re alone fits: the single-chip mixed-residency kernel
                    # (re on-chip all chunk, im streamed — measured fastest,
                    # see solver._solve_split); per_step_norm rides its
                    # deferred-racc variant (drift guard / delayed-GS)
                    out2 = ps_mod.evolve_chunk_resident_mixed_sc(
                        to_x2(pr, pi), order, dt, dn, mass, screen_update,
                        sc_analytic, interpret=pallas_interpret,
                        tx=sc_mixed_tx, b2=b2_loc,
                        per_step_norm=per_step_norm,
                    )
                    return (
                        out2[ext : ext + bxl],
                        out2[bxp + ext : bxp + ext + bxl],
                    )

                if (
                    n_lower == 0
                    and not per_step_norm
                    and sc_resb_plan is not None
                ):
                    # 1-shard axis, pair exceeds whole-array residency:
                    # ride the single-chip x-blocked deep-halo resident
                    # kernel (see solver._solve_split)
                    rb = sc_resb_plan
                    out2 = ps_mod.evolve_chunk_resident_blocked_sc(
                        to_x2(pr, pi, rb[1] * ext), order, dt, dn, mass,
                        screen_update, sc_analytic, bx=rb[0],
                        r_steps=rb[1], interpret=pallas_interpret,
                        tx=rb[2], prefetch=rb[3],
                    )
                    pad_b = rb[1] * ext
                    bxp_b = bxl + 2 * pad_b
                    return (
                        out2[pad_b : pad_b + bxl],
                        out2[bxp_b + pad_b : bxp_b + pad_b + bxl],
                    )

                if n_lower == 0 and not per_step_norm:
                    if sc_res_steps > 1 and sc_ici:
                        # whole-chunk ici residency: ONE kernel call; the
                        # pair's deep halos are exchanged in-kernel every
                        # R steps (remote DMAs), and the host-side seeding
                        # ppermute doubles as the cross-chunk slot barrier
                        pad = sc_res_steps * ext
                        edges = edge_flags(axis_names[0], nxs)
                        bxp_i = bxl + 2 * pad
                        ici_interp = ici_interpret(pallas_interpret)
                        p2 = refresh_halo_sc(to_x2(pr, pi, pad), pad)
                        out2 = ps_mod.evolve_chunk_resident_sc(
                            p2, order, dt, dn, mass, screen_update,
                            sc_analytic, interpret=ici_interp,
                            x_origin=x_org, edges=edges, halo=pad,
                            ici_steps=sc_res_steps,
                            ici_axis=axis_names[0], ici_nsh=nxs,
                        )
                        return (
                            out2[pad : pad + bxl],
                            out2[bxp_i + pad : bxp_i + pad + bxl],
                        )

                    if sc_res_steps > 1:
                        # deep-ghost-zone resident windows: one ppermute of
                        # R·ext rows per component per R blind in-kernel
                        # sweeps (ops/pallas_split._evolve_kernel_res_sc
                        # halo mode); remainder steps ride the 1-step body
                        pad = sc_res_steps * ext
                        edges = edge_flags(axis_names[0], nxs)
                        bxp_r = bxl + 2 * pad

                        def body_r(_i, p2):
                            p2 = refresh_halo_sc(p2, pad)
                            return ps_mod.evolve_chunk_resident_sc(
                                p2, order, dt, dn, mass, sc_res_steps,
                                sc_analytic, interpret=pallas_interpret,
                                x_origin=x_org, edges=edges, halo=pad,
                            )

                        p2 = lax.fori_loop(
                            0, screen_update // sc_res_steps, body_r,
                            to_x2(pr, pi, pad),
                        )
                        pr_c = p2[pad : pad + bxl]
                        pi_c = p2[bxp_r + pad : bxp_r + pad + bxl]
                        for _ in range(screen_update % sc_res_steps):
                            p1 = refresh_halo_sc(to_x2(pr_c, pi_c))
                            out1, _n2, _ov = ps_mod.evolve_step_fused_sc(
                                p1, b2_loc, None, order, scale, 0, False,
                                pallas_interpret, analytic=sc_analytic,
                                x_origin=x_org,
                            )
                            pr_c = out1[ext : ext + bxl]
                            pi_c = out1[bxp + ext : bxp + ext + bxl]
                        return pr_c, pi_c

                    if sc_resb_sharded is not None:
                        # blocked exchange windows (pair past residency)
                        rb = sc_resb_sharded
                        pad = rb[1] * ext
                        edges = edge_flags(axis_names[0], nxs)
                        bxp_r = bxl + 2 * pad

                        def body_rb(_i, p2):
                            p2 = refresh_halo_sc(p2, pad)
                            return ps_mod.evolve_steps_resident_blocked_sc(
                                p2, order, scale, rb[0], rb[1],
                                sc_analytic, pallas_interpret, rb[2],
                                rb[3], x_origin=x_org, edges=edges,
                            )

                        p2 = lax.fori_loop(
                            0, screen_update // rb[1], body_rb,
                            to_x2(pr, pi, pad),
                        )
                        pr_c = p2[pad : pad + bxl]
                        pi_c = p2[bxp_r + pad : bxp_r + pad + bxl]
                        for _ in range(screen_update % rb[1]):
                            p1 = refresh_halo_sc(to_x2(pr_c, pi_c))
                            out1, _n2, _ov = ps_mod.evolve_step_fused_sc(
                                p1, b2_loc, None, order, scale, 0, False,
                                pallas_interpret, analytic=sc_analytic,
                                x_origin=x_org,
                            )
                            pr_c = out1[ext : ext + bxl]
                            pi_c = out1[bxp + ext : bxp + ext + bxl]
                        return pr_c, pi_c

                    def body(_i, p2):
                        p2 = refresh_halo_sc(p2)
                        out2, _n2, _ov = ps_mod.evolve_step_fused_sc(
                            p2, b2_loc, None, order, scale, 0, False,
                            pallas_interpret, analytic=sc_analytic,
                            x_origin=x_org,
                        )
                        return out2

                    p2 = lax.fori_loop(0, screen_update, body, to_x2(pr, pi))
                    return p2[ext : ext + bxl], p2[bxp + ext : bxp + ext + bxl]

                if n_lower == 0:

                    def body_norm(_i, carry):
                        p2, coef = carry
                        p2 = refresh_halo_sc(p2)
                        out2, n2_loc, _ov = ps_mod.evolve_step_fused_sc(
                            p2, b2_loc, None, order, scale, 0, True,
                            pallas_interpret, coef, sc_analytic, x_org,
                        )
                        inv = (1.0 / jnp.sqrt(_psum(n2_loc))).astype(dtype)
                        return out2, inv.reshape(1, 1)

                    coef0 = jnp.ones((1, 1), dtype)
                    p2, coef = lax.fori_loop(
                        0, screen_update, body_norm, (to_x2(pr, pi), coef0)
                    )
                    p2 = p2 * coef[0, 0]
                    return p2[ext : ext + bxl], p2[bxp + ext : bxp + ext + bxl]

                coef0 = jnp.concatenate(
                    [jnp.ones((1, 1), dtype), jnp.zeros((2 * n_lower, 1), dtype)]
                )

                def body_exc(_i, carry):
                    p2, coef = carry
                    p2 = refresh_halo_sc(p2)
                    out2, n2_loc, ov_loc = ps_mod.evolve_step_fused_sc(
                        p2, b2_loc, store2, order, scale, n_lower, True,
                        pallas_interpret, coef, sc_analytic, x_org,
                    )
                    inv = (1.0 / jnp.sqrt(_psum(n2_loc))).astype(dtype)
                    ov = _psum(ov_loc)
                    coef = jnp.concatenate(
                        [inv.reshape(1, 1), (ov * inv).reshape(2 * n_lower, 1)]
                    )
                    return out2, coef

                p2, coef = lax.fori_loop(
                    0, screen_update, body_exc, (to_x2(pr, pi), coef0)
                )
                # materialise the pending correction on the interior block
                out_r = p2[ext : ext + bxl] * coef[0, 0]
                out_i = p2[bxp + ext : bxp + ext + bxl] * coef[0, 0]
                for s in range(n_lower):
                    cr = coef[1 + 2 * s, 0]
                    ci = coef[2 + 2 * s, 0]
                    out_r = out_r - (cr * sr[s] - ci * si[s])
                    out_i = out_i - (cr * si[s] + ci * sr[s])
                return out_r, out_i

            return evolve_chunk_local

        # hybrid f32/f64 accumulation for the convergence-critical sums
        # (the shared helper, ops/observables.hybrid_sum)
        from wafer_tpu.ops.observables import hybrid_sum as _sum_h

        def measure_local(pr, pi, vr, vi, r2_grid, pot_sub, sr, si):
            tr = stencil_taps(
                exchange_halos(pr, ext, mesh_shape, axis_names), order
            )
            ti = stencil_taps(
                exchange_halos(pi, ext, mesh_shape, axis_names), order
            )
            abs2 = pr * pr + pi * pi
            e_re = _psum(_sum_h(vr * abs2 - (pr * tr + pi * ti) / denom))
            e_im = _psum(_sum_h(vi * abs2 - (pr * ti - pi * tr) / denom))
            norm2 = _psum(_sum_h(abs2))
            if has_pot_sub_array:
                v_inf = _psum(_sum_h(abs2 * pot_sub))
            elif pot_sub_scalar is not None:
                v_inf = norm2 * pot_sub_scalar
            else:
                v_inf = jnp.zeros((), dtype=norm2.dtype)
            r2 = _psum(_sum_h(abs2 * r2_grid))
            inv = (1.0 / jnp.sqrt(norm2)).astype(pr.dtype)
            pr, pi = pr * inv, pi * inv
            pr, pi = orthogonalise(pr, pi, sr, si)
            return (e_re, e_im, norm2, v_inf, r2), (pr, pi)

        grid = P(*axis_names)
        store_spec = P(None, *axis_names) if n_lower > 0 else P()
        sub_spec = grid if has_pot_sub_array else P()
        scalar = P()
        pair_specs = (grid, grid, grid, grid, grid, grid, store_spec, store_spec)

        self.evolve_chunk = jax.jit(
            jax.shard_map(
                _make_evolve_chunk_local(False),
                mesh=mesh,
                in_specs=pair_specs,
                out_specs=(grid, grid),
                check_vma=False,
            )
        )
        self.evolve_chunk_psn = (
            jax.jit(
                jax.shard_map(
                    _make_evolve_chunk_local(True),
                    mesh=mesh,
                    in_specs=pair_specs,
                    out_specs=(grid, grid),
                    check_vma=False,
                )
            )
            if n_lower == 0
            else self.evolve_chunk
        )
        self.measure = jax.jit(
            jax.shard_map(
                measure_local,
                mesh=mesh,
                in_specs=(grid, grid, grid, grid, grid, sub_spec, store_spec, store_spec),
                out_specs=(
                    (scalar, scalar, scalar, scalar, scalar),
                    (grid, grid),
                ),
                check_vma=False,
            )
        )

    # ------------------------------------------------------------------ #

    def put(self, arr):
        """Place a global interior array onto the mesh, block-partitioned
        (transposed so the sharded axis leads — see the layout perm)."""
        return jax.device_put(
            jnp.transpose(jnp.asarray(arr), self.perm),
            NamedSharding(self.mesh, P(*self.axis_names)),
        )

    def put_blocks(self, build_block, dtype=None):
        """Assemble a sharded interior array from per-shard blocks —
        O(shard) host memory; see :func:`parallel.mesh.assemble_blocks`."""
        from wafer_tpu.parallel.mesh import assemble_blocks

        return assemble_blocks(
            self, build_block, dtype or self.config.real_dtype
        )

    def get(self, arr) -> jnp.ndarray:
        """Gather a mesh array back to the natural (x, y, z) host layout
        (inverse of :meth:`put`)."""
        from wafer_tpu.utils.host import device_get

        return jnp.transpose(jnp.asarray(device_get(arr)), self.inv_perm)

    def put_store(self, store):
        if self.n_lower == 0:
            return jax.device_put(
                jnp.zeros((), dtype=self.config.real_dtype),
                NamedSharding(self.mesh, P()),
            )
        return jax.device_put(
            jnp.transpose(
                jnp.asarray(store), (0,) + tuple(i + 1 for i in self.perm)
            ),
            NamedSharding(self.mesh, P(None, *self.axis_names)),
        )

    def dummy_pot_sub(self):
        return jax.device_put(
            jnp.zeros((), dtype=self.config.real_dtype),
            NamedSharding(self.mesh, P()),
        )


def run_sharded_split(
    config: Config, log=None, seed=None, mesh=None, progress_factory=None,
    ic_overrides=None,
) -> List:
    """Sharded driver for complex potentials on complex-free backends:
    the split counterpart of parallel/solver_sharded.run_sharded.

    ``ic_overrides``: optional ``{wnum: (padded re, padded im)}`` explicit
    initial pairs (the multigrid coarse→fine hand-over, solver.py)."""
    from wafer_tpu.models import potentials as pmod
    from wafer_tpu.solver import SolveResult

    log = log or logging.getLogger("wafer")
    if seed is None:
        # honour config.seed like solver.solve (None reaches os.urandom
        # in the Gaussian IC — the config key must not be silently ignored)
        seed = config.seed
    slice_res = None
    if config.mesh.slices > 1 and mesh is None:
        # Multi-slice (DCN) tier on the split path: only the degenerate-y/z
        # factorisation is supported — the hierarchical (slice, gx) ring is
        # then EXACTLY a flat x ring in process-major device order (see the
        # real driver's flat-ring shortcut, solver_sharded.run_sharded), so
        # the split kernel ladder rides it with the pair-resident exchange
        # window pinned to slice_update (DCN-cadence deep halos). The XLA
        # fallback (CPU tests, gate refusals) stays trajectory-identical
        # but exchanges per step — correct, denser slice-axis traffic.
        gx, gy, gz = config.mesh.as_tuple()
        if gy != 1 or gz != 1:
            raise errors.ConfigParseError(
                "mesh.slices > 1 on the split-complex path requires an "
                "unsharded y/z factorisation (the flat-ring DCN shortcut); "
                "y/z-sharded slices need the complex-capable real path"
            )
        # jax.devices() is process-major, so the flat ring below IS the
        # hierarchical (slice, gx) ring's device order — no need to build
        # the 4-axis mesh just to flatten it
        mesh = make_mesh((config.mesh.slices * gx, 1, 1))
        slice_res = config.mesh.slice_update
        log.info(
            "Multi-slice split run: riding the flat x-ring (%d shards, "
            "process-major) with the pair-resident window pinned to "
            "slice_update=%d",
            config.mesh.slices * gx, config.mesh.slice_update,
        )
    mesh = mesh if mesh is not None else make_mesh(config.mesh.as_tuple())
    ext = config.central_difference.ext

    # Split potentials are analytic by construction (generate_split), so
    # every per-state array is assembled from per-shard blocks — O(shard)
    # host memory (see solver_sharded.run_sharded; reference:
    # src/potential.rs:46-62 is embarrassingly local). Only the scalar
    # side-channel (v_min slab scan, pole warning, pot_sub arbitration)
    # runs host-side here; the FullCornell pot_sub array defers to
    # per-shard generation too.
    import dataclasses

    real_cfg = dataclasses.replace(
        config, potential=config.potential.real_counterpart
    )
    v_min = pmod.scan_v_min(real_cfg)
    v_shift = pmod.v_shift_and_pole_warn(config, v_min, log)
    pot_sub_array, pot_sub_scalar = pmod.load_pot_sub(
        config, log, build_array=False
    )

    def interior(p):
        return geometry.work_area(p, ext)

    w_store: List = []  # (re, im) interior host pairs
    if config.wavenum > 0:
        from wafer_tpu.io import readers

        for w in readers.load_wavefunctions(config, log):
            w = np.asarray(w)
            w_store.append(
                (
                    jnp.asarray(np.real(interior(w)), dtype=config.real_dtype),
                    jnp.asarray(np.imag(interior(w)), dtype=config.real_dtype),
                )
            )

    log.info(
        "Starting split-complex calculation (sharded over mesh %s)", dict(mesh.shape)
    )
    results = []
    for wnum in range(config.wavenum, config.wavemax + 1):
        progress = progress_factory(wnum) if progress_factory is not None else None
        results.append(
            _solve_state_split(
                config, log, mesh, wnum, w_store,
                v_shift, seed, progress,
                ic_override=(
                    ic_overrides.get(wnum) if ic_overrides is not None else None
                ),
                pot_sub_array=pot_sub_array,
                pot_sub_scalar=pot_sub_scalar,
                slice_res=slice_res,
            )
        )
    return results


def _select_ic_split(config, log, wnum, w_store, seed):
    """Disk (current, incl. _partial) → previous state → generator — split
    host-side (reference preference: src/grid.rs:60-100).

    NOTE: this preference logic also lives in solver._select_initial_condition
    (native dtypes) and inline in solver._solve_split (single-device split) —
    lifecycle changes must be applied to all three."""
    import dataclasses

    from wafer_tpu.config import InitialCondition
    from wafer_tpu.io import readers
    from wafer_tpu.models import initial

    ext = config.central_difference.ext
    if wnum > 0:
        try:
            wfn = np.asarray(
                readers.wavefunction(
                    wnum,
                    config.padded_size(),
                    config.central_difference.bb,
                    config.output.file_type,
                    log,
                    input_dir=config.input_dir,
                )
            )
            log.info("Loaded (current) wavefunction %d from disk", wnum)
            if (
                config.init_condition is not InitialCondition.FROM_FILE
                and wnum > config.wavenum
            ):
                # contamination warning (reference: src/grid.rs:78-84)
                log.warning(
                    "Loaded a higher order wavefunction from disk although "
                    "Initial conditions are set to '%s'.",
                    config.init_condition.display(),
                )
            w = geometry.work_area(wfn, ext)
            return (
                jnp.asarray(np.real(w), dtype=config.real_dtype),
                jnp.asarray(np.imag(w), dtype=config.real_dtype),
            )
        except errors.WaferError:
            log.info("Loaded wavefunction %d from memory as initial condition", wnum - 1)
            # seeded perturbation: an exact clone can Gram-Schmidt-cancel
            # bitwise to zero in f32 (see initial.perturb_clone); the pair
            # draws the same noise fields as the single-device split driver
            pr_c, pi_c = w_store[wnum - 1]
            return (
                initial.perturb_clone(
                    config, pr_c, wnum, seed=seed, padded=False
                ),
                initial.perturb_clone(
                    config, pi_c, wnum, seed=seed, padded=False,
                    component=1, rms_from=pr_c,
                ),
            )
    real_cfg = dataclasses.replace(
        config, potential=config.potential.real_counterpart
    )
    pr = initial.set_initial_conditions(real_cfg, log, seed=seed)
    return (
        geometry.work_area(pr, ext),
        jnp.zeros_like(geometry.work_area(pr, ext)),
    )


def _solve_state_split(
    config, log, mesh, wnum, w_store,
    v_shift, seed, progress, ic_override=None,
    pot_sub_array=None, pot_sub_scalar=None, slice_res=None,
):
    from wafer_tpu.io import writers
    from wafer_tpu.models import initial, potentials as pmod
    from wafer_tpu.solver import SolveResult, eta, stable_dt_bound
    from wafer_tpu.utils import terminal

    n_lower = wnum
    sub_deferred = pot_sub_array is None and config.potential.variable_pot_sub
    # honour the backend key like solver._resolve_backend (see the real
    # driver, parallel/solver_sharded.py)
    use_pallas = None
    if config.backend == "xla":
        use_pallas = False
    elif config.backend == "pallas":
        if jax.default_backend() in ("cpu",):
            raise errors.ConfigParseError(
                "backend: pallas requires an accelerator device"
            )
        use_pallas = True
    try:
        ops = ShardedSplitOps(
            config, mesh, n_lower, v_shift=v_shift, use_pallas=use_pallas,
            has_pot_sub_array=pot_sub_array is not None or sub_deferred,
            pot_sub_scalar=pot_sub_scalar, res_steps=slice_res,
            allow_ici=slice_res is None,
        )
    except ValueError as exc:
        raise errors.ConfigParseError(
            f"backend: pallas is unsupported for this sharded split run: {exc}"
        ) from exc
    if (
        slice_res is not None
        and ops.use_pallas
        and ops.sc_res_steps != slice_res
    ):
        # the multi-slice cadence pin didn't take (VMEM gates refused the
        # slice_update-deep pair window) — the run is still correct, but
        # slice-axis exchanges happen at the fallback path's own cadence
        log.warning(
            "Multi-slice split: the pair-resident window refused "
            "slice_update=%d (VMEM gates); slice-axis exchanges run at the "
            "fallback cadence instead of the DCN window",
            slice_res,
        )
    if ic_override is not None:
        log.info(
            "Using explicit in-memory initial (re, im) pair for state %d "
            "(multigrid hand-over)", wnum,
        )
        ext_ = config.central_difference.ext
        pr0 = geometry.work_area(
            jnp.asarray(ic_override[0], dtype=config.real_dtype), ext_
        )
        pi0 = geometry.work_area(
            jnp.asarray(ic_override[1], dtype=config.real_dtype), ext_
        )
    else:
        pr0, pi0 = _select_ic_split(config, log, wnum, w_store, seed)
    pr, pi = ops.put(pr0), ops.put(pi0)
    # per-shard blocks: vr from coordinates, everything else derived
    # elementwise on the already-sharded array (stays sharded under jit)
    ext_b = config.central_difference.ext
    vr_d = ops.put_blocks(
        lambda shp, off: pmod.generate_split(
            config, shp, tuple(o + ext_b for o in off)
        )[0],
        dtype=config.real_dtype,
    )
    vi_d = jax.jit(lambda v: jnp.asarray(config.absorb, v.dtype) * v)(vr_d)
    ar_d, ai_d, br_d, bi_d = jax.jit(
        lambda r, i_: pmod.build_ab_split(r, i_, config.grid.dt, v_shift)
    )(vr_d, vi_d)
    r2_d = ops.put_blocks(
        lambda shp, off: geometry.r2_index_grid(
            shp, config.grid.size.as_tuple(), dtype=config.real_dtype,
            offset=off,
        ),
        dtype=config.real_dtype,
    )
    if pot_sub_array is not None:
        sub_d = ops.put(pot_sub_array)
    elif sub_deferred:
        sub_d = ops.put_blocks(
            lambda shp, off: pmod.potential_sub_array(config, shp, off),
            dtype=config.real_dtype,
        )
    else:
        sub_d = ops.dummy_pot_sub()
    sr_d = ops.put_store(
        jnp.stack([w[0] for w in w_store[:n_lower]]) if n_lower else None
    )
    si_d = ops.put_store(
        jnp.stack([w[1] for w in w_store[:n_lower]]) if n_lower else None
    )

    # Delayed re-orthogonalisation (solver.delayed_gram_gate; PARITY #12)
    # on the sharded split driver: delayed chunks run a ground
    # per-step-norm ShardedSplitOps instance (no stored-pair streams);
    # same perm requirement and sync_update exclusion as solver_sharded.
    from wafer_tpu.solver import DelayedGramState

    delayed_gs = False
    dgs_state = DelayedGramState()
    e_lowest = None
    ops_dgs = None
    if (
        n_lower > 0
        and config.delayed_gram
        and (config.sync_update or 1) == 1
    ):
        e_ls = []
        for wr_, wi_ in w_store[:n_lower]:
            (e_rl, _e_il, n2_l, _v_l, _r_l), _pp = ops.measure(
                ops.put(wr_), ops.put(wi_), vr_d, vi_d, r2_d, sub_d,
                sr_d, si_d,
            )
            e_ls.append(float(e_rl) / float(n2_l))
        try:
            ops_dgs = ShardedSplitOps(
                config, mesh, 0, v_shift=v_shift, use_pallas=use_pallas,
                has_pot_sub_array=pot_sub_array is not None or sub_deferred,
                pot_sub_scalar=pot_sub_scalar, res_steps=slice_res,
                allow_ici=slice_res is None,
            )
        except ValueError:
            ops_dgs = None
        if ops_dgs is not None and ops_dgs.perm != ops.perm:
            ops_dgs = None
        if ops_dgs is not None:
            e_lowest = min(e_ls)
            dgs_store = ops_dgs.put_store(None)

    terminal.print_observable_header(wnum)
    ext = config.central_difference.ext
    step = 0
    converged = False
    last_energy = complex(float("inf"), 0.0)
    diff_old = float("inf")
    obs = None
    per_step_norm = False

    # Device-side convergence batching (sync_update), the same opt-in
    # cadence contract as the other three drivers (solver.solve,
    # solver._solve_split, solver_sharded — spec src/grid.rs:126-220).
    # Round trips cost most on multi-chip meshes. Every device array
    # threads through the env argument, never a jit closure (HTTP 413
    # through remote compile services, CLAUDE.md).
    from wafer_tpu.solver import make_batched_runner, pick_batch_k

    k_sync = config.sync_update or 1
    su = config.output.screen_update
    if k_sync > 1 and not jax.config.jax_enable_x64:
        log.warning(
            "sync_update=%d with jax_enable_x64 off: the on-device "
            "convergence verdict is f32 and may differ from the host check "
            "by an ulp at the tolerance edge",
            k_sync,
        )
    _batched_cache: dict = {}
    _batch_env = {
        "vr": vr_d, "vi": vi_d, "r2": r2_d, "sub": sub_d,
        "sr": sr_d, "si": si_d,
        "ar": ar_d, "ai": ai_d, "br": br_d, "bi": bi_d,
    }

    def _measure_env(p2, env):
        pr_, pi_ = p2
        return ops.measure(
            pr_, pi_, env["vr"], env["vi"], env["r2"], env["sub"],
            env["sr"], env["si"],
        )

    def _get_batched(k_chunks: int, psn: bool):
        key = (k_chunks, psn)
        if key not in _batched_cache:
            chunk_fn = ops.evolve_chunk_psn if psn else ops.evolve_chunk

            def _evolve_env(p2, env, _fn=chunk_fn):
                pr_, pi_ = p2
                return _fn(
                    pr_, pi_, env["ar"], env["ai"], env["br"], env["bi"],
                    env["sr"], env["si"],
                )

            _batched_cache[key] = make_batched_runner(
                _measure_env, _evolve_env, config.tolerance, True,
                k_chunks, split_pair=True,
            )
        return _batched_cache[key]

    rows_pending: list = []
    batch_phi_next = None
    batch_phi_conv = None

    while True:
        measured_delta = None
        dev_done = None
        if rows_pending:
            obs, dev_done = rows_pending.pop(0)
        else:
            k_batch = pick_batch_k(
                step, k_sync, su, config.output.snap_update, config.max_steps
            )
            if k_batch > 1:
                led = (
                    jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
                )
                le = jnp.asarray(
                    [last_energy.real, last_energy.imag], dtype=led
                )
                (pr_f, pi_f), (pr_c, pi_c), out_rows = _get_batched(
                    k_batch, per_step_norm
                )((pr, pi), le, _batch_env)
                ers, eis, n2s, vinfs, r2s_, execs, dones = (
                    np.asarray(x) for x in out_rows
                )
                for j in range(k_batch):
                    if not bool(execs[j]):
                        break
                    rows_pending.append((
                        Observables(
                            energy=complex(float(ers[j]), float(eis[j])),
                            norm2=float(n2s[j]),
                            v_infinity=float(vinfs[j]),
                            r2=float(r2s_[j]),
                        ),
                        bool(dones[j]),
                    ))
                batch_phi_next = (pr_f, pi_f)
                batch_phi_conv = (pr_c, pi_c)
                continue
            if delayed_gs and n_lower > 0:
                from wafer_tpu.solver import _max_rel_overlap_sc

                measured_delta = float(
                    _max_rel_overlap_sc(pr, pi, sr_d, si_d)
                )
            (e_re, e_im, n2, vinf, r2), (pr, pi) = ops.measure(
                pr, pi, vr_d, vi_d, r2_d, sub_d, sr_d, si_d
            )
            obs = Observables(
                energy=complex(float(e_re), float(e_im)),
                norm2=float(n2),
                v_infinity=float(vinf),
                r2=float(r2),
            )
        if not (math.isfinite(obs.norm2) and obs.norm2 > 0.0):
            raise errors.NonFiniteError("norm²", step)
        norm_energy = obs.energy / obs.norm2
        if (
            n_lower == 0
            and config.grid.dt
            <= stable_dt_bound(
                config.central_difference.value, config.grid.dn, config.mass
            )
        ):
            # re-evaluated per measure with hysteresis (solver.drift_guard):
            # a hot IC rides psn through the transient, then the fast
            # kernel ladder resumes; the batched cache is psn-keyed
            from wafer_tpu.solver import drift_guard

            _efold_limit = 60.0 if config.real_dtype == jnp.float32 else 600.0
            per_step_norm = drift_guard(
                per_step_norm, norm_energy.real, v_shift,
                config.grid.dt, config.output.screen_update,
                _efold_limit, log,
            )
        if n_lower > 0 and e_lowest is not None:
            # delayed re-orthogonalisation gate + flap cooldown (solve())
            delayed_gs = dgs_state.update(
                norm_energy.real, e_lowest, config.grid.dt,
                config.output.screen_update, config.tolerance, log,
                measured_delta=measured_delta,
            )
        tau = step * config.grid.dt

        # snapshot: symmetrisation persists (componentwise); the stale-norm
        # rescale is file-only (PARITY divergence 8); complex exists only in
        # the written file
        if config.output.snap_update is not None and step % config.output.snap_update == 0:
            sym_r = geometry.frame_with_halo(jnp.asarray(ops.get(pr)), ext)
            sym_i = geometry.frame_with_halo(jnp.asarray(ops.get(pi)), ext)
            sym_r = initial.symmetrise_wavefunction(config, sym_r)
            sym_i = initial.symmetrise_wavefunction(config, sym_i)
            pr = ops.put(geometry.work_area(sym_r, ext))
            pi = ops.put(geometry.work_area(sym_i, ext))
            inv_stale = 1.0 / math.sqrt(obs.norm2)
            log.info("Saving partially converged wavefunction %d to disk.", wnum)
            try:
                writers.wavefunction(
                    (
                        np.asarray(geometry.work_area(sym_r, ext))
                        + 1j * np.asarray(geometry.work_area(sym_i, ext))
                    )
                    * inv_stale,
                    wnum, False, config.project_name, config.output.file_type,
                    output_root=config.output_root,
                )
            except errors.WaferError as exc:
                log.warning("Could not output partial wavefunction: %s", exc)

        diff = abs(norm_energy - last_energy)
        # batched rows carry the device's convergence verdict (complex
        # modulus on the real pair — make_batched_runner split_pair mode)
        converged_now = (
            dev_done if dev_done is not None else diff < config.tolerance
        )
        if converged_now:
            if dev_done is not None:
                pr, pi = batch_phi_conv  # the measured ψ pair of this row
                rows_pending.clear()
                batch_phi_next = batch_phi_conv = None
            if progress is not None:
                progress.finish()
            print(terminal.print_measurements(tau, diff, obs))
            writers.finalise_measurement(
                obs, wnum, float(config.grid.size.x), config.project_name,
                config.output.file_type, output_root=config.output_root,
            )
            if config.output.snap_update is not None:
                try:
                    writers.remove_partial(
                        wnum, config.project_name, config.output.file_type,
                        output_root=config.output_root,
                    )
                except errors.WaferError:
                    pass
            converged = True
            break
        last_energy = norm_energy

        if progress is not None:
            estimate = eta(step, diff_old, float(diff), config)
            if estimate is not None:
                cycles = step / config.output.screen_update
                progress.set_position(
                    int(math.floor(100.0 - estimate / (cycles + estimate) * 100.0))
                )
            progress.set_message(terminal.print_measurements(tau, diff, obs))

        if config.max_steps is not None and step > config.max_steps:
            break

        if rows_pending:
            # more device-batch rows pending: advance the cadence only
            diff_old = float(diff)
            step += su
            continue
        if batch_phi_next is not None:
            # last row of a device batch: adopt the already-evolved ψ pair
            pr, pi = batch_phi_next
            batch_phi_next = batch_phi_conv = None
            diff_old = float(diff)
            step += su
            continue

        if delayed_gs and n_lower > 0:
            # delayed chunk: ground per-step-norm instance, no stores
            pr, pi = ops_dgs.evolve_chunk_psn(
                pr, pi, ar_d, ai_d, br_d, bi_d, dgs_store, dgs_store
            )
        else:
            chunk_fn = (
                ops.evolve_chunk_psn if per_step_norm else ops.evolve_chunk
            )
            pr, pi = chunk_fn(pr, pi, ar_d, ai_d, br_d, bi_d, sr_d, si_d)
        diff_old = float(diff)
        step += config.output.screen_update

    if config.output.save_wavefns:
        try:
            writers.wavefunction(
                np.asarray(ops.get(pr)) + 1j * np.asarray(ops.get(pi)),
                wnum, converged, config.project_name, config.output.file_type,
                output_root=config.output_root,
            )
        except errors.WaferError as exc:
            log.warning("Could not write wavefunction to disk: %s", exc)

    if not converged:
        raise errors.MaxStepError()
    log.info("Calculation Converged")
    pair = (jnp.asarray(ops.get(pr)), jnp.asarray(ops.get(pi)))
    w_store.append(pair)
    return SolveResult(
        wnum=wnum, converged=True, observables=obs, steps=step, phi=(pr, pi)
    )
