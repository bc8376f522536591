"""Fused split-complex Pallas sweep vs the XLA split path (interpret mode).

Every kernel family is parametrized over all three stencil orders —
ext ∈ {1, 2, 3} halo widths are the part SURVEY §7 calls hardest to get
right (the reference's bb/ext spec: src/config.rs:222-239)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import base_config
from wafer_tpu import geometry
from wafer_tpu.models import potentials as pmod
from wafer_tpu.ops import pallas_split as ps, split_complex as sc

ORDERS = ["ThreePoint", "FivePoint", "SevenPoint"]
_EXTS = {"ThreePoint": 1, "FivePoint": 2, "SevenPoint": 3}


def _setup(n_lower=0, order="ThreePoint"):
    cfg = base_config(
        precision="f32",
        potential="ComplexHarmonic",
        absorb=0.2,
        central_difference=order,
        grid={"size": {"x": 8, "y": 8, "z": 128}, "dn": 0.2, "dt": 0.004},
    )
    ext = _EXTS[order]
    rng = np.random.default_rng(41)
    pr = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    pi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    vr, vi = pmod.generate_split(cfg)
    vr, vi = vr.astype(jnp.float32), vi.astype(jnp.float32)
    ar, ai, br, bi = pmod.build_ab_split(vr, vi, cfg.grid.dt)
    return cfg, ext, pr, pi, ar, ai, br, bi


def _stack_b(br, bi, ext):
    return jnp.concatenate(
        [geometry.work_area(br, ext), geometry.work_area(bi, ext)], axis=0
    )


def _analytic_tuple(cfg):
    g = cfg.grid
    return (
        "Harmonic", g.dn, g.dt, cfg.mass,
        g.size.x, g.size.y, g.size.z, cfg.sig, 0.0, cfg.absorb,
    )


@pytest.mark.parametrize("order", ORDERS)
def test_split_fused_chunk_ground(order):
    cfg, ext, pr, pi, ar, ai, br, bi = _setup(order=order)
    dt, dn, mass = cfg.grid.dt, cfg.grid.dn, cfg.mass
    rr, ri = sc.evolve_chunk_sc(
        pr, pi, ar, ai, br, bi, None, None, order, dt, dn, mass, 4, 0
    )
    out2 = ps.evolve_chunk_fused_sc(
        ps.to_xpad_sc(pr, pi, ext), _stack_b(br, bi, ext), None,
        order, dt, dn, mass, 4, 0, interpret=True,
    )
    or_, oi_ = ps.from_xpad_sc(out2, ext)
    np.testing.assert_allclose(np.asarray(or_), np.asarray(rr), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(oi_), np.asarray(ri), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("order", ORDERS)
def test_split_fused_chunk_per_step_norm(order):
    cfg, ext, pr, pi, ar, ai, br, bi = _setup(order=order)
    dt, dn, mass = cfg.grid.dt, cfg.grid.dn, cfg.mass
    rr, ri = sc.evolve_chunk_sc(
        pr, pi, ar, ai, br, bi, None, None, order, dt, dn, mass, 4, 0,
        per_step_norm=True,
    )
    out2 = ps.evolve_chunk_fused_sc(
        ps.to_xpad_sc(pr, pi, ext), _stack_b(br, bi, ext), None,
        order, dt, dn, mass, 4, 0, interpret=True, per_step_norm=True,
    )
    or_, oi_ = ps.from_xpad_sc(out2, ext)
    np.testing.assert_allclose(np.asarray(or_), np.asarray(rr), rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(oi_), np.asarray(ri), rtol=5e-5, atol=5e-6)


@pytest.mark.parametrize("order", ORDERS)
def test_split_fused_chunk_excited(order):
    """Complex Gram-Schmidt through the carried [inv, cr, ci] coefficients."""
    cfg, ext, pr, pi, ar, ai, br, bi = _setup(n_lower=1, order=order)
    dt, dn, mass = cfg.grid.dt, cfg.grid.dn, cfg.mass
    rng = np.random.default_rng(43)
    lr = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    li = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    n = jnp.sqrt(jnp.sum(lr * lr + li * li)).astype(jnp.float32)
    lr, li = lr / n, li / n

    rr, ri = sc.evolve_chunk_sc(
        pr, pi, ar, ai, br, bi,
        jnp.stack([lr]), jnp.stack([li]),
        order, dt, dn, mass, 3, 1,
    )
    store2 = jnp.stack([ps.to_xpad_sc(lr, li, ext)])
    out2 = ps.evolve_chunk_fused_sc(
        ps.to_xpad_sc(pr, pi, ext), _stack_b(br, bi, ext), store2,
        order, dt, dn, mass, 3, 1, interpret=True,
    )
    or_, oi_ = ps.from_xpad_sc(out2, ext)
    np.testing.assert_allclose(np.asarray(or_), np.asarray(rr), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oi_), np.asarray(ri), rtol=5e-4, atol=1e-5)
    # orthogonality: ⟨l|ψ⟩ ≈ 0 (complex)
    o_re = float(jnp.sum(lr * or_ + li * oi_))
    o_im = float(jnp.sum(lr * oi_ - li * or_))
    assert abs(o_re) < 1e-4 and abs(o_im) < 1e-4


@pytest.mark.parametrize("order", ORDERS)
def test_split_fused_analytic_b(order):
    """In-kernel complex coordinate-B == streamed (Br, Bi) arrays, ground
    and excited paths."""
    cfg, ext, pr, pi, ar, ai, br, bi = _setup(order=order)
    dt, dn, mass = cfg.grid.dt, cfg.grid.dn, cfg.mass
    analytic = _analytic_tuple(cfg)
    ref2 = ps.evolve_chunk_fused_sc(
        ps.to_xpad_sc(pr, pi, ext), _stack_b(br, bi, ext), None,
        order, dt, dn, mass, 3, 0, interpret=True,
    )
    out2 = ps.evolve_chunk_fused_sc(
        ps.to_xpad_sc(pr, pi, ext), None, None,
        order, dt, dn, mass, 3, 0, interpret=True, analytic=analytic,
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref2), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize("order", ORDERS)
def test_split_resident_chunk_matches_xla(order):
    """(re, im)-resident chunk kernel: streamed-B, analytic-B, and the
    per-step-norm variant vs the XLA split oracle."""
    cfg, ext, pr, pi, ar, ai, br, bi = _setup(order=order)
    dt, dn, mass = cfg.grid.dt, cfg.grid.dn, cfg.mass

    rr, ri = sc.evolve_chunk_sc(
        pr, pi, ar, ai, br, bi, None, None, order, dt, dn, mass, 4, 0
    )
    # streamed B
    out = ps.evolve_chunk_resident_sc(
        ps.to_xpad_sc(pr, pi, ext), order, dt, dn, mass, 4, None,
        interpret=True, b2=_stack_b(br, bi, ext),
    )
    or_, oi_ = ps.from_xpad_sc(out, ext)
    np.testing.assert_allclose(np.asarray(or_), np.asarray(rr), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(oi_), np.asarray(ri), rtol=2e-5, atol=2e-6)

    # analytic complex B
    analytic = _analytic_tuple(cfg)
    out_a = ps.evolve_chunk_resident_sc(
        ps.to_xpad_sc(pr, pi, ext), order, dt, dn, mass, 4, analytic,
        interpret=True,
    )
    oar, oai = ps.from_xpad_sc(out_a, ext)
    np.testing.assert_allclose(np.asarray(oar), np.asarray(rr), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(oai), np.asarray(ri), rtol=2e-5, atol=2e-6)

    # per-step-norm drift guard
    nr, ni = sc.evolve_chunk_sc(
        pr, pi, ar, ai, br, bi, None, None, order, dt, dn, mass, 4, 0,
        per_step_norm=True,
    )
    out_n = ps.evolve_chunk_resident_sc(
        ps.to_xpad_sc(pr, pi, ext), order, dt, dn, mass, 4, analytic,
        interpret=True, per_step_norm=True,
    )
    onr, oni = ps.from_xpad_sc(out_n, ext)
    np.testing.assert_allclose(np.asarray(onr), np.asarray(nr), rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(oni), np.asarray(ni), rtol=5e-5, atol=5e-6)


def test_split_resident_supported_gating():
    assert ps.resident_sc_supported(128, 128, 128, 1, 4)
    # 256³ complex (2×64.5 MiB) exceeds the resident budget
    assert not ps.resident_sc_supported(256, 256, 256, 1, 4)
    assert not ps.resident_sc_supported(128, 128, 128, 1, 8)


@pytest.mark.parametrize("order", ORDERS)
@pytest.mark.parametrize("n_steps", [4, 5])
@pytest.mark.parametrize("streamed_b", [False, True])
def test_split_mixed_residency_matches_xla(n_steps, streamed_b, order):
    """Mixed-residency chunk (re VMEM-resident throughout, im streamed
    through the ping-pong HBM pair) == the XLA split oracle — both
    ping-pong parities (even/odd chunk lengths end in different halves)
    and both B sources (analytic complex B / streamed (Br, Bi) windows,
    the non-analytic-potential path, e.g. ComplexFullCornell)."""
    cfg, ext, pr, pi, ar, ai, br, bi = _setup(order=order)
    dt, dn, mass = cfg.grid.dt, cfg.grid.dn, cfg.mass
    analytic = _analytic_tuple(cfg)

    rr, ri = sc.evolve_chunk_sc(
        pr, pi, ar, ai, br, bi, None, None, order, dt, dn, mass, n_steps, 0
    )
    out = ps.evolve_chunk_resident_mixed_sc(
        ps.to_xpad_sc(pr, pi, ext), order, dt, dn, mass, n_steps,
        None if streamed_b else analytic,
        interpret=True,
        b2=_stack_b(br, bi, ext) if streamed_b else None,
    )
    or_, oi_ = ps.from_xpad_sc(out, ext)
    np.testing.assert_allclose(
        np.asarray(or_), np.asarray(rr), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(oi_), np.asarray(ri), rtol=2e-5, atol=2e-6
    )

    # per-step-norm variant (delayed-GS / drift-guard chunks): the deferred
    # racc recursion + host-side final rescale == the psn oracle
    nr, ni = sc.evolve_chunk_sc(
        pr, pi, ar, ai, br, bi, None, None, order, dt, dn, mass, n_steps, 0,
        per_step_norm=True,
    )
    out_n = ps.evolve_chunk_resident_mixed_sc(
        ps.to_xpad_sc(pr, pi, ext), order, dt, dn, mass, n_steps,
        None if streamed_b else analytic,
        interpret=True,
        b2=_stack_b(br, bi, ext) if streamed_b else None,
        per_step_norm=True,
    )
    onr, oni = ps.from_xpad_sc(out_n, ext)
    np.testing.assert_allclose(
        np.asarray(onr), np.asarray(nr), rtol=5e-5, atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(oni), np.asarray(ni), rtol=5e-5, atol=5e-6
    )


def test_split_mixed_residency_gating():
    # 256³: the pair misses whole-chunk VMEM but re alone fits — the
    # mixed plan exists exactly there
    assert ps.resident_mixed_sc_supported(256, 256, 256, 1, 4, True)
    # streamed-B (non-analytic potentials) budgets the (Br, Bi) windows:
    # still fits at 256³, one tx notch below the analytic plan
    assert ps.resident_mixed_sc_supported(256, 256, 256, 1, 4, False)
    assert (
        ps.pick_tx_mixed_sc(256, 256, 256, 1, 4, False)
        <= ps.pick_tx_mixed_sc(256, 256, 256, 1, 4, True)
    )
    # past the real kernel's resident envelope re no longer fits either
    assert not ps.resident_mixed_sc_supported(512, 512, 512, 1, 4, True)
    assert not ps.resident_mixed_sc_supported(512, 512, 512, 1, 4, False)


@pytest.mark.parametrize("order", ORDERS)
def test_split_k_fused_matches_one_step(order):
    """K=2 temporal blocking for split-complex grounds == K single fused
    sweeps (streamed and analytic B), incl. remainder-step handling."""
    cfg, ext, pr, pi, ar, ai, br, bi = _setup(order=order)
    dt, dn, mass = cfg.grid.dt, cfg.grid.dn, cfg.mass
    n_steps = 5  # 2 fused calls + 1 remainder step

    ref = ps.evolve_chunk_fused_sc(
        ps.to_xpad_sc(pr, pi, ext), _stack_b(br, bi, ext), None,
        order, dt, dn, mass, n_steps, 0, interpret=True,
    )
    rr, ri = ps.from_xpad_sc(ref, ext)

    # streamed B in the K layout: each component padded by (K−1)·ext
    bwr = geometry.work_area(br, ext)
    bwi = geometry.work_area(bi, ext)
    b2k = jnp.concatenate([
        jnp.pad(bwr, ((ext, ext), (0, 0), (0, 0))),
        jnp.pad(bwi, ((ext, ext), (0, 0), (0, 0))),
    ], axis=0)
    out = ps.evolve_chunk_fused_k_sc(
        ps.to_xpad_k_sc(pr, pi, ext, 2), b2k, order, dt, dn, mass,
        n_steps, 2, interpret=True,
    )
    kr, ki = ps.from_xpad_k_sc(out, ext, 2)
    np.testing.assert_allclose(np.asarray(kr), np.asarray(rr), rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(ki), np.asarray(ri), rtol=5e-5, atol=5e-6)

    analytic = _analytic_tuple(cfg)
    out_a = ps.evolve_chunk_fused_k_sc(
        ps.to_xpad_k_sc(pr, pi, ext, 2), None, order, dt, dn, mass,
        n_steps, 2, analytic=analytic, interpret=True,
    )
    ar_, ai_ = ps.from_xpad_k_sc(out_a, ext, 2)
    np.testing.assert_allclose(np.asarray(ar_), np.asarray(rr), rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(ai_), np.asarray(ri), rtol=5e-5, atol=5e-6)


@pytest.mark.parametrize("order", ORDERS)
def test_split_resident_blocked_matches_fused(order):
    """x-blocked deep-halo split passes (both components resident per
    block) vs the 1-step fused split sweep — interior/edge blocks and the
    blind ghost-zone sweep exercised; remainder-step cadence too. At
    SevenPoint the explicit tx=4 plan carries a remainder slab shorter
    than the widest tap (txs=2 < off=3), the _lag_xm edge case."""
    cfg = base_config(
        precision="f32",
        potential="ComplexHarmonic",
        absorb=0.2,
        central_difference=order,
        grid={"size": {"x": 32, "y": 8, "z": 128}, "dn": 0.1, "dt": 0.002},
    )
    ext = _EXTS[order]
    g = cfg.grid
    rng = np.random.default_rng(47)
    pr = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    pi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    an = _analytic_tuple(cfg)
    for n_steps, r in ((4, 2), (5, 2)):
        ref2 = ps.evolve_chunk_fused_sc(
            ps.to_xpad_sc(pr, pi, ext), None, None,
            order, g.dt, g.dn, cfg.mass, n_steps, 0, interpret=True,
            analytic=an,
        )
        rr, ri = ps.from_xpad_sc(ref2, ext)
        out2 = ps.evolve_chunk_resident_blocked_sc(
            ps.to_xpad_k_sc(pr, pi, ext, r), order, g.dt, g.dn, cfg.mass,
            n_steps, an, bx=8, r_steps=r, interpret=True, tx=4,
        )
        or_, oi_ = ps.from_xpad_k_sc(out2, ext, r)
        np.testing.assert_allclose(
            np.asarray(or_), np.asarray(rr), rtol=3e-6, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(oi_), np.asarray(ri), rtol=3e-6, atol=2e-6
        )


def test_split_resident_blocked_prefetch_matches_serial():
    """The split kernel's opt-in ping-pong prefetch schedule stays
    trajectory-identical to the serial default (real-kernel twin:
    tests/test_pallas_stencil.py)."""
    cfg = base_config(
        precision="f32",
        potential="ComplexHarmonic",
        absorb=0.2,
        grid={"size": {"x": 32, "y": 8, "z": 128}, "dn": 0.1, "dt": 0.002},
    )
    ext, order, r = 1, "ThreePoint", 2
    g = cfg.grid
    rng = np.random.default_rng(48)
    pr = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    pi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    an = (
        "Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z,
        cfg.sig, 0.0, cfg.absorb,
    )
    base = ps.evolve_chunk_resident_blocked_sc(
        ps.to_xpad_k_sc(pr, pi, ext, r), order, g.dt, g.dn, cfg.mass,
        2 * r, an, bx=8, r_steps=r, interpret=True, tx=4,
    )
    pp = ps.evolve_chunk_resident_blocked_sc(
        ps.to_xpad_k_sc(pr, pi, ext, r), order, g.dt, g.dn, cfg.mass,
        2 * r, an, bx=8, r_steps=r, interpret=True, tx=4, prefetch=True,
    )
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(base))


def test_pick_resb_sc_plans():
    """256³ complex (the pair misses whole-array VMEM residency) gets a
    multi-block deep-halo plan within the resident budget."""
    plan = ps.pick_resb_sc(256, 256, 256, 1, 4, 500)
    assert plan is not None
    bx, r, tx, _pf, _rate = plan
    assert 256 % bx == 0 and 256 // bx >= 2
    assert 2 * (bx + 2 * r) * 256 * 256 * 4 <= ps._pk._RES_BUDGET
    assert ps.pick_resb_sc(256, 256, 256, 1, 8, 500) is None  # f32 only
