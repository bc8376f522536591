"""Fused Pallas sweep vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import base_config
from wafer_tpu import geometry
from wafer_tpu.models import potentials as pmod
from wafer_tpu.ops import gram_schmidt, pallas_stencil as pk, stencil


def _setup(order, n=16, dtype=jnp.float32):
    cfg = base_config(
        central_difference=order,
        grid={"size": {"x": n, "y": n, "z": n}, "dn": 0.2, "dt": 0.004},
        precision="f32",
    )
    ext = cfg.central_difference.ext
    rng = np.random.default_rng(0)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=dtype), ext
    )
    v = pmod.generate(cfg).astype(dtype)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    return cfg, ext, phi, a.astype(dtype), b.astype(dtype)


@pytest.mark.parametrize("order", ["ThreePoint", "FivePoint", "SevenPoint"])
def test_fused_step_matches_xla(order):
    cfg, ext, phi, a, b = _setup(order)
    ref = stencil.evolve_step(phi, a, b, order, cfg.grid.dt, cfg.grid.dn, cfg.mass)

    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = cfg.grid.dt / (k * cfg.grid.dn ** 2 * cfg.mass)
    phi_x = pk.to_xpad(phi, ext)
    b_int = geometry.work_area(b, ext)
    out, norm2, _ = pk.evolve_step_fused(
        phi_x, b_int, None, order, scale, 0, interpret=True
    )
    out_full = pk.from_xpad(out, ext)
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(ref), rtol=2e-6, atol=1e-6
    )
    # fused norm² matches a direct reduction of the updated field
    expect_n2 = float(gram_schmidt.get_norm_squared(geometry.work_area(ref, ext)))
    assert abs(float(norm2) - expect_n2) < 1e-4 * abs(expect_n2)


def test_fused_chunk_matches_xla_ground_state():
    cfg, ext, phi, a, b = _setup("ThreePoint")
    order = "ThreePoint"
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 5, 0
    )
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext),
        geometry.work_area(b, ext),
        None,
        order,
        cfg.grid.dt,
        cfg.grid.dn,
        cfg.mass,
        5,
        0,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5, atol=1e-6
    )


def test_fused_chunk_excited_matches_xla():
    """Single stored state: fused GS is algebraically identical to the
    reference's normalise-then-project order."""
    cfg, ext, phi, a, b = _setup("ThreePoint")
    order = "ThreePoint"
    rng = np.random.default_rng(1)
    lower = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    lower = lower / jnp.sqrt(gram_schmidt.get_norm_squared(lower)).astype(jnp.float32)
    store = jnp.stack([lower])

    ref = stencil.evolve_chunk(
        phi, a, b, store, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 1
    )
    store_x = jnp.stack([pk.to_xpad(lower, ext)])
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext),
        geometry.work_area(b, ext),
        store_x,
        order,
        cfg.grid.dt,
        cfg.grid.dn,
        cfg.mass,
        4,
        1,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=5e-4, atol=5e-6
    )
    # orthogonality preserved
    overlap = float(jnp.sum(lower * pk.from_xpad(out, ext)))
    assert abs(overlap) < 1e-5


def test_xpad_roundtrip():
    cfg, ext, phi, _a, _b = _setup("SevenPoint")
    x = pk.to_xpad(phi, ext)
    assert x.shape == (22, 16, 16)
    back = pk.from_xpad(x, ext)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(phi))


@pytest.mark.parametrize("k_steps", [2, 3, 4])
@pytest.mark.parametrize("order", ["ThreePoint", "FivePoint"])
def test_k_step_temporal_blocking_matches_xla(order, k_steps):
    """K fused sweeps == K single sweeps, including Dirichlet re-zeroing of
    the intermediate halo rows at the first/last slabs."""
    cfg, ext, phi, a, b = _setup(order, n=12)
    n_steps = 12
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, n_steps, 0
    )
    out = pk.evolve_chunk_fused_k(
        pk.to_xpad_k(phi, ext, k_steps),
        pk.b_to_xpad_k(geometry.work_area(b, ext), ext, k_steps),
        order,
        cfg.grid.dt,
        cfg.grid.dn,
        cfg.mass,
        n_steps,
        k_steps,
        interpret=True,
    )
    out_full = pk.from_xpad_k(out, ext, k_steps)
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(ref), rtol=5e-5, atol=5e-6
    )


def test_k_xpad_roundtrip():
    cfg, ext, phi, _a, _b = _setup("ThreePoint", n=8)
    x = pk.to_xpad_k(phi, ext, 2)
    assert x.shape == (12, 8, 8)
    back = pk.from_xpad_k(x, ext, 2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(phi))


def test_fused_chunk_two_lower_states_near_xla():
    """Two stored states: fused (classical) GS vs sequential (modified) GS.
    Stored states are orthonormalised here, so the difference is O(ε²) —
    the documented equivalence bound."""
    cfg, ext, phi, a, b = _setup("ThreePoint")
    order = "ThreePoint"
    rng = np.random.default_rng(2)
    l0 = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    l0 = l0 / jnp.sqrt(gram_schmidt.get_norm_squared(l0)).astype(jnp.float32)
    l1 = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    l1 = l1 - l0 * jnp.sum(l0 * l1)
    l1 = l1 / jnp.sqrt(gram_schmidt.get_norm_squared(l1)).astype(jnp.float32)
    store = jnp.stack([l0, l1])

    ref = stencil.evolve_chunk(
        phi, a, b, store, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 2
    )
    store_x = jnp.stack([pk.to_xpad(l0, ext), pk.to_xpad(l1, ext)])
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext),
        geometry.work_area(b, ext),
        store_x,
        order,
        cfg.grid.dt,
        cfg.grid.dn,
        cfg.mass,
        4,
        2,
        interpret=True,
    )
    out_full = pk.from_xpad(out, ext)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(ref), rtol=2e-3, atol=2e-5)
    # both lower states projected out
    for low in (l0, l1):
        assert abs(float(jnp.sum(low * out_full))) < 1e-5


def test_zt_kernel_matches_xla(monkeypatch):
    """z-tiled slab streaming (large-plane path), forced by disabling the
    plain picker; ground + excited chunks vs the XLA reference."""
    monkeypatch.setattr(pk, "_pick_tx", lambda *a: None)
    # tz=128 (minimum: halo DMA blocks are 128 lanes) over nz=256 → 2 chunks
    monkeypatch.setattr(
        pk, "_pick_tx_zt", lambda *a, **k: (4, 128)
    )

    cfg = base_config(
        precision="f32",
        grid={"size": {"x": 8, "y": 8, "z": 256}, "dn": 0.2, "dt": 0.01},
    )
    ext = 1
    order = "ThreePoint"
    rng = np.random.default_rng(11)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    _a, b = pmod.build_ab(v, cfg.grid.dt)
    b = b.astype(jnp.float32)
    a = _a.astype(jnp.float32)

    # ground state, multi-step
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 0
    )
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext),
        geometry.work_area(b, ext),
        None,
        order,
        cfg.grid.dt,
        cfg.grid.dn,
        cfg.mass,
        4,
        0,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5, atol=2e-6
    )

    # excited state with the carried-coef correction
    lower = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    lower = lower / jnp.sqrt(gram_schmidt.get_norm_squared(lower)).astype(jnp.float32)
    store = jnp.stack([lower])
    ref2 = stencil.evolve_chunk(
        phi, a, b, store, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 1
    )
    out2 = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext),
        geometry.work_area(b, ext),
        jnp.stack([pk.to_xpad(lower, ext)]),
        order,
        cfg.grid.dt,
        cfg.grid.dn,
        cfg.mass,
        3,
        1,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out2, ext)), np.asarray(ref2), rtol=5e-4, atol=2e-5
    )


def test_zt_kernel_fivepoint(monkeypatch):
    """z-tiled path with ext=2 (5-point): pads and window widths differ."""
    monkeypatch.setattr(pk, "_pick_tx", lambda *a: None)
    monkeypatch.setattr(
        pk, "_pick_tx_zt", lambda *a, **k: (4, 128)
    )
    cfg = base_config(
        precision="f32",
        central_difference="FivePoint",
        grid={"size": {"x": 8, "y": 8, "z": 256}, "dn": 0.2, "dt": 0.004},
    )
    ext = 2
    order = "FivePoint"
    rng = np.random.default_rng(12)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    ref = stencil.evolve_chunk(
        phi, a.astype(jnp.float32), b.astype(jnp.float32), None, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 0,
    )
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext),
        geometry.work_area(b.astype(jnp.float32), ext),
        None,
        order,
        cfg.grid.dt,
        cfg.grid.dn,
        cfg.mass,
        3,
        0,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=5e-5, atol=5e-6
    )


def test_analytic_b_matches_array_b():
    """In-kernel coordinate-computed B == streamed B array for every
    analytic potential kind, K=2 temporal blocking, interpret mode."""
    for pot, kind in (
        ("Harmonic", "Harmonic"),
        ("Coulomb", "Coulomb"),
        ("SimpleCornell", "SimpleCornell"),
        ("Periodic", "Periodic"),
        ("NoPotential", "NoPotential"),
    ):
        cfg = base_config(
            precision="f32",
            potential=pot,
            grid={"size": {"x": 12, "y": 12, "z": 12}, "dn": 0.2, "dt": 0.004},
        )
        ext = 1
        order = "ThreePoint"
        rng = np.random.default_rng(21)
        phi = geometry.zero_boundary(
            jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
        )
        v = pmod.generate(cfg).astype(jnp.float32)
        b = pmod.build_ab(v, cfg.grid.dt)[1].astype(jnp.float32)
        b_int = geometry.work_area(b, ext)

        ref = pk.evolve_chunk_fused_k(
            pk.to_xpad_k(phi, ext, 2),
            pk.b_to_xpad_k(b_int, ext, 2),
            order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 2, interpret=True,
        )
        g = cfg.grid
        analytic = (
            kind, g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z, cfg.sig
        )
        out = pk.evolve_chunk_fused_k(
            pk.to_xpad_k(phi, ext, 2),
            None,
            order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 2,
            analytic=analytic, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
        ), pot


def test_analytic_b_one_step_and_excited():
    """Analytic-B in the 1-step kernel: ground and excited (coef) paths."""
    cfg = base_config(
        precision="f32",
        potential="Coulomb",
        grid={"size": {"x": 12, "y": 12, "z": 12}, "dn": 0.2, "dt": 0.004},
    )
    ext = 1
    order = "ThreePoint"
    g = cfg.grid
    analytic = ("Coulomb", g.dn, g.dt, cfg.mass, 12, 12, 12)
    rng = np.random.default_rng(31)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    b = pmod.build_ab(v, cfg.grid.dt)[1].astype(jnp.float32)
    b_int = geometry.work_area(b, ext)

    ref = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), b_int, None, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 0, interpret=True,
    )
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), None, None, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 0, interpret=True,
        analytic=analytic,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)

    lower = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    lower = lower / jnp.sqrt(gram_schmidt.get_norm_squared(lower)).astype(jnp.float32)
    store_x = jnp.stack([pk.to_xpad(lower, ext)])
    ref2 = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), b_int, store_x, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 1, interpret=True,
    )
    out2 = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), None, store_x, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 1, interpret=True,
        analytic=analytic,
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=5e-4, atol=1e-5)


def test_single_program_grids():
    """nprog == 1 edge: the DMA drain/epilogue guards must still balance."""
    cfg, ext, phi, a, b = _setup("ThreePoint", n=4)
    order = "ThreePoint"
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 0
    )
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext),
        geometry.work_area(b, ext),
        None,
        order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 0, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5, atol=2e-6
    )
    out_k = pk.evolve_chunk_fused_k(
        pk.to_xpad_k(phi, ext, 2),
        pk.b_to_xpad_k(geometry.work_area(b, ext), ext, 2),
        order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad_k(out_k, ext, 2)), np.asarray(ref),
        rtol=2e-5, atol=2e-6,
    )


def test_fused_chunk_per_step_norm_matches_xla():
    """Ground state with carried per-step renormalisation (f32 scale-drift
    guard) matches the XLA per-step-normalised loop."""
    cfg, ext, phi, a, b = _setup("ThreePoint")
    order = "ThreePoint"
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 5, 0,
        per_step_norm=True,
    )
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext),
        geometry.work_area(b, ext),
        None,
        order,
        cfg.grid.dt,
        cfg.grid.dn,
        cfg.mass,
        5,
        0,
        interpret=True,
        per_step_norm=True,
    )
    out_full = pk.from_xpad(out, ext)
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(ref), rtol=2e-5, atol=1e-6
    )
    # output is normalised (per-step norm leaves ‖ψ‖ = 1 after the final
    # carried coefficient is materialised)
    n2 = float(gram_schmidt.get_norm_squared(geometry.work_area(out_full, ext)))
    assert abs(n2 - 1.0) < 1e-4


def test_zt_kernel_analytic_b(monkeypatch):
    """z-tiled kernel with in-kernel coordinate-computed B == streamed B
    (the B chunk DMA — a third of zt HBM traffic — is eliminated)."""
    monkeypatch.setattr(pk, "_pick_tx", lambda *a: None)
    monkeypatch.setattr(pk, "_pick_tx_zt", lambda *a, **k: (4, 128))

    cfg = base_config(
        precision="f32",
        potential="Harmonic",
        grid={"size": {"x": 8, "y": 8, "z": 256}, "dn": 0.2, "dt": 0.01},
    )
    ext = 1
    order = "ThreePoint"
    g = cfg.grid
    rng = np.random.default_rng(17)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    b = pmod.build_ab(v, cfg.grid.dt)[1].astype(jnp.float32)

    ref = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), geometry.work_area(b, ext), None, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 0, interpret=True,
    )
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, 8, 8, 256, cfg.sig, 0.0)
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), None, None, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 0, interpret=True,
        analytic=analytic,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)

    # excited (coef) path through the zt kernel with analytic B
    lower = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    lower = lower / jnp.sqrt(gram_schmidt.get_norm_squared(lower)).astype(jnp.float32)
    store_x = jnp.stack([pk.to_xpad(lower, ext)])
    ref2 = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), geometry.work_area(b, ext), store_x, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 1, interpret=True,
    )
    out2 = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), None, store_x, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 1, interpret=True,
        analytic=analytic,
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=5e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# K=2 temporal blocking WITH per-step normalise + Gram-Schmidt (kgs)
# --------------------------------------------------------------------------- #


def _kgs_setup(n_lower, seed=21, n=16):
    cfg = base_config(
        precision="f32",
        grid={"size": {"x": n, "y": 8, "z": 128}, "dn": 0.2, "dt": 0.01},
    )
    ext = 1
    rng = np.random.default_rng(seed)
    phi_pad = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()).astype(np.float32)), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    b_int = geometry.work_area(b, ext)
    lowers = []
    for _ in range(n_lower):
        l = geometry.zero_boundary(
            jnp.asarray(rng.normal(size=cfg.padded_size()).astype(np.float32)), ext
        )
        l = l / jnp.sqrt(jnp.sum(l * l))
        lowers.append(l)
    return cfg, ext, phi_pad, v, a, b, b_int, lowers


def _kgs_inputs(cfg, ext, phi_pad, b_int, lowers, order="ThreePoint"):
    """Build the kgs chunk inputs: K=2 layouts, swept lowers, Gram mats."""
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = cfg.grid.dt / (k * cfg.grid.dn ** 2 * cfg.mass)
    sls = []
    for l in lowers:
        sl_x, _n2, _ov = pk.evolve_step_fused(
            pk.to_xpad(l, ext), b_int, None, order, scale, 0, False, True
        )
        sls.append(pk.from_xpad(sl_x, ext))
    store2 = (
        jnp.stack([pk.to_xpad_k(w, ext, 2) for w in list(lowers) + sls])
        if lowers
        else None
    )
    if lowers:
        l_flat = jnp.stack([w.reshape(-1) for w in lowers])
        sl_flat = jnp.stack([w.reshape(-1) for w in sls])
        gram_g = sl_flat @ sl_flat.T
        gram_h = l_flat @ sl_flat.T
    else:
        gram_g = gram_h = None
    b_xpad = pk.b_to_xpad_k(b_int, ext, 2)
    return pk.to_xpad_k(phi_pad, ext, 2), b_xpad, store2, gram_g, gram_h


@pytest.mark.parametrize("n_lower", [1, 2])
def test_kgs_matches_one_step_fused(n_lower):
    """K=2 GS-fused chunk == the 1-step carried-coefficient fused chunk
    (same joint-projection semantics) to f32 rounding, interpret mode."""
    order = "ThreePoint"
    cfg, ext, phi_pad, v, a, b, b_int, lowers = _kgs_setup(n_lower)
    store_x = jnp.stack([pk.to_xpad(w, ext) for w in lowers])
    ref = pk.from_xpad(
        pk.evolve_chunk_fused(
            pk.to_xpad(phi_pad, ext), b_int, store_x, order,
            cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, n_lower, interpret=True,
        ),
        ext,
    )
    phi2, b_xpad, store2, gram_g, gram_h = _kgs_inputs(cfg, ext, phi_pad, b_int, lowers)
    out = pk.from_xpad_k(
        pk.evolve_chunk_fused_kgs(
            phi2, b_xpad, store2, gram_g, gram_h, order,
            cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, n_lower, interpret=True,
        ),
        ext,
        2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=1e-5)


def test_kgs_matches_xla_sequential():
    """K=2 GS-fused chunk == the XLA per-step normalise+project sweep
    (the reference semantics, src/grid.rs:674-681), one stored state."""
    from wafer_tpu.ops import stencil

    order = "ThreePoint"
    cfg, ext, phi_pad, v, a, b, b_int, lowers = _kgs_setup(1, seed=22)
    stacked = jnp.stack(lowers)
    ref = np.asarray(
        geometry.work_area(
            stencil.evolve_chunk(
                phi_pad, a, b, stacked, order, cfg.grid.dt, cfg.grid.dn,
                cfg.mass, 4, 1,
            ),
            ext,
        )
    )
    phi2, b_xpad, store2, gram_g, gram_h = _kgs_inputs(cfg, ext, phi_pad, b_int, lowers)
    out = np.asarray(
        geometry.work_area(
            pk.from_xpad_k(
                pk.evolve_chunk_fused_kgs(
                    phi2, b_xpad, store2, gram_g, gram_h, order,
                    cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 1, interpret=True,
                ),
                ext,
                2,
            ),
            ext,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-5)


def test_kgs_per_step_norm_ground():
    """S=0 variant: per-step-renormalised ground chunk (the f32 scale-drift
    guard) at two steps per HBM pass == XLA per_step_norm chunk."""
    from wafer_tpu.ops import stencil

    order = "ThreePoint"
    cfg, ext, phi_pad, v, a, b, b_int, _ = _kgs_setup(0, seed=23)
    ref = np.asarray(
        geometry.work_area(
            stencil.evolve_chunk(
                phi_pad, a, b, None, order, cfg.grid.dt, cfg.grid.dn,
                cfg.mass, 4, 0, per_step_norm=True,
            ),
            ext,
        )
    )
    phi2, b_xpad, _s, _g, _h = _kgs_inputs(cfg, ext, phi_pad, b_int, [])
    out = np.asarray(
        geometry.work_area(
            pk.from_xpad_k(
                pk.evolve_chunk_fused_kgs(
                    phi2, b_xpad, None, None, None, order,
                    cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 0, interpret=True,
                ),
                ext,
                2,
            ),
            ext,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-5)


def test_kgs_analytic_b():
    """Analytic-B kgs (no B stream) == streamed-B kgs, interpret mode."""
    order = "ThreePoint"
    cfg, ext, phi_pad, v, a, b, b_int, lowers = _kgs_setup(1, seed=24)
    phi2, b_xpad, store2, gram_g, gram_h = _kgs_inputs(cfg, ext, phi_pad, b_int, lowers)
    ref = np.asarray(
        pk.evolve_chunk_fused_kgs(
            phi2, b_xpad, store2, gram_g, gram_h, order,
            cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 1, interpret=True,
        )
    )
    g = cfg.grid
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)
    out = np.asarray(
        pk.evolve_chunk_fused_kgs(
            phi2, None, store2, gram_g, gram_h, order,
            cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 1,
            analytic=analytic, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


# --------------------------------------------------------------------------- #
# y-tiled variant (yt): large planes streamed in sublane chunks
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("order", ["ThreePoint", "SevenPoint"])
def test_yt_kernel_matches_xla(monkeypatch, order):
    """y-tiled slab streaming (supersedes zt for large planes: 8-sublane
    halo granularity instead of 128-lane), forced by disabling the plain
    picker; ground + excited chunks vs the XLA reference."""
    monkeypatch.setattr(pk, "_pick_tx", lambda *a: None)
    monkeypatch.setattr(pk, "_pick_tx_yt", lambda *a, **k: (4, 16))

    n = 8 if order == "ThreePoint" else 16
    cfg = base_config(
        precision="f32",
        central_difference=order,
        grid={"size": {"x": n, "y": 32, "z": 128}, "dn": 0.2, "dt": 0.005},
    )
    ext = cfg.central_difference.ext
    rng = np.random.default_rng(31)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    ref = stencil.evolve_chunk(
        phi, a, b, None, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 0
    )
    out = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), geometry.work_area(b, ext), None, order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 4, 0, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5, atol=2e-6
    )

    # excited state with the carried-coef correction
    lower = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    lower = lower / jnp.sqrt(gram_schmidt.get_norm_squared(lower)).astype(jnp.float32)
    ref2 = stencil.evolve_chunk(
        phi, a, b, jnp.stack([lower]), order, cfg.grid.dt, cfg.grid.dn,
        cfg.mass, 3, 1,
    )
    out2 = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), geometry.work_area(b, ext),
        jnp.stack([pk.to_xpad(lower, ext)]), order,
        cfg.grid.dt, cfg.grid.dn, cfg.mass, 3, 1, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out2, ext)), np.asarray(ref2), rtol=5e-4, atol=2e-5
    )


def test_yt_kernel_analytic_b(monkeypatch):
    """Analytic-B yt (no B stream) == streamed-B yt, with a shard x-origin."""
    monkeypatch.setattr(pk, "_pick_tx", lambda *a: None)
    monkeypatch.setattr(pk, "_pick_tx_yt", lambda *a, **k: (4, 16))

    cfg = base_config(
        precision="f32",
        grid={"size": {"x": 8, "y": 32, "z": 128}, "dn": 0.2, "dt": 0.005},
    )
    ext = 1
    order = "ThreePoint"
    rng = np.random.default_rng(32)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    _a, b = pmod.build_ab(v, cfg.grid.dt)
    b_int = geometry.work_area(b.astype(jnp.float32), ext)
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = cfg.grid.dt / (k * cfg.grid.dn ** 2 * cfg.mass)

    ref, n2r, _ = pk.evolve_step_fused(
        pk.to_xpad(phi, ext), b_int, None, order, scale, 0, True, True
    )
    g = cfg.grid
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)
    out, n2o, _ = pk.evolve_step_fused(
        pk.to_xpad(phi, ext), None, None, order, scale, 0, True, True,
        analytic=analytic,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)
    assert abs(float(n2o) - float(n2r)) < 1e-4 * abs(float(n2r))


def test_kgs_degenerate_start_stays_finite():
    """A kgs chunk starting from ψ nearly parallel to the stored state (the
    excited-state clone-start regime) must not NaN: the reconstructed
    post-projection norm² catastrophically cancels in f32 and is floored
    by kgs_coef_update's guard (round-2 regression)."""
    order = "ThreePoint"
    cfg, ext, phi_pad, v, a, b, b_int, lowers = _kgs_setup(1, seed=41)
    l = lowers[0]
    # ψ = l + tiny noise — the pathological near-parallel start
    rng = np.random.default_rng(42)
    noise = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()).astype(np.float32)), ext
    )
    psi = l + 3e-6 * noise
    phi2, b_xpad, store2, gram_g, gram_h = _kgs_inputs(cfg, ext, psi, b_int, lowers)
    out = np.asarray(
        pk.evolve_chunk_fused_kgs(
            phi2, b_xpad, store2, gram_g, gram_h, order,
            cfg.grid.dt, cfg.grid.dn, cfg.mass, 6, 1, interpret=True,
        )
    )
    assert np.isfinite(out).all()
    # and the result is orthogonal to the stored state after projection
    w = pk.from_xpad_k(jnp.asarray(out), ext, 2)
    w = w / jnp.sqrt(jnp.sum(w * w))
    assert abs(float(jnp.sum(w * l))) < 1e-2


def test_k_fused_chunk_remainder_steps():
    """evolve_chunk_fused_k with n_steps not a multiple of K runs the
    remainder as in-chunk 1-step sweeps — exact chunk cadence preserved."""
    order = "ThreePoint"
    cfg = base_config(
        precision="f32",
        grid={"size": {"x": 16, "y": 8, "z": 128}, "dn": 0.2, "dt": 0.01},
    )
    ext = 1
    rng = np.random.default_rng(51)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()).astype(np.float32)), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    b_int = geometry.work_area(b, ext)
    ref = np.asarray(
        geometry.work_area(
            stencil.evolve_chunk(
                phi, a, b, None, order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 7, 0
            ),
            ext,
        )
    )
    for analytic in (None, ("Harmonic", cfg.grid.dn, cfg.grid.dt, cfg.mass,
                            16, 8, 128)):
        out = np.asarray(
            geometry.work_area(
                pk.from_xpad_k(
                    pk.evolve_chunk_fused_k(
                        pk.to_xpad_k(phi, ext, 3),
                        None if analytic else pk.b_to_xpad_k(b_int, ext, 3),
                        order, cfg.grid.dt, cfg.grid.dn, cfg.mass, 7, 3,
                        analytic=analytic, interpret=True,
                    ),
                    ext, 3,
                ),
                ext,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


# --------------------------------------------------------------------------- #
# VMEM-resident chunk kernel
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("order", ["ThreePoint", "FivePoint", "SevenPoint"])
def test_resident_chunk_matches_xla(order):
    """Whole-chunk VMEM-resident in-place sweep == n_steps XLA sweeps."""
    cfg, ext, phi, a, b = _setup(order)
    g = cfg.grid
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, g.dt, g.dn, cfg.mass, 5, 0
    )
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 5, analytic,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "pot", ["Coulomb", "SimpleCornell", "Periodic", "NoPotential"]
)
def test_resident_chunk_all_analytic_kinds(pot):
    """Hoisted-B (Periodic/NoPotential) and generic-B (Coulomb/Cornell)
    resident paths vs the XLA sweep."""
    cfg = base_config(
        precision="f32",
        potential=pot,
        grid={"size": {"x": 16, "y": 16, "z": 16}, "dn": 0.2, "dt": 0.004},
    )
    ext, order = 1, "ThreePoint"
    rng = np.random.default_rng(7)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    g = cfg.grid
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, g.dt, g.dn, cfg.mass, 4, 0
    )
    analytic = (pot, g.dn, g.dt, cfg.mass, 16, 16, 16, cfg.sig)
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 4, analytic,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5,
        atol=2e-6,
    )


def test_resident_chunk_with_gauge_shift():
    """vshift in the analytic tuple must match shifted array factors."""
    cfg = base_config(
        precision="f32",
        potential="SimpleCornell",
        mass=4.65,
        sig=0.223,
        grid={"size": {"x": 16, "y": 16, "z": 16}, "dn": 0.35, "dt": 0.004},
    )
    ext, order = 1, "ThreePoint"
    rng = np.random.default_rng(9)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    vshift = float(jnp.min(v))
    a, b = pmod.build_ab(v, cfg.grid.dt, v_shift=vshift)
    g = cfg.grid
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, g.dt, g.dn, cfg.mass, 3, 0
    )
    analytic = (
        "SimpleCornell", g.dn, g.dt, cfg.mass, 16, 16, 16, cfg.sig, vshift
    )
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 3, analytic,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5,
        atol=2e-6,
    )


def test_resident_supported_gating():
    # streamed-B (no analytic formula) is supported too
    assert pk.resident_supported(256, 256, 256, 1, 4, False)
    # f32 only
    assert not pk.resident_supported(256, 256, 256, 1, 8, True)
    # 256³ fits the default budget; 512³ does not
    assert pk.resident_supported(256, 256, 256, 1, 4, True)
    assert not pk.resident_supported(512, 512, 512, 1, 4, True)
    # a prime NX works via the remainder slab (13 = 8 + 5, 5 > ext)
    assert pk.resident_supported(13, 256, 256, 1, 4, True)
    # but a too-thin grid has no slab plan at all
    assert not pk.resident_supported(4, 256, 256, 3, 4, True)


def test_resident_per_step_norm_matches_carried_coef():
    """Resident drift-guard (in-SMEM carried inverse norm) vs the 1-step
    carried-coefficient path, and vs the XLA per-step-normalised chunk."""
    cfg, ext, phi, a, b = _setup("ThreePoint")
    order, g = "ThreePoint", cfg.grid
    b_int = geometry.work_area(b, ext)
    ref = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), b_int, None, order, g.dt, g.dn, cfg.mass, 6, 0,
        interpret=True, per_step_norm=True,
    )
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 6, analytic,
        interpret=True, per_step_norm=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=2e-6
    )
    # and against the XLA chunk with per-step normalisation
    ref_xla = stencil.evolve_chunk(
        phi, a, b, None, order, g.dt, g.dn, cfg.mass, 6, 0, per_step_norm=True
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)),
        np.asarray(ref_xla),
        rtol=3e-5,
        atol=2e-6,
    )


@pytest.mark.parametrize("n_lower", [1, 2])
def test_resident_excited_matches_one_step_fused(n_lower):
    """ψ-resident excited path (streamed l/Sl windows, in-SMEM coefficient
    recursion) vs the 1-step carried-coefficient kernel — same per-step
    normalise+project semantics (src/grid.rs:674-681)."""
    cfg, ext, phi, a, b = _setup("ThreePoint")
    order, g = "ThreePoint", cfg.grid
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = g.dt / (k * g.dn ** 2 * cfg.mass)
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)

    rng = np.random.default_rng(17)
    lowers = []
    for _ in range(n_lower):
        w = geometry.zero_boundary(
            jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32),
            ext,
        )
        w = w / jnp.sqrt(gram_schmidt.get_norm_squared(w)).astype(jnp.float32)
        lowers.append(w)
    store_x = jnp.stack([pk.to_xpad(w, ext) for w in lowers])
    sls = []
    for w in lowers:
        sl, _n2, _ov = pk.evolve_step_fused(
            pk.to_xpad(w, ext), None, None, order, scale, 0, False,
            interpret=True, analytic=analytic,
        )
        sls.append(sl)
    sstore_x = jnp.stack(sls)

    ref = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), None, store_x, order, g.dt, g.dn, cfg.mass,
        5, n_lower, interpret=True, analytic=analytic,
    )
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 5, analytic,
        interpret=True, store_xpad=store_x, sstore_xpad=sstore_x,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-6
    )
    # orthogonality to the store is enforced to f32 noise
    for w in lowers:
        ov = float(jnp.sum(pk.from_xpad(out, ext) * w))
        n2 = float(gram_schmidt.get_norm_squared(pk.from_xpad(out, ext)))
        assert abs(ov) < 5e-4 * np.sqrt(n2), ov


def test_resident_streamed_b_matches_xla():
    """analytic=None + b_int: B streams from HBM per slab — ground,
    per-step-norm, and excited variants vs their references."""
    cfg, ext, phi, a, b = _setup("ThreePoint")
    order, g = "ThreePoint", cfg.grid
    b_int = geometry.work_area(b, ext)

    ref = stencil.evolve_chunk(
        phi, a, b, None, order, g.dt, g.dn, cfg.mass, 5, 0
    )
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 5, None,
        interpret=True, b_int=b_int,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5,
        atol=1e-6,
    )

    ref_n = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), b_int, None, order, g.dt, g.dn, cfg.mass, 4, 0,
        interpret=True, per_step_norm=True,
    )
    out_n = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 4, None,
        interpret=True, per_step_norm=True, b_int=b_int,
    )
    np.testing.assert_allclose(
        np.asarray(out_n), np.asarray(ref_n), rtol=3e-5, atol=2e-6
    )

    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = g.dt / (k * g.dn ** 2 * cfg.mass)
    rng = np.random.default_rng(23)
    lower = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    lower = lower / jnp.sqrt(gram_schmidt.get_norm_squared(lower)).astype(
        jnp.float32
    )
    store_x = jnp.stack([pk.to_xpad(lower, ext)])
    sl, _n2, _ov = pk.evolve_step_fused(
        pk.to_xpad(lower, ext), b_int, None, order, scale, 0, False,
        interpret=True,
    )
    sstore_x = jnp.stack([sl])
    ref_e = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), b_int, store_x, order, g.dt, g.dn, cfg.mass,
        4, 1, interpret=True,
    )
    out_e = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 4, None,
        interpret=True, store_xpad=store_x, sstore_xpad=sstore_x,
        b_int=b_int,
    )
    np.testing.assert_allclose(
        np.asarray(out_e), np.asarray(ref_e), rtol=5e-4, atol=5e-6
    )


def test_resident_remainder_slab():
    """NX not divisible by any slab height: the trailing short slab must
    produce the same trajectory (here 24 = 16 + 8 at tx=16, and a prime
    via zero-padding the x extent is covered by solver-level gating)."""
    cfg = base_config(
        precision="f32",
        potential="Harmonic",
        grid={"size": {"x": 24, "y": 16, "z": 16}, "dn": 0.2, "dt": 0.004},
    )
    ext, order = 1, "ThreePoint"
    rng = np.random.default_rng(3)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    g = cfg.grid
    ref = stencil.evolve_chunk(
        phi, a, b, None, order, g.dt, g.dn, cfg.mass, 4, 0
    )
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, 24, 16, 16)
    assert pk._pick_tx_res(24, 1) == 16  # 24 = 16 + 8: remainder slab
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 4, analytic,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad(out, ext)), np.asarray(ref), rtol=2e-5,
        atol=2e-6,
    )


@pytest.mark.parametrize("order", ["FivePoint", "SevenPoint"])
def test_resident_excited_higher_orders(order):
    """Excited resident path at ext=2/3: the l/Sl window DMA and lag slices
    must hold at wider halos."""
    cfg, ext, phi, a, b = _setup(order)
    g = cfg.grid
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = g.dt / (k * g.dn ** 2 * cfg.mass)
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)

    rng = np.random.default_rng(29)
    w = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    w = w / jnp.sqrt(gram_schmidt.get_norm_squared(w)).astype(jnp.float32)
    store_x = jnp.stack([pk.to_xpad(w, ext)])
    sl, _n2, _ov = pk.evolve_step_fused(
        pk.to_xpad(w, ext), None, None, order, scale, 0, False,
        interpret=True, analytic=analytic,
    )
    sstore_x = jnp.stack([sl])

    ref = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), None, store_x, order, g.dt, g.dn, cfg.mass,
        4, 1, interpret=True, analytic=analytic,
    )
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 4, analytic,
        interpret=True, store_xpad=store_x, sstore_xpad=sstore_x,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-6
    )


@pytest.mark.parametrize("order", ["FivePoint", "SevenPoint"])
def test_resident_per_step_norm_higher_orders(order):
    cfg, ext, phi, a, b = _setup(order)
    g = cfg.grid
    b_int = geometry.work_area(b, ext)
    ref = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), b_int, None, order, g.dt, g.dn, cfg.mass, 4, 0,
        interpret=True, per_step_norm=True,
    )
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 4, analytic,
        interpret=True, per_step_norm=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-6
    )


# --------------------------------------------------------------------------- #
# x-blocked deep-halo resident kernel (HBM-sized grids, VERDICT r2 #1)
# --------------------------------------------------------------------------- #
#
# The machinery is size-invariant (the block/ghost geometry is the same at
# 32 rows as at 512), so interpret-mode equivalence runs on small grids with
# forced (bx, r) plans standing in for the >VMEM production shapes.


def _resb_setup(order, nx=32, ny=8, nz=128, kind="Harmonic",
                dn=0.1, dt=2e-3, mass=1.0, seed=3):
    ext = pk._EXT[order]
    an = (kind, dn, dt, mass, nx, ny, nz, 1.0)
    rng = np.random.default_rng(seed)
    phi = np.zeros((nx + 2 * ext, ny + 2 * ext, nz + 2 * ext), np.float32)
    phi[ext:-ext, ext:-ext, ext:-ext] = rng.normal(
        size=(nx, ny, nz)
    ).astype(np.float32)
    return ext, an, jnp.asarray(phi)


@pytest.mark.parametrize("order,bx,r", [
    ("ThreePoint", 8, 2),
    ("ThreePoint", 16, 4),
    ("FivePoint", 16, 2),
    ("SevenPoint", 16, 2),
])
def test_resident_blocked_matches_fused_chunk(order, bx, r):
    """Blocked deep-halo passes are trajectory-equivalent to the 1-step
    fused sweep (itself XLA-equivalence-tested) — interior blocks, edge
    blocks, and the blind ghost-zone sweep all exercised (nx/bx ≥ 2)."""
    ext, an, phi = _resb_setup(order)
    dn, dt, mass = an[1], an[2], an[3]
    n_steps = 2 * r
    ref = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), None, None, order, dt, dn, mass, n_steps, 0,
        interpret=True, analytic=an,
    )
    out = pk.evolve_chunk_resident_blocked(
        pk.to_xpad_k(phi, ext, r), order, dt, dn, mass, n_steps, an,
        bx=bx, r_steps=r, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad_k(out, ext, r)),
        np.asarray(pk.from_xpad(ref, ext)),
        rtol=3e-6, atol=2e-6,
    )


def test_resident_blocked_prefetch_matches_serial():
    """The opt-in two-buffer ping-pong schedule (WAFER_RESB_PREFETCH=1 —
    measured at/below the serial schedule on v5e, kept for future
    hardware) must stay trajectory-identical to the serial default."""
    order, bx, r = "ThreePoint", 8, 2
    ext, an, phi = _resb_setup(order)
    dn, dt, mass = an[1], an[2], an[3]
    base = pk.evolve_chunk_resident_blocked(
        pk.to_xpad_k(phi, ext, r), order, dt, dn, mass, 2 * r, an,
        bx=bx, r_steps=r, interpret=True,
    )
    pp = pk.evolve_chunk_resident_blocked(
        pk.to_xpad_k(phi, ext, r), order, dt, dn, mass, 2 * r, an,
        bx=bx, r_steps=r, interpret=True, prefetch=True,
    )
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(base))


def test_resident_blocked_remainder_steps():
    """n_steps not divisible by R: the remainder runs as in-chunk 1-step
    sweeps — exact reference cadence (src/grid.rs:544-687)."""
    order, bx, r = "ThreePoint", 8, 3
    ext, an, phi = _resb_setup(order)
    dn, dt, mass = an[1], an[2], an[3]
    ref = pk.evolve_chunk_fused(
        pk.to_xpad(phi, ext), None, None, order, dt, dn, mass, 7, 0,
        interpret=True, analytic=an,
    )
    out = pk.evolve_chunk_resident_blocked(
        pk.to_xpad_k(phi, ext, r), order, dt, dn, mass, 7, an,
        bx=bx, r_steps=r, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad_k(out, ext, r)),
        np.asarray(pk.from_xpad(ref, ext)),
        rtol=3e-6, atol=2e-6,
    )


def test_resident_blocked_matches_xla_arrays():
    """End-to-end vs the XLA shifted-slice sweep with array A/B (the
    reference rule, src/grid.rs:544-687): the analytic-B blocked kernel
    reproduces the array-factor trajectory to f32 rounding."""
    order, bx, r = "ThreePoint", 8, 2
    cfg = base_config(
        precision="f32",
        potential="Harmonic",
        grid={"size": {"x": 32, "y": 8, "z": 128}, "dn": 0.1, "dt": 2e-3},
    )
    ext = 1
    rng = np.random.default_rng(11)
    phi = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32), ext
    )
    v = pmod.generate(cfg).astype(jnp.float32)
    a, b = pmod.build_ab(v, cfg.grid.dt)
    ref = phi
    for _ in range(4):
        ref = stencil.evolve_step(
            ref, a.astype(jnp.float32), b.astype(jnp.float32), order,
            cfg.grid.dt, cfg.grid.dn, cfg.mass,
        )
    g = cfg.grid
    an = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)
    out = pk.evolve_chunk_resident_blocked(
        pk.to_xpad_k(phi, ext, r), order, g.dt, g.dn, cfg.mass, 4, an,
        bx=bx, r_steps=r, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pk.from_xpad_k(out, ext, r)),
        np.asarray(ref),
        rtol=3e-6, atol=2e-6,
    )


def test_pick_resb_plans():
    """Picker sanity: production shapes get multi-block deep-halo plans
    within the resident VMEM budget; grids the whole-array resident kernel
    already covers are the caller's responsibility (solver checks
    resident_supported first)."""
    for (n, e), _ in zip(((512, 1), (288, 1), (512, 3)), range(3)):
        plan = pk.pick_resb(n, n, n, e, 4, 500)
        assert plan is not None, (n, e)
        bx, r, tx, _pf, rate = plan
        assert n % bx == 0 and n // bx >= 2
        assert 2 <= r <= 8
        # the ψ-block cap is blocked-kernel-specific (round 5: deep
        # windows over big blocks measured +19% at 512³), and the full
        # need (block + temporaries) stays under the scoped VMEM cap
        assert (bx + 2 * r * e) * n * n * 4 <= pk._RESB_PSI_CAP
        assert (
            (bx + 2 * r * e + e + r * e + 6 * tx) * n * n * 4
            <= pk._RESB_NEED_CAP
        )
    # f64 and non-divisible sizes decline
    assert pk.pick_resb(512, 512, 512, 1, 8, 500) is None
    assert pk.pick_resb(7, 8, 128, 1, 4, 500) is None


def test_resident_exc_bf16_streams():
    """bf16 l/Sl streams (half the HBM bytes): the trajectory matches the
    f32-stream resident path to bf16 quantisation level, and the per-step
    projection still orthogonalises ψ against the *true* f32 store to well
    below f32 convergence noise (VERDICT r2 #5)."""
    cfg, ext, phi, a, b = _setup("ThreePoint")
    order, g = "ThreePoint", cfg.grid
    _o, _c, _cc, k = geometry.stencil_coefficients(order)
    scale = g.dt / (k * g.dn ** 2 * cfg.mass)
    analytic = ("Harmonic", g.dn, g.dt, cfg.mass, g.size.x, g.size.y, g.size.z)

    rng = np.random.default_rng(23)
    w = geometry.zero_boundary(
        jnp.asarray(rng.normal(size=cfg.padded_size()), dtype=jnp.float32),
        ext,
    )
    w = w / jnp.sqrt(gram_schmidt.get_norm_squared(w)).astype(jnp.float32)
    store_x = jnp.stack([pk.to_xpad(w, ext)])
    sl, _n2, _ov = pk.evolve_step_fused(
        pk.to_xpad(w, ext), None, None, order, scale, 0, False,
        interpret=True, analytic=analytic,
    )
    sstore_x = jnp.stack([sl])

    ref = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 5, analytic,
        interpret=True, store_xpad=store_x, sstore_xpad=sstore_x,
    )
    out = pk.evolve_chunk_resident(
        pk.to_xpad(phi, ext), order, g.dt, g.dn, cfg.mass, 5, analytic,
        interpret=True,
        store_xpad=store_x.astype(jnp.bfloat16),
        sstore_xpad=sstore_x.astype(jnp.bfloat16),
    )
    # trajectory agrees to bf16-quantisation level
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-2, atol=2e-3
    )
    # the projection against the quantised store still kills the true-store
    # component to ~|δl|/√N ≪ f32 convergence noise
    out_full = pk.from_xpad(out, ext)
    n2 = float(gram_schmidt.get_norm_squared(out_full))
    ov = float(jnp.sum(out_full * w))
    assert abs(ov) < 1e-3 * np.sqrt(n2), ov
