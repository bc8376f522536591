"""Initial conditions and symmetrisation (src/config.rs:577-728)."""

import math

import jax.numpy as jnp
import numpy as np

from tests.conftest import base_config
from wafer_tpu.models import initial


def test_constant_ic():
    cfg = base_config(init_condition="Constant")
    w = np.asarray(initial.set_initial_conditions(cfg))
    assert w.shape == cfg.padded_size()
    assert w[5, 5, 5] == 0.1
    # Dirichlet shell
    assert np.all(w[0] == 0) and np.all(w[:, 0] == 0) and np.all(w[..., -1] == 0)


def test_boolean_ic():
    """1 exactly where all indices are odd (src/config.rs:676-683)."""
    cfg = base_config(init_condition="Boolean")
    w = np.asarray(initial.set_initial_conditions(cfg))
    assert w[3, 5, 7] == 1.0
    assert w[2, 5, 7] == 0.0
    assert w[3, 4, 7] == 0.0
    assert w[3, 5, 6] == 0.0


def test_gaussian_ic_statistics():
    cfg = base_config(
        init_condition="Gaussian", sig=2.0, grid={"size": {"x": 24, "y": 24, "z": 24}}
    )
    w = np.asarray(initial.set_initial_conditions(cfg, seed=42))
    interior = w[1:-1, 1:-1, 1:-1]
    assert abs(interior.std() - 2.0) < 0.1
    assert abs(interior.mean()) < 0.1


def test_coulomb_ic_formula():
    cfg = base_config(init_condition="Coulomb", mass=2.0)
    w = np.asarray(initial.set_initial_conditions(cfg))
    init_size = cfg.padded_size()
    dn, m = cfg.grid.dn, cfg.mass
    idx = (4, 7, 11)
    dx = idx[0] - init_size[0] / 2.0
    dy = idx[1] - init_size[1] / 2.0
    dz = idx[2] - init_size[2] / 2.0
    r = dn * math.sqrt(dx * dx + dy * dy + dz * dz)
    costheta = dn * dz / r
    cosphi = dn * dx / r
    mr2 = math.exp(-m * r / 2.0)
    expected = (
        math.exp(-m * r)
        + (2.0 - m * r) * mr2
        + m * r * mr2 * costheta
        + m * r * mr2 * math.sqrt(1.0 - costheta ** 2) * cosphi
    )
    assert abs(w[idx] - expected) < 1e-12


def test_coulomb_ic_centre_is_finite():
    """Reference divides 0/0 at the exact centre; we take the r→0 limit."""
    cfg = base_config(init_condition="Coulomb")
    w = np.asarray(initial.set_initial_conditions(cfg))
    assert np.all(np.isfinite(w))
    centre = tuple(s // 2 for s in cfg.padded_size())
    assert w[centre] == 3.0  # exp(0) + (2-0)·exp(0)


def test_symmetrise_about_z_sevenpoint():
    """Mirror semantics about the z mid-plane for the 7-point layout the
    reference hardcodes (src/config.rs:701-713)."""
    cfg = base_config(
        central_difference="SevenPoint",
        init_symmetry="AboutZ",
        grid={"size": {"x": 8, "y": 8, "z": 8}, "dn": 0.1, "dt": 3e-3},
    )
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=cfg.padded_size()))
    out = np.asarray(initial.symmetrise_wavefunction(cfg, w))
    orig = np.asarray(w)
    ext, n = 3, 8
    mid = (ext + n) // 2  # 5
    for p in range(ext, ext + n + 1):
        src = p if p <= mid else ext + n + 1 - p
        # lower half keeps sign·orig; upper half = orig at the mirror
        for y in range(ext, ext + n + 1):
            expected = orig[4, y, src]
            assert out[4, y, p] == expected, (p, src)
    # outside the y write-range: untouched
    np.testing.assert_array_equal(out[:, 0, :], orig[:, 0, :])


def test_symmetrise_antisym_about_y():
    cfg = base_config(
        central_difference="SevenPoint",
        init_symmetry="AntisymAboutY",
        grid={"size": {"x": 8, "y": 8, "z": 8}, "dn": 0.1, "dt": 3e-3},
    )
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=cfg.padded_size()))
    out = np.asarray(initial.symmetrise_wavefunction(cfg, w))
    orig = np.asarray(w)
    ext, n = 3, 8
    mid = (ext + n) // 2
    for p in range(ext, ext + n + 1):
        if p <= mid:
            assert out[4, p, 6] == -orig[4, p, 6]
        else:
            src = ext + n + 1 - p
            assert out[4, p, 6] == orig[4, src, 6]


def test_symmetrise_not_constrained_noop():
    cfg = base_config()
    w = jnp.asarray(np.random.default_rng(5).normal(size=cfg.padded_size()))
    out = initial.symmetrise_wavefunction(cfg, w)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w))


def test_symmetrised_ic_is_symmetric():
    """End-to-end: a symmetrised IC obeys w(z) = w(mirror z) inside."""
    cfg = base_config(
        central_difference="SevenPoint",
        init_condition="Gaussian",
        init_symmetry="AboutZ",
        grid={"size": {"x": 8, "y": 8, "z": 8}, "dn": 0.1, "dt": 3e-3},
    )
    w = np.asarray(initial.set_initial_conditions(cfg, seed=1))
    ext, n = 3, 8
    for p in range(ext, ext + n + 1):
        src = ext + n + 1 - p
        if src < ext or src > ext + n:
            continue
        np.testing.assert_allclose(
            w[:, ext : ext + n + 1, p], w[:, ext : ext + n + 1, src], atol=1e-14
        )
