"""Complex-ψ propagation: the capability the reference stubs out
(src/potential.rs:222,271 return real; src/grid.rs:311,566 lack conjugation).

Oracle: V = (1 + iγ)·r²/2 is an exactly solvable complex harmonic
oscillator — eigenvalues E_n = (n + 3/2)·√((1+iγ)/m). Imaginary-time
evolution converges to the eigenstate whose eigenvalue has the lowest real
part, and the measured complex energy must match both Re and Im of the
analytic value.
"""

import cmath

import numpy as np
import pytest

from tests.conftest import base_config
from wafer_tpu import solver
from wafer_tpu.io import run_dir


def test_complex_harmonic_ground_state(tmp_run):
    gamma = 0.2
    cfg = base_config(
        potential="ComplexHarmonic",
        absorb=gamma,
        grid={"size": {"x": 32, "y": 32, "z": 32}, "dn": 0.2, "dt": 0.01},
        tolerance=1e-8,
        mass=1.0,
        init_condition="Constant",
        output={"screen_update": 200, "file_type": "Json"},
        max_steps=100000,
    )
    run_dir.check_output_dir(cfg.project_name)
    results = solver.run(cfg)
    res = results[0]
    e = res.observables.energy / res.observables.norm2
    assert isinstance(e, complex)
    expected = 1.5 * cmath.sqrt(1 + 1j * gamma)
    assert abs(e.real - expected.real) < 0.01, (e, expected)
    assert abs(e.imag - expected.imag) < 0.01, (e, expected)


def test_complex_zero_absorb_matches_real(tmp_run):
    """γ=0 must reproduce the real harmonic result exactly (the reference's
    ComplexHarmonic behaviour) while propagating a complex dtype."""
    common = dict(
        grid={"size": {"x": 16, "y": 16, "z": 16}, "dn": 0.3, "dt": 0.02},
        tolerance=1e-7,
        mass=1.0,
        init_condition="Constant",
        output={"screen_update": 100, "file_type": "Json"},
        max_steps=100000,
    )
    run_dir.check_output_dir("test")
    r_real = solver.run(base_config(potential="Harmonic", **common))[0]
    r_cplx = solver.run(base_config(potential="ComplexHarmonic", **common))[0]
    e_real = r_real.observables.energy / r_real.observables.norm2
    e_cplx = r_cplx.observables.energy / r_cplx.observables.norm2
    assert abs(e_cplx.imag) < 1e-10
    assert abs(e_cplx.real - e_real) < 1e-8


def test_complex_observables_file_output(tmp_run):
    """Complex runs surface Im(E) in the summary dict."""
    from wafer_tpu.io import writers
    from wafer_tpu.ops.observables import Observables

    run_dir.check_output_dir("cplx")
    obs = Observables(energy=1.5 + 0.25j, norm2=1.0, v_infinity=0.0, r2=4.0)
    from wafer_tpu.config import FileType

    out = writers.finalise_measurement(obs, 0, 16.0, "cplx", FileType.JSON)
    assert out["energy"] == 1.5
    assert out["energy_im"] == 0.25


def test_split_complex_path_matches_native(tmp_run, monkeypatch):
    """The split-complex fallback (for backends without complex dtypes)
    reproduces the native complex path's converged energy."""
    from wafer_tpu.ops import split_complex as sc

    gamma = 0.2
    common = dict(
        potential="ComplexHarmonic",
        absorb=gamma,
        grid={"size": {"x": 16, "y": 16, "z": 16}, "dn": 0.3, "dt": 0.02},
        tolerance=1e-7,
        mass=1.0,
        init_condition="Constant",
        output={"screen_update": 100, "file_type": "Json"},
        max_steps=100000,
    )
    run_dir.check_output_dir("test")
    native = solver.run(base_config(**common))[0]
    e_native = native.observables.energy / native.observables.norm2

    monkeypatch.setattr(sc, "backend_supports_complex", lambda: False)
    split = solver.run(base_config(**common))[0]
    e_split = split.observables.energy / split.observables.norm2

    assert abs(e_split.real - e_native.real) < 1e-6
    assert abs(e_split.imag - e_native.imag) < 1e-6
