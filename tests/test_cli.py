"""CLI surface tests: output-line parity with the reference
(src/main.cpp:28,44-51; progress format regex from runExperiments.py:46)
and dump/plot tooling (Vector3::dump / plotter.py parity)."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from gpusolve_tpu.utils.dump import (
    analytic_solution,
    compare_analytic,
    dump_field,
    load_dump,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_conf(tmp_path, mode, dim=15, maxiter=3):
    conf = tmp_path / "test.conf"
    conf.write_text(
        f"{maxiter}\n1e-5\n{dim}\n{dim}\n{dim}\n{mode}\n3\n3\n0.8\n1.0\n"
        "6 -1 -1 -1 -1 -1 -1\n"
        "0 1 -1 0 0 0 0\n"
        "0 0 0 1 -1 0 0\n"
        "0 0 0 0 0 1 -1\n"
    )
    return str(conf)


def run_cli(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The axon plugin overrides JAX_PLATFORMS; force via jax config instead.
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; from gpusolve_tpu.cli import main; "
        "sys.exit(main(sys.argv[1:]))"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=300,
    )


def test_cli_linear_progress_format(tmp_path):
    conf = write_conf(tmp_path, mode=0)
    r = run_cli([conf])
    assert r.returncode == 0, r.stderr
    assert f"Using config file {conf}" in r.stdout
    assert "Solving linear problem" in r.stdout
    assert re.search(r"Inital residual: [\d.e+-]+", r.stdout)
    # The exact pattern the reference experiment harness parses
    # (runExperiments.py:46).
    matches = re.findall(
        r"iter: (\d+) residual: ([\d\.e-]+) Took (\d+)ms", r.stdout
    )
    assert len(matches) == 3


def test_cli_newton_progress_format(tmp_path):
    conf = write_conf(tmp_path, mode=2, maxiter=2)
    r = run_cli([conf])
    assert r.returncode == 0, r.stderr
    assert "Solving newton problem" in r.stdout
    assert re.search(r"Inital newton residual: [\d.e+-]+", r.stdout)
    assert re.search(
        r"newton iter: \d+ residual: [\d\.e-]+ Took \d+ms", r.stdout
    )


def test_cli_missing_file():
    r = run_cli(["/nonexistent/path.conf"])
    assert r.returncode == 1
    assert "does not exist or is not a file" in r.stderr


def test_cli_dump_validate(tmp_path):
    conf = write_conf(tmp_path, mode=1, maxiter=8)
    dump_path = str(tmp_path / "v.txt")
    r = run_cli([conf, "--dump", dump_path, "--validate", "--quiet"])
    assert r.returncode == 0, r.stderr
    m = re.search(r"max-abs error vs analytic solution: ([\d.e+-]+)", r.stdout)
    assert m, r.stdout
    assert float(m.group(1)) < 5e-3  # 15^3 grid, coarse h
    # Dump round-trips and is plotter.py-compatible.
    mesh = load_dump(dump_path)
    assert mesh.shape == (17, 17, 17)
    assert compare_analytic(mesh, 1.0 / 16.0) < 5e-3


def test_dump_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 4, 3))
    path = str(tmp_path / "f.txt")
    dump_field(a, path)
    b = load_dump(path)
    np.testing.assert_allclose(a, b, rtol=1e-15)
    # Header format matches Vector3::dump (src/cpu/Vector3.cpp:63-64).
    assert open(path).readline() == "5 4 3\n"


def test_analytic_solution_zero_on_boundary():
    u = analytic_solution((17, 17, 17), 1.0 / 16.0)
    assert np.allclose(u[0], 0) and np.allclose(u[-1], 0)
