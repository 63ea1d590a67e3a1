"""Native C++ CPU backend vs the float64 oracle (residual-sequence parity).

The C++ backend (csrc/gpusolve_cpu.cpp) is an independent implementation of
the reference numerics; its per-cycle residual sequences must match the
NumPy oracle to float64 round-off for all three modes.
"""

import numpy as np
import pytest

import oracle as orc
from gpusolve_tpu import cpu_native
from gpusolve_tpu.config import GridParams, Mode, Stencil

pytestmark = pytest.mark.skipif(
    not cpu_native.available(), reason="g++/OpenMP toolchain unavailable"
)


def make_params(mode, dims=(15, 15, 15), maxiter=4, **kw):
    defaults = dict(
        maxiter=maxiter,
        tol=1e-5,
        grid_dim=dims,
        mode=mode,
        pre_smoothing=3,
        post_smoothing=3,
        omega=0.8,
        gamma=1.0,
        stencil=Stencil.poisson_7pt(),
        dtype="float64",
        print_progress=False,
    )
    defaults.update(kw)
    return GridParams(**defaults)


@pytest.mark.parametrize(
    "mode",
    [Mode.LINEAR, Mode.NONLINEAR, Mode.NEWTON],
    ids=["linear", "nonlinear", "newton"],
)
def test_native_matches_oracle(mode):
    p = make_params(mode)
    g = orc.OracleGrid(p)
    expected = (
        orc.newton_solve(g) if mode == Mode.NEWTON else orc.solve(g)
    )
    sol, history = cpu_native.solve_native(p)
    assert len(history) == len(expected)
    np.testing.assert_allclose(history, expected, rtol=1e-9)
    # Solution field parity (interior).
    want = (
        g.levels[0].newton_v if mode == Mode.NEWTON else g.levels[0].v
    )
    np.testing.assert_allclose(
        sol[1:-1, 1:-1, 1:-1],
        want[1:-1, 1:-1, 1:-1],
        rtol=1e-8,
        atol=1e-12,
    )


def test_native_anisotropic_even_dims():
    # Even/anisotropic dims exercise the general (non-nested) transfer paths.
    p = make_params(Mode.LINEAR, dims=(14, 21, 12), maxiter=3)
    expected = orc.solve(orc.OracleGrid(p))
    _, history = cpu_native.solve_native(p)
    np.testing.assert_allclose(history, expected, rtol=1e-9)


def test_native_early_stop():
    p = make_params(Mode.LINEAR, dims=(15, 15, 15), maxiter=20, tol=1e-2)
    _, history = cpu_native.solve_native(p)
    assert len(history) - 1 < 20
    assert history[-1] <= history[0] * 1e-2


def test_native_threads_reported():
    assert cpu_native.num_threads() >= 1


@pytest.mark.parametrize(
    "mode",
    [Mode.LINEAR, Mode.NONLINEAR, Mode.NEWTON],
    ids=["linear", "nonlinear", "newton"],
)
def test_fused_smoother_bit_identical(mode, tmp_path):
    """The temporal-blocked (trapezoid) smoother must be BIT-identical to
    the ping-pong path: Jacobi reads only the previous sweep's values and
    the per-point expression is the same loop body, so the fusion may not
    change a single ulp of the solution field.  GPUSOLVE_CPU_NO_FUSE picks
    the path (read once per process, hence the subprocess).

    The residual *history* is compared at ulp tolerance only: it routes
    through residual_pass's OpenMP ``reduction(+:sumsq)``, whose partial-
    combination order is unspecified and jitters by ~1 ulp run-to-run on
    either path — unrelated to the fusion."""
    import os
    import pickle
    import subprocess
    import sys

    p = make_params(mode, dims=(31, 31, 31), maxiter=3)
    sol_fused, hist_fused = cpu_native.solve_native(p)

    out = tmp_path / "nofuse.pkl"
    code = (
        "import pickle, sys\n"
        "sys.path.insert(0, sys.argv[1]); sys.path.insert(0, sys.argv[2])\n"
        "from gpusolve_tpu import cpu_native\n"
        "from test_cpu_native import make_params\n"
        "from gpusolve_tpu.config import Mode\n"
        f"p = make_params(Mode({int(mode)}), dims=(31, 31, 31), maxiter=3)\n"
        "sol, hist = cpu_native.solve_native(p)\n"
        "pickle.dump((sol, hist), open(sys.argv[3], 'wb'))\n"
    )
    env = dict(os.environ)
    env["GPUSOLVE_CPU_NO_FUSE"] = "1"
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    repo_dir = os.path.dirname(tests_dir)
    r = subprocess.run(
        [sys.executable, "-c", code, repo_dir, tests_dir, str(out)],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    sol_ref, hist_ref = pickle.loads(out.read_bytes())
    np.testing.assert_allclose(hist_fused, hist_ref, rtol=1e-14)
    np.testing.assert_array_equal(sol_fused, sol_ref)
