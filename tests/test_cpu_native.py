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
