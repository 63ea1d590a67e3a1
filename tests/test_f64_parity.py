"""Distributed bit-parity in float64 (round-2 VERDICT item 8).

The round-2 distributed tests pinned the Pallas engines to the jnp path
at f32 tolerances (~1e-5), a bound loose enough to absorb real
regressions.  Interpret mode executes the same kernels in float64
(Mosaic's f32-only tiling is a hardware-lowering property), so here the
LEG (trapezoid, fused down/up) and POD engines run 2-shard f64 solves
whose histories must match the single-device f64 solver to ~1e-12 —
reassociation noise of the MXU-expressed transfer matmuls only."""

import numpy as np
import pytest

from gpusolve_tpu import build_grid, solve
from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.dist import make_mesh
from gpusolve_tpu.dist.spmd import newton_solve_spmd, solve_spmd
from gpusolve_tpu.ops import pallas_spmd
from gpusolve_tpu.solver.newton import newton_solve


@pytest.fixture(autouse=True)
def allow_f64_kernels():
    old = pallas_spmd._F64_INTERPRET_OK
    pallas_spmd._F64_INTERPRET_OK = True
    try:
        yield
    finally:
        pallas_spmd._F64_INTERPRET_OK = old


def _params(mode, grid=(63, 31, 127), maxiter=3):
    return GridParams(
        maxiter=maxiter,
        tol=1e-30,
        grid_dim=grid,
        mode=mode,
        pre_smoothing=2,
        post_smoothing=2,
        omega=0.8,
        gamma=1.0,
        stencil=Stencil.poisson_7pt(),
        dtype="float64",
        print_progress=False,
        backend="xla",
    )


@pytest.mark.parametrize(
    "mode", [Mode.LINEAR, Mode.NONLINEAR], ids=["linear", "nonlinear"]
)
def test_leg_engine_f64_two_shard(mode):
    """2-shard trapezoid engine (fused down+up legs engaged) in f64."""
    p = _params(mode)
    _, ref = solve(build_grid(p), p)
    mesh = make_mesh((2, 1, 1))
    _, hist, plan = solve_spmd(
        p, mesh, cutoff=2, local_backend="pallas"
    )
    assert plan.fused_down_levels, "f64 run must still take the fused path"
    np.testing.assert_allclose(hist, ref, rtol=1e-12)


def test_leg_engine_f64_newton():
    p = _params(Mode.NEWTON, maxiter=2)
    _, ref = newton_solve(build_grid(p), p)
    _, hist, _ = newton_solve_spmd(
        p, make_mesh((2, 1, 1)), cutoff=2, local_backend="pallas"
    )
    np.testing.assert_allclose(hist, ref, rtol=1e-11)


@pytest.mark.parametrize(
    "mode", [Mode.LINEAR, Mode.NONLINEAR], ids=["linear", "nonlinear"]
)
def test_pod_engine_f64_two_shard(mode):
    p = _params(mode, grid=(63, 31, 127), maxiter=2)
    _, ref = solve(build_grid(p), p)
    _, hist, _ = solve_spmd(p, make_mesh((2, 1, 1)), cutoff=2, fuse="pod")
    np.testing.assert_allclose(hist, ref, rtol=1e-12)
