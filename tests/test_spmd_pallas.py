"""Shard-local Pallas kernels inside the explicit SPMD engine (round-1
VERDICT item 3: "Pallas local compute inside shard_map").

Runs on the 8-virtual-device CPU mesh in interpret mode: the
``local_backend="pallas"`` engine must reproduce the jnp engine's residual
histories in all three modes (the jnp engine itself is golden against the
single-device solver in test_spmd.py).

Geometry note: the kernels need 8 | by, 128 | z_live and an 8-multiple
x-tile (Mosaic DMA-slice tiling — ops/pallas_spmd.py module docstring), so
the test grid is (31, 31, 127) on a (2, 2, 1) mesh: level 0's (24, 24, 136)
blocks qualify, coarser levels exercise the jnp fallback mix.
"""

from __future__ import annotations

import numpy as np
import pytest

from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.dist.mesh import make_mesh
from gpusolve_tpu.dist.spmd import (
    SpmdPlan,
    gather_solution,
    newton_solve_spmd,
    solve_spmd,
)
from gpusolve_tpu.ops import pallas_spmd

MESH_SHAPE = (2, 2, 1)
GRID = (31, 31, 127)


def _params(mode: Mode, gamma: float, maxiter: int = 3) -> GridParams:
    return GridParams(
        maxiter=maxiter,
        tol=1e-30,
        grid_dim=GRID,
        mode=mode,
        pre_smoothing=2,
        post_smoothing=2,
        omega=0.8,
        gamma=gamma,
        stencil=Stencil.poisson_7pt(),
        print_progress=False,
        dtype="float32",
    )


def test_geometry_engages_pallas_on_finest_level():
    params = _params(Mode.LINEAR, 1.0)
    plan = SpmdPlan(params, MESH_SHAPE, cutoff=2)
    assert pallas_spmd.supported(params)
    assert pallas_spmd.level_supported(
        plan.block[0], plan.dims[0][2], MESH_SHAPE[2], params.dtype
    )
    # Coarser levels fall back to jnp (odd/by-misaligned blocks) — the test
    # therefore exercises the mixed pallas/jnp hierarchy.
    assert not pallas_spmd.level_supported(
        plan.block[1], plan.dims[1][2], MESH_SHAPE[2], params.dtype
    )


def test_zsplit_mesh_falls_back():
    # z (lane axis) mesh-splitting is not supported by the kernels.
    assert not pallas_spmd.level_supported((24, 24, 128), 127, 2)


@pytest.mark.parametrize("mesh_shape", [MESH_SHAPE, (2, 1, 1)])
@pytest.mark.parametrize(
    "mode,gamma", [(Mode.LINEAR, 1.0), (Mode.NONLINEAR, 30.0)]
)
def test_solve_history_matches_xla_backend(mode, gamma, mesh_shape):
    # (2, 2, 1): per-sweep kernels with y ghost faces.  (2, 1, 1): the
    # communication-avoiding trapezoid path (multi_sweep_block) plus the
    # fused residual+restrict / prolong+add kernels.
    params = _params(mode, gamma)
    mesh = make_mesh(mesh_shape)
    _, hist_x, _ = solve_spmd(params, mesh, cutoff=2, local_backend="xla")
    st, hist_p, plan = solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas"
    )
    hx, hp = np.asarray(hist_x), np.asarray(hist_p)
    assert hx.shape == hp.shape
    np.testing.assert_allclose(hp, hx, rtol=3e-5)
    # The gathered solution must be finite and zero outside the interior
    # (the kernels leave lane columns beyond z_live unwritten in fresh
    # buffers; gather_solution re-zeroes them).
    sol = gather_solution(st, plan, mesh)
    assert np.isfinite(sol).all()
    assert np.all(sol[:, :, GRID[2] + 1] == 0.0)
    assert np.abs(sol).max() > 0.0


@pytest.mark.parametrize("mesh_shape", [MESH_SHAPE, (2, 1, 1)])
def test_newton_history_matches_xla_backend(mesh_shape):
    params = _params(Mode.NEWTON, 30.0)
    mesh = make_mesh(mesh_shape)
    _, hist_x, _ = newton_solve_spmd(
        params, mesh, cutoff=2, local_backend="xla"
    )
    _, hist_p, _ = newton_solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas"
    )
    # ~30 inner f32 cycles with different (MXU vs explicit-add) summation
    # orders amplify through the Newton outer loop — 2e-4 is reordering
    # noise, not a defect (LINEAR/FAS single-solve parity is ~4e-6).
    np.testing.assert_allclose(
        np.asarray(hist_p), np.asarray(hist_x), rtol=2e-4
    )


@pytest.mark.parametrize(
    "mode, gamma",
    [(Mode.LINEAR, 0.0), (Mode.NONLINEAR, 1.0), (Mode.NEWTON, 1.0)],
    ids=["linear", "nonlinear", "newton"],
)
def test_fused_downleg_matches_xla_backend(mode, gamma):
    """A geometry whose finest blocks satisfy the fused down-leg gates
    (x-split only, 16 | bx): the single-pass trapezoid+restrict kernel
    must reproduce the XLA local-compute history."""
    params = _params(mode, gamma).replace(grid_dim=(63, 31, 127))
    mesh = make_mesh((2, 1, 1))
    if mode == Mode.NEWTON:
        _, hist_x, _ = newton_solve_spmd(
            params, mesh, cutoff=2, local_backend="xla"
        )
        _, hist_p, plan = newton_solve_spmd(
            params, mesh, cutoff=2, local_backend="pallas"
        )
    else:
        _, hist_x, _ = solve_spmd(
            params, mesh, cutoff=2, local_backend="xla"
        )
        _, hist_p, plan = solve_spmd(
            params, mesh, cutoff=2, local_backend="pallas"
        )
    assert plan.fused_down_levels, (
        "geometry was chosen to engage the fused down leg"
    )
    np.testing.assert_allclose(hist_p, hist_x, rtol=2e-4)


@pytest.mark.parametrize(
    "mode, gamma",
    [(Mode.LINEAR, 0.0), (Mode.NEWTON, 1.0), (Mode.NONLINEAR, 1.0)],
    ids=["linear", "newton", "nonlinear"],
)
def test_fused_upleg_matches_xla_backend(mode, gamma):
    """A geometry whose coarse blocks satisfy the fused up-leg gates
    (coarse lane extent >= 128): the corr-first trapezoid (prolongation +
    post sweeps in one pass) must reproduce the XLA local-compute
    history."""
    params = _params(mode, gamma, maxiter=2).replace(
        grid_dim=(63, 63, 255)
    )
    mesh = make_mesh((2, 1, 1))
    solver = newton_solve_spmd if mode == Mode.NEWTON else solve_spmd
    _, hist_x, _ = solver(params, mesh, cutoff=2, local_backend="xla")
    _, hist_p, plan = solver(
        params, mesh, cutoff=2, local_backend="pallas"
    )
    assert plan.fused_up_levels, (
        "geometry was chosen to engage the fused up leg"
    )
    np.testing.assert_allclose(hist_p, hist_x, rtol=2e-4)
