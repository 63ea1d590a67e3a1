"""Multi-device domain-decomposition tests on 8 virtual CPU devices.

The conftest forces ``--xla_force_host_platform_device_count=8``, the standard
way to exercise sharding/halo logic without a pod (SURVEY.md §4).  The sharded
solve must produce the identical residual sequence — domain decomposition is
an execution detail, not a numerical change.
"""

import numpy as np
import pytest

import jax

from gpusolve_tpu import build_grid, newton_solve, solve
from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.dist import (
    factor_devices,
    level_shardings,
    make_mesh,
    shard_state,
)


def make_params(mode, dims=(15, 15, 15), maxiter=3, **kw):
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


def test_factor_devices():
    assert factor_devices(1) == (1, 1, 1)
    assert factor_devices(2) == (2, 1, 1)
    assert factor_devices(4) == (2, 2, 1)
    assert factor_devices(8) == (2, 2, 2)
    assert factor_devices(6) == (3, 2, 1)
    assert factor_devices(12) == (3, 2, 2)


def test_make_mesh_8():
    mesh = make_mesh()
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("x", "y", "z")


def test_level_shardings_policy():
    p = make_params(Mode.LINEAR, dims=(31, 31, 31))
    mesh = make_mesh((2, 2, 2))
    shs = level_shardings(p, mesh)
    assert len(shs) == p.num_levels
    # Fine levels blocked over all three axes; coarse levels replicated.
    from jax.sharding import PartitionSpec as P

    assert shs[0].spec == P("x", "y", "z")
    assert shs[-1].spec == P()
    # 31,15,7,3,1: 15//2=7 >= 4 distributed; 7//2=3 < 4 replicated
    assert shs[1].spec == P("x", "y", "z")
    assert shs[2].spec == P()


@pytest.mark.parametrize(
    "mode", [Mode.LINEAR, Mode.NONLINEAR], ids=["linear", "nonlinear"]
)
def test_sharded_solve_matches_single_device(mode):
    p = make_params(mode, dims=(15, 15, 15))
    state, ref_history = solve(build_grid(p), p)

    mesh = make_mesh((2, 2, 2))
    shs = level_shardings(p, mesh, coarse_cutoff=2)
    sstate = shard_state(build_grid(p), shs)
    sstate, history = solve(sstate, p, shardings=shs)
    np.testing.assert_allclose(history, ref_history, rtol=1e-12)
    # Solution fields agree too.
    np.testing.assert_allclose(
        np.asarray(sstate.levels[0].v),
        np.asarray(state.levels[0].v),
        rtol=1e-12,
        atol=1e-14,
    )


def test_sharded_newton_matches_single_device():
    p = make_params(Mode.NEWTON, dims=(15, 15, 15), maxiter=2)
    _, ref_history = newton_solve(build_grid(p), p)

    mesh = make_mesh((2, 2, 2))
    shs = level_shardings(p, mesh, coarse_cutoff=2)
    sstate = shard_state(build_grid(p), shs)
    _, history = newton_solve(sstate, p, shardings=shs)
    np.testing.assert_allclose(history, ref_history, rtol=1e-12)


@pytest.mark.parametrize("dims", [(14, 14, 14), (31, 31, 31)])
def test_sharded_output_has_requested_sharding(dims):
    # GSPMD only honors a sharding constraint when the dim is divisible by
    # the mesh axis; the tile-aligned allocation (grid.alloc_shape) makes
    # every dim a multiple of 8, so shardings stick for power-of-two meshes
    # even with odd logical grids.
    from gpusolve_tpu.solver import vcycle as vc

    p = make_params(Mode.LINEAR, dims=dims)
    mesh = make_mesh((2, 2, 2))
    shs = level_shardings(p, mesh, coarse_cutoff=2)
    sstate = shard_state(build_grid(p), shs)
    out, _ = vc.vcycle(sstate, params=vc.trace_params(p), shardings=shs)
    assert out.levels[0].v.sharding.is_equivalent_to(shs[0], 3)


def test_anisotropic_mesh_uneven_dims():
    # Uneven shard sizes (17 points over 2 shards) and a non-cubic mesh.
    p = make_params(Mode.LINEAR, dims=(15, 31, 15), maxiter=2)
    _, ref_history = solve(build_grid(p), p)
    mesh = make_mesh((2, 4, 1))
    shs = level_shardings(p, mesh, coarse_cutoff=2)
    sstate = shard_state(build_grid(p), shs)
    _, history = solve(sstate, p, shardings=shs)
    np.testing.assert_allclose(history, ref_history, rtol=1e-12)


@pytest.mark.parametrize("cycle", ["W", "F"])
def test_sharded_wf_cycles_match_single_device(cycle):
    """W/F schedules run sharded through the GSPMD engine (the recursion
    re-applies the same per-level sharding constraints on every visit)."""
    p = make_params(Mode.LINEAR, dims=(15, 15, 15)).replace(
        cycle_type=cycle
    )
    _, ref_history = solve(build_grid(p), p)

    mesh = make_mesh((2, 2, 2))
    shs = level_shardings(p, mesh, coarse_cutoff=2)
    sstate = shard_state(build_grid(p), shs)
    _, history = solve(sstate, p, shardings=shs)
    np.testing.assert_allclose(history, ref_history, rtol=1e-12)


def test_spmd_engine_accepts_wf():
    """Round 3 added W/F schedules to the explicit spmd engine (the old
    V-cycles-only gate is gone); correctness vs the gspmd engine is pinned
    by tests/test_wfcycles.py::test_wf_on_spmd_engine_matches_gspmd — here
    we only assert the builder no longer rejects the schedule."""
    from gpusolve_tpu.dist.spmd import build_spmd_solver

    p = make_params(Mode.LINEAR, dims=(15, 15, 15)).replace(
        cycle_type="W", dtype="float32"
    )
    mesh = make_mesh((2, 1, 1))
    build_spmd_solver(p, mesh)
