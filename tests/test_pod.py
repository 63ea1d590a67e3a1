"""Pod-scale fused engine (dist/pod.py + ops/pallas_pod.py): whole-direction
kernels with in-kernel RDMA must reproduce the per-leg engine's residual
histories on the virtual CPU mesh (the leg engine itself is golden against
the single-device solver in test_spmd.py).

Interpret mode runs with eager DMA semantics (ops/pallas_pod._INTERP): the
leg emitters' staging-ring pacing assumes copies snapshot their source at
``start()`` like the hardware does.

Tolerances are f32 layout noise: the pod engine's per-level y/z extents
differ from the leg engine's mesh-aware allocation, so reductions and
restriction matmuls sum in a different order (~1e-5 per cycle, amplified
through Newton's outer loop).
"""

from __future__ import annotations

import numpy as np
import pytest

from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.dist.mesh import make_mesh
from gpusolve_tpu.dist.pod import choose_npod
from gpusolve_tpu.dist.spmd import (
    gather_solution,
    newton_solve_spmd,
    solve_spmd,
)


def _params(mode: Mode, gamma: float, maxiter: int = 3) -> GridParams:
    return GridParams(
        maxiter=maxiter,
        tol=1e-30,
        grid_dim=(63, 63, 63),
        mode=mode,
        pre_smoothing=2,
        post_smoothing=2,
        omega=0.8,
        gamma=gamma,
        stencil=Stencil.poisson_7pt(),
        print_progress=False,
        dtype="float32",
    )


from conftest import needs_sync_devices  # noqa: E402


@pytest.mark.parametrize(
    "mesh_shape",
    [(2, 1, 1), pytest.param((4, 1, 1), marks=needs_sync_devices(4))],
)
@pytest.mark.parametrize(
    "mode,gamma",
    [(Mode.LINEAR, 0.0), (Mode.NONLINEAR, 1.0)],
    ids=["linear", "nonlinear"],
)
def test_pod_matches_leg_engine(mode, gamma, mesh_shape):
    params = _params(mode, gamma)
    mesh = make_mesh(mesh_shape)
    _, hist_leg, _ = solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas"
    )
    st, hist_pod, plan = solve_spmd(params, mesh, cutoff=2, fuse="pod")
    np.testing.assert_allclose(
        np.asarray(hist_pod), np.asarray(hist_leg), rtol=5e-4
    )
    # The gathered solution is finite and zero outside the interior.
    sol = gather_solution(st, plan, mesh)
    assert np.isfinite(sol).all()
    assert np.abs(sol).max() > 0.0
    assert np.all(sol[0] == 0.0) and np.all(sol[:, 0] == 0.0)


@pytest.mark.parametrize(
    "mesh_shape",
    [(2, 1, 1), pytest.param((4, 1, 1), marks=needs_sync_devices(4))],
)
def test_pod_newton_matches_leg_engine(mesh_shape):
    params = _params(Mode.NEWTON, 1.0)
    mesh = make_mesh(mesh_shape)
    _, hist_leg, _ = newton_solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas"
    )
    _, hist_pod, _ = newton_solve_spmd(params, mesh, cutoff=2, fuse="pod")
    # ~40 inner f32 cycles across the outer iterations amplify the
    # cross-layout reordering noise; the late-iteration residuals sit at
    # the f32 floor (1e-7 of the initial), hence the absolute term.
    hl = np.asarray(hist_leg)
    np.testing.assert_allclose(
        np.asarray(hist_pod), hl, rtol=2e-3, atol=1e-6 * hl[0]
    )


@pytest.mark.parametrize("cycle", ["W", "F"])
@pytest.mark.parametrize(
    "mode,gamma",
    [(Mode.LINEAR, 0.0), (Mode.NONLINEAR, 1.0)],
    ids=["linear", "nonlinear"],
)
def test_pod_wf_matches_leg_engine(cycle, mode, gamma):
    """W/F schedules on the pod engine (late round 4): the linearized
    suffix-chain launches (dist/pod._linearize) must reproduce the
    per-leg engine's W/F residual histories (themselves golden against
    the single-device solver in test_wfcycles)."""
    params = _params(mode, gamma).replace(cycle_type=cycle)
    mesh = make_mesh((2, 1, 1))
    _, hist_leg, _ = solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas"
    )
    _, hist_pod, _ = solve_spmd(params, mesh, cutoff=2, fuse="pod")
    np.testing.assert_allclose(
        np.asarray(hist_pod), np.asarray(hist_leg), rtol=5e-4
    )


def test_pod_newton_wcycle_matches_leg_engine():
    """NEWTON's inner solves inherit cycle_type: a W-cycle exercises the
    has_nv suffix-chain path (nvs_c slicing, re-descent aux handling) of
    dist/pod._linearize that LINEAR/NONLINEAR W/F never touch — pin it
    against the per-leg engine (ADVICE r4)."""
    params = _params(Mode.NEWTON, 1.0, maxiter=2).replace(cycle_type="W")
    mesh = make_mesh((2, 1, 1))
    _, hist_leg, _ = newton_solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas"
    )
    _, hist_pod, _ = newton_solve_spmd(params, mesh, cutoff=2, fuse="pod")
    hl = np.asarray(hist_leg)
    np.testing.assert_allclose(
        np.asarray(hist_pod), hl, rtol=2e-3, atol=1e-6 * hl[0]
    )


def test_pod_multi_level_chain_engages():
    """At (4,1,1) on 63^3 the npod choice must cover >= 2 fused levels so
    the chained mid-level exchange (coarse outputs feeding the next leg
    through in-kernel RDMA) is actually exercised by the tests above."""
    params = _params(Mode.LINEAR, 0.0)
    assert choose_npod(params, 4) >= 2


def test_pod_rejects_unsupported():
    # A corner-tap radius-1 stencil falls off every fused-leg gate
    # (pallas_spmd.supported), so choose_npod finds no depth.  (W/F
    # cycles, the previous probe here, run on the pod engine since late
    # round 4.)
    corner = Stencil(
        values=(6.0, -1.0, -1.0, -1.0, -1.0, -1.0, -0.5),
        offsets=(
            (0, 0, 0), (1, 0, 0), (-1, 0, 0),
            (0, 1, 0), (0, -1, 0), (0, 0, 1), (1, 1, 0),
        ),
    )
    params = _params(Mode.LINEAR, 0.0).replace(stencil=corner)
    mesh = make_mesh((2, 1, 1))
    with pytest.raises(ValueError):
        solve_spmd(params, mesh, fuse="pod")


@needs_sync_devices(4)
def test_pod_accepts_ysplit_mesh():
    """Round 3: the pod engine runs on y-split meshes (2-D-trapezoid leg
    emitters + two-stage in-kernel RDMA — full parity tests in
    tests/test_spmd_ysplit.py)."""
    params = _params(Mode.LINEAR, 0.0)
    mesh = make_mesh((2, 2, 1))
    _, hist, plan = solve_spmd(params, mesh, fuse="pod")
    assert plan.mesh_shape[1] == 2
    assert all(h == h for h in hist)
