"""W- and F-cycle schedule tests (beyond-reference capability).

The reference only has V-cycles (src/cpu/CpuSolver.cpp:85-139); the
framework adds the standard gamma-cycle W (recurse twice per level) and F
(recurse F-then-V) schedules via ``GridParams.cycle_type``.  Parity chain:
the float64 XLA solver must match the float64 oracle's recursion exactly;
the wavefront mega-kernel must match the XLA solver in interpret mode; and
per-cycle contraction must not degrade vs V (W/F visit coarse levels more,
so they converge at least as fast per outer cycle on this SPD problem).
"""

import numpy as np
import pytest

import oracle as orc
from gpusolve_tpu import build_grid, newton_solve, solve
from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.ops import pallas_vcycle2 as pv2


def make_params(mode, cycle, dims=(15, 15, 15), maxiter=4, **kw):
    defaults = dict(
        maxiter=maxiter,
        tol=1e-10,
        grid_dim=dims,
        mode=mode,
        pre_smoothing=3,
        post_smoothing=3,
        omega=0.8,
        gamma=1.0,
        stencil=Stencil.poisson_7pt(),
        dtype="float64",
        print_progress=False,
        cycle_type=cycle,
    )
    defaults.update(kw)
    return GridParams(**defaults)


@pytest.mark.parametrize("cycle", ["W", "F"])
@pytest.mark.parametrize(
    "mode", [Mode.LINEAR, Mode.NONLINEAR], ids=["linear", "nonlinear"]
)
def test_wf_residual_sequence_vs_oracle(mode, cycle):
    p = make_params(mode, cycle)
    expected = orc.solve(orc.OracleGrid(p))
    state = build_grid(p)
    _, history = solve(state, p)
    assert len(history) == len(expected)
    np.testing.assert_allclose(history, expected, rtol=1e-8)


@pytest.mark.parametrize("cycle", ["W", "F"])
def test_wf_newton_vs_oracle(cycle):
    p = make_params(Mode.NEWTON, cycle, maxiter=3)
    expected = orc.newton_solve(orc.OracleGrid(p))
    state = build_grid(p)
    _, history = newton_solve(state, p)
    np.testing.assert_allclose(history, expected, rtol=1e-8)


@pytest.mark.parametrize("cycle", ["W", "F"])
def test_wf_contraction_not_worse_than_v(cycle):
    # Per-cycle residual reduction of W/F must beat (or match) V on the
    # linear Poisson problem.
    histories = {}
    for c in ("V", cycle):
        p = make_params(Mode.LINEAR, c, dims=(31, 31, 31), maxiter=3)
        _, h = solve(build_grid(p), p)
        histories[c] = h
    assert histories[cycle][-1] <= histories["V"][-1] * 1.01


@pytest.mark.parametrize("cycle", ["W", "F"])
@pytest.mark.parametrize(
    "mode", [Mode.LINEAR, Mode.NEWTON, Mode.NONLINEAR],
    ids=["linear", "newton", "nonlinear"],
)
def test_wf_megakernel_matches_xla(mode, cycle):
    # The wavefront kernel's W/F schedules vs the XLA recursion
    # (interpret mode, f32).
    from gpusolve_tpu.solver import vcycle as vc
    from test_vcycle2 import make_params as mk2, seeded_state, xla_cycles

    p = mk2(mode, (15, 15, 15), cycle_type=cycle)
    assert pv2.supported(p), "15^3 W/F should fit the pass budget"
    state = seeded_state(p)
    want_state, want = xla_cycles(state, p, 2)
    fields, norms = pv2.vcycle2_fused(
        state.levels, p, max_cycles=2, interpret=True
    )
    got = [float(np.sqrt(n)) for n in np.asarray(norms)]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=2e-4)
    v_want = np.asarray(want_state.levels[0].v)
    v_got = np.asarray(fields[0][0])
    scale = np.abs(v_want).max() + 1e-30
    np.testing.assert_allclose(v_got, v_want, rtol=2e-4, atol=2e-5 * scale)


def test_pass_budget_gates_deep_w():
    # W at many levels explodes the pass count; supported() must refuse
    # rather than build an unbounded Mosaic program.
    p = make_params(
        Mode.LINEAR, "W", dims=(511, 511, 511), dtype="float32"
    )
    assert pv2._cycle_pass_count(p) > pv2._MAX_PASSES
    assert not pv2.supported(p)
    # F stays affordable at the same depth.
    pf = p.replace(cycle_type="F")
    assert pv2._cycle_pass_count(pf) <= pv2._MAX_PASSES
    assert pv2.supported(pf)


def test_cycle_type_validation():
    with pytest.raises(ValueError):
        make_params(Mode.LINEAR, "X")


@pytest.mark.parametrize("cycle", ["W", "F"])
def test_wf_on_spmd_engine_matches_gspmd(cycle):
    """Round-3 item 10: W/F schedules on the explicit spmd engine (the
    per-leg trace-time recursion mirrors solver/vcycle.py's) — f64
    2-shard histories must match the single-device solver."""
    from gpusolve_tpu.dist import make_mesh
    from gpusolve_tpu.dist.spmd import solve_spmd

    p = make_params(
        Mode.NONLINEAR, cycle, dims=(31, 31, 31), maxiter=3,
        backend="xla",
    )
    _, ref = solve(build_grid(p), p)
    _, hist, _ = solve_spmd(p, make_mesh((2, 2, 2)), cutoff=2)
    np.testing.assert_allclose(hist, ref, rtol=1e-11)
