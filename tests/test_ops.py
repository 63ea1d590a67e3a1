"""Per-kernel unit tests: framework ops vs the NumPy float64 oracle.

Each framework op (gpusolve_tpu.ops.xla) is checked against the oracle
re-expression of the reference loop nests on random fields, for every mode.
"""

import numpy as np
import pytest

import oracle as orc
from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.ops import xla as ops


def make_params(mode, dims=(15, 15, 15), **kw):
    defaults = dict(
        maxiter=10,
        tol=1e-5,
        grid_dim=dims,
        mode=mode,
        pre_smoothing=3,
        post_smoothing=3,
        omega=0.8,
        gamma=1.0,
        stencil=Stencil.poisson_7pt(),
        dtype="float64",
    )
    defaults.update(kw)
    return GridParams(**defaults)


def rand_field(rng, shape, zero_halo=True):
    a = rng.standard_normal(shape)
    if zero_halo:
        mask = np.zeros(shape, dtype=bool)
        mask[1:-1, 1:-1, 1:-1] = True
        a = np.where(mask, a, 0.0)
    return a


@pytest.mark.parametrize("mode", [Mode.LINEAR, Mode.NONLINEAR, Mode.NEWTON])
def test_residual_matches_oracle(mode):
    rng = np.random.default_rng(0)
    p = make_params(mode)
    g = orc.OracleGrid(p)
    lvl = g.levels[0]
    lvl.v[:] = rand_field(rng, lvl.v.shape)
    lvl.newton_v[:] = rand_field(rng, lvl.v.shape) * 0.3
    expected_norm = orc.comp_residual(g, 0)

    r, sumsq = ops.residual(
        lvl.v, lvl.f, lvl.dims, p, lvl.h,
        newton_v=lvl.newton_v if mode == Mode.NEWTON else None,
    )
    np.testing.assert_allclose(np.asarray(r), g.levels[0].r, rtol=1e-12)
    assert float(np.sqrt(sumsq)) == pytest.approx(expected_norm, rel=1e-12)


@pytest.mark.parametrize("mode", [Mode.LINEAR, Mode.NONLINEAR, Mode.NEWTON])
@pytest.mark.parametrize("n_iter", [1, 3])
def test_jacobi_matches_oracle(mode, n_iter):
    rng = np.random.default_rng(1)
    p = make_params(mode)
    g = orc.OracleGrid(p)
    lvl = g.levels[0]
    lvl.v[:] = rand_field(rng, lvl.v.shape)
    lvl.newton_v[:] = rand_field(rng, lvl.v.shape) * 0.3
    v0 = lvl.v.copy()

    orc.jacobi(g, 0, n_iter)

    got = ops.jacobi(
        v0, lvl.f, lvl.dims, p, lvl.h, n_iter,
        newton_v=lvl.newton_v if mode == Mode.NEWTON else None,
    )
    np.testing.assert_allclose(np.asarray(got), lvl.v, rtol=1e-12)


def test_apply_stencil_fas_matches_oracle():
    rng = np.random.default_rng(2)
    p = make_params(Mode.NONLINEAR)
    g = orc.OracleGrid(p)
    lvl = g.levels[1]
    v = rand_field(rng, lvl.v.shape)
    orc.apply_stencil(g, 1, v)
    got = ops.apply_stencil_fas(v, lvl.dims, p, lvl.h)
    np.testing.assert_allclose(np.asarray(got), lvl.r, rtol=1e-12)


@pytest.mark.parametrize("dims", [(15, 15, 15), (31, 15, 63), (14, 14, 14)])
def test_restrict_matches_oracle(dims):
    rng = np.random.default_rng(3)
    p = make_params(Mode.LINEAR, dims=dims)
    g = orc.OracleGrid(p)
    fine = rand_field(rng, g.levels[0].r.shape)
    orc.restrict(fine, g.levels[1].f)
    got = ops.restrict_full_weighting(
        fine, g.levels[0].dims, g.levels[1].dims, g.levels[1].f.shape
    )
    np.testing.assert_allclose(np.asarray(got), g.levels[1].f, rtol=1e-12)


def test_restrict_weights_sum_to_one():
    # A constant-1 interior fine field with correct halo contributions:
    # interior coarse points away from the boundary must restrict to 1.
    p = make_params(Mode.LINEAR)
    g = orc.OracleGrid(p)
    fine = np.ones(g.levels[0].r.shape)
    got = np.asarray(
        ops.restrict_full_weighting(
            fine, g.levels[0].dims, g.levels[1].dims, g.levels[1].f.shape
        )
    )
    assert got[2:-2, 2:-2, 2:-2] == pytest.approx(1.0)


@pytest.mark.parametrize("dims", [(15, 15, 15), (31, 15, 63), (14, 14, 14)])
def test_interpolate_matches_oracle(dims):
    rng = np.random.default_rng(4)
    p = make_params(Mode.LINEAR, dims=dims)
    g = orc.OracleGrid(p)
    g.levels[1].v[:] = rand_field(rng, g.levels[1].v.shape)
    orc.interpolate(g, 0)
    got = ops.interpolate(
        g.levels[1].v, g.levels[1].dims, g.levels[0].dims,
        g.levels[0].e.shape,
    )
    np.testing.assert_allclose(np.asarray(got), g.levels[0].e, rtol=1e-12)


def test_rhs_builders_match_oracle():
    from gpusolve_tpu import grid as gridmod

    for mode in (Mode.LINEAR, Mode.NONLINEAR):
        p = make_params(mode)
        g = orc.OracleGrid(p)
        if mode == Mode.LINEAR:
            ours = gridmod.linear_rhs(p.grid_dim, p.h)
            np.testing.assert_allclose(ours, g.levels[0].f, rtol=1e-13)
        else:
            ours = gridmod.nonlinear_rhs(p.grid_dim, p.h, p.gamma)
            # Device convention zeroes the halo; interior must match the CPU
            # cube fill (SURVEY.md §7 "behavioral quirks").
            np.testing.assert_allclose(
                ours[1:-1, 1:-1, 1:-1],
                g.levels[0].f[1:-1, 1:-1, 1:-1],
                rtol=1e-13,
            )
            assert np.all(ours[0] == 0) and np.all(ours[-1] == 0)


def test_build_grid_allocates_by_mode():
    from gpusolve_tpu.grid import build_grid

    for mode, has_rest, has_newton in [
        (Mode.LINEAR, False, False),
        (Mode.NONLINEAR, True, False),
        (Mode.NEWTON, False, True),
    ]:
        state = build_grid(make_params(mode))
        assert (state.levels[0].rest_v is not None) == has_rest
        assert (state.levels[0].newton_v is not None) == has_newton
        assert state.levels[-1].e is None  # coarsest has no e
        assert state.levels[0].e is not None
        assert (state.newton_f is not None) == (mode == Mode.NEWTON)
