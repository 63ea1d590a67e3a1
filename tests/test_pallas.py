"""Pallas kernel unit tests (interpret mode on CPU) vs the XLA ops.

The Pallas TPU kernels must be value-identical (same dtype, same math) to the
``ops.xla`` implementations, which are themselves oracle-tested.  Interpret
mode emulates the DMA/tiling logic on CPU, covering tile clamping, odd/even
dims, and the dead-buffer aliasing protocol (SURVEY.md §4's per-kernel unit
test layer).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.ops import pallas_kernels as pk
from gpusolve_tpu.ops import xla


def make_params(mode, dims, **kw):
    defaults = dict(
        maxiter=1,
        tol=1e-5,
        grid_dim=dims,
        mode=mode,
        pre_smoothing=3,
        post_smoothing=3,
        omega=0.8,
        gamma=1.0,
        stencil=Stencil.poisson_7pt(),
        dtype="float32",
    )
    defaults.update(kw)
    return GridParams(**defaults)


def rand_padded(rng, dims, scale=1.0):
    from gpusolve_tpu.grid import alloc_shape

    a = np.zeros(alloc_shape(dims), np.float32)
    a[1 : 1 + dims[0], 1 : 1 + dims[1], 1 : 1 + dims[2]] = (
        rng.standard_normal(dims).astype(np.float32) * scale
    )
    return jnp.asarray(a)


DIMS = [(28, 21, 26), (15, 15, 15), (51, 40, 33)]


@pytest.mark.parametrize("mode", [Mode.LINEAR, Mode.NONLINEAR, Mode.NEWTON])
@pytest.mark.parametrize("dims", DIMS[:2])
def test_jacobi_sweep(mode, dims):
    rng = np.random.default_rng(0)
    p = make_params(mode, dims)
    h = p.level_h(0)
    v = rand_padded(rng, dims)
    f = rand_padded(rng, dims)
    nv = rand_padded(rng, dims, 0.3) if mode == Mode.NEWTON else None
    dead = rand_padded(rng, dims, 9.0)  # garbage interior, zero halo

    want = xla.jacobi(v, f, dims, p, h, 1, newton_v=nv)
    got = pk.jacobi_sweep(
        dead, v, f, dims, p, h, newton_v=nv, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=1e-6
    )
    # halo must remain exactly zero
    g = np.asarray(got)
    assert np.all(g[0] == 0) and np.all(g[-1] == 0)
    assert np.all(g[:, 0] == 0) and np.all(g[:, :, -1] == 0)


@pytest.mark.parametrize("mode", [Mode.LINEAR, Mode.NONLINEAR, Mode.NEWTON])
def test_residual_with_norm(mode):
    rng = np.random.default_rng(1)
    dims = DIMS[0]
    p = make_params(mode, dims)
    h = p.level_h(0)
    v = rand_padded(rng, dims)
    f = rand_padded(rng, dims)
    nv = rand_padded(rng, dims, 0.3) if mode == Mode.NEWTON else None
    dead = rand_padded(rng, dims, 9.0)

    want_r, want_ss = xla.residual(v, f, dims, p, h, newton_v=nv)
    got_r, got_ss = pk.residual(
        dead, v, f, dims, p, h, newton_v=nv, with_norm=True, interpret=True
    )
    # residual values are O(1/h^2) ~ 1e3-1e4; tolerance scales with the field
    scale = float(np.max(np.abs(np.asarray(want_r))))
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(want_r), rtol=2e-5, atol=2e-6 * scale
    )
    assert float(got_ss) == pytest.approx(float(want_ss), rel=1e-4)


def test_residual_norm_overlap_exact():
    # 28 interior with tile 24 -> clamped overlapping tiles; the norm must
    # not double-count overlap rows.
    rng = np.random.default_rng(2)
    dims = (28, 28, 12)
    p = make_params(Mode.LINEAR, dims)
    h = p.level_h(0)
    v = rand_padded(rng, dims)
    f = rand_padded(rng, dims)
    dead = rand_padded(rng, dims, 9.0)
    _, want_ss = xla.residual(v, f, dims, p, h)
    _, got_ss = pk.residual(
        dead, v, f, dims, p, h, with_norm=True, interpret=True
    )
    assert float(got_ss) == pytest.approx(float(want_ss), rel=1e-4)


@pytest.mark.parametrize("dims", DIMS)
def test_restrict(dims):
    rng = np.random.default_rng(3)
    p = make_params(Mode.LINEAR, dims)
    cdims = p.level_dims()[1]
    fine = rand_padded(rng, dims)
    dead = rand_padded(rng, cdims, 9.0)
    want = xla.restrict_full_weighting(fine, dims, cdims, dead.shape)
    got = pk.restrict_full_weighting(dead, fine, cdims, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=1e-6
    )
    g = np.asarray(got)
    assert np.all(g[0] == 0) and np.all(g[:, :, 0] == 0)


@pytest.mark.parametrize("dims", DIMS)
def test_prolong_add(dims):
    rng = np.random.default_rng(4)
    p = make_params(Mode.LINEAR, dims)
    cdims = p.level_dims()[1]
    coarse = rand_padded(rng, cdims)
    v = rand_padded(rng, dims)
    dead = rand_padded(rng, dims, 9.0)
    want = v + xla.interpolate(coarse, cdims, dims, v.shape)
    got = pk.prolong_add(dead, coarse, v, dims, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=1e-6
    )


def test_vcycle_pallas_backend_matches_xla():
    # Whole V-cycle with backend="pallas" (interpret via CPU) vs "xla".
    # Uses a grid large enough that dispatch actually routes to Pallas.
    from gpusolve_tpu import build_grid
    from gpusolve_tpu.solver import vcycle as vc
    from gpusolve_tpu.ops import dispatch

    dims = (51, 51, 51)
    p_x = make_params(Mode.LINEAR, dims, backend="xla")
    p_p = make_params(Mode.LINEAR, dims, backend="pallas")
    assert dispatch.use_pallas(p_p, dims)

    import gpusolve_tpu.ops.pallas_kernels as pkm

    # Force interpret mode for this CPU test.
    orig_j, orig_r = pkm._jacobi_call, pkm._residual_call
    orig_re, orig_pr = pkm._restrict_call, pkm._prolong_call

    def wrap(fn):
        def inner(*args):
            return fn(*args[:-1], True)

        return inner

    pkm_patch = {
        "_jacobi_call": wrap(orig_j.__wrapped__),
        "_residual_call": wrap(orig_r.__wrapped__),
        "_restrict_call": wrap(orig_re.__wrapped__),
        "_prolong_call": wrap(orig_pr.__wrapped__),
    }
    try:
        for k, v in pkm_patch.items():
            setattr(pkm, k, v)
        state_p = build_grid(p_p)
        out_p, res_p = vc.vcycle(
            state_p, params=vc.trace_params(p_p), shardings=None
        )
    finally:
        pkm._jacobi_call = orig_j
        pkm._residual_call = orig_r
        pkm._restrict_call = orig_re
        pkm._prolong_call = orig_pr

    state_x = build_grid(p_x)
    out_x, res_x = vc.vcycle(
        state_x, params=vc.trace_params(p_x), shardings=None
    )
    assert float(res_p) == pytest.approx(float(res_x), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_p.levels[0].v),
        np.asarray(out_x.levels[0].v),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "mode",
    [Mode.LINEAR, Mode.NEWTON, Mode.NONLINEAR],
    ids=["linear", "newton", "nonlinear"],
)
def test_vcycle_fused_matches_xla(mode):
    # The whole-cycle mega-kernel (interpret mode) must match the XLA
    # V-cycle bit-for-bit-ish at equal dtype.
    from gpusolve_tpu import build_grid
    from gpusolve_tpu.ops import pallas_vcycle as pv
    from gpusolve_tpu.solver import vcycle as vc

    dims = (31, 31, 31)
    p = make_params(mode, dims, backend="xla")
    state = build_grid(p)
    if mode == Mode.NEWTON:
        # give newton_v a nonzero linearisation point
        rng = np.random.default_rng(7)
        lvl0 = state.levels[0]
        import dataclasses

        state = dataclasses.replace(
            state,
            levels=(
                dataclasses.replace(
                    lvl0, newton_v=rand_padded(rng, dims, 0.2)
                ),
            )
            + state.levels[1:],
        )

    want_state, want_res = vc.vcycle(
        state, params=vc.trace_params(p), shardings=None
    )

    fields, sumsq = pv.vcycle_fused(state.levels, p, interpret=True)
    got_res = float(jnp.sqrt(sumsq))
    assert got_res == pytest.approx(float(want_res), rel=2e-4)
    got_v = np.asarray(fields[0][0])
    want_v = np.asarray(want_state.levels[0].v)
    scale = np.abs(want_v).max() + 1e-30
    np.testing.assert_allclose(got_v, want_v, rtol=2e-4, atol=2e-5 * scale)


def test_apply_stencil_fas_pallas():
    rng = np.random.default_rng(9)
    dims = (28, 21, 26)
    p = make_params(Mode.NONLINEAR, dims)
    h = p.level_h(0)
    v = rand_padded(rng, dims)
    dead = rand_padded(rng, dims, 9.0)
    want = xla.apply_stencil_fas(v, dims, p, h)
    got = pk.apply_stencil_fas(dead, v, dims, p, h, interpret=True)
    scale = float(np.max(np.abs(np.asarray(want)))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6 * scale
    )


def test_fused_vcycle_general_stencil():
    # A non-symmetric 7-point stencil (distinct coefficients per direction)
    # exercises the general coefficient-grouping path in the kernels — the
    # stencil is config-driven in the reference (src/main.cpp:63-82).
    from gpusolve_tpu import build_grid
    from gpusolve_tpu.ops import pallas_vcycle as pv
    from gpusolve_tpu.solver import vcycle as vc

    stencil = Stencil(
        values=(7.0, -1.5, -0.5, -2.0, -1.0, -1.25, -0.75),
        offsets=(
            (0, 0, 0), (1, 0, 0), (-1, 0, 0),
            (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1),
        ),
    )
    p = make_params(Mode.LINEAR, (31, 31, 31), stencil=stencil,
                    backend="xla")
    state = build_grid(p)
    want_state, want_res = vc.vcycle(
        state, params=vc.trace_params(p), shardings=None
    )
    fields, sumsq = pv.vcycle_fused(state.levels, p, interpret=True)
    assert float(jnp.sqrt(sumsq)) == pytest.approx(
        float(want_res), rel=2e-4
    )
    got_v = np.asarray(fields[0][0])
    want_v = np.asarray(want_state.levels[0].v)
    scale = np.abs(want_v).max() + 1e-30
    np.testing.assert_allclose(got_v, want_v, rtol=2e-4, atol=2e-5 * scale)


@pytest.mark.parametrize(
    "mode, dims",
    [
        # Non-2^k-1 dims (integer-halved hierarchies): v1 has no x-chunk
        # alignment gate, so it is the fused fallback for grids the
        # wavefront kernel rejects (e.g. 21³); pin its parity there.
        (Mode.LINEAR, (21, 21, 21)),
        (Mode.NONLINEAR, (24, 24, 24)),
    ],
)
def test_vcycle_fused_nonstandard_dims(mode, dims):
    from gpusolve_tpu import build_grid
    from gpusolve_tpu.ops import pallas_vcycle as pv
    from gpusolve_tpu.solver import vcycle as vc

    p = make_params(mode, dims, backend="xla")
    state = build_grid(p)
    want_state, want_res = vc.vcycle(
        state, params=vc.trace_params(p), shardings=None
    )
    fields, sumsq = pv.vcycle_fused(state.levels, p, interpret=True)
    assert float(jnp.sqrt(sumsq)) == pytest.approx(
        float(want_res), rel=2e-4
    )
    got_v = np.asarray(fields[0][0])
    want_v = np.asarray(want_state.levels[0].v)
    scale = np.abs(want_v).max() + 1e-30
    np.testing.assert_allclose(got_v, want_v, rtol=2e-4, atol=2e-5 * scale)
