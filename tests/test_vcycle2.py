"""Wavefront mega-kernel (ops/pallas_vcycle2) parity tests, interpret mode.

The v2 kernel fuses whole V-cycle legs into single streaming passes and can
run several cycles per launch with an in-kernel early stop; these tests pin
its residual histories and final fields to the XLA V-cycle (itself golden
against the float64 oracle in test_solver_parity)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpusolve_tpu import build_grid
from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.ops import pallas_vcycle2 as pv2
from gpusolve_tpu.solver import vcycle as vc


def make_params(mode, dims, **kw):
    defaults = dict(
        maxiter=3,
        tol=1e-12,
        grid_dim=dims,
        mode=mode,
        pre_smoothing=3,
        post_smoothing=3,
        omega=0.8,
        gamma=1.0,
        stencil=Stencil.poisson_7pt(),
        dtype="float32",
        print_progress=False,
        backend="xla",
    )
    defaults.update(kw)
    return GridParams(**defaults)


def seeded_state(p):
    state = build_grid(p)
    if p.mode == Mode.NEWTON:
        # nonzero linearisation point on every level
        rng = np.random.default_rng(7)
        new_lv = []
        for i, lvl in enumerate(state.levels):
            nx, ny, nz = p.level_dims()[i]
            nv = np.zeros(lvl.v.shape, np.float32)
            nv[1 : nx + 1, 1 : ny + 1, 1 : nz + 1] = (
                0.2 * rng.standard_normal((nx, ny, nz))
            )
            new_lv.append(
                dataclasses.replace(lvl, newton_v=jnp.asarray(nv))
            )
        state = dataclasses.replace(state, levels=tuple(new_lv))
    return state


def xla_cycles(state, p, n):
    tp = vc.trace_params(p)
    hist = []
    for _ in range(n):
        state, res = vc.vcycle(state, params=tp, shardings=None)
        hist.append(float(res))
    return state, hist


@pytest.mark.parametrize(
    "mode", [Mode.LINEAR, Mode.NEWTON, Mode.NONLINEAR]
)
def test_vcycle2_matches_xla(mode):
    dims = (15, 15, 15)
    p = make_params(mode, dims)
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


def test_vcycle2_multislab_level():
    # 31³ exercises >2 in-stream slabs and a 3-slab coarse prolong stream.
    p = make_params(Mode.LINEAR, (31, 31, 31))
    state = build_grid(p)
    want_state, want = xla_cycles(state, p, 2)
    fields, norms = pv2.vcycle2_fused(
        state.levels, p, max_cycles=2, interpret=True
    )
    got = [float(np.sqrt(n)) for n in np.asarray(norms)]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=2e-4)


@pytest.mark.parametrize(
    "mode, dims",
    [
        # 2^k / 3*2^k grids (supported: every streamed x-extent % 8 is 0)
        # exercise staging edges the 2^k-1 family never hits:
        #  - tiny-coarse restrict with cnx >= 9 (24³ -> cnx 12): the old
        #    mod-8 staging wrap silently clobbered planes 1..4,
        #  - tiny cnx = 8 (16³): the staged +x halo write at m = cnx+1 is
        #    gated out (m caps at NCC*_TX = cnx) and FAS v staging
        #    overflowed tc's upper half,
        #  - streamed restrict with cnx % 8 == 0 (48³ -> cnx 24): the FAS
        #    tau fold's last plane lands at m = cnx+1, beyond the chunk
        #    bound.
        (Mode.LINEAR, (24, 24, 24)),
        (Mode.NONLINEAR, (16, 16, 16)),
        (Mode.NONLINEAR, (48, 48, 48)),
        (Mode.NEWTON, (24, 24, 24)),
    ],
)
def test_vcycle2_pow2_and_3pow2_dims(mode, dims):
    p = make_params(mode, dims)
    assert pv2.supported(p), pv2.unsupported_reason(p)
    state = seeded_state(p)
    _, want = xla_cycles(state, p, 2)
    fields, norms = pv2.vcycle2_fused(
        state.levels, p, max_cycles=2, interpret=True
    )
    got = [float(np.sqrt(n)) for n in np.asarray(norms)]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=2e-4)


def test_vcycle2_early_stop_and_ncycles():
    p = make_params(Mode.LINEAR, (15, 15, 15))
    state = build_grid(p)
    _, want = xla_cycles(build_grid(p), p, 4)

    # Early stop after cycle 2: threshold between the cycle-1 and cycle-2
    # residual sum-of-squares.
    thr = np.float32((want[0] ** 2 + want[1] ** 2) / 2)
    fields, norms = pv2.vcycle2_fused(
        state.levels, p, max_cycles=4, threshold_sq=thr, interpret=True
    )
    norms = np.asarray(norms)
    assert norms[0] > thr and norms[1] <= thr
    assert norms[2] == -1.0 and norms[3] == -1.0

    # n_cycles < max_cycles: run exactly 3 of 4.
    state2 = build_grid(p)
    _, norms2 = pv2.vcycle2_fused(
        state2.levels, p, max_cycles=4, n_cycles=3, interpret=True
    )
    norms2 = np.asarray(norms2)
    assert (norms2[:3] >= 0).all() and norms2[3] == -1.0
    for g, w in zip(np.sqrt(norms2[:3]), want[:3]):
        assert float(g) == pytest.approx(w, rel=2e-4)


def test_vcycle2_state_reusable_across_launches():
    # Two 1-cycle launches == one 2-cycle launch (in-place aliased state).
    p = make_params(Mode.LINEAR, (15, 15, 15))

    import gpusolve_tpu.grid as grid_mod

    state = build_grid(p)
    fields, n1 = pv2.vcycle2_fused(
        state.levels, p, max_cycles=1, interpret=True
    )
    levels = [
        dataclasses.replace(lvl, v=f[0], f=f[1])
        for lvl, f in zip(state.levels, fields)
    ]
    _, n2 = pv2.vcycle2_fused(levels, p, max_cycles=1, interpret=True)

    state_b = build_grid(p)
    _, nb = pv2.vcycle2_fused(
        state_b.levels, p, max_cycles=2, interpret=True
    )
    nb = np.asarray(nb)
    assert float(np.asarray(n1)[0]) == pytest.approx(float(nb[0]), rel=1e-6)
    assert float(np.asarray(n2)[0]) == pytest.approx(float(nb[1]), rel=1e-6)


def test_supported_gates():
    p = make_params(Mode.LINEAR, (31, 31, 31))
    assert pv2.supported(p)
    assert not pv2.supported(p.replace(pre_smoothing=6))
    # z_live denseness: 2^k-1 grids stream without z padding
    from gpusolve_tpu.grid import alloc_shape

    assert pv2.z_live((127, 127, 127), alloc_shape((127, 127, 127))) == 128
    assert pv2.z_live((511, 511, 511), alloc_shape((511, 511, 511))) == 512
    assert pv2.z_live((63, 63, 63), alloc_shape((63, 63, 63))) == 128


@pytest.mark.parametrize("mode", [Mode.LINEAR, Mode.NEWTON])
@pytest.mark.parametrize("from_level", [0, 1])
def test_vcycle2_recompute_schedule_bit_identical(mode, from_level):
    """The traffic-minimal recompute schedule (down legs skip the v
    write-back, up legs re-derive the pre-smoothed v) must produce
    bit-identical fields and norms to the write-back schedule: the
    recomputed sweeps run the same ops on the same inputs."""
    p = make_params(mode, (31, 31, 31))
    state = seeded_state(p)

    fields_w, norms_w = pv2.vcycle2_fused(
        state.levels, p, max_cycles=2, interpret=True
    )
    old = pv2._RECOMPUTE_FROM_LEVEL
    pv2._RECOMPUTE_FROM_LEVEL = from_level
    pv2._vcycle2_call.cache_clear()
    try:
        state2 = seeded_state(p)
        fields_r, norms_r = pv2.vcycle2_fused(
            state2.levels, p, max_cycles=2, interpret=True
        )
    finally:
        pv2._RECOMPUTE_FROM_LEVEL = old
        pv2._vcycle2_call.cache_clear()

    np.testing.assert_array_equal(np.asarray(norms_r), np.asarray(norms_w))
    # v must agree everywhere (level-0 exactly; all levels in fact)
    for fw, fr in zip(fields_w, fields_r):
        np.testing.assert_array_equal(np.asarray(fr[0]), np.asarray(fw[0]))


def test_vcycle2_anisotropic_dims():
    # Anisotropic grids exercise per-level dense-z extents and unequal
    # restrict/prolong factors per axis.
    p = make_params(Mode.LINEAR, (15, 7, 31))
    assert pv2.supported(p)
    state = build_grid(p)
    _, want = xla_cycles(build_grid(p), p, 2)
    _, norms = pv2.vcycle2_fused(
        state.levels, p, max_cycles=2, interpret=True
    )
    got = [float(np.sqrt(n)) for n in np.asarray(norms)]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=2e-4)
