"""In-kernel RDMA halo exchange (ops/pallas_spmd.rdma_exchange,
``halo="rdma"`` on the explicit SPMD engine).

Pod-scale mega-kernel groundwork (ROADMAP): the per-leg x-face slab
exchange of the trapezoid paths runs as ``pltpu.make_async_remote_copy``
remote DMAs inside one Pallas kernel — neighbour-barrier via remote
``semaphore_signal``, per-field DMA-semaphore pairs, zero-filled Dirichlet
edges — instead of XLA ``lax.ppermute`` collectives.  Tested in Pallas TPU
interpret mode on the virtual CPU mesh; the solver histories must be
identical to the ppermute engine's (same compute kernels, same slab
values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.dist.mesh import make_mesh
from gpusolve_tpu.dist.spmd import _shard_map, newton_solve_spmd, solve_spmd
from gpusolve_tpu.ops import pallas_spmd


def _params(mode: Mode, gamma: float, grid=(63, 31, 127),
            maxiter: int = 3) -> GridParams:
    return GridParams(
        maxiter=maxiter,
        tol=1e-30,
        grid_dim=grid,
        mode=mode,
        pre_smoothing=2,
        post_smoothing=2,
        omega=0.8,
        gamma=gamma,
        stencil=Stencil.poisson_7pt(),
        print_progress=False,
        dtype="float32",
    )


def test_rdma_exchange_matches_ppermute():
    """Unit parity: the RDMA slab exchange must deliver exactly what the
    ppermute pair delivers (neighbour faces; zeros at the global edge)."""
    from gpusolve_tpu.dist.spmd import interpret_sync_capacity
    if interpret_sync_capacity() < 4:
        pytest.skip("4-device in-kernel RDMA exceeds host sync capacity")
    mesh = make_mesh((4, 1, 1))
    m = 4
    gh = pallas_spmd._GH
    bx, by, zz = 16, 8, 128
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m * bx, by, zz)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(m * bx, by, zz)).astype(np.float32))

    def body(u, w):
        idx = jax.lax.axis_index("x").astype(jnp.int32).reshape(1, 1)
        return tuple(
            pallas_spmd.rdma_exchange(
                [u, w], idx, gh, zz, m, interpret=True
            )
        )

    f = jax.jit(
        _shard_map(
            body, mesh=mesh, in_specs=(P("x"), P("x")),
            out_specs=tuple([P("x")] * 4),
        )
    )
    lo_a, hi_a, lo_b, hi_b = [
        np.asarray(o).reshape(m, gh, by, zz) for o in f(a, b)
    ]
    for src, lo, hi in ((np.asarray(a), lo_a, hi_a),
                        (np.asarray(b), lo_b, hi_b)):
        blocks = src.reshape(m, bx, by, zz)
        np.testing.assert_array_equal(lo[1:], blocks[:-1, bx - gh:])
        np.testing.assert_array_equal(lo[0], 0.0)
        np.testing.assert_array_equal(hi[:-1], blocks[1:, :gh])
        np.testing.assert_array_equal(hi[-1], 0.0)


def test_rdma_exchange_single_shard_is_zero():
    """m == 1: no neighbours — both slabs are the Dirichlet zeros."""
    mesh = make_mesh((1, 1, 1))
    u = jnp.ones((16, 8, 128), jnp.float32)

    def body(u):
        idx = jax.lax.axis_index("x").astype(jnp.int32).reshape(1, 1)
        return tuple(
            pallas_spmd.rdma_exchange(
                [u], idx, pallas_spmd._GH, 128, 1, interpret=True
            )
        )

    lo, hi = jax.jit(
        _shard_map(body, mesh=mesh, in_specs=(P("x"),),
                   out_specs=(P("x"), P("x")))
    )(u)
    np.testing.assert_array_equal(np.asarray(lo), 0.0)
    np.testing.assert_array_equal(np.asarray(hi), 0.0)


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
def test_rdma_solve_matches_ppermute_engine(mode, gamma, mesh_shape):
    """Full solves over x-split meshes: the rdma-halo engine must
    reproduce the ppermute engine's residual history exactly (identical
    compute kernels consuming identical slab values)."""
    params = _params(mode, gamma)
    mesh = make_mesh(mesh_shape)
    _, hist_pp, _ = solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas", halo="ppermute"
    )
    _, hist_rd, plan = solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas", halo="rdma"
    )
    assert plan.fused_down_levels or plan.fused_up_levels or any(
        plan.ps_levels
    ), "geometry must engage the trapezoid/Pallas paths"
    np.testing.assert_allclose(
        np.asarray(hist_rd), np.asarray(hist_pp), rtol=1e-6
    )


def test_rdma_newton_matches_ppermute_engine():
    params = _params(Mode.NEWTON, 1.0, grid=(63, 63, 255), maxiter=2)
    mesh = make_mesh((2, 1, 1))
    _, hist_pp, _ = newton_solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas", halo="ppermute"
    )
    _, hist_rd, _ = newton_solve_spmd(
        params, mesh, cutoff=2, local_backend="pallas", halo="rdma"
    )
    np.testing.assert_allclose(
        np.asarray(hist_rd), np.asarray(hist_pp), rtol=1e-6
    )


def test_rdma_rejects_bad_halo():
    from gpusolve_tpu.dist.spmd import build_spmd_solver

    with pytest.raises(ValueError, match="halo"):
        build_spmd_solver(
            _params(Mode.LINEAR, 0.0), make_mesh((2, 1, 1)), halo="wat"
        )
