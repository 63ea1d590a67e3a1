"""Multigrid V-cycle driver (linear and nonlinear-FAS) and the solve loop.

Reference semantics: src/cpu/CpuSolver.cpp (the numerical oracle) and its GPU
mirror src/sycl/SyclSolver.cpp.  TPU-native structure: the level loop is
unrolled at trace time (each level has static shapes), the entire V-cycle —
smoothing, residual, transfers, norm — is one jitted computation, and the
once-per-cycle scalar norm fetch is the only host synchronisation (the same
async profile the reference GPU backend gets from its sub-queue scheduler,
src/sycl/SyclSolver.cpp:86-162, sync point :361-374).

Multi-chip: pass ``shardings`` (one ``jax.sharding.Sharding`` per level, or
None entries for replicated coarse levels) and the same traced code runs SPMD
over a device mesh — GSPMD inserts halo-exchange collective-permutes for the
stencil slice shifts.  See gpusolve_tpu.dist.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.grid import GridLevel, GridState
from gpusolve_tpu.ops import dispatch as ops
from gpusolve_tpu.utils.timer import Timer


def trace_params(params: GridParams) -> GridParams:
    """Normalise fields the traced computation never reads (maxiter, tol,
    print_progress) so jit caches hit across outer/inner solves — the Newton
    driver temporarily overrides maxiter/tol (src/cpu/NewtonSolver.cpp:94-104)
    and must not trigger a recompile."""
    return dataclasses.replace(
        params, maxiter=0, tol=0.0, print_progress=False
    )


def _constrain(arr, shardings, i):
    if shardings is None or shardings[i] is None:
        return arr
    return jax.lax.with_sharding_constraint(arr, shardings[i])


def _jacobi_level(
    level: GridLevel, params: GridParams, h: float, n_iter: int
) -> GridLevel:
    v = ops.jacobi(
        level.v, level.f, params, h, n_iter, newton_v=level.newton_v
    )
    return dataclasses.replace(level, v=v)


@functools.partial(jax.jit, static_argnames=("params", "shardings"))
def vcycle(
    state: GridState,
    params: GridParams,
    shardings: Optional[Tuple] = None,
) -> Tuple[GridState, jax.Array]:
    """One V-cycle; returns the updated state and the finest-level residual
    norm (reference: src/cpu/CpuSolver.cpp:85-139)."""
    levels: List[GridLevel] = list(state.levels)
    nlev = len(levels)
    hs = [params.level_h(i) for i in range(nlev)]
    fas = params.mode == Mode.NONLINEAR

    # Down-leg (reference :87-114).
    for i in range(nlev - 1):
        levels[i] = _jacobi_level(
            levels[i], params, hs[i], params.pre_smoothing
        )
        r, _ = ops.residual(
            levels[i].v,
            levels[i].f,
            params,
            hs[i],
            newton_v=levels[i].newton_v,
        )
        levels[i] = dataclasses.replace(levels[i], r=r)

        nxt = levels[i + 1]
        f_next = _constrain(
            ops.restrict_full_weighting(r, nxt.f.shape), shardings, i + 1
        )
        if not fas:
            v_next = jnp.zeros_like(nxt.v)
            levels[i + 1] = dataclasses.replace(nxt, f=f_next, v=v_next)
        else:
            # FAS tau correction (reference :100-113): restrict v into both
            # restV and v, add the coarse operator applied to it onto f.
            rest_v = _constrain(
                ops.restrict_full_weighting(levels[i].v, nxt.v.shape),
                shardings,
                i + 1,
            )
            a_coarse = ops.apply_stencil_fas(rest_v, params, hs[i + 1])
            levels[i + 1] = dataclasses.replace(
                nxt,
                f=f_next + a_coarse,
                v=rest_v,
                rest_v=rest_v,
                r=a_coarse,
            )

    # Coarsest level: smoothing only, no direct solve (reference :117).
    levels[nlev - 1] = _jacobi_level(
        levels[nlev - 1],
        params,
        hs[nlev - 1],
        params.pre_smoothing + params.post_smoothing,
    )

    # Up-leg (reference :119-135).
    for i in range(nlev - 1, 0, -1):
        if fas:
            levels[i] = dataclasses.replace(
                levels[i], v=levels[i].v - levels[i].rest_v
            )
        e = _constrain(
            ops.interpolate(levels[i].v, levels[i - 1].v.shape),
            shardings,
            i - 1,
        )
        levels[i - 1] = dataclasses.replace(
            levels[i - 1], e=e, v=levels[i - 1].v + e
        )
        levels[i - 1] = _jacobi_level(
            levels[i - 1], params, hs[i - 1], params.post_smoothing
        )

    # Final residual (reference :138).
    r0, sumsq = ops.residual(
        levels[0].v, levels[0].f, params, hs[0], newton_v=levels[0].newton_v
    )
    levels[0] = dataclasses.replace(levels[0], r=r0)
    return (
        dataclasses.replace(state, levels=tuple(levels)),
        jnp.sqrt(sumsq),
    )


@functools.partial(jax.jit, static_argnames=("params",))
def residual_norm(
    state: GridState, params: GridParams
) -> Tuple[GridState, jax.Array]:
    """Residual at the finest level, storing r (reference compResidual,
    src/cpu/CpuSolver.cpp:45-83)."""
    lvl = state.levels[0]
    r, sumsq = ops.residual(
        lvl.v, lvl.f, params, params.level_h(0), newton_v=lvl.newton_v
    )
    levels = (dataclasses.replace(lvl, r=r),) + state.levels[1:]
    return dataclasses.replace(state, levels=levels), jnp.sqrt(sumsq)


def solve(
    state: GridState,
    params: GridParams,
    shardings: Optional[Tuple] = None,
    timer: Optional[Timer] = None,
) -> Tuple[GridState, List[float]]:
    """Iterate V-cycles until ``res <= initialResidual·tol`` or maxiter
    (reference: src/cpu/CpuSolver.cpp:12-43; the stop test is written
    ``initial / (1.0/tol)`` at :39 and reproduced verbatim).

    Returns the final state and the residual history
    ``[initial, res_0, res_1, ...]``.
    """
    tp = trace_params(params)
    state, initial = residual_norm(state, params=tp)
    initial = float(initial)
    if params.print_progress:
        print(f"Inital residual: {initial:.6g}")

    history = [initial]
    for i in range(params.maxiter):
        t0 = time.perf_counter()
        state, res = vcycle(state, params=tp, shardings=shardings)
        res = float(res)  # the once-per-cycle device sync
        history.append(res)
        if params.print_progress:
            ms = int((time.perf_counter() - t0) * 1000)
            line = f"iter: {i} residual: {res:.6g} Took {ms}ms"
            if timer is not None:
                line += timer.suffix()
            print(line)
        if res <= initial / (1.0 / params.tol):
            break
    return state, history
