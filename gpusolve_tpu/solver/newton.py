"""Outer Newton iteration for ``-Δu + γ·u·e^u = f`` (mode 2).

Reference: src/cpu/NewtonSolver.cpp (GPU mirror src/sycl/NewtonSolver.cpp).
Each outer step solves the Jacobian system ``J(ũ)·e = F(ũ)`` with a short
inner linear multigrid solve (maxiter=10, tol=0.1) where the smoother and
residual use the frozen linearisation point ``ũ`` (= newton_v), then updates
``ũ += e``.

Behavioral quirks reproduced exactly (see SURVEY.md §7):
  * ``findError`` restricts newton_v only to levels 1..numLevels-2 — never the
    coarsest (src/cpu/NewtonSolver.cpp:88-92), so the coarsest level's Newton
    terms use a stale/zero linearisation point.
  * compF is (re)invoked at the top of each outer iteration and again for the
    convergence measurement (src/cpu/NewtonSolver.cpp:21,26).
  * The inner solve silences progress printing and restores maxiter/tol after
    (src/cpu/NewtonSolver.cpp:94-104) — here that's just a params.replace,
    and thanks to trace_params() it reuses the same compiled V-cycle.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.grid import GridState
from gpusolve_tpu.ops import dispatch as ops
from gpusolve_tpu.solver import vcycle as vc
from gpusolve_tpu.utils.timer import Timer


@functools.partial(jax.jit, static_argnames=("params",))
def comp_f(
    state: GridState, params: GridParams
) -> Tuple[GridState, jax.Array]:
    """Nonlinear residual F = newton_f − (A·ũ/h² + γ·ũ·e^ũ) on the finest
    level, stored into level-0 f; returns its L2 norm (reference:
    src/cpu/NewtonSolver.cpp:48-81).

    Implemented as the NONLINEAR-mode residual evaluated at v=ũ with the
    original RHS — identical algebra, and it reuses the residual kernel on
    the Pallas path.  The dead donor buffer is the stale level-0 f (its halo
    is zero; the reference also writes interior f only, NewtonSolver.cpp:72).
    """
    lvl = state.levels[0]
    h = params.level_h(0)
    nl_params = dataclasses.replace(params, mode=Mode.NONLINEAR)
    F, sumsq = ops.residual_op(
        lvl.f, lvl.newton_v, state.newton_f, params.level_dims()[0],
        nl_params, h, with_norm=True,
    )
    levels = (dataclasses.replace(lvl, f=F),) + state.levels[1:]
    return dataclasses.replace(state, levels=levels), jnp.sqrt(sumsq)


@functools.partial(jax.jit, static_argnames=("params", "shardings"))
def _prepare_find_error(
    state: GridState, params: GridParams, shardings: Optional[Tuple] = None
) -> GridState:
    """Zero the finest v and restrict newton_v down to levels 1..L-2
    (reference: src/cpu/NewtonSolver.cpp:22,88-92)."""
    levels = list(state.levels)
    levels[0] = dataclasses.replace(
        levels[0], v=jnp.zeros_like(levels[0].v)
    )
    dims = params.level_dims()
    for i in range(1, len(levels) - 1):
        nv = ops.restrict_op(
            levels[i].newton_v, levels[i - 1].newton_v,
            dims[i - 1], dims[i], params,
        )
        if shardings is not None and shardings[i] is not None:
            nv = jax.lax.with_sharding_constraint(nv, shardings[i])
        levels[i] = dataclasses.replace(levels[i], newton_v=nv)
    return dataclasses.replace(state, levels=tuple(levels))


@functools.partial(jax.jit, static_argnames=("params",))
def _update_newton_v(state: GridState, params: GridParams) -> GridState:
    """newton_v += v on the finest level (reference:
    src/cpu/NewtonSolver.cpp:106-107)."""
    lvl = state.levels[0]
    levels = (
        dataclasses.replace(lvl, newton_v=lvl.newton_v + lvl.v),
    ) + state.levels[1:]
    return dataclasses.replace(state, levels=levels)


def _needs_pipeline_sync(params: GridParams) -> bool:
    """True for grids whose NEWTON state is large enough that letting
    several whole-hierarchy programs pile up in the async dispatch queue
    has exhausted device memory (observed at 511^3: ~4.6 GB of state,
    5 arrays/level + newton_f)."""
    nx, ny, nz = params.grid_dim
    return nx * ny * nz >= 2 ** 26


def find_error(
    state: GridState,
    params: GridParams,
    shardings: Optional[Tuple] = None,
    timer: Optional[Timer] = None,
    f_norm: Optional[float] = None,
) -> GridState:
    """Solve J(ũ)·e = F with a short inner MG solve and update ũ
    (reference: src/cpu/NewtonSolver.cpp:83-108).

    ``f_norm``: ||F||₂ from the preceding comp_f, if the caller has it.
    The inner system starts at e = 0, so its initial residual is
    ``f - A·0 - γ(1+nv)·0·e^nv = F`` exactly — passing the norm skips
    vc.solve's whole-volume initial residual pass (one less full-grid
    program per Newton step, and at 511³ the program that tipped the
    tunneled allocator over: ~4.6 GB of NEWTON state plus several
    in-flight whole-hierarchy programs exhausted device memory)."""
    tp = vc.trace_params(params, shardings)
    state = _prepare_find_error(state, params=tp, shardings=shardings)
    if f_norm is None and _needs_pipeline_sync(params):
        # Big-grid async-dispatch serialization (see f_norm above): a
        # scalar fetch from the (tiny) coarsest level retires the
        # enqueued programs before the inner solve enqueues its own.
        float(state.levels[-1].v[0, 0, 0])
    inner = params.replace(maxiter=10, tol=0.1, print_progress=False)
    # Batch all inner cycles into one wavefront launch (the in-kernel
    # tol=0.1 early stop preserves the reference's inner-solve behavior,
    # src/cpu/NewtonSolver.cpp:94-104) — 2 launches per Newton step
    # instead of ~11.
    state, _ = vc.solve(
        state, inner, shardings=shardings, timer=timer,
        check_every=inner.maxiter, initial_residual=f_norm,
    )
    return _update_newton_v(state, params=tp)


@functools.partial(
    jax.jit,
    static_argnames=("params", "k", "interpret"),
    donate_argnums=(0,),
)
def _newton_batch(
    state: GridState, fn0, thr_outer, nsteps,
    params: GridParams, k: int, interpret: bool,
):
    """Up to ``k`` outer Newton steps in ONE device dispatch.

    Entry contract: level-0 ``f`` already holds F(ũ) (the preceding comp_f)
    and ``fn0`` is its norm.  Each step = restrict ũ / zero v
    (_prepare_find_error), inner 10-cycle tol-0.1 NEWTON multigrid as one
    wavefront mega-kernel batch (the in-kernel early stop reproduces the
    reference's per-cycle inner check, src/cpu/NewtonSolver.cpp:94-104),
    ũ += v, then comp_f for the next step's RHS + the outer residual.

    Steps after convergence (or past ``nsteps``) are skipped via lax.cond —
    the state is frozen exactly where the unbatched loop would stop, and
    their residual slots return -1 (the mega-kernel batch sentinel).
    ``thr_outer`` carries the 2-ulp up-bias of _solve_fused2 so the device
    gate stops whenever the host criterion would; the host re-checks every
    returned norm, so batching changes dispatch count, not results.
    (One knife-edge caveat: the inner threshold is derived in f32 on
    device vs f64-then-cast on the host path — a 1-ulp difference that
    could flip an inner early-stop in measure-zero cases.  Measured
    bit-identical on chip at 63³; the outer gate is exact either way.)
    """
    from gpusolve_tpu.ops import pallas_vcycle2 as pv2

    mode = params.mode
    f32 = jnp.float32
    ten = jnp.full((1, 1), 10, jnp.int32)

    def one_step(state, fn):
        state = _prepare_find_error(state, params=params)
        # Inner threshold: (||F||·tol_inner)² with the same 2-ulp up-bias
        # _solve_fused2 applies host-side (stop whenever the host would).
        t = (fn.astype(f32) * f32(0.1)) ** 2
        t = jnp.nextafter(jnp.nextafter(t, f32(jnp.inf)), f32(jnp.inf))
        outs = pv2.batch_call(
            vc._pack_levels(state, mode), params, 10, ten,
            t.reshape(1, 1), interpret=interpret,
        )
        state = vc._unpack_levels(state, outs[:-1], mode)
        state = _update_newton_v(state, params=params)
        return comp_f(state, params=params)

    def skip(state, fn):
        return state, jnp.asarray(-1.0, fn0.dtype)

    done = jnp.bool_(False)
    fn = fn0
    ress = []
    for s in range(k):
        done = done | (jnp.int32(s) >= nsteps)
        state, res = jax.lax.cond(done, skip, one_step, state, fn)
        ress.append(res)
        done = done | ((res >= 0) & (res <= thr_outer))
        fn = res
    return state, jnp.stack(ress)


def _newton_solve_batched(
    state: GridState,
    params: GridParams,
    tp: GridParams,
    timer: Optional[Timer],
    initial: float,
    history: List[float],
    fn: Optional[float],
    k: int,
) -> Tuple[GridState, List[float]]:
    """Outer Newton loop with ``check_every``-batched steps: one dispatch +
    one scalar fetch per batch instead of (2 comp_f fetches + an inner-solve
    fetch) per step.  Residual history and final state match the unbatched
    loop (see _newton_batch)."""
    import numpy as np

    interpret = jax.default_backend() not in ("tpu", "axon")
    thr_np = np.float32(initial / (1.0 / params.tol))
    thr_np = np.nextafter(
        np.nextafter(thr_np, np.float32(np.inf), dtype=np.float32),
        np.float32(np.inf), dtype=np.float32,
    )
    if fn is None:
        # Checkpoint-resume entry: level-0 f is stale — run the comp_f the
        # unbatched loop would (reference :21).
        state, fnj = comp_f(state, params=tp)
        fn = float(fnj)

    fnkey = ("newton_batch", tp, k, interpret, vc._state_key(state))
    fn_c = vc._compiled_cycles.get(fnkey)
    if fn_c is None:
        t0 = time.perf_counter()
        fn_c = _newton_batch.lower(
            state, jnp.float32(0), jnp.float32(0), jnp.int32(0),
            params=tp, k=k, interpret=interpret,
        ).compile()
        if timer is not None:
            timer.add("compile", time.perf_counter() - t0)
        vc._compiled_cycles[fnkey] = fn_c

    i = 0
    done = False
    while i < params.maxiter and not done:
        m = min(k, params.maxiter - i)
        t0 = time.perf_counter()
        state, ress = fn_c(
            state, np.float32(fn), thr_np, np.int32(m)
        )
        if timer is not None:
            with timer.section("sumBuffer"):
                arr = np.asarray(ress)
        else:
            arr = np.asarray(ress)
        batch_ms = (time.perf_counter() - t0) * 1000.0
        executed = [float(x) for x in arr if x >= 0.0]
        if not executed:  # defensive: batch must run >= 1 step
            break
        per_ms = int(batch_ms / len(executed))
        for res in executed:
            history.append(res)
            if params.print_progress:
                line = (
                    f"newton iter: {i} residual: {res:.6g} Took {per_ms}ms"
                )
                if timer is not None:
                    line += timer.suffix()
                print(line)
            i += 1
            fn = res
            if res <= initial / (1.0 / params.tol):
                done = True
                break
    return state, history


def newton_solve(
    state: GridState,
    params: GridParams,
    shardings: Optional[Tuple] = None,
    timer: Optional[Timer] = None,
    initial_residual: Optional[float] = None,
    check_every: int = 1,
) -> Tuple[GridState, List[float]]:
    """Outer Newton loop (reference: src/cpu/NewtonSolver.cpp:10-44).

    The solution is accumulated in level-0 newton_v.  Returns the final state
    and the outer residual history ``[initial, res_0, ...]``.

    ``initial_residual``: checkpoint-resume fidelity — when given, the stop
    threshold uses the original run's initial residual (see
    gpusolve_tpu.solver.vcycle.solve) and the returned history omits the
    leading entry.

    ``check_every=k`` batches up to k outer Newton steps (comp_f + inner
    solve + update) into ONE device dispatch wherever the wavefront
    mega-kernel is eligible — the in-dispatch convergence gate freezes the
    state exactly where the per-step loop would stop, so history and final
    state are unchanged (see _newton_batch).
    """
    assert params.mode == Mode.NEWTON
    assert state.newton_f is not None, "build_grid must run in NEWTON mode"
    if timer is None and params.print_progress:
        timer = Timer()
    tp = vc.trace_params(params, shardings)

    fn0 = None
    if initial_residual is None:
        state, initial_j = comp_f(state, params=tp)
        initial = float(initial_j)
        if params.print_progress:
            print(f"Inital newton residual: {initial:.6g}")
        history = [initial]
        fn0 = initial  # F is in level-0 f; its norm seeds the first step
    else:
        initial = float(initial_residual)
        history = []

    if check_every > 1 and vc.use_fused2(params, shardings):
        return _newton_solve_batched(
            state, params, tp, timer, initial, history, fn0,
            max(1, min(check_every, params.maxiter)),
        )

    for i in range(params.maxiter):
        t0 = time.perf_counter()
        state, fn = comp_f(state, params=tp)
        # ||F|| doubles as the inner solve's initial residual (the inner
        # system starts at e = 0) — see find_error's f_norm note.
        state = find_error(
            state, params, shardings=shardings, timer=timer,
            f_norm=float(fn),
        )
        state, res = comp_f(state, params=tp)
        if timer is not None:
            with timer.section("sumBuffer"):
                res = float(res)
        else:
            res = float(res)
        history.append(res)
        if params.print_progress:
            ms = int((time.perf_counter() - t0) * 1000)
            line = f"newton iter: {i} residual: {res:.6g} Took {ms}ms"
            if timer is not None:
                line += timer.suffix()
            print(line)
        if res <= initial / (1.0 / params.tol):
            break
    return state, history
