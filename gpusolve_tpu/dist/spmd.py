"""Explicit-halo SPMD multigrid engine (``shard_map`` + ``lax.ppermute``).

This is the hand-scheduled counterpart of the GSPMD path in
gpusolve_tpu.dist: the whole V-cycle runs inside one ``shard_map`` region
where every stencil application assembles its ghost cells via explicit
face-plane ``ppermute`` exchanges (SURVEY.md §2.3's plan), norms reduce with
``psum``, and coarse levels below the distribution cutoff are consolidated to
a replicated layout with ``all_gather`` (the multigrid analogue of
pipeline-stage consolidation).

All three solver modes run distributed: LINEAR, NONLINEAR (FAS tau
correction, restriction of v into coarse v and rest_v, up-leg ``v - restV``
— reference src/cpu/CpuSolver.cpp:100-113, :121-125) and NEWTON (frozen
``newton_v`` streamed per level; the outer driver ``newton_solve_spmd``
mirrors src/cpu/NewtonSolver.cpp:10-44,83-108).

Compute/communication overlap: smoother and residual stencils are computed
from the *local* block alone (zero-padded shifts — every cell not on a shard
face), with the six ghost face contributions added afterwards.  The ghost
``ppermute``s carry no data dependency on the interior compute, so XLA is
free to overlap them with the dominant local stencil work; only the thin
face updates wait on the wires (SURVEY §2.3 row 4).  Stencils with corner
taps fall back to the fully assembled ghost-extended form.

Design notes
  * Distributed levels use a *mesh-aware* allocation: per axis,
    ``A0 = round_up(max_l (n_l+2)·2^l, mesh·2^(D-1))`` so each coarser level
    halves exactly (``A_l = A0/2^l``), which keeps restriction/prolongation
    shard-local given a one-cell ghost (fine block = 2 × coarse block).
  * ``ppermute`` writes zeros where no peer sends — exactly the Dirichlet
    zero boundary, so global edges need no special casing.
  * Levels below the cutoff are replicated: every shard redundantly runs the
    plain single-device ops (ops.xla) on gathered arrays.

Reference numerics: src/cpu/CpuSolver.cpp (cited per op in ops/xla.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.grid import alloc_shape
from gpusolve_tpu.ops import pallas_spmd
from gpusolve_tpu.ops import xla

_AXES = ("x", "y", "z")


def interpret_sync_capacity() -> int:
    """Max simulated devices that may block on one another INSIDE a single
    interpret-mode Pallas kernel (in-kernel remote DMAs / semaphore waits).

    The XLA CPU client executes device programs on a thread pool sized to
    the host's CPU count.  A kernel group whose members wait on each
    other's in-kernel semaphore signals needs every member resident at
    once; with more devices than pool threads the resident programs block
    in waits for programs that can never be scheduled — a permanent
    deadlock, not slowness (observed: on a 4-CPU host the 8-device pod
    kernels hang in ``interpret_pallas_call._allocate_buffer`` while
    4-device ones pass; root cause of the round-3 driver's
    MULTICHIP_r03 rc=124).  XLA collectives (ppermute/psum) are NOT
    affected — the runtime parks those without holding a pool thread.

    ``GPUSOLVE_INTERPRET_SYNC_CAPACITY`` overrides (tests, bigger rigs).
    """
    cap = os.environ.get("GPUSOLVE_INTERPRET_SYNC_CAPACITY")
    if cap:
        return int(cap)
    # sched_getaffinity reflects cgroup quotas / CPU pinning — the number
    # of threads that can actually run concurrently — where cpu_count()
    # reports physical CPUs and can overestimate on containers.
    try:
        return len(os.sched_getaffinity(0)) or 1
    except (AttributeError, OSError):  # non-Linux
        return os.cpu_count() or 1


def gate_interpret_sync(n_devices: int, what: str) -> None:
    """Raise instead of deadlocking when an in-kernel-RDMA engine is asked
    to simulate more mutually-blocking devices than the host can run."""
    cap = interpret_sync_capacity()
    if n_devices > cap:
        raise RuntimeError(
            f"{what} uses in-kernel remote DMAs: interpret mode must run "
            f"all {n_devices} simulated devices concurrently, but this "
            f"host's XLA CPU thread pool supports only {cap} "
            f"(effective CPU count).  Running it would deadlock, not just be "
            f"slow.  Use a mesh with <= {cap} devices, the ppermute-halo "
            f"leg engine (fuse='leg', halo='ppermute' — XLA collectives "
            f"don't hold pool threads), or set "
            f"GPUSOLVE_INTERPRET_SYNC_CAPACITY on a larger host."
        )


def _shard_map(f, mesh, in_specs, out_specs, check_rep=False):
    """Version-tolerant shard_map wrapper (jax.shard_map uses check_vma)."""
    try:
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as sm

        return sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check_rep,
        )


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class SpmdPlan:
    """Static decomposition plan: which levels are distributed, and the
    mesh-aware allocation/block shapes per level.

    TPU-native 3-D torus mapping: the z data axis is the vector lane axis
    and is never split (a z split would shrink every vector op's lane
    occupancy and break the kernels' 128-lane DMA tiling —
    ops/pallas_spmd docstring).  A z mesh axis is instead FOLDED into the
    y data decomposition: the y axis of the grid shards over the
    flattened ``('y', 'z')`` device-axis pair, so its halo collectives
    ride the z-axis ICI links too.  ``mesh_shape`` below is the DATA
    decomposition shape ``(mx, my*mz, 1)``; the raw device mesh stays in
    ``device_mesh``."""

    def __init__(self, params: GridParams, mesh_shape, cutoff: int = 4,
                 force_nd: Optional[int] = None):
        self.params = params
        self.device_mesh = tuple(mesh_shape)
        mesh_shape = (mesh_shape[0], mesh_shape[1] * mesh_shape[2], 1)
        self.names = (
            "x",
            ("y", "z") if self.device_mesh[2] > 1 else "y",
            "z",
        )
        self.mesh_shape = tuple(mesh_shape)
        dims = params.level_dims()
        nlev = len(dims)

        # Deepest level that still has >= cutoff interior points per shard
        # along every axis.
        d = 0
        while d < nlev and all(
            dims[d][a] // self.mesh_shape[a] >= cutoff for a in range(3)
        ):
            d += 1
        # Keep at least the coarsest level replicated (it receives the
        # consolidated hierarchy), and require the finest to be shardable.
        self.n_dist = min(max(d, 1), nlev - 1) if all(
            dims[0][a] >= self.mesh_shape[a] for a in range(3)
        ) else 0
        if self.n_dist == 0:
            raise ValueError(
                f"grid {dims[0]} too small for mesh {self.mesh_shape}"
            )
        if force_nd is not None:
            # Tail-consolidation mode (round 5): a SHALLOW distributed
            # prefix feeding a pv2 mega-kernel tail.  The allocation
            # granularity guarantees every distributed level's block is
            # 16-aligned per axis (all fused-leg DMA gates pass) and the
            # junction's halved block is 8-aligned.
            self.n_dist = min(force_nd, self.n_dist)
        self.force_nd = force_nd

        # Mesh-aware allocation for the distributed levels.
        self.alloc: List[Tuple[int, int, int]] = []
        a0 = []
        gran = (
            16 << max(self.n_dist - 1, 0) if force_nd is not None
            else 1 << self.n_dist
        )
        for ax in range(3):
            need = max(
                (dims[l][ax] + 2) << l for l in range(self.n_dist)
            )
            # One extra factor of 2 beyond the halving chain so the last
            # distributed level's *block* is still even (its restriction
            # into the consolidated replicated level halves shard-locally).
            a0.append(
                _round_up(need, self.mesh_shape[ax] * gran)
            )
        for l in range(self.n_dist):
            self.alloc.append(tuple(a >> l for a in a0))
        # Replicated levels use the plain aligned allocation.
        for l in range(self.n_dist, nlev):
            self.alloc.append(alloc_shape(dims[l]))

        self.block = [
            tuple(self.alloc[l][a] // self.mesh_shape[a] for a in range(3))
            for l in range(self.n_dist)
        ]
        self.dims = dims
        self.nlev = nlev


def _face_ghosts(u, mesh_shape, axes=(0, 1, 2), names=_AXES):
    """Collect the neighbour face planes (one ppermute pair per axis).

    Returns ``[(lo_ghost, hi_ghost)] * len(axes)`` where ``lo_ghost`` is the
    plane just below the block (sent by the lower neighbour; zeros at the
    global edge — the Dirichlet boundary)."""
    out = []
    for ax in axes:
        name = names[ax]
        m = mesh_shape[ax]
        lo_idx = [slice(None)] * u.ndim
        lo_idx[ax] = slice(0, 1)
        hi_idx = [slice(None)] * u.ndim
        hi_idx[ax] = slice(u.shape[ax] - 1, u.shape[ax])
        if m > 1:
            fwd = [(i, i + 1) for i in range(m - 1)]
            bwd = [(i + 1, i) for i in range(m - 1)]
            lo_ghost = lax.ppermute(u[tuple(hi_idx)], name, fwd)
            hi_ghost = lax.ppermute(u[tuple(lo_idx)], name, bwd)
        else:
            lo_ghost = jnp.zeros_like(u[tuple(lo_idx)])
            hi_ghost = jnp.zeros_like(u[tuple(hi_idx)])
        out.append((lo_ghost, hi_ghost))
    return out


def _halo_exchange(u, mesh_shape, axes=(0, 1, 2), names=_AXES):
    """Ghost-extend a local block by one cell per face via ppermute.

    Exchanges are sequential per axis ON the partially extended block, so
    later axes forward earlier axes' ghosts — that is what fills the edge
    and corner ghost cells the 27-point transfers read."""
    for ax in axes:
        name = names[ax]
        m = mesh_shape[ax]
        lo_idx = [slice(None)] * u.ndim
        lo_idx[ax] = slice(0, 1)
        hi_idx = [slice(None)] * u.ndim
        hi_idx[ax] = slice(u.shape[ax] - 1, u.shape[ax])
        if m > 1:
            fwd = [(i, i + 1) for i in range(m - 1)]
            bwd = [(i + 1, i) for i in range(m - 1)]
            lo_ghost = lax.ppermute(u[tuple(hi_idx)], name, fwd)
            hi_ghost = lax.ppermute(u[tuple(lo_idx)], name, bwd)
        else:
            lo_ghost = jnp.zeros_like(u[tuple(lo_idx)])
            hi_ghost = jnp.zeros_like(u[tuple(hi_idx)])
        u = jnp.concatenate([lo_ghost, u, hi_ghost], axis=ax)
    return u


def _global_start(block, axis_name):
    return lax.axis_index(axis_name) * block


def _clean_level(plan, l, u):
    """Zero the unwritten lane tail of a Pallas-level array (annotated on
    the plan by build_spmd_solver) before a jnp consumer reads it."""
    ps = getattr(plan, "ps_levels", None)
    if ps and l < len(ps) and ps[l]:
        zz = plan.zz_live[l]
        if zz < plan.block[l][2]:
            zi = lax.broadcasted_iota(jnp.int32, u.shape, 2)
            return jnp.where(zi < zz, u, jnp.zeros_like(u))
    return u


def _interior_mask(plan: SpmdPlan, l: int, dtype):
    """True on cells whose *global* index is interior ([1, n] per axis)."""
    bx, by, bz = plan.block[l]
    nx, ny, nz = plan.dims[l]
    gx = _global_start(bx, plan.names[0]) + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 0
    )
    gy = _global_start(by, plan.names[1]) + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 1
    )
    gz = jnp.int32(0) + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 2
    )
    keep = (
        (gx >= 1) & (gx <= nx)
        & (gy >= 1) & (gy <= ny)
        & (gz >= 1) & (gz <= nz)
    )
    return keep


def _face_taps_only(stencil) -> bool:
    return all(
        sum(1 for o in off if o) <= 1 for off in stencil.offsets
    )


def _shifted_local(v, off, block):
    """v shifted by -off with zero fill (the local-only tap value)."""
    tap = v
    for ax, o in enumerate(off):
        if o:
            pad = [(0, 0)] * 3
            sl = [slice(None)] * 3
            if o > 0:
                pad[ax] = (0, o)
                sl[ax] = slice(o, o + block[ax])
            else:
                pad[ax] = (-o, 0)
                sl[ax] = slice(0, block[ax])
            tap = jnp.pad(tap, pad)[tuple(sl)]
    return tap


def _stencil_overlap(v, ghosts, stencil, inv_h2, block):
    """A·v/h² computed local-first: the interior stencil uses only the local
    block (no dependency on the ppermutes), then each face tap's ghost
    contribution is added on its boundary plane — the structure that lets
    XLA overlap the halo exchange with the dominant interior compute."""
    acc = None
    for val, off in zip(stencil.values, stencil.offsets):
        term = val * _shifted_local(v, off, block)
        acc = term if acc is None else acc + term
    for val, off in zip(stencil.values, stencil.offsets):
        axes = [a for a in range(3) if off[a]]
        if not axes:
            continue
        ax = axes[0]
        o = off[ax]
        sl = [slice(None)] * 3
        if o > 0:
            sl[ax] = slice(block[ax] - 1, block[ax])
            g = ghosts[ax][1]
        else:
            sl[ax] = slice(0, 1)
            g = ghosts[ax][0]
        acc = acc.at[tuple(sl)].add(val * g)
    return acc * inv_h2


def _stencil_assembled(asm, stencil, inv_h2, block):
    """Σ s·asm[1+o : 1+o+b] / h² on a ghost-extended block (fallback for
    stencils with corner taps)."""
    bx, by, bz = block
    acc = None
    for val, (ox, oy, oz) in zip(stencil.values, stencil.offsets):
        tap = asm[
            1 + ox : 1 + ox + bx, 1 + oy : 1 + oy + by, 1 + oz : 1 + oz + bz
        ]
        term = val * tap
        acc = term if acc is None else acc + term
    return acc * inv_h2


def _restrict_factor(fe: int, cb: int, dtype):
    """(fe, cb) separable full-weighting factor: coarse local j reads
    assembled fine rows 2j+1+d, d ∈ {-1,0,1}, weights 1/4,1/2,1/4."""
    ff = lax.broadcasted_iota(jnp.int32, (fe, cb), 0)
    cc = lax.broadcasted_iota(jnp.int32, (fe, cb), 1)
    d = ff - (2 * cc + 1)
    w = jnp.where(d == 0, 0.5, 0.0)
    w = jnp.where((d == -1) | (d == 1), 0.25, w)
    return w.astype(dtype)


def _contract(arr, w, ax):
    out = jnp.tensordot(
        arr, w, axes=([ax], [0]), precision=lax.Precision.HIGHEST
    )
    return jnp.moveaxis(out, -1, ax)


def _restrict_local(asm_fine, cblock):
    """27-point full weighting on a ghost-extended fine block; coarse local
    cell j reads assembled fine 2j+d+1 (fine block = 2 × coarse block).
    Expressed as three separable matrix contractions — MXU matmuls on TPU
    instead of the pathological stride-2 gather lowering."""
    out = asm_fine
    for ax in range(3):
        out = _contract(
            out, _restrict_factor(out.shape[ax], cblock[ax], out.dtype), ax
        )
    return out


def _prolong_factor(ce: int, fb: int, dtype):
    """(ce, fb) separable trilinear factor:
    ``e[p] = 0.5·(asm[(p+2)//2] + asm[(p+3)//2])`` (injection at even p,
    midpoint at odd — both parities of the repeat-and-average form)."""
    cc = lax.broadcasted_iota(jnp.int32, (ce, fb), 0)
    pp = lax.broadcasted_iota(jnp.int32, (ce, fb), 1)
    w = jnp.where(cc == (pp + 2) // 2, 0.5, 0.0) + jnp.where(
        cc == (pp + 3) // 2, 0.5, 0.0
    )
    return w.astype(dtype)


def _prolong_local(asm_coarse, fblock):
    """Trilinear prolongation in padded-global coordinates: with
    ``E[m] = 0.5·(R'[m] + R'[m+1])`` for ``R'[k] = C[k//2]`` (exact for both
    parities — injection at even m, midpoint at odd m), a shard whose fine
    block starts at global ``sf = 2·sc`` and whose assembled coarse slab
    starts at ``sc-1`` gets ``e_local[p] = 0.5·(R[p+2] + R[p+3])`` with
    ``R = element-repeat(assembled coarse, 2)`` — expressed as separable
    matrix contractions (MXU matmuls on TPU)."""
    out = asm_coarse
    for ax in range(3):
        out = _contract(
            out, _prolong_factor(out.shape[ax], fblock[ax], out.dtype), ax
        )
    return out


def _gather_to_replicated(local_block, plan: SpmdPlan, shape):
    """all_gather a dist-layout field to the full global array on every
    shard, then embed it in the replicated level's allocation ``shape``."""
    g = local_block
    for ax in range(3):
        if plan.mesh_shape[ax] > 1:
            g = lax.all_gather(g, plan.names[ax], axis=ax, tiled=True)
    # g has the dist-global extent (>= logical padded); crop/pad to shape.
    out = jnp.zeros(shape, g.dtype)
    sl = tuple(slice(0, min(g.shape[a], shape[a])) for a in range(3))
    return out.at[sl].set(g[sl])


def _slice_coarse_for_shard(coarse_repl, plan: SpmdPlan, lf: int):
    """For prolongation replicated→distributed: shard's assembled coarse
    range is global padded [sc-1, sc+bc] where sc = shard·bc and
    bc = fine_block/2."""
    bc = tuple(b // 2 for b in plan.block[lf])
    dist_coarse_extent = tuple(a // 2 for a in plan.alloc[lf])
    pad_hi = tuple(
        dist_coarse_extent[a] - coarse_repl.shape[a] + 1 for a in range(3)
    )
    padded = jnp.pad(
        coarse_repl,
        tuple((1, max(1, p)) for p in pad_hi),
    )
    starts = tuple(
        _global_start(bc[a], plan.names[a]) if plan.mesh_shape[a] > 1
        else jnp.int32(0)
        for a in range(3)
    )
    return lax.dynamic_slice(
        padded, starts, tuple(bc[a] + 2 for a in range(3))
    )


def _local_rhs(plan, l: int, params: GridParams, dtype):
    """Analytic RHS evaluated shard-locally from global coordinates
    (device-convention, grid._device_rhs semantics: linear at (i-1)h,
    nonlinear at i·h — src/sycl/SyclGridData.cpp:49-104)."""
    mode = params.mode
    gamma = params.gamma
    bx, by, bz = plan.block[l]
    h = params.h
    off = -1.0 if mode == Mode.LINEAR else 0.0
    gx = _global_start(bx, plan.names[0]) + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 0
    )
    gy = _global_start(by, plan.names[1]) + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 1
    )
    gz = jnp.int32(0) + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 2
    )
    x = (gx.astype(dtype) + off) * h
    y = (gy.astype(dtype) + off) * h
    z = (gz.astype(dtype) + off) * h

    if mode == Mode.LINEAR:
        def f0(t):
            return 100.0 * (t * (t - 1.0)) ** 4

        def f2(t):
            return (
                100.0 * 4.0 * (t - 1.0) * (t - 1.0) * t * t
                * (14.0 * t * t - 14.0 * t + 3.0)
            )

        val = -(
            f2(x) * f0(y) * f0(z)
            + f0(x) * f2(y) * f0(z)
            + f0(x) * f0(y) * f2(z)
        )
    else:
        ggx, ggy, ggz = x - x * x, y - y * y, z - z * z
        prod = ggx * ggy * ggz
        val = (
            2.0 * (ggy * ggz + ggx * ggz + ggx * ggy)
            + gamma * prod * jnp.exp(prod)
        )
    keep = _interior_mask(plan, l, dtype)
    return jnp.where(keep, val, jnp.zeros_like(val))


def _junction_kinds(cycle_type: str, depth: int):
    """Cycle kinds that can reach level ``depth`` from a root schedule
    (the subcycle expansion solver/vcycle.py unrolls at trace time)."""
    sub = {"V": ("V",), "W": ("W", "W"), "F": ("F", "V")}
    kinds = {cycle_type}
    for _ in range(depth):
        kinds = {k2 for k in kinds for k2 in sub[k]}
    return kinds


def _choose_tail_nd(params: GridParams, dev_mesh_shape, cutoff: int,
                    default_nd: int) -> Optional[int]:
    """Tail-consolidation depth for the per-leg engine (round 5, VERDICT
    item 3): a SHALLOW fully-fused distributed prefix feeding ONE
    pallas_vcycle2 mega-kernel launch on the replicated remainder — the
    leg-engine analogue of the pod engine's tail.

    The classic cutoff plan distributes deep: its chained-halving
    allocation pads the finest level by up to ~25% per axis (a0 must
    cover the worst coarse level shifted up) and levels whose z extent
    falls under 128 lanes can never run the Pallas shard-local kernels —
    at 511^3 on one chip that meant a (640,640,640) level-0 allocation
    and four jnp mid levels.  A shallow prefix keeps the allocation tight
    AND leaves the lane-starved levels to the mega-kernel, which handles
    them natively (dense-z, resident tiny passes).

    Returns the cost-minimising depth (per-chip streamed volume: two legs
    per distributed level + the replicated tail hierarchy), or None when
    no depth is feasible (tail kinds unsupported by pv2, grid too small).
    """
    from gpusolve_tpu.ops import pallas_vcycle2 as pv2

    dims = params.level_dims()
    nlev = len(dims)
    mesh_data = (
        dev_mesh_shape[0], dev_mesh_shape[1] * dev_mesh_shape[2], 1
    )
    # Distributing a lane-starved level (z < 127: under 128 live lanes)
    # buys nothing — the shard kernels gate it to jnp.
    zpref = 0
    while zpref < nlev and dims[zpref][2] >= 127:
        zpref += 1
    hi = min(default_nd, max(zpref, 1), nlev - 2)
    best = None
    for nd in range(1, hi + 1):
        tail_p = params.replace(grid_dim=dims[nd])
        if not all(
            pv2.supported(tail_p.replace(cycle_type=k))
            for k in _junction_kinds(params.cycle_type, nd)
        ):
            continue
        try:
            trial = SpmdPlan(
                params, dev_mesh_shape, cutoff, force_nd=nd
            )
        except ValueError:
            continue
        if trial.n_dist != nd:
            continue
        cost = 0
        for l in range(nd):
            bx, by, _bz = trial.block[l]
            zz = pallas_spmd.z_live(
                trial.block[l], dims[l][2], mesh_data[2]
            )
            cost += 2 * bx * by * zz
        for l in range(nd, nlev):
            s = alloc_shape(dims[l])
            cost += 2 * s[0] * s[1] * pv2.z_live(dims[l], s)
        if best is None or cost < best[1]:
            best = (nd, cost)
    return best[0] if best else None


def build_spmd_solver(params: GridParams, mesh: Mesh, cutoff: int = 4,
                      local_backend: str = "auto", halo: str = "ppermute",
                      fuse: str = "leg", tail: str = "auto"):
    """Construct ``(init_fn, cycle_fn, plan)`` — cached.

    The traced cycle does not read maxiter/tol/print_progress, so those are
    normalised out of the cache key: repeated solves (the bench's warm-up +
    timed run, the Newton driver's per-outer-iteration inner solves) reuse
    the same compiled executable instead of re-tracing and re-compiling a
    fresh ``jax.jit`` wrapper each time (the analogue of
    solver/vcycle.py's AOT cycle cache).

    ``halo``: "ppermute" (XLA collectives) or "rdma" — the per-leg x-face
    slab exchange of the trapezoid paths runs as in-kernel remote DMAs
    (ops/pallas_spmd.rdma_exchange, pod-scale mega-kernel groundwork); the
    non-trapezoid fallback paths keep ppermute either way.

    ``fuse``: "leg" (one kernel per leg, this module) or "pod" — ALL
    distributed legs per direction in one kernel with in-kernel RDMA
    exchange, the replicated tail as one wavefront mega-kernel
    (dist/pod.py; x-split meshes, local_backend/halo ignored)."""
    if fuse == "pod":
        from gpusolve_tpu.dist import pod as _pod

        return _pod.build_pod_solver(params, mesh, cutoff)
    if fuse != "leg":
        raise ValueError(f"fuse must be 'leg' or 'pod', got {fuse!r}")
    if halo not in ("ppermute", "rdma"):
        raise ValueError(f"halo must be 'ppermute' or 'rdma', got {halo!r}")
    if tail not in ("auto", "pv2", "off"):
        raise ValueError(f"tail must be 'auto', 'pv2' or 'off', got {tail!r}")
    key = dataclasses.replace(
        params, maxiter=0, tol=0.0, print_progress=False
    )
    return _build_spmd_solver(key, mesh, cutoff, local_backend, halo, tail)


@functools.lru_cache(maxsize=32)
def _build_spmd_solver(params: GridParams, mesh: Mesh, cutoff: int,
                       local_backend: str, halo: str = "ppermute",
                       tail: str = "auto"):
    """Uncached body of ``build_spmd_solver``.

    State layout: a flat tuple with ``n_arr`` arrays per level — [v, f] for
    LINEAR, [v, f, newton_v] for NEWTON, [v, f, rest_v] for NONLINEAR —
    distributed levels first (block layout), then replicated levels (full
    arrays).  ``cycle_fn(*state)`` runs one V-cycle and appends the
    residual norm.

    ``local_backend``: "auto" (Pallas shard-local kernels on TPU where the
    level geometry supports them — round-1 VERDICT item 3), "pallas"
    (force, interpret-mode off-TPU; used by tests), or "xla" (jnp local
    compute everywhere).
    """
    plan = SpmdPlan(params, mesh.devices.shape, cutoff)
    interp = jax.default_backend() not in ("tpu", "axon")
    # Tail consolidation (round 5): shallow fused prefix + pv2 tail.
    # "auto" engages on Pallas-running rigs only — the classic plan stays
    # the CPU/interpret default so the (cheap) jnp replicated levels keep
    # serving the test environment; "pv2" forces it (tests of this path).
    plan.tail_pv2 = None
    hb_j = czz_j = alloc0_j = None
    if (
        tail != "off" and params.dtype == "float32"
        and local_backend != "xla"
        and (tail == "pv2" or not interp)
    ):
        cand = _choose_tail_nd(
            params, mesh.devices.shape, cutoff, plan.n_dist
        )
        if cand is not None:
            plan = SpmdPlan(
                params, mesh.devices.shape, cutoff, force_nd=cand
            )
            hb_j = tuple(b // 2 for b in plan.block[cand - 1])
            czz_j = _round_up(plan.dims[cand][2] + 1, 128)
            alloc0_j = (
                plan.mesh_shape[0] * hb_j[0],
                plan.mesh_shape[1] * hb_j[1],
                czz_j,
            )
            plan.alloc[cand] = alloc0_j
            plan.tail_pv2 = alloc0_j
    names = plan.names
    dtype = jnp.dtype(params.dtype)
    nd = plan.n_dist
    nlev = plan.nlev
    hs = [params.level_h(l) for l in range(nlev)]
    stencil = params.stencil
    omega = params.omega
    gamma = params.gamma
    mode = params.mode
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    n_arr = 3 if (has_nv or has_rv) else 2
    overlap = _face_taps_only(stencil)
    if plan.tail_pv2 is not None:
        from gpusolve_tpu.ops import pallas_vcycle2 as pv2

        tail_params_by_kind = {
            k: params.replace(
                grid_dim=plan.dims[nd], cycle_type=k
            )
            for k in _junction_kinds(params.cycle_type, nd)
        }

    if interp and halo == "rdma":
        gate_interpret_sync(int(mesh.devices.size), "halo='rdma'")
    if local_backend == "pallas":
        use_ps = pallas_spmd.supported(params)
    elif local_backend == "auto":
        use_ps = (not interp) and pallas_spmd.supported(params)
    else:
        use_ps = False
    ps_levels = [
        use_ps and pallas_spmd.level_supported(
            plan.block[l], plan.dims[l][2], plan.mesh_shape[2], params.dtype
        )
        for l in range(nd)
    ]
    zzs = [
        pallas_spmd.z_live(
            plan.block[l], plan.dims[l][2], plan.mesh_shape[2]
        )
        for l in range(nd)
    ]
    # The Newton outer helpers need the same geometry (see _newton_helpers).
    plan.ps_levels = ps_levels
    plan.zz_live = zzs
    # CLI gating notes: whether the Pallas local path was platform-eligible
    # at all (False on CPU under 'auto' — a platform fallback, not a
    # geometry one).
    plan.ps_platform = use_ps

    def _clean(l, u):
        """Zero the unwritten lane tail of a Pallas-level array before any
        jnp consumer reads it (fresh kernel outputs leave columns beyond
        z_live undefined — ops/pallas_spmd.sweep_block docstring)."""
        return _clean_level(plan, l, u)

    def _faces2d(u):
        """The x/y ppermuted ghost faces, squeezed to the 2-D layouts the
        shard-local kernels take (a trailing length-1 lane axis would be
        tile-padded to 128 in HBM).  z faces are not exchanged on this path:
        the kernels require the z mesh axis unsplit (its ghosts are then the
        zero Dirichlet boundary, synthesised in-kernel)."""
        g = _face_ghosts(u, plan.mesh_shape, axes=(0, 1), names=names)
        return (
            g[0][0][0], g[0][1][0],
            g[1][0][:, 0], g[1][1][:, 0],
        )

    def _bounds_arr(l):
        """(1, 8) int32 inclusive local-index interior bounds per axis —
        shard-dependent geometry delivered to the kernel as SMEM scalars."""
        vals = []
        for ax in range(3):
            b = plan.block[l][ax]
            n = plan.dims[l][ax]
            gs = (
                lax.axis_index(names[ax]) * b
                if plan.mesh_shape[ax] > 1 else jnp.int32(0)
            )
            vals.append(jnp.maximum(jnp.int32(0), jnp.int32(1) - gs))
            vals.append(jnp.minimum(jnp.int32(b - 1), jnp.int32(n) - gs))
        # Global-geometry slots: the shard's global x start and the
        # global x interior extent (the trapezoid kernel masks ghost-zone
        # generations by GLOBAL interior — the neighbour's cells are
        # real), then the same pair for y (the y-split trapezoid), then
        # two spares.
        vals.append(lax.axis_index("x") * jnp.int32(plan.block[l][0]))
        vals.append(jnp.int32(plan.dims[l][0]))
        vals.append(
            lax.axis_index(names[1]) * jnp.int32(plan.block[l][1])
            if plan.mesh_shape[1] > 1 else jnp.int32(0)
        )
        vals.append(jnp.int32(plan.dims[l][1]))
        vals.append(jnp.int32(0))
        vals.append(jnp.int32(0))
        return jnp.stack(vals).reshape(1, 12)

    def _coarse_zz(lc):
        return _round_up(plan.dims[lc][2] + 1, 128)

    def _rr_fused(l):
        """Down-leg fused residual+restrict eligibility (kernel streams the
        fine level; coarse target must be a distributed block level)."""
        return l + 1 < nd and ps_levels[l]

    def _pl_fused(lc):
        """Up-leg fused prolong+add eligibility for fine level lc-1 with
        distributed coarse lc (the streamed coarse slab slice needs a
        128-multiple lane extent within the coarse allocation)."""
        return (
            lc < nd and ps_levels[lc - 1]
            and _coarse_zz(lc) <= plan.block[lc][2]
        )

    def _y_restrict_embed(x2, lc):
        """y full-weighting of an x/z-restricted field (cbx, by, czz) to
        the coarse block layout, embedding the czz lane extent into the
        coarse allocation.  Coarse row k reads rows 2k-1..2k+1; the row -1
        term is the lower y neighbour's last row (ppermute; zero at the
        global edge)."""
        cbx, by_, czz = x2.shape
        cby, cbz = plan.block[lc][1], plan.block[lc][2]
        pp = lax.broadcasted_iota(jnp.int32, (by_, cby), 0)
        cc = lax.broadcasted_iota(jnp.int32, (by_, cby), 1)
        d = pp - 2 * cc
        w = jnp.where(d == 0, 0.5, 0.0)
        w = jnp.where((d == -1) | (d == 1), 0.25, w).astype(dtype)
        out = _contract(x2, w, 1)
        if plan.mesh_shape[1] > 1:
            m = plan.mesh_shape[1]
            glo = lax.ppermute(
                x2[:, by_ - 1, :], names[1],
                [(i, i + 1) for i in range(m - 1)],
            )
            out = out.at[:, 0, :].add(0.25 * glo)
        if czz < cbz:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, cbz - czz)))
        elif czz > cbz:
            # The 128-multiple kernel lane extent can exceed a small coarse
            # allocation; the excess columns are zero (wz valid mask).
            out = out[:, :, :cbz]
        return out

    def _fix_x0(x2, last, w):
        """Add the lower x neighbour's boundary term onto coarse plane 0
        (the fused kernel cannot see the neighbour's last residual
        plane)."""
        m = plan.mesh_shape[0]
        if m > 1:
            prev = lax.ppermute(
                last, "x", [(i, i + 1) for i in range(m - 1)]
            )
            x2 = x2.at[0].add(w * prev)
        return x2

    # Trapezoid (communication-avoiding) smoothing: all sweeps of a leg
    # in one kernel pass with 8-plane x-face slabs exchanged once.  Under
    # a y split the kernel runs the 2-D trapezoid (ghy = 8-row y-face
    # slabs, ghost rows recomputed per sweep — _make_leg docstring); the
    # z mesh axis is always folded away (SpmdPlan).
    ysplit = plan.mesh_shape[1] > 1
    ghy = pallas_spmd._GH if ysplit else 0

    def _trap_ok(l, n_iter):
        ok = (
            l < nd and ps_levels[l] and 1 <= n_iter <= 5
            and plan.block[l][0] % pallas_spmd._GH == 0
        )
        if ok and ysplit:
            # y slabs are 8 rows: the block must hold at least one, and
            # the sweep cone must stay inside it (S + 2 <= 8 holds via
            # n_iter <= 5; the restrict/tau consumers' deeper taps are
            # checked in their own gates).
            ok = plan.block[l][1] % pallas_spmd._GH == 0
        return ok

    def _x_slabs(u):
        m = plan.mesh_shape[0]
        g = pallas_spmd._GH
        bx = u.shape[0]
        if m > 1:
            fwd = [(i, i + 1) for i in range(m - 1)]
            bwd = [(i + 1, i) for i in range(m - 1)]
            lo = lax.ppermute(u[bx - g:], "x", fwd)
            hi = lax.ppermute(u[:g], "x", bwd)
        else:
            lo = jnp.zeros_like(u[:g])
            hi = lo
        return lo, hi

    # The in-kernel RDMA exchange carries x-face slabs only; under a y
    # split the two-stage ppermute path (which forwards the diagonal
    # corners) runs instead.
    use_rdma = halo == "rdma" and not ysplit
    plan.rdma_active = use_rdma

    def _xidx():
        return lax.axis_index("x").astype(jnp.int32).reshape(1, 1)

    def _y_slabs(u):
        g = pallas_spmd._GH
        by_ = u.shape[1]
        my = plan.mesh_shape[1]
        fwd = [(i, i + 1) for i in range(my - 1)]
        bwd = [(i + 1, i) for i in range(my - 1)]
        ylo = lax.ppermute(u[:, by_ - g :], names[1], fwd)
        yhi = lax.ppermute(u[:, :g], names[1], bwd)
        return ylo, yhi

    def _slabs_multi(fields, zz_lane):
        """Ghost slabs for same-shape fields, grouped per field:
        ``[xlo, xhi]`` (x-split) or ``[xlo, xhi, ylo, yhi]`` (y-split,
        with the x slabs carrying ``by + 16`` rows).  One in-kernel RDMA
        pallas call (halo='rdma' — ops/pallas_spmd.rdma_exchange) or XLA
        ppermute; under the y split the exchange is two-stage — y first,
        then x slabs of the y-EXTENDED composite, so the x slabs carry
        the diagonal neighbours' corner rows (the standard sequential-
        axis halo trick, cf. _halo_exchange)."""
        if use_rdma:
            return pallas_spmd.rdma_exchange(
                fields, _xidx(), pallas_spmd._GH, zz_lane,
                plan.mesh_shape[0], interpret=interp,
            )
        out = []
        g = pallas_spmd._GH
        for u in fields:
            if ysplit:
                ylo, yhi = _y_slabs(u)
                bx = u.shape[0]
                lo_src = jnp.concatenate(
                    [ylo[bx - g :], u[bx - g :], yhi[bx - g :]], axis=1
                )
                hi_src = jnp.concatenate(
                    [ylo[:g], u[:g], yhi[:g]], axis=1
                )
                m = plan.mesh_shape[0]
                if m > 1:
                    fwd = [(i, i + 1) for i in range(m - 1)]
                    bwd = [(i + 1, i) for i in range(m - 1)]
                    lo = lax.ppermute(lo_src, "x", fwd)
                    hi = lax.ppermute(hi_src, "x", bwd)
                else:
                    lo = jnp.zeros_like(lo_src)
                    hi = jnp.zeros_like(hi_src)
                out.extend([lo, hi, ylo, yhi])
            else:
                out.extend(_x_slabs(u))
        return out

    def _trap_smooth(l, v, f, aux, n_iter, with_norm=False,
                     restrict=False, src_zero=False):
        fields = ([] if src_zero else [v]) + [f]
        if has_nv:
            fields.append(aux)
        slabs = _slabs_multi(fields, zzs[l])
        consumer = (
            "norm" if with_norm else ("restrict" if restrict else None)
        )
        kw = {}
        if restrict:
            # Junction (l+1 == nd, pv2 tail): the coarse target is the
            # tail root's direct layout — halved-block y extent.
            r_cby = (
                hb_j[1] if l + 1 == nd and plan.tail_pv2 is not None
                else plan.block[l + 1][1]
            )
            kw = dict(
                czz=_coarse_zz(l + 1), cnz=plan.dims[l + 1][2],
                r_cby=r_cby, r_cny=plan.dims[l + 1][1],
            )
            if has_rv:
                # FAS: fold the tau correction in-kernel (the coarse
                # level's h selects the tau stencil scale).
                kw["tau_h"] = hs[l + 1]
        outs = pallas_spmd.multi_sweep_block(
            v, f, tuple(slabs), _bounds_arr(l), params, hs[l], zzs[l],
            n_iter, newton_v=aux if has_nv else None, src_zero=src_zero,
            consumer=consumer, interpret=interp, ghy=ghy, **kw,
        )
        return outs

    def _trap_rr_ok(l, n_iter):
        """Down-leg trapezoid + fused residual/restrict eligibility: the
        kernel's coarse chunk DMAs need 8 | bx//2, and its ghost-zone
        residual recompute (exact r[-1] without a shard fix-up) needs the
        sweep cone inside the 8-plane slab: n_iter + 2 <= 8.

        The junction level (l+1 == nd) is eligible when the pv2 tail is
        engaged: the kernel's halved-block coarse output IS the tail
        root's direct layout (gathered), no XLA glue."""
        junction = l + 1 == nd and plan.tail_pv2 is not None
        if not (junction or _rr_fused(l)):
            return False
        cby = (
            tuple(b // 2 for b in plan.block[l])[1] if junction
            else plan.block[l + 1][1]
        )
        return (
            _trap_ok(l, n_iter) and ps_levels[l]
            and plan.block[l][0] % 16 == 0 and n_iter + 2 <= 8
            and (not ysplit or cby % 8 == 0)
        )

    def _trap_corr_ok(lc, n_iter):
        """Fused up leg (prolongation as trapezoid stage 0 + the post
        sweeps in one pass): the chain length post+1 must keep the slab
        prefetch trigger inside the 8-step window (post <= 4), and the
        coarse block must halve the fine one with DMA-tileable extents."""
        lf = lc - 1
        cb = plan.block[lc]
        return (
            lc < nd and _trap_ok(lf, n_iter) and 1 <= n_iter <= 4
            # the kernel's coarse slab ring streams fixed 8-plane DMAs:
            # 8 | cbx, i.e. 16 | fine bx
            and plan.block[lf][0] % 16 == 0
            and cb[0] == plan.block[lf][0] // 2 and cb[1] % 8 == 0
            and _coarse_zz(lc) <= cb[2]
        )

    def _tail_up_ok(n_iter):
        """Fused junction up leg: the tail root (replicated, direct
        layout) is the coarse source — per-shard block = a slice of the
        replicated array, gates mirror _trap_corr_ok with the halved
        block standing in for plan.block[nd]."""
        if plan.tail_pv2 is None:
            return False
        lf = nd - 1
        return (
            _trap_ok(lf, n_iter) and 1 <= n_iter <= 4
            and plan.block[lf][0] % 16 == 0 and hb_j[1] % 8 == 0
        )

    # Observability (and test hooks): which levels run the single-pass
    # fused legs.
    plan.fused_down_levels = tuple(
        l for l in range(nd) if _trap_rr_ok(l, params.pre_smoothing)
    )
    plan.fused_up_levels = tuple(
        lc for lc in range(1, nd + 1)
        if (
            _trap_corr_ok(lc, params.post_smoothing) if lc < nd
            else _tail_up_ok(params.post_smoothing)
        )
    )

    def _shift2(a, oy, oz):
        """Zero-fill shift of a 2-D (y, z) plane by -offset (tap
        value)."""
        for ax, o in ((0, oy), (1, oz)):
            if o:
                pad = [(0, 0), (0, 0)]
                sl = [slice(None), slice(None)]
                if o > 0:
                    pad[ax] = (0, o)
                    sl[ax] = slice(o, o + a.shape[ax])
                else:
                    pad[ax] = (-o, 0)
                    sl[ax] = slice(0, a.shape[ax])
                a = jnp.pad(a, pad)[tuple(sl)]
        return a

    def _edge_norm_complete(l, v, f, aux, pss):
        """Finish the fused post-smooth norm: the kernel sums interior
        planes [1, bx-1); the two x-edge planes need the neighbours'
        post-smoothed faces (one-plane ppermute)."""
        bx, by_, bz_ = plan.block[l]
        zz = zzs[l]
        nxl, nyl, nzl = plan.dims[l]
        m = plan.mesh_shape[0]
        zi2 = lax.broadcasted_iota(jnp.int32, (by_, bz_), 1)
        yi2 = lax.broadcasted_iota(jnp.int32, (by_, bz_), 0)

        def cl(p2):
            return jnp.where(zi2 < zz, p2, jnp.zeros_like(p2))

        if m > 1:
            fwd = [(i, i + 1) for i in range(m - 1)]
            bwd = [(i + 1, i) for i in range(m - 1)]
            glo = lax.ppermute(cl(v[bx - 1]), "x", fwd)
            ghi = lax.ppermute(cl(v[0]), "x", bwd)
        else:
            glo = jnp.zeros((by_, bz_), dtype)
            ghi = glo
        gs = lax.axis_index("x") * bx
        inv_h2 = 1.0 / (hs[l] * hs[l])
        if plan.mesh_shape[1] > 1:
            gy0 = lax.axis_index(names[1]) * by_
            keep2 = (
                (gy0 + yi2 >= 1) & (gy0 + yi2 <= nyl)
                & (zi2 >= 1) & (zi2 <= nzl)
            )
            # y ghost rows of the two x-edge planes (for the center
            # plane's oy taps; the ox taps carry no y offset — face-tap
            # stencils only on this path).
            my = plan.mesh_shape[1]
            yfwd = [(i, i + 1) for i in range(my - 1)]
            ybwd = [(i + 1, i) for i in range(my - 1)]
            edge2 = jnp.stack([cl(v[0]), cl(v[bx - 1])])
            yglo = lax.ppermute(edge2[:, by_ - 1, :], names[1], yfwd)
            yghi = lax.ppermute(edge2[:, 0, :], names[1], ybwd)
        else:
            keep2 = (
                (yi2 >= 1) & (yi2 <= nyl) & (zi2 >= 1) & (zi2 <= nzl)
            )
            yglo = yghi = None
        adt = jnp.float64 if dtype == jnp.float64 else jnp.float32
        ss = pss.astype(adt)
        for qi, (q, xm, x0, xp) in enumerate((
            (0, glo, cl(v[0]), cl(v[1])),
            (bx - 1, cl(v[bx - 2]), cl(v[bx - 1]), ghi),
        )):
            acc = None
            for val, (ox, oy, oz) in zip(stencil.values, stencil.offsets):
                if ox < 0:
                    term = val * xm
                elif ox > 0:
                    term = val * xp
                else:
                    tap = _shift2(x0, oy, oz)
                    if oy and yglo is not None:
                        # replace the zero-filled wrap row with the y
                        # neighbour's ghost row
                        if oy < 0:
                            tap = tap.at[0, :].set(yglo[qi])
                        else:
                            tap = tap.at[by_ - 1, :].set(yghi[qi])
                    term = val * tap
                acc = term if acc is None else acc + term
            av = acc * inv_h2
            if has_nv:
                nvq = aux[q]
                av = av + gamma * (1.0 + nvq) * x0 * jnp.exp(nvq)
            elif has_rv:
                av = av + gamma * x0 * jnp.exp(x0)
            gq = gs + q
            keep_q = keep2 & (gq >= 1) & (gq <= nxl)
            r = jnp.where(keep_q, f[q] - av, jnp.zeros_like(x0))
            ss = ss + jnp.sum(r.astype(adt) ** 2)
        for name in _AXES:
            ss = lax.psum(ss, name)
        return ss.astype(dtype)

    shard_map = _shard_map

    dist_spec = P("x", names[1], None)
    repl_spec = P()

    in_specs = tuple(
        [dist_spec] * (n_arr * nd) + [repl_spec] * (n_arr * (nlev - nd))
    )

    def local_rhs(l):
        return _local_rhs(plan, l, params, dtype)

    def _apply_local(l, v):
        """A·v/h² on a distributed level (overlap-structured when the
        stencil has face taps only)."""
        inv_h2 = 1.0 / (hs[l] * hs[l])
        if overlap:
            ghosts = _face_ghosts(v, plan.mesh_shape, names=names)
            return _stencil_overlap(
                v, ghosts, stencil, inv_h2, plan.block[l]
            )
        asm = _halo_exchange(v, plan.mesh_shape, names=names)
        return _stencil_assembled(asm, stencil, inv_h2, plan.block[l])

    def _smooth(l, v, f, aux, n_iter):
        """Damped Jacobi, all modes (reference :141-179; nonlinear :159-165;
        Newton :166-172 with frozen newton_v)."""
        if _trap_ok(l, n_iter):
            v, _ = _trap_smooth(l, v, f, aux, n_iter)
            return v
        if l < nd and ps_levels[l]:
            b = _bounds_arr(l)
            for _ in range(n_iter):
                v = pallas_spmd.sweep_block(
                    v, f, _faces2d(v), b, params, hs[l], zzs[l],
                    newton_v=aux if has_nv else None, interpret=interp,
                )
            return v
        pre_fac = stencil.diag / (hs[l] * hs[l])
        w_lin = omega / pre_fac
        keep = _interior_mask(plan, l, dtype)
        if has_nv:
            lin = gamma * (1.0 + aux) * jnp.exp(aux)
        for _ in range(n_iter):
            av = _apply_local(l, v)
            if mode == Mode.LINEAR:
                upd = v + w_lin * (f - av)
            elif mode == Mode.NONLINEAR:
                ex = jnp.exp(v)
                rr = f - (av + gamma * v * ex)
                denom = pre_fac + gamma * (1.0 + v) * ex
                upd = v + omega * (rr / denom)
            else:
                rr = f - (av + lin * v)
                upd = v + omega * (rr / (pre_fac + lin))
            v = jnp.where(keep, upd, jnp.zeros_like(v))
        return v

    def _residual(l, v, f, aux, with_norm, write_r=True):
        if l < nd and ps_levels[l]:
            r, ss = pallas_spmd.residual_block(
                v, f, _faces2d(v), _bounds_arr(l), params, hs[l], zzs[l],
                newton_v=aux if has_nv else None, with_norm=with_norm,
                interpret=interp, write_r=write_r,
            )
            if not with_norm:
                return r, None
            ss = ss.astype(dtype)
            for name in _AXES:
                ss = lax.psum(ss, name)
            return r, ss
        keep = _interior_mask(plan, l, dtype)
        av = _apply_local(l, v)
        if has_nv:
            av = av + gamma * (1.0 + aux) * v * jnp.exp(aux)
        elif has_rv:
            av = av + gamma * v * jnp.exp(v)
        r = jnp.where(keep, f - av, jnp.zeros_like(v))
        if not with_norm:
            return r, None
        ss = jnp.sum(r * r)
        for name in _AXES:
            ss = lax.psum(ss, name)
        return r, ss

    def local_vcycle(*state):
        state = list(state)

        def sget(l):
            base = n_arr * l
            return state[base : base + n_arr]

        def sset(l, v=None, f=None, aux=None):
            base = n_arr * l
            if v is not None:
                state[base] = v
            if f is not None:
                state[base + 1] = f
            if aux is not None:
                state[base + 2] = aux

        pre, post = params.pre_smoothing, params.post_smoothing

        def aux_of(arrs):
            return arrs[2] if n_arr == 3 else None

        def down_dist(l, fresh):
            """Distributed down leg at level ``l``.  ``fresh`` marks the
            first visit after the parent's restriction (v is still the
            zero it wrote) — only then may mid-level legs skip streaming
            v (the W/F schedules revisit levels with nonzero v)."""
            arrs = sget(l)
            v, f = arrs[0], arrs[1]
            aux = aux_of(arrs)

            def _finish_restrict(xr, xv, embed, l=l, tau_done=False):
                """Embed a fused kernel's restricted outputs into the
                coarse level and apply the FAS tau correction (shared by
                both fused down paths; ``embed`` maps the kernel output
                into the coarse block layout).  ``tau_done`` marks xr as
                already tau-corrected in-kernel (the trapezoid fold)."""
                keep_c = _interior_mask(plan, l + 1, dtype)
                zero_c = jnp.zeros(keep_c.shape, dtype)
                f_next = jnp.where(keep_c, embed(xr), zero_c)
                if has_rv:
                    rv = jnp.where(keep_c, embed(xv), zero_c)
                    if not tau_done:
                        av_c = _apply_local(l + 1, rv)
                        fas = av_c + gamma * rv * jnp.exp(rv)
                        f_next = jnp.where(
                            keep_c, f_next + fas, jnp.zeros_like(f_next)
                        )
                    sset(l + 1, v=rv, f=f_next, aux=rv)
                else:
                    sset(l + 1, v=jnp.zeros_like(f_next), f=f_next)

            if _trap_rr_ok(l, pre):
                # Single streaming pass for the whole down leg: all pre
                # sweeps + residual + full x/y/z restriction (v,f read
                # once; the kernel output is already in the coarse block
                # layout up to the z lane embed).  Fresh mid-level visits
                # start from v=0 (LINEAR/NEWTON down legs): v is neither
                # streamed nor exchanged.
                v, cr, crv = _trap_smooth(
                    l, v, f, aux, pre, restrict=True,
                    src_zero=(l > 0 and fresh and not has_rv),
                )
                sset(l, v=v)

                if l + 1 == nd and plan.tail_pv2 is not None:
                    # Junction consolidation: the kernel's halved-block
                    # coarse output gathered tiled IS the tail root's
                    # direct layout (identity on one shard) — no crop,
                    # no pad, no XLA tau (folded in-kernel for FAS).
                    def _gat(x3):
                        g = x3
                        if plan.mesh_shape[0] > 1:
                            g = lax.all_gather(
                                g, names[0], axis=0, tiled=True
                            )
                        if plan.mesh_shape[1] > 1:
                            g = lax.all_gather(
                                g, names[1], axis=1, tiled=True
                            )
                        return g

                    f_next = _gat(cr)
                    if has_rv:
                        # The tail streams rv as its root v: junk outside
                        # the interior would enter the stencil taps —
                        # mask it (f needs no mask: the tail reads f at
                        # interior centre positions only).
                        maskj = np.zeros(alloc0_j, dtype=bool)
                        nxc, nyc, nzc = plan.dims[nd]
                        maskj[1:nxc + 1, 1:nyc + 1, 1:nzc + 1] = True
                        rv = jnp.where(
                            jnp.asarray(maskj), _gat(crv),
                            jnp.zeros(alloc0_j, dtype),
                        )
                        sset(nd, v=rv, f=f_next, aux=rv)
                    else:
                        # LINEAR/NEWTON: the tail's zero-start first
                        # cycle never reads the root v — leave the dead
                        # buffer in place.
                        sset(nd, f=f_next)
                    return

                def _embed_z(x3, lc=l + 1):
                    cbz = plan.block[lc][2]
                    czz = x3.shape[2]
                    if czz < cbz:
                        return jnp.pad(
                            x3, ((0, 0), (0, 0), (0, cbz - czz))
                        )
                    return x3[:, :, :cbz]

                _finish_restrict(cr, crv, _embed_z, tau_done=has_rv)
                return
            v = _smooth(l, v, f, aux, pre)
            sset(l, v=v)
            if _rr_fused(l):
                # Fused residual + x/z restriction: r never hits HBM
                # (ops/pallas_spmd.residual_restrict_block docstring).
                czz = _coarse_zz(l + 1)
                xzr, rlast, xzv = pallas_spmd.residual_restrict_block(
                    v, f, _faces2d(v), _bounds_arr(l), params, hs[l],
                    zzs[l], czz, plan.dims[l + 1][2],
                    newton_v=aux if has_nv else None, interpret=interp,
                )
                xzr = _fix_x0(xzr, rlast, 0.25)
                _finish_restrict(
                    xzr, xzv, lambda x3, l=l: _y_restrict_embed(x3, l + 1)
                )
                return
            r, _ = _residual(l, v, f, aux, with_norm=False)
            asm_r = _halo_exchange(_clean(l, r), plan.mesh_shape, names=names)
            if l + 1 < nd:
                cb = plan.block[l + 1]
                keep_c = _interior_mask(plan, l + 1, dtype)

                def _mask_c(a):
                    return jnp.where(keep_c, a, jnp.zeros_like(a))

                f_next = _mask_c(_restrict_local(asm_r, cb))
                if has_rv:
                    # FAS (reference :100-113): restrict v into coarse v
                    # and rest_v; f += A²ʰ(restV) + γ restV e^{restV}.
                    asm_v = _halo_exchange(_clean(l, v), plan.mesh_shape, names=names)
                    rv = _mask_c(_restrict_local(asm_v, cb))
                    av_c = _apply_local(l + 1, rv)
                    fas = av_c + gamma * rv * jnp.exp(rv)
                    f_next = _mask_c(f_next + fas)
                    sset(l + 1, v=rv, f=f_next, aux=rv)
                else:
                    sset(l + 1, v=jnp.zeros_like(f_next), f=f_next)
            else:
                # distributed -> replicated consolidation
                cb = tuple(b // 2 for b in plan.block[l])
                nxc, nyc, nzc = plan.dims[nd]
                mask = np.zeros(plan.alloc[nd], dtype=bool)
                mask[1 : nxc + 1, 1 : nyc + 1, 1 : nzc + 1] = True
                mask = jnp.asarray(mask)

                def _to_repl(local_part):
                    g = _gather_to_replicated(
                        local_part, plan, plan.alloc[nd]
                    )
                    return jnp.where(mask, g, jnp.zeros_like(g))

                f_next = _to_repl(_restrict_local(asm_r, cb))
                if has_rv:
                    asm_v = _halo_exchange(_clean(l, v), plan.mesh_shape, names=names)
                    rv = _to_repl(_restrict_local(asm_v, cb))
                    a_coarse = xla.apply_stencil_fas(
                        rv, plan.dims[nd], params, hs[nd]
                    )
                    sset(nd, v=rv, f=f_next + a_coarse, aux=rv)
                else:
                    sset(nd, v=jnp.zeros_like(f_next), f=f_next)

        def down_repl(l):
            """Replicated down leg (plain single-device ops)."""
            arrs = sget(l)
            v, f = arrs[0], arrs[1]
            aux = aux_of(arrs)
            nv_kw = dict(newton_v=aux) if has_nv else {}
            v = xla.jacobi(v, f, plan.dims[l], params, hs[l], pre, **nv_kw)
            r, _ = xla.residual(
                v, f, plan.dims[l], params, hs[l], **nv_kw
            )
            sset(l, v=v)
            nxt = sget(l + 1)
            f_next = xla.restrict_full_weighting(
                r, plan.dims[l], plan.dims[l + 1], nxt[0].shape
            )
            if has_rv:
                rv = xla.restrict_full_weighting(
                    v, plan.dims[l], plan.dims[l + 1], nxt[0].shape
                )
                a_coarse = xla.apply_stencil_fas(
                    rv, plan.dims[l + 1], params, hs[l + 1]
                )
                sset(l + 1, v=rv, f=f_next + a_coarse, aux=rv)
            else:
                sset(l + 1, v=jnp.zeros_like(nxt[0]), f=f_next)

        def coarsest():
            arrs = sget(nlev - 1)
            nv_kw = dict(newton_v=aux_of(arrs)) if has_nv else {}
            vL = xla.jacobi(
                arrs[0], arrs[1], plan.dims[nlev - 1], params,
                hs[nlev - 1], pre + post, **nv_kw
            )
            sset(nlev - 1, v=vL)

        def up_repl(l):
            """Replicated up leg: fine level l-1 from coarse l (l > nd)."""
            arrs_c = sget(l)
            vc = arrs_c[0]
            if has_rv:
                vc = vc - arrs_c[2]  # v -= restV (reference :121-125)
            arrs_f = sget(l - 1)
            vf, ff = arrs_f[0], arrs_f[1]
            e = xla.interpolate(
                vc, plan.dims[l], plan.dims[l - 1], vf.shape
            )
            vf = vf + e
            nv_kw = dict(newton_v=aux_of(arrs_f)) if has_nv else {}
            vf = xla.jacobi(
                vf, ff, plan.dims[l - 1], params, hs[l - 1], post, **nv_kw
            )
            sset(l - 1, v=vf)

        def up_dist(l):
            """Distributed up leg: fine l-1 from coarse l (l <= nd; l ==
            nd reads the replicated boundary).  Returns the fused finest
            norm's Σr² when the kernel produced it, else None."""
            arrs_f = sget(l - 1)
            vf, ff = arrs_f[0], arrs_f[1]
            aux_f = aux_of(arrs_f)
            if l == nd:
                arrs_c = sget(nd)
                vc = arrs_c[0]
                if has_rv:
                    vc = vc - arrs_c[2]
                if _tail_up_ok(post):
                    # Fused junction up leg (round 5): this shard's
                    # coarse block is a slice of the replicated tail
                    # root (identity on one shard — the root IS the
                    # halved block), then the same single-pass
                    # prolong+post-sweep kernel as the distributed legs.
                    if plan.mesh_shape[0] == 1 and plan.mesh_shape[1] == 1:
                        vcc = vc
                    else:
                        starts = (
                            _global_start(hb_j[0], names[0])
                            if plan.mesh_shape[0] > 1 else jnp.int32(0),
                            _global_start(hb_j[1], names[1])
                            if plan.mesh_shape[1] > 1 else jnp.int32(0),
                            jnp.int32(0),
                        )
                        vcc = lax.dynamic_slice(
                            vc, starts, (hb_j[0], hb_j[1], vc.shape[2])
                        )
                    cslabs = _slabs_multi([vcc], czz_j)
                    fields = [vf, ff]
                    if has_nv:
                        fields.append(aux_f)
                    slabs = _slabs_multi(fields, zzs[l - 1])
                    consumer = "norm" if l - 1 == 0 else None
                    outs = pallas_spmd.multi_sweep_block(
                        vf, ff, tuple(slabs), _bounds_arr(l - 1),
                        params, hs[l - 1], zzs[l - 1], post,
                        newton_v=aux_f if has_nv else None,
                        coarse=(vcc, *cslabs), czp=czz_j,
                        c_ny=plan.dims[l - 1][1],
                        c_nz=plan.dims[l - 1][2],
                        consumer=consumer, interpret=interp, ghy=ghy,
                    )
                    sset_ss = None
                    if consumer:
                        vf, pss = outs
                        sset_ss = _edge_norm_complete(
                            0, vf, ff, aux_f, pss
                        )
                    else:
                        vf, _ = outs
                    sset(l - 1, v=vf)
                    return sset_ss
                asm_c = _slice_coarse_for_shard(vc, plan, l - 1)
            else:
                arrs_c = sget(l)
                vc = arrs_c[0]
                if has_rv:
                    vc = vc - arrs_c[2]
                if _trap_corr_ok(l, post):
                    # Single streaming pass for the whole up leg:
                    # prolongation + correction add + all post sweeps
                    # (+ the finest level's residual norm).
                    vcc = _clean(l, vc)
                    cslabs = _slabs_multi([vcc], _coarse_zz(l))
                    fields = [vf, ff]
                    if has_nv:
                        fields.append(aux_f)
                    slabs = _slabs_multi(fields, zzs[l - 1])
                    consumer = "norm" if l - 1 == 0 else None
                    outs = pallas_spmd.multi_sweep_block(
                        vf, ff, tuple(slabs), _bounds_arr(l - 1),
                        params, hs[l - 1], zzs[l - 1], post,
                        newton_v=aux_f if has_nv else None,
                        coarse=(vcc, *cslabs), czp=_coarse_zz(l),
                        c_ny=plan.dims[l - 1][1],
                        c_nz=plan.dims[l - 1][2],
                        consumer=consumer, interpret=interp, ghy=ghy,
                    )
                    sset_ss = None
                    if consumer:
                        vf, pss = outs
                        sset_ss = _edge_norm_complete(
                            0, vf, ff, aux_f, pss
                        )
                    else:
                        vf, _ = outs
                    sset(l - 1, v=vf)
                    return sset_ss
                if _pl_fused(l):
                    # Fused prolongation + correction add: stream the
                    # xy-ghost-extended coarse block (z stays in padded
                    # coordinates — unsplit), y-padded to the DMA tiling.
                    asm_c = _halo_exchange(
                        _clean(l, vc), plan.mesh_shape, axes=(0, 1),
                        names=names,
                    )
                    pad_y = (-asm_c.shape[1]) % 8
                    if pad_y:
                        asm_c = jnp.pad(
                            asm_c, ((0, 0), (0, pad_y), (0, 0))
                        )
                    vf = pallas_spmd.prolong_add_block(
                        vf, asm_c, _bounds_arr(l - 1), zzs[l - 1],
                        _coarse_zz(l), plan.dims[l - 1][2],
                        interpret=interp,
                    )
                    sset_ss = None
                    if l - 1 == 0 and _trap_ok(0, post):
                        # Fused post-smooth + residual norm (the final
                        # separate norm pass is skipped entirely).
                        vf, pss = _trap_smooth(
                            0, vf, ff, aux_f, post, with_norm=True
                        )
                        sset_ss = _edge_norm_complete(
                            0, vf, ff, aux_f, pss
                        )
                    else:
                        vf = _smooth(l - 1, vf, ff, aux_f, post)
                    sset(l - 1, v=vf)
                    return sset_ss
                asm_c = _halo_exchange(
                    _clean(l, vc), plan.mesh_shape, names=names
                )
            e = _prolong_local(asm_c, plan.block[l - 1])
            keep = _interior_mask(plan, l - 1, dtype)
            vf = jnp.where(keep, vf + e, jnp.zeros_like(vf))
            vf = _smooth(l - 1, vf, ff, aux_f, post)
            sset(l - 1, v=vf)
            return None

        # Cycle schedule: V per the reference; W/F beyond-reference,
        # mirroring solver/vcycle.py's trace-time recursion.  A child's
        # SECOND visit (W's and F's extra sub-cycles) starts from the
        # nonzero v its first visit left, so only first visits are
        # ``fresh`` for the src_zero fast path.
        subcycles = {"V": ("V",), "W": ("W", "W"), "F": ("F", "V")}
        final_ss = [None]

        def tail_cycle(kind, fresh):
            """One ``kind``-cycle over the replicated sub-hierarchy as a
            single pallas_vcycle2 launch (round 5: the per-leg engine's
            pod-style tail).  The tail root lives in its direct (gathered
            halved-block) layout — alloc0 — and fresh LINEAR/NEWTON
            visits zero-start in-kernel, so the consolidation wrote only
            f (down_dist's junction branch)."""
            zs = fresh and not has_rv
            targs = []
            for t in range(nd, nlev):
                targs.extend(sget(t)[:n_arr])
            touts = pv2.batch_call(
                tuple(targs), tail_params_by_kind[kind], 1,
                jnp.full((1, 1), 1, jnp.int32),
                jnp.full((1, 1), -1.0, jnp.float32),
                interpret=interp, alloc0=plan.tail_pv2, zero_start=zs,
            )
            for j, t in enumerate(range(nd, nlev)):
                o = touts[j * n_arr : (j + 1) * n_arr]
                sset(t, v=o[0], f=o[1],
                     aux=o[2] if n_arr == 3 else None)

        def cycle_at(i, kind, fresh):
            if i == nd and plan.tail_pv2 is not None:
                tail_cycle(kind, fresh)
                return
            if i == nlev - 1:
                coarsest()
                return
            if i < nd:
                down_dist(i, fresh)
            else:
                down_repl(i)
            for j, sub in enumerate(subcycles[kind]):
                cycle_at(i + 1, sub, j == 0)
            if i + 1 > nd:
                up_repl(i + 1)
            else:
                ss = up_dist(i + 1)
                if ss is not None:
                    final_ss[0] = ss

        cycle_at(0, params.cycle_type, False)

        if final_ss[0] is not None:
            return tuple(state) + (jnp.sqrt(final_ss[0]),)
        arrs0 = sget(0)
        _, ss = _residual(
            0, arrs0[0], arrs0[1], aux_of(arrs0), with_norm=True,
            write_r=False,
        )
        return tuple(state) + (jnp.sqrt(ss),)

    out_specs = in_specs + (repl_spec,)

    smapped = shard_map(
        local_vcycle,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_rep=False,
    )
    cycle_fn = jax.jit(lambda *state: smapped(*state))

    def local_init(_):
        out = []
        for l in range(nd):
            bx, by, bz = plan.block[l]
            z = jnp.zeros((bx, by, bz), dtype)
            out.append(z)
            out.append(local_rhs(0) if l == 0 else z)
            if n_arr == 3:
                out.append(z)
        for l in range(nd, nlev):
            z = jnp.zeros(plan.alloc[l], dtype)
            out.append(z)
            out.append(z)
            if n_arr == 3:
                out.append(z)
        return tuple(out)

    init_smapped = shard_map(
        local_init,
        mesh=mesh,
        in_specs=(repl_spec,),
        out_specs=in_specs,
        check_rep=False,
    )
    init_fn = jax.jit(
        lambda: init_smapped(jnp.zeros((1,), dtype))
    )

    return init_fn, cycle_fn, plan


def _build_residual_norm(params: GridParams, mesh: Mesh, plan: SpmdPlan,
                         against_f=None):
    """Jitted distributed residual-norm of the finest level (v, f [, aux])."""
    dtype = jnp.dtype(params.dtype)
    names = plan.names
    has_aux = params.mode != Mode.LINEAR
    hs0 = params.level_h(0)
    stencil = params.stencil
    gamma = params.gamma
    overlap = _face_taps_only(stencil)

    def local_r0(v, f, *aux):
        v = _clean_level(plan, 0, v)
        inv_h2 = 1.0 / (hs0 * hs0)
        keep = _interior_mask(plan, 0, dtype)
        if overlap:
            ghosts = _face_ghosts(v, plan.mesh_shape, names=names)
            av = _stencil_overlap(
                v, ghosts, stencil, inv_h2, plan.block[0]
            )
        else:
            asm = _halo_exchange(v, plan.mesh_shape, names=names)
            av = _stencil_assembled(asm, stencil, inv_h2, plan.block[0])
        if params.mode == Mode.NEWTON:
            nv = aux[0]
            av = av + gamma * (1.0 + nv) * v * jnp.exp(nv)
        elif params.mode == Mode.NONLINEAR:
            av = av + gamma * v * jnp.exp(v)
        r = jnp.where(keep, f - av, jnp.zeros_like(v))
        ss = jnp.sum(r * r)
        for name in _AXES:
            ss = lax.psum(ss, name)
        return jnp.sqrt(ss)

    n_in = 3 if has_aux else 2
    return jax.jit(
        _shard_map(
            local_r0,
            mesh=mesh,
            in_specs=tuple([P("x", plan.names[1], None)] * n_in),
            out_specs=P(),
            check_rep=False,
        )
    )


def gather_solution(state, plan: SpmdPlan, mesh: Mesh,
                    which: int = 0) -> np.ndarray:
    """Assemble the finest-level field ``which`` (0 = v, 2 = aux) from a
    sharded state into the logical padded global array (host numpy) — the
    spmd engine's dump/validate surface."""
    n_arr = 3 if plan.params.mode != Mode.LINEAR else 2
    arr = state[which if which < n_arr else 0]
    full = np.asarray(jax.device_get(arr))  # sharded -> host gather
    nx, ny, nz = plan.dims[0]
    # Re-zero outside the interior: the halo is zero by construction, but
    # the Pallas local path leaves lane columns beyond z_live unwritten in
    # fresh buffers (ops/pallas_spmd.sweep_block docstring).
    out = np.zeros((nx + 2, ny + 2, nz + 2), full.dtype)
    out[1 : nx + 1, 1 : ny + 1, 1 : nz + 1] = full[
        1 : nx + 1, 1 : ny + 1, 1 : nz + 1
    ]
    return out


@functools.lru_cache(maxsize=32)
def _k_cycle_fn(params: GridParams, mesh: Mesh, cutoff: int,
                local_backend: str, k: int, halo: str = "ppermute",
                fuse: str = "leg", tail: str = "auto"):
    """``k`` V-cycles per dispatch via ``lax.scan`` (amortises the
    per-launch/per-fetch overhead that dominates through the tunnel and on
    small grids — the spmd analogue of the mega-kernel's multi-cycle
    launches)."""
    if fuse == "pod":
        from gpusolve_tpu.dist import pod as _pod

        _, cycle_fn, _ = _pod._build_pod_solver(params, mesh, cutoff)
    else:
        _, cycle_fn, _ = _build_spmd_solver(
            params, mesh, cutoff, local_backend, halo, tail
        )

    def k_cycles(*state):
        def body(st, _):
            out = cycle_fn(*st)
            return out[:-1], out[-1]

        st, norms = jax.lax.scan(body, tuple(state), None, length=k)
        return st + (norms,)

    return jax.jit(k_cycles)


def solve_spmd(
    params: GridParams, mesh: Mesh, cutoff: int = 4,
    state=None, plan: Optional[SpmdPlan] = None,
    initial_residual: Optional[float] = None,
    local_backend: str = "auto",
    check_every: int = 1,
    halo: str = "ppermute",
    fuse: str = "leg",
    timer=None,
    tail: str = "auto",
) -> Tuple[tuple, List[float], SpmdPlan]:
    """Full explicit-halo SPMD solve, any mode.  Returns
    ``(final_state, residual_history, plan)`` — the history is comparable
    against the single-device solver's.

    ``check_every=k`` runs k cycles per device dispatch (scan) and applies
    the convergence test between batches; the per-cycle history is still
    recorded exactly, but a solve may run up to k-1 cycles past the stop
    threshold (parity mode is k=1, like the reference's per-cycle check).

    Progress lines match the single-device solver's (``iter: N residual: R
    Took Xms`` plus Timer counters — the format the reference prints,
    src/Timer.cpp:13-27, and its harness regex-parses,
    runExperiments.py:46); batched dispatches report the per-cycle share of
    the batch wall time like the mega-kernel path.
    """
    import time as _time

    from gpusolve_tpu.utils.timer import Timer as _Timer

    init_fn, cycle_fn, plan_ = build_spmd_solver(
        params, mesh, cutoff, local_backend, halo, fuse, tail
    )
    plan = plan or plan_
    if state is None:
        state = init_fn()
    if timer is None and params.print_progress:
        timer = _Timer()

    # Cache the jitted r0 computation on the plan (the plan is itself
    # cached per configuration, so repeated solves skip the recompile).
    r0_fn = getattr(plan, "_r0_fn", None)
    if r0_fn is None:
        r0_fn = _build_residual_norm(params, mesh, plan)
        plan._r0_fn = r0_fn
    n_arr = 3 if params.mode != Mode.LINEAR else 2
    if initial_residual is None:
        initial = float(r0_fn(*state[:n_arr]))
        history = [initial]
        if params.print_progress:
            print(f"Inital residual: {initial:.6g}")
    else:
        initial = float(initial_residual)
        history = []
    k = max(1, int(check_every))
    kfn = None
    if k > 1:
        key = dataclasses.replace(
            params, maxiter=0, tol=0.0, print_progress=False
        )
        kfn = _k_cycle_fn(
            key, mesh, cutoff, local_backend, k, halo, fuse, tail
        )

    def _progress(i, res, ms):
        if params.print_progress:
            line = f"iter: {i} residual: {res:.6g} Took {ms}ms"
            if timer is not None:
                line += timer.suffix()
            print(line)

    done = 0
    while done < params.maxiter:
        t0 = _time.perf_counter()
        if kfn is not None and done + k <= params.maxiter:
            out = kfn(*state)
            state = out[:-1]
            # The once-per-batch device sync (the analogue of the
            # reference's sumBuffer host accessor, SyclSolver.cpp:361-374).
            if timer is not None:
                with timer.section("sumBuffer"):
                    arr = np.asarray(out[-1])
            else:
                arr = np.asarray(out[-1])
            per_ms = int((_time.perf_counter() - t0) * 1000 / k)
            norms = [float(r) for r in arr]
            for res in norms:
                history.append(res)
                _progress(done, res, per_ms)
                done += 1
            if any(r <= initial / (1.0 / params.tol) for r in norms):
                break
        else:
            out = cycle_fn(*state)
            state = out[:-1]
            if timer is not None:
                with timer.section("sumBuffer"):
                    res = float(out[-1])
            else:
                res = float(out[-1])
            history.append(res)
            _progress(done, res, int((_time.perf_counter() - t0) * 1000))
            done += 1
            if res <= initial / (1.0 / params.tol):
                break
    return state, history, plan


def spmd_eligible(params: GridParams, mesh_shape) -> Optional[str]:
    """None when the explicit spmd engine can run this configuration, else
    a human-readable reason (the CLI's auto engine selection and
    fast-path-gating notes)."""
    dims = params.level_dims()
    if len(dims) < 2:
        return "single-level grid"
    # The z mesh axis folds into the y data decomposition (SpmdPlan).
    folded = (mesh_shape[0], mesh_shape[1] * mesh_shape[2], 1)
    if any(dims[0][a] < folded[a] for a in range(3)):
        return f"grid {dims[0]} too small for mesh {tuple(mesh_shape)}"
    return None


def _newton_helpers(params: GridParams, mesh: Mesh, plan: SpmdPlan):
    """Shard-mapped pieces of the outer Newton iteration
    (reference src/cpu/NewtonSolver.cpp)."""
    dtype = jnp.dtype(params.dtype)
    nd = plan.n_dist
    nlev = plan.nlev
    stencil = params.stencil
    gamma = params.gamma
    hs = [params.level_h(l) for l in range(nlev)]
    overlap = _face_taps_only(stencil)
    dist_spec = P("x", plan.names[1], None)
    repl_spec = P()
    names = plan.names
    interp = jax.default_backend() not in ("tpu", "axon")
    # comp_f IS the NONLINEAR-mode residual evaluated at ũ
    # (F = newton_f − (A·ũ/h² + γ ũ e^ũ)) — on Pallas-eligible level-0
    # geometry it runs the shard-local residual kernel instead of the
    # per-level XLA ops (the round-2 'NEWTON outer ops on pod layouts
    # pay XLA glue' item).
    p_fas = params.replace(mode=Mode.NONLINEAR)
    use_ps0 = bool(
        getattr(plan, "ps_levels", [False])[0]
        and pallas_spmd.supported(p_fas)
    )

    def _specs(n_dist_arrs, n_repl_arrs):
        return tuple(
            [dist_spec] * n_dist_arrs + [repl_spec] * n_repl_arrs
        )

    def _faces2d0(u):
        g = _face_ghosts(u, plan.mesh_shape, axes=(0, 1), names=names)
        return (
            g[0][0][0], g[0][1][0],
            g[1][0][:, 0], g[1][1][:, 0],
        )

    def _bounds0():
        vals = []
        for ax in range(3):
            b = plan.block[0][ax]
            n = plan.dims[0][ax]
            gs = (
                lax.axis_index(names[ax]) * b
                if plan.mesh_shape[ax] > 1 else jnp.int32(0)
            )
            vals.append(jnp.maximum(jnp.int32(0), jnp.int32(1) - gs))
            vals.append(jnp.minimum(jnp.int32(b - 1), jnp.int32(n) - gs))
        vals.extend([jnp.int32(0)] * 6)
        return jnp.stack(vals).reshape(1, 12)

    def local_comp_f(v_nv, newton_f, f_out_dummy):
        """F = newton_f − (A·ũ + γ ũ e^ũ) into level-0 f; returns also ‖F‖
        (reference :48-81)."""
        nv = _clean_level(plan, 0, v_nv)
        if use_ps0:
            F, ss = pallas_spmd.residual_block(
                nv, newton_f, _faces2d0(nv), _bounds0(), p_fas, hs[0],
                plan.zz_live[0], with_norm=True, interpret=interp,
            )
            ss = ss.astype(dtype)
            for name in _AXES:
                ss = lax.psum(ss, name)
            return F, jnp.sqrt(ss)
        inv_h2 = 1.0 / (hs[0] * hs[0])
        keep = _interior_mask(plan, 0, dtype)
        if overlap:
            ghosts = _face_ghosts(nv, plan.mesh_shape, names=plan.names)
            av = _stencil_overlap(
                nv, ghosts, stencil, inv_h2, plan.block[0]
            )
        else:
            asm = _halo_exchange(nv, plan.mesh_shape, names=plan.names)
            av = _stencil_assembled(asm, stencil, inv_h2, plan.block[0])
        av = av + gamma * nv * jnp.exp(nv)
        F = jnp.where(keep, newton_f - av, jnp.zeros_like(nv))
        ss = jnp.sum(F * F)
        for name in _AXES:
            ss = lax.psum(ss, name)
        return F, jnp.sqrt(ss)

    comp_f_fn = jax.jit(
        _shard_map(
            local_comp_f, mesh=mesh,
            in_specs=(dist_spec, dist_spec, dist_spec),
            out_specs=(dist_spec, repl_spec),
            check_rep=False,
        )
    )

    def local_restrict_nv(*nvs):
        """Restrict ũ to levels 1..nlev-2 — never the coarsest (reference
        :88-92).  Input/output: per-level newton_v arrays."""
        nvs = list(nvs)
        for l in range(min(nd, nlev - 2)):
            asm = _halo_exchange(
                _clean_level(plan, l, nvs[l]), plan.mesh_shape,
                names=plan.names,
            )
            if l + 1 < nd:
                cb = plan.block[l + 1]
                keep_c = _interior_mask(plan, l + 1, dtype)
                nvs[l + 1] = jnp.where(
                    keep_c, _restrict_local(asm, cb),
                    jnp.zeros_like(_restrict_local(asm, cb)),
                )
            else:
                cb = tuple(b // 2 for b in plan.block[l])
                part = _restrict_local(asm, cb)
                g = _gather_to_replicated(part, plan, plan.alloc[nd])
                nxc, nyc, nzc = plan.dims[nd]
                mask = np.zeros(plan.alloc[nd], dtype=bool)
                mask[1 : nxc + 1, 1 : nyc + 1, 1 : nzc + 1] = True
                nvs[l + 1] = jnp.where(
                    jnp.asarray(mask), g, jnp.zeros_like(g)
                )
        for l in range(nd, nlev - 2):
            nvs[l + 1] = xla.restrict_full_weighting(
                nvs[l], plan.dims[l], plan.dims[l + 1],
                nvs[l + 1].shape,
            )
        return tuple(nvs)

    restrict_nv_fn = jax.jit(
        _shard_map(
            local_restrict_nv, mesh=mesh,
            in_specs=_specs(nd, nlev - nd),
            out_specs=_specs(nd, nlev - nd),
            check_rep=False,
        )
    )

    def local_update_nv(nv, v):
        return nv + v

    update_nv_fn = jax.jit(
        _shard_map(
            local_update_nv, mesh=mesh,
            in_specs=(dist_spec, dist_spec),
            out_specs=dist_spec,
            check_rep=False,
        )
    )

    return comp_f_fn, restrict_nv_fn, update_nv_fn


def newton_solve_spmd(
    params: GridParams, mesh: Mesh, cutoff: int = 4,
    local_backend: str = "auto",
    halo: str = "ppermute",
    fuse: str = "leg",
    state=None,
    newton_f=None,
    initial_residual: Optional[float] = None,
    timer=None,
    check_every: int = 1,
    tail: str = "auto",
) -> Tuple[tuple, List[float], SpmdPlan]:
    """Distributed outer Newton iteration on the explicit-halo engine
    (reference src/cpu/NewtonSolver.cpp:10-44): per step, comp_f builds the
    Jacobian RHS, ũ restricts to levels 1..L-2, an inner 10-cycle/tol-0.1
    NEWTON-mode MG solve runs fully sharded, and ũ += v.

    Returns ``(state, history, plan)`` where ``state`` is the inner solver's
    sharded state whose newton_v holds the solution.  The original RHS
    ``newton_f`` (needed to resume — level-0 ``f`` is overwritten with F
    each step) is stashed on the plan as ``plan.newton_f``.

    ``state``/``newton_f``/``initial_residual``: checkpoint resume — the
    stop threshold keeps the original run's initial residual.

    ``check_every=k`` batches the INNER solve's cycles k per dispatch
    (solve_spmd semantics: the inner stop test runs between batches, so an
    inner solve may run up to k-1 cycles past its tol — parity mode is
    k=1).  Independent of k, each outer step costs two dispatches + one
    scalar fetch: the convergence comp_f doubles as the next step's RHS
    build (the state is unchanged in between — same F, same norm), and its
    norm seeds the inner solve's initial residual (the inner system starts
    at e=0, so r0 = ‖F‖; the single-device driver does the same,
    solver/newton.py find_error)."""
    import time as _time

    from gpusolve_tpu.utils.timer import Timer as _Timer

    assert params.mode == Mode.NEWTON
    init_fn, cycle_fn, plan = build_spmd_solver(
        params, mesh, cutoff, local_backend, halo, fuse, tail
    )
    comp_f_fn, restrict_nv_fn, update_nv_fn = _newton_helpers(
        params, mesh, plan
    )
    if timer is None and params.print_progress:
        timer = _Timer()
    state = list(init_fn() if state is None else state)
    n_arr = 3
    nd = plan.n_dist
    nlev = plan.nlev

    def nv_list():
        return [state[n_arr * l + 2] for l in range(nlev)]

    def set_nvs(nvs):
        for l in range(nlev):
            state[n_arr * l + 2] = nvs[l]

    # newton_f: the immutable original RHS (level-0 f from init).
    if newton_f is None:
        newton_f = state[1]
    plan.newton_f = newton_f

    def comp_f():
        F, res = comp_f_fn(state[2], newton_f, state[1])
        state[1] = F
        if timer is not None:
            with timer.section("sumBuffer"):
                return float(res)
        return float(res)

    if initial_residual is None:
        initial = comp_f()
        history = [initial]
        if params.print_progress:
            print(f"Inital newton residual: {initial:.6g}")
        fn = initial
    else:
        initial = float(initial_residual)
        history = []
        # Resume entry: level-0 f is stale — build F (reference :21).
        fn = comp_f()

    inner = params.replace(maxiter=10, tol=0.1, print_progress=False)
    for i in range(params.maxiter):
        t0 = _time.perf_counter()
        # F is already in state[1] from the preceding comp_f and ``fn``
        # is its norm (the reference re-invokes compF here on unchanged
        # state, src/cpu/NewtonSolver.cpp:21 — identical result).
        # zero v on every level (reference :22)
        for l in range(nlev):
            state[n_arr * l] = jnp.zeros_like(state[n_arr * l])
        set_nvs(list(restrict_nv_fn(*nv_list())))
        st, _, _ = solve_spmd(
            inner, mesh, cutoff, state=tuple(state), plan=plan,
            initial_residual=fn, local_backend=local_backend,
            halo=halo, fuse=fuse, check_every=check_every, tail=tail,
        )
        state = list(st)
        state[2] = update_nv_fn(state[2], state[0])
        res = comp_f()
        fn = res
        history.append(res)
        if params.print_progress:
            ms = int((_time.perf_counter() - t0) * 1000)
            line = f"newton iter: {i} residual: {res:.6g} Took {ms}ms"
            if timer is not None:
                line += timer.suffix()
            print(line)
        if res <= initial / (1.0 / params.tol):
            break
    return tuple(state), history, plan
