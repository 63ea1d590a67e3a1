"""Explicit-halo SPMD multigrid engine (``shard_map`` + ``lax.ppermute``).

This is the hand-scheduled counterpart of the GSPMD path in
gpusolve_tpu.dist: the whole V-cycle runs inside one ``shard_map`` region
where every stencil application assembles a ghost-extended local block via
six explicit face-plane ``ppermute`` exchanges (SURVEY.md §2.3's plan), norms
reduce with ``psum``, and coarse levels below the distribution cutoff are
consolidated to a replicated layout with ``all_gather`` (the multigrid
analogue of pipeline-stage consolidation).

Why it exists next to the GSPMD path: the partitioner-inserted collectives
are correct but opaque; explicit exchanges give deterministic communication
placement (one face plane per direction per stencil application — the
roofline minimum) and a place to overlap interior compute with the permutes
in a later iteration.  Numerics are identical; tests assert residual-sequence
equality with the single-device solver.

Design notes
  * Distributed levels use a *mesh-aware* allocation: per axis,
    ``A0 = round_up(max_l (n_l+2)·2^l, mesh·2^(D-1))`` so each coarser level
    halves exactly (``A_l = A0/2^l``), which keeps restriction/prolongation
    shard-local given a one-cell ghost (fine block = 2 × coarse block).
  * ``ppermute`` writes zeros where no peer sends — exactly the Dirichlet
    zero boundary, so global edges need no special casing.
  * Levels below the cutoff are replicated: every shard redundantly runs the
    plain single-device ops (ops.xla) on gathered arrays.
  * LINEAR mode only for now; FAS/Newton run distributed via the GSPMD path.

Reference numerics: src/cpu/CpuSolver.cpp (cited per op in ops/xla.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.grid import alloc_shape
from gpusolve_tpu.ops import xla

_AXES = ("x", "y", "z")


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
    mesh-aware allocation/block shapes per level."""

    def __init__(self, params: GridParams, mesh_shape, cutoff: int = 4):
        self.params = params
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

        # Mesh-aware allocation for the distributed levels.
        self.alloc: List[Tuple[int, int, int]] = []
        a0 = []
        for ax in range(3):
            need = max(
                (dims[l][ax] + 2) << l for l in range(self.n_dist)
            )
            # One extra factor of 2 beyond the halving chain so the last
            # distributed level's *block* is still even (its restriction
            # into the consolidated replicated level halves shard-locally).
            a0.append(
                _round_up(need, self.mesh_shape[ax] * (1 << self.n_dist))
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


def _halo_exchange(u, mesh_shape):
    """Ghost-extend a local block by one cell per face via ppermute.

    Missing neighbours (global edges) contribute zeros — the Dirichlet
    boundary (ppermute's semantics for unaddressed targets).
    """
    for ax, name in enumerate(_AXES):
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


def _interior_mask(plan: SpmdPlan, l: int, dtype):
    """1.0 on cells whose *global* index is interior ([1, n] per axis)."""
    bx, by, bz = plan.block[l]
    nx, ny, nz = plan.dims[l]
    gx = _global_start(bx, "x") + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 0
    )
    gy = _global_start(by, "y") + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 1
    )
    gz = _global_start(bz, "z") + lax.broadcasted_iota(
        jnp.int32, (bx, by, bz), 2
    )
    keep = (
        (gx >= 1) & (gx <= nx)
        & (gy >= 1) & (gy <= ny)
        & (gz >= 1) & (gz <= nz)
    )
    return keep


def _stencil_local(asm, stencil, inv_h2, block):
    """Σ s·asm[1+o : 1+o+b] / h² on a ghost-extended block."""
    bx, by, bz = block
    acc = None
    for val, (ox, oy, oz) in zip(stencil.values, stencil.offsets):
        tap = asm[
            1 + ox : 1 + ox + bx, 1 + oy : 1 + oy + by, 1 + oz : 1 + oz + bz
        ]
        term = val * tap
        acc = term if acc is None else acc + term
    return acc * inv_h2


def _restrict_local(asm_fine, cblock):
    """27-point full weighting on a ghost-extended fine block; coarse local
    cell j reads assembled fine 2j+d+1 (fine block = 2 × coarse block)."""
    acc = None
    w1 = (0.25, 0.5, 0.25)
    for di, wi in zip((-1, 0, 1), w1):
        for dj, wj in zip((-1, 0, 1), w1):
            for dk, wk in zip((-1, 0, 1), w1):
                w = wi * wj * wk
                tap = asm_fine[
                    1 + di : di + 2 * cblock[0] : 2,
                    1 + dj : dj + 2 * cblock[1] : 2,
                    1 + dk : dk + 2 * cblock[2] : 2,
                ]
                term = w * tap
                acc = term if acc is None else acc + term
    return acc


def _prolong_local(asm_coarse, fblock):
    """Trilinear prolongation in padded-global coordinates: with
    ``E[m] = 0.5·(R'[m] + R'[m+1])`` for ``R'[k] = C[k//2]`` (exact for both
    parities — injection at even m, midpoint at odd m), a shard whose fine
    block starts at global ``sf = 2·sc`` and whose assembled coarse slab
    starts at ``sc-1`` gets ``e_local[p] = 0.5·(R[p+2] + R[p+3])`` with
    ``R = element-repeat(assembled coarse, 2)``."""
    e = asm_coarse
    for ax in range(3):
        r = jnp.repeat(e, 2, axis=ax)
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(2, 2 + fblock[ax])
        hi[ax] = slice(3, 3 + fblock[ax])
        e = 0.5 * (r[tuple(lo)] + r[tuple(hi)])
    return e


def _gather_to_replicated(local_block, plan: SpmdPlan, shape):
    """all_gather a dist-layout field to the full global array on every
    shard, then embed it in the replicated level's allocation ``shape``."""
    g = local_block
    for ax, name in enumerate(_AXES):
        if plan.mesh_shape[ax] > 1:
            g = lax.all_gather(g, name, axis=ax, tiled=True)
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
        _global_start(bc[a], _AXES[a]) for a in range(3)
    )
    return lax.dynamic_slice(
        padded, starts, tuple(bc[a] + 2 for a in range(3))
    )


def build_spmd_solver(params: GridParams, mesh: Mesh, cutoff: int = 4):
    """Construct ``(init_fn, cycle_fn, plan)``.

    ``init_fn()`` returns the initial sharded state (a flat list of arrays:
    per distributed level [v, f], then per replicated level [v, f], plus the
    replicated scratch handled internally).  ``cycle_fn(state)`` runs one
    V-cycle and returns ``(state, residual_norm)``.  Both are jitted; the
    body runs inside shard_map.
    """
    if params.mode != Mode.LINEAR:
        raise NotImplementedError(
            "spmd engine: LINEAR mode only (use the GSPMD path for "
            "FAS/Newton)"
        )
    plan = SpmdPlan(params, mesh.devices.shape, cutoff)
    dtype = jnp.dtype(params.dtype)
    nd = plan.n_dist
    nlev = plan.nlev
    hs = [params.level_h(l) for l in range(nlev)]
    stencil = params.stencil
    omega = params.omega

    shard_map = _shard_map

    dist_spec = P("x", "y", "z")
    repl_spec = P()

    # state layout: [v_0, f_0, ..., v_{nd-1}, f_{nd-1}] distributed
    #             + [v_l, f_l] replicated for l in [nd, nlev)
    in_specs = tuple(
        [dist_spec] * (2 * nd) + [repl_spec] * (2 * (nlev - nd))
    )

    def local_rhs(l):
        """Analytic RHS evaluated shard-locally from global coordinates
        (device-convention, grid._device_rhs semantics)."""
        bx, by, bz = plan.block[l]
        h = params.h
        gx = _global_start(bx, "x") + lax.broadcasted_iota(
            jnp.int32, (bx, by, bz), 0
        )
        gy = _global_start(by, "y") + lax.broadcasted_iota(
            jnp.int32, (bx, by, bz), 1
        )
        gz = _global_start(bz, "z") + lax.broadcasted_iota(
            jnp.int32, (bx, by, bz), 2
        )
        x = (gx.astype(dtype) - 1.0) * h
        y = (gy.astype(dtype) - 1.0) * h
        z = (gz.astype(dtype) - 1.0) * h

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
        keep = _interior_mask(plan, l, dtype)
        return jnp.where(keep, val, jnp.zeros_like(val))

    def _smooth(l, v, f, n_iter):
        inv_h2 = 1.0 / (hs[l] * hs[l])
        w = omega * (hs[l] * hs[l]) / stencil.diag
        keep = _interior_mask(plan, l, dtype)
        for _ in range(n_iter):
            asm = _halo_exchange(v, plan.mesh_shape)
            av = _stencil_local(asm, stencil, inv_h2, plan.block[l])
            v = jnp.where(keep, v + w * (f - av), jnp.zeros_like(v))
        return v

    def _residual(l, v, f, with_norm):
        inv_h2 = 1.0 / (hs[l] * hs[l])
        keep = _interior_mask(plan, l, dtype)
        asm = _halo_exchange(v, plan.mesh_shape)
        av = _stencil_local(asm, stencil, inv_h2, plan.block[l])
        r = jnp.where(keep, f - av, jnp.zeros_like(v))
        if not with_norm:
            return r, None
        ss = jnp.sum(r * r)
        for name in _AXES:
            ss = lax.psum(ss, name)
        return r, ss

    def local_vcycle(*state):
        state = list(state)

        def vget(l):
            if l < nd:
                return state[2 * l], state[2 * l + 1]
            base = 2 * nd + 2 * (l - nd)
            return state[base], state[base + 1]

        def vset(l, v=None, f=None):
            if l < nd:
                if v is not None:
                    state[2 * l] = v
                if f is not None:
                    state[2 * l + 1] = f
            else:
                base = 2 * nd + 2 * (l - nd)
                if v is not None:
                    state[base] = v
                if f is not None:
                    state[base + 1] = f

        pre, post = params.pre_smoothing, params.post_smoothing

        # ---- distributed down-leg ----
        for l in range(nd):
            v, f = vget(l)
            v = _smooth(l, v, f, pre)
            vset(l, v=v)
            r, _ = _residual(l, v, f, with_norm=False)
            asm_r = _halo_exchange(r, plan.mesh_shape)
            if l + 1 < nd:
                cb = plan.block[l + 1]
                f_next = _restrict_local(asm_r, cb)
                keep_c = _interior_mask(plan, l + 1, dtype)
                f_next = jnp.where(
                    keep_c, f_next, jnp.zeros_like(f_next)
                )
                vset(l + 1, v=jnp.zeros_like(f_next), f=f_next)
            else:
                # distributed -> replicated consolidation
                cb = tuple(b // 2 for b in plan.block[l])
                f_part = _restrict_local(asm_r, cb)
                f_next = _gather_to_replicated(
                    f_part, plan, plan.alloc[nd]
                )
                # zero outside the logical coarse interior
                nxc, nyc, nzc = plan.dims[nd]
                mask = np.zeros(plan.alloc[nd], dtype=bool)
                mask[1 : nxc + 1, 1 : nyc + 1, 1 : nzc + 1] = True
                f_next = jnp.where(
                    jnp.asarray(mask), f_next, jnp.zeros_like(f_next)
                )
                vset(nd, v=jnp.zeros_like(f_next), f=f_next)

        # ---- replicated sub-hierarchy (plain single-device ops) ----
        for l in range(nd, nlev - 1):
            v, f = vget(l)
            v = xla.jacobi(v, f, plan.dims[l], params, hs[l], pre)
            r, _ = xla.residual(v, f, plan.dims[l], params, hs[l])
            vset(l, v=v)
            vc, fc = vget(l + 1)
            f_next = xla.restrict_full_weighting(
                r, plan.dims[l], plan.dims[l + 1], vc.shape
            )
            vset(l + 1, v=jnp.zeros_like(vc), f=f_next)
        # coarsest
        vL, fL = vget(nlev - 1)
        vL = xla.jacobi(
            vL, fL, plan.dims[nlev - 1], params, hs[nlev - 1], pre + post
        )
        vset(nlev - 1, v=vL)
        for l in range(nlev - 1, nd, -1):
            vc, _ = vget(l)
            vf, ff = vget(l - 1)
            e = xla.interpolate(
                vc, plan.dims[l], plan.dims[l - 1], vf.shape
            )
            vf = vf + e
            vf = xla.jacobi(vf, ff, plan.dims[l - 1], params, hs[l - 1], post)
            vset(l - 1, v=vf)

        # ---- replicated -> distributed prolongation ----
        for l in range(nd, 0, -1):
            vf, ff = vget(l - 1)
            if l == nd:
                vc, _ = vget(nd)
                asm_c = _slice_coarse_for_shard(vc, plan, l - 1)
            else:
                vc, _ = vget(l)
                asm_c = _halo_exchange(vc, plan.mesh_shape)
            e = _prolong_local(asm_c, plan.block[l - 1])
            keep = _interior_mask(plan, l - 1, dtype)
            vf = jnp.where(keep, vf + e, jnp.zeros_like(vf))
            vf = _smooth(l - 1, vf, ff, post)
            vset(l - 1, v=vf)

        v0, f0_ = vget(0)
        _, ss = _residual(0, v0, f0_, with_norm=True)
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
            out.append(jnp.zeros((bx, by, bz), dtype))
            out.append(local_rhs(0) if l == 0 else
                       jnp.zeros((bx, by, bz), dtype))
        for l in range(nd, nlev):
            out.append(jnp.zeros(plan.alloc[l], dtype))
            out.append(jnp.zeros(plan.alloc[l], dtype))
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


def solve_spmd(
    params: GridParams, mesh: Mesh, cutoff: int = 4
) -> Tuple[tuple, List[float]]:
    """Full explicit-halo SPMD solve (LINEAR mode).  Returns the final state
    tuple and the residual history — comparable against the single-device
    solver's history."""
    init_fn, cycle_fn, plan = build_spmd_solver(params, mesh, cutoff)
    state = init_fn()

    # Initial residual (one cycle-shaped call would smooth; compute directly
    # with a tiny shard_map over the residual op).
    shard_map = _shard_map

    def local_r0(v, f):
        inv_h2 = 1.0 / (hs0 * hs0)
        keep = _interior_mask(plan, 0, jnp.dtype(params.dtype))
        asm = _halo_exchange(v, plan.mesh_shape)
        av = _stencil_local(asm, params.stencil, inv_h2, plan.block[0])
        r = jnp.where(keep, f - av, jnp.zeros_like(v))
        ss = jnp.sum(r * r)
        for name in _AXES:
            ss = lax.psum(ss, name)
        return jnp.sqrt(ss)

    hs0 = params.level_h(0)
    r0_fn = jax.jit(
        shard_map(
            local_r0,
            mesh=mesh,
            in_specs=(P("x", "y", "z"), P("x", "y", "z")),
            out_specs=P(),
            check_rep=False,
        )
    )
    initial = float(r0_fn(state[0], state[1]))
    history = [initial]
    for _ in range(params.maxiter):
        out = cycle_fn(*state)
        state = out[:-1]
        res = float(out[-1])
        history.append(res)
        if res <= initial / (1.0 / params.tol):
            break
    return state, history
