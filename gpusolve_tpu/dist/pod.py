"""Pod-scale SPMD engine: three Pallas launches per V-cycle.

Composes ops/pallas_pod's whole-direction kernels with the wavefront
mega-kernel as the replicated coarse tail:

    pod_down (all distributed down legs, in-kernel RDMA halo exchange)
      -> consolidation embed + all_gather (XLA, coarse-tail-sized)
      -> pallas_vcycle2 on the replicated sub-hierarchy (ONE kernel)
      -> boundary coarse slice (XLA)
      -> pod_up (all distributed up legs + fused finest-level norm)

Against the per-leg engine (dist/spmd.py) this removes every per-level
kernel launch, slab-exchange launch, and XLA embed between legs on x- and
y-split meshes (a z mesh axis folds into y, dist/spmd.SpmdPlan); the
per-level trapezoid numerics are byte-identical (the same ``_make_leg``
emitters run inside the chained kernels).

Pod level layout: x halves exactly down the chain; y/z extents are per
level ``round_up(n+2, 8)`` / ``round_up(n+1, 128)`` — see
ops/pallas_pod's docstring.  The distribution cutoff IS the pod depth:
levels >= npod are replicated and solved redundantly per chip by the tail
kernel (the multigrid analogue of pipeline-stage consolidation, moved up
to wherever the fused-leg gates stop paying).

State layout matches the per-leg engine: per level ``[v, f, aux?]``, pod
levels first (pod block shapes), then the replicated tail (alloc_shape
layouts) — so the Newton driver, residual-norm helper, checkpointing and
``gather_solution`` in dist/spmd.py work unchanged on a PodPlan.

Reference numerics: src/cpu/CpuSolver.cpp:85-139 (V-cycle), FAS :100-113 /
:121-125, via the shared leg emitters and the v2 tail kernel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.grid import alloc_shape
from gpusolve_tpu.ops import pallas_pod
from gpusolve_tpu.ops import pallas_vcycle2 as pv2
from gpusolve_tpu.dist import spmd as _spmd

_AXES = ("x", "y", "z")


def choose_npod(params: GridParams, mesh_xy,
                cutoff: int = 4) -> Optional[int]:
    """Pick the pod depth minimising estimated per-chip streamed volume:
    pod levels cost their (padded) block volume per chip; the tail costs
    its full hierarchy volume on EVERY chip (redundant replication) — so
    deeper pods pay x-alignment padding at level 0 while shallower pods
    pay redundant tail work, and the optimum moves with the mesh size.
    ``mesh_xy`` is the (mx, my) data decomposition."""
    if isinstance(mesh_xy, int):
        mesh_xy = (mesh_xy, 1)
    dims = params.level_dims()
    best = None
    for npod in range(1, len(dims)):
        if not pallas_pod.pod_supported(params, mesh_xy, npod):
            continue
        levels = pallas_pod.pod_levels(params, mesh_xy, npod)
        if levels[npod - 1][0] < max(16, cutoff):
            continue
        tail_params = params.replace(grid_dim=dims[npod])
        if not pv2.supported(tail_params):
            continue
        cost = sum(bx * by * zz for (bx, by, zz, *_) in levels[:npod])
        for t in range(npod, len(dims)):
            s = alloc_shape(dims[t])
            cost += s[0] * s[1] * pv2.z_live(dims[t], s)
        if best is None or cost < best[1]:
            best = (npod, cost)
    return best[0] if best else None


class PodPlan:
    """SpmdPlan-compatible decomposition plan for the pod engine.

    A z mesh axis folds into the y data decomposition exactly like
    dist/spmd.SpmdPlan (the z data axis is the lane axis — never split);
    ``mesh_shape`` is the (mx, my·mz, 1) DATA decomposition."""

    def __init__(self, params: GridParams, mesh_shape, npod: int):
        self.params = params
        self.device_mesh = tuple(mesh_shape)
        self.mesh_shape = (
            mesh_shape[0], mesh_shape[1] * mesh_shape[2], 1
        )
        self.names = (
            "x",
            ("y", "z") if self.device_mesh[2] > 1 else "y",
            "z",
        )
        self.dims = params.level_dims()
        self.nlev = len(self.dims)
        self.npod = npod
        self.n_dist = npod
        self.levels = pallas_pod.pod_levels(
            params, self.mesh_shape[:2], npod
        )
        self.block = [lv[:3] for lv in self.levels[:npod]]
        # SpmdPlan contract: ``alloc`` is the GLOBAL allocation per level
        # (block * mesh on the distributed prefix) — solve_refine_spmd
        # and the checkpoint fingerprint read it that way.
        self.alloc = [
            (
                self.mesh_shape[0] * bx,
                self.mesh_shape[1] * by,
                zz,
            )
            for (bx, by, zz) in self.block
        ]
        for l in range(npod, self.nlev):
            self.alloc.append(alloc_shape(self.dims[l]))
        # Tail-junction direct layout (round 5, VERDICT item 2): when the
        # gathered pod-coarse layout covers the tail kernel's standard
        # allocation (x/y) and its dense-z live extent, the tail runs
        # with alloc0 = that layout — the consolidation embed becomes
        # gather-only (identity on one shard) and the up-leg boundary
        # slice reads the tail array directly.  Every level-0 DMA in
        # pallas_vcycle2 slices its live (y, z) window explicitly, so
        # the layout override is free.
        cb_b, cy_b, cz_b = self.levels[npod][:3]
        std = alloc_shape(self.dims[npod])
        zl = pv2.z_live(self.dims[npod], std)
        ta2 = (
            self.mesh_shape[0] * cb_b,
            self.mesh_shape[1] * cy_b,
            cz_b,
        )
        if ta2[0] >= std[0] and ta2[1] >= std[1] and cz_b >= zl:
            self.tail_alloc0 = ta2
            self.alloc[npod] = ta2
        else:
            self.tail_alloc0 = None
        # _clean_level hooks (dist/spmd.py): every pod level is a Pallas
        # level whose live lane extent equals the allocation.
        self.ps_levels = [True] * npod
        self.zz_live = [lv[2] for lv in self.levels[:npod]]
        self.fused_down_levels = tuple(range(npod))
        self.fused_up_levels = tuple(range(1, npod + 1))


def _linearize(cycle_type: str, npod: int):
    """Linearize the (possibly W/F) schedule over the distributed levels
    into maximal launch groups: ``("down", a)`` — fused down legs
    a..npod-1 (every descent runs straight to the tail, so down runs are
    always suffix chains), ``("tail", kind, count)`` — count consecutive
    same-kind replicated-tail cycles (one mega-kernel launch, in-kernel
    cycle loop), ``("up", a)`` — fused up legs npod-1..a (every ascent
    starts at the tail; it stops where a level still owes sub-cycles).
    V linearizes to exactly the 3-launch structure.  Mirrors
    solver/vcycle.py's trace-time recursion (subcycles: W -> (W, W),
    F -> (F, V))."""
    subcycles = {"V": ("V",), "W": ("W", "W"), "F": ("F", "V")}
    events = []

    def cyc(l, kind):
        if l == npod:
            events.append(("tail", kind))
            return
        events.append(("down", l))
        for sub in subcycles[kind]:
            cyc(l + 1, sub)
        events.append(("up", l))

    cyc(0, cycle_type)
    groups = []
    i = 0
    while i < len(events):
        e = events[i]
        if e[0] == "down":
            a = e[1]
            while events[i][0] == "down":
                i += 1
            groups.append(("down", a))
        elif e[0] == "tail":
            kind = e[1]
            cnt = 0
            while (
                i < len(events) and events[i][0] == "tail"
                and events[i][1] == kind
            ):
                cnt += 1
                i += 1
            groups.append(("tail", kind, cnt))
        else:
            while i < len(events) and events[i][0] == "up":
                a = events[i][1]
                i += 1
            groups.append(("up", a))
    return tuple(groups)


def build_pod_solver(params: GridParams, mesh: Mesh, cutoff: int = 4):
    """(init_fn, cycle_fn, plan) with the dist/spmd engine contract.

    W/F schedules (beyond-reference) linearize into maximal runs of
    consecutive legs — every down run is a suffix chain [a..npod-1]
    ending at the tail and every up run a suffix chain starting there
    (see _linearize) — so the whole-direction kernels serve them with a
    ``level_offset``; the replicated tail runs its own W/F schedule
    inside the mega-kernel, consecutive same-kind visits batched via its
    in-kernel cycle loop."""
    key = dataclasses.replace(
        params, maxiter=0, tol=0.0, print_progress=False
    )
    return _build_pod_solver(key, mesh, cutoff)


@functools.lru_cache(maxsize=32)
def _build_pod_solver(params: GridParams, mesh: Mesh, cutoff: int):
    mesh_shape = mesh.devices.shape
    plan_probe = (mesh_shape[0], mesh_shape[1] * mesh_shape[2])
    npod = choose_npod(params, plan_probe, cutoff)
    if npod is None:
        raise ValueError(
            "pod engine unsupported for this geometry/mode; use the "
            "per-leg spmd engine"
        )
    plan = PodPlan(params, mesh_shape, npod)
    m, myf = plan.mesh_shape[0], plan.mesh_shape[1]
    ysplit = myf > 1
    ghy = pallas_pod._GH if ysplit else 0
    names = plan.names
    kmesh = (m, myf, mesh_shape[2])  # static for the pod kernels
    dims = plan.dims
    nlev = plan.nlev
    levels = plan.levels
    dtype = jnp.dtype(params.dtype)
    mode = params.mode
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    n_arr = 3 if (has_nv or has_rv) else 2
    gamma = params.gamma
    stencil = params.stencil
    hs = [params.level_h(l) for l in range(nlev)]
    interp = jax.default_backend() not in ("tpu", "axon")
    if interp:
        _spmd.gate_interpret_sync(
            int(mesh.devices.size), "the pod engine (fuse='pod')"
        )
    groups = _linearize(params.cycle_type, npod)
    tail_params_by_kind = {
        g[1]: params.replace(grid_dim=dims[npod], cycle_type=g[1])
        for g in groups if g[0] == "tail"
    }
    cb_b, cy_b, cz_b = levels[npod][:3]
    ta = plan.alloc[npod]

    dist_spec = P("x", names[1], None)
    repl_spec = P()
    in_specs = tuple(
        [dist_spec] * (n_arr * npod) + [repl_spec] * (n_arr * (nlev - npod))
    )

    def _yidx():
        return (
            lax.axis_index(names[1]).astype(jnp.int32)
            if myf > 1 else jnp.int32(0)
        )

    def _bounds(l):
        bx, by, zz, nx, ny, nz = levels[l]
        gs = lax.axis_index("x").astype(jnp.int32) * bx
        gsy = _yidx() * by
        vals = [
            jnp.maximum(jnp.int32(0), jnp.int32(1) - gs),
            jnp.minimum(jnp.int32(bx - 1), jnp.int32(nx) - gs),
            jnp.maximum(jnp.int32(0), jnp.int32(1) - gsy),
            jnp.minimum(jnp.int32(by - 1), jnp.int32(ny) - gsy),
            jnp.int32(1), jnp.int32(nz),
            gs, jnp.int32(nx),
            gsy, jnp.int32(ny),
            jnp.int32(0), jnp.int32(0),
        ]
        return jnp.stack(vals).reshape(1, 12)

    def _embed_tail(x3):
        """Pod coarse output (per-shard (cb_b, cy_b, cz_b)) -> replicated
        tail-finest array (alloc layout) on every shard.  With the direct
        tail layout (plan.tail_alloc0) the gather IS the embed — identity
        on one shard; otherwise crop+pad is one XLA pad op (vs zeros +
        dynamic-update-slice: an extra full-tail copy per cycle of glue)."""
        g = x3
        if m > 1:
            g = lax.all_gather(g, "x", axis=0, tiled=True)
        if myf > 1:
            g = lax.all_gather(g, names[1], axis=1, tiled=True)
        if plan.tail_alloc0 is not None:
            return g
        crop = tuple(min(g.shape[a], ta[a]) for a in range(3))
        g = g[: crop[0], : crop[1], : crop[2]]
        return jax.lax.pad(
            g, jnp.zeros((), dtype),
            [(0, ta[a] - crop[a], 0) for a in range(3)],
        )

    def _slice_boundary(vt):
        """Replicated tail-finest field -> this shard's pod-layout coarse
        block + its ghost slabs (x pair, y-extended under the split,
        plus the y pair; no communication: the tail is replicated)."""
        gh = pallas_pod._GH
        if m == 1 and myf == 1:
            if plan.tail_alloc0 is not None:
                # Direct tail layout: the tail array IS this shard's
                # block — zero-copy boundary (the ghost slabs are the
                # Dirichlet zeros).
                z2 = jnp.zeros((gh, cy_b, cz_b), dtype)
                return vt, (z2, z2)
            # Single-shard specialisation: the block is a static crop/pad
            # of the tail and the ghost slabs are the Dirichlet zeros —
            # no embedded global array, no dynamic slices (each was a
            # full-coarse-volume copy of per-cycle glue).
            crop = (min(ta[0], cb_b), min(ta[1], cy_b), min(ta[2], cz_b))
            cvb = jax.lax.pad(
                vt[: crop[0], : crop[1], : crop[2]],
                jnp.zeros((), dtype),
                [(0, cb_b - crop[0], 0), (0, cy_b - crop[1], 0),
                 (0, cz_b - crop[2], 0)],
            )
            z2 = jnp.zeros((gh, cy_b, cz_b), dtype)
            return cvb, (z2, z2)
        g = jnp.zeros(
            (m * cb_b + 2 * gh, myf * cy_b + 2 * ghy, cz_b), dtype
        )
        sl = (
            min(ta[0], m * cb_b), min(ta[1], myf * cy_b),
            min(ta[2], cz_b),
        )
        g = g.at[gh : gh + sl[0], ghy : ghy + sl[1], : sl[2]].set(
            vt[: sl[0], : sl[1], : sl[2]]
        )
        start = lax.axis_index("x").astype(jnp.int32) * cb_b
        sy = _yidx() * cy_b
        z0 = jnp.int32(0)
        cye = cy_b + 2 * ghy
        cvb = lax.dynamic_slice(
            g, (gh + start, ghy + sy, z0), (cb_b, cy_b, cz_b)
        )
        clo = lax.dynamic_slice(g, (start, sy, z0), (gh, cye, cz_b))
        chi = lax.dynamic_slice(
            g, (gh + start + cb_b, sy, z0), (gh, cye, cz_b)
        )
        if not ysplit:
            return cvb, (clo, chi)
        cylo = lax.dynamic_slice(
            g, (gh + start, sy, z0), (cb_b, gh, cz_b)
        )
        cyhi = lax.dynamic_slice(
            g, (gh + start, ghy + sy + cy_b, z0), (cb_b, gh, cz_b)
        )
        return cvb, (clo, chi, cylo, cyhi)

    def _edge_norm_complete(v, f, aux, pss):
        """Finish the fused post-smooth norm: the kernel sums interior
        planes [1, bx-1); the two x-edge planes need the neighbours'
        post-smoothed faces (dist/spmd.py's helper, pod layout; under
        the y split also the y-neighbours' ghost rows for the center
        plane's oy taps)."""
        bx, by, zz, nx, ny, nz = levels[0]
        yi2 = lax.broadcasted_iota(jnp.int32, (by, zz), 0)
        zi2 = lax.broadcasted_iota(jnp.int32, (by, zz), 1)
        if m > 1:
            fwd = [(i, i + 1) for i in range(m - 1)]
            bwd = [(i + 1, i) for i in range(m - 1)]
            glo = lax.ppermute(v[bx - 1], "x", fwd)
            ghi = lax.ppermute(v[0], "x", bwd)
        else:
            glo = jnp.zeros((by, zz), dtype)
            ghi = glo
        gs = lax.axis_index("x") * bx
        inv_h2 = 1.0 / (hs[0] * hs[0])
        if ysplit:
            gy0 = _yidx() * by
            keep2 = (
                (gy0 + yi2 >= 1) & (gy0 + yi2 <= ny)
                & (zi2 >= 1) & (zi2 <= nz)
            )
            yfwd = [(i, i + 1) for i in range(myf - 1)]
            ybwd = [(i + 1, i) for i in range(myf - 1)]
            edge2 = jnp.stack([v[0], v[bx - 1]])
            yglo = lax.ppermute(edge2[:, by - 1, :], names[1], yfwd)
            yghi = lax.ppermute(edge2[:, 0, :], names[1], ybwd)
        else:
            keep2 = (
                (yi2 >= 1) & (yi2 <= ny) & (zi2 >= 1) & (zi2 <= nz)
            )
            yglo = yghi = None
        adt = jnp.float64 if dtype == jnp.float64 else jnp.float32
        ss = pss.astype(adt)
        for qi, (q, xm, x0, xp) in enumerate((
            (0, glo, v[0], v[1]),
            (bx - 1, v[bx - 2], v[bx - 1], ghi),
        )):
            acc = None
            for val, (ox, oy, oz) in zip(stencil.values, stencil.offsets):
                if ox < 0:
                    term = val * xm
                elif ox > 0:
                    term = val * xp
                else:
                    tap = _spmd._shifted_local(
                        x0[None], (0, oy, oz), (1, by, zz)
                    )[0]
                    if oy and yglo is not None:
                        if oy < 0:
                            tap = tap.at[0, :].set(yglo[qi])
                        else:
                            tap = tap.at[by - 1, :].set(yghi[qi])
                    term = val * tap
                acc = term if acc is None else acc + term
            av = acc * inv_h2
            if has_nv:
                nvq = aux[q]
                av = av + gamma * (1.0 + nvq) * x0 * jnp.exp(nvq)
            elif has_rv:
                av = av + gamma * x0 * jnp.exp(x0)
            gq = gs + q
            keep_q = keep2 & (gq >= 1) & (gq <= nx)
            r = jnp.where(keep_q, f[q] - av, jnp.zeros_like(x0))
            ss = ss + jnp.sum(r.astype(adt) ** 2)
        ss = lax.psum(ss, "x")
        if myf > 1:
            ss = lax.psum(ss, names[1])
        return ss.astype(dtype)

    def local_cycle(*state):
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

        f0 = state[1]
        nvs = [sget(l)[2] for l in range(npod)] if has_nv else []
        my = jnp.stack([
            lax.axis_index("x").astype(jnp.int32), _yidx()
        ]).reshape(1, 2)
        bounds = [_bounds(l) for l in range(npod)]
        thr = jnp.full((1, 1), -1.0, jnp.float32)

        # Latest down-leg outputs per level (the tail embed reads the
        # deepest one; W/F re-descents refresh them).  Only the FIRST
        # tail group after a down-run embeds a fresh coarse start —
        # consecutive tail groups of a different kind (F's (F, V)
        # subcycles) continue from the tail state the previous group
        # left (same-kind neighbours batch into one launch instead, the
        # mega-kernel's in-kernel loop carrying state).
        last_deep = [None]
        fresh_tail = [False]
        ss_final = [None]

        for grp in groups:
            if grp[0] == "down":
                # ---- down legs a..npod-1: ONE kernel (suffix chain) ------
                a = grp[1]
                va, fa = sget(a)[0], sget(a)[1]
                nvs_c = (
                    [sget(l)[2] for l in range(a, npod)]
                    if has_nv else []
                )
                downs = pallas_pod.pod_down(
                    va, fa, nvs_c, bounds[a:], my, levels[a:], params,
                    kmesh, interpret=interp, level_offset=a,
                )
                for i, l in enumerate(range(a, npod)):
                    sset(l, v=downs[i][0])
                    if l + 1 < npod:
                        sset(
                            l + 1, f=downs[i][1],
                            aux=downs[i][2] if has_rv else None,
                        )
                last_deep[0] = downs[-1]
                fresh_tail[0] = True
            elif grp[0] == "tail":
                # ---- consolidation + replicated tail (v2 mega-kernel) ----
                kind, cnt = grp[1], grp[2]
                # Zero-start fresh tails (LINEAR/NEWTON, single-cycle
                # group): the kernel's peeled first cycle never reads the
                # v input, so the dead previous tail v stands in and no
                # zeros volume is materialised per cycle.
                zs = fresh_tail[0] and not has_rv and cnt == 1
                if fresh_tail[0]:
                    dn = last_deep[0]
                    tf0 = _embed_tail(dn[1])
                    if has_rv:
                        tv0 = _embed_tail(dn[2])
                        trv0 = tv0
                    else:
                        tv0 = (
                            sget(npod)[0] if zs else jnp.zeros(ta, dtype)
                        )
                        trv0 = None
                targs = []
                for t in range(npod, nlev):
                    arrs = sget(t)
                    if t == npod and fresh_tail[0]:
                        targs.append(tv0)
                        targs.append(tf0)
                        if has_nv:
                            targs.append(arrs[2])
                        elif has_rv:
                            targs.append(trv0)
                    else:
                        targs.extend(arrs[:n_arr])
                fresh_tail[0] = False
                ncyc = jnp.full((1, 1), cnt, jnp.int32)
                touts = pv2.batch_call(
                    tuple(targs), tail_params_by_kind[kind], cnt, ncyc,
                    thr, interpret=interp, alloc0=plan.tail_alloc0,
                    zero_start=zs,
                )
                for i, t in enumerate(range(npod, nlev)):
                    o = touts[i * n_arr : (i + 1) * n_arr]
                    sset(t, v=o[0], f=o[1],
                         aux=o[2] if n_arr == 3 else None)
            else:
                # ---- up legs npod-1..a: ONE kernel (suffix chain) --------
                a = grp[1]
                vt = sget(npod)[0]
                if has_rv:
                    vt = vt - sget(npod)[2]
                cvb, cvb_slabs = _slice_boundary(vt)
                vs = [sget(l)[0] for l in range(a, npod)]
                fs = [sget(l)[1] for l in range(a, npod)]
                rvs = [None] + [
                    sget(l)[2] if has_rv else None
                    for l in range(a + 1, npod)
                ]
                nvs_c = (
                    [sget(l)[2] for l in range(a, npod)]
                    if has_nv else []
                )
                emit = a == 0
                vups, pss = pallas_pod.pod_up(
                    vs, fs, nvs_c, rvs, cvb, cvb_slabs, bounds[a:], my,
                    levels[a:], params, kmesh, interpret=interp,
                    level_offset=a, emit_norm=emit,
                )
                for i, l in enumerate(range(a, npod)):
                    sset(l, v=vups[i])
                if emit:
                    ss_final[0] = _edge_norm_complete(
                        vups[0], f0, nvs[0] if has_nv else None, pss
                    )

        return tuple(state) + (jnp.sqrt(ss_final[0]),)

    out_specs = in_specs + (repl_spec,)
    smapped = _spmd._shard_map(
        local_cycle, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )
    cycle_fn = jax.jit(lambda *state: smapped(*state))

    def local_init(_):
        out = []
        for l in range(npod):
            bx, by, zz = plan.block[l]
            z = jnp.zeros((bx, by, zz), dtype)
            out.append(z)
            out.append(
                _spmd._local_rhs(plan, 0, params, dtype) if l == 0 else z
            )
            if n_arr == 3:
                out.append(z)
        for l in range(npod, nlev):
            z = jnp.zeros(plan.alloc[l], dtype)
            out.extend([z] * n_arr)
        return tuple(out)

    init_smapped = _spmd._shard_map(
        local_init, mesh=mesh, in_specs=(repl_spec,), out_specs=in_specs,
        check_rep=False,
    )
    init_fn = jax.jit(lambda: init_smapped(jnp.zeros((1,), dtype)))

    return init_fn, cycle_fn, plan
