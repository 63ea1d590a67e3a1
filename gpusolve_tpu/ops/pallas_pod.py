"""Pod-scale multigrid kernels: ALL distributed V-cycle legs in ONE Pallas
launch per direction, with in-kernel RDMA halo exchange between legs.

The per-leg SPMD engine (dist/spmd.py + ops/pallas_spmd.py) launches one
trapezoid kernel per level per leg and returns to XLA between them for the
x-face slab exchange and the coarse-level embeds.  This module chains the
same leg emitters (ops/pallas_spmd._make_leg) into two whole-direction
kernels:

  * ``pod_down``: for pod levels 0..npod-1, all pre-sweeps + residual +
    full x/y/z restriction (+ FAS tau fold) per level, the restricted
    output streaming directly into the next leg as its RHS — no XLA embed,
    no separate exchange kernel.  Mid-level x-face slabs are delivered by
    in-kernel remote DMAs (``pltpu.make_async_remote_copy``) issued as soon
    as the producing leg drains.
  * ``pod_up``: for pod levels npod-1..0, prolongation + correction + all
    post-sweeps per level (FAS: the up-leg ``v -= restV`` folded into the
    final write so the next-finer corr stage streams it directly), with the
    finest level's fused residual-norm consumer.

The replicated coarse tail (levels >= npod) is NOT in these kernels: it is
one whole V-cycle on the sub-hierarchy, which ops/pallas_vcycle2 already
runs as a single kernel — the pod engine (dist/pod.py) composes
``pod_down -> vcycle2 tail -> pod_up`` as three launches per cycle.

Pod level layout (distinct from the leg engine's mesh-aware allocation):
the x axis halves exactly down the chain (``bx_l = a0x/(m·2^l)`` with
``16·m·2^(npod-1) | a0x`` for the fused gates), while y and z extents are
chosen *per level* as ``round_up(n+2, 8)`` / ``round_up(n+1, 128)`` — the
separable restriction/prolongation matrices make the minor axes free, so no
chained-halving padding accumulates (round-1 VERDICT's padding-traffic
lesson).

RDMA protocol (per invocation): one neighbour barrier at kernel start (the
standard Pallas collective prologue — bounds cross-invocation skew), then
each exchange phase remote-writes 8-plane x-face slabs into the peers'
receive buffers (pallas *outputs*, so they live in HBM like the per-leg
engine's slab operands) on its own DMA-semaphore rows — rows are NOT shared
across phases because ICI delivery order between two in-flight transfers is
unspecified, and a counted wait on a shared row could unblock on the wrong
phase's arrival.  Shards at the global edge zero-fill instead (Dirichlet).

Reference numerics: identical to the per-leg engine (src/cpu/CpuSolver.cpp
:85-139 V-cycle, :141-179 Jacobi, :211-238/:240-290 transfers; FAS
:100-113, :121-125).  float32, x-split meshes (mesh y = z = 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.ops.pallas_spmd import (
    _GH,
    _VMEM_LIMIT,
    _compile_key,
    _make_leg,
)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# The leg emitters' DMA pacing assumes copies read their source at start()
# (hardware semantics); InterpretParams' default dma_execution_mode
# 'on_wait' defers the copy to the wait point, by which time a staging
# ring slot may have been legally reused — eager matches the machine.
_INTERP = pltpu.InterpretParams(dma_execution_mode="eager")


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def pod_levels(params: GridParams, mesh_x: int, npod: int):
    """Per-level pod geometry ``((bx, by, zz, nx, ny, nz), ...)`` for levels
    0..npod (entry npod = the boundary coarse / tail-finest block in pod
    layout), or None if the fused-leg gates fail.

    x halves exactly (the in-kernel wavefront restriction maps fine local
    2m±1 onto coarse local m, which needs fine start = 2 x coarse start);
    y/z extents are free per level (separable transfer matrices)."""
    dims = params.level_dims()
    if npod < 1 or npod >= len(dims):
        return None
    # 16 | bx_l for every fused down leg l < npod, 8 | the boundary coarse
    # block, m | every level's allocation: one rounding covers all.
    a0x = _round_up(dims[0][0] + 2, mesh_x * 16 * (1 << (npod - 1)))
    levels = []
    for l in range(npod + 1):
        nx, ny, nz = dims[l]
        bx = a0x // mesh_x >> l
        by = _round_up(ny + 2, 8)
        zz = _round_up(nz + 1, 128)
        if bx < nx // mesh_x + 1:  # halving chain failed to cover the level
            return None
        levels.append((bx, by, zz, nx, ny, nz))
    S, T = params.pre_smoothing, params.post_smoothing
    for l in range(npod):
        bx, by, zz, nx, ny, nz = levels[l]
        if bx % 16 or bx < 16:
            return None
        if not (1 <= S <= 5 and S + 2 <= 8 and 1 <= T <= 4):
            return None
        # Mosaic DMA-slice tiling of the streamed rings.
        if by % 8 or zz % 128:
            return None
    cbx = levels[npod][0]
    if cbx % 8:
        return None
    return tuple(levels)


def _leg_scratch_bytes(levels, l, mode, S, consumer, src_corr,
                       sub_rv, fold_tau) -> int:
    """Mirror of _make_leg's VMEM scratch plan (budget gate)."""
    bx, by, zz, *_ = levels[l]
    cbx, cby, czz, *_ = levels[l + 1] if l + 1 < len(levels) else (0, 0, 0)
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    stream_v = not (consumer == "restrict" and l > 0 and not has_rv)
    goff = 1 if src_corr else 0
    n = 0
    if stream_v:
        n += 16 * by * zz
    n += 16 * by * zz                       # sf
    if has_nv:
        n += 16 * by * zz
    n += 3 * by * zz * max(S - 1 + goff, 1)  # gen rings
    n += 16 * by * zz                       # outst
    if src_corr:
        n += 16 * cby * czz                 # coarse ring
    if sub_rv:
        n += 16 * by * zz                   # srv
    if consumer == "restrict":
        n += 3 * by * zz                    # rres
        n += 16 * cby * czz                 # cst
        if has_rv:
            n += 16 * cby * czz             # cst2
        if fold_tau:
            n += 3 * cby * czz              # vr3
    return 4 * n


def pod_scratch_bytes(levels, mode, pre: int, post: int) -> tuple:
    """(down_bytes, up_bytes) VMEM scratch estimates for the two kernels
    (+ the shared zero slab)."""
    npod = len(levels) - 1
    has_rv = mode == Mode.NONLINEAR
    zslab = 4 * _GH * levels[0][1] * levels[0][2]
    down = zslab
    up = zslab
    for l in range(npod):
        down += _leg_scratch_bytes(
            levels, l, mode, pre, "restrict", False, False, has_rv
        )
        up += _leg_scratch_bytes(
            levels, l, mode, post, "norm" if l == 0 else None, True,
            has_rv and l >= 1, False,
        )
    return down, up


def pod_supported(params: GridParams, mesh_x: int, npod: int) -> bool:
    from gpusolve_tpu.ops import pallas_spmd

    if not pallas_spmd.supported(params):
        return False
    levels = pod_levels(params, mesh_x, npod)
    if levels is None:
        return False
    down, up = pod_scratch_bytes(
        levels, params.mode, params.pre_smoothing, params.post_smoothing
    )
    margin = 12 * 1024 * 1024
    return max(down, up) <= _VMEM_LIMIT - margin


# ---------------------------------------------------------------------------
# In-kernel RDMA exchange emitter
# ---------------------------------------------------------------------------

def _emit_exchange(my, mesh_x: int, sets, zbuf, xsems, row0: int):
    """Exchange the 8-plane x-face slabs of ``sets`` with the ±x
    neighbours: ``sets[i] = (src_ref, lo_recv, hi_recv, bx, by, zz)``.
    Slab i uses semaphore rows ``row0 + i`` (disjoint across phases — see
    module docstring).  Waits sends and receives before returning."""
    m = mesh_x
    z0 = jnp.int32(0)
    has_lo = my > 0
    has_hi = my < m - 1
    left = (my - 1, z0, z0)
    right = (my + 1, z0, z0)
    cps = []
    for i, (src, lo_r, hi_r, bx, by, zz) in enumerate(sets):
        r = row0 + i
        cp_lo = pltpu.make_async_remote_copy(
            src.at[pl.ds(0, _GH)], hi_r,
            xsems.at[r, 0], xsems.at[r, 1], device_id=left,
        )
        cp_hi = pltpu.make_async_remote_copy(
            src.at[pl.ds(bx - _GH, _GH)], lo_r,
            xsems.at[r, 2], xsems.at[r, 3], device_id=right,
        )

        @pl.when(has_lo)
        def _(cp=cp_lo):
            cp.start()

        @pl.when(has_hi)
        def _(cp=cp_hi):
            cp.start()

        cps.append((cp_lo, cp_hi))

    # Zero-fill the global-edge slabs (Dirichlet) while RDMAs fly.
    for i, (src, lo_r, hi_r, bx, by, zz) in enumerate(sets):
        r = row0 + i

        @pl.when(~has_lo)
        def _(lo_r=lo_r, by=by, zz=zz, r=r):
            zc = pltpu.make_async_copy(
                zbuf.at[:, :by, :zz], lo_r, xsems.at[r, 4]
            )
            zc.start()
            zc.wait()

        @pl.when(~has_hi)
        def _(hi_r=hi_r, by=by, zz=zz, r=r):
            zc = pltpu.make_async_copy(
                zbuf.at[:, :by, :zz], hi_r, xsems.at[r, 5]
            )
            zc.start()
            zc.wait()

    for cp_lo, cp_hi in cps:

        @pl.when(has_lo)
        def _(cp_lo=cp_lo, cp_hi=cp_hi):
            cp_lo.wait_send()   # my slab landed on the left
            cp_hi.wait_recv()   # the left's slab arrived in my lo buffer

        @pl.when(has_hi)
        def _(cp_lo=cp_lo, cp_hi=cp_hi):
            cp_hi.wait_send()
            cp_lo.wait_recv()


def _emit_barrier(my, mesh_x: int, bsem):
    """Neighbour barrier: every shard signals its existing ±x neighbours
    and waits for the same count (cross-invocation skew bound)."""
    has_lo = my > 0
    has_hi = my < mesh_x - 1
    z0 = jnp.int32(0)

    @pl.when(has_lo)
    def _():
        pltpu.semaphore_signal(bsem, 1, device_id=(my - 1, z0, z0))

    @pl.when(has_hi)
    def _():
        pltpu.semaphore_signal(bsem, 1, device_id=(my + 1, z0, z0))

    nwait = has_lo.astype(jnp.int32) + has_hi.astype(jnp.int32)

    @pl.when(nwait > 0)
    def _():
        pltpu.semaphore_wait(bsem, nwait)


# ---------------------------------------------------------------------------
# Down kernel: all fused down legs in one launch
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pod_down_call(levels, hs, key, dtype_name, S: int, mesh_x: int,
                   interpret: bool):
    mode = key[2]
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    npod = len(levels) - 1
    dtype = jnp.dtype(dtype_name)

    legs = []
    stream_vs = []
    for l in range(npod):
        bx, by, zz, nx, ny, nz = levels[l]
        _, cby, czz, _, cny, cnz = levels[l + 1]
        src_zero = l > 0 and not has_rv
        stream_vs.append(not src_zero)
        legs.append(_make_leg(
            (bx, by, zz), zz, dtype_name, key, hs[l], S, src_zero,
            False, None, "restrict", czz, cnz, cby, cny,
            tau_h=(hs[l + 1] if has_rv else 0.0),
        ))

    # ---- flat ref layout -------------------------------------------------
    # inputs (HBM): v0, f0, [nv_l]*npod
    # inputs (SMEM): my_x (1,1), b_l (1,8) per level
    # outputs (HBM): per level: vout, xzr, [xzv]; then per level the slab
    #   receive buffers [vlo,vhi](stream_v) flo,fhi [nvlo,nvhi]
    n_hbm_in = 2 + (npod if has_nv else 0)
    out_shapes = []
    slab_shapes = []
    out_per_level = 3 if has_rv else 2
    for l in range(npod):
        bx, by, zz, *_ = levels[l]
        cbx, cby, czz, *_ = levels[l + 1]
        out_shapes.append(jax.ShapeDtypeStruct((bx, by, zz), dtype))
        out_shapes.append(jax.ShapeDtypeStruct((cbx, cby, czz), dtype))
        if has_rv:
            out_shapes.append(jax.ShapeDtypeStruct((cbx, cby, czz), dtype))
    for l in range(npod):
        bx, by, zz, *_ = levels[l]
        nslab = (2 if stream_vs[l] else 0) + 2 + (2 if has_nv else 0)
        for _ in range(nslab):
            slab_shapes.append(
                jax.ShapeDtypeStruct((_GH, by, zz), dtype)
            )
    n_out_main = len(out_shapes)
    out_shapes += slab_shapes

    scratch = []
    leg_scr_slices = []
    for leg, _, scr, _ in legs:
        leg_scr_slices.append((len(scratch), len(scratch) + len(scr)))
        scratch.extend(scr)
    zbuf_idx = len(scratch)
    scratch.append(pltpu.VMEM((_GH, levels[0][1], levels[0][2]), dtype))
    bsem_idx = len(scratch)
    scratch.append(pltpu.SemaphoreType.REGULAR)
    xsem_idx = len(scratch)
    # Phase rows: phase 0 (level-0 v/f + all newton_v slabs) then one
    # phase per mid level (f [, v] slabs from the fresh coarse outputs).
    n_sets0 = 2 + (npod if has_nv else 0)
    n_sets_mid = 1 + (1 if has_rv else 0)
    n_rows = n_sets0 + (npod - 1) * n_sets_mid
    scratch.append(pltpu.SemaphoreType.DMA((max(n_rows, 1), 6)))

    def kernel(*refs):
        hbm_in = refs[:n_hbm_in]
        my_ref = refs[n_hbm_in]
        b_refs = refs[n_hbm_in + 1 : n_hbm_in + 1 + npod]
        outs = refs[n_hbm_in + 1 + npod :
                    n_hbm_in + 1 + npod + len(out_shapes)]
        scr = refs[n_hbm_in + 1 + npod + len(out_shapes) :]
        v0, f0 = hbm_in[0], hbm_in[1]
        nvs = list(hbm_in[2 : 2 + npod]) if has_nv else [None] * npod
        main_outs = outs[:n_out_main]
        slab_refs = list(outs[n_out_main:])
        zbuf = scr[zbuf_idx]
        bsem = scr[bsem_idx]
        xsems = scr[xsem_idx]
        my = my_ref[0, 0]

        def level_outs(l):
            base = l * out_per_level
            vout = main_outs[base]
            xzr = main_outs[base + 1]
            xzv = main_outs[base + 2] if has_rv else None
            return vout, xzr, xzv

        slabs = []
        it = iter(slab_refs)
        for l in range(npod):
            d = {}
            if stream_vs[l]:
                d["v"] = (next(it), next(it))
            d["f"] = (next(it), next(it))
            if has_nv:
                d["nv"] = (next(it), next(it))
            slabs.append(d)

        zbuf[...] = jnp.zeros_like(zbuf)
        _emit_barrier(my, mesh_x, bsem)

        # Phase 0: level-0 field slabs + every level's newton_v slabs
        # (all sources are kernel inputs, stable from the start).
        sets = []
        bx0, by0, zz0 = levels[0][:3]
        sets.append((v0, *slabs[0]["v"], bx0, by0, zz0))
        sets.append((f0, *slabs[0]["f"], bx0, by0, zz0))
        if has_nv:
            for l in range(npod):
                bx, by, zz = levels[l][:3]
                sets.append((nvs[l], *slabs[l]["nv"], bx, by, zz))
        _emit_exchange(my, mesh_x, sets, zbuf, xsems, 0)

        row = n_sets0
        for l in range(npod):
            bx, by, zz, *_ = levels[l]
            vout, xzr, xzv = level_outs(l)
            if l == 0:
                v_in, f_in = v0, f0
            else:
                _, pxzr, pxzv = level_outs(l - 1)
                v_in, f_in = pxzv, pxzr
            leg, n_in, scr_shapes, _ = legs[l]
            s0, s1 = leg_scr_slices[l]
            leg_refs = []
            if stream_vs[l]:
                leg_refs.append(v_in)
            leg_refs.append(f_in)
            if has_nv:
                leg_refs.append(nvs[l])
            if stream_vs[l]:
                leg_refs.extend(slabs[l]["v"])
            leg_refs.extend(slabs[l]["f"])
            if has_nv:
                leg_refs.extend(slabs[l]["nv"])
            leg_refs.append(b_refs[l])
            leg_refs.append(vout)
            leg_refs.append(xzr)
            if has_rv:
                leg_refs.append(xzv)
            leg_refs.extend(scr[s0:s1])
            leg(tuple(leg_refs))

            if l + 1 < npod:
                # The fresh coarse outputs are this shard's next-level
                # fields; exchange their faces for the next leg.
                cbx, cby, czz, *_ = levels[l + 1]
                sets = [(xzr, *slabs[l + 1]["f"], cbx, cby, czz)]
                if has_rv:
                    sets.append(
                        (xzv, *slabs[l + 1]["v"], cbx, cby, czz)
                    )
                _emit_exchange(my, mesh_x, sets, zbuf, xsems, row)
                row += n_sets_mid

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * n_hbm_in
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 + npod)
    out_specs = tuple(
        pl.BlockSpec(memory_space=pltpu.HBM) for _ in out_shapes
    )
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=_INTERP if interpret else False,
    ), n_out_main


def pod_down(v0, f0, nvs, bounds, my_x, levels, params: GridParams,
             mesh_x: int, interpret: bool = False):
    """Run all fused down legs in one launch.  Returns per-level
    ``(vout, xzr[, xzv])`` tuples (coarse outputs final: interior-masked,
    FAS tau-corrected)."""
    hs = tuple(params.level_h(l) for l in range(len(levels)))
    call, n_out_main = _pod_down_call(
        levels, hs, _compile_key(params), v0.dtype.name,
        params.pre_smoothing, mesh_x, interpret,
    )
    args = [v0, f0]
    if params.mode == Mode.NEWTON:
        args.extend(nvs)
    args.append(my_x)
    args.extend(bounds)
    outs = call(*args)[:n_out_main]
    npod = len(levels) - 1
    per = 3 if params.mode == Mode.NONLINEAR else 2
    return [tuple(outs[l * per : (l + 1) * per]) for l in range(npod)]


# ---------------------------------------------------------------------------
# Up kernel: all fused up legs in one launch
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pod_up_call(levels, hs, key, dtype_name, T: int, mesh_x: int,
                 interpret: bool):
    mode = key[2]
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    npod = len(levels) - 1
    dtype = jnp.dtype(dtype_name)

    legs = {}
    for lc in range(npod):
        bx, by, zz, nx, ny, nz = levels[lc]
        cbx, cby, czz, *_ = levels[lc + 1]
        sub_rv = has_rv and lc >= 1
        legs[lc] = _make_leg(
            (bx, by, zz), zz, dtype_name, key, hs[lc], T, False,
            True, (cby, czz, czz, ny, nz),
            "norm" if lc == 0 else None, 0, 0, 0, 0,
            sub_rv=sub_rv,
        )

    # ---- flat ref layout -------------------------------------------------
    # inputs (HBM): per lc: v_lc (down-smoothed), f_lc; [nv_lc]*npod;
    #   [rv_lc for lc>=1] (FAS); cv_b (boundary coarse, already v-restV,
    #   sliced per shard by the caller) + its clo/chi slabs (replicated
    #   tail: sliced, not exchanged).
    # inputs (SMEM): my_x, b_l per level.
    # outputs: per lc: vup; sum (1,1) SMEM; slab receive buffers.
    hbm_in_shapes = []
    for lc in range(npod):
        bx, by, zz, *_ = levels[lc]
        hbm_in_shapes.append(("v", lc))
        hbm_in_shapes.append(("f", lc))
    if has_nv:
        for lc in range(npod):
            hbm_in_shapes.append(("nv", lc))
    if has_rv:
        for lc in range(1, npod):
            hbm_in_shapes.append(("rv", lc))
    hbm_in_shapes.append(("cvb", npod))
    hbm_in_shapes.append(("cvb_lo", npod))
    hbm_in_shapes.append(("cvb_hi", npod))
    n_hbm_in = len(hbm_in_shapes)

    out_shapes = []
    for lc in range(npod):
        bx, by, zz, *_ = levels[lc]
        out_shapes.append(jax.ShapeDtypeStruct((bx, by, zz), dtype))
    sum_idx = len(out_shapes)
    out_shapes.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
    n_out_main = len(out_shapes)
    # Receive buffers: per lc: v,f [,nv] [,rv if sub_rv] slab pairs, and
    # for lc < npod-1 the coarse (vup_{lc+1}) slab pair.
    slab_plan = []
    for lc in range(npod):
        bx, by, zz, *_ = levels[lc]
        kinds = ["v", "f"]
        if has_nv:
            kinds.append("nv")
        if has_rv and lc >= 1:
            kinds.append("rv")
        for k in kinds:
            slab_plan.append((lc, k, by, zz))
        if lc < npod - 1:
            cbx, cby, czz, *_ = levels[lc + 1]
            slab_plan.append((lc, "c", cby, czz))
    for (_, _, by, zz) in slab_plan:
        out_shapes.append(jax.ShapeDtypeStruct((_GH, by, zz), dtype))
        out_shapes.append(jax.ShapeDtypeStruct((_GH, by, zz), dtype))

    scratch = []
    leg_scr_slices = {}
    for lc in range(npod):
        scr = legs[lc][2]
        leg_scr_slices[lc] = (len(scratch), len(scratch) + len(scr))
        scratch.extend(scr)
    zbuf_idx = len(scratch)
    scratch.append(pltpu.VMEM((_GH, levels[0][1], levels[0][2]), dtype))
    bsem_idx = len(scratch)
    scratch.append(pltpu.SemaphoreType.REGULAR)
    xsem_idx = len(scratch)
    n_rows = len(slab_plan)
    scratch.append(pltpu.SemaphoreType.DMA((max(n_rows, 1), 6)))

    def kernel(*refs):
        hbm_in = refs[:n_hbm_in]
        my_ref = refs[n_hbm_in]
        b_refs = refs[n_hbm_in + 1 : n_hbm_in + 1 + npod]
        outs = refs[n_hbm_in + 1 + npod :
                    n_hbm_in + 1 + npod + len(out_shapes)]
        scr = refs[n_hbm_in + 1 + npod + len(out_shapes) :]
        fields = {}
        for (kind, lc), r in zip(hbm_in_shapes, hbm_in):
            fields[(kind, lc)] = r
        vups = list(outs[:npod])
        sum_ref = outs[sum_idx]
        slab_refs = list(outs[n_out_main:])
        zbuf = scr[zbuf_idx]
        bsem = scr[bsem_idx]
        xsems = scr[xsem_idx]
        my = my_ref[0, 0]

        slabs = {}
        for (lc, k, by, zz), i in zip(
            slab_plan, range(len(slab_plan))
        ):
            slabs[(lc, k)] = (slab_refs[2 * i], slab_refs[2 * i + 1])

        zbuf[...] = jnp.zeros_like(zbuf)
        _emit_barrier(my, mesh_x, bsem)

        # Phase 0: every input-sourced slab (fine v/f/nv/rv per level) —
        # all stable at kernel start.
        sets = []
        row = 0
        for (lc, k, by, zz) in slab_plan:
            if k == "c":
                continue
            bx = levels[lc][0]
            sets.append(
                (fields[(k, lc)], *slabs[(lc, k)], bx, by, zz)
            )
            row += 1
        _emit_exchange(my, mesh_x, sets, zbuf, xsems, 0)
        crow = row

        for lc in range(npod - 1, -1, -1):
            bx, by, zz, *_ = levels[lc]
            if lc == npod - 1:
                c_ref = fields[("cvb", npod)]
                clo = fields[("cvb_lo", npod)]
                chi = fields[("cvb_hi", npod)]
            else:
                c_ref = vups[lc + 1]
                clo, chi = slabs[(lc, "c")]
            leg, n_in, scr_shapes, _ = legs[lc]
            s0, s1 = leg_scr_slices[lc]
            leg_refs = [fields[("v", lc)], fields[("f", lc)]]
            if has_nv:
                leg_refs.append(fields[("nv", lc)])
            leg_refs.extend(slabs[(lc, "v")])
            leg_refs.extend(slabs[(lc, "f")])
            if has_nv:
                leg_refs.extend(slabs[(lc, "nv")])
            leg_refs.extend([c_ref, clo, chi])
            if has_rv and lc >= 1:
                leg_refs.append(fields[("rv", lc)])
                leg_refs.extend(slabs[(lc, "rv")])
            leg_refs.append(b_refs[lc])
            leg_refs.append(vups[lc])
            if lc == 0:
                leg_refs.append(sum_ref)
            leg_refs.extend(scr[s0:s1])
            leg(tuple(leg_refs))

            if lc >= 1:
                # Send the fresh (FAS: already v-restV) coarse faces for
                # the next-finer leg's corr stream.
                _emit_exchange(
                    my, mesh_x,
                    [(vups[lc], *slabs[(lc - 1, "c")], bx, by, zz)],
                    zbuf, xsems, crow,
                )
                crow += 1

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * n_hbm_in
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 + npod)
    out_specs = []
    for i, o in enumerate(out_shapes):
        out_specs.append(pl.BlockSpec(
            memory_space=pltpu.SMEM if i == sum_idx else pltpu.HBM
        ))
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=_INTERP if interpret else False,
    ), npod, sum_idx


def pod_up(vs, fs, nvs, rvs, cvb, cvb_lo, cvb_hi, bounds, my_x, levels,
           params: GridParams, mesh_x: int, interpret: bool = False):
    """Run all fused up legs in one launch.  ``vs/fs`` are the down
    kernel's per-level (v, f); ``rvs[lc]`` (FAS, lc>=1) the restricted-v
    fields; ``cvb(+slabs)`` the boundary coarse operand (already v-restV).
    Returns ``(vups, partial_sumsq)``."""
    hs = tuple(params.level_h(l) for l in range(len(levels)))
    call, npod, sum_idx = _pod_up_call(
        levels, hs, _compile_key(params), vs[0].dtype.name,
        params.post_smoothing, mesh_x, interpret,
    )
    args = []
    for lc in range(npod):
        args.extend([vs[lc], fs[lc]])
    if params.mode == Mode.NEWTON:
        args.extend(nvs)
    if params.mode == Mode.NONLINEAR:
        args.extend(rvs[1:npod])
    args.extend([cvb, cvb_lo, cvb_hi])
    args.append(my_x)
    args.extend(bounds)
    outs = call(*args)
    return list(outs[:npod]), outs[sum_idx][0, 0]
