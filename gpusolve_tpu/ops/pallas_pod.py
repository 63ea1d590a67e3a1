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
``16·m·2^(npod-1) | a0x`` for the fused gates); with y unsplit the y and z
extents are chosen *per level* as ``round_up(n+2, 8)`` / ``round_up(n+1,
128)`` — the separable restriction/prolongation matrices make the minor
axes free, so no chained-halving padding accumulates (round-1 VERDICT's
padding-traffic lesson).  Under a y split the y axis halves like x (the
y-split restriction needs coarse shard y start = fine start / 2); z stays
free always.

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
:100-113, :121-125).  float32; x-split and (round 3) y-split meshes —
the z mesh axis is folded into y by the plan (dist/spmd.SpmdPlan), and
under a y split the exchanges run the two-stage corner-forwarding
protocol with the legs in their 2-D-trapezoid (ghy=8) form.
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

def pod_levels(params: GridParams, mesh_xy, npod: int):
    """Per-level pod geometry ``((bx, by, zz, nx, ny, nz), ...)`` for levels
    0..npod (entry npod = the boundary coarse / tail-finest block in pod
    layout), or None if the fused-leg gates fail.  ``mesh_xy`` is the
    (mx, my) data decomposition (z is never split — dist/spmd.SpmdPlan).

    x halves exactly (the in-kernel wavefront restriction maps fine local
    2m±1 onto coarse local m, which needs fine start = 2 x coarse start);
    under a y split y halves the same way (the y-split restriction needs
    coarse shard y start = fine start / 2); with y unsplit the y extents
    are free per level (separable transfer matrices — no chained-halving
    padding); z extents are always free."""
    mesh_x, mesh_y = mesh_xy
    dims = params.level_dims()
    if npod < 1 or npod >= len(dims):
        return None
    # 16 | bx_l for every fused down leg l < npod, 8 | the boundary coarse
    # block, m | every level's allocation: one rounding covers all.
    a0x = _round_up(dims[0][0] + 2, mesh_x * 16 * (1 << (npod - 1)))
    if mesh_y > 1:
        a0y = _round_up(dims[0][1] + 2, mesh_y * 8 * (1 << npod))
    levels = []
    for l in range(npod + 1):
        nx, ny, nz = dims[l]
        bx = a0x // mesh_x >> l
        if mesh_y > 1:
            by = a0y // mesh_y >> l
            if by < ny // mesh_y + 1:
                return None
        else:
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
        if mesh_y > 1 and by < 16:
            return None
    cbx, cby = levels[npod][0], levels[npod][1]
    if cbx % 8 or cby % 8:
        return None
    return tuple(levels)


def _leg_scratch_bytes(levels, l, mode, S, consumer, src_corr,
                       sub_rv, fold_tau, ghy: int = 0) -> int:
    """Mirror of _make_leg's VMEM scratch plan (budget gate)."""
    bx, by, zz, *_ = levels[l]
    cbx, cby, czz, *_ = levels[l + 1] if l + 1 < len(levels) else (0, 0, 0)
    by = by + 2 * ghy
    cbye = cby + 2 * ghy
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
        n += 16 * cbye * czz                # coarse ring
    if sub_rv:
        n += 16 * by * zz                   # srv
    if consumer == "restrict":
        n += 3 * by * zz                    # rres
        n += 16 * cby * czz                 # cst
        if has_rv:
            n += 16 * cby * czz             # cst2
        if fold_tau:
            n += 3 * cbye * czz             # vr3
    return 4 * n


def pod_scratch_bytes(levels, mode, pre: int, post: int,
                      ghy: int = 0) -> tuple:
    """(down_bytes, up_bytes) VMEM scratch estimates for the two kernels
    (+ the shared zero slab and, y-split, the exchange staging pair)."""
    npod = len(levels) - 1
    has_rv = mode == Mode.NONLINEAR
    bye0 = levels[0][1] + 2 * ghy
    zslab = 4 * _GH * bye0 * levels[0][2]
    stage = 2 * 4 * _GH * bye0 * levels[0][2] if ghy else 0
    down = zslab + stage
    up = zslab + stage
    for l in range(npod):
        down += _leg_scratch_bytes(
            levels, l, mode, pre, "restrict", False, False, has_rv, ghy
        )
        up += _leg_scratch_bytes(
            levels, l, mode, post, "norm" if l == 0 else None, True,
            has_rv and l >= 1, False, ghy,
        )
    return down, up


def pod_supported(params: GridParams, mesh_xy, npod: int) -> bool:
    from gpusolve_tpu.ops import pallas_spmd

    if not pallas_spmd.supported(params):
        return False
    if isinstance(mesh_xy, int):
        mesh_xy = (mesh_xy, 1)
    levels = pod_levels(params, mesh_xy, npod)
    if levels is None:
        return False
    ghy = _GH if mesh_xy[1] > 1 else 0
    down, up = pod_scratch_bytes(
        levels, params.mode, params.pre_smoothing,
        params.post_smoothing, ghy,
    )
    margin = 12 * 1024 * 1024
    return max(down, up) <= _VMEM_LIMIT - margin


# ---------------------------------------------------------------------------
# In-kernel RDMA exchange emitter
# ---------------------------------------------------------------------------

def _dev_y(my_x, yflat, mz: int):
    """Raw (x, y, z) device id for the flattened-('y','z') index ``yflat``
    (y-major, matching jax's multi-axis flattening)."""
    if mz == 1:
        return (my_x, yflat, jnp.int32(0))
    return (my_x, yflat // mz, yflat % mz)


def _emit_exchange(my_x, my_y, mesh, sets, zbufs, stages, xsems,
                   row0: int):
    """Exchange the ghost slabs of ``sets`` with the face neighbours.

    ``mesh = (mesh_x, mesh_y, mz)`` is the data decomposition (x, folded
    y) plus the raw z mesh extent (for device-id unflattening).  With
    ``mesh_y == 1``: ``sets[i] = (src, lo_recv, hi_recv, bx, by, zz)``,
    one semaphore row per set, exactly the round-2 protocol.  With
    ``mesh_y > 1``: ``sets[i] = (src, lo_recv, hi_recv, ylo_recv,
    yhi_recv, bx, by, zz)`` and TWO rows per set — a y phase
    (8-row y-face slabs, strided HBM→HBM remote copies) followed by an x
    phase that remote-writes y-EXTENDED x-face slabs assembled in the
    VMEM ``stages`` pair from the just-received y slabs (the in-kernel
    equivalent of dist/spmd._slabs_multi's two-stage corner-forwarding
    exchange).  Waits sends and receives before returning."""
    mesh_x, mesh_y, mz = mesh
    ysplit = mesh_y > 1
    ghy = _GH if ysplit else 0
    zbuf, zbufy = zbufs
    has_lo = my_x > 0
    has_hi = my_x < mesh_x - 1
    left = _dev_y(my_x - 1, my_y, mz)
    right = _dev_y(my_x + 1, my_y, mz)
    rows_per = 2 if ysplit else 1

    if ysplit:
        has_ylo = my_y > 0
        has_yhi = my_y < mesh_y - 1
        ydown = _dev_y(my_x, my_y - 1, mz)
        yup = _dev_y(my_x, my_y + 1, mz)
        # ---- y phase: 8-row y-face slabs --------------------------------
        ycps = []
        for i, st in enumerate(sets):
            src, lo_r, hi_r, ylo_r, yhi_r, bx, by, zz = st
            r = row0 + rows_per * i
            cp_lo = pltpu.make_async_remote_copy(
                src.at[:, pl.ds(0, _GH), :zz], yhi_r,
                xsems.at[r, 0], xsems.at[r, 1], device_id=ydown,
            )
            cp_hi = pltpu.make_async_remote_copy(
                src.at[:, pl.ds(by - _GH, _GH), :zz], ylo_r,
                xsems.at[r, 2], xsems.at[r, 3], device_id=yup,
            )

            @pl.when(has_ylo)
            def _(cp=cp_lo):
                cp.start()

            @pl.when(has_yhi)
            def _(cp=cp_hi):
                cp.start()

            ycps.append((cp_lo, cp_hi))
        for i, st in enumerate(sets):
            src, lo_r, hi_r, ylo_r, yhi_r, bx, by, zz = st
            r = row0 + rows_per * i

            @pl.when(~has_ylo)
            def _(ylo_r=ylo_r, bx=bx, zz=zz, r=r):
                zc = pltpu.make_async_copy(
                    zbufy.at[:bx, :, :zz], ylo_r, xsems.at[r, 4]
                )
                zc.start()
                zc.wait()

            @pl.when(~has_yhi)
            def _(yhi_r=yhi_r, bx=bx, zz=zz, r=r):
                zc = pltpu.make_async_copy(
                    zbufy.at[:bx, :, :zz], yhi_r, xsems.at[r, 5]
                )
                zc.start()
                zc.wait()
        for cp_lo, cp_hi in ycps:

            @pl.when(has_ylo)
            def _(cp_lo=cp_lo, cp_hi=cp_hi):
                cp_lo.wait_send()
                cp_hi.wait_recv()

            @pl.when(has_yhi)
            def _(cp_lo=cp_lo, cp_hi=cp_hi):
                cp_hi.wait_send()
                cp_lo.wait_recv()

    # ---- x phase -----------------------------------------------------
    # Per set: remote-write the (y-extended, under the split) x-face
    # slabs.  Sequential per set under the split (the staging pair is
    # shared), fully concurrent otherwise.
    if ysplit:
        st_lo, st_hi = stages
        for i, st in enumerate(sets):
            src, lo_r, hi_r, ylo_r, yhi_r, bx, by, zz = st
            bye = by + 2 * ghy
            r = row0 + rows_per * i + 1
            # Assemble [ylo | src | yhi] rows of the two face slabs.
            parts = [
                # (dst_stage, x_lo_plane_start)
                (st_lo, 0),
                (st_hi, bx - _GH),
            ]
            cps_in = []
            for stg, x0 in parts:
                cps_in.append(pltpu.make_async_copy(
                    ylo_r.at[pl.ds(x0, _GH), :, :zz],
                    stg.at[:, pl.ds(0, ghy), :zz], xsems.at[r, 4],
                ))
                cps_in.append(pltpu.make_async_copy(
                    src.at[pl.ds(x0, _GH), :, :zz],
                    stg.at[:, pl.ds(ghy, by), :zz], xsems.at[r, 4],
                ))
                cps_in.append(pltpu.make_async_copy(
                    yhi_r.at[pl.ds(x0, _GH), :, :zz],
                    stg.at[:, pl.ds(ghy + by, ghy), :zz],
                    xsems.at[r, 4],
                ))
            for cp in cps_in:
                cp.start()
            for cp in cps_in:
                cp.wait()
            cp_lo = pltpu.make_async_remote_copy(
                st_lo.at[:, :bye, :zz], hi_r,
                xsems.at[r, 0], xsems.at[r, 1], device_id=left,
            )
            cp_hi = pltpu.make_async_remote_copy(
                st_hi.at[:, :bye, :zz], lo_r,
                xsems.at[r, 2], xsems.at[r, 3], device_id=right,
            )

            @pl.when(has_lo)
            def _(cp=cp_lo):
                cp.start()

            @pl.when(has_hi)
            def _(cp=cp_hi):
                cp.start()

            @pl.when(~has_lo)
            def _(lo_r=lo_r, bye=bye, zz=zz, r=r):
                zc = pltpu.make_async_copy(
                    zbuf.at[:, :bye, :zz], lo_r, xsems.at[r, 5]
                )
                zc.start()
                zc.wait()

            @pl.when(~has_hi)
            def _(hi_r=hi_r, bye=bye, zz=zz, r=r):
                zc = pltpu.make_async_copy(
                    zbuf.at[:, :bye, :zz], hi_r, xsems.at[r, 5]
                )
                zc.start()
                zc.wait()

            # Wait before the staging pair is reused by the next set.
            @pl.when(has_lo)
            def _(cp_lo=cp_lo, cp_hi=cp_hi):
                cp_lo.wait_send()
                cp_hi.wait_recv()

            @pl.when(has_hi)
            def _(cp_lo=cp_lo, cp_hi=cp_hi):
                cp_hi.wait_send()
                cp_lo.wait_recv()
        return

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


def _emit_barrier(my_x, my_y, mesh, bsem):
    """Neighbour barrier: every shard signals its existing face
    neighbours (±x, and ±y under the split) and waits for the same count
    (cross-invocation skew bound)."""
    mesh_x, mesh_y, mz = mesh
    has_lo = my_x > 0
    has_hi = my_x < mesh_x - 1

    @pl.when(has_lo)
    def _():
        pltpu.semaphore_signal(
            bsem, 1, device_id=_dev_y(my_x - 1, my_y, mz)
        )

    @pl.when(has_hi)
    def _():
        pltpu.semaphore_signal(
            bsem, 1, device_id=_dev_y(my_x + 1, my_y, mz)
        )

    nwait = has_lo.astype(jnp.int32) + has_hi.astype(jnp.int32)
    if mesh_y > 1:
        has_ylo = my_y > 0
        has_yhi = my_y < mesh_y - 1

        @pl.when(has_ylo)
        def _():
            pltpu.semaphore_signal(
                bsem, 1, device_id=_dev_y(my_x, my_y - 1, mz)
            )

        @pl.when(has_yhi)
        def _():
            pltpu.semaphore_signal(
                bsem, 1, device_id=_dev_y(my_x, my_y + 1, mz)
            )

        nwait = nwait + has_ylo.astype(jnp.int32) \
            + has_yhi.astype(jnp.int32)

    @pl.when(nwait > 0)
    def _():
        pltpu.semaphore_wait(bsem, nwait)


# ---------------------------------------------------------------------------
# Down kernel: all fused down legs in one launch
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pod_down_call(levels, hs, key, dtype_name, S: int, mesh,
                   interpret: bool):
    mode = key[2]
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    npod = len(levels) - 1
    dtype = jnp.dtype(dtype_name)
    mesh_x, mesh_y, _mz = mesh
    ysplit = mesh_y > 1
    ghy = _GH if ysplit else 0
    rows_per = 2 if ysplit else 1

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
            tau_h=(hs[l + 1] if has_rv else 0.0), ghy=ghy,
        ))

    # ---- flat ref layout -------------------------------------------------
    # inputs (HBM): v0, f0, [nv_l]*npod
    # inputs (SMEM): my (1,2) [x, folded-y], b_l (1,12) per level
    # outputs (HBM): per level: vout, xzr, [xzv]; then per level the slab
    #   receive buffers per field: xlo,xhi[,ylo,yhi] for v(stream_v), f,
    #   nv.
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
        nfield = (1 if stream_vs[l] else 0) + 1 + (1 if has_nv else 0)
        for _ in range(nfield):
            slab_shapes.append(
                jax.ShapeDtypeStruct((_GH, by + 2 * ghy, zz), dtype)
            )
            slab_shapes.append(
                jax.ShapeDtypeStruct((_GH, by + 2 * ghy, zz), dtype)
            )
            if ysplit:
                slab_shapes.append(
                    jax.ShapeDtypeStruct((bx, _GH, zz), dtype)
                )
                slab_shapes.append(
                    jax.ShapeDtypeStruct((bx, _GH, zz), dtype)
                )
    n_out_main = len(out_shapes)
    out_shapes += slab_shapes

    scratch = []
    leg_scr_slices = []
    for leg, _, scr, _ in legs:
        leg_scr_slices.append((len(scratch), len(scratch) + len(scr)))
        scratch.extend(scr)
    bye0 = levels[0][1] + 2 * ghy
    zbuf_idx = len(scratch)
    scratch.append(pltpu.VMEM((_GH, bye0, levels[0][2]), dtype))
    zbufy_idx = len(scratch)
    scratch.append(pltpu.VMEM(
        (levels[0][0] if ysplit else _GH, _GH, levels[0][2]), dtype
    ))
    stage_idx = len(scratch)
    if ysplit:
        scratch.append(pltpu.VMEM((_GH, bye0, levels[0][2]), dtype))
        scratch.append(pltpu.VMEM((_GH, bye0, levels[0][2]), dtype))
    bsem_idx = len(scratch)
    scratch.append(pltpu.SemaphoreType.REGULAR)
    xsem_idx = len(scratch)
    # Phase rows: phase 0 (level-0 v/f + all newton_v slabs) then one
    # phase per mid level (f [, v] slabs from the fresh coarse outputs);
    # two rows per set under the y split (y phase + x phase).
    n_sets0 = 2 + (npod if has_nv else 0)
    n_sets_mid = 1 + (1 if has_rv else 0)
    n_rows = rows_per * (n_sets0 + (npod - 1) * n_sets_mid)
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
        zbufs = (scr[zbuf_idx], scr[zbufy_idx])
        stages = (
            (scr[stage_idx], scr[stage_idx + 1]) if ysplit else None
        )
        bsem = scr[bsem_idx]
        xsems = scr[xsem_idx]
        my_x = my_ref[0, 0]
        my_y = my_ref[0, 1]

        def level_outs(l):
            base = l * out_per_level
            vout = main_outs[base]
            xzr = main_outs[base + 1]
            xzv = main_outs[base + 2] if has_rv else None
            return vout, xzr, xzv

        n_per = 4 if ysplit else 2
        slabs = []
        it = iter(slab_refs)
        for l in range(npod):
            d = {}
            if stream_vs[l]:
                d["v"] = tuple(next(it) for _ in range(n_per))
            d["f"] = tuple(next(it) for _ in range(n_per))
            if has_nv:
                d["nv"] = tuple(next(it) for _ in range(n_per))
            slabs.append(d)

        zbufs[0][...] = jnp.zeros_like(zbufs[0])
        if ysplit:
            zbufs[1][...] = jnp.zeros_like(zbufs[1])
        _emit_barrier(my_x, my_y, mesh, bsem)

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
        _emit_exchange(my_x, my_y, mesh, sets, zbufs, stages, xsems, 0)

        row = rows_per * n_sets0
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
                _emit_exchange(
                    my_x, my_y, mesh, sets, zbufs, stages, xsems, row
                )
                row += rows_per * n_sets_mid

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
        # v0 updates in place (the wavefront's reads lead its writes by
        # the trapezoid lag, like pallas_vcycle2's aliased buffers) —
        # without the alias every scanned cycle pays a full-fine-volume
        # carry copy of XLA glue.
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=_INTERP if interpret else False,
    ), n_out_main


def pod_down(v0, f0, nvs, bounds, my_xy, levels, params: GridParams,
             mesh, interpret: bool = False, level_offset: int = 0):
    """Run all fused down legs in one launch.  ``my_xy`` is a (1, 2)
    int32 [x index, folded-y index]; ``mesh = (mx, my, mz_raw)``.
    Returns per-level ``(vout, xzr[, xzv])`` tuples (coarse outputs
    final: interior-masked, FAS tau-corrected).

    ``level_offset``: global level of ``levels[0]`` — W/F schedules
    (dist/pod) launch suffix chains that re-descend from a mid level;
    the chain then streams its head level's v (chain position 0 always
    streams), which is exactly the re-visit semantics."""
    hs = tuple(
        params.level_h(level_offset + l) for l in range(len(levels))
    )
    call, n_out_main = _pod_down_call(
        levels, hs, _compile_key(params), v0.dtype.name,
        params.pre_smoothing, mesh, interpret,
    )
    args = [v0, f0]
    if params.mode == Mode.NEWTON:
        args.extend(nvs)
    args.append(my_xy)
    args.extend(bounds)
    outs = call(*args)[:n_out_main]
    npod = len(levels) - 1
    per = 3 if params.mode == Mode.NONLINEAR else 2
    return [tuple(outs[l * per : (l + 1) * per]) for l in range(npod)]


# ---------------------------------------------------------------------------
# Up kernel: all fused up legs in one launch
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pod_up_call(levels, hs, key, dtype_name, T: int, mesh,
                 interpret: bool, emit_norm: bool = True):
    mode = key[2]
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    npod = len(levels) - 1
    dtype = jnp.dtype(dtype_name)
    mesh_x, mesh_y, _mz = mesh
    ysplit = mesh_y > 1
    ghy = _GH if ysplit else 0
    rows_per = 2 if ysplit else 1
    n_per = 4 if ysplit else 2

    legs = {}
    for lc in range(npod):
        bx, by, zz, nx, ny, nz = levels[lc]
        cbx, cby, czz, *_ = levels[lc + 1]
        sub_rv = has_rv and lc >= 1
        legs[lc] = _make_leg(
            (bx, by, zz), zz, dtype_name, key, hs[lc], T, False,
            True, (cby, czz, czz, ny, nz),
            "norm" if (lc == 0 and emit_norm) else None, 0, 0, 0, 0,
            sub_rv=sub_rv, ghy=ghy,
        )

    # ---- flat ref layout -------------------------------------------------
    # inputs (HBM): per lc: v_lc (down-smoothed), f_lc; [nv_lc]*npod;
    #   [rv_lc for lc>=1] (FAS); cv_b (boundary coarse, already v-restV,
    #   sliced per shard by the caller) + its clo/chi (y-split: + y) slabs
    #   (replicated tail: sliced, not exchanged).
    # inputs (SMEM): my (1,2), b_l per level.
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
    if ysplit:
        hbm_in_shapes.append(("cvb_ylo", npod))
        hbm_in_shapes.append(("cvb_yhi", npod))
    n_hbm_in = len(hbm_in_shapes)

    out_shapes = []
    for lc in range(npod):
        bx, by, zz, *_ = levels[lc]
        out_shapes.append(jax.ShapeDtypeStruct((bx, by, zz), dtype))
    sum_idx = len(out_shapes)
    from gpusolve_tpu.ops.pallas_spmd import _acc_dt
    out_shapes.append(jax.ShapeDtypeStruct((1, 1), _acc_dt(dtype)))
    n_out_main = len(out_shapes)
    # Receive buffers: per lc: v,f [,nv] [,rv if sub_rv] slab groups, and
    # for lc < npod-1 the coarse (vup_{lc+1}) slab group.
    slab_plan = []
    for lc in range(npod):
        bx, by, zz, *_ = levels[lc]
        kinds = ["v", "f"]
        if has_nv:
            kinds.append("nv")
        if has_rv and lc >= 1:
            kinds.append("rv")
        for k in kinds:
            slab_plan.append((lc, k, bx, by, zz))
        if lc < npod - 1:
            cbx, cby, czz, *_ = levels[lc + 1]
            slab_plan.append((lc, "c", cbx, cby, czz))
    for (_, _, bx, by, zz) in slab_plan:
        out_shapes.append(
            jax.ShapeDtypeStruct((_GH, by + 2 * ghy, zz), dtype)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((_GH, by + 2 * ghy, zz), dtype)
        )
        if ysplit:
            out_shapes.append(jax.ShapeDtypeStruct((bx, _GH, zz), dtype))
            out_shapes.append(jax.ShapeDtypeStruct((bx, _GH, zz), dtype))

    scratch = []
    leg_scr_slices = {}
    for lc in range(npod):
        scr = legs[lc][2]
        leg_scr_slices[lc] = (len(scratch), len(scratch) + len(scr))
        scratch.extend(scr)
    bye0 = levels[0][1] + 2 * ghy
    zbuf_idx = len(scratch)
    scratch.append(pltpu.VMEM((_GH, bye0, levels[0][2]), dtype))
    zbufy_idx = len(scratch)
    scratch.append(pltpu.VMEM(
        (levels[0][0] if ysplit else _GH, _GH, levels[0][2]), dtype
    ))
    stage_idx = len(scratch)
    if ysplit:
        scratch.append(pltpu.VMEM((_GH, bye0, levels[0][2]), dtype))
        scratch.append(pltpu.VMEM((_GH, bye0, levels[0][2]), dtype))
    bsem_idx = len(scratch)
    scratch.append(pltpu.SemaphoreType.REGULAR)
    xsem_idx = len(scratch)
    n_rows = rows_per * len(slab_plan)
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
        zbufs = (scr[zbuf_idx], scr[zbufy_idx])
        stages = (
            (scr[stage_idx], scr[stage_idx + 1]) if ysplit else None
        )
        bsem = scr[bsem_idx]
        xsems = scr[xsem_idx]
        my_x = my_ref[0, 0]
        my_y = my_ref[0, 1]

        slabs = {}
        for i, (lc, k, bx, by, zz) in enumerate(slab_plan):
            slabs[(lc, k)] = tuple(
                slab_refs[n_per * i + j] for j in range(n_per)
            )

        if not emit_norm:
            # Mid-schedule up chains (W/F) skip the norm consumer; the
            # SMEM output still exists — pin it defined.
            sum_ref[0, 0] = jnp.zeros((), sum_ref.dtype)
        zbufs[0][...] = jnp.zeros_like(zbufs[0])
        if ysplit:
            zbufs[1][...] = jnp.zeros_like(zbufs[1])
        _emit_barrier(my_x, my_y, mesh, bsem)

        # Phase 0: every input-sourced slab (fine v/f/nv/rv per level) —
        # all stable at kernel start.
        sets = []
        n_sets0 = 0
        for (lc, k, bx, by, zz) in slab_plan:
            if k == "c":
                continue
            sets.append(
                (fields[(k, lc)], *slabs[(lc, k)], bx, by, zz)
            )
            n_sets0 += 1
        _emit_exchange(my_x, my_y, mesh, sets, zbufs, stages, xsems, 0)
        crow = rows_per * n_sets0

        for lc in range(npod - 1, -1, -1):
            bx, by, zz, *_ = levels[lc]
            if lc == npod - 1:
                c_ref = fields[("cvb", npod)]
                cgrp = [fields[("cvb_lo", npod)],
                        fields[("cvb_hi", npod)]]
                if ysplit:
                    cgrp += [fields[("cvb_ylo", npod)],
                             fields[("cvb_yhi", npod)]]
            else:
                c_ref = vups[lc + 1]
                cgrp = list(slabs[(lc, "c")])
            leg, n_in, scr_shapes, _ = legs[lc]
            s0, s1 = leg_scr_slices[lc]
            leg_refs = [fields[("v", lc)], fields[("f", lc)]]
            if has_nv:
                leg_refs.append(fields[("nv", lc)])
            leg_refs.extend(slabs[(lc, "v")])
            leg_refs.extend(slabs[(lc, "f")])
            if has_nv:
                leg_refs.extend(slabs[(lc, "nv")])
            leg_refs.append(c_ref)
            leg_refs.extend(cgrp)
            if has_rv and lc >= 1:
                leg_refs.append(fields[("rv", lc)])
                leg_refs.extend(slabs[(lc, "rv")])
            leg_refs.append(b_refs[lc])
            leg_refs.append(vups[lc])
            if lc == 0 and emit_norm:
                leg_refs.append(sum_ref)
            leg_refs.extend(scr[s0:s1])
            leg(tuple(leg_refs))

            if lc >= 1:
                # Send the fresh (FAS: already v-restV) coarse faces for
                # the next-finer leg's corr stream.
                _emit_exchange(
                    my_x, my_y, mesh,
                    [(vups[lc], *slabs[(lc - 1, "c")], bx, by, zz)],
                    zbufs, stages, xsems, crow,
                )
                crow += rows_per

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
        # Every level's down-smoothed v updates in place into vup (the
        # corr-first wavefront's reads lead its writes) — kills the
        # per-cycle scan-carry copies.
        input_output_aliases={2 * lc: lc for lc in range(npod)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=_INTERP if interpret else False,
    ), npod, sum_idx


def pod_up(vs, fs, nvs, rvs, cvb, cvb_slabs, bounds, my_xy, levels,
           params: GridParams, mesh, interpret: bool = False,
           level_offset: int = 0, emit_norm: bool = True):
    """Run all fused up legs in one launch.  ``vs/fs`` are the down
    kernel's per-level (v, f); ``rvs[lc]`` (FAS, lc>=1) the restricted-v
    fields; ``cvb`` + ``cvb_slabs`` (x pair [+ y pair under the split])
    the boundary coarse operand (already v-restV).
    Returns ``(vups, partial_sumsq)``.

    ``level_offset``/``emit_norm``: W/F suffix chains (dist/pod) — the
    chain-shallowest leg writes the TRUE v (no sub_rv fold, chain
    position 0), which the schedule's next event (a re-descent at that
    level, or the final state) reads; ``emit_norm`` only on the chain
    that ends at global level 0."""
    hs = tuple(
        params.level_h(level_offset + l) for l in range(len(levels))
    )
    call, npod, sum_idx = _pod_up_call(
        levels, hs, _compile_key(params), vs[0].dtype.name,
        params.post_smoothing, mesh, interpret, emit_norm,
    )
    args = []
    for lc in range(npod):
        args.extend([vs[lc], fs[lc]])
    if params.mode == Mode.NEWTON:
        args.extend(nvs)
    if params.mode == Mode.NONLINEAR:
        args.extend(rvs[1:npod])
    args.append(cvb)
    args.extend(cvb_slabs)
    args.append(my_xy)
    args.extend(bounds)
    outs = call(*args)
    return list(outs[:npod]), outs[sum_idx][0, 0]
