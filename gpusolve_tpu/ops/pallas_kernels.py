"""Pallas TPU kernels for the bandwidth-critical multigrid ops.

Why these exist: XLA's fusion of shifted-slice stencils on TPU falls far off
the HBM roofline for large 3-D grids (measured ~2-70 GB/s of 819 GB/s on
v5e), and strided slice/scatter lowerings for the grid-transfer ops are
pathological.  These kernels stream x-slabs — (TX, full-y, full-z) with a
one-plane x halo — from HBM through VMEM with explicit DMA, so each op moves
only its roofline-minimal bytes.

Why slabs tile x only: Mosaic DMA slices on the sublane dimension must be
8-aligned (``Slice shape along dimension 1 must be aligned to tiling (8)``),
which is incompatible with ±1-halo tiles in y; the leading (x) dimension is
untiled, so arbitrary plane ranges are legal.  y/z stencil taps become
in-VMEM rolls, whose wrap-around is exact because halo columns are zero.

Design invariants shared with the rest of the framework:
  * Arrays are padded ``(nx+2, ny+2, nz+2)``; every halo cell is always zero
    (pure Dirichlet — the reference never stores nonzero boundary either).
  * Each kernel writes only interior x-planes and is *aliased* onto a dead
    donor buffer whose halo is already zero (``input_output_aliases``); y/z
    halo columns of written planes are re-zeroed by masks in VMEM.  The
    solver supplies dead buffers by ping-ponging v with the residual scratch
    r (see gpusolve_tpu.solver.vcycle).
  * Mode branching (linear / nonlinear / Newton) is resolved at trace time,
    like the reference bakes the mode into generated kernel source
    (src/sycl/SyclSolver.cpp:182-196).

Numerics mirror gpusolve_tpu.ops.xla (and therefore the reference
src/cpu/CpuSolver.cpp loop nests, cited there).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpusolve_tpu.config import GridParams, Mode, Stencil

AVAILABLE = True

# VMEM budget (bytes) used when sizing x-slabs.
_VMEM_BUDGET = 11 * 1024 * 1024
# Mosaic scoped-VMEM limit for these kernels: the default 16 MB counts
# scratch PLUS the compiler's own temporaries (the transfer kernels'
# de-interleave reshapes and banded-matmul intermediates), which the
# _VMEM_BUDGET slab sizing does not model — 511^3 Newton's
# _prepare_find_error restrict allocated 20.9 MB and OOMed at compile.
# v5e has 128 MB of VMEM; 64 MB leaves headroom for either side.
_VMEM_LIMIT = 64 * 1024 * 1024
# Both resolve per device kind (utils/tuning) on first kernel build;
# explicit module-level reassignment (tests) overrides.
_TUNING_DEFAULTS = (_VMEM_BUDGET, _VMEM_LIMIT)
_TUNING_APPLIED = False


def _apply_tuning() -> None:
    global _VMEM_BUDGET, _VMEM_LIMIT, _TUNING_APPLIED
    if _TUNING_APPLIED:
        return
    _TUNING_APPLIED = True
    if (_VMEM_BUDGET, _VMEM_LIMIT) != _TUNING_DEFAULTS:
        return  # externally overridden — respect it
    from gpusolve_tpu.utils import tuning

    t = tuning.current()
    _VMEM_BUDGET = t.kernels_vmem_budget
    _VMEM_LIMIT = t.kernels_vmem_limit



def _dot3t(a, w, dtype, transpose=False):
    """Transfer dot at f32-class precision in THREE MXU passes instead of
    HIGHEST's six (round 5, shared form with pallas_vcycle2._dot3 — see
    PERF.md §9): the transfer weights are dyadic (exact in bf16), the
    operand splits into three bf16 terms carrying all 24 f32 mantissa
    bits, one dot call via contraction-axis concatenation.  Non-f32
    dtypes keep the HIGHEST form."""
    if jnp.dtype(dtype) != jnp.float32:
        if transpose:
            return jnp.dot(
                w.T, a, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return jnp.dot(
            a, w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    ww = jnp.concatenate([wb] * 3, axis=0)
    if transpose:
        aa = jnp.concatenate([hi, mid, lo], axis=0)
        return jnp.dot(ww.T, aa, preferred_element_type=jnp.float32)
    aa = jnp.concatenate([hi, mid, lo], axis=1)
    return jnp.dot(aa, ww, preferred_element_type=jnp.float32)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_tx(nx: int, plane_bytes: int, fixed_planes: int, per_tx: int):
    """Largest TX with (fixed_planes + per_tx·TX) planes inside the budget."""
    tx = (_VMEM_BUDGET // plane_bytes - fixed_planes) // per_tx
    return max(1, min(tx, 128, nx))


def _interior_mask(shape, ny: int, nz: int, val):
    """Zero everything outside the logical y/z interior of a tile (halo
    columns plus tile-alignment padding)."""
    yi = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    zi = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    keep = (yi >= 1) & (yi <= ny) & (zi >= 1) & (zi <= nz)
    return jnp.where(keep, val, jnp.zeros_like(val))


def _roll(x, shift: int, axis: int):
    """Circular shift.  On TPU, pltpu.roll lowers to the native rotate op;
    jnp.roll would become a lane-misaligned concat (slow).  pltpu.roll
    requires a non-negative shift, so normalise modulo the axis length."""
    shift = shift % x.shape[axis]
    try:
        return pltpu.roll(x, shift, axis)
    except Exception:  # interpret mode fallback
        return jnp.roll(x, shift, axis=axis)


def _tap(slab, ox: int, oy: int, oz: int, tx: int):
    """One stencil tap on an x-slab: x via plane indexing, y/z via rolls.
    Rolls wrap the (always-zero) halo columns around, which is exactly the
    Dirichlet-zero neighbour the stencil needs at the boundary."""
    term = slab[1 + ox : 1 + ox + tx]
    if oy:
        term = _roll(term, -oy, 1)
    if oz:
        term = _roll(term, -oz, 2)
    return term


def _stencil_sum(slab, taps, tx: int):
    acc = None
    for val, (ox, oy, oz) in taps:
        term = val * _tap(slab, ox, oy, oz, tx)
        acc = term if acc is None else acc + term
    return acc


def _compile_key(params: GridParams) -> Tuple:
    return (
        params.stencil.values,
        params.stencil.offsets,
        params.mode,
        params.omega,
        params.gamma,
    )


# ---------------------------------------------------------------------------
# Fused damped-Jacobi sweep
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jacobi_call(shape, dims, dtype_name, key, h: float, interpret: bool):
    stencil_values, stencil_offsets, mode, omega, gamma = key
    taps = tuple(zip(stencil_values, stencil_offsets))
    dtype = jnp.dtype(dtype_name)
    xp, yp, zp = shape
    nx, ny, nz = dims
    inv_h2 = 1.0 / (h * h)
    pre_fac = stencil_values[0] / (h * h)
    alpha = (h * h) / stencil_values[0]
    has_nv = mode == Mode.NEWTON
    plane = yp * zp * dtype.itemsize
    per_tx = 3 + (1 if has_nv else 0)
    tx = _pick_tx(nx, plane, fixed_planes=2, per_tx=per_tx)
    ntx = _cdiv(nx, tx)

    def kernel(*refs):
        if has_nv:
            _, v_ref, f_ref, nv_ref, out_ref, vs, fs, nvs, os_, sem = refs
        else:
            _, v_ref, f_ref, out_ref, vs, fs, os_, sem = refs
            nv_ref = nvs = None
        t = pl.program_id(0)
        sx = jnp.minimum(t * tx, nx - tx)

        cp_v = pltpu.make_async_copy(
            v_ref.at[pl.ds(sx, tx + 2)], vs, sem.at[0]
        )
        cp_f = pltpu.make_async_copy(
            f_ref.at[pl.ds(sx + 1, tx)], fs, sem.at[1]
        )
        cp_v.start()
        cp_f.start()
        if has_nv:
            cp_nv = pltpu.make_async_copy(
                nv_ref.at[pl.ds(sx + 1, tx)], nvs, sem.at[2]
            )
            cp_nv.start()
            cp_nv.wait()
        cp_v.wait()
        cp_f.wait()

        slab = vs[...]
        center = slab[1 : 1 + tx]
        av = _stencil_sum(slab, taps, tx) * inv_h2
        fint = fs[...]
        if mode == Mode.LINEAR:
            newv = center + omega * (alpha * (fint - av))
        elif mode == Mode.NONLINEAR:
            ex = jnp.exp(center)
            r = fint - (av + gamma * center * ex)
            denom = pre_fac + gamma * (1.0 + center) * ex
            newv = center + omega * (r / denom)
        else:
            nvi = nvs[...]
            ex = jnp.exp(nvi)
            lin = gamma * (1.0 + nvi) * ex
            r = fint - (av + lin * center)
            denom = pre_fac + lin
            newv = center + omega * (r / denom)
        os_[...] = _interior_mask((tx, yp, zp), ny, nz, newv)

        cp_o = pltpu.make_async_copy(
            os_, out_ref.at[pl.ds(sx + 1, tx)], sem.at[3]
        )
        cp_o.start()
        cp_o.wait()

    n_in = 3 + (1 if has_nv else 0)
    scratch = [
        pltpu.VMEM((tx + 2, yp, zp), dtype),
        pltpu.VMEM((tx, yp, zp), dtype),
    ]
    if has_nv:
        scratch.append(pltpu.VMEM((tx, yp, zp), dtype))
    scratch.append(pltpu.VMEM((tx, yp, zp), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    return pl.pallas_call(
        kernel,
        grid=(ntx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        scratch_shapes=scratch,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )


def jacobi_sweep(
    dead,
    v,
    f,
    dims,
    params: GridParams,
    h: float,
    newton_v=None,
    interpret: bool = False,
):
    """One fused damped-Jacobi sweep (reference math:
    src/cpu/CpuSolver.cpp:141-179); the result is written into ``dead``
    (aliased), whose halo must already be zero."""
    _apply_tuning()
    call = _jacobi_call(
        v.shape, dims, v.dtype.name, _compile_key(params), h, interpret
    )
    if params.mode == Mode.NEWTON:
        return call(dead, v, f, newton_v)
    return call(dead, v, f)


# ---------------------------------------------------------------------------
# Residual + squared norm
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _residual_call(
    shape, dims, dtype_name, key, h: float, with_norm: bool, interpret: bool,
    apply_mode: bool = False,
):
    stencil_values, stencil_offsets, mode, omega, gamma = key
    taps = tuple(zip(stencil_values, stencil_offsets))
    dtype = jnp.dtype(dtype_name)
    xp, yp, zp = shape
    nx, ny, nz = dims
    inv_h2 = 1.0 / (h * h)
    has_nv = mode == Mode.NEWTON
    nonlin = mode == Mode.NONLINEAR
    plane = yp * zp * dtype.itemsize
    per_tx = 3 + (1 if has_nv else 0)
    tx = _pick_tx(nx, plane, fixed_planes=2, per_tx=per_tx)
    ntx = _cdiv(nx, tx)

    def kernel(*refs):
        if apply_mode:
            if has_nv:
                (_, v_ref, nv_ref, out_ref, sum_ref,
                 vs, fs, nvs, os_, acc, sem) = refs
            else:
                (_, v_ref, out_ref, sum_ref,
                 vs, fs, os_, acc, sem) = refs
                nvs = None
            f_ref = None
        elif has_nv:
            (_, v_ref, f_ref, nv_ref, out_ref, sum_ref,
             vs, fs, nvs, os_, acc, sem) = refs
        else:
            (_, v_ref, f_ref, out_ref, sum_ref,
             vs, fs, os_, acc, sem) = refs
            nvs = None
        t = pl.program_id(0)
        sx = jnp.minimum(t * tx, nx - tx)

        cp_v = pltpu.make_async_copy(
            v_ref.at[pl.ds(sx, tx + 2)], vs, sem.at[0]
        )
        cp_v.start()
        if not apply_mode:
            cp_f = pltpu.make_async_copy(
                f_ref.at[pl.ds(sx + 1, tx)], fs, sem.at[1]
            )
            cp_f.start()
        if has_nv:
            cp_nv = pltpu.make_async_copy(
                nv_ref.at[pl.ds(sx + 1, tx)], nvs, sem.at[2]
            )
            cp_nv.start()
            cp_nv.wait()
        cp_v.wait()
        if not apply_mode:
            cp_f.wait()

        slab = vs[...]
        center = slab[1 : 1 + tx]
        av = _stencil_sum(slab, taps, tx) * inv_h2
        if nonlin:
            av = av + gamma * center * jnp.exp(center)
        elif has_nv:
            nvi = nvs[...]
            av = av + gamma * (1.0 + nvi) * center * jnp.exp(nvi)
        if apply_mode:
            # A(v)/h² + mode term itself (reference applyStencil,
            # src/cpu/CpuSolver.cpp:182-209)
            r = _interior_mask((tx, yp, zp), ny, nz, av)
        else:
            r = _interior_mask((tx, yp, zp), ny, nz, fs[...] - av)
        os_[...] = r

        cp_o = pltpu.make_async_copy(
            os_, out_ref.at[pl.ds(sx + 1, tx)], sem.at[3]
        )
        cp_o.start()

        if with_norm:
            # Clamped tiles overlap in x; don't double count overlap planes.
            xi = jax.lax.broadcasted_iota(jnp.int32, (tx, yp, zp), 0)
            fresh = xi >= (t * tx - sx)
            r2 = (
                jnp.where(fresh, r, jnp.zeros_like(r)).astype(jnp.float32)
                ** 2
            )
            # Per-plane scalar partial sums feed an explicit Kahan chain:
            # the serial-accumulation error of one long f32 reduce is the
            # numerically risky part (plane-sum errors are independent and
            # average out; the chain is exactly compensated).  XLA cannot
            # reassociate the dependent scalar ops below.  Each summand is a
            # full 2-D plane reduce — Mosaic lowers plane->scalar reductions
            # but not scalar extraction from a 1-D vector.
            part = jnp.float32(0.0)
            pcomp = jnp.float32(0.0)
            for c in range(tx):
                y = jnp.sum(r2[c]) - pcomp
                tt = part + y
                pcomp = (tt - part) - y
                part = tt

            @pl.when(t == 0)
            def _():
                acc[0, 0] = part
                acc[0, 1] = jnp.float32(0.0)

            @pl.when(t != 0)
            def _():
                # Kahan-compensated cross-tile accumulation (SURVEY §7's
                # "compensated-f32 norm" mitigation; VERDICT r1 weak #4).
                total = acc[0, 0]
                y = part - acc[0, 1]
                tt = total + y
                acc[0, 1] = (tt - total) - y
                acc[0, 0] = tt

            @pl.when(t == ntx - 1)
            def _():
                sum_ref[0, 0] = acc[0, 0]
        else:

            @pl.when(t == ntx - 1)
            def _():
                sum_ref[0, 0] = jnp.float32(0.0)

        cp_o.wait()

    n_in = (2 if apply_mode else 3) + (1 if has_nv else 0)
    scratch = [
        pltpu.VMEM((tx + 2, yp, zp), dtype),
        pltpu.VMEM((tx, yp, zp), dtype),
    ]
    if has_nv:
        scratch.append(pltpu.VMEM((tx, yp, zp), dtype))
    scratch.append(pltpu.VMEM((tx, yp, zp), dtype))
    scratch.append(pltpu.SMEM((1, 2), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    return pl.pallas_call(
        kernel,
        grid=(ntx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_in,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )


def apply_stencil_fas(
    dead, v, dims, params: GridParams, h: float, interpret: bool = False
):
    """FAS operator application A(v)/h² + γ·v·e^v (reference:
    src/cpu/CpuSolver.cpp:182-209) — the NONLINEAR residual kernel with the
    f stream removed and the sign kept positive.  Aliased into ``dead``."""
    nl = params if params.mode == Mode.NONLINEAR else None
    assert nl is not None, "apply_stencil_fas is a NONLINEAR-mode op"
    _apply_tuning()
    call = _residual_call(
        v.shape, dims, v.dtype.name, _compile_key(params), h,
        False, interpret, True,
    )
    r, _ = call(dead, v)
    return r


def residual(
    dead_r,
    v,
    f,
    dims,
    params: GridParams,
    h: float,
    newton_v=None,
    with_norm: bool = True,
    interpret: bool = False,
):
    """Residual r = f − (A·v/h² + mode term) and Σr² (reference:
    src/cpu/CpuSolver.cpp:45-83).  r is written into ``dead_r`` (aliased)."""
    _apply_tuning()
    call = _residual_call(
        v.shape, dims, v.dtype.name, _compile_key(params), h, with_norm,
        interpret,
    )
    if params.mode == Mode.NEWTON:
        r, s = call(dead_r, v, f, newton_v)
    else:
        r, s = call(dead_r, v, f)
    return r, s[0, 0].astype(v.dtype)


# ---------------------------------------------------------------------------
# Full-weighting restriction (fine r → coarse interior)
# ---------------------------------------------------------------------------

_W1D = (0.5, 1.0, 0.5)


def _restrict_matrix(fp: int, cp: int, cn: int, dtype):
    """(fp, cp) 1-D full-weighting operator: column cc ∈ [1, cn] has weights
    (0.25, 0.5, 0.25) at fine rows 2cc+(-1,0,1); other columns are zero.
    Built from iota so it lives in registers, not memory."""
    ff = jax.lax.broadcasted_iota(jnp.int32, (fp, cp), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (fp, cp), 1)
    d = ff - 2 * cc
    w = jnp.where(d == 0, 0.5, 0.0)
    w = jnp.where((d == -1) | (d == 1), 0.25, w)
    valid = (cc >= 1) & (cc <= cn)
    return jnp.where(valid, w, 0.0).astype(dtype)


def _prolong_matrix(cp: int, fp: int, fn: int, dtype):
    """(cp, fp) 1-D trilinear prolongation operator: fine column m ∈ [1, fn]
    gets 1.0 from coarse row m/2 when m is even, else 0.5 from rows (m∓1)/2
    (reference padded-index relation E[2I] = C[I], E[odd] = midpoint)."""
    cc = jax.lax.broadcasted_iota(jnp.int32, (cp, fp), 0)
    mm = jax.lax.broadcasted_iota(jnp.int32, (cp, fp), 1)
    d = mm - 2 * cc
    w = jnp.where(d == 0, 1.0, 0.0)
    w = jnp.where((d == -1) | (d == 1), 0.5, w)
    valid = (mm >= 1) & (mm <= fn)
    return jnp.where(valid, w, 0.0).astype(dtype)


@functools.lru_cache(maxsize=None)
def _restrict_call(
    fine_shape, coarse_shape, coarse_dims, dtype_name, interpret: bool
):
    dtype = jnp.dtype(dtype_name)
    fxp, fyp, fzp = fine_shape
    cxp, cyp, czp = coarse_shape
    cnx, cny, cnz = coarse_dims
    fplane = fyp * fzp * dtype.itemsize
    cplane = cyp * czp * dtype.itemsize
    tx = max(
        1, min((_VMEM_BUDGET - fplane) // (2 * fplane + cplane), 128, cnx)
    )
    ntx = _cdiv(cnx, tx)

    def kernel(_, fine_ref, out_ref, fslab, oslab, sem):
        t = pl.program_id(0)
        sx = jnp.minimum(t * tx, cnx - tx)

        cp_in = pltpu.make_async_copy(
            fine_ref.at[pl.ds(2 * sx + 1, 2 * tx + 1)], fslab, sem.at[0]
        )
        cp_in.start()
        cp_in.wait()

        slab = fslab[...]
        # x-direction 1-D full weighting, stride-free: coarse tile row c
        # reads slab-local fine rows 2c, 2c+1, 2c+2 — de-interleaved with
        # leading-dim reshapes (Mosaic has no strided vector slices).
        a = slab[0 : 2 * tx].reshape(tx, 2, fyp, fzp)
        b = slab[1 : 1 + 2 * tx].reshape(tx, 2, fyp, fzp)
        sx_planes = 0.25 * a[:, 0] + 0.5 * a[:, 1] + 0.25 * b[:, 1]
        # y/z directions: one matmul per axis with the 1-D operator as a
        # banded matrix — the MXU is otherwise idle in this solver.
        wy = _restrict_matrix(fyp, cyp, cny, dtype)  # (fyp, cyp)
        wz = _restrict_matrix(fzp, czp, cnz, dtype)  # (fzp, czp)
        for c in range(tx):
            tmp = _dot3t(sx_planes[c], wz, dtype)        # (fyp, czp)
            out_c = _dot3t(tmp, wy, dtype, transpose=True)  # (cyp, czp)
            oslab[c] = out_c.astype(dtype)

        cp_o = pltpu.make_async_copy(
            oslab, out_ref.at[pl.ds(sx + 1, tx)], sem.at[1]
        )
        cp_o.start()
        cp_o.wait()

    return pl.pallas_call(
        kernel,
        grid=(ntx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(coarse_shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * tx + 1, fyp, fzp), dtype),
            pltpu.VMEM((tx, cyp, czp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )


def restrict_full_weighting(
    dead_coarse, fine, coarse_dims, interpret: bool = False
):
    """27-point full-weighting restriction (reference:
    src/cpu/CpuSolver.cpp:211-238); result aliased into ``dead_coarse``."""
    _apply_tuning()
    call = _restrict_call(
        fine.shape,
        dead_coarse.shape,
        tuple(coarse_dims),
        fine.dtype.name,
        interpret,
    )
    return call(dead_coarse, fine)


# ---------------------------------------------------------------------------
# Trilinear prolongation fused with the coarse-grid correction (v += P·coarse)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _prolong_call(
    coarse_shape, fine_shape, fine_dims, dtype_name, interpret: bool
):
    dtype = jnp.dtype(dtype_name)
    fxp, fyp, fzp = fine_shape
    cxp, cyp, czp = coarse_shape
    fnx, fny, fnz = fine_dims
    fplane = fyp * fzp * dtype.itemsize
    cplane = cyp * czp * dtype.itemsize
    tx = max(
        2,
        min(
            (_VMEM_BUDGET - 2 * cplane) // (2 * fplane + cplane // 2),
            128,
            fnx - fnx % 2,
        ),
    )
    tx -= tx % 2
    ntx = _cdiv(fnx, tx)
    txw = tx + (fnx - tx) % 2
    hcx = (txw + 3) // 2

    def kernel(_, coarse_ref, v_ref, out_ref, cs, vs, os_, sem):
        t = pl.program_id(0)
        sx = jnp.minimum(t * tx, fnx - txw)
        sx = sx - sx % 2

        cp_c = pltpu.make_async_copy(
            coarse_ref.at[pl.ds(sx // 2, hcx)], cs, sem.at[0]
        )
        cp_v = pltpu.make_async_copy(
            v_ref.at[pl.ds(sx + 1, txw)], vs, sem.at[1]
        )
        cp_c.start()
        cp_v.start()
        cp_c.wait()

        c = cs[...]
        # x-direction: interleave midpoints/injections stride-free via a
        # leading-dim reshape.  With even-aligned tile start: fine row p even
        # → (c[p/2]+c[p/2+1])/2, p odd → c[(p+1)/2].
        odd_x = c[1:]
        even_x = 0.5 * (c[:-1] + c[1:])
        ex = jnp.concatenate(
            [even_x[:, None], odd_x[:, None]], axis=1
        ).reshape(2 * (hcx - 1), cyp, czp)[:txw]
        # y/z directions: per-plane matmuls with the 1-D prolongation
        # operator (zero outside the logical fine interior).
        py = _prolong_matrix(cyp, fyp, fny, dtype)  # (cyp, fyp)
        pz = _prolong_matrix(czp, fzp, fnz, dtype)  # (czp, fzp)
        cp_v.wait()
        vsl = vs[...]
        for q in range(txw):
            tmp = _dot3t(ex[q], pz, dtype)               # (cyp, fzp)
            e_q = _dot3t(tmp, py, dtype, transpose=True)  # (fyp, fzp)
            os_[q] = vsl[q] + e_q.astype(dtype)

        cp_o = pltpu.make_async_copy(
            os_, out_ref.at[pl.ds(sx + 1, txw)], sem.at[2]
        )
        cp_o.start()
        cp_o.wait()

    return pl.pallas_call(
        kernel,
        grid=(ntx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(fine_shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((hcx, cyp, czp), dtype),
            pltpu.VMEM((txw, fyp, fzp), dtype),
            pltpu.VMEM((txw, fyp, fzp), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )


def prolong_add(dead, coarse_v, v_fine, fine_dims, interpret: bool = False):
    """v_fine + trilinear(coarse_v) (reference interpolate + `v += e`,
    src/cpu/CpuSolver.cpp:240-290 and :130-132), aliased into ``dead``."""
    _apply_tuning()
    call = _prolong_call(
        coarse_v.shape,
        v_fine.shape,
        tuple(fine_dims),
        v_fine.dtype.name,
        interpret,
    )
    return call(dead, coarse_v, v_fine)
