"""The whole multigrid V-cycle as ONE Pallas TPU mega-kernel.

Motivation: per-kernel launch overhead dominates a V-cycle built from ~30
individual kernels (measured ~3 ms per launch in the tunneled-TPU bench
environment, and still microseconds each on bare metal); and a single kernel
lets the DMA pipeline run uninterrupted across ops.  This kernel executes the
complete cycle — pre-smoothing, residual, restriction, coarse smoothing,
prolongation+correction, post-smoothing, final residual norm — for every
level in one launch, with all level arrays updated in place
(``input_output_aliases``).

Reference semantics: src/cpu/CpuSolver.cpp:85-139 (V-cycle),
:141-179 (Jacobi), :45-83 (residual), :211-238 (restriction),
:240-290 (interpolation); Newton-mode smoothing :166-172.

Structure:
  * Single program (``grid=()``); per-op tile loops are ``lax.fori_loop``s
    over x-slabs, so the trace stays compact at any grid size.
  * VMEM scratch is a fixed set of slab buffers sized for the finest level;
    coarser levels DMA into aligned subviews.
  * Jacobi sweeps ping-pong between each level's v and r HBM buffers —
    zero HBM traffic beyond the roofline minimum, no allocation, and the
    (static) final buffer assignment is reported back to the caller.
  * Down-leg smoothing at coarse levels starts from v=0 (reference
    :100-101), so the first sweep is specialised to read only f.

Supported modes: LINEAR, NEWTON and NONLINEAR (FAS: the tau correction
``f²ʰ = R(r) + A²ʰ(R v) + γ (R v) e^{R v}`` runs as one fused coarse pass,
and the up-leg ``v²ʰ − restV²ʰ`` subtraction folds into the prolongation's
coarse read — reference :100-113 and :121-125).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.grid import alloc_shape

# VMEM budget for the slab buffers (bytes); the rest is headroom for Mosaic.
_VMEM_BUDGET = 80 * 1024 * 1024
# Mosaic scoped-VMEM ceiling for the whole-cycle kernel.
_VMEM_LIMIT = 110 * 1024 * 1024
# Both resolve per device kind (utils/tuning) on first use; explicit
# module-level reassignment overrides.
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
    _VMEM_BUDGET = t.v1_vmem_budget
    _VMEM_LIMIT = t.v1_vmem_limit



def _dot3v(a, w, dtype, transpose=False):
    """3-pass exact-bf16 transfer dot (round 5; see PERF.md §9 and
    pallas_vcycle2._dot3 — dyadic weights exact in bf16, operand split
    carries all 24 f32 mantissa bits, one concatenated dot call).
    Non-f32 dtypes keep the HIGHEST form."""
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


def _cdiv(a, b):
    return -(-a // b)


def _roll(x, shift: int, axis: int):
    shift = shift % x.shape[axis]
    try:
        return pltpu.roll(x, shift, axis)
    except Exception:  # interpret mode fallback
        return jnp.roll(x, shift, axis=axis)


@functools.lru_cache(maxsize=None)
def _vcycle_call(key, dims_key, dtype_name, interpret: bool):
    """Build the mega-kernel for a given (params-key, level-dims) pair.

    Returns ``(call, final_locs)`` where ``final_locs[l]`` says which output
    buffer (0 = the v ref, 1 = the r ref) holds the level's v value after the
    cycle (the other holds r / dead scratch).
    """
    (stencil_values, stencil_offsets, mode, omega, gamma,
     pre, post) = key
    dims = dims_key
    taps = tuple(zip(stencil_values, stencil_offsets))
    dtype = jnp.dtype(dtype_name)
    nlev = len(dims)
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    shapes = [alloc_shape(d) for d in dims]
    hs = [1.0 / (d[1] + 1) for d in dims]

    y0, z0 = shapes[0][1], shapes[0][2]
    plane0 = y0 * z0 * dtype.itemsize
    # Equal-sized slab buffers of B finest-level planes each: vs and fs
    # (+ nvs for Newton).  Outputs are written back in place into the
    # just-consumed buffer planes, and all compute is per-output-plane, so
    # Mosaic's vector stack stays within a few planes.
    nbuf = 3 + (1 if has_nv else 0)
    B = max(3, _VMEM_BUDGET // plane0 // nbuf // 2)
    B = min(B, 18)

    # per-level refs: v, f, r [, newton_v (NEWTON) | rest_v (NONLINEAR)]
    n_arr = 3 + (1 if (has_nv or has_rv) else 0)

    # ---- static schedule bookkeeping -------------------------------------
    # locs[l]: 0 -> v value currently in the v ref, 1 -> in the r ref.
    locs = [0] * nlev
    ops: List[tuple] = []

    def emit_smooth(l, n_iter, from_zero):
        nonlocal locs
        for s in range(n_iter):
            if from_zero and s == 0:
                ops.append(("smooth0", l, 0))  # write v ref directly
                locs[l] = 0
            else:
                src = locs[l]
                ops.append(("smooth", l, src, 1 - src))
                locs[l] = 1 - locs[l]

    # Down-leg.
    for l in range(nlev - 1):
        emit_smooth(l, pre, from_zero=(l > 0 and not has_rv))
        # residual into the non-v buffer
        ops.append(("residual", l, locs[l], 1 - locs[l], False))
        if not has_rv:
            # restrict r to f_{l+1}
            ops.append(("restrict", l, 1 - locs[l]))
        else:
            # FAS (reference :100-113): v²ʰ = restV²ʰ = R(v); then
            # f²ʰ = R(r) + A²ʰ(restV) + γ restV e^{restV} in one pass.
            ops.append(("restrict_v", l, locs[l]))
            locs[l + 1] = 0
            ops.append(("fas_f", l, 1 - locs[l]))
    # Coarsest.
    emit_smooth(nlev - 1, pre + post, from_zero=not has_rv)
    # Up-leg.
    for l in range(nlev - 1, 0, -1):
        # prolong coarse v into fine v (fused correction); dst = non-v buf.
        # FAS: the coarse operand is v²ʰ − restV²ʰ (reference :121-125),
        # folded into the prolongation's coarse read.
        ops.append(
            ("prolong", l, locs[l], locs[l - 1], 1 - locs[l - 1])
        )
        locs[l - 1] = 1 - locs[l - 1]
        emit_smooth(l - 1, post, from_zero=False)
    ops.append(("residual", 0, locs[0], 1 - locs[0], True))
    final_locs = tuple(locs)

    inv_h2 = [1.0 / (h * h) for h in hs]
    pre_fac = [stencil_values[0] * ih for ih in inv_h2]
    alpha = [(h * h) / stencil_values[0] for h in hs]

    def kernel(*refs):
        ins = refs[: nlev * n_arr]
        outs = refs[nlev * n_arr : 2 * nlev * n_arr]
        sum_ref = refs[2 * nlev * n_arr]
        vs, fs, os_, *rest = refs[2 * nlev * n_arr + 1 :]
        if has_nv:
            nvs, acc, sem = rest
        else:
            acc, sem = rest
            nvs = None

        def buf(l, which):
            # which: 0 = v ref, 1 = f ref, 2 = r ref, 3 = nv ref.
            return outs[l * n_arr + which]

        def vbuf(l, loc):
            return buf(l, 0) if loc == 0 else buf(l, 2)

        def copy_in(ref, start, n, dst, slot, yl, zl, s, start_now=True):
            cp = pltpu.make_async_copy(
                ref.at[pl.ds(start, n)],
                dst.at[slot, pl.ds(0, n), :yl, :zl],
                sem.at[s, slot],
            )
            if start_now:
                cp.start()
            return cp

        def copy_out(src, slot, n, yl, zl, ref, start, s, start_now=True):
            cp = pltpu.make_async_copy(
                src.at[slot, pl.ds(0, n), :yl, :zl],
                ref.at[pl.ds(start, n)],
                sem.at[s, slot],
            )
            if start_now:
                cp.start()
            return cp

        def keep_mask(shape, ny, nz):
            yi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            zi = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            return (yi >= 1) & (yi <= ny) & (zi >= 1) & (zi <= nz)

        def plane_stencil(l, slot, c, yl, zl, sbuf=None):
            """A·v/h² for output plane c of the current vs slab.

            Single-plane values only (keeps Mosaic's vector stack small);
            taps sharing a coefficient are summed before the multiply and
            1/h² is folded into the coefficients, so the common symmetric
            7-point stencil costs 2 multiplies instead of 8.
            """
            groups = {}
            for val, off in taps:
                groups.setdefault(val * inv_h2[l], []).append(off)
            s = None
            if sbuf is None:
                sbuf = vs
            for coeff, offs in groups.items():
                g = None
                for (ox, oy, oz) in offs:
                    term = sbuf[slot, 1 + c + ox, :yl, :zl]
                    if oy:
                        term = _roll(term, -oy, 0)
                    if oz:
                        term = _roll(term, -oz, 1)
                    g = term if g is None else g + term
                term = coeff * g
                s = term if s is None else s + term
            return s

        # ---- op implementations ------------------------------------------
        def op_smooth(l, src_loc, dst_loc, zero_start):
            nx, ny, nz = dims[l]
            _, yl, zl = shapes[l]
            tx = min(B - 2, nx)
            ntx = _cdiv(nx, tx)
            src = vbuf(l, src_loc) if not zero_start else None
            dst = vbuf(l, dst_loc)
            fref = buf(l, 1)
            nvref = buf(l, 3) if has_nv else None
            w_lin = omega * alpha[l]
            keep = keep_mask((yl, zl), ny, nz)
            zero_plane = jnp.zeros((yl, zl), dtype)

            def start_in(t, slot):
                sx = jnp.minimum(t * tx, nx - tx)
                if not zero_start:
                    copy_in(src, sx, tx + 2, vs, slot, yl, zl, 0)
                copy_in(fref, sx + 1, tx, fs, slot, yl, zl, 1)
                if has_nv:
                    copy_in(nvref, sx + 1, tx, nvs, slot, yl, zl, 2)

            start_in(0, 0)

            def body(t, _):
                slot = jax.lax.rem(t, 2)
                sx = jnp.minimum(t * tx, nx - tx)

                @pl.when(t + 1 < ntx)
                def _():
                    start_in(t + 1, jax.lax.rem(t + 1, 2))

                if not zero_start:
                    copy_in(
                        src, sx, tx + 2, vs, slot, yl, zl, 0,
                        start_now=False,
                    ).wait()
                copy_in(
                    fref, sx + 1, tx, fs, slot, yl, zl, 1, start_now=False
                ).wait()
                if has_nv:
                    copy_in(
                        nvref, sx + 1, tx, nvs, slot, yl, zl, 2,
                        start_now=False,
                    ).wait()

                # The output stages through this slot's os planes; make sure
                # its previous out-DMA (tile t-2) has drained.
                @pl.when(t >= 2)
                def _():
                    copy_out(
                        os_, slot, tx, yl, zl, dst,
                        jnp.minimum((t - 2) * tx, nx - tx) + 1, 3,
                        start_now=False,
                    ).wait()

                for c in range(tx):
                    fint = fs[slot, c, :yl, :zl]
                    if zero_start:
                        # v = 0: the residual is just f.
                        if mode == Mode.LINEAR:
                            newv = w_lin * fint
                        else:  # NEWTON with v=0
                            nvi = nvs[slot, c, :yl, :zl]
                            lin = gamma * (1.0 + nvi) * jnp.exp(nvi)
                            newv = omega * (fint / (pre_fac[l] + lin))
                    else:
                        av = plane_stencil(l, slot, c, yl, zl)
                        center = vs[slot, 1 + c, :yl, :zl]
                        if mode == Mode.LINEAR:
                            newv = center + w_lin * (fint - av)
                        elif mode == Mode.NONLINEAR:
                            # reference :159-165 (tutorial formula 6.14)
                            ex = jnp.exp(center)
                            rr = fint - (av + gamma * center * ex)
                            denom = pre_fac[l] + gamma * (1.0 + center) * ex
                            newv = center + omega * (rr / denom)
                        else:
                            nvi = nvs[slot, c, :yl, :zl]
                            ex = jnp.exp(nvi)
                            lin = gamma * (1.0 + nvi) * ex
                            rr = fint - (av + lin * center)
                            newv = center + omega * (
                                rr / (pre_fac[l] + lin)
                            )
                    os_[slot, c, :yl, :zl] = jnp.where(
                        keep, newv, zero_plane
                    )
                copy_out(os_, slot, tx, yl, zl, dst, sx + 1, 3)
                return 0

            jax.lax.fori_loop(0, ntx, body, 0)
            # Drain the last (up to) two in-flight out-DMAs.
            for back in (2, 1):
                if ntx - back >= 0:
                    t_last = ntx - back
                    copy_out(
                        os_, t_last % 2, tx, yl, zl, dst,
                        jnp.minimum(t_last * tx, nx - tx) + 1, 3,
                        start_now=False,
                    ).wait()

        def op_residual(l, v_loc, dst_loc, with_norm):
            nx, ny, nz = dims[l]
            _, yl, zl = shapes[l]
            tx = min(B - 2, nx)
            ntx = _cdiv(nx, tx)
            src = vbuf(l, v_loc)
            dst = vbuf(l, dst_loc)
            fref = buf(l, 1)
            nvref = buf(l, 3) if has_nv else None
            keep = keep_mask((yl, zl), ny, nz)
            zero_plane = jnp.zeros((yl, zl), dtype)

            def start_in(t, slot):
                sx = jnp.minimum(t * tx, nx - tx)
                copy_in(src, sx, tx + 2, vs, slot, yl, zl, 0)
                copy_in(fref, sx + 1, tx, fs, slot, yl, zl, 1)
                if has_nv:
                    copy_in(nvref, sx + 1, tx, nvs, slot, yl, zl, 2)

            start_in(0, 0)

            def body(t, carry):
                slot = jax.lax.rem(t, 2)
                sx = jnp.minimum(t * tx, nx - tx)

                @pl.when(t + 1 < ntx)
                def _():
                    start_in(t + 1, jax.lax.rem(t + 1, 2))

                copy_in(
                    src, sx, tx + 2, vs, slot, yl, zl, 0, start_now=False
                ).wait()
                copy_in(
                    fref, sx + 1, tx, fs, slot, yl, zl, 1, start_now=False
                ).wait()
                if has_nv:
                    copy_in(
                        nvref, sx + 1, tx, nvs, slot, yl, zl, 2,
                        start_now=False,
                    ).wait()

                @pl.when(t >= 2)
                def _():
                    copy_out(
                        os_, slot, tx, yl, zl, dst,
                        jnp.minimum((t - 2) * tx, nx - tx) + 1, 3,
                        start_now=False,
                    ).wait()

                total, comp = carry
                for c in range(tx):
                    av = plane_stencil(l, slot, c, yl, zl)
                    if has_nv:
                        nvi = nvs[slot, c, :yl, :zl]
                        center = vs[slot, 1 + c, :yl, :zl]
                        av = av + gamma * (1.0 + nvi) * center * jnp.exp(
                            nvi
                        )
                    elif has_rv:
                        center = vs[slot, 1 + c, :yl, :zl]
                        av = av + gamma * center * jnp.exp(center)
                    rr = jnp.where(
                        keep, fs[slot, c, :yl, :zl] - av, zero_plane
                    )
                    os_[slot, c, :yl, :zl] = rr
                    if with_norm:
                        # Clamped tiles overlap in x; skip re-counted planes.
                        fresh = (t * tx - sx) <= c
                        part = jnp.where(
                            fresh,
                            jnp.sum(rr.astype(jnp.float32) ** 2),
                            0.0,
                        )
                        # Kahan-compensated accumulation: the ~O(nx) serial
                        # plane-sum chain is the numerically risky part of
                        # the f32 norm (SURVEY §7's declared mitigation).
                        y = part - comp
                        tt = total + y
                        comp = (tt - total) - y
                        total = tt
                copy_out(os_, slot, tx, yl, zl, dst, sx + 1, 3)
                return total, comp

            total, _ = jax.lax.fori_loop(
                0, ntx, body, (jnp.float32(0.0), jnp.float32(0.0))
            )
            for back in (2, 1):
                if ntx - back >= 0:
                    t_last = ntx - back
                    copy_out(
                        os_, t_last % 2, tx, yl, zl, dst,
                        jnp.minimum(t_last * tx, nx - tx) + 1, 3,
                        start_now=False,
                    ).wait()
            if with_norm:
                acc[0, 0] = total

        def op_restrict(l, src_loc, dst=None, dst2=None):
            # fine level l field (in buffer src_loc) -> coarse level l+1
            cnx, cny, cnz = dims[l + 1]
            _, fyl, fzl = shapes[l]
            _, cyl, czl = shapes[l + 1]
            txc = min((B - 1) // 2, cnx)
            ntx = _cdiv(cnx, txc)
            src = vbuf(l, src_loc)
            if dst is None:
                dst = buf(l + 1, 1)

            wy = _restrict_matrix(fyl, cyl, cny, dtype)
            wz = _restrict_matrix(fzl, czl, cnz, dtype)

            def body(t, _):
                sx = jnp.minimum(t * txc, cnx - txc)
                cp = copy_in(src, 2 * sx + 1, 2 * txc + 1, vs, 0, fyl,
                             fzl, 0)
                cp.wait()
                for c in range(txc):
                    # 1-D x full weighting from fine slab planes 2c..2c+2,
                    # then y/z as banded matmuls on the idle MXU.
                    sx_c = (
                        0.25 * vs[0, 2 * c, :fyl, :fzl]
                        + 0.5 * vs[0, 2 * c + 1, :fyl, :fzl]
                        + 0.25 * vs[0, 2 * c + 2, :fyl, :fzl]
                    )
                    tmp = _dot3v(sx_c, wz, dtype)
                    out_c = _dot3v(tmp, wy, dtype, transpose=True)
                    # Fine planes < 2c+1 are consumed; reuse plane c of the
                    # slab buffer as the output staging area.
                    fs[0, c, :cyl, :czl] = out_c.astype(dtype)
                copy_out(fs, 0, txc, cyl, czl, dst, sx + 1, 3).wait()
                if dst2 is not None:
                    copy_out(
                        fs, 0, txc, cyl, czl, dst2, sx + 1, 3
                    ).wait()
                return 0

            jax.lax.fori_loop(0, ntx, body, 0)

        def op_fas_f(l, r_loc):
            """FAS coarse RHS in one pass (reference :96-113):
            f_{l+1} = R(r_l) + A²ʰ(restV)/h² + γ restV e^{restV}."""
            lc = l + 1
            cnx, cny, cnz = dims[lc]
            _, fyl, fzl = shapes[l]
            _, cyl, czl = shapes[lc]
            txc = min(min((B - 1) // 2, B - 2), cnx)
            ntx = _cdiv(cnx, txc)
            src = vbuf(l, r_loc)
            rvref = buf(lc, 3)
            dst = buf(lc, 1)
            wy = _restrict_matrix(fyl, cyl, cny, dtype)
            wz = _restrict_matrix(fzl, czl, cnz, dtype)
            keep = keep_mask((cyl, czl), cny, cnz)
            zero_plane = jnp.zeros((cyl, czl), dtype)

            def body(t, _):
                sx = jnp.minimum(t * txc, cnx - txc)
                cpr = copy_in(src, 2 * sx + 1, 2 * txc + 1, vs, 0, fyl,
                              fzl, 0)
                cprv = copy_in(rvref, sx, txc + 2, os_, 0, cyl, czl, 1)
                cpr.wait()
                cprv.wait()
                for c in range(txc):
                    sx_c = (
                        0.25 * vs[0, 2 * c, :fyl, :fzl]
                        + 0.5 * vs[0, 2 * c + 1, :fyl, :fzl]
                        + 0.25 * vs[0, 2 * c + 2, :fyl, :fzl]
                    )
                    tmp = _dot3v(sx_c, wz, dtype)
                    rr_c = _dot3v(
                        tmp, wy, dtype, transpose=True
                    ).astype(dtype)
                    av = plane_stencil(lc, 0, c, cyl, czl, sbuf=os_)
                    rv_c = os_[0, 1 + c, :cyl, :czl]
                    fas = av + gamma * rv_c * jnp.exp(rv_c)
                    fs[0, c, :cyl, :czl] = jnp.where(
                        keep, rr_c + fas, zero_plane
                    )
                copy_out(fs, 0, txc, cyl, czl, dst, sx + 1, 3).wait()
                return 0

            jax.lax.fori_loop(0, ntx, body, 0)

        def op_prolong(l, cv_loc, fv_loc, dst_loc):
            # coarse level l v -> fine level l-1 v (fused += correction)
            fnx, fny, fnz = dims[l - 1]
            _, fyl, fzl = shapes[l - 1]
            _, cyl, czl = shapes[l]
            tx = max(2, min(B - 1, fnx - fnx % 2))
            tx -= tx % 2
            ntx = _cdiv(fnx, tx)
            txw = tx + (fnx - tx) % 2
            hcx = (txw + 3) // 2
            csrc = vbuf(l, cv_loc)
            fsrc = vbuf(l - 1, fv_loc)
            dst = vbuf(l - 1, dst_loc)
            py = _prolong_matrix(cyl, fyl, fny, dtype)
            pz = _prolong_matrix(czl, fzl, fnz, dtype)

            rvsrc = buf(l, 3) if has_rv else None

            def coarse_plane(m):
                # FAS up-leg operand is v²ʰ − restV²ʰ (reference :121-125),
                # computed on the fly from the two slabs.
                if has_rv:
                    return fs[0, m, :cyl, :czl] - fs[1, m, :cyl, :czl]
                return fs[0, m, :cyl, :czl]

            def body(t, _):
                sx = jnp.minimum(t * tx, fnx - txw)
                sx = sx - sx % 2
                cpc = copy_in(csrc, sx // 2, hcx, fs, 0, cyl, czl, 0)
                if has_rv:
                    cprv = copy_in(rvsrc, sx // 2, hcx, fs, 1, cyl, czl, 2)
                cpv = copy_in(fsrc, sx + 1, txw, vs, 0, fyl, fzl, 1)
                cpc.wait()
                if has_rv:
                    cprv.wait()
                cpv.wait()
                for q in range(txw):
                    # fine row q (even-aligned tile): q even ->
                    # (c[q/2]+c[q/2+1])/2, q odd -> c[(q+1)/2]
                    if q % 2 == 0:
                        ex_q = 0.5 * (
                            coarse_plane(q // 2) + coarse_plane(q // 2 + 1)
                        )
                    else:
                        ex_q = coarse_plane((q + 1) // 2)
                    tmp = _dot3v(ex_q, pz, dtype)
                    e_q = _dot3v(tmp, py, dtype, transpose=True)
                    vs[0, q, :fyl, :fzl] = vs[0, q, :fyl, :fzl] + \
                        e_q.astype(dtype)
                copy_out(vs, 0, txw, fyl, fzl, dst, sx + 1, 3).wait()
                return 0

            jax.lax.fori_loop(0, ntx, body, 0)

        # ---- run the schedule --------------------------------------------
        for op in ops:
            if op[0] == "smooth0":
                op_smooth(op[1], None, op[2], zero_start=True)
            elif op[0] == "smooth":
                op_smooth(op[1], op[2], op[3], zero_start=False)
            elif op[0] == "residual":
                op_residual(op[1], op[2], op[3], op[4])
            elif op[0] == "restrict":
                op_restrict(op[1], op[2])
            elif op[0] == "restrict_v":
                op_restrict(
                    op[1], op[2],
                    dst=buf(op[1] + 1, 0),
                    dst2=buf(op[1] + 1, 3),
                )
            elif op[0] == "fas_f":
                op_fas_f(op[1], op[2])
            elif op[0] == "prolong":
                op_prolong(op[1], op[2], op[3], op[4])
        sum_ref[0, 0] = acc[0, 0]

    n_in = nlev * n_arr
    scratch = [
        pltpu.VMEM((2, B, y0, z0), dtype),
        pltpu.VMEM((2, B, y0, z0), dtype),
        pltpu.VMEM((2, B, y0, z0), dtype),
    ]
    if has_nv:
        scratch.append(pltpu.VMEM((2, B, y0, z0), dtype))
    scratch.append(pltpu.SMEM((1, 1), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((4, 2)))

    out_shapes = []
    out_specs = []
    for l in range(nlev):
        for _ in range(n_arr):
            out_shapes.append(jax.ShapeDtypeStruct(shapes[l], dtype))
            out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    out_shapes.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
    out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    call = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_in,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        input_output_aliases={i: i for i in range(n_in)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    return call, final_locs


def _restrict_matrix(fp, cp_, cn, dtype):
    ff = jax.lax.broadcasted_iota(jnp.int32, (fp, cp_), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (fp, cp_), 1)
    d = ff - 2 * cc
    w = jnp.where(d == 0, 0.5, 0.0)
    w = jnp.where((d == -1) | (d == 1), 0.25, w)
    valid = (cc >= 1) & (cc <= cn)
    return jnp.where(valid, w, 0.0).astype(dtype)


def _prolong_matrix(cp_, fp, fn, dtype):
    cc = jax.lax.broadcasted_iota(jnp.int32, (cp_, fp), 0)
    mm = jax.lax.broadcasted_iota(jnp.int32, (cp_, fp), 1)
    d = mm - 2 * cc
    w = jnp.where(d == 0, 1.0, 0.0)
    w = jnp.where((d == -1) | (d == 1), 0.5, w)
    valid = (mm >= 1) & (mm <= fn)
    return jnp.where(valid, w, 0.0).astype(dtype)


def supported(params: GridParams) -> bool:
    # v1 implements the V schedule only; W/F route to the wavefront
    # kernel (ops/pallas_vcycle2) or the XLA path.
    if params.cycle_type != "V":
        return False
    return params.mode in (Mode.LINEAR, Mode.NEWTON, Mode.NONLINEAR)


def vcycle_fused(state_levels, params: GridParams, interpret: bool = False):
    """Run one full V-cycle as a single kernel launch.

    ``state_levels``: sequence of GridLevel.  Returns
    ``(new_levels_fields, sumsq)`` where new_levels_fields is a list of
    (v, f, r) [+ (newton_v,)] tuples per level.
    """
    key = (
        params.stencil.values,
        params.stencil.offsets,
        params.mode,
        params.omega,
        params.gamma,
        params.pre_smoothing,
        params.post_smoothing,
    )
    dims_key = params.level_dims()
    dtype_name = state_levels[0].v.dtype.name
    _apply_tuning()
    call, final_locs = _vcycle_call(key, dims_key, dtype_name, interpret)

    has_nv = params.mode == Mode.NEWTON
    has_rv = params.mode == Mode.NONLINEAR
    args = []
    for lvl in state_levels:
        args.extend([lvl.v, lvl.f, lvl.r])
        if has_nv:
            args.append(lvl.newton_v)
        elif has_rv:
            args.append(lvl.rest_v)
    outs = call(*args)
    n_arr = 4 if (has_nv or has_rv) else 3
    sumsq = outs[-1][0, 0]
    fields = []
    for l in range(len(state_levels)):
        o = outs[l * n_arr : (l + 1) * n_arr]
        v_out = o[0] if final_locs[l] == 0 else o[2]
        r_out = o[2] if final_locs[l] == 0 else o[0]
        if has_nv or has_rv:
            fields.append((v_out, o[1], r_out, o[3]))
        else:
            fields.append((v_out, o[1], r_out))
    return fields, sumsq
