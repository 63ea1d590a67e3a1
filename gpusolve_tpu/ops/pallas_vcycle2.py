"""Wavefront multigrid mega-kernel (v2): whole V-cycles in ONE Pallas launch
with sweep-fused streaming passes.

Why v2 exists.  The v1 mega-kernel (gpusolve_tpu.ops.pallas_vcycle) executes
each smoothing sweep / residual / transfer as its own streaming pass over the
level, so a pre=post=3 LINEAR cycle moves ~27 field-volumes of HBM traffic on
the finest level.  This kernel restructures every leg as a *wavefront*: while
plane ``p`` of ``v`` streams in, plane ``p-1`` of sweep 1, ``p-2`` of sweep 2,
…, and the residual at ``p-S-1`` are computed from small VMEM plane rings, and
only the final smoothed plane is written back.  One down pass per level
performs all pre-sweeps + residual + 27-point restriction (reading v and f
once, writing v once plus the ⅛-volume coarse RHS); one up pass performs
prolongation+correction + all post-sweeps (+ the final residual *norm* at the
finest level, never materialising r).  Level-0 traffic drops to ~6.3
field-volumes — a ~4x reduction — and every pass is in-place: the write
wavefront trails the read front, so v needs no ping-pong buffer.

Dense-z streaming: the z (lane) axis streams only ``round_up(nz+1, 128)``
columns of the tile-aligned allocation — for 2^k−1 grids that is *dense* (the
missing z=nz+1 halo column needs no synthesis: the +z tap's roll wraps in the
z=0 halo column, which is exactly the halo's correct zero value),
eliminating the alignment-padding traffic round-1's VERDICT flagged.

Multi-cycle: the kernel runs up to ``maxk`` cycles per launch with an
in-kernel early-stop test (``sumsq <= threshold``), amortising the per-launch
overhead that dominates small grids.

Reference semantics (identical math to v1 and the oracle):
src/cpu/CpuSolver.cpp:85-139 (V-cycle), :141-179 (Jacobi), :45-83 (residual),
:211-238 (restriction), :240-290 (interpolation); FAS tau correction :100-113
and up-leg v -= restV :121-125; Newton-mode smoothing :166-172.  The fusion
changes the pass structure, not the math.

Supported: LINEAR / NONLINEAR (FAS) / NEWTON, float32, pre/post <= 5 on
streamed levels (see ``supported``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.grid import alloc_shape

_VMEM_LIMIT = 126 * 1024 * 1024
_DEBUG_MAX_PASSES = None  # debugging aid: truncate the cycle after N passes
# Down legs at levels >= this skip the v write-back and the up leg
# recomputes the pre-sweeps (see the schedule note in one_cycle).  None
# disables (write-back everywhere — fastest on v5e: the kernel is
# VPU-bound, PERF.md §6, so recompute's extra vector work always loses
# there).  Resolved per device kind from utils/tuning on first use;
# module-level reassignment (the bit-identity tests' hook) overrides.
_RECOMPUTE_FROM_LEVEL = None
_TUNING_DEFAULTS = (_VMEM_LIMIT, _RECOMPUTE_FROM_LEVEL)
_TUNING_APPLIED = False


def _apply_tuning() -> None:
    global _VMEM_LIMIT, _RECOMPUTE_FROM_LEVEL, _TUNING_APPLIED
    if _TUNING_APPLIED:
        return
    _TUNING_APPLIED = True
    if (_VMEM_LIMIT, _RECOMPUTE_FROM_LEVEL) != _TUNING_DEFAULTS:
        return  # externally overridden — respect it
    from gpusolve_tpu.utils import tuning

    t = tuning.current()
    _VMEM_LIMIT = t.vmem_limit
    # Curated parts answer from the table; unknown parts consult the
    # measured streaming ceiling (tuning.probe_ceiling_gbps).
    _RECOMPUTE_FROM_LEVEL = tuning.resolved_recompute_from_level()
_TX = 8          # stream slab granularity (sublane tile) — planes per DMA
_TINY_AX = 16    # levels with alloc x-extent <= this run fully VMEM-resident


def _cdiv(a, b):
    return -(-a // b)


def _round_up(n, m):
    return -(-n // m) * m


def _acc_dt(dtype):
    """Accumulation dtype: f32 for f32 storage (Kahan-compensated norms),
    f64 for interpret-mode f64 parity runs (ops/pallas_spmd._acc_dt)."""
    import jax.numpy as _jnp

    return _jnp.float64 if _jnp.dtype(dtype) == _jnp.float64 \
        else _jnp.float32


def _roll(x, shift: int, axis: int):
    shift = shift % x.shape[axis]
    try:
        return pltpu.roll(x, shift, axis)
    except Exception:  # interpret mode fallback
        return jnp.roll(x, shift, axis=axis)


def z_live(dims_l, shape_l) -> int:
    """Lane columns actually streamed for a level: the dense extent
    ``round_up(nz+1, 128)`` when smaller than the allocation (the z=nz+1 halo
    column is then synthesised in-kernel), else the full alloc extent."""
    nz = dims_l[2]
    return min(shape_l[2], _round_up(nz + 1, 128))


def _restrict_matrix(fp, cp_, cn, dtype):
    """(fp, cp_) full-weighting factor along one minor axis: coarse j from
    fine 2j-1..2j+1 with weights 1/4,1/2,1/4 (reference CpuSolver.cpp:225-232
    separable factor)."""
    ff = jax.lax.broadcasted_iota(jnp.int32, (fp, cp_), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (fp, cp_), 1)
    d = ff - 2 * cc
    w = jnp.where(d == 0, 0.5, 0.0)
    w = jnp.where((d == -1) | (d == 1), 0.25, w)
    valid = (cc >= 1) & (cc <= cn)
    return jnp.where(valid, w, 0.0).astype(dtype)


def _prolong_matrix(cp_, fp, fn, dtype):
    """(cp_, fp) trilinear interpolation factor along one minor axis
    (reference CpuSolver.cpp:240-290 separable factor).  Rows for coarse halo
    columns beyond cp_ don't exist — their values are zero anyway."""
    cc = jax.lax.broadcasted_iota(jnp.int32, (cp_, fp), 0)
    mm = jax.lax.broadcasted_iota(jnp.int32, (cp_, fp), 1)
    d = mm - 2 * cc
    w = jnp.where(d == 0, 1.0, 0.0)
    w = jnp.where((d == -1) | (d == 1), 0.5, w)
    valid = (mm >= 1) & (mm <= fn)
    return jnp.where(valid, w, 0.0).astype(dtype)


_MAX_PASSES = 140  # Mosaic program-size cap: one unrolled pass body each


def _level_visits(nlev: int, cycle_type: str):
    """Times each level is visited per outer cycle: V -> 1, F -> l+1,
    W -> 2^l (the standard gamma-cycle visit counts)."""
    visits = [1] * nlev
    for l in range(1, nlev):
        if cycle_type == "W":
            visits[l] = 2 * visits[l - 1]
        elif cycle_type == "F":
            visits[l] = visits[l - 1] + 1
    return visits


def _cycle_pass_count(params: GridParams) -> int:
    nlev = params.num_levels
    visits = _level_visits(nlev, params.cycle_type)
    n = visits[-1]  # coarsest passes
    for l in range(nlev - 1):
        n += 2 * visits[l]  # one down + one up pass per visit
    return n


def _n_gen_rings(shapes, mode, pre: int, post: int) -> int:
    """Generation rings the active schedule needs.  The longest chain's
    last stage lands in the out staging ring, so rings = max chain length
    minus one: recompute up legs run pre+corr+post stages; otherwise the
    deepest chain is a STREAMED coarsest pass (pre+post sweeps) or, with a
    VMEM-resident coarsest, the write-back up leg (corr + post)."""
    if _RECOMPUTE_FROM_LEVEL is not None and mode != Mode.NONLINEAR:
        return max(pre + post, 1)
    if shapes[-1][0] > _TINY_AX:  # streamed coarsest
        return max(pre + post - 1, post, 1)
    return max(pre - 1, post, 1)


def _plan_scratch(dims, shapes, zls, mode, pre: int, post: int, itemsize):
    """Mirror of the kernel's VMEM scratch plan: list of element counts.
    Used both to allocate and (in ``supported``) to budget-check."""
    nlev = len(dims)
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    y0, zl0 = shapes[0][1], zls[0]
    first_stream = next(
        (l for l in range(nlev) if shapes[l][0] > _TINY_AX), None
    )
    first_tiny = next(
        (l for l in range(nlev) if shapes[l][0] <= _TINY_AX), None
    )
    if first_stream is not None and first_stream + 1 < nlev:
        yc0, zlc0 = shapes[first_stream + 1][1], zls[first_stream + 1]
    else:
        yc0, zlc0 = 8, 128
    if first_tiny is not None:
        yt0, zlt0 = shapes[first_tiny][1], zls[first_tiny]
    else:
        yt0, zlt0 = 8, 128
    n_gen = _n_gen_rings(shapes, mode, pre, post)
    plan = [
        (16, y0, zl0),  # sv
        (24, y0, zl0),  # sf (3-slot ring: read up to lag len(chain)+1)
        (16, y0, zl0),  # outst
    ]
    if has_nv:
        plan.append((24, y0, zl0))  # snv (read at every stage, like f)
    plan.extend([(3, y0, zl0)] * n_gen)  # generation rings
    plan.append((3, y0, zl0))  # rres
    plan.append((3, y0, zl0))  # pring (per-coarse-plane prolongation cache)
    if has_rv:
        plan.append((3, yc0, zlc0))  # vr3c (restricted-v ring: tau fold)
    plan.append((16, yc0, zlc0))  # sc
    plan.append((16, yc0, zlc0))  # cst
    if has_rv:
        plan.append((16, yc0, zlc0))  # sc2
        plan.append((16, yc0, zlc0))  # cst2
    plan.extend([(_TINY_AX, yt0, zlt0)] * 3)  # tv, tf, tc
    if has_nv or has_rv:
        plan.append((_TINY_AX, yt0, zlt0))  # tnv
    return plan


def _scratch_bytes(params: GridParams) -> int:
    dims = params.level_dims()
    shapes = [alloc_shape(d) for d in dims]
    zls = [z_live(dims[l], shapes[l]) for l in range(len(dims))]
    itemsize = 4
    plan = _plan_scratch(
        dims, shapes, zls, params.mode,
        params.pre_smoothing, params.post_smoothing, itemsize,
    )
    return sum(a * b * c for (a, b, c) in plan) * itemsize


def unsupported_reason(params: GridParams):
    """None when the wavefront mega-kernel can run this configuration, else
    a human-readable gate description (surfaced by the CLI's fast-path
    notes / --explain-backend)."""
    _apply_tuning()
    if params.mode not in (Mode.LINEAR, Mode.NEWTON, Mode.NONLINEAR):
        return f"mode {params.mode} not implemented in the kernel"
    if params.pre_smoothing > 5 or params.post_smoothing > 5:
        return (
            f"pre/post smoothing {params.pre_smoothing}/"
            f"{params.post_smoothing} exceeds the per-leg sweep cap (5)"
        )
    if _cycle_pass_count(params) > _MAX_PASSES:
        return (
            f"cycle schedule needs {_cycle_pass_count(params)} passes "
            f"(> Mosaic program-size cap {_MAX_PASSES})"
        )
    dims = params.level_dims()
    shapes = [alloc_shape(d) for d in dims]
    # The coarsest level runs pre+post fused sweeps; the streamed-pass sweep
    # cap applies when it is too large to be VMEM-resident.
    if shapes[-1][0] > _TINY_AX and (
        params.pre_smoothing + params.post_smoothing > 5
    ):
        return "coarsest level too large for its pre+post fused sweeps"
    for d, shape in zip(dims, shapes):
        # Streamed levels write interior x planes in 8-plane chunks from
        # offset 1; the last chunk must fit the allocation, which holds
        # exactly when nx % 8 is 7 or 0 (all 2^k-1 and 3*2^k grids).
        if shape[0] > _TINY_AX and d[0] % 8 not in (0, 7):
            return (
                f"level x-extent {d[0]} not 8-chunkable "
                "(use 2^k-1 or 3*2^k grid dims)"
            )
    # Leave headroom under the Mosaic VMEM budget for the compiler's own
    # temporaries (matmul staging etc.).
    if _scratch_bytes(params) > _VMEM_LIMIT - 8 * 1024 * 1024:
        return "kernel scratch exceeds the VMEM budget"
    return None


def supported(params: GridParams) -> bool:
    return unsupported_reason(params) is None


@functools.lru_cache(maxsize=None)
def _vcycle2_call(key, dims_key, dtype_name, maxk: int, interpret: bool,
                  alloc0=None, zero_start: bool = False):
    """Build the wavefront mega-kernel.

    Field buffers update in place (``input_output_aliases``).  Scalar SMEM
    inputs: threshold (f32 sum-of-squares early-stop bound, negative
    disables) and n_cycles (int32 cycles to execute, <= maxk).  Extra output:
    a (maxk, 1) f32 vector of per-cycle residual sum-of-squares, -1 for
    cycles not executed.

    ``alloc0``: override the level-0 allocation shape (pod-tail entry: the
    pod engine hands its consolidation output directly to this kernel in
    pod layout, retiring the XLA crop/pad embed).  Must cover the standard
    allocation's x/y extents and the dense-z live extent; every level-0
    DMA already slices its live (y, z) window explicitly.

    ``zero_start``: the FIRST cycle's level-0 down pass starts from v = 0
    without reading the v input (the pod tail's entry v is always zero for
    LINEAR/NEWTON — reference down_step zeroes the coarse v,
    src/cpu/CpuSolver.cpp:104-107), so the caller may pass any dead
    correctly-shaped buffer and skip materialising zeros.  Cycle 0 is
    peeled out of the in-kernel loop; later cycles read the written v.
    """
    (stencil_values, stencil_offsets, mode, omega, gamma, pre, post,
     cycle_type) = key
    dims = dims_key
    taps = tuple(zip(stencil_values, stencil_offsets))
    dtype = jnp.dtype(dtype_name)
    nlev = len(dims)
    has_nv = mode == Mode.NEWTON
    has_rv = mode == Mode.NONLINEAR
    shapes = [alloc_shape(d) for d in dims]
    if alloc0 is not None:
        assert alloc0[0] >= shapes[0][0] and alloc0[1] >= shapes[0][1] \
            and alloc0[2] >= z_live(dims[0], shapes[0]), (alloc0, shapes[0])
        shapes[0] = tuple(alloc0)
    if zero_start:
        assert not has_rv, "FAS tail entry v is R(v), never zero"
    hs = [1.0 / (d[1] + 1) for d in dims]
    zls = [z_live(dims[l], shapes[l]) for l in range(nlev)]
    tiny = [shapes[l][0] <= _TINY_AX for l in range(nlev)]

    inv_h2 = [1.0 / (h * h) for h in hs]
    pre_fac = [stencil_values[0] * ih for ih in inv_h2]
    alpha = [(h * h) / stencil_values[0] for h in hs]

    # per-level field refs: v, f [, newton_v | rest_v]
    n_arr = 3 if (has_nv or has_rv) else 2

    y0, zl0 = shapes[0][1], zls[0]
    first_stream = next((l for l in range(nlev) if not tiny[l]), None)
    first_tiny = next((l for l in range(nlev) if tiny[l]), None)
    # Coarse-plane scratch extents: the largest restriction/prolongation
    # partner of a streamed pass is level first_stream+1.
    if first_stream is not None and first_stream + 1 < nlev:
        yc0, zlc0 = shapes[first_stream + 1][1], zls[first_stream + 1]
    else:
        yc0, zlc0 = 8, 128
    if first_tiny is not None:
        yt0, zlt0 = shapes[first_tiny][1], zls[first_tiny]
    else:
        yt0, zlt0 = 8, 128

    n_gen = _n_gen_rings(shapes, mode, pre, post)

    def kernel(*refs):
        thr_ref = refs[nlev * n_arr]
        ncyc_ref = refs[nlev * n_arr + 1]
        outs = refs[nlev * n_arr + 2 : 2 * nlev * n_arr + 2]
        norms_ref = refs[2 * nlev * n_arr + 2]
        scratch = list(refs[2 * nlev * n_arr + 3 :])

        sv = scratch.pop(0)      # (16, y0, zl0) v stream ring (2 slots)
        sf = scratch.pop(0)      # (24, y0, zl0) f stream ring (3 slots)
        outst = scratch.pop(0)   # (16, y0, zl0) out staging ring
        snv = scratch.pop(0) if has_nv else None  # (24,...) like sf
        gens = [scratch.pop(0) for _ in range(n_gen)]  # (3, y0, zl0) each
        rres = scratch.pop(0)    # (3, y0, zl0) residual ring
        pring = scratch.pop(0)   # (3, y0, zl0) prolonged-coarse-plane ring
        vr3c = scratch.pop(0) if has_rv else None  # (3, yc0, zlc0)
        sc = scratch.pop(0)      # (16, yc0, zlc0) coarse stream (prolong)
        cst = scratch.pop(0)     # (16, yc0, zlc0) restriction staging
        sc2 = scratch.pop(0) if has_rv else None
        cst2 = scratch.pop(0) if has_rv else None
        tv = scratch.pop(0)      # (TINY, yt0, zlt0) tiny-level v
        tf = scratch.pop(0)      # (TINY, yt0, zlt0) tiny-level f
        tc = scratch.pop(0)      # (TINY, yt0, zlt0) tiny coarse staging
        tnv = scratch.pop(0) if (has_nv or has_rv) else None
        acc = scratch.pop(0)     # SMEM (1, 2) int32: done flag
        sem = scratch.pop(0)     # DMA sems (8, 2)

        def buf(l, which):
            # which: 0 = v, 1 = f, 2 = newton_v/rest_v
            return outs[l * n_arr + which]

        def r16(q):
            # ring-of-16 index, safe for q >= -32 (lax.rem keeps the
            # dividend's sign, so bias before reducing)
            return ((q + 32) % 16)

        def r24(q):
            # ring-of-24 index (3 slabs of 8): plane q of slab s=q//8 sits
            # at (s%3)*8 + q%8 == q % 24
            return ((q + 48) % 24)

        def r3(q):
            return ((q + 33) % 3)

        def keep_mask(shape, ny, nz):
            yi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            zi = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            return (yi >= 1) & (yi <= ny) & (zi >= 1) & (zi <= nz)

        def stencil_acc(l, read_plane, init=None, sign=1.0):
            """``init + sign·A·v/h²`` for a plane: ``read_plane(dq) ->
            (yl, zl)`` returns the neighbour plane at x-offset dq.  Taps
            sharing a coefficient are summed before the multiply, and the
            coefficient multiply accumulates onto ``init`` (FMA form).  No
            wrap masking is needed: rolled-in wrap rows/columns land either
            in halo/pad positions (masked by ``keep`` on every write) or
            carry the opposite halo/pad value, which the zero-halo invariant
            keeps at 0 — in particular the dense-z layout's missing z=nz+1
            halo column wraps to the z=0 halo column, which is also its
            correct (zero) value."""
            groups = {}
            for val, off in taps:
                groups.setdefault(val * inv_h2[l], []).append(off)
            s = init
            for coeff, offs in groups.items():
                g = None
                for (ox, oy, oz) in offs:
                    term = read_plane(ox)
                    if oy:
                        term = _roll(term, -oy, 0)
                    if oz:
                        term = _roll(term, -oz, 1)
                    g = term if g is None else g + term
                term = (sign * coeff) * g
                s = term if s is None else s + term
            return s

        def jacobi_plane(l, center, rr_lin, nvi):
            """One damped-Jacobi plane update from the *linear* residual
            ``rr_lin = f - A·v/h²`` (reference :141-179; nonlinear :159-165
            tutorial formula 6.14; Newton :166-172)."""
            if mode == Mode.LINEAR:
                return center + (omega * alpha[l]) * rr_lin
            if mode == Mode.NONLINEAR:
                ex = jnp.exp(center)
                rr = rr_lin - gamma * center * ex
                denom = pre_fac[l] + gamma * (1.0 + center) * ex
                return center + omega * (rr / denom)
            ex = jnp.exp(nvi)
            lin = gamma * (1.0 + nvi) * ex
            rr = rr_lin - lin * center
            return center + omega * (rr / (pre_fac[l] + lin))

        def jacobi_zero_plane(l, fint, nvi):
            """First sweep from v=0 (down-leg coarse start, reference
            :100-101): the residual is just f."""
            if mode == Mode.LINEAR:
                return (omega * alpha[l]) * fint
            # NEWTON with v=0 (FAS never starts from zero)
            lin = gamma * (1.0 + nvi) * jnp.exp(nvi)
            return omega * (fint / (pre_fac[l] + lin))

        def residual_plane(l, rr_lin, center, nvi):
            """r = (f - A v) - mode term, from the accumulated linear part
            (reference :45-83)."""
            if has_nv:
                return rr_lin - gamma * (1.0 + nvi) * center * jnp.exp(nvi)
            if has_rv:
                return rr_lin - gamma * center * jnp.exp(center)
            return rr_lin

        def _dot3(a, w, transpose=False):
            """Transfer dot at f32-class precision in THREE MXU passes
            instead of HIGHEST's six (round 5).  The full-weighting /
            trilinear weights are dyadic (0.25/0.5/1.0) — EXACT in bf16 —
            and the plane operand splits into three bf16 terms carrying
            all 24 f32 mantissa bits (each residual subtraction is exact,
            each bf16×bf16 product is exact in f32), so accumulation
            precision matches HIGHEST's class.  The three passes ride ONE
            dot call via contraction-axis concatenation.  Measured on the
            511³ down-leg probe (scripts/probe_wavefront restrict_dotc3):
            4.8 → 3.96 ms/pass — in-kernel, isolated HIGHEST dots price
            per PASS, overturning the standalone pr_mm probe where call
            overhead dominated (PERF.md §6b/§9)."""
            hi = a.astype(jnp.bfloat16)
            r1 = a - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            wb = w.astype(jnp.bfloat16)
            ww = jnp.concatenate([wb] * 3, axis=0)
            if transpose:
                aa = jnp.concatenate([hi, mid, lo], axis=0)
                return jnp.dot(
                    ww.T, aa, preferred_element_type=jnp.float32
                )
            aa = jnp.concatenate([hi, mid, lo], axis=1)
            return jnp.dot(aa, ww, preferred_element_type=jnp.float32)

        fast_dots = jnp.dtype(dtype) == jnp.float32

        def restrict_yz(plane, wy, wz, ckeep, czero, valid):
            if fast_dots:
                out_c = _dot3(_dot3(plane, wz), wy, transpose=True)
            else:
                tmp = jnp.dot(
                    plane, wz, preferred_element_type=_acc_dt(dtype),
                    precision=jax.lax.Precision.HIGHEST,
                )
                out_c = jnp.dot(
                    wy.T, tmp.astype(dtype),
                    preferred_element_type=_acc_dt(dtype),
                    precision=jax.lax.Precision.HIGHEST,
                )
            return jnp.where(valid & ckeep, out_c.astype(dtype), czero)

        def prolong_yz(cplane, py, pz):
            if fast_dots:
                return _dot3(
                    _dot3(cplane, pz), py, transpose=True
                ).astype(dtype)
            tmp = jnp.dot(
                cplane, pz, preferred_element_type=_acc_dt(dtype),
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.dot(
                py.T, tmp.astype(dtype),
                preferred_element_type=_acc_dt(dtype),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)

        # ------------------------------------------------------------------
        # Streamed wavefront pass.
        # ------------------------------------------------------------------
        def stream_pass(l, src, chain, consumer, write_v=True):
            """One fused leg over level ``l``.

            src: 'hbm' (stream v as the lag-0 source) | 'zero' (v=0 start,
                 v not read).
            chain: tuple of stage kinds ('sweep' | 'corr', at most one
                 'corr'), executed at lags 1..len(chain).  Stage k reads
                 stage k-1's plane ring (the lag-0 source for k=1); the
                 last stage lands in the out staging ring.  'corr' adds the
                 interpolated level-l+1 correction (reference :240-290
                 fused with v+=e :130-132; FAS coarse operand v - restV
                 :121-125).
            consumer: None | 'restrict' (residual -> coarse f; FAS also
                 restricts v into coarse v/rest_v) | 'norm' (Kahan residual
                 sum-of-squares, returned).  Reads the out staging ring at
                 lag len(chain)+1.
            write_v: False skips the v write-back DMAs entirely — the
                 recompute schedule's down legs, whose pre-smoothed v the
                 up leg re-derives bit-identically from the untouched v/f
                 inputs, trading hidden recompute for a full volume of HBM
                 write+read traffic.
            """
            nx, ny, nz = dims[l]
            yl = shapes[l][1]
            zl = zls[l]
            L = len(chain)
            ci = (chain.index("corr") + 1) if "corr" in chain else None
            if consumer == "restrict":
                lag_max = L + 3  # residual lag L+1, +2 to finish the last
                #                  coarse chunk (m reaches cnx+1)
            elif consumer == "norm":
                lag_max = L + 1
            else:
                lag_max = L
            nsteps = nx + 2 + lag_max
            NSL = _cdiv(nx + 2, _TX)
            # Out chunks cover interior planes j = 1..NC*8; NC*8 <= nx+1
            # always (never past the x halo), and the trailing wavefront
            # steps reach q = NC*8 so every chunk's DMA start fires.
            NC = _cdiv(nx, _TX)
            # f (and newton_v) stream through 3-slot rings because their
            # planes are read up to lag_max steps behind the front: slab
            # s+1 overwrites slab s-2, whose last f read happens at in-slab
            # step lag_max-9, so the prefetch trigger must come after that
            # (v lives in a 2-slot ring — read only at lag <= 2).
            trig = max(2, lag_max - 7)
            vref = buf(l, 0)
            fref = buf(l, 1)
            nvref = buf(l, 2) if has_nv else None
            keep = keep_mask((yl, zl), ny, nz)
            zero_plane = jnp.zeros((yl, zl), dtype)
            stream_v = src == "hbm"

            if consumer == "restrict":
                lc = l + 1
                cnx, cny, cnz = dims[lc]
                cyl = shapes[lc][1]
                czl = zls[lc]
                NCC = _cdiv(cnx, _TX)  # coarse chunks cover m=1..NCC*8
                wy = _restrict_matrix(yl, cyl, cny, dtype)
                wz = _restrict_matrix(zl, czl, cnz, dtype)
                ckeep = keep_mask((cyl, czl), cny, cnz)
                czero = jnp.zeros((cyl, czl), dtype)
                c_tiny = tiny[lc]
            if ci is not None:
                lcp = l + 1
                pcnx = dims[lcp][0]
                pcyl = shapes[lcp][1]
                pczl = zls[lcp]
                NSC = _cdiv(pcnx + 2, _TX)
                py = _prolong_matrix(pcyl, yl, ny, dtype)
                pz = _prolong_matrix(pczl, zl, nz, dtype)
                cvref = buf(lcp, 0)
                rvref = buf(lcp, 2) if has_rv else None

            def in_cp(ref, dst, s, si, yy=yl, zz=zl, nslot=2):
                return pltpu.make_async_copy(
                    ref.at[pl.ds(s * _TX, _TX), :, :zz],
                    dst.at[pl.ds((s % nslot) * _TX, _TX), :yy, :zz],
                    sem.at[si, (s % nslot)],
                )

            def in_slabs(s, start):
                cps = [in_cp(fref, sf, s, 1, nslot=3)]
                if stream_v:
                    cps.append(in_cp(vref, sv, s, 0))
                if has_nv:
                    cps.append(in_cp(nvref, snv, s, 2, nslot=3))
                for cp in cps:
                    cp.start() if start else cp.wait()

            def coarse_slabs(s, start):
                cps = [in_cp(cvref, sc, s, 3, yy=pcyl, zz=pczl)]
                if has_rv:
                    cps.append(in_cp(rvref, sc2, s, 3, yy=pcyl, zz=pczl))
                for cp in cps:
                    cp.start() if start else cp.wait()

            def out_chunk(c, wait=False):
                cp = pltpu.make_async_copy(
                    outst.at[
                        pl.ds((c % 2) * _TX, _TX), :yl, :zl
                    ],
                    vref.at[pl.ds(c * _TX + 1, _TX), :, :zl],
                    sem.at[4, (c % 2)],
                )
                cp.wait() if wait else cp.start()

            def cst_chunks(c, wait=False):
                cps = [
                    pltpu.make_async_copy(
                        cst.at[
                            pl.ds((c % 2) * _TX, _TX),
                            :cyl, :czl,
                        ],
                        buf(lc, 1).at[pl.ds(c * _TX + 1, _TX), :, :czl],
                        sem.at[5, (c % 2)],
                    )
                ]
                if has_rv:
                    # FAS: R(v) lands in BOTH coarse v and coarse rest_v
                    # (reference :106-107).
                    for si, which in ((6, 0), (7, 2)):
                        cps.append(
                            pltpu.make_async_copy(
                                cst2.at[
                                    pl.ds((c % 2) * _TX, _TX),
                                    :cyl, :czl,
                                ],
                                buf(lc, which).at[
                                    pl.ds(c * _TX + 1, _TX), :, :czl
                                ],
                                sem.at[si, (c % 2)],
                            )
                        )
                for cp in cps:
                    cp.wait() if wait else cp.start()

            def sv_plane(q):
                return sv[r16(q), :yl, :zl]

            def sf_plane(q):
                return sf[r24(q), :yl, :zl]

            def snv_plane(q):
                return snv[r24(q), :yl, :zl]

            def out_plane(q):
                return outst[r16(q - 1), :yl, :zl]

            # --- prologue ----------------------------------------------------
            if consumer is not None:
                # The residual consumer reads out-staging plane j=0 (the x
                # halo, value 0) which the wavefront never writes; its slot
                # (15) is only reused by plane j=16, long after the last
                # j=0 read.
                outst[15, :yl, :zl] = jnp.zeros((yl, zl), dtype)
            if consumer == "restrict" and has_rv and not c_tiny:
                # Rv[0] is the coarse x halo (zero): the tau add for
                # mt=1 reads it from ring slot r3(0)=0.
                vr3c[0, :cyl, :czl] = jnp.zeros((cyl, czl), dtype)
            in_slabs(jnp.int32(0), True)
            if ci is not None:
                coarse_slabs(jnp.int32(0), True)
                coarse_slabs(jnp.int32(0), False)
                if NSC > 1:
                    coarse_slabs(jnp.int32(1), True)
                # P[0] is the prolonged coarse x-halo plane: zero (the
                # in-step rule only computes P[m] for m >= 1).
                pring[0, :yl, :zl] = jnp.zeros((yl, zl), dtype)

            def body(p, carry):
                s = (p // _TX)
                pos = (p % _TX)

                @pl.when((pos == 0) & (s < NSL))
                def _():
                    in_slabs(s, False)

                @pl.when((pos == trig) & (s + 1 < NSL))
                def _():
                    in_slabs(s + 1, True)

                if ci is not None:
                    # Coarse-stream pacing follows the corr stage's plane
                    # index pc = p - ci (the conditions below are the lag-0
                    # originals with p -> pc; negative pc early steps are
                    # excluded by the >= guards under floor div/mod).
                    pc = p - ci

                    @pl.when(
                        (((pc + 2) % 16) == 0)
                        & ((pc + 2) // 16 >= 1)
                        & ((pc + 2) // 16 < NSC)
                    )
                    def _():
                        coarse_slabs((pc + 2) // 16, False)

                    # Start coarse slab c = pc//16 + 1 once its slot's
                    # previous occupant (slab c-2) is dead (last read at
                    # pc = 16(c-1)-1); slabs 0 and 1 load in the prologue.
                    @pl.when(
                        ((pc % 16) == 4) & (pc // 16 >= 1)
                        & (pc // 16 + 1 < NSC)
                    )
                    def _():
                        coarse_slabs(pc // 16 + 1, True)

                def stage_store(k, q, val, is_last):
                    if is_last:
                        outst[r16(q - 1), :yl, :zl] = val
                    else:
                        gens[k - 1][r3(q), :yl, :zl] = val

                # --- stage chain ------------------------------------------
                for k, kind in enumerate(chain, start=1):
                    q = p - k
                    is_last = k == L

                    if is_last and write_v:
                        # Wait for the chunk DMA two chunks back before its
                        # staging slot is overwritten.  The `< NC` bound
                        # keeps trailing wavefront steps (q past the last
                        # chunk) from re-waiting chunks the epilogue
                        # drains — each chunk must be waited exactly once.
                        @pl.when(
                            (q >= 1)
                            & (((q - 1) % _TX) == 0)
                            & ((q - 1) // _TX >= 2)
                            & ((q - 1) // _TX < NC)
                        )
                        def _():
                            out_chunk((q - 1) // _TX - 2, wait=True)

                    if kind == "corr":
                        # Interpolated coarse correction added onto the
                        # previous stage's plane (reference :240-290 fused
                        # with v+=e :130-132).  The y/z interpolation runs
                        # once per COARSE plane (the prolongation is
                        # linear: 0.5·(P(Cₐ)+P(C_b)) = P(0.5·(Cₐ+C_b))),
                        # cached in ``pring`` — halving the MXU dot count
                        # vs the old per-fine-plane form, which dominated
                        # the up leg's device time (round-4 per-pass
                        # breakdown: up L0 7.4 ms vs down L0 4.4 at 511³).
                        # x-interpolation stays per fine plane: even q
                        # reads P[q/2] twice (exact), odd averages the
                        # two cached neighbours.
                        @pl.when(
                            (q >= 1) & (q <= nx) & ((q % 2) == 1)
                        )
                        def _(q=q):
                            m = (q + 1) // 2
                            cm = sc[r16(m), :pcyl, :pczl]
                            if has_rv:
                                cm = cm - sc2[r16(m), :pcyl, :pczl]
                            pring[r3(m), :yl, :zl] = prolong_yz(
                                cm, py, pz
                            )

                        @pl.when((q >= 1) & (q <= nx))
                        def _(k=k, q=q, is_last=is_last):
                            pa = pring[r3(q // 2), :yl, :zl]
                            pb = pring[r3((q + 1) // 2), :yl, :zl]
                            e_q = 0.5 * (pa + pb)
                            if k == 1:
                                base = sv_plane(q) if stream_v else None
                            else:
                                base = gens[k - 2][r3(q), :yl, :zl]
                            val = e_q if base is None else base + e_q
                            stage_store(
                                k, q, jnp.where(keep, val, zero_plane),
                                is_last,
                            )
                    else:
                        @pl.when((q >= 1) & (q <= nx))
                        def _(k=k, q=q, is_last=is_last):
                            fint = sf_plane(q)
                            nvi = snv_plane(q) if has_nv else None
                            if k == 1 and src == "zero":
                                val = jacobi_zero_plane(l, fint, nvi)
                            else:
                                if k == 1:
                                    rp = lambda dq: sv_plane(q + dq)
                                else:
                                    ring = gens[k - 2]
                                    rp = lambda dq: ring[
                                        r3(q + dq), :yl, :zl
                                    ]
                                rr_lin = stencil_acc(
                                    l, rp, init=fint, sign=-1.0
                                )
                                val = jacobi_plane(l, rp(0), rr_lin, nvi)
                            stage_store(
                                k, q, jnp.where(keep, val, zero_plane),
                                is_last,
                            )

                    if is_last:
                        # Halo/pad planes of the out staging must be zero
                        # (they are written back to HBM, and the consumer
                        # reads the +x halo plane).
                        @pl.when((q > nx) & (q >= 1) & (q <= NC * _TX))
                        def _(q=q):
                            outst[r16(q - 1), :yl, :zl] = zero_plane

                        if nx % _TX == 0 and consumer is not None:
                            # Chunk coverage stops at plane nx: stage the
                            # x-halo plane's zero for the consumer's +x
                            # stencil reads.
                            @pl.when(q == nx + 1)
                            def _(q=q):
                                outst[r16(q - 1), :yl, :zl] = zero_plane

                        if write_v:
                            @pl.when(
                                (q >= 1)
                                & (((q - 1) % _TX) == _TX - 1)
                                & (q <= NC * _TX)
                            )
                            def _(q=q):
                                out_chunk((q - 1) // _TX)
                    else:
                        @pl.when((q == 0) | (q == nx + 1))
                        def _(k=k, q=q):
                            gens[k - 1][r3(q), :yl, :zl] = zero_plane

                # --- consumer --------------------------------------------
                if consumer == "norm":
                    q = p - L - 1
                    total, comp = carry
                    cond = (q >= 1) & (q <= nx)
                    rr_lin = stencil_acc(
                        l, lambda dq: out_plane(q + dq),
                        init=sf_plane(q), sign=-1.0,
                    )
                    nvi = snv_plane(q) if has_nv else None
                    rr = residual_plane(l, rr_lin, out_plane(q), nvi)
                    rr = jnp.where(keep & cond, rr, zero_plane)
                    part = jnp.sum(rr.astype(jnp.float32) ** 2)
                    # Kahan-compensated plane-sum chain (SURVEY §7's
                    # compensated-f32 norm mitigation).
                    y = part - comp
                    tt = total + y
                    comp = (tt - total) - y
                    carry = (tt, comp)
                elif consumer == "restrict":
                    q = p - L - 1

                    @pl.when((q >= 1) & (q <= nx))
                    def _():
                        rr_lin = stencil_acc(
                            l, lambda dq: out_plane(q + dq),
                            init=sf_plane(q), sign=-1.0,
                        )
                        nvi = snv_plane(q) if has_nv else None
                        rr = residual_plane(l, rr_lin, out_plane(q), nvi)
                        rres[r3(q), :yl, :zl] = jnp.where(
                            keep, rr, zero_plane
                        )

                    # Coarse plane m completes when r[2m+1] lands.
                    m = ((q - 1) // 2)
                    m_ready = (
                        (((q + 32) % 2) == 1) & (m >= 1)
                        & (m <= NCC * _TX)
                    )
                    if not c_tiny:
                        @pl.when(
                            m_ready & (((m - 1) % _TX) == 0)
                            & ((m - 1) // _TX >= 2)
                        )
                        def _():
                            cst_chunks((m - 1) // _TX - 2, wait=True)

                    @pl.when(m_ready)
                    def _():
                        # fine plane 2m+1 may be the x halo (even nx) or
                        # beyond (the staged coarse halo plane m=cnx+1):
                        # those planes read as zero.
                        top_r = jnp.where(
                            2 * m + 1 > nx, zero_plane,
                            rres[r3(2 * m + 1), :yl, :zl],
                        )
                        mid_r = jnp.where(
                            2 * m > nx, zero_plane,
                            rres[r3(2 * m), :yl, :zl],
                        )
                        sx_c = (
                            0.25 * rres[r3(2 * m - 1), :yl, :zl]
                            + 0.5 * mid_r + 0.25 * top_r
                        )
                        out_c = restrict_yz(
                            sx_c, wy, wz, ckeep, czero, m <= cnx
                        )
                        if not c_tiny:
                            cst[r16(m - 1), :cyl, :czl] = out_c
                        else:
                            # Direct index (tiny cnx <= 14, m <=
                            # NCC*_TX <= 16): a mod-8 wrap here would
                            # clobber planes 1..7 once cnx >= 9
                            # (integer-halved dims, e.g. 19³ -> cnx 9).
                            tc[m - 1, :cyl, :czl] = out_c
                        if has_rv:
                            # FAS also restricts the pre-smoothed v from
                            # the out staging (reference :106-107).
                            top_v = jnp.where(
                                2 * m + 1 > nx, zero_plane,
                                out_plane(2 * m + 1),
                            )
                            mid_v = jnp.where(
                                2 * m > nx, zero_plane,
                                out_plane(2 * m),
                            )
                            vx_c = (
                                0.25 * out_plane(2 * m - 1)
                                + 0.5 * mid_v + 0.25 * top_v
                            )
                            vout_c = restrict_yz(
                                vx_c, wy, wz, ckeep, czero, m <= cnx
                            )
                            if not c_tiny:
                                cst2[r16(m - 1), :cyl, :czl] = vout_c
                                vr3c[r3(m), :cyl, :czl] = vout_c
                            else:
                                # Restricted v stages in tnv (allocated
                                # whenever has_rv): tc's upper half only
                                # fits cnx <= 7.
                                tnv[m - 1, :cyl, :czl] = vout_c

                    if has_rv and not c_tiny:
                        # FAS tau fold (reference :110-112): the coarse
                        # RHS leaves this pass COMPLETE —
                        # f_c += A²ʰ(Rv)/h_c² + γ·Rv·e^{Rv} is applied to
                        # the staged plane mt = m-1 once its +x
                        # neighbour Rv[m] lands in the 3-slot ring
                        # (vr3c[0] holds the zero coarse halo, set in the
                        # prologue), replacing the separate fas_fixup
                        # streaming pass per down leg.  Gated WITHOUT the
                        # m <= NCC*_TX chunk bound: when cnx % 8 == 0
                        # (integer-halved dims, e.g. 33³ -> cnx 16) the
                        # last fold step m = cnx+1 exceeds it, and the
                        # Rv[cnx+1] ring slot is never written then — the
                        # +x tap is masked to the zero coarse halo
                        # instead of read.
                        fold_ready = (
                            (((q + 32) % 2) == 1)
                            & (m >= 2) & (m <= cnx + 1)
                        )

                        @pl.when(fold_ready)
                        def _():
                            mt = m - 1

                            def rpv(dq):
                                val = vr3c[r3(mt + dq), :cyl, :czl]
                                if dq > 0:
                                    val = jnp.where(
                                        mt + dq > cnx, czero, val
                                    )
                                return val

                            tau = stencil_acc(lc, rpv) + (
                                gamma * rpv(0) * jnp.exp(rpv(0))
                            )
                            add = jnp.where(
                                ckeep & (mt <= cnx), tau, czero
                            )
                            cst[r16(mt - 1), :cyl, :czl] = (
                                cst[r16(mt - 1), :cyl, :czl] + add
                            )

                    if not c_tiny:
                        if has_rv:
                            # Chunk c may ship only after the tau add to
                            # its last plane (m = 8c+8), which happens
                            # when Rv[8c+9] lands — one m later than the
                            # plain schedule.  The final chunk therefore
                            # starts in the epilogue (m never reaches
                            # 8·NCC+1).
                            @pl.when(
                                m_ready & (((m - 9) % _TX) == 0)
                                & (m >= 9)
                            )
                            def _():
                                cst_chunks((m - 9) // _TX)
                        else:
                            @pl.when(
                                m_ready
                                & (((m - 1) % _TX) == _TX - 1)
                            )
                            def _():
                                cst_chunks((m - 1) // _TX)

                return carry

            carry = jax.lax.fori_loop(
                0, nsteps, body, (jnp.float32(0.0), jnp.float32(0.0))
            )

            # --- epilogue: drain outstanding DMAs ---------------------------
            if write_v:
                for back in (2, 1):
                    if NC - back >= 0:
                        out_chunk(jnp.int32(NC - back), wait=True)
            if consumer == "restrict":
                if not c_tiny:
                    if has_rv:
                        # Delayed-start schedule (tau fold): the final
                        # chunk never starts in-loop — start it here,
                        # after its last tau add (the loop's final m).
                        cst_chunks(jnp.int32(NCC - 1))
                    for back in (2, 1):
                        if NCC - back >= 0:
                            cst_chunks(jnp.int32(NCC - back), wait=True)
                else:
                    # Tiny coarse target: f staged in tc planes 0..cnx,
                    # FAS v in tnv planes 0..cnx; one whole-extent DMA
                    # each.  The staged +x halo plane (index cnx) gets
                    # its masked-zero write at m = cnx+1, which m_ready
                    # gates out when cnx % 8 == 0 (m caps at NCC*_TX =
                    # cnx) — zero it explicitly; the DMA ships planes
                    # 0..cnx including the halo.
                    tc[cnx, :cyl, :czl] = czero
                    if has_rv:
                        tnv[cnx, :cyl, :czl] = czero
                        # FAS tau fold, resident form: every restricted-v
                        # plane sits in tnv[0..cnx-1], so finish the
                        # coarse RHS in place before the DMA.
                        for mt in range(1, cnx + 1):
                            def rpv(dq, mt=mt):
                                j = mt + dq
                                if j < 1 or j > cnx:
                                    return czero
                                return tnv[j - 1, :cyl, :czl]

                            tau = stencil_acc(lc, rpv) + (
                                gamma * rpv(0) * jnp.exp(rpv(0))
                            )
                            tc[mt - 1, :cyl, :czl] = (
                                tc[mt - 1, :cyl, :czl]
                                + jnp.where(ckeep, tau, czero)
                            )
                    ncst = cnx + 1
                    cps = [
                        pltpu.make_async_copy(
                            tc.at[pl.ds(0, ncst), :cyl, :czl],
                            buf(lc, 1).at[pl.ds(1, ncst), :, :czl],
                            sem.at[5, 0],
                        )
                    ]
                    if has_rv:
                        for si, which in ((6, 0), (7, 2)):
                            cps.append(
                                pltpu.make_async_copy(
                                    tnv.at[pl.ds(0, ncst), :cyl, :czl],
                                    buf(lc, which).at[
                                        pl.ds(1, ncst), :, :czl
                                    ],
                                    sem.at[si, 0],
                                )
                            )
                    for cp in cps:
                        cp.start()
                    for cp in cps:
                        cp.wait()

            if consumer == "norm":
                return carry[0]
            return None

        # ------------------------------------------------------------------
        # Tiny resident pass (alloc x-extent <= 16): the whole level lives
        # in VMEM, all plane indices static, loops fully unrolled.
        # ------------------------------------------------------------------
        def resident_pass(l, src, chain, consumer, write_v=True):
            nx, ny, nz = dims[l]
            ax = shapes[l][0]
            yl = shapes[l][1]
            zl = zls[l]
            has_corr = "corr" in chain
            keep = keep_mask((yl, zl), ny, nz)
            zero_plane = jnp.zeros((yl, zl), dtype)
            vref, fref = buf(l, 0), buf(l, 1)
            nvref = buf(l, 2) if has_nv else None
            stream_v = src == "hbm"

            def load(ref, dst, si, n=ax, yy=yl, zz=zl):
                return pltpu.make_async_copy(
                    ref.at[pl.ds(0, n), :, :zz],
                    dst.at[pl.ds(0, n), :yy, :zz],
                    sem.at[si, 0],
                )

            cps = [load(fref, tf, 1)]
            if stream_v:
                cps.append(load(vref, tv, 0))
            if has_nv:
                cps.append(load(nvref, tnv, 2))
            if has_corr:
                lcp = l + 1
                pcax = shapes[lcp][0]
                pcyl = shapes[lcp][1]
                pczl = zls[lcp]
                cps.append(
                    load(buf(lcp, 0), tc, 3, n=pcax, yy=pcyl, zz=pczl)
                )
                if has_rv:
                    cps.append(
                        load(buf(lcp, 2), tnv, 6, n=pcax, yy=pcyl,
                             zz=pczl)
                    )
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

            def fpl(j):
                return tf[j, :yl, :zl]

            def nvpl(j):
                return tnv[j, :yl, :zl] if has_nv else None

            def st_rr(planes, j):
                # f - A·v/h² at plane j (FMA-accumulated)
                return stencil_acc(
                    l, lambda dq: planes[j + dq], init=fpl(j), sign=-1.0
                )

            # Lag-0 source.
            if stream_v:
                cur = [tv[j, :yl, :zl] for j in range(nx + 2)]
            else:
                cur = None

            for k, kind in enumerate(chain, start=1):
                if kind == "corr":
                    py = _prolong_matrix(pcyl, yl, ny, dtype)
                    pz = _prolong_matrix(pczl, zl, nz, dtype)
                    nxt = [zero_plane]
                    for q in range(1, nx + 1):
                        ca = tc[q // 2, :pcyl, :pczl]
                        cb = tc[(q + 1) // 2, :pcyl, :pczl]
                        if has_rv:
                            ca = ca - tnv[q // 2, :pcyl, :pczl]
                            cb = cb - tnv[(q + 1) // 2, :pcyl, :pczl]
                        e_q = prolong_yz(0.5 * (ca + cb), py, pz)
                        val = e_q if cur is None else cur[q] + e_q
                        nxt.append(jnp.where(keep, val, zero_plane))
                    nxt.append(zero_plane)
                    cur = nxt
                else:
                    nxt = [zero_plane]
                    for j in range(1, nx + 1):
                        if k == 1 and src == "zero":
                            val = jacobi_zero_plane(l, fpl(j), nvpl(j))
                        else:
                            rr_lin = st_rr(cur, j)
                            val = jacobi_plane(l, cur[j], rr_lin, nvpl(j))
                        nxt.append(jnp.where(keep, val, zero_plane))
                    nxt.append(zero_plane)
                    cur = nxt

            cp_out = None
            if write_v:
                # Write back v.  When v was never loaded (src='zero'), zero
                # the halo/pad planes so the write-back keeps the HBM
                # invariant (cells outside the interior stay zero).
                for j in range(1, nx + 1):
                    tv[j, :yl, :zl] = cur[j]
                if not stream_v:
                    tv[0, :yl, :zl] = zero_plane
                    for j in range(nx + 1, ax):
                        tv[j, :yl, :zl] = zero_plane
                cp_out = pltpu.make_async_copy(
                    tv.at[pl.ds(0, ax), :yl, :zl],
                    vref.at[pl.ds(0, ax), :, :zl],
                    sem.at[4, 0],
                )
                cp_out.start()

            result = None
            if consumer == "restrict":
                lc = l + 1
                cnx, cny, cnz = dims[lc]
                cyl = shapes[lc][1]
                czl = zls[lc]
                wy = _restrict_matrix(yl, cyl, cny, dtype)
                wz = _restrict_matrix(zl, czl, cnz, dtype)
                ckeep = keep_mask((cyl, czl), cny, cnz)
                czero = jnp.zeros((cyl, czl), dtype)
                rpl = [zero_plane]
                for j in range(1, nx + 1):
                    rr_lin = st_rr(cur, j)
                    rr = residual_plane(l, rr_lin, cur[j], nvpl(j))
                    rpl.append(jnp.where(keep, rr, zero_plane))
                rpl.append(zero_plane)

                def restr(planes, m):
                    sx_c = (
                        0.25 * planes[2 * m - 1]
                        + 0.5 * planes[2 * m]
                        + 0.25 * planes[2 * m + 1]
                    )
                    return restrict_yz(sx_c, wy, wz, ckeep, czero, True)

                if has_rv:
                    # R(v) values, shared by the coarse v / rest_v
                    # writes and the tau fold below.
                    vout = [
                        restr(cur, mm) if 1 <= mm <= cnx else czero
                        for mm in range(cnx + 2)
                    ]
                sources = [(rpl, 1, 5)]
                if has_rv:
                    # R(v) into coarse v and rest_v (reference :106-107).
                    sources.extend([(cur, 0, 6), (cur, 2, 7)])
                for planes, which, si in sources:
                    for mm in range(shapes[lc][0]):
                        if planes is cur and has_rv:
                            val = vout[mm] if mm < len(vout) else czero
                        else:
                            val = restr(planes, mm) if 1 <= mm <= cnx \
                                else czero
                        if which == 1 and has_rv and 1 <= mm <= cnx:
                            # FAS tau fold (reference :110-112): finish
                            # the coarse RHS in place —
                            # f_c += A²ʰ(Rv)/h_c² + γ·Rv·e^{Rv} —
                            # instead of a separate fas_fixup pass.
                            tau = stencil_acc(
                                lc, lambda dq, mm=mm: vout[mm + dq]
                            ) + gamma * vout[mm] * jnp.exp(vout[mm])
                            val = val + jnp.where(ckeep, tau, czero)
                        tc[mm, :cyl, :czl] = val
                    cpc = pltpu.make_async_copy(
                        tc.at[pl.ds(0, shapes[lc][0]), :cyl, :czl],
                        buf(lc, which).at[
                            pl.ds(0, shapes[lc][0]), :, :czl
                        ],
                        sem.at[si, 0],
                    )
                    cpc.start()
                    cpc.wait()
            elif consumer == "norm":
                total = jnp.float32(0.0)
                comp = jnp.float32(0.0)
                for j in range(1, nx + 1):
                    rr_lin = st_rr(cur, j)
                    rr = residual_plane(l, rr_lin, cur[j], nvpl(j))
                    rr = jnp.where(keep, rr, zero_plane)
                    part = jnp.sum(rr.astype(jnp.float32) ** 2)
                    y = part - comp
                    tt = total + y
                    comp = (tt - total) - y
                    total = tt
                result = total

            if cp_out is not None:
                cp_out.wait()
            return result

        # ------------------------------------------------------------------
        # One V-cycle (reference :85-139).
        # ------------------------------------------------------------------
        def one_cycle(l0_zero=False):
            np_done = 0
            # Schedule choice.  The chain machinery supports a
            # traffic-minimal "recompute" schedule for LINEAR/NEWTON: down
            # legs skip the v write-back and the up leg re-derives the
            # pre-smoothed v bit-identically (same zero/HBM start, same f,
            # same op order) before adding the prolonged correction —
            # 3.19 vs 4.0 GB streamed per 511³ cycle.  Measured on v5e it
            # LOSES: the extra recomputed sweeps make the up legs
            # VPU-bound (full recompute 19.7 ms, mid-level-only 17.7 ms vs
            # 17.1 ms write-back at 511³; the chip's Pallas-reachable DMA
            # aggregate is ~250 GB/s, low enough that write-back stays
            # DMA-bound but cheap enough to beat the recompute's VPU
            # cost).  Flip _RECOMPUTE_FROM_LEVEL (0 = all levels, 1 = mid
            # levels only) on parts with faster HBM-per-FLOP.  FAS always
            # writes back: its down leg must materialise v (restricted
            # into the coarse v / rest_v).
            def rec(l):
                return (
                    not has_rv
                    and _RECOMPUTE_FROM_LEVEL is not None
                    and l >= _RECOMPUTE_FROM_LEVEL
                )

            def more():
                nonlocal np_done
                np_done += 1
                return _DEBUG_MAX_PASSES is None or \
                    np_done <= _DEBUG_MAX_PASSES

            subcycles = {"V": ("V",), "W": ("W", "W"), "F": ("F", "V")}

            def cyc(l, kind, first_visit):
                """One cycle rooted at level l (W/F: repeat coarse visits
                continue from the previous visit's v, so their passes read
                v from HBM instead of the zero start)."""
                pass_fn = resident_pass if tiny[l] else stream_pass
                fresh = first_visit and not has_rv
                # zero_start (pod tail): the peeled first cycle's level-0
                # down pass never reads the v input — it is zero by the
                # engine contract.  Forces write-back (the up leg and any
                # recompute re-derivation read the written v).
                zs0 = l == 0 and l0_zero
                if l == nlev - 1:
                    if not more():
                        return None
                    pass_fn(
                        l, "zero" if (fresh or zs0) else "hbm",
                        ("sweep",) * (pre + post), None,
                    )
                    return None
                r_l = rec(l) and not zs0
                src = "hbm" if (l == 0 and not zs0) or not fresh \
                    else "zero"
                if zs0:
                    src = "zero"
                if not more():
                    return None
                # FAS: the tau correction is folded into the restrict
                # consumer (reference :110-112) — the coarse RHS leaves
                # this pass complete; no separate fixup pass.
                pass_fn(
                    l, src, ("sweep",) * pre, "restrict",
                    write_v=not r_l,
                )
                for si, sub in enumerate(subcycles[kind]):
                    cyc(l + 1, sub, first_visit=(si == 0))
                if r_l:
                    chain = ("sweep",) * pre + ("corr",) + \
                        ("sweep",) * post
                    # mid first visits re-derive the pre-smoothed v from
                    # the down leg's zero start; the finest level's (and
                    # any repeat visit's) v must stream from HBM
                    src_up = "hbm" if (l == 0 or not fresh) else "zero"
                else:
                    chain = ("corr",) + ("sweep",) * post
                    src_up = "hbm"
                if not more():
                    return None
                return pass_fn(
                    l, src_up, chain, "norm" if l == 0 else None
                )

            sumsq = cyc(0, cycle_type, True)
            if sumsq is None:
                sumsq = jnp.float32(0.0)
            return sumsq

        acc[0, 0] = jnp.int32(0)  # done flag

        def cycle_body(i, _):
            run = (i < ncyc_ref[0, 0]) & (acc[0, 0] == 0)

            @pl.when(run)
            def _():
                sumsq = one_cycle()
                norms_ref[i, 0] = sumsq
                thr = thr_ref[0, 0]

                @pl.when((thr >= 0.0) & (sumsq <= thr))
                def _():
                    acc[0, 0] = jnp.int32(1)

            @pl.when(jnp.logical_not(run))
            def _():
                norms_ref[i, 0] = jnp.float32(-1.0)

            return 0

        first = 0
        if zero_start:
            # Peel cycle 0: its level-0 down pass must not read the v
            # input.  With maxk == 1 (the pod engine's V-cycle tail) the
            # loop below is skipped entirely — no code duplication.
            first = 1
            run0 = jnp.int32(0) < ncyc_ref[0, 0]

            @pl.when(run0)
            def _():
                sumsq = one_cycle(l0_zero=True)
                norms_ref[0, 0] = sumsq
                thr = thr_ref[0, 0]

                @pl.when((thr >= 0.0) & (sumsq <= thr))
                def _():
                    acc[0, 0] = jnp.int32(1)

            @pl.when(jnp.logical_not(run0))
            def _():
                norms_ref[0, 0] = jnp.float32(-1.0)

        if first < maxk:
            jax.lax.fori_loop(first, maxk, cycle_body, 0)

    # ---- call signature --------------------------------------------------
    n_in = nlev * n_arr
    scratch = [
        pltpu.VMEM(shape, dtype)
        for shape in _plan_scratch(dims, shapes, zls, mode, pre, post, 4)
    ]
    scratch.append(pltpu.SMEM((1, 2), jnp.int32))          # acc
    scratch.append(pltpu.SemaphoreType.DMA((8, 3)))

    out_shapes = []
    out_specs = []
    for l in range(nlev):
        for _ in range(n_arr):
            out_shapes.append(jax.ShapeDtypeStruct(shapes[l], dtype))
            out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    out_shapes.append(jax.ShapeDtypeStruct((maxk, 1), jnp.float32))
    out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * n_in
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # threshold
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # n_cycles

    call = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        input_output_aliases={i: i for i in range(n_in)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    return call


def vcycle2_fused(
    state_levels,
    params: GridParams,
    max_cycles: int = 1,
    n_cycles=None,
    threshold_sq=None,
    interpret: bool = False,
):
    """Run up to ``max_cycles`` V-cycles in one launch.

    Returns ``(fields, norms_sq)``: per-level (v, f [, newton_v|rest_v])
    tuples (updated in place via aliasing) and the (max_cycles,) f32 vector
    of per-cycle residual sum-of-squares (−1 marks cycles skipped by the
    in-kernel early stop ``sumsq <= threshold_sq``).
    """
    key = (
        params.stencil.values,
        params.stencil.offsets,
        params.mode,
        params.omega,
        params.gamma,
        params.pre_smoothing,
        params.post_smoothing,
        params.cycle_type,
    )
    dims_key = params.level_dims()
    dtype_name = state_levels[0].v.dtype.name
    call = _vcycle2_call(key, dims_key, dtype_name, max_cycles, interpret)

    has_nv = params.mode == Mode.NEWTON
    has_rv = params.mode == Mode.NONLINEAR
    args = []
    for lvl in state_levels:
        args.extend([lvl.v, lvl.f])
        if has_nv:
            args.append(lvl.newton_v)
        elif has_rv:
            args.append(lvl.rest_v)
    thr = jnp.full(
        (1, 1), -1.0 if threshold_sq is None else threshold_sq, jnp.float32
    )
    ncyc = jnp.full(
        (1, 1), max_cycles if n_cycles is None else n_cycles, jnp.int32
    )
    outs = call(*args, thr, ncyc)
    n_arr = 3 if (has_nv or has_rv) else 2
    norms = outs[-1][:, 0]
    fields = []
    for l in range(len(state_levels)):
        o = outs[l * n_arr : (l + 1) * n_arr]
        fields.append(tuple(o))
    return fields, norms


def batch_call(args, params: GridParams, maxk: int, ncyc, thr,
               interpret: bool = False, alloc0=None,
               zero_start: bool = False):
    """Flat-array kernel invocation for the solver's jitted/donated batch
    wrapper: ``args`` is the per-level (v, f [, newton_v|rest_v]) tuple,
    ``ncyc``/``thr`` are (1,1) int32/float32 arrays.  Returns the raw pallas
    outputs (aliased fields ..., norms (maxk,1)).

    ``alloc0``/``zero_start``: pod-tail entry knobs (see _vcycle2_call) —
    the level-0 arrays may arrive in pod layout, and a zero-start first
    cycle never reads the v input (pass a dead buffer)."""
    key = (
        params.stencil.values,
        params.stencil.offsets,
        params.mode,
        params.omega,
        params.gamma,
        params.pre_smoothing,
        params.post_smoothing,
        params.cycle_type,
    )
    call = _vcycle2_call(
        key, params.level_dims(), args[0].dtype.name, maxk, interpret,
        None if alloc0 is None else tuple(alloc0), zero_start,
    )
    return call(*args, thr, ncyc)
