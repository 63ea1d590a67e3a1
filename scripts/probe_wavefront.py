"""Wavefront pass overhead probe.

probe_vpu.py prices one LINEAR plane-stage at ~1.4 µs on this chip, which
predicts ~7.5 ms of VPU work per 511³ V-cycle — but the mega-kernel spends
~13.8 ms device time.  This probe isolates the difference: it runs ONE
down-leg-shaped streaming pass (v,f in via 8-plane slab rings, chain of 3
sweep stages + a norm consumer, v written back) in three variants:

  base      the mega-kernel's exact structure: per-plane fori_loop steps,
            dynamic ring indices, @pl.when DMA triggers
  unroll8   the same body with fori_loop over slabs and the 8 in-slab
            plane positions unrolled (static pos, static DMA triggers,
            ring indices static modulo the slab parity)
  compute0  base with the stencil work stubbed out (val = centre plane) —
            isolates DMA + bookkeeping floor

Round-5 restrict ladder (the down leg's consumer, PERF.md §9 — this is
the probe that found the transfer-dot discovery):

  restrict         + the kernel's restrict consumer (x-comb, two
                   Precision.HIGHEST dots per coarse plane, staged
                   chunk DMAs): 4.8-4.9 ms/pass — reproduces the real
                   down leg's cost over base
  restrict_nodot   dots replaced by a copy: 3.17 — the gap is the dots
  restrict_nodma   dots, no coarse DMAs: unchanged — not the DMAs
  restrict_burst8  16 dots back-to-back per chunk: WORSE — not call
                   overhead
  restrict_dot1    plain 1-pass bf16 dots: 3.37 — it's the PASSES
  restrict_dotc3   concat-split bf16x3 (3 exact passes, one call): 3.96
                   — the production fix (kernels ship this form)

ms/pass targets: VPU 4 stages x 511 planes x 1.4 µs = ~2.9 ms;
DMA 1.5 GB read+write at ~658 GB/s = ~2.3 ms (overlapped: max ~2.9).

Usage: python scripts/probe_wavefront.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX, NY, NZ = 511, 511, 511
AX = 520  # x alloc, rounded to the slab size (planes 0..519; pad > 512)
YL, ZL = 520, 512
TX = 8
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
L = 3  # sweep chain length (pre=3)


def _cdiv(a, b):
    return -(-a // b)


def _restrict_mat_k(fp, cp, cn):
    ff = jax.lax.broadcasted_iota(jnp.int32, (fp, cp), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (fp, cp), 1)
    d = ff - 2 * cc
    w = jnp.where(d == 0, 0.5, 0.0)
    w = jnp.where((d == -1) | (d == 1), 0.25, w)
    return jnp.where((cc >= 1) & (cc <= cn), w, 0.0).astype(jnp.float32)


def make_pass(variant: str, rk: int = 1):
    """``rk`` repeats the whole pass inside the kernel (static count): the
    per-launch tunnel overhead on this rig (~10 ms) swamps a single ~3 ms
    pass, so per-pass cost is measured as (t(rk_hi) - t(rk_lo)) / diff."""
    NSL = _cdiv(NX + 2, TX)   # input slabs
    NC = _cdiv(NX, TX)        # output chunks
    restrict = variant.startswith("restrict")
    lag_max = (L + 3) if restrict else (L + 1)
    nsteps = NX + 2 + lag_max
    trig = max(2, lag_max - 7)
    CNX = NX // 2             # coarse interior
    CYL, CZL = 264, 256
    NCC = _cdiv(CNX, TX)

    def kernel(v_ref, f_ref, ov_ref, co_ref, norm_ref,
               sv, sf, outst, g1, g2, rres, cst, vxb, sem):
        gens = [g1, g2]
        wz = _restrict_mat_k(ZL, CZL, CNX)
        wy = _restrict_mat_k(YL, CYL, CNX)
        cyi = jax.lax.broadcasted_iota(jnp.int32, (CYL, CZL), 0)
        czi = jax.lax.broadcasted_iota(jnp.int32, (CYL, CZL), 1)
        ckeep = (cyi >= 1) & (cyi <= CNX) & (czi >= 1) & (czi <= CNX)
        czero = jnp.zeros((CYL, CZL), jnp.float32)

        def cst_chunk(c, wait=False):
            cp = pltpu.make_async_copy(
                cst.at[pl.ds((c % 2) * TX, TX), :, :],
                co_ref.at[pl.ds(c * TX + 1, TX), :, :],
                sem.at[5, (c % 2)],
            )
            cp.wait() if wait else cp.start()

        def keep():
            yi = jax.lax.broadcasted_iota(jnp.int32, (YL, ZL), 0)
            zi = jax.lax.broadcasted_iota(jnp.int32, (YL, ZL), 1)
            return (yi >= 1) & (yi <= NY) & (zi >= 1) & (zi <= NZ)

        kp = keep()
        zero = jnp.zeros((YL, ZL), jnp.float32)

        def in_slabs(s, start):
            for ref, dst, si, nslot in ((v_ref, sv, 0, 2), (f_ref, sf, 1, 3)):
                cp = pltpu.make_async_copy(
                    ref.at[pl.ds(s * TX, TX), :, :],
                    dst.at[pl.ds((s % nslot) * TX, TX), :, :],
                    sem.at[si, (s % nslot)],
                )
                cp.start() if start else cp.wait()

        def out_chunk(c, wait=False):
            cp = pltpu.make_async_copy(
                outst.at[pl.ds((c % 2) * TX, TX), :, :],
                ov_ref.at[pl.ds(c * TX + 1, TX), :, :],
                sem.at[4, (c % 2)],
            )
            cp.wait() if wait else cp.start()

        def r16(q):
            return (q + 32) % 16

        def r24(q):
            return (q + 48) % 24

        def r3(q):
            return (q + 33) % 3

        def sweep(center, xm, xp, fint):
            if variant == "compute0":
                return center
            g = (
                xm + xp
                + pltpu.roll(center, 1, 0) + pltpu.roll(center, YL - 1, 0)
                + pltpu.roll(center, 1, 1) + pltpu.roll(center, ZL - 1, 1)
            )
            rr = fint + (-6.2) * center
            rr = rr + 1.04 * g
            val = center + 0.31 * rr
            return jnp.where(kp, val, zero)

        def body_step(p, carry, pos=None):
            """One wavefront step.  ``pos`` static (unroll8) or None."""
            s = p // TX
            ppos = p % TX if pos is None else pos

            if pos is None:
                @pl.when((ppos == 0) & (s < NSL))
                def _():
                    in_slabs(s, False)

                @pl.when((ppos == trig) & (s + 1 < NSL))
                def _():
                    in_slabs(s + 1, True)
            else:
                if pos == 0:
                    @pl.when(s < NSL)
                    def _():
                        in_slabs(s, False)
                if pos == trig:
                    @pl.when(s + 1 < NSL)
                    def _():
                        in_slabs(s + 1, True)

            def vpl(q):
                return sv[r16(q), :, :]

            def fpl(q):
                return sf[r24(q), :, :]

            def opl(q):
                return outst[r16(q - 1), :, :]

            for k in range(1, L + 1):
                q = p - k
                is_last = k == L
                if is_last:
                    @pl.when(
                        (q >= 1) & (((q - 1) % TX) == 0)
                        & ((q - 1) // TX >= 2) & ((q - 1) // TX < NC)
                    )
                    def _(q=q):
                        out_chunk((q - 1) // TX - 2, wait=True)

                @pl.when((q >= 1) & (q <= NX))
                def _(k=k, q=q, is_last=is_last):
                    if k == 1:
                        c, xm, xp = vpl(q), vpl(q - 1), vpl(q + 1)
                    else:
                        ring = gens[k - 2]
                        c = ring[r3(q), :, :]
                        xm = ring[r3(q - 1), :, :]
                        xp = ring[r3(q + 1), :, :]
                    val = sweep(c, xm, xp, fpl(q))
                    if is_last:
                        outst[r16(q - 1), :, :] = val
                    else:
                        gens[k - 1][r3(q), :, :] = val

                if is_last:
                    @pl.when((q > NX) & (q >= 1) & (q <= NC * TX))
                    def _(q=q):
                        outst[r16(q - 1), :, :] = zero

                    @pl.when(
                        (q >= 1) & (((q - 1) % TX) == TX - 1)
                        & (q <= NC * TX)
                    )
                    def _(q=q):
                        out_chunk((q - 1) // TX)
                else:
                    @pl.when((q == 0) | (q == NX + 1))
                    def _(k=k, q=q):
                        gens[k - 1][r3(q), :, :] = zero

            if restrict:
                # residual -> 3-plane ring -> 27-pt restriction: the real
                # kernel's down-leg consumer shape (x-comb + two HIGHEST
                # dots per coarse plane + staged chunk DMAs).
                q = p - L - 1

                @pl.when((q >= 1) & (q <= NX))
                def _(q=q):
                    rr = sweep(opl(q), opl(q - 1), opl(q + 1), fpl(q))
                    rres[r3(q), :, :] = jnp.where(kp, rr, zero)

                m = (q - 1) // 2
                m_ready = (
                    (((q + 32) % 2) == 1) & (m >= 1) & (m <= NCC * TX)
                )
                if variant != "restrict_nodma":
                    @pl.when(
                        m_ready & (((m - 1) % TX) == 0)
                        & ((m - 1) // TX >= 2)
                    )
                    def _(m=m):
                        cst_chunk((m - 1) // TX - 2, wait=True)

                if variant == "restrict_burst8":
                    # Stage the x-combined planes; run all 16 dots of a
                    # chunk BACK-TO-BACK at its last plane (probe_vpu's
                    # pr_mm shows consecutive dots pipeline on the MXU;
                    # the isolated every-other-step dot pair measured
                    # ~4.5x its pipelined cost here).
                    @pl.when(m_ready)
                    def _(q=q, m=m):
                        top = jnp.where(
                            2 * m + 1 > NX, zero,
                            rres[r3(2 * m + 1), :, :]
                        )
                        vxb[(m - 1) % TX, :, :] = (
                            0.25 * rres[r3(2 * m - 1), :, :]
                            + 0.5 * rres[r3(2 * m), :, :] + 0.25 * top
                        )

                    @pl.when(m_ready & (((m - 1) % TX) == TX - 1))
                    def _(m=m):
                        base_slot = ((m - 1) // TX % 2) * TX
                        for j in range(TX):
                            vxj = vxb[j, :, :]
                            t = jnp.dot(
                                vxj, wz,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                            oc = jnp.dot(
                                wy.T, t,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                            cst[base_slot + j, :, :] = jnp.where(
                                ckeep, oc, czero
                            )
                else:
                    @pl.when(m_ready)
                    def _(q=q, m=m):
                        top = jnp.where(
                            2 * m + 1 > NX, zero,
                            rres[r3(2 * m + 1), :, :]
                        )
                        vx = (
                            0.25 * rres[r3(2 * m - 1), :, :]
                            + 0.5 * rres[r3(2 * m), :, :] + 0.25 * top
                        )
                        if variant == "restrict_nodot":
                            oc = 0.5 * vx[:CYL, :CZL]
                        elif variant == "restrict_dotc3":
                            # concat-split bf16x3: ONE call, 3 exact
                            # passes (all 24 f32 mantissa bits; products
                            # exact in f32) vs HIGHEST's 6
                            def split3(a):
                                hi = a.astype(jnp.bfloat16)
                                r1 = a - hi.astype(jnp.float32)
                                mid = r1.astype(jnp.bfloat16)
                                lo = (
                                    r1 - mid.astype(jnp.float32)
                                ).astype(jnp.bfloat16)
                                return hi, mid, lo

                            wzb = wz.astype(jnp.bfloat16)
                            wyb = wy.astype(jnp.bfloat16)
                            t = jnp.dot(
                                jnp.concatenate(split3(vx), axis=1),
                                jnp.concatenate([wzb] * 3, axis=0),
                                preferred_element_type=jnp.float32,
                            )
                            oc = jnp.dot(
                                jnp.concatenate(
                                    [wyb.T] * 3, axis=1
                                ),
                                jnp.concatenate(split3(t), axis=0),
                                preferred_element_type=jnp.float32,
                            )
                        elif variant == "restrict_dot1":
                            # cost bound: plain 1-pass bf16 dots
                            t = jnp.dot(
                                vx.astype(jnp.bfloat16),
                                wz.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32,
                            )
                            oc = jnp.dot(
                                wy.T.astype(jnp.bfloat16),
                                t.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32,
                            )
                        else:
                            t = jnp.dot(
                                vx, wz,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                            oc = jnp.dot(
                                wy.T, t,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                        cst[r16(m - 1), :, :] = jnp.where(ckeep, oc, czero)

                if variant != "restrict_nodma":
                    @pl.when(m_ready & (((m - 1) % TX) == TX - 1))
                    def _(m=m):
                        cst_chunk((m - 1) // TX)
                return carry

            # norm consumer at lag L+1
            q = p - L - 1
            total, comp = carry
            rr = sweep(opl(q), opl(q - 1), opl(q + 1), fpl(q))
            rr = jnp.where(kp & (q >= 1) & (q <= NX), rr, zero)
            part = jnp.sum(rr ** 2)
            y = part - comp
            tt = total + y
            comp = (tt - total) - y
            return (tt, comp)

        def one_pass(_, carry0):
            # prologue
            outst[15, :, :] = zero
            in_slabs(jnp.int32(0), True)

            if variant == "unroll8":
                def slab_body(si, carry):
                    for pos in range(TX):
                        carry = body_step(si * TX + pos, carry, pos=pos)
                    return carry
                carry = jax.lax.fori_loop(
                    0, _cdiv(nsteps, TX), slab_body, carry0
                )
            else:
                carry = jax.lax.fori_loop(0, nsteps, body_step, carry0)

            for back in (2, 1):
                if NC - back >= 0:
                    out_chunk(jnp.int32(NC - back), wait=True)
            if restrict and variant != "restrict_nodma":
                for back in (2, 1):
                    if NCC - back >= 0:
                        cst_chunk(jnp.int32(NCC - back), wait=True)
            return carry

        carry = jax.lax.fori_loop(
            0, rk, one_pass, (jnp.float32(0.0), jnp.float32(0.0))
        )
        norm_ref[0, 0] = carry[0]

    scratch = [
        pltpu.VMEM((16, YL, ZL), jnp.float32),   # sv
        pltpu.VMEM((24, YL, ZL), jnp.float32),   # sf
        pltpu.VMEM((16, YL, ZL), jnp.float32),   # outst
        pltpu.VMEM((3, YL, ZL), jnp.float32),    # g1
        pltpu.VMEM((3, YL, ZL), jnp.float32),    # g2
        pltpu.VMEM((3, YL, ZL), jnp.float32),    # rres
        pltpu.VMEM((16, CYL, CZL), jnp.float32),  # cst
        pltpu.VMEM((8, YL, ZL), jnp.float32),     # vxb (burst staging)
        pltpu.SemaphoreType.DMA((8, 3)),
    ]
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((AX, YL, ZL), jnp.float32),
            jax.ShapeDtypeStruct((264, CYL, CZL), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024
        ),
    )


def main():
    v = jnp.zeros((AX, YL, ZL), jnp.float32)
    f = jnp.ones((AX, YL, ZL), jnp.float32) * 0.01
    gb = 3 * AX * YL * ZL * 4 / 1e9
    RK_LO, RK_HI = 2, 12
    variants = ("base", "unroll8", "compute0", "restrict",
                "restrict_nodot", "restrict_nodma", "restrict_burst8",
                "restrict_dot1", "restrict_dotc3")
    only = os.environ.get("PROBE_VARIANTS")
    if only:
        variants = tuple(v for v in variants if v in only.split(","))
    for variant in variants:
        try:
            ts = {}
            for rk in (RK_LO, RK_HI):
                call = jax.jit(make_pass(variant, rk))
                out, cout, nrm = call(v, f)
                float(nrm[0, 0]); float(cout[1, 1, 1])  # compile+sync
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out, cout, nrm = call(v, f)
                float(nrm[0, 0]); float(cout[1, 1, 1])
                ts[rk] = (time.perf_counter() - t0) / REPS
            dt = (ts[RK_HI] - ts[RK_LO]) / (RK_HI - RK_LO)
            print(f"{variant:9s} {dt*1e3:7.2f} ms/pass device "
                  f"({gb/dt:.0f} GB/s; launches {ts[RK_LO]*1e3:.1f} / "
                  f"{ts[RK_HI]*1e3:.1f} ms)")
        except Exception as e:
            print(f"{variant:9s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
