"""VPU op-cost probe for the wavefront mega-kernel's plane-stage work.

The round-3 device-time accounting (PERF.md §6) showed the mega-kernel is
VPU-bound: ~13.8 ms device at 511³ where its ~4.0 GB stream would cost
~6.1 ms at the measured 658 GB/s ceiling.  A naive op count for one
plane-stage (7-pt LINEAR Jacobi: 4 rolls of the centre plane + 5 adds +
3 FMAs + 1 select over a (520, 512) f32 plane) predicts ~1.2 µs/plane-stage
at the VPU's ~3.8 Tf32op/s, but the kernel spends ~3 µs.  This probe prices
each primitive ON the chip so the optimisation targets the real cost:

  add        x = x + y                       (1 vector op baseline)
  fma_s      x = x + 0.7*y                   (scalar multiplier)
  fma_v      x = x + m*y                     (vector multiplier — the
                                              select-folded Jacobi form)
  roll_y     pltpu.roll(x, 1, axis=0)        (sublane shift, crosses tiles)
  roll_z     pltpu.roll(x, 1, axis=1)        (lane shift)
  select     jnp.where(mask, x, 0)           (the per-stage keep mask)
  exp        jnp.exp(x)                      (FAS/Newton per-stage cost)
  stage      one full LINEAR plane-stage     (calibrates the composite)

Usage: python scripts/probe_vpu.py [n_lo n_hi]
Launch-overhead cancels via the two-point measurement (t_hi−t_lo)/(n_hi−n_lo).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

YL, ZL = 520, 512  # the 511³ level-0 plane extents (sublane, lane)


def _restrict_mat(fp, cp):
    """In-kernel iota build (pallas_vcycle2._restrict_matrix's form)."""
    ff = jax.lax.broadcasted_iota(jnp.int32, (fp, cp), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (fp, cp), 1)
    d = ff - 2 * cc
    w = jnp.where(d == 0, 0.5, 0.0)
    return jnp.where((d == -1) | (d == 1), 0.25, w).astype(jnp.float32)


def _prolong_mat(cp, fp):
    cc = jax.lax.broadcasted_iota(jnp.int32, (cp, fp), 0)
    mm = jax.lax.broadcasted_iota(jnp.int32, (cp, fp), 1)
    d = mm - 2 * cc
    w = jnp.where(d == 0, 1.0, 0.0)
    return jnp.where((d == -1) | (d == 1), 0.5, w).astype(jnp.float32)

N_LO = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
N_HI = int(sys.argv[2]) if len(sys.argv) > 2 else 10000


def _mk(op_name, n_iter):
    """n_iter is a STATIC trip count baked into the kernel.  An earlier
    variant read the bound from a (1,1) SMEM input; on the axon rig the
    measured times did not scale with the requested bound and one launch
    wedged the remote device — a dynamic bound read inside the kernel is
    not worth that risk for a probe."""
    def kernel(x_ref, y_ref, o_ref):
        yi = jax.lax.broadcasted_iota(jnp.int32, (YL, ZL), 0)
        zi = jax.lax.broadcasted_iota(jnp.int32, (YL, ZL), 1)
        mask = (yi >= 1) & (yi <= YL - 3) & (zi >= 1) & (zi <= ZL - 2)
        maskf = mask.astype(jnp.float32) * 0.31
        y = y_ref[...]
        zero = jnp.zeros((YL, ZL), jnp.float32)

        def body(i, x):
            if op_name == "add":
                return x + y
            if op_name == "fma_s":
                return x + 0.7 * y
            if op_name == "fma_v":
                return x + maskf * y
            if op_name == "roll_y":
                return pltpu.roll(x, 1, 0)
            if op_name == "roll_z":
                return pltpu.roll(x, 1, 1)
            if op_name == "select":
                return jnp.where(mask, x, zero)
            if op_name == "exp":
                return jnp.exp(x)
            if op_name == "pr_mm":
                # restrict (y,z full-weighting) then prolong back via the
                # mega-kernel's dense MXU matrices — shape-preserving chain
                wz_r = _restrict_mat(ZL, ZL // 2)
                wy_r = _restrict_mat(YL, YL // 2)
                pz = _prolong_mat(ZL // 2, ZL)
                py = _prolong_mat(YL // 2, YL)
                t = jnp.dot(x, wz_r, preferred_element_type=jnp.float32)
                c = jnp.dot(wy_r.T, t, preferred_element_type=jnp.float32)
                t2 = jnp.dot(c, pz, preferred_element_type=jnp.float32)
                return jnp.dot(py.T, t2, preferred_element_type=jnp.float32)
            if op_name == "pr_mm3":
                # 3-way bf16 split of the PLANE only (the transfer
                # weights are exact in bf16): 3 one-pass bf16 dots per
                # product vs HIGHEST's 6 both-operand passes
                wz_r = _restrict_mat(ZL, ZL // 2)
                wy_r = _restrict_mat(YL, YL // 2)
                pz = _prolong_mat(ZL // 2, ZL)
                py = _prolong_mat(YL // 2, YL)

                def dot3(a, w, transpose=False):
                    hi = a.astype(jnp.bfloat16)
                    r1 = a - hi.astype(jnp.float32)
                    mid = r1.astype(jnp.bfloat16)
                    lo = (r1 - mid.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    wb = w.astype(jnp.bfloat16)
                    acc = None
                    for part in (hi, mid, lo):
                        if transpose:
                            t = jnp.dot(
                                wb.T, part,
                                preferred_element_type=jnp.float32,
                            )
                        else:
                            t = jnp.dot(
                                part, wb,
                                preferred_element_type=jnp.float32,
                            )
                        acc = t if acc is None else acc + t
                    return acc

                t = dot3(x, wz_r)
                c = dot3(t, wy_r, transpose=True)
                t2 = dot3(c, pz)
                return dot3(t2, py, transpose=True)
            if op_name in ("pr_mmc3", "pr_mmc2"):
                # Round-5 retry of the bf16-split idea: CONCATENATED
                # split — ONE dot call per product with k× the
                # contraction length ([hi;mid;lo] @ [w;w;w]).  Same MXU
                # pass count as pr_mm3 but one call's fixed overhead
                # (round-4's pr_mm3 rejection measured the 3 separate
                # dot CALLS, not the passes).  bf16x3 carries all 24
                # f32 mantissa bits (each bf16×bf16 product is exact in
                # f32), so precision matches HIGHEST's class.
                kparts = 3 if op_name == "pr_mmc3" else 2
                wz_r = _restrict_mat(ZL, ZL // 2)
                wy_r = _restrict_mat(YL, YL // 2)
                pz = _prolong_mat(ZL // 2, ZL)
                py = _prolong_mat(YL // 2, YL)

                def split(a):
                    parts = []
                    rem = a
                    for _ in range(kparts):
                        p_ = rem.astype(jnp.bfloat16)
                        parts.append(p_)
                        rem = rem - p_.astype(jnp.float32)
                    return parts

                def dotc(a, w, transpose=False):
                    parts = split(a)
                    wb = w.astype(jnp.bfloat16)
                    if transpose:
                        aa = jnp.concatenate(parts, axis=0)
                        ww = jnp.concatenate([wb] * kparts, axis=0)
                        return jnp.dot(
                            ww.T, aa,
                            preferred_element_type=jnp.float32,
                        )
                    aa = jnp.concatenate(parts, axis=1)
                    ww = jnp.concatenate([wb] * kparts, axis=0)
                    return jnp.dot(
                        aa, ww, preferred_element_type=jnp.float32
                    )

                t = dotc(x, wz_r)
                c = dotc(t, wy_r, transpose=True)
                t2 = dotc(c, pz)
                return dotc(t2, py, transpose=True)
            if op_name == "pr_mm1":
                # floor: plain 1-pass bf16 dots (precision-losing — only
                # a cost bound, not a candidate)
                wz_r = _restrict_mat(ZL, ZL // 2).astype(jnp.bfloat16)
                wy_r = _restrict_mat(YL, YL // 2).astype(jnp.bfloat16)
                pz = _prolong_mat(ZL // 2, ZL).astype(jnp.bfloat16)
                py = _prolong_mat(YL // 2, YL).astype(jnp.bfloat16)
                xb = x.astype(jnp.bfloat16)
                t = jnp.dot(xb, wz_r, preferred_element_type=jnp.float32)
                c = jnp.dot(
                    wy_r.T, t.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                t2 = jnp.dot(
                    c.astype(jnp.bfloat16), pz,
                    preferred_element_type=jnp.float32,
                )
                return jnp.dot(
                    py.T, t2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            if op_name == "pr_jr":
                # restrict on the MXU, prolong via jnp.repeat + roll (VPU):
                # fine = 0.5*(rep + roll(rep, -1)) where rep elementwise-
                # doubles the coarse plane along the axis — exact trilinear
                wz_r = _restrict_mat(ZL, ZL // 2)
                wy_r = _restrict_mat(YL, YL // 2)
                t = jnp.dot(x, wz_r, preferred_element_type=jnp.float32)
                c = jnp.dot(wy_r.T, t, preferred_element_type=jnp.float32)
                rz = jnp.repeat(c, 2, axis=1)
                fz = 0.5 * (rz + pltpu.roll(rz, ZL - 1, 1))
                ry = jnp.repeat(fz, 2, axis=0)
                return 0.5 * (ry + pltpu.roll(ry, YL - 1, 0))
            if op_name == "pr_sl":
                # the same chain via strided slices / interleaves (VPU)
                xe = x[:, 0::2]
                xo = x[:, 1::2]
                t = 0.5 * xe + 0.25 * (xo + pltpu.roll(xo, 1, 1))
                ye = t[0::2, :]
                yo = t[1::2, :]
                c = 0.5 * ye + 0.25 * (yo + pltpu.roll(yo, 1, 0))
                # prolong z then y by interleave
                oz = 0.5 * (c + pltpu.roll(c, (ZL // 2) - 1, 1))
                fz = jnp.stack([c, oz], axis=2).reshape(YL // 2, ZL)
                oy = 0.5 * (fz + pltpu.roll(fz, (YL // 2) - 1, 0))
                fy = jnp.stack([fz, oy], axis=1).reshape(YL, ZL)
                return fy
            if op_name == "stage_zdot":
                # round-5 probe: the z±1 taps (lane-axis rolls — measured
                # 4x a sublane roll) via ONE bit-exact HIGHEST dot with a
                # two-unit-diagonal matrix, freeing VPU lanes and
                # overlapping the MXU with the y-roll work.  The dot's
                # per-output sum has exactly two unit products, so it
                # reproduces the f32 add exactly.
                zi1 = jax.lax.broadcasted_iota(jnp.int32, (ZL, ZL), 0)
                zi2 = jax.lax.broadcasted_iota(jnp.int32, (ZL, ZL), 1)
                tz = ((zi1 == zi2 + 1) | (zi1 == zi2 - 1)).astype(
                    jnp.float32
                )
                zsum = jnp.dot(
                    x, tz, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                g = (
                    y + y
                    + pltpu.roll(x, 1, 0) + pltpu.roll(x, YL - 1, 0)
                    + zsum
                )
                rr = y + (-6.2) * x
                rr = rr + 1.04 * g
                val = x + 0.31 * rr
                return jnp.where(mask, val, zero)
            if op_name == "stage_nosel":
                # round-5 probe: the keep-mask select folded into the
                # Jacobi FMA's multiplier plane (bit-identical: halo
                # lanes get center + 0·rr = center = 0)
                g = (
                    y + y
                    + pltpu.roll(x, 1, 0) + pltpu.roll(x, YL - 1, 0)
                    + pltpu.roll(x, 1, 1) + pltpu.roll(x, ZL - 1, 1)
                )
                rr = y + (-6.2) * x
                rr = rr + 1.04 * g
                return x + maskf * rr
            if op_name == "stage_zdot_nosel":
                zi1 = jax.lax.broadcasted_iota(jnp.int32, (ZL, ZL), 0)
                zi2 = jax.lax.broadcasted_iota(jnp.int32, (ZL, ZL), 1)
                tz = ((zi1 == zi2 + 1) | (zi1 == zi2 - 1)).astype(
                    jnp.float32
                )
                zsum = jnp.dot(
                    x, tz, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                g = (
                    y + y
                    + pltpu.roll(x, 1, 0) + pltpu.roll(x, YL - 1, 0)
                    + zsum
                )
                rr = y + (-6.2) * x
                rr = rr + 1.04 * g
                return x + maskf * rr
            if op_name == "stage2_fused":
                # round-5 probe, VERDICT lever (b): TWO damped-Jacobi
                # sweeps fused algebraically into one wider-stencil
                # update (v2 = B²v0 + (I+B)c·f, B = I − (ω/d)A).  The
                # 7-pt star squared has 25 taps; the per-plane form needs
                # 8 lane-axis (z) rolls — own z±1/z±2 plus z±1 on each
                # x-neighbour plane — vs 4 for two chained sweeps.
                # Compare ns/op here against 2× the ``stage`` figure.
                ypm = pltpu.roll(x, 1, 0) + pltpu.roll(x, YL - 1, 0)
                y2pm = pltpu.roll(x, 2, 0) + pltpu.roll(x, YL - 2, 0)
                zp = pltpu.roll(x, 1, 1)
                zm = pltpu.roll(x, ZL - 1, 1)
                z2pm = pltpu.roll(x, 2, 1) + pltpu.roll(x, ZL - 2, 1)
                cross = (
                    pltpu.roll(zp, 1, 0) + pltpu.roll(zp, YL - 1, 0)
                    + pltpu.roll(zm, 1, 0) + pltpu.roll(zm, YL - 1, 0)
                )
                # x±1 neighbour planes (y stands in): their y±1/z±1 taps
                xn = (
                    2.0 * y
                    + pltpu.roll(y, 1, 0) + pltpu.roll(y, YL - 1, 0)
                    + pltpu.roll(y, 1, 1) + pltpu.roll(y, ZL - 1, 1)
                )
                # x±2 planes (y stands in again — cost-identical)
                acc = (
                    0.41 * x + 0.11 * (ypm + zp + zm)
                    + 0.07 * (y2pm + z2pm + cross)
                    + 0.09 * xn + 0.05 * y
                )
                # (I+B)c f contribution: f := y stand-in, 7-pt apply + ax
                fb = (
                    1.3 * y
                    + 0.3 * (pltpu.roll(y, 1, 0) + pltpu.roll(y, YL - 1, 0))
                )
                val = acc + fb
                return jnp.where(mask, val, zero)
            if op_name == "stage":
                # one LINEAR plane-stage: x as the centre plane, y as both
                # x-neighbours and f (costs identical, values irrelevant)
                g = (
                    y + y
                    + pltpu.roll(x, 1, 0) + pltpu.roll(x, YL - 1, 0)
                    + pltpu.roll(x, 1, 1) + pltpu.roll(x, ZL - 1, 1)
                )
                rr = y + (-6.2) * x  # centre-group FMA (init=f)
                rr = rr + 1.04 * g  # neighbour-group FMA
                val = x + 0.31 * rr  # Jacobi FMA
                return jnp.where(mask, val, zero)
            raise ValueError(op_name)

        o_ref[...] = jax.lax.fori_loop(
            0, n_iter, body, x_ref[...], unroll=False
        )

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((YL, ZL), jnp.float32),
    )


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (YL, ZL), jnp.float32, 0.1, 0.9)
    y = jax.random.uniform(jax.random.PRNGKey(1), (YL, ZL), jnp.float32,
                           0.1, 0.9)
    ops = ["add", "fma_s", "fma_v", "roll_y", "roll_z", "select", "exp",
           "stage", "stage2_fused", "stage_zdot", "stage_nosel", "stage_zdot_nosel",
           "pr_mm", "pr_mm3", "pr_mmc3", "pr_mmc2", "pr_mm1",
           "pr_jr", "pr_sl"]
    only = os.environ.get("PROBE_OPS")
    if only:
        ops = [o for o in ops if o in only.split(",")]
    print(f"plane ({YL}, {ZL}) f32, n_lo={N_LO} n_hi={N_HI}")
    for op in ops:
        times = {}
        for n in (N_LO, N_HI):
            f = jax.jit(_mk(op, n))
            # force a VALUE fetch, not block_until_ready: through the axon
            # tunnel the latter acknowledges dispatch before the device has
            # executed (the round-2 async-dispatch timing artifact)
            float(f(x, y)[0, 0])  # compile+warm
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(x, y)
            float(out[0, 0])
            times[n] = (time.perf_counter() - t0) / reps
        per_op_us = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1e6
        print(f"{op:8s} {per_op_us*1000:8.1f} ns/op "
              f"({times[N_LO]*1e3:.2f} / {times[N_HI]*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
