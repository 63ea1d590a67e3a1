"""Hardware probes for the mega-kernel perf work (round 2).

Runs a set of microbenchmarks on the real TPU in ONE process (first Mosaic
compile through the tunnel costs minutes; the rest are cheap).  Each probe
prints one line:  name  per_pass_ms  GB/s.

Probes:
  stream        slab-pipelined HBM copy (the smoother's DMA structure, no
                compute) -> structural DMA ceiling
  stencil_plane per-plane 7pt Jacobi sweep (the mega-kernel formulation)
  stencil_slab  whole-slab 7pt Jacobi sweep (the per-op kernel formulation)
  stream_u8     same as stream but with z padded to 8 (not 128) -> does
                Mosaic take unaligned-minor DMAs, and at what bandwidth?
  stencil_u8    per-plane sweep on the z%8 layout

Usage: python scripts/probe_perf.py [size] [repeats]
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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 511
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def _cdiv(a, b):
    return -(-a // b)


def _round_up(n, m):
    return -(-n // m) * m


def make_probe(shape, tx, compute, n_extra_ghost=0):
    """A slab-streaming kernel: ping-pongs R passes between two HBM buffers.

    compute(vs, slot, c_or_None, tx, yl, zl, os_) fills the output planes.
    """
    xp, yl, zl = shape
    nx = xp - 2
    ntx = _cdiv(nx, tx)

    def kernel(a_ref, b_ref, oa_ref, ob_ref, out_sc, vs, os_, sem):
        def one_pass(src, dst):
            def start_in(t, slot):
                sx = jnp.minimum(t * tx, nx - tx)
                cp = pltpu.make_async_copy(
                    src.at[pl.ds(sx, tx + 2)],
                    vs.at[slot, pl.ds(0, tx + 2)],
                    sem.at[0, slot],
                )
                cp.start()
                return cp

            start_in(0, 0)

            def body(t, _):
                slot = jax.lax.rem(t, 2)
                sx = jnp.minimum(t * tx, nx - tx)

                @pl.when(t + 1 < ntx)
                def _():
                    start_in(t + 1, jax.lax.rem(t + 1, 2))

                pltpu.make_async_copy(
                    src.at[pl.ds(sx, tx + 2)],
                    vs.at[slot, pl.ds(0, tx + 2)],
                    sem.at[0, slot],
                ).wait()

                @pl.when(t >= 2)
                def _():
                    pltpu.make_async_copy(
                        os_.at[slot],
                        dst.at[pl.ds(jnp.minimum((t - 2) * tx, nx - tx) + 1,
                                     tx)],
                        sem.at[1, slot],
                    ).wait()

                compute(vs, slot, tx, yl, zl, os_)
                pltpu.make_async_copy(
                    os_.at[slot],
                    dst.at[pl.ds(sx + 1, tx)],
                    sem.at[1, slot],
                ).start()
                return 0

            jax.lax.fori_loop(0, ntx, body, 0)
            for back in (2, 1):
                if ntx - back >= 0:
                    t_last = ntx - back
                    pltpu.make_async_copy(
                        os_.at[t_last % 2],
                        dst.at[pl.ds(jnp.minimum(t_last * tx, nx - tx) + 1,
                                     tx)],
                        sem.at[1, t_last % 2],
                    ).wait()

        R = REPS

        def rep_body(i, _):
            # even: a->b, odd: b->a  (aliased in/out pairs)
            jax.lax.cond(
                jax.lax.rem(i, 2) == 0,
                lambda: one_pass(oa_ref, ob_ref),
                lambda: one_pass(ob_ref, oa_ref),
            )
            return 0

        jax.lax.fori_loop(0, R, rep_body, 0)
        out_sc[0, 0] = jnp.float32(1.0)

    call = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2, yl, zl), jnp.float32),
            pltpu.VMEM((2, tx, yl, zl), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )
    return call


def compute_copy(vs, slot, tx, yl, zl, os_):
    for c in range(tx):
        os_[slot, c] = vs[slot, 1 + c]


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def compute_stencil_plane(vs, slot, tx, yl, zl, os_):
    c0, c1 = 6.0, -1.0
    for c in range(tx):
        p = vs[slot, 1 + c]
        lateral = (
            _roll(p, -1, 0) + _roll(p, 1, 0)
            + _roll(p, -1, 1) + _roll(p, 1, 1)
            + vs[slot, c] + vs[slot, 2 + c]
        )
        av = c0 * p + c1 * lateral
        os_[slot, c] = p + 0.123 * (0.456 - av)


def compute_stencil_slab(vs, slot, tx, yl, zl, os_):
    c0, c1 = 6.0, -1.0
    slab = vs[slot]
    p = slab[1:1 + tx]
    lateral = (
        _roll(p, -1, 1) + _roll(p, 1, 1)
        + _roll(p, -1, 2) + _roll(p, 1, 2)
        + slab[0:tx] + slab[2:2 + tx]
    )
    av = c0 * p + c1 * lateral
    os_[slot, :tx] = p + 0.123 * (0.456 - av)


def run_probe(name, shape, tx, compute):
    call = make_probe(shape, tx, compute)
    a = jnp.zeros(shape, jnp.float32)
    b = jnp.zeros(shape, jnp.float32)

    def go():
        t0 = time.perf_counter()
        _, _, sc = call(a, b)
        float(sc[0, 0])
        return time.perf_counter() - t0

    try:
        t_compile = go()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    times = [go() for _ in range(3)]
    dt = min(times)
    per_pass = dt / REPS
    gb = shape[0] * shape[1] * shape[2] * 4 * 2 / 1e9  # read + write
    print(
        f"{name}: per_pass={per_pass*1e3:.2f} ms  "
        f"bw={gb/per_pass:.0f} GB/s  (alloc {shape}, tx={tx}, "
        f"compile+first={t_compile:.1f}s)"
    )


def main():
    n = SIZE
    print(f"device: {jax.devices()[0].device_kind}, size={n}, reps={REPS}")
    shape128 = (_round_up(n + 2, 8), _round_up(n + 2, 8),
                _round_up(n + 2, 128))
    shape8 = (_round_up(n + 2, 8), _round_up(n + 2, 8),
              _round_up(n + 2, 8))
    plane = shape128[1] * shape128[2] * 4
    # ~same VMEM budget as the mega-kernel: 2 bufs x 2 slots x (tx+2) planes
    tx = min(14, max(3, 80 * 1024 * 1024 // plane // 8))

    run_probe("stream      ", shape128, tx, compute_copy)
    run_probe("stencil_plane", shape128, tx, compute_stencil_plane)
    run_probe("stencil_slab", shape128, tx, compute_stencil_slab)
    run_probe("stream_u8   ", shape8, tx, compute_copy)
    run_probe("stencil_u8  ", shape8, tx, compute_stencil_plane)
    # bigger slabs on the aligned layout
    run_probe("stream_tx28 ", shape128, 28, compute_copy)
    run_probe("stencil_tx28", shape128, 28, compute_stencil_slab)


if __name__ == "__main__":
    main()
