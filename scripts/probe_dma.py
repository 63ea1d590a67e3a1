"""Probe 2: raw DMA / bandwidth ceilings on the bench TPU.

  xla_add       jitted a+1 elementwise (XLA's own roofline)
  xla_copy      jitted jnp copy via lax: b = a * 1.0
  hbm2hbm       single whole-array HBM->HBM async_copy inside one kernel
  slab_nc       slab in->out through VMEM, no compute, no separate out buf
  slab_s4       4-slot version of the round-1 pipeline (more DMAs in flight)
  u8_small      copy kernel on a z%8 layout at 127^3 (support check)

Usage: python scripts/probe_dma.py [size] [reps]
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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 511
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def _cdiv(a, b):
    return -(-a // b)


def _round_up(n, m):
    return -(-n // m) * m


def timed(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_xla(shape):
    a = jnp.zeros(shape, jnp.float32)

    @jax.jit
    def step(x, it):
        def body(i, x):
            return x + 1.0

        x = jax.lax.fori_loop(0, it, body, x)
        return x, x[0, 0, 0]

    it = jnp.int32(REPS)
    _, s = step(a, it)
    float(s)
    dt = timed(lambda: float(step(a, it)[1]))
    per = dt / REPS
    gb = shape[0] * shape[1] * shape[2] * 4 * 2 / 1e9
    print(f"xla_add     : per_pass={per*1e3:.2f} ms  bw={gb/per:.0f} GB/s")


def probe_hbm2hbm(shape):
    def kernel(a_ref, oa_ref, ob_ref, sc, sem):
        def body(i, _):
            def ab():
                cp = pltpu.make_async_copy(oa_ref, ob_ref, sem)
                cp.start()
                cp.wait()

            def ba():
                cp = pltpu.make_async_copy(ob_ref, oa_ref, sem)
                cp.start()
                cp.wait()

            jax.lax.cond(jax.lax.rem(i, 2) == 0, ab, ba)
            return 0

        jax.lax.fori_loop(0, REPS, body, 0)
        sc[0, 0] = jnp.float32(1.0)

    call = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
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
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        input_output_aliases={0: 0},
    )
    a = jnp.zeros(shape, jnp.float32)

    def go():
        _, _, sc = call(a)
        float(sc[0, 0])

    go()
    dt = timed(go)
    per = dt / REPS
    gb = shape[0] * shape[1] * shape[2] * 4 * 2 / 1e9
    print(f"hbm2hbm     : per_pass={per*1e3:.2f} ms  bw={gb/per:.0f} GB/s")


def probe_slab(shape, tx, nslots, name):
    """In->VMEM->out copy, no compute: DMA ceiling of slab streaming."""
    xp, yl, zl = shape
    nx = xp  # copy the whole x extent, tile by tile (no ghost)
    ntx = _cdiv(nx, tx)

    def kernel(a_ref, oa_ref, ob_ref, sc, vs, sem):
        def one_pass(src, dst):
            def start_in(t):
                sx = jnp.minimum(t * tx, nx - tx)
                pltpu.make_async_copy(
                    src.at[pl.ds(sx, tx)],
                    vs.at[jax.lax.rem(t, nslots)],
                    sem.at[0, jax.lax.rem(t, nslots)],
                ).start()

            def wait_in(t):
                sx = jnp.minimum(t * tx, nx - tx)
                pltpu.make_async_copy(
                    src.at[pl.ds(sx, tx)],
                    vs.at[jax.lax.rem(t, nslots)],
                    sem.at[0, jax.lax.rem(t, nslots)],
                ).wait()

            def start_out(t):
                sx = jnp.minimum(t * tx, nx - tx)
                pltpu.make_async_copy(
                    vs.at[jax.lax.rem(t, nslots)],
                    dst.at[pl.ds(sx, tx)],
                    sem.at[1, jax.lax.rem(t, nslots)],
                ).start()

            def wait_out(t):
                sx = jnp.minimum(t * tx, nx - tx)
                pltpu.make_async_copy(
                    vs.at[jax.lax.rem(t, nslots)],
                    dst.at[pl.ds(sx, tx)],
                    sem.at[1, jax.lax.rem(t, nslots)],
                ).wait()

            for t0 in range(min(nslots - 1, ntx)):
                start_in(t0)

            def body(t, _):
                @pl.when(t + nslots - 1 < ntx)
                def _():
                    start_in(t + nslots - 1)

                wait_in(t)

                @pl.when(t >= nslots)
                def _():
                    wait_out(t - nslots)

                start_out(t)
                return 0

            jax.lax.fori_loop(0, ntx, body, 0)
            for back in range(min(nslots, ntx), 0, -1):
                wait_out(ntx - back)

        def body(i, _):
            jax.lax.cond(
                jax.lax.rem(i, 2) == 0,
                lambda: one_pass(oa_ref, ob_ref),
                lambda: one_pass(ob_ref, oa_ref),
            )
            return 0

        jax.lax.fori_loop(0, REPS, body, 0)
        sc[0, 0] = jnp.float32(1.0)

    call = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
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
            pltpu.VMEM((nslots, tx, yl, zl), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nslots)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
    )
    a = jnp.zeros(shape, jnp.float32)

    def go():
        _, _, sc = call(a)
        float(sc[0, 0])

    try:
        go()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    dt = timed(go)
    per = dt / REPS
    gb = shape[0] * shape[1] * shape[2] * 4 * 2 / 1e9
    print(
        f"{name}: per_pass={per*1e3:.2f} ms  bw={gb/per:.0f} GB/s "
        f"(tx={tx}, slots={nslots})"
    )


def main():
    n = SIZE
    print(f"device: {jax.devices()[0].device_kind}, size={n}, reps={REPS}")
    shape = (_round_up(n + 2, 8), _round_up(n + 2, 8), _round_up(n + 2, 128))
    probe_xla(shape)
    probe_hbm2hbm(shape)
    probe_slab(shape, 8, 2, "slab_t8_s2  ")
    probe_slab(shape, 8, 4, "slab_t8_s4  ")
    probe_slab(shape, 16, 2, "slab_t16_s2 ")
    probe_slab(shape, 16, 4, "slab_t16_s4 ")
    probe_slab(shape, 32, 2, "slab_t32_s2 ")
    # unaligned minor-dim support check (small, cheap)
    u8 = (136, 136, 136)
    probe_slab(u8, 8, 2, "u8_small    ")
    u1 = (129, 131, 131)
    probe_slab(u1, 8, 2, "u1_small    ")


if __name__ == "__main__":
    main()
