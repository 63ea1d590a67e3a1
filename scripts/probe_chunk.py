"""Probe 3: does DMA-stream concurrency lift HBM bandwidth?

Copy a->b slab-wise where each slab transfer is split into C concurrent
chunk-DMAs along y (each with its own semaphore).  Also read-only and
write-only variants.

Usage: python scripts/probe_chunk.py [size] [reps]
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


def probe_chunked(shape, tx, C, mode, name):
    """mode: 'rw' copy, 'r' read-only, 'w' write-only."""
    xp, yl, zl = shape
    nx = xp
    ntx = _cdiv(nx, tx)
    assert tx % C == 0
    xc = tx // C  # chunk along x: untiled dim, arbitrary slices are legal
    NS = 2  # slots

    def kernel(a_ref, oa_ref, ob_ref, sc, vs, sem):
        def one_pass(src, dst):
            def in_copies(t, start):
                sx = jnp.minimum(t * tx, nx - tx)
                slot = jax.lax.rem(t, NS)
                for c in range(C):
                    cp = pltpu.make_async_copy(
                        src.at[pl.ds(sx + c * xc, xc)],
                        vs.at[slot, pl.ds(c * xc, xc)],
                        sem.at[0, slot, c],
                    )
                    if start:
                        cp.start()
                    else:
                        cp.wait()

            def out_copies(t, start):
                sx = jnp.minimum(t * tx, nx - tx)
                slot = jax.lax.rem(t, NS)
                for c in range(C):
                    cp = pltpu.make_async_copy(
                        vs.at[slot, pl.ds(c * xc, xc)],
                        dst.at[pl.ds(sx + c * xc, xc)],
                        sem.at[1, slot, c],
                    )
                    if start:
                        cp.start()
                    else:
                        cp.wait()

            if mode != "w":
                in_copies(0, True)

            def body(t, _):
                if mode != "w":
                    @pl.when(t + 1 < ntx)
                    def _():
                        in_copies(t + 1, True)

                    in_copies(t, False)

                if mode != "r":
                    @pl.when(t >= NS)
                    def _():
                        out_copies(t - NS, False)

                    out_copies(t, True)
                return 0

            jax.lax.fori_loop(0, ntx, body, 0)
            if mode != "r":
                for back in range(min(NS, ntx), 0, -1):
                    out_copies(ntx - back, False)

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
            pltpu.VMEM((NS, tx, yl, zl), jnp.float32),
            pltpu.SemaphoreType.DMA((2, NS, C)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            has_side_effects=True,
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
        return None
    dt = timed(go)
    per = dt / REPS
    nstream = 2 if mode == "rw" else 1
    gb = shape[0] * shape[1] * shape[2] * 4 * nstream / 1e9
    print(
        f"{name}: per_pass={per*1e3:.2f} ms  bw={gb/per:.0f} GB/s "
        f"(tx={tx}, C={C}, mode={mode})"
    )
    return gb / per


def main():
    n = SIZE
    print(f"device: {jax.devices()[0].device_kind}, size={n}, reps={REPS}")
    shape = (_round_up(n + 2, 8), _round_up(n + 2, 8), _round_up(n + 2, 128))
    probe_chunked(shape, 16, 1, "rw", "copy_c1 ")
    probe_chunked(shape, 16, 2, "rw", "copy_c2 ")
    probe_chunked(shape, 16, 4, "rw", "copy_c4 ")
    probe_chunked(shape, 16, 8, "rw", "copy_c8 ")
    probe_chunked(shape, 16, 4, "r", "read_c4 ")
    probe_chunked(shape, 16, 1, "r", "read_c1 ")
    probe_chunked(shape, 16, 4, "w", "write_c4")
    probe_chunked(shape, 16, 1, "w", "write_c1")


if __name__ == "__main__":
    main()
