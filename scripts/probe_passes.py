"""Per-pass cost breakdown of the wavefront mega-kernel on the real chip.

Uses pallas_vcycle2._DEBUG_MAX_PASSES to truncate the 511³ LINEAR V-cycle
after N passes; consecutive differences give each pass's device cost
(launch overhead cancels, 10 cycles per launch amortise dispatch).

A LINEAR 511³ cycle's pass list (nlev levels):
  down L0, down L1, ..., down L(n-2), coarsest, up L(n-2), ..., up L0

Usage: python scripts/probe_passes.py [cycles_per_launch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpusolve_tpu import build_grid
from gpusolve_tpu.config import GridParams, Mode, Stencil
from gpusolve_tpu.ops import pallas_vcycle2 as pv2

CYC = int(sys.argv[1]) if len(sys.argv) > 1 else 10
N = 511

params = GridParams(
    maxiter=CYC,
    tol=1e-30,
    grid_dim=(N, N, N),
    mode=Mode.LINEAR,
    pre_smoothing=3,
    post_smoothing=3,
    omega=0.8,
    gamma=1.0,
    stencil=Stencil.poisson_7pt(),
    print_progress=False,
)
full = pv2._cycle_pass_count(params)
nlev = params.num_levels
print(f"levels={nlev} passes/cycle={full} cycles/launch={CYC}")

state = build_grid(params)
levels = state.levels if hasattr(state, "levels") else state

results = {}
prev = None
# measure cumulative time at each truncation point
points = list(range(0, full + 1))
if os.environ.get("PROBE_POINTS"):
    points = [int(x) for x in os.environ["PROBE_POINTS"].split(",")]
for np_ in points:
    pv2._DEBUG_MAX_PASSES = np_ if np_ < full else None
    pv2._vcycle2_call.cache_clear()
    t_build = time.time()
    fields, norms = pv2.vcycle2_fused(
        levels, params, max_cycles=CYC, n_cycles=CYC, threshold_sq=None
    )
    float(norms[-1])  # sync (compile + run)
    compile_s = time.time() - t_build
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        fields, norms = pv2.vcycle2_fused(
            levels, params, max_cycles=CYC, n_cycles=CYC, threshold_sq=None
        )
    float(norms[-1])
    dt = (time.perf_counter() - t0) / reps / CYC * 1e3  # ms/cycle
    step = "" if prev is None else f"  (+{dt - prev:6.2f} ms)"
    print(f"passes<={np_:3d}: {dt:7.2f} ms/cycle{step}  "
          f"[compile {compile_s:.0f}s]", flush=True)
    prev = dt
pv2._DEBUG_MAX_PASSES = None
