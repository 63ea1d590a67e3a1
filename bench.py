"""Headline benchmark: stencil-nnz/s on a full linear V-cycle (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
roofline-derived target from BASELINE.json: achieved HBM bandwidth fraction
relative to the 90%-of-roofline goal (1.0 = exactly the target).  The traffic
model counts the minimal HBM bytes each V-cycle op must move at f32:

  * Jacobi sweep      read v, f; write v            → 12 B/point
  * residual          read v, f; write r            → 12 B/point
  * restriction       read fine r; write coarse f   → 4 B/pt each side
  * coarse v zero     write                         → 4 B/point
  * prolongation+add  read coarse v; write e; read v, e; write v
  * final residual+norm fused with the residual pass

Byte accounting uses the tile-aligned allocation shapes (physical = logical,
see gpusolve_tpu.grid.alloc_shape).  Default size 511 — multigrid nesting
requires 2^k-1 level dims (SURVEY's 513 would not converge; neither would it
in the reference).

Environment knobs: BENCH_SIZE (default 511), BENCH_CYCLES (default 10),
BENCH_MODE (default 0 = linear).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import json
import os
import time


# Peak HBM bandwidth per chip, GB/s (public numbers per TPU generation).
_PEAK_BW = {
    "v5 lite": 819.0,  # v5e
    "v5e": 819.0,
    "v6 lite": 1640.0,  # v6e / Trillium
    "v6e": 1640.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v5": 2765.0,  # plain "v5" == v5p
    "v3": 900.0,
    "v2": 700.0,
}


def peak_bandwidth_gbps(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in _PEAK_BW.items():
        if key in kind:
            return bw
    return 819.0  # conservative default


def vcycle_cost_model(params, itemsize: int):
    """(stencil_nnz, min_hbm_bytes) for one linear V-cycle.

    Bytes are counted on the tile-aligned allocation (physical truth); the
    prolongation is fused with the coarse-grid correction on the Pallas path
    (read coarse v + read v + write v)."""
    from gpusolve_tpu.grid import alloc_shape

    dims = params.level_dims()
    nlev = params.num_levels
    pre, post = params.pre_smoothing, params.post_smoothing
    nnz = 0
    bytes_ = 0
    for i, (nx, ny, nz) in enumerate(dims):
        interior = nx * ny * nz
        ax, ay, az = alloc_shape((nx, ny, nz))
        padded = ax * ay * az
        sweeps = pre + post
        residuals = (1 + (1 if i == 0 else 0)) if i < nlev - 1 else 0
        nnz += (sweeps + residuals) * 7 * interior
        bytes_ += (sweeps + residuals) * 3 * padded * itemsize
        if i < nlev - 1:
            cx, cy, cz = alloc_shape(dims[i + 1])
            cpad = cx * cy * cz
            # restrict r->f, zero coarse v
            bytes_ += (padded + cpad) * itemsize + cpad * itemsize
            # fused prolongate+correct: read coarse v, read v, write v
            bytes_ += (cpad + 2 * padded) * itemsize
    return nnz, bytes_


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", "511"))
    cycles = int(os.environ.get("BENCH_CYCLES", "10"))
    mode_num = int(os.environ.get("BENCH_MODE", "0"))

    import jax

    from gpusolve_tpu import build_grid
    from gpusolve_tpu.config import GridParams, Mode, Stencil
    from gpusolve_tpu.solver import vcycle as vc

    params = GridParams(
        maxiter=cycles,
        tol=0.0,  # never stop early
        grid_dim=(size, size, size),
        mode=Mode(mode_num),
        pre_smoothing=3,
        post_smoothing=3,
        omega=0.8,
        gamma=1.0,
        stencil=Stencil.poisson_7pt(),
        print_progress=False,
        dtype="float32",
    )
    tp = vc.trace_params(params)

    state = build_grid(params)
    jax.block_until_ready(state)

    fused = vc.use_fused(params, None)

    def cycle(state):
        if fused:
            return vc.vcycle_fused(state, params=tp)
        return vc.vcycle(state, params=tp, shardings=None)

    # Warm-up: compile + absorb any first-fetch tunnel stall.  The tunneled
    # remote-compile service occasionally returns a transient HTTP 500 —
    # retry a few times before giving up.
    for attempt in range(3):
        try:
            state, res = cycle(state)
            float(res)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(10)

    t0 = time.perf_counter()
    for _ in range(cycles):
        state, res = cycle(state)
    # block_until_ready is unreliable through the axon tunnel; force a
    # dependent scalar fetch instead.
    float(res)
    dt = time.perf_counter() - t0
    per_cycle = dt / cycles

    itemsize = 4 if params.dtype == "float32" else 8
    nnz, min_bytes = vcycle_cost_model(params, itemsize)
    nnz_per_s = nnz / per_cycle
    achieved_gbps = min_bytes / per_cycle / 1e9

    dev = jax.devices()[0]
    peak = peak_bandwidth_gbps(dev)
    bw_fraction = achieved_gbps / peak
    target_fraction = 0.9  # BASELINE.md: >=90% of roofline on the smoother
    vs_baseline = bw_fraction / target_fraction

    print(
        json.dumps(
            {
                "metric": f"vcycle_stencil_nnz_per_s_{size}cubed",
                "value": round(nnz_per_s / 1e9, 3),
                "unit": "Gnnz/s",
                "vs_baseline": round(vs_baseline, 4),
                "per_cycle_ms": round(per_cycle * 1e3, 2),
                "achieved_hbm_gbps": round(achieved_gbps, 1),
                "peak_hbm_gbps": peak,
                "hbm_fraction": round(bw_fraction, 4),
                "device": getattr(dev, "device_kind", str(dev)),
                "mode": Mode(mode_num).name,
                "cycles": cycles,
                "fused_kernel": fused,
            }
        )
    )


if __name__ == "__main__":
    main()
