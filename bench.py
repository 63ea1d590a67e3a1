"""Headline benchmark: stencil-nnz/s on a full linear V-cycle (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the roofline-derived target from BASELINE.json: the
throughput an ideal *pass-per-op* implementation (the reference's kernel
structure, src/sycl/SyclSolver.cpp:164-466) would reach at 90% of HBM peak
with zero padding traffic.  Concretely::

    vs_baseline = achieved nnz/s / (nnz / (min_bytes / (0.90 * peak_bw)))

``min_bytes`` is the op-by-op minimum HBM traffic for one V-cycle counted on
DENSE logical volumes (no tile-alignment padding — round-1 VERDICT):

  * Jacobi sweep      read v, f; write v            -> 12 B/point
  * residual          read v, f; write r            -> 12 B/point
  * restriction       read fine r; write coarse f
  * coarse v zero     write
  * prolongation+add  read coarse v; read v; write v (fused correction)

The wavefront mega-kernel (ops/pallas_vcycle2) fuses all sweeps of a leg into
one streaming pass, so it moves ~4x *less* than ``min_bytes`` and
``vs_baseline``/``hbm_fraction`` may legitimately exceed 1.0/0.90: that is
temporal blocking beating the unfused roofline, reported as standard
"effective bandwidth".  The honest physically-streamed traffic is reported
alongside as ``actual_streamed_gb`` / ``actual_hbm_gbps`` (the kernel is
VPU-bound at that point, not HBM-bound).

Environment knobs: BENCH_SIZE (default 511), BENCH_CYCLES (default 60),
BENCH_MODE (default 0 = linear), BENCH_CHECK_EVERY (default = BENCH_CYCLES;
cycles per mega-kernel launch on the v2 path).

BENCH_CYCLES=60 (10 -> 30 in round 4, -> 60 in round 5): the mega-kernel
runs the whole batch in one launch via an in-kernel cycle loop, so the
once-per-batch norm fetch (~25-30 ms of axon-tunnel latency regardless of
size, the dominant wall-vs-device gap) amortises over more cycles.
``device_per_cycle_ms`` is the batch-size-independent kernel time
(9.40 ms at 511^3 as of round 5); ``check_every`` travels in the JSON so
rounds remain comparable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import json
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
    """(stencil_nnz, min_hbm_bytes) for one cycle of the reference's
    pass-per-op structure, counted on dense logical (interior+halo) volumes.

    Honors ``params.cycle_type``: W/F cycles visit level ``l`` more than
    once per cycle (the same visit recursion the mega-kernel's pass budget
    uses, ops/pallas_vcycle2._level_visits), so their nnz/bytes reflect the
    work actually done rather than the V-cycle visit model.
    """
    from gpusolve_tpu.ops.pallas_vcycle2 import _level_visits

    dims = params.level_dims()
    nlev = params.num_levels
    pre, post = params.pre_smoothing, params.post_smoothing
    visits = _level_visits(nlev, getattr(params, "cycle_type", "V"))
    nnz = 0
    bytes_ = 0
    for i, (nx, ny, nz) in enumerate(dims):
        interior = nx * ny * nz
        dense = (nx + 2) * (ny + 2) * (nz + 2)
        sweeps = (pre + post) * visits[i]
        # one residual+restrict per non-coarsest visit, plus the
        # once-per-cycle convergence-check residual at the finest level
        residuals = (visits[i] + (1 if i == 0 else 0)) if i < nlev - 1 else 0
        nnz += (sweeps + residuals) * 7 * interior
        bytes_ += (sweeps + residuals) * 3 * dense * itemsize
        if i < nlev - 1:
            cx, cy, cz = dims[i + 1]
            cdense = (cx + 2) * (cy + 2) * (cz + 2)
            # per visit: restrict r->f + zero coarse v, then fused
            # prolongate+correct (read coarse v, read v, write v)
            bytes_ += visits[i] * (
                (dense + cdense) * itemsize + cdense * itemsize
                + (cdense + 2 * dense) * itemsize
            )
    return nnz, bytes_


def wavefront_traffic_model(params, itemsize: int):
    """Physically-streamed HBM bytes per V-cycle of the wavefront mega-kernel
    (ops/pallas_vcycle2) under the LINEAR/NEWTON recompute schedule: the down
    pass reads f (plus v at the finest level) and writes only the coarse RHS
    — v's pre-smoothed state is re-derived by the up pass, which reads f
    (plus v at the finest level) and the coarse correction and writes v.
    Lane (z) traffic is the dense ``z_live`` extent.
    """
    from gpusolve_tpu.config import Mode
    from gpusolve_tpu.grid import alloc_shape
    from gpusolve_tpu.ops import pallas_vcycle2 as pv2

    dims = params.level_dims()
    nlev = params.num_levels
    vol = []
    for d in dims:
        ax, ay, az = alloc_shape(d)
        vol.append(ax * ay * pv2.z_live(d, (ax, ay, az)) * itemsize)
    nv = 1 if params.mode == Mode.NEWTON else 0  # newton_v streams per pass
    bytes_ = 0
    for l in range(nlev):
        rec = (
            params.mode != Mode.NONLINEAR
            and pv2._RECOMPUTE_FROM_LEVEL is not None
            and l >= pv2._RECOMPUTE_FROM_LEVEL
        )
        v_in = vol[l] if (l == 0 or params.mode == Mode.NONLINEAR) else 0
        if l == nlev - 1:
            # coarsest: read f (+nv) (+v unless zero start), write v
            bytes_ += (1 + nv) * vol[l] + v_in + vol[l]
        elif rec:
            # recompute schedule: down reads f (+v at l=0, +nv), writes
            # coarse f; up re-reads the same and the coarse v, writes v
            bytes_ += (1 + nv) * vol[l] + v_in + vol[l + 1]
            bytes_ += (1 + nv) * vol[l] + v_in + vol[l + 1] + vol[l]
        else:
            # write-back schedule: down reads v,f (+nv), writes v +
            # coarse f; up reads v,f (+nv) + coarse v, writes v
            bytes_ += (2 + nv) * vol[l] + vol[l] + vol[l + 1]
            bytes_ += (2 + nv) * vol[l] + vol[l + 1] + vol[l]
    return bytes_


def _xplane_device_ms(trace_dir: str, match: str):
    """Sum the device-side durations (ms) of XLA modules whose name
    contains ``match`` in a jax.profiler xplane trace — the tunnel-immune
    measurement of kernel time (host wall time through the axon tunnel
    carries launch/fetch latency the chip never sees)."""
    import glob
    import importlib.util

    pb = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")
    )
    if not pb:
        return None
    spec = None
    for cand in glob.glob(
        "/opt/venv/lib/python3*/site-packages/tensorflow/tsl/profiler/"
        "protobuf/xplane_pb2.py"
    ):
        spec = importlib.util.spec_from_file_location("xplane_pb2", cand)
        break
    if spec is None:
        return None
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    xs = mod.XSpace()
    with open(pb[0], "rb") as fh:
        xs.ParseFromString(fh.read())
    total = 0.0
    found = False
    for p in xs.planes:
        if not p.name.startswith("/device:"):
            continue
        em = {k: v.name for k, v in p.event_metadata.items()}
        for line in p.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                if match in em.get(ev.metadata_id, ""):
                    total += ev.duration_ps / 1e9
                    found = True
    return total if found else None


def session_ceiling_gbps() -> float:
    """This session's streaming ceiling: a chained elementwise pass
    (read 1 + write 1 volume per step) with many steps per dispatch, so
    launch/fetch overhead amortises away.  Recorded in the bench JSON so
    the DMA-ceiling claim travels with same-session evidence
    (round-2 VERDICT item 5)."""
    import jax
    import jax.numpy as jnp

    # 512 MB: decisively larger than VMEM (128 MB on v5e) so the chain
    # streams HBM, not a VMEM-resident buffer.
    n = 512 * 1024 * 1024 // 4
    reps = 40  # ~43 GB total: tunnel launch/fetch latency amortises

    @jax.jit
    def chain(x):
        for _ in range(reps):
            # The barrier keeps XLA from fusing the chain into one pass
            # (a fused chain reads/writes HBM once and "measures" fantasy
            # bandwidth — the round-2 verdict's own probe trap).
            x = jax.lax.optimization_barrier(x * 1.0000001 + 1e-12)
        return x

    import shutil
    import tempfile

    x = jnp.ones((n,), jnp.float32)
    chain(x).block_until_ready()  # compile
    tdir = tempfile.mkdtemp(prefix="bench_ceiling_")
    try:
        t0 = time.perf_counter()
        with jax.profiler.trace(tdir):
            chain(x).block_until_ready()
        dt = time.perf_counter() - t0
        # Prefer the device-side duration (tunnel-immune); fall back to
        # wall time when no trace materialises.
        dev_ms = _xplane_device_ms(tdir, "chain")
        if dev_ms:
            dt = dev_ms / 1e3
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return 2 * 4 * n * reps / dt / 1e9


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", "511"))
    cycles = int(os.environ.get("BENCH_CYCLES", "60"))
    mode_num = int(os.environ.get("BENCH_MODE", "0"))
    check_every = int(os.environ.get("BENCH_CHECK_EVERY", str(cycles)))

    import jax

    from gpusolve_tpu import build_grid
    from gpusolve_tpu.config import GridParams, Mode, Stencil
    from gpusolve_tpu.solver import vcycle as vc

    params = GridParams(
        maxiter=cycles,
        tol=1e-30,  # never stop early
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

    fused2 = vc.use_fused2(params, None)
    fused = (not fused2) and vc.use_fused(params, None)

    def run_solve():
        """One full solve (maxiter cycles, no early stop) from a fresh grid;
        returns wall seconds for the cycle loop only (initial residual and
        state construction excluded)."""
        state = build_grid(params)
        state, r0 = vc.residual_norm(state, params=tp)
        float(r0)  # sync: compile + first-fetch stall absorbed here
        t0 = time.perf_counter()
        vc.solve(
            state, params, initial_residual=float(r0),
            check_every=check_every,
        )
        return time.perf_counter() - t0

    # Warm-up: compile + absorb any first-fetch tunnel stall.  The tunneled
    # remote-compile service occasionally returns a transient HTTP 500 —
    # retry a few times before giving up.
    for attempt in range(3):
        try:
            run_solve()
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(10)

    dt = min(run_solve() for _ in range(2))
    per_cycle = dt / cycles

    itemsize = 4 if params.dtype == "float32" else 8
    nnz, min_bytes = vcycle_cost_model(params, itemsize)
    nnz_per_s = nnz / per_cycle
    effective_gbps = min_bytes / per_cycle / 1e9

    dev = jax.devices()[0]
    peak = peak_bandwidth_gbps(dev)
    bw_fraction = effective_gbps / peak
    target_fraction = 0.9  # BASELINE.md: >=90% of roofline on the smoother
    vs_baseline = bw_fraction / target_fraction

    out = {
        "metric": f"vcycle_stencil_nnz_per_s_{size}cubed",
        "value": round(nnz_per_s / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(vs_baseline, 4),
        "per_cycle_ms": round(per_cycle * 1e3, 2),
        "effective_hbm_gbps": round(effective_gbps, 1),
        "peak_hbm_gbps": peak,
        # ``effective_hbm_fraction`` credits the fused kernel with the
        # pass-per-op traffic model's bytes (temporal blocking can push it
        # past 1.0 — it is a fusion-credit metric, not a physical roofline
        # fraction; round-2 ADVICE).  The physical fraction
        # (actually-streamed bytes / peak) is emitted as ``hbm_fraction``
        # below once the streamed traffic is known.
        "effective_hbm_fraction": round(bw_fraction, 4),
        "device": getattr(dev, "device_kind", str(dev)),
        "mode": Mode(mode_num).name,
        "cycles": cycles,
        "fused_kernel": bool(fused2 or fused),
    }
    if fused2:
        streamed = wavefront_traffic_model(params, itemsize)
        out["kernel"] = "wavefront_v2"
        out["check_every"] = check_every
        out["actual_streamed_gb"] = round(streamed / 1e9, 2)
        out["actual_hbm_gbps"] = round(streamed / per_cycle / 1e9, 1)
        out["hbm_fraction"] = round(streamed / per_cycle / 1e9 / peak, 4)
    else:
        # Pass-per-op structure: the model's bytes ARE the physical bytes.
        out["hbm_fraction"] = round(bw_fraction, 4)

    # Self-verifying accounting (round-2 VERDICT item 5): device-side
    # kernel time from a profiler trace (immune to the axon tunnel's
    # launch/fetch latency — at 511³ the wall headline carries ~3 ms/cycle
    # of it) and this session's measured streaming ceiling.
    try:
        import shutil
        import tempfile

        import jax as _jax

        tdir = tempfile.mkdtemp(prefix="bench_prof_")
        try:
            state = build_grid(params)
            state, r0 = vc.residual_norm(state, params=tp)
            r0 = float(r0)
            with _jax.profiler.trace(tdir):
                vc.solve(
                    state, params, initial_residual=r0,
                    check_every=check_every,
                )
            dev_ms = _xplane_device_ms(tdir, "vcycle")
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
        if dev_ms:
            out["device_per_cycle_ms"] = round(dev_ms / cycles, 2)
            if fused2:
                dev_gbps = streamed / (dev_ms / cycles / 1e3) / 1e9
                out["device_hbm_gbps"] = round(dev_gbps, 1)
                out["device_hbm_fraction"] = round(dev_gbps / peak, 4)
    except Exception:
        pass
    try:
        out["session_ceiling_gbps"] = round(session_ceiling_gbps(), 1)
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
