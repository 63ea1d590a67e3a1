"""Weak/strong-scaling bench over a device mesh (BASELINE.md ≥80% target).

Runs the explicit-halo SPMD engine (gpusolve_tpu.dist.spmd) over an
``NX×NY×NZ`` mesh and reports per-chip stencil throughput, so scaling
efficiency is ``per_chip_nnz_per_s(mesh) / per_chip_nnz_per_s(1 chip)``.
Prints ONE JSON line per run.

Hardware note: this environment exposes a single real TPU chip (BASELINE.md),
so real multi-chip numbers are hardware-pending; the harness runs end-to-end
on the virtual CPU mesh (``--cpu N``) to keep the plumbing and the reporting
exercised, and on a pod it is the intended entry point (combine with
``gpusolve_tpu.dist.multihost.initialize`` for multi-host runs).

Usage::

    python bench_multichip.py --mesh 2,2,2 --size 127            # pod slice
    python bench_multichip.py --mesh 2,2,1 --size 63 --cpu 8     # virtual CPU
    python bench_multichip.py --mesh 1,1,1 --size 511            # 1-chip ref

Weak scaling: pass ``--size`` as the PER-CHIP extent and ``--weak`` to scale
the global grid with the mesh (global = per-chip extent × mesh extent,
rounded to the nearest 2^k−1 nestable size).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def nearest_nested(n: int) -> int:
    """Nearest 2^k−1 to ``n`` (≥15) — multigrid needs nestable level dims."""
    n = max(n, 15)
    lo = (1 << (n + 1).bit_length() - 1) - 1
    hi = 2 * lo + 1
    return lo if n - lo <= hi - n else hi


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="1,1,1",
                    help="mesh shape NX,NY,NZ (product = chips used)")
    ap.add_argument("--size", type=int, default=127,
                    help="grid extent (global; per-chip with --weak)")
    ap.add_argument("--weak", action="store_true",
                    help="scale global grid with the mesh (weak scaling)")
    ap.add_argument("--cycles", type=int, default=10)
    ap.add_argument("--check-every", type=int, default=0,
                    help="cycles per dispatch (default: all in one batch)")
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--cycle", choices=["V", "W", "F"], default="V",
                    help="cycling schedule (both engines; beyond-reference)")
    ap.add_argument("--cutoff", type=int, default=4,
                    help="per-shard extent below which levels replicate")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force CPU backend with N virtual devices")
    ap.add_argument("--halo", choices=["ppermute", "rdma"],
                    default="ppermute",
                    help="x-face slab exchange: XLA ppermute collectives or "
                    "in-kernel remote DMAs (ops/pallas_spmd.rdma_exchange)")
    ap.add_argument("--tail", choices=["auto", "pv2", "off"],
                    default="auto",
                    help="leg-engine replicated-tail mode: one pv2 "
                    "mega-kernel launch (auto: on Pallas rigs), classic "
                    "per-level ops (off), or forced (pv2 — interpret "
                    "testing)")
    ap.add_argument("--fuse", choices=["auto", "leg", "pod"], default="auto",
                    help="pod-scale fused engine, per-leg kernels, or auto "
                    "(CLI semantics: pod wherever its gates allow — the "
                    "fast engine is the default the harness benchmarks)")
    args = ap.parse_args()

    mesh_shape = tuple(int(s) for s in args.mesh.split(","))
    assert len(mesh_shape) == 3
    n_chips = mesh_shape[0] * mesh_shape[1] * mesh_shape[2]

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from bench import peak_bandwidth_gbps, vcycle_cost_model
    from gpusolve_tpu.config import GridParams, Mode, Stencil
    from gpusolve_tpu.dist import multihost, solve_spmd
    from gpusolve_tpu.dist.mesh import make_mesh

    multihost.initialize()  # no-op single-process; env-driven on pods

    if args.weak:
        size = nearest_nested(args.size * max(mesh_shape))
    else:
        size = args.size

    params = GridParams(
        maxiter=args.cycles,
        tol=1e-30,  # never stop early
        grid_dim=(size, size, size),
        mode=Mode(args.mode),
        pre_smoothing=3,
        post_smoothing=3,
        omega=0.8,
        gamma=40.0 if Mode(args.mode) != Mode.LINEAR else 1.0,
        stencil=Stencil.poisson_7pt(),
        print_progress=False,
        cycle_type=args.cycle,
    )

    # Resolve --fuse auto with the CLI's semantics (cli.py:343-375): the
    # pod engine wherever its gates allow; rdma halo and sub-capacity
    # interpret hosts pin the per-leg engine.
    if args.fuse == "auto":
        from gpusolve_tpu.dist.pod import choose_npod
        from gpusolve_tpu.dist.spmd import interpret_sync_capacity

        pod_why = None
        if args.halo != "ppermute":
            pod_why = f"--halo {args.halo} is a per-leg engine feature"
        elif (jax.default_backend() not in ("tpu", "axon")
                and n_chips > interpret_sync_capacity()):
            pod_why = (f"{n_chips} simulated devices exceed interpret "
                       f"sync capacity ({interpret_sync_capacity()})")
        else:
            folded = (mesh_shape[0], mesh_shape[1] * mesh_shape[2])
            if choose_npod(params, folded) is None:
                pod_why = "geometry/mode outside the pod gates"
        args.fuse = "leg" if pod_why else "pod"
        print(f"fuse=auto -> {args.fuse}"
              + (f" ({pod_why})" if pod_why else ""), file=sys.stderr)

    devices = jax.devices()
    if len(devices) < n_chips:
        raise SystemExit(
            f"mesh {mesh_shape} needs {n_chips} devices, "
            f"have {len(devices)} (use --cpu N for a virtual mesh)"
        )
    mesh = (
        multihost.make_topology_mesh(mesh_shape)
        if n_chips == len(devices)
        else make_mesh(mesh_shape, devices=devices[:n_chips])
    )

    # Warm-up run compiles everything (and absorbs the tunnel's first-fetch
    # stall on the axon TPU).
    warm = params.replace(maxiter=1)
    state, _, plan = solve_spmd(
        warm, mesh, cutoff=args.cutoff, halo=args.halo, fuse=args.fuse,
        tail=args.tail,
    )

    ck = args.check_every or args.cycles
    if ck > 1:  # pre-compile the batched dispatch outside the timed region
        solve_spmd(
            params.replace(maxiter=ck), mesh, cutoff=args.cutoff,
            state=state, plan=plan, initial_residual=1.0, check_every=ck,
            halo=args.halo, fuse=args.fuse, tail=args.tail,
        )
    t0 = time.perf_counter()
    _, history, _ = solve_spmd(
        params, mesh, cutoff=args.cutoff, state=state, plan=plan,
        initial_residual=1.0, check_every=ck, halo=args.halo,
        fuse=args.fuse, tail=args.tail,
    )
    dt = time.perf_counter() - t0
    per_cycle = dt / args.cycles

    itemsize = 4 if params.dtype == "float32" else 8
    nnz, _ = vcycle_cost_model(params, itemsize)
    per_chip = nnz / per_cycle / n_chips
    peak = peak_bandwidth_gbps(jax.devices()[0])

    print(json.dumps({
        "metric": f"spmd_per_chip_nnz_per_s_{size}cubed",
        "value": round(per_chip / 1e9, 3),
        "unit": "Gnnz/s/chip",
        "mesh": list(mesh_shape),
        "chips": n_chips,
        "global_size": size,
        "per_cycle_ms": round(per_cycle * 1e3, 2),
        "total_gnnz_per_s": round(nnz / per_cycle / 1e9, 3),
        "mode": Mode(args.mode).name,
        "cycle": args.cycle,  # nnz model scales with W/F level visits
        "cycles": args.cycles,
        "check_every": ck,
        "final_residual": history[-1] if history else None,
        "backend": jax.default_backend(),
        # Which distributed levels ran the Pallas shard-local kernels /
        # fused single-pass legs (vs the jnp fallback) — the round-3
        # engagement report for y/z-split meshes.
        "data_mesh": list(getattr(plan, "mesh_shape", mesh_shape)),
        "pallas_levels": list(getattr(plan, "ps_levels", [])),
        "fused_down_levels": list(
            getattr(plan, "fused_down_levels", ())
        ),
        "fused_up_levels": list(getattr(plan, "fused_up_levels", ())),
        "halo": args.halo,
        "rdma_active": bool(getattr(plan, "rdma_active", False)),
        "fuse": args.fuse,
        # Round 5: leg-engine pv2 tail (pod-style consolidation) — the
        # tail root's direct-layout allocation, or None (classic plan).
        "tail_pv2": (
            list(plan.tail_pv2)
            if getattr(plan, "tail_pv2", None) else None
        ),
        "peak_hbm_gbps_per_chip": peak,
        "processes": jax.process_count(),
    }))


if __name__ == "__main__":
    main()
