"""Command-line entry point: ``gpusolve <path/to/config.conf>``.

Mirrors the reference CLI surface (src/main.cpp:15-114): a positional config
file in the 14-line format, mode-dispatch to the linear/FAS solver or the
Newton driver, and the same progress lines (``Inital residual: …``,
``iter: N residual: R Took Xms``) that the reference's experiment harness
regex-parses (runExperiments.py:46).

TPU-native extensions beyond the reference surface (flags, all optional):
  --dtype {float32,float64}   storage dtype (TPU default float32; float64 for
                              exact-tolerance parity runs, emulated on TPU)
  --backend {auto,xla,pallas} op backend selection
  --mesh X,Y,Z                3-D device mesh for multi-chip domain
                              decomposition (default: single device)
  --refine                    mixed-precision iterative refinement: f64
                              residual accuracy at f32 multigrid speed
                              (solver/refine.py)
  --dump PATH                 write the final solution in Vector3::dump text
                              format (src/cpu/Vector3.cpp:56-78)
  --validate                  print max-abs error vs the analytic solution
                              (plotter.py parity, nonlinear/Newton modes)
"""

from __future__ import annotations

import argparse
import os
import sys


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="gpusolve",
        description="TPU-native 3D geometric-multigrid solver",
    )
    ap.add_argument("config", help="path to config file (14-line format)")
    ap.add_argument(
        "--dtype", choices=["float32", "float64"], default="float32"
    )
    ap.add_argument(
        "--backend",
        choices=["auto", "xla", "pallas", "cpu-native"],
        default="auto",
        help="auto/xla/pallas run on the JAX device; cpu-native runs the "
        "C++/OpenMP host backend (csrc/gpusolve_cpu.cpp)",
    )
    ap.add_argument(
        "--mesh",
        default=None,
        help="comma-separated 3-D device mesh, e.g. 2,2,2 (default: 1 device)",
    )
    ap.add_argument(
        "--dist-engine",
        choices=["gspmd", "spmd"],
        default="gspmd",
        help="distribution engine with --mesh: gspmd (partitioner-inserted "
        "collectives) or spmd (explicit shard_map+ppermute halo exchange "
        "with Pallas shard-local kernels on TPU); all modes on both",
    )
    ap.add_argument("--dump", default=None, metavar="PATH")
    ap.add_argument("--validate", action="store_true")
    ap.add_argument(
        "--save-state", default=None, metavar="PATH",
        help="write a resumable checkpoint (.npz) after solving",
    )
    ap.add_argument(
        "--load-state", default=None, metavar="PATH",
        help="resume from a checkpoint written by --save-state",
    )
    ap.add_argument(
        "--devices", action="store_true",
        help="print the visible JAX devices before solving (the analogue "
        "of the reference's OpenCL platform/device enumeration, "
        "src/sycl/ContextHandles.h:9-33)",
    )
    ap.add_argument(
        "--quiet", action="store_true", help="suppress progress lines"
    )
    ap.add_argument(
        "--check-every", type=int, default=1, metavar="K",
        help="batch K V-cycles per device launch (wavefront kernel only): "
        "the in-kernel stop test preserves the residual history and final "
        "state while amortising per-launch overhead on small grids",
    )
    ap.add_argument(
        "--cycle", choices=["V", "W", "F"], default="V",
        help="multigrid cycling schedule (beyond-reference: the reference "
        "is V-only): W recurses twice per level, F recurses F-then-V; "
        "one outer cycle = one stop-test iteration either way",
    )
    ap.add_argument(
        "--halo", choices=["ppermute", "rdma"], default="ppermute",
        help="with --dist-engine spmd: x-face slab exchange via XLA "
        "ppermute collectives or in-kernel remote DMAs "
        "(ops/pallas_spmd.rdma_exchange — pod-scale mega-kernel "
        "groundwork)",
    )
    ap.add_argument(
        "--fuse", choices=["leg", "pod"], default="leg",
        help="with --dist-engine spmd: one kernel per leg, or the "
        "pod-scale engine — ALL distributed legs per direction in one "
        "kernel with in-kernel RDMA exchange, replicated tail as one "
        "wavefront mega-kernel (dist/pod.py; x-split meshes)",
    )
    ap.add_argument(
        "--refine", action="store_true",
        help="mixed-precision iterative refinement: f64-accurate solves at "
        "f32 multigrid speed (f64 outer defect + f32 V-cycle corrections; "
        "see solver/refine.py). tol is the f64 relative-residual target, "
        "maxiter the outer-step limit",
    )
    ap.add_argument(
        "--refine-inner-tol", type=float, default=1e-3, metavar="T",
        help="relative tolerance of each inner f32 multigrid solve under "
        "--refine (values below ~kappa(A)*eps_f32 buy nothing)",
    )
    ap.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the solve into DIR "
        "(view with TensorBoard / xprof; the TPU-native analogue of the "
        "reference's Timer instrumentation, src/Timer.cpp:13-27)",
    )
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    if not os.path.isfile(args.config):
        # Reference wording: src/main.cpp:24
        print(
            f"{args.config} does not exist or is not a file", file=sys.stderr
        )
        return 1

    native = args.backend == "cpu-native"
    if args.refine:
        incompat = [
            ("--dtype float64", args.dtype == "float64"),
            ("--backend cpu-native", native),
            ("--dist-engine spmd",
             bool(args.mesh) and args.dist_engine == "spmd"),
            ("--save-state/--load-state",
             bool(args.save_state or args.load_state)),
        ]
        bad = [name for name, hit in incompat if hit]
        if bad:
            print(
                f"--refine is incompatible with {', '.join(bad)} "
                "(f32 inner solves with an f64 outer defect; distributed "
                "refinement runs on the gspmd engine)",
                file=sys.stderr,
            )
            return 1
    if (args.dtype == "float64" or args.refine) and not native:
        import jax

        jax.config.update("jax_enable_x64", True)

    from gpusolve_tpu import parse_config
    from gpusolve_tpu.config import Mode
    from gpusolve_tpu.utils.dump import compare_analytic, dump_field

    print(f"Using config file {args.config}")
    try:
        params = parse_config(
            args.config,
            dtype="float64" if native else args.dtype,
            backend="xla" if native else args.backend,
            print_progress=not args.quiet,
            cycle_type=args.cycle,
        )
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 1

    if args.profile and native:
        print(
            "--profile needs a JAX device backend (jax.profiler); the "
            "cpu-native backend has no trace hooks",
            file=sys.stderr,
        )
        return 1

    if args.cycle != "V":
        if native:
            print(
                "--cycle W/F is not available on the cpu-native backend",
                file=sys.stderr,
            )
            return 1
        if args.mesh and args.dist_engine == "spmd":
            print(
                "--cycle W/F is not available on the explicit spmd "
                "engine; use --dist-engine gspmd",
                file=sys.stderr,
            )
            return 1

    # Reference announces the mode (src/main.cpp:44-51).
    mode_msg = {
        Mode.LINEAR: "Solving linear problem",
        Mode.NONLINEAR: "Solving nonlinear problem",
        Mode.NEWTON: "Solving newton problem",
    }
    print(mode_msg[params.mode])
    if not params.properly_nested:
        print(
            "warning: grid dims are not 2^k-1-nested; coarse grids are "
            "geometrically misaligned and multigrid convergence is not "
            "guaranteed (this matches the reference's behavior)",
            file=sys.stderr,
        )

    import numpy as np

    if native:
        from gpusolve_tpu import cpu_native

        solution, history, cycle_ms = cpu_native.solve_native(
            params, with_times=True
        )
        if params.print_progress:
            if params.mode == Mode.NEWTON:
                print(f"Inital newton residual: {history[0]:.6g}")
            else:
                print(f"Inital residual: {history[0]:.6g}")
            word = "newton iter" if params.mode == Mode.NEWTON else "iter"
            for i, res in enumerate(history[1:]):
                # Real measured per-cycle wall time from the native loop
                # (csrc solve_loop/newton_loop), matching the reference's
                # per-cycle Timer prints (src/Timer.cpp:13-27).
                print(
                    f"{word}: {i} residual: {res:.6g} "
                    f"Took {int(cycle_ms[i])}ms"
                )
    else:
        import contextlib

        from gpusolve_tpu import build_grid, newton_solve, solve

        if args.devices:
            import jax

            for i, d in enumerate(jax.devices()):
                kind = getattr(d, "device_kind", "?")
                print(f"Device [{i}]: {kind} ({d.platform})")
            print(f"Using device [0]")

        profile_cm = contextlib.nullcontext()
        if args.profile:
            import jax

            profile_cm = jax.profiler.trace(
                args.profile, create_perfetto_trace=True
            )

        if args.refine:
            from gpusolve_tpu.solver.refine import solve_refine

            refine_shardings = None
            if args.mesh:
                from gpusolve_tpu.dist import level_shardings, make_mesh

                mesh_shape = tuple(int(t) for t in args.mesh.split(","))
                refine_shardings = level_shardings(
                    params.replace(dtype="float32"), make_mesh(mesh_shape)
                )
            with profile_cm:
                u, history = solve_refine(
                    params, inner_tol=args.refine_inner_tol,
                    shardings=refine_shardings,
                )
            if args.profile:
                print(f"Wrote profiler trace to {args.profile}")
            nx, ny, nz = params.grid_dim
            solution = np.asarray(u)[: nx + 2, : ny + 2, : nz + 2]
            if args.dump:
                dump_field(solution, args.dump)
                print(f"Dumped solution to {args.dump}")
            if args.validate:
                if params.mode == Mode.LINEAR:
                    print("--validate only applies to nonlinear/newton modes")
                else:
                    err = compare_analytic(solution, params.h)
                    print(f"max-abs error vs analytic solution: {err:.6g}")
            return 0

        shardings = None
        if args.mesh:
            from gpusolve_tpu.dist import level_shardings, make_mesh

            mesh_shape = tuple(int(t) for t in args.mesh.split(","))
            mesh = make_mesh(mesh_shape)
            if args.dist_engine == "spmd":
                from gpusolve_tpu.dist.spmd import (
                    gather_solution,
                    newton_solve_spmd,
                    solve_spmd,
                )

                # --backend xla/pallas selects the shard-local compute
                # path; auto picks Pallas on TPU where geometry allows.
                lb = args.backend if args.backend in ("xla", "pallas") \
                    else "auto"
                with profile_cm:
                    if params.mode == Mode.NEWTON:
                        sp_state, history, plan = newton_solve_spmd(
                            params, mesh, local_backend=lb,
                            halo=args.halo, fuse=args.fuse,
                        )
                        solution_np = gather_solution(
                            sp_state, plan, mesh, which=2
                        )
                    else:
                        sp_state, history, plan = solve_spmd(
                            params, mesh, local_backend=lb,
                            halo=args.halo, fuse=args.fuse,
                        )
                        if params.print_progress:
                            print(f"Inital residual: {history[0]:.6g}")
                            for i, res in enumerate(history[1:]):
                                print(f"iter: {i} residual: {res:.6g}")
                        solution_np = gather_solution(sp_state, plan, mesh)
                if args.profile:
                    print(f"Wrote profiler trace to {args.profile}")
                if args.dump:
                    from gpusolve_tpu.utils.dump import dump_field

                    dump_field(solution_np, args.dump)
                    print(f"Dumped solution to {args.dump}")
                if args.validate:
                    from gpusolve_tpu.utils.dump import compare_analytic

                    err = compare_analytic(solution_np, params.h)
                    print(
                        f"max-abs error vs analytic solution: {err:.6g}"
                    )
                return 0
            shardings = level_shardings(params, mesh)

        state = build_grid(params)
        history0 = []
        initial_residual = None
        if args.load_state:
            from gpusolve_tpu.utils.checkpoint import load_state

            if not os.path.isfile(args.load_state):
                print(
                    f"{args.load_state} does not exist or is not a file",
                    file=sys.stderr,
                )
                return 1
            try:
                state, it0, history0 = load_state(args.load_state, params)
            except ValueError as e:
                print(str(e), file=sys.stderr)
                return 1
            print(f"Resumed from {args.load_state} (iteration {it0})")
            # Resume fidelity: the stop threshold must keep using the
            # *original* run's initial residual (history[0]), not one
            # recomputed from the resumed state.
            if history0:
                initial_residual = history0[0]
        with profile_cm:
            if params.mode == Mode.NEWTON:
                state, history = newton_solve(
                    state, params, shardings=shardings,
                    initial_residual=initial_residual,
                )
                solution = state.levels[0].newton_v
            else:
                state, history = solve(
                    state, params, shardings=shardings,
                    initial_residual=initial_residual,
                    check_every=args.check_every,
                )
                solution = state.levels[0].v
        if args.profile:
            print(f"Wrote profiler trace to {args.profile}")
        combined = history0 + history
        if args.save_state:
            from gpusolve_tpu.utils.checkpoint import save_state

            save_state(
                args.save_state, state, params,
                iteration=len(combined) - 1,
                history=combined,
            )
            print(f"Saved state to {args.save_state}")
        # Slice the tile-aligned allocation down to the logical padded
        # region (gpusolve_tpu.grid.alloc_shape) for dump/validation parity.
        nx, ny, nz = params.grid_dim
        solution = np.asarray(solution)[: nx + 2, : ny + 2, : nz + 2]

    if args.dump:
        dump_field(solution, args.dump)
        print(f"Dumped solution to {args.dump}")
    if args.validate:
        if params.mode == Mode.LINEAR:
            print("--validate only applies to nonlinear/newton modes")
        else:
            err = compare_analytic(solution, params.h)
            print(f"max-abs error vs analytic solution: {err:.6g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
