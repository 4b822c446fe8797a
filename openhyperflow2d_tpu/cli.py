"""Command-line entry point: the hf2d_start equivalent.

Usage::

    python -m openhyperflow2d_tpu <deck.dat> [options]

Runs the deck with the reference's outer-cycle structure
(hf2d_start.cpp:32-368 + DEEPS2D_Run rank-0 work at
deeps2d_core.cpp:1716-1848): every cycle of Nstep inner iterations it
re-applies gas sources, reports XCut mass flow, appends the Tecplot
transient file, rewrites the gnuplot snapshot, writes RMS / monitor rows,
saves heat-flux profiles and Cx/Cy, checkpoints, and evaluates the exit
monitor.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="openhyperflow2d-tpu",
        description="TPU-native 2D compressible flow solver "
                    "(deck-compatible with OpenHyperFLOW2D)")
    ap.add_argument("deck", help="project deck file (.dat)")
    ap.add_argument("--dtype", default=None,
                    help="float32|float64 (default: float32 on TPU, "
                    "float64 on CPU)")
    ap.add_argument("--max-cycles", type=int, default=None)
    ap.add_argument("--serial-dt", action="store_true",
                    help="replicate the serial reference's monotone dt")
    ap.add_argument("--devices", type=int, default=0,
                    help="shard over N devices (0 = all available)")
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--restore", default=None,
                    help="checkpoint file to resume from")
    ap.add_argument("--pallas", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="use the fused Pallas TPU kernel (dt lags up to "
                    "--fuse iterations, see ops/pallas_step).  Default: "
                    "auto — ON for single-chip TPU float32 uniform-mesh "
                    "runs (the production path), OFF otherwise "
                    "(--no-pallas forces the XLA scan path)")
    ap.add_argument("--pallas-tile", default=None,
                    help="Pallas tile TXxTY (default: size-keyed — "
                    "128x384 for grids with MaxY >= 4096, the round-5 "
                    "sweep optimum, else 128x256 which avoids the "
                    "TY-padding waste measured at 2048^2; PERF.md)")
    ap.add_argument("--fuse", type=int, default=8,
                    help="iterations fused per Pallas kernel launch "
                    "(K=8 is the measured optimum at 128x384, PERF.md)")
    ap.add_argument("--fast-math", action="store_true",
                    help="reciprocal-multiply transforms (ulp-level "
                    "rounding changes)")
    ap.add_argument("--swap", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="reference .hf2d swap-file semantics: auto-resume "
                    "from <outdir>/<Project>.hf2d when present, sync it "
                    "every outer cycle (--no-swap disables)")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: jax.distributed coordinator "
                    "address host:port (launch one process per host "
                    "with --num-processes/--process-id; outputs are "
                    "written by process 0 from the per-host shard "
                    "assembly)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from .config.deck import load_deck
    from .geometry.sources import apply_sources
    from .io_out.tecplot import (save_data_2d, save_monitors_header,
                                 save_monitors_row, save_rms_header,
                                 save_rms_rows)
    from .parallel.mesh import make_mesh, shard_solver
    from .postproc.outcfd import (calc_mass_flow_rate_x, save_x_heat_flux,
                                  save_y_heat_flux)
    from .solver.checkpoint import load_checkpoint, save_checkpoint
    from .solver.init import build_case
    from .solver.runner import Solver

    from .parallel.multihost import init_distributed, is_primary
    if args.num_processes > 1:
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    platform = jax.devices()[0].platform
    dtype = args.dtype or ("float64" if platform == "cpu" else "float32")
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    os.makedirs(args.outdir, exist_ok=True)
    print(f"Load {args.deck!r} ...", flush=True)
    deck = load_deck(args.deck)
    case = build_case(deck, dtype=dtype, serial_dt_mode=args.serial_dt,
                      use_swap=args.swap, swap_dir=args.outdir)
    name = case.project_name or "out"
    print(f"X={case.params.MaxX} Y={case.params.MaxY} "
          f"dx={case.params.dx} dy={case.params.dy} dtype={dtype}")
    if case.preloaded:
        print(f"Mapping computation area from {case.swap_path!r} "
              f"(PreloadFlag=1, GlobalTime={case.preload_time:.6g})")

    if args.fast_math:
        import dataclasses
        case.params = dataclasses.replace(case.params, fast_math=True)
    if args.pallas_tile is None:
        # size-keyed default (round-5 sweep, PERF.md): TY=384 wins at
        # 4096^2 on window redundancy, loses below on Y-pad waste
        tile = (128, 384) if case.params.MaxY >= 4096 else (128, 256)
    else:
        tile = tuple(int(v) for v in args.pallas_tile.split("x"))
    n_dev = args.devices or len(jax.devices())
    use_pallas = args.pallas
    if use_pallas is None:
        # auto path selection: one production hot loop per deck, like the
        # reference (deeps2d_core.cpp:512); prints the fallback reason
        from .solver.runner import choose_step_path
        use_pallas, why = choose_step_path(
            platform, dtype, case.params.uniform_mesh, n_dev,
            args.num_processes)
        print(f"step path: "
              f"{'fused Pallas kernel' if use_pallas else 'XLA scan'} "
              f"({why})")
    solver = Solver(case, use_pallas=use_pallas, pallas_tile=tile,
                    pallas_fuse=args.fuse)
    primary = is_primary()
    if args.num_processes > 1:
        from .parallel.multihost import shard_solver_global
        shard_solver_global(solver, make_mesh(n_dev))
        if primary:
            print(f"sharded over {n_dev} devices / "
                  f"{args.num_processes} processes")
    elif n_dev > 1:
        shard_solver(solver, make_mesh(n_dev))
        print(f"sharded over {n_dev} devices")

    ckpt_path = os.path.join(args.outdir, f"{name}.ckpt.npz")
    if args.restore:
        load_checkpoint(args.restore, solver)
        print(f"restored from {args.restore}: iter={solver.last_iter} "
              f"t={solver.global_time}")

    def snapshot_cp(st):
        # per-node Calc_Cp for the final snapshot column when is_Cx_calc
        # (deeps2d_core.cpp:2664-2668)
        if not case.is_Cx_calc:
            return None
        from .postproc.outcfd import calc_cp
        fl2 = case.flow2d_list[case.Cx_params["Cx_Flow_index"] - 1]
        return calc_cp(st, case.grid, fl2)

    rms_path = os.path.join(args.outdir, f"RMS-{name}")
    mon_path = os.path.join(args.outdir, f"Monitors-{name}")
    # OutFileName = ProjectName + OutputFile; TecPlotFileName = "tp-" +
    # OutFileName; ErrFileName = ProjectName + ErrorFile
    # (deeps2d_core.cpp:2884-2887)
    plt_path = os.path.join(args.outdir, f"{name}{case.output_suffix}")
    tp_path = os.path.join(args.outdir, f"tp-{name}{case.output_suffix}")
    if primary:
        save_rms_header(rms_path)
        if case.monitor_points:
            save_monitors_header(mon_path, len(case.monitor_points))

    cycles = 0
    while True:
        t0 = time.time()
        diags, secs = solver.run_cycle()
        cycles += 1
        mrms, k = solver.max_rms(diags)
        if case.isVerboseOutput and primary:
            # per-NOutStep step log (deeps2d_core.cpp:1603-1637) from the
            # per-iteration diag history; step_time/step-rate are the
            # cycle averages (the whole cycle is one compiled scan)
            rms_h = np.asarray(diags["RMS"])
            dts_h = np.asarray(diags["dt_used"])
            it0 = solver.last_iter - rms_h.shape[0]
            names = ["Rho", "RhoU", "RhoV", "RhoE", "RhoYfu", "RhoYox",
                     "RhoYcp", "k", "eps"]
            rate = solver.stats.steps_per_sec
            d_time = case.NOutStep / max(rate, 1e-9)
            for it in range(0, rms_h.shape[0], case.NOutStep):
                mi = case.MonitorIndex
                if 0 < mi < 5:
                    kk = mi - 1
                else:
                    kk = int(rms_h[it][:4].argmax())
                print(f"Step No {it0 + it} maxRMS[{names[kk]}]="
                      f"{rms_h[it][kk] * 100:.6g} % step_time="
                      f"{d_time:.6g} sec ({rate:.6g} step/sec) "
                      f"dt={dts_h[it]:.6g}", flush=True)
        print(f"Cycle {cycles}: iter={solver.last_iter} "
              f"maxRMS[{k}]={mrms * 100:.4f}% t={solver.global_time:.6g}s "
              f"({solver.stats.steps_per_sec:.1f} step/sec)", flush=True)
        if solver.stats.dt_overrun and primary:
            print("WARNING: frozen dt exceeded the per-node CFL limit "
                  "during this cycle (fused-path dt lag); consider a "
                  "smaller --fuse or CFL", flush=True)

        # rank-0 outer-cycle work (deeps2d_core.cpp:1716-1848); sources are
        # a traced argument of the compiled chunk, so this never recompiles
        if case.sources:
            apply_sources(case.grid, case.sources, solver.last_iter)
            solver.set_sources(case.grid.Src)
        st = solver.host_state()   # collective under multi-process
        if not primary:
            # worker processes only participate in collectives + exit test
            if solver.stats.unstable:
                return 1
            if not solver.monitor_condition(diags):
                break
            if args.max_cycles and cycles >= args.max_cycles:
                break
            continue
        for (x0, y0, dyc) in case.xcuts:
            mp = calc_mass_flow_rate_x(case.grid, st, x0, y0, dyc)
            print(f"XCut x0={x0} y0={y0} dy={dyc}: mass flow {mp:.6g} kg/s")
        rms_hist = np.asarray(diags["RMS"])
        save_rms_rows(rms_path, solver.last_iter - rms_hist.shape[0],
                      rms_hist, every=case.NOutStep)
        if case.is_Cx_calc:
            # Cx/Cy plus raw Fx/Fy forces (deeps2d_core.cpp:1810-1812)
            from .postproc.outcfd import (calc_cx, calc_cy, calc_x_force,
                                          calc_y_force)
            cp = case.Cx_params
            fl2 = case.flow2d_list[cp["Cx_Flow_index"] - 1]
            body = (cp["x0_body"], cp["y0_body"], cp["dx_body"],
                    cp["dy_body"])
            cx = calc_cx(case.grid, st, *body, fl2)
            cy = calc_cy(case.grid, st, *body, fl2)
            fx = calc_x_force(case.grid, st, *body)
            fy = calc_y_force(case.grid, st, *body)
            print(f"Cx = {cx:.6g} Cy = {cy:.6g} "
                  f"Fx = {fx:.6g} Fy = {fy:.6g}")
        if case.is_Cd_calc:
            from .postproc.outcfd import calc_cd, calc_cv
            cp = case.Cx_params
            fl2 = case.flow2d_list[cp["Cd_Flow_index"] - 1]
            cd = calc_cd(case.grid, st, cp["x0_nozzle"], cp["y0_nozzle"],
                         cp["dy_nozzle"], fl2)
            cv = calc_cv(case.grid, st, cp["x0_nozzle"], cp["y0_nozzle"],
                         cp["dy_nozzle"], cp["p_ambient"], fl2)
            print(f"Cd={cd:.6g} Cv={cv:.6g}")
        if case.monitor_points:
            pr = diags.get("probes") if hasattr(diags, "get") else None
            if pr is not None:
                # per-NOutStep rows (deeps2d_core.cpp:1603-1637, 2560-2569)
                # from the probes captured inside the compiled scan
                pr = np.asarray(pr)
                dts = np.asarray(diags["dt_used"])
                tcum = (solver.global_time - dts.sum()) + np.cumsum(dts)
                for it in range(0, pr.shape[0], case.NOutStep):
                    save_monitors_row(
                        mon_path, float(tcum[it]),
                        [(row[0], row[1]) for row in pr[it]])
            else:
                # fast/fused paths: one row per outer cycle
                save_monitors_row(
                    mon_path, solver.global_time,
                    solver.probe_many([(mp.x, mp.y)
                                       for mp in case.monitor_points]))
        if cycles % max(case.NSaveStep, 1) == 0:
            cp_arr = snapshot_cp(st)
            save_data_2d(plt_path, case.grid, st, case.params,
                         solver.global_time, mode_append=False,
                         is_p_asterisk_out=case.is_p_asterisk_out,
                         cp_arr=cp_arr)
            save_data_2d(tp_path, case.grid, st, case.params,
                         solver.global_time, mode_append=(cycles > 1),
                         is_p_asterisk_out=case.is_p_asterisk_out,
                         cp_arr=cp_arr)
        if case.isOutHeatFluxX and case.flow2d_list:
            # normalization flow + wall-scan window from the deck keys
            # Cp_Flow_Index / y_max / y_min (deeps2d_core.cpp:1796,
            # 2894-2902)
            hp = case.heatflux_params
            save_x_heat_flux(os.path.join(args.outdir, f"HeatFlux-X-{name}"),
                             case.grid, st,
                             case.flow2d_list[hp["Cp_Flow_index"] - 1],
                             case.params.Ts0, hp["y_max"], hp["y_min"])
        if case.isOutHeatFluxY:
            save_y_heat_flux(os.path.join(args.outdir, f"HeatFlux-Y-{name}"),
                             case.grid, st, case.params.Ts0)
        save_checkpoint(ckpt_path, solver, st=st)
        if args.swap and case.swap_path:
            # per-cycle swap sync (deeps2d_core.cpp:1818-1848)
            from .io_out.swapfile import write_swap_file
            write_swap_file(case.swap_path, solver, case.grid, st=st)

        if solver.stats.unstable:
            err_path = os.path.join(args.outdir, f"{name}{case.error_suffix}")
            save_data_2d(err_path, case.grid, st, case.params,
                         solver.global_time,
                         is_p_asterisk_out=case.is_p_asterisk_out,
                         cp_arr=snapshot_cp(st))
            print(f"ERROR: Computational instability (Tg < 0); error "
                  f"snapshot saved to {err_path}")
            return 1
        if not solver.monitor_condition(diags):
            break
        if args.max_cycles and cycles >= args.max_cycles:
            break

    st = solver.host_state()          # collective under multi-process
    if primary:
        save_data_2d(plt_path, case.grid, st, case.params,
                     solver.global_time,
                     is_p_asterisk_out=case.is_p_asterisk_out,
                     cp_arr=snapshot_cp(st))
        print(f'Results saved in file "{plt_path}".\n\n'
              f"Ready. Computation finished.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
