"""Weak-scaling benchmark over a JAX device mesh.

Usage:
    python scripts/bench_scaling.py [--base 1024] [--iters 100] \
        [--devices N] [--dtype float32] [--path gspmd|shard_map]

Weak scaling: each device gets a (base x base) strip of a (N*base x base)
domain (the reference's MPI strip decomposition along X,
deeps2d_core.cpp:2143-2241); efficiency = GCUPS(N) / (N * GCUPS(1)).

On a single-chip host this still runs (N=1).  For plumbing validation on
CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu python scripts/bench_scaling.py --base 128 --iters 10
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def run(n_devices, base, iters, dtype, path, cfl, halo_ablate=False):
    from openhyperflow2d_tpu.examples import channel_deck
    from openhyperflow2d_tpu.parallel.mesh import make_mesh, shard_solver
    from openhyperflow2d_tpu.parallel.shard_step import make_shard_chunk
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    nx, ny = n_devices * base, base
    # NS + k-eps channel (same 9-equation compute path incl. species
    # transport and the chemistry property loop) WITHOUT the igniting
    # fuel/oxidizer shear layer: the reacting deck goes Tg<0 within tens
    # of iterations once the channel gets long (any CFL), which is a
    # physics property of that synthetic case, not a comm-overhead one
    deck = channel_deck(nx=nx, ny=ny, u=500.0, problem_type=1,
                        turb_model=4, turb_ext_model=4, cfl=cfl,
                        beta=0.95)
    case = build_case(deck, dtype=dtype)
    if path == "shard_map" and n_devices > 1:
        solver = Solver(case)
        mesh = make_mesh(n_devices)
        solver._chunk_fn = jax.jit(make_shard_chunk(
            solver.meta, solver.params, solver.chem,
            (solver.beta_xs, solver.beta_ys),
            (solver.cfl_xs, solver.cfl_ys),
            solver.params.TurbStartIter, mesh,
            halo_ablate=halo_ablate),
            static_argnums=(1,))
    elif n_devices > 1:
        solver = shard_solver(Solver(case), make_mesh(n_devices))
    else:
        solver = Solver(case)

    solver.run_iters(max(iters // 10, 2))        # compile + warmup
    jax.block_until_ready(solver.state.S)
    t0 = time.perf_counter()
    d = solver.run_iters(iters)
    jax.block_until_ready(solver.state.S)
    dt = time.perf_counter() - t0
    if not halo_ablate:
        # ablated runs propagate wrong seam values by design; skip the check
        assert not np.asarray(d["unstable"]).any()
    gcups = nx * ny * iters / dt / 1e9
    return gcups, dt


def halo_bytes_per_iter(base, dtype):
    """Analytic per-device halo traffic per iteration on the shard_map
    path: 2 sides x H=3 columns x Y rows x 33 slim planes x itemsize
    (parallel/shard_step.ext over every SlimState leaf)."""
    from openhyperflow2d_tpu.core.step import _SLIM_FIELDS
    planes = 9 + 9 + 4 + (len(_SLIM_FIELDS) - 3 - 1)   # S, beta, Yc, scalars
    itemsize = np.dtype(dtype).itemsize
    return 2 * 3 * base * planes * itemsize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices (0 = all)")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--path", default="gspmd",
                    choices=["gspmd", "shard_map"])
    ap.add_argument("--cfl", type=float, default=0.05)
    ap.add_argument("--halo-overhead", action="store_true",
                    help="per device count, also time a halo-ablated "
                    "shard_map run (ppermutes replaced by same-shaped "
                    "local slices) and report halo_overhead_pct = "
                    "(t_full - t_ablated) / t_full")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (the environment pins "
                    "JAX_PLATFORMS=axon via sitecustomize, so the env "
                    "var alone is not honored — this calls "
                    "jax.config.update)")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            jax.config.update("jax_enable_x64", True)
    avail = len(jax.devices())
    nmax = args.devices or avail
    results = {}
    g1 = None
    n = 1
    while n <= nmax:
        gcups, dt = run(n, args.base, args.iters, args.dtype,
                        args.path, args.cfl)
        g1 = g1 or gcups
        eff = gcups / (n * g1)
        results[n] = {"gcups_total": round(gcups, 6),
                      "gcups_per_chip": round(gcups / n, 6),
                      "weak_scaling_eff": round(eff, 3),
                      "wall_s": round(dt, 2)}
        if args.halo_overhead and n > 1:
            _, dt_abl = run(n, args.base, args.iters, args.dtype,
                            "shard_map", args.cfl, halo_ablate=True)
            if args.path != "shard_map":
                # compare like with like: time the full shard_map too
                _, dt = run(n, args.base, args.iters, args.dtype,
                            "shard_map", args.cfl)
            results[n]["halo_overhead_pct"] = round(
                100.0 * max(0.0, dt - dt_abl) / dt, 2)
            results[n]["halo_bytes_per_iter_per_dev"] = \
                halo_bytes_per_iter(args.base, args.dtype)
        print(json.dumps({"devices": n, **results[n]}), flush=True)
        n *= 2
    print(json.dumps({"metric": "weak_scaling_eff",
                      "value": results[max(results)]["weak_scaling_eff"],
                      "unit": "fraction", "vs_baseline":
                      results[max(results)]["weak_scaling_eff"] / 0.85}))


if __name__ == "__main__":
    main()
