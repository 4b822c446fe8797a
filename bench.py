"""Benchmark harness: cell-updates/sec/chip on the reacting RANS case.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.  The primary metric is GCUPS/chip (BASELINE.md): grid
cells x iterations / seconds / 1e9 / chips, measured on the largest
reacting RANS (k-eps) case that fits, after a warmup compile.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    size = int(os.environ.get("BENCH_SIZE", "4096"))
    # default 97: n_iters-1 = 96 = 12 K-blocks at K=8 — no K=1 remainder
    # block, and the once-per-chunk XLA prologue/epilogue (pass12 + gfc on
    # the full grid, ~80 ms at 4096^2) amortizes to <1 ms/iter; the
    # steady-state rate is what BASELINE.md's GCUPS metric targets
    iters = int(os.environ.get("BENCH_ITERS", "97"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    # size-keyed tile default (round-5 sweep): TY=384 wins at 4096^2
    # (lower window redundancy) but loses below it (Y pad waste:
    # 2048 -> 6x384 = 2304 rows); measured 0.9245 vs 0.9709 at 2048^2
    tile_s = os.environ.get("BENCH_TILE",
                            "128x384" if size >= 4096 else "128x256")
    if "x" in tile_s:
        tile = tuple(int(v) for v in tile_s.split("x"))
    else:
        tile = (int(tile_s), int(tile_s))

    import jax
    # persistent compile cache: the solver graph takes minutes to compile
    # through the remote-compile service; cache across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from openhyperflow2d_tpu.examples import combustor_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    n_chips = len(jax.devices())
    # BENCH_WALLS=1: the walls-on variant — no-slip bottom wall with
    # conjugate heat (the Wedge-class physics: wall law/no-slip + sigma
    # weighting + CalcHeatOnWallSources) at benchmark scale
    walls = os.environ.get("BENCH_WALLS", "0") == "1"
    # Headline deck (round 5): the wall-bounded reacting combustor — the
    # old wall-less channel was never a valid SOLVE above ~512^2 (its
    # k-eps length scale l_min defaults to the domain extent, the eddy
    # viscosity scales with it, and the reference's convective-only dt
    # then violates the viscous stability limit: Tg<0 on both paths at
    # any CFL).  The combustor keeps the mixing length wall-bounded; its
    # stable CFL still shrinks slowly with grid size (mu_t ∝ channel
    # half-height), hence the size-keyed default, each value measured
    # stable over the bench horizon (validity gate below).
    cfl_default = {512: 0.2, 1024: 0.1, 2048: 0.05, 4096: 0.025}.get(
        size, 0.025)
    cfl = float(os.environ.get("BENCH_CFL", str(cfl_default)))
    # BENCH_BLUFF=1: interior bluff-body flame holder (V-gutter) — the
    # generic tile set has a mid-grid hole, exercising the multi-rect
    # specialization cover + scatter remainder instead of the
    # single-rect region split (scripts/bluff_multirect_bench.py)
    bluff = os.environ.get("BENCH_BLUFF", "0") == "1"
    deck = combustor_deck(size, size, cfl=cfl,
                          adiabatic=not walls, with_step=walls,
                          bluff_body=bluff)
    case = build_case(deck, dtype=dtype)
    if os.environ.get("BENCH_FASTMATH", "1") == "1":
        import dataclasses
        case.params = dataclasses.replace(case.params, fast_math=True)
    fuse = int(os.environ.get("BENCH_FUSE", "8"))
    solver = Solver(case, use_pallas=use_pallas, pallas_tile=tile,
                    pallas_fuse=fuse)

    # warmup: same static n_iters as the timed call so the compile is reused
    wdiags = solver.run_iters(iters)

    t0 = time.time()
    diags = solver.run_iters(iters)
    dt_wall = time.time() - t0

    steps_per_sec = iters / dt_wall
    gcups = size * size * steps_per_sec / 1e9 / max(n_chips, 1)

    # validity gate (the reference's own Tg<0 abort contract,
    # deeps2d_core.cpp:1246-1316): the timed run must be a stable SOLVE —
    # no instability flag in any timed iteration and a finite state field.
    # Checked on-device (one scalar D2H, not a 600 MB field fetch).
    import jax.numpy as jnp
    unstable = bool(np.asarray(diags["unstable"]).any()
                    or np.asarray(wdiags["unstable"]).any())
    finite = bool(jax.jit(lambda s: jnp.isfinite(s).all())(solver.state.S))
    stable = (not unstable) and finite

    path = "pallas" if use_pallas else "xla"
    case_name = ("reacting RANS combustor"
                 + (" +step+heat" if walls else "")
                 + (" +bluff-body" if bluff else ""))
    result = {
        "metric": f"GCUPS/chip ({size}x{size} {case_name}, {dtype}, "
                  f"{path}, {n_chips} chip)",
        "value": round(gcups, 4),
        "unit": "Gcell-updates/s/chip",
        "vs_baseline": round(gcups / 2.0, 4),   # target: 2 GCUPS/chip
        "steps_per_sec": round(steps_per_sec, 3),
        "stable": stable,
        "cfl": cfl,
    }
    print(json.dumps(result))
    if not stable:
        print(f"ERROR: the timed run is not a valid solve "
              f"(unstable={unstable}, finite={finite}); lower BENCH_CFL",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
