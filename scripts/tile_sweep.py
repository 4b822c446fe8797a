"""Autotune sweep over Pallas tile/K configs at the bench size.

Each config is a fresh compile (minutes through the remote-compile
tunnel; results land in the persistent cache).  Prints one JSON line per
config with GCUPS and the analytic window redundancy.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import dataclasses
    from openhyperflow2d_tpu.examples import combustor_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    size = int(os.environ.get("SWEEP_SIZE", "2048"))
    iters = int(os.environ.get("SWEEP_ITERS", "50"))
    configs = os.environ.get(
        "SWEEP_CONFIGS",
        "128x512x4,128x512x2,256x512x4,128x1024x2,128x256x2").split(",")

    # round-5: sweep the headline combustor deck at its size-keyed
    # stable CFL (bench.py) so every timed config is also a valid solve
    cfl = {512: 0.2, 1024: 0.1, 2048: 0.05, 4096: 0.025}.get(size, 0.025)
    deck = combustor_deck(size, size, cfl=cfl)
    case0 = build_case(deck, dtype="float32")

    for cfg in configs:
        tx, ty, k = (int(v) for v in cfg.split("x"))
        case = dataclasses.replace(
            case0, params=dataclasses.replace(case0.params, fast_math=True))
        try:
            solver = Solver(case, use_pallas=True, pallas_tile=(tx, ty),
                            pallas_fuse=k)
            t0 = time.time()
            solver.run_iters(iters)
            compile_s = time.time() - t0
            t0 = time.time()
            d = solver.run_iters(iters)
            np.asarray(d["RMS"])
            dt = time.time() - t0
            # analytic window redundancy
            X = Y = size
            TX = min(-(-tx // 8) * 8, -(-X // 8) * 8)
            TY = min(-(-ty // 128) * 128, -(-Y // 128) * 128)
            from openhyperflow2d_tpu.ops.pallas_step import halo_depth
            HX = -(-(halo_depth(case.params) * k) // 4) * 4
            nby = -(-Y // TY)
            HY = 0 if nby == 1 else 64
            nbx = -(-X // TX)
            red = ((TX + 2 * HX) * (TY + 2 * HY) * nbx * nby) / (X * Y)
            gcups = size * size * iters / dt / 1e9
            print(json.dumps({"cfg": cfg, "gcups": round(gcups, 4),
                              "sec_per_iter": dt / iters,
                              "redundancy": round(red, 3),
                              "compile_s": round(compile_s, 1)}),
                  flush=True)
            del solver
        except Exception as e:   # noqa: BLE001
            print(json.dumps({"cfg": cfg,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
