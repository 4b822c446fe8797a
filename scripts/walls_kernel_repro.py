"""Bisect the Mosaic 'Invalid vector register cast' on walls-on decks.

Round-4 finding: BENCH_WALLS=1 never ran on hardware because the fused
kernel FAILS MOSAIC COMPILATION on the walls+heat body (the round-3
'never timed' gap was a compile error, not a missed measurement).

Usage: python scripts/walls_kernel_repro.py [--adiabatic] [--size N]
       [--tile TXxTY] [--fuse K]
Prints COMPILED or the Mosaic error class.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--adiabatic", action="store_true",
                    help="walls WITHOUT the conjugate-heat stage")
    ap.add_argument("--tile", default="128x256")
    ap.add_argument("--fuse", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    import dataclasses
    from openhyperflow2d_tpu.examples import reacting_rans_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    deck = reacting_rans_deck(args.size, args.size, wall_bottom=True,
                              adiabatic=args.adiabatic, with_step=True)
    case = build_case(deck, dtype="float32")
    case.params = dataclasses.replace(case.params, fast_math=True)
    tile = tuple(int(v) for v in args.tile.split("x"))
    s = Solver(case, use_pallas=True, pallas_tile=tile,
               pallas_fuse=args.fuse)
    try:
        s.run_iters(args.fuse + 1)
        print(f"COMPILED+RAN adiabatic={args.adiabatic} size={args.size} "
              f"tile={tile} K={args.fuse}")
    except Exception as e:
        msg = str(e)
        key = ("Invalid vector register cast" if
               "Invalid vector register cast" in msg else msg[:200])
        print(f"FAILED adiabatic={args.adiabatic}: {key}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
