"""Time make_pallas_shard_chunk overlap=True vs False (2-device CPU mesh).

VERDICT-r3 item 6: the Isend/Irecv->work->Wait structure
(parallel/shard_step.py, mirroring deeps2d_core.cpp:1336-1409) had never
been TIMED, only equivalence-tested.  The 2-device CPU mesh is the one
configuration where SCALING_r03 measured a real halo term (13.6%), so it
bounds whether the trade (2 x H*K edge columns of XLA-path compute per
block vs a hidden ppermute) can ever pay below pod scale.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=2 \
       python scripts/overlap_timing.py [--size 768] [--iters 33]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=768)
    ap.add_argument("--iters", type=int, default=33)
    ap.add_argument("--fuse", type=int, default=8)
    ap.add_argument("--tile", default="64x128")
    ap.add_argument("--devices", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import dataclasses
    from openhyperflow2d_tpu.examples import reacting_rans_deck
    from openhyperflow2d_tpu.parallel.mesh import make_mesh
    from openhyperflow2d_tpu.parallel.shard_step import \
        make_pallas_shard_chunk
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    assert len(jax.devices()) >= args.devices, \
        "set XLA_FLAGS=--xla_force_host_platform_device_count=N"
    tile = tuple(int(v) for v in args.tile.split("x"))
    out = {}
    for overlap in (False, True):
        deck = reacting_rans_deck(args.size, args.size)
        case = build_case(deck, dtype="float32")
        case = dataclasses.replace(
            case, params=dataclasses.replace(case.params, fast_math=True))
        s = Solver(case)
        mesh = make_mesh(args.devices)
        s._chunk_fn = jax.jit(make_pallas_shard_chunk(
            s.meta, s.params, s.chem, (s.beta_xs, s.beta_ys),
            (s.cfl_xs, s.cfl_ys), s.params.TurbStartIter, mesh,
            tile=tile, fuse_iters=args.fuse, overlap=overlap),
            static_argnums=(1,))
        s.run_iters(args.iters)          # compile
        t0 = time.time()
        d = s.run_iters(args.iters)
        np.asarray(d["RMS"])
        dt = time.time() - t0
        out["overlap" if overlap else "sequential"] = dt / args.iters
        del s
    ratio = out["overlap"] / out["sequential"]
    print(json.dumps({
        "size": args.size, "devices": args.devices, "fuse": args.fuse,
        "tile": args.tile,
        "sec_per_iter_sequential": round(out["sequential"], 5),
        "sec_per_iter_overlap": round(out["overlap"], 5),
        "overlap_vs_sequential": round(ratio, 4)}))


if __name__ == "__main__":
    main()
