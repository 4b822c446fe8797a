"""Profile the fused Pallas bench kernel: compute- vs HBM-bound diagnosis.

Measures, on the real chip:
  1. the full fused-block path (explode + kernel) at the bench config;
  2. an explode-only jit (same pad/slice/concat graph on the 33-plane carry);
  3. a pure HBM round-trip of the same byte volume (achievable bandwidth);
and derives per-iteration kernel time vs the memory-bound floor.  Writes
one JSON line per measurement and (optionally) a jax.profiler trace.

Usage: python scripts/profile_kernel.py [--size 2048] [--trace]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, *args, n=3):
    import jax
    outs = fn(*args)
    jax.block_until_ready(outs)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        outs = fn(*args)
        jax.block_until_ready(outs)
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tile", default="128x256")
    ap.add_argument("--fuse", type=int, default=4)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses
    from openhyperflow2d_tpu.examples import reacting_rans_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    size = args.size
    tile = tuple(int(v) for v in args.tile.split("x"))
    deck = reacting_rans_deck(size, size)
    case = build_case(deck, dtype="float32")
    case.params = dataclasses.replace(case.params, fast_math=True)
    solver = Solver(case, use_pallas=True, pallas_tile=tile,
                    pallas_fuse=args.fuse)

    t0 = time.time()
    solver.run_iters(args.iters)
    print(json.dumps({"what": "warmup+compile", "sec": time.time() - t0}),
          flush=True)
    t = timeit(lambda: solver.run_iters(args.iters))
    gcups = size * size * args.iters / t / 1e9
    print(json.dumps({"what": f"full path {size}^2 K={args.fuse} "
                      f"tile={args.tile}", "sec_per_iter": t / args.iters,
                      "gcups": round(gcups, 4)}), flush=True)

    # ---- explode-only cost --------------------------------------------
    from openhyperflow2d_tpu.ops import pallas_step as ps
    p = solver.params
    X, Y = p.MaxX, p.MaxY
    K = args.fuse
    TX = min(-(-tile[0] // 8) * 8, -(-X // 8) * 8)
    TY = min(-(-tile[1] // 128) * 128, -(-Y // 128) * 128)
    HX = -(-(ps.HALO * K) // 4) * 4
    nby = -(-Y // TY)
    HY = 0 if nby == 1 else 64
    nbx = -(-X // TX)
    Xp, Yp = nbx * TX, nby * TY
    WX, WY = TX + 2 * HX, TY + 2 * HY

    def explode(a):
        pad = [(0, 0)] * (a.ndim - 2) + [(HX, Xp - X + HX),
                                         (HY, Yp - Y + HY)]
        ap2 = jnp.pad(a, pad, mode="edge")
        ap2 = jnp.concatenate([ap2[..., i * TX:i * TX + WX, :]
                               for i in range(nbx)], axis=-2)
        return jnp.concatenate([ap2[..., :, j * TY:j * TY + WY]
                                for j in range(nby)], axis=-1)

    planes = jnp.zeros((33, X, Y), jnp.float32)
    exp_j = jax.jit(explode)
    t = timeit(exp_j, planes)
    print(json.dumps({"what": "explode 33 planes", "sec": t,
                      "window_redundancy": WX * WY * nbx * nby / (X * Y)}),
          flush=True)

    # ---- raw HBM copy of same volume ----------------------------------
    add1 = jax.jit(lambda a: a + 1.0)
    t = timeit(add1, planes)
    nbytes = planes.size * 4 * 2
    print(json.dumps({"what": "HBM roundtrip 33 planes (a+1)", "sec": t,
                      "gbps": round(nbytes / t / 1e9, 1)}), flush=True)

    if args.trace:
        os.makedirs("/root/repo/profiles", exist_ok=True)
        try:
            with jax.profiler.trace(f"/root/repo/profiles/"
                                    f"trace_{size}_k{args.fuse}"):
                solver.run_iters(args.iters)
            print(json.dumps({"what": "trace", "ok": True}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"what": "trace", "ok": False,
                              "err": str(e)}), flush=True)


if __name__ == "__main__":
    main()
