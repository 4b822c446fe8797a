"""Production-config correctness artifact (VERDICT-r3 item 7).

Runs the SHIPPED Pallas default (K=8, 128x256, persistent strip staging,
ctx streaming) against the reference-exact XLA path on the real TPU at
512^2 for ~4 K-blocks and reports the max relative field deviation.
The documented envelope is the K-frozen dt lag (ops/pallas_step.py:
dt frozen across K fused iterations, O(1e-3) relative drift/iter), so
PASS means every field stays within a few dt-lag units — closing the
round-3 gap where the production config was only ever exercised via
bench rc=0.

Usage: python scripts/k8_correctness.py [--size 512] [--iters 33]
Prints one JSON line; exit 1 if outside the envelope.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=33)   # 33-1 = 4 K-blocks
    ap.add_argument("--walls", action="store_true")
    ap.add_argument("--limit", type=float, default=2e-2)
    ap.add_argument("--settle", type=int, default=33,
                    help="advance this many iterations on the XLA path "
                    "first and compare from the settled common state: "
                    "through the impulsive-start transient dt swings "
                    "several %%/iter and the K-frozen dt lag dominates; "
                    "production runs spend their time quasi-steady")
    ap.add_argument("--cfl", type=float, default=0.1,
                    help="default 0.1: the bench deck's 0.25 is "
                    "transiently Tg<0-unstable at 512^2 from iteration "
                    "4 on the XLA path too (impulsive fuel/ox start) — "
                    "the artifact wants a stable trajectory")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    import dataclasses
    import numpy as np
    from openhyperflow2d_tpu.examples import reacting_rans_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    def mk():
        deck = reacting_rans_deck(args.size, args.size, cfl=args.cfl,
                                  wall_bottom=args.walls,
                                  adiabatic=not args.walls,
                                  with_step=args.walls)
        case = build_case(deck, dtype="float32")
        return dataclasses.replace(
            case, params=dataclasses.replace(case.params, fast_math=True))

    ref = Solver(mk())
    if args.settle:
        ref.run_iters(args.settle)
    pal = Solver(mk(), use_pallas=True, pallas_tile=(128, 256),
                 pallas_fuse=8)
    if args.settle:
        # deep-copy: the chunk donates its input state buffers
        import jax.numpy as jnp
        pal.state = jax.tree.map(jnp.copy, ref.state)
        pal.last_iter = ref.last_iter
    dp = pal.run_iters(args.iters)
    ref2 = Solver(mk())
    if args.settle:
        ref2.state = ref.state
        ref2.last_iter = args.settle
    dr = ref2.run_iters(args.iters)
    ref = ref2

    uns_p = bool(np.asarray(dp["unstable"]).any())
    uns_r = bool(np.asarray(dr["unstable"]).any())
    devs = {}
    for f in ["S", "U", "V", "p", "Tg", "mu_t"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(pal.state, f))
        devs[f] = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-30))
    dt_rel = float(np.abs(np.asarray(dp["dt_used"])[-1]
                          - np.asarray(dr["dt_used"])[-1])
                   / np.asarray(dr["dt_used"])[-1])
    worst = max(devs.values())
    ok = worst < args.limit
    ok = ok and not uns_p and not uns_r
    print(json.dumps({
        "config": "K=8 128x256 persistent ctx-stream"
                  + (" walls+heat" if args.walls else ""),
        "size": args.size, "iters": args.iters, "cfl": args.cfl,
        "unstable": {"pallas": uns_p, "xla": uns_r},
        "max_rel_dev": {k: round(v, 6) for k, v in devs.items()},
        "dt_rel_dev_last": round(dt_rel, 6),
        "limit": args.limit, "pass": ok}))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
