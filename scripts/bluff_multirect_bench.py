"""A/B bench: multirect region dispatch vs dual-body kernel on the
bluff-body combustor (interior solid -> the generic tile set has a
mid-grid hole, so plain single-rect region mode cannot engage).

Run each mode in a FRESH process (CLAUDE.md: a prior config's live
executable can OOM the next compile):

    BLUFF_MODE=rect python scripts/bluff_multirect_bench.py   # multirect
    BLUFF_MODE=dual python scripts/bluff_multirect_bench.py

Prints one JSON line with GCUPS and the region census.
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

    mode = os.environ.get("BLUFF_MODE", "rect")
    os.environ["HF2D_SPECMODE"] = mode
    size = int(os.environ.get("BLUFF_SIZE", "2048"))
    iters = int(os.environ.get("BLUFF_ITERS", "97"))
    cfl = float(os.environ.get("BLUFF_CFL", {2048: 0.05, 4096: 0.025}.get(
        size, 0.05)))

    from openhyperflow2d_tpu.examples import combustor_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver
    import dataclasses

    deck = combustor_deck(size, size, cfl=cfl, bluff_body=True)
    case = build_case(deck, dtype="float32")
    case = dataclasses.replace(
        case, params=dataclasses.replace(case.params, fast_math=True))
    solver = Solver(case, use_pallas=True, pallas_tile=(128, 256),
                    pallas_fuse=8)
    t0 = time.time()
    wd = solver.run_iters(iters)
    compile_s = time.time() - t0
    t0 = time.time()
    d = solver.run_iters(iters)
    np.asarray(d["RMS"])
    dt = time.time() - t0
    import jax.numpy as jnp
    unstable = bool(np.asarray(d["unstable"]).any()
                    or np.asarray(wd["unstable"]).any())
    finite = bool(jax.jit(lambda s: jnp.isfinite(s).all())(solver.state.S))
    gcups = size * size * iters / dt / 1e9
    print(json.dumps({
        "mode": mode, "size": size, "gcups": round(gcups, 4),
        "sec_per_iter": round(dt / iters, 6),
        "compile_s": round(compile_s, 1), "cfl": cfl,
        "stable": (not unstable) and finite}), flush=True)


if __name__ == "__main__":
    main()
