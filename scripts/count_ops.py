"""Static op-count analysis of one fused solver iteration.

Traces the rotated iteration body (gfc + pass12 — exactly what the Pallas
kernel runs per fused iteration) and histograms jaxpr primitives weighted
by output elements per grid cell.  This is the VPU work estimate: the
kernel was measured compute-bound (scripts/profile_kernel.py), so the
biggest rows here are the optimization targets.

Usage: python scripts/count_ops.py [--size 128]
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--dce", action="store_true",
                    help="dead-code-eliminate the jaxpr first, keeping "
                    "only the slim scan carry live (what the rotated "
                    "loop actually executes)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import dataclasses
    from openhyperflow2d_tpu.examples import reacting_rans_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver
    from openhyperflow2d_tpu.core.step import (SlimState, _SLIM_FIELDS,
                                               expand, gfc, make_aux,
                                               pass12, shrink)
    from openhyperflow2d_tpu.core.state import SolverState
    from openhyperflow2d_tpu.core.static_ctx import build_static_ctx

    n = args.size
    deck = reacting_rans_deck(n, n)
    case = build_case(deck, dtype="float32")
    case.params = dataclasses.replace(case.params, fast_math=True)
    s = Solver(case)
    p, meta, chem = s.params, s.meta, s.chem
    ctx = build_static_ctx(meta, p)
    aux = make_aux((s.beta_xs, s.beta_ys), (s.cfl_xs, s.cfl_ys),
                   p.TurbStartIter, jnp.asarray(5), p.jdtype)
    src = s._src_ext

    def body(slim):
        full = expand(slim, p, src)
        out, dt_new, _ = gfc(full, meta, p, chem, aux, ctx=ctx)
        out = SolverState(**{**out.__dict__, "dt": dt_new})
        S_c, beta_c, _, _, _ = pass12(out, meta, p, aux, ctx=ctx)
        out2 = SolverState(**{**out.__dict__, "S": S_c, "beta": beta_c})
        return shrink(out2) if args.dce else out2

    slim0 = shrink(s.state)
    closed = jax.make_jaxpr(body)(slim0)
    raw = closed.jaxpr
    if args.dce:
        from jax._src.interpreters import partial_eval as pe
        raw, _ = pe.dce_jaxpr(raw, [True] * len(raw.outvars))


    cells = n * n
    counts = collections.Counter()
    elems = collections.Counter()

    def walk(jx):
        for eq in jx.eqns:
            for sub in eq.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr if hasattr(sub.jaxpr, "eqns")
                         else sub)
            name = eq.primitive.name
            out_e = sum(int(v.aval.size) for v in eq.outvars
                        if hasattr(v.aval, "size"))
            counts[name] += 1
            elems[name] += out_e

    walk(raw)

    total = 0.0
    rows = []
    for name, e in elems.items():
        per_cell = e / cells
        rows.append((per_cell, name, counts[name]))
        total += per_cell
    rows.sort(reverse=True)
    print(f"== per-cell output elements by primitive "
          f"(grid {n}x{n}, {len(rows)} primitive kinds) ==")
    for per_cell, name, c in rows:
        if per_cell >= 1.0:
            print(f"{per_cell:10.1f}  {name:<28} x{c}")
    print(f"{total:10.1f}  TOTAL elements/cell/iter")


if __name__ == "__main__":
    main()
