"""Interior-specialization bounding experiment (VERDICT-r4 item 1).

The fused kernel's op stream carries a "mask tax" the reference's scalar
loop does not: every per-node branch is a select over a StaticCtx mask
plane, and both branches are computed.  PERF.md's ledger prices
physics-level fusion as the one remaining lever but never measured it.
This script measures the UPPER BOUND of everything mask-related in one
shot: it monkeypatches the kernel's StaticCtx construction to return
CONSTANT interior values (open-channel bench: active/evolve/flux masks
all-true, wall/solid/Neumann/const masks all-false, interior stencil
weights n=1, rn=0.5), so XLA/Mosaic constant-folds every select and
dead-code-eliminates the never-taken branches.  The result is numerically
WRONG at boundary nodes (edges lose their BC handling) but the op stream
is exactly what a perfectly specialized interior kernel would execute —
i.e. what a hand-fused pass1+pass2+fill with the reference's branch
structure could possibly reach on this hardware.

Usage (TPU):
    python scripts/mask_ablate_bench.py [--size 4096] [--iters 97]
    python scripts/mask_ablate_bench.py --census   (CPU jaxpr census only)

Prints JSON: baseline vs ablated GCUPS (or census totals).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_const_ctx_builders():
    """Return (build_fn, unpack_fn) producing a StaticCtx of constant
    interior values for the wall-free open-channel reacting-RANS bench
    (k-eps everywhere, no walls/solids/Neumann/const nodes)."""
    import jax
    import jax.numpy as jnp
    from openhyperflow2d_tpu.core.static_ctx import StaticCtx

    def const_ctx(meta, params, j0=0):
        p = params
        shape = meta.CT.shape
        dtype = p.jdtype
        T = jnp.full(shape, True)
        F = jnp.full(shape, False)
        T9 = jnp.broadcast_to(T, (9,) + shape)
        F9 = jnp.broadcast_to(F, (9,) + shape)
        one = jnp.full(shape, 1.0, dtype)
        half = jnp.full(shape, 0.5, dtype)
        # l_min-based planes keep their real values (float physics, not
        # masks); on the wall-free bench l_min is one constant anyway
        l_base = jnp.maximum(meta.l_min, min(p.dx, p.dy)) * 0.41
        jj = j0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
        return StaticCtx(
            evolve=T9, dxn=F9, dyn=F9, dx2=F9, dy2=F9, ddmask=T9,
            ev_flux_x=T9, ev_avg_x=F9, ev_flux_y=T9, ev_avg_y=F9,
            solid=F, fc=F, active=T, nrbc=F,
            bXl=T, bXr=T, bYu=T, bYd=T,
            n1=one, n2=one, n3=one, n4=one, rn_n=half, rm_m=half,
            dx1nn=(half / p.dx).astype(dtype),
            dy1mm=(half / p.dy).astype(dtype),
            u_const=F, v_const=F, wall_law=F, wall_ns=F, wall=F,
            turb_on=T, sig=jnp.full(shape, p.SigF, dtype),
            y_r=(jj + 0.5) * p.dy, jp1=jj + 1.0,
            m_prandtl=F, m_keps=T, m_sa=F, m_smag=F,
            kconst=F, econst=F, ewall=F, sa_bc=F,
            l_base=l_base.astype(dtype),
            n_0=(meta.l_min * 0.41).astype(dtype),
            l_s=jnp.where(l_base != 0, l_base, 1).astype(dtype),
            l_min_s=jnp.where(meta.l_min != 0, meta.l_min, 1).astype(dtype),
            dydx_ok=T, dydy_ok=T, g_dydx=T, g_dydy=T, km=T, em=T,
            react=T,
            hv_xl=F, hv_yd=F, hv_yu=F, hv_xr=F,
            hw_down=F, hw_up=F, hw_left=F, hw_right=F)

    def const_unpack(packed, meta, params, j0=0):
        return const_ctx(meta, params, j0)

    return const_ctx, const_unpack


def patch_kernel_ctx():
    """Redirect the Pallas kernel's ctx construction to the constant
    interior form (both the streamed and in-kernel decode paths, plus the
    chunk prologue/epilogue)."""
    from openhyperflow2d_tpu.ops import pallas_step
    from openhyperflow2d_tpu.core import step as core_step
    build, unpack = make_const_ctx_builders()
    pallas_step.build_static_ctx = build
    pallas_step.unpack_static_ctx = unpack
    core_step.build_static_ctx = build


def run_census(size):
    import collections
    import dataclasses
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax._src.interpreters import partial_eval as pe
    from openhyperflow2d_tpu.examples import reacting_rans_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver
    from openhyperflow2d_tpu.core.state import SolverState
    from openhyperflow2d_tpu.core.step import (expand, gfc, make_aux,
                                               pass12, shrink)
    from openhyperflow2d_tpu.core.static_ctx import build_static_ctx
    build_const, _ = make_const_ctx_builders()

    deck = reacting_rans_deck(size, size)
    case = build_case(deck, dtype="float32")
    case.params = dataclasses.replace(case.params, fast_math=True)
    s = Solver(case)
    p, meta, chem = s.params, s.meta, s.chem
    aux = make_aux((s.beta_xs, s.beta_ys), (s.cfl_xs, s.cfl_ys),
                   p.TurbStartIter, jnp.asarray(5), p.jdtype)
    src = s._src_ext
    cells = size * size

    import re

    def total_for(ctx):
        """Count POST-OPTIMIZATION HLO instruction output elements: the
        trace-level jaxpr census cannot see XLA's constant folding of
        select(const_true, a, b), which is precisely what the ablation
        triggers — so compile and parse the optimized module instead."""
        def body(slim):
            full = expand(slim, p, src)
            out, dt_new, _ = gfc(full, meta, p, chem, aux, ctx=ctx)
            out = SolverState(**{**out.__dict__, "dt": dt_new})
            S_c, beta_c, _, _, _ = pass12(out, meta, p, aux, ctx=ctx)
            return shrink(SolverState(**{**out.__dict__, "S": S_c,
                                         "beta": beta_c}))
        txt = jax.jit(body).lower(shrink(s.state)) \
            .compile().as_text()
        skip = ("parameter", "constant", "tuple", "get-tuple-element",
                "bitcast", "copy", "reshape")
        total = 0
        for m in re.finditer(
                r"=\s+(?:f32|f64|s32|u32|s8|u8|pred)\[([\d,]*)\][^ ]*\s+"
                r"([a-z-]+)", txt):
            dims, op = m.groups()
            if op in skip:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n
        return total / cells

    base = total_for(build_static_ctx(meta, p))
    abl = total_for(build_const(meta, p))
    print(json.dumps({"experiment": "mask-ablate census (opt HLO)",
                      "size": size,
                      "elems_per_cell_baseline": round(base, 1),
                      "elems_per_cell_ablated": round(abl, 1),
                      "removable_frac": round(1 - abl / base, 4)}))


def run_bench(size, iters, tile, fuse, ablate):
    import dataclasses
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from openhyperflow2d_tpu.examples import reacting_rans_deck
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    if ablate:
        patch_kernel_ctx()
    deck = reacting_rans_deck(size, size, cfl=0.2)
    case = build_case(deck, dtype="float32")
    case.params = dataclasses.replace(case.params, fast_math=True)
    solver = Solver(case, use_pallas=True, pallas_tile=tile,
                    pallas_fuse=fuse)
    solver.run_iters(iters)
    t0 = time.time()
    solver.run_iters(iters)
    dt_wall = time.time() - t0
    gcups = size * size * iters / dt_wall / 1e9
    print(json.dumps({
        "experiment": "mask-ablate bench",
        "ablated": ablate, "size": size, "iters": iters,
        "tile": list(tile), "fuse": fuse,
        "s_per_iter": round(dt_wall / iters, 5),
        "gcups": round(gcups, 4)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=97)
    ap.add_argument("--tile", default="128x256")
    ap.add_argument("--fuse", type=int, default=8)
    ap.add_argument("--census", action="store_true")
    ap.add_argument("--baseline", action="store_true",
                    help="run the same timing WITHOUT the ablation")
    args = ap.parse_args()
    if args.census:
        run_census(min(args.size, 128))
        return
    tile = tuple(int(v) for v in args.tile.split("x"))
    run_bench(args.size, args.iters, tile, args.fuse,
              ablate=not args.baseline)


if __name__ == "__main__":
    main()
