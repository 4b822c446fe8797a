"""Fused Pallas TPU kernel for the rotated solver iteration.

One kernel invocation performs ``fuse_iters`` (= K) whole iterations per
(TX, TY) tile: [gradients -> FillNode2D -> chemistry -> wall heat ->
pass 1 -> pass 2 (commit + beta)] x K.  The physics is the *same* stage
code as the XLA path (core/step.py, core/physics.py) evaluated on VMEM
blocks, so the two paths cannot drift apart; the static bit-flag decode
(core/static_ctx.py) runs once per invocation and amortizes over the K
fused iterations.

Tiling: one fused iteration needs a halo ring H = halo_depth(params):
3 when a d2*-NULL soft BC is present (deepest chain: center pass-1 needs
neighbor dSdx, which needs flux A two cells out, which needs gradients
three cells out), else 2 (center <- A/B/SrcAdd at +-1 <- gradients /
turbulence S-reads at +-2); K iterations need H*K.
Overlapping halo windows are not expressible as standard (aligned,
disjoint) BlockSpec blocks, so the window halos are staged one of two
ways (edge replication at the grid boundary == the XLA path's
edge-replicated shifts; out-of-range values are masked by the
reference's idXl/idXr/idYu/idYd neighbor flags):

* persistent/strip staging (default): the carry stays COMPACT; per
  K-block XLA slices each tile's 2·HX halo rows and 2·HY halo columns
  into two small strip arrays, and the kernel assembles the (TX+2HX,
  TY+2HY) window in VMEM from [x-strip | y-strip|center|y-strip |
  x-strip], writing the center back in place (input/output aliased).
* exploded staging (HF2D_PERSIST=0): edge-replicated pad + static
  slice/concat lays every window out contiguously up front — one extra
  full HBM round trip of the ~33-plane carry per K-block (~2.8x the
  carry bytes vs the strips' ~(2HX/TX + 2HY/TY) fraction), which is
  what made small-K / low-redundancy windows unaffordable before.

The kernel then runs a standard auto-pipelined BlockSpec grid, computes
everything redundantly on the halo, and writes back only the (TX, TY)
center.  Alignment forces HY = 64 >= H*K when Y is tiled (so temporal
blocking in Y is free up to K=32 at H=2) and HX = H*K rounded up to a
multiple of 4.

dt semantics on this path: the global dt reduction is evaluated at scan
level from the carried primitives and FROZEN across the K fused
iterations (a global scalar cannot be re-reduced mid-kernel without a
grid barrier).  For K=1 this gives the primitives one extra iteration of
lag relative to the reference's already-lagged dt (deeps2d_core.cpp:
805-825); for K>1 the lag grows to at most K iterations.  CFL-limited dt
drifts O(1e-3) relative per iteration; the XLA path keeps the
reference-exact pairing and remains the validation reference.

``_machinery`` is shared with the multi-chip path
(parallel/shard_step.make_pallas_shard_chunk): each shard runs the same
fused kernel on its halo-extended local block, with ppermute halo
exchange once per K-iteration block and pmin/psum hooks for the dt/RMS
reductions.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import flags as fl
from ..core.physics import node_masks, _safe_div
from ..core.state import ChemTables, GridMeta, SolverParams, SolverState
from ..core.physics import band
from ..core.static_ctx import (N_CTX_WORDS, build_packed_ctx,
                               build_static_ctx, generic_interior_map,
                               specialized_interior_ctx, unpack_static_ctx)
from ..core.step import (SlimState, StepAux, expand, gfc, make_aux,
                         needs_y_plus, pass12, shrink, _SLIM_FIELDS)

HALO = 3    # worst-case per-iteration dependency depth (d2-BC cases)


def halo_depth(params) -> int:
    """Per-iteration stencil dependency depth of one fused iteration.

    The deepest chain is: pass-1 center <- neighbor dSdx (only when a
    d2*-NULL soft BC is present: dXX averages dSdx_new at +-1,
    core/step.py pass12) <- flux A at +-2 <- gradients at +-3.  Without
    d2 flags the chain is: center <- A/B/SrcAdd at +-1 <- gradients /
    turbulence-model S-reads at +-2, so a halo of 2 suffices — verified
    bitwise against the XLA path by the interpret-mode tests on d2-free
    decks (tests/test_pallas.py).  ``HF2D_HALO`` overrides (A/B lever).
    """
    need = 3 if (params.has_d2x or params.has_d2y) else 2
    env = os.environ.get("HF2D_HALO", "")
    if env:
        if int(env) < need:
            raise ValueError(
                f"HF2D_HALO={env} under-provisions the stencil "
                f"dependency depth ({need} for this case) — results "
                "would be silently wrong")
        return int(env)
    return need


# slim leaves staged through the kernel (dt is a scalar, passed via SMEM)
SLIM_BIG = [f for f in _SLIM_FIELDS if f != "dt"]
META_BIG = ["CT", "TCT", "idXl", "idXr", "idYu", "idYd", "BGX", "BGY",
            "Uw", "Vw", "l_min"]
CHEM_FIELDS = [f.name for f in ChemTables.__dataclass_fields__.values()]


def _default_vmem(vmem_limit_bytes):
    if vmem_limit_bytes is None:
        return int(os.environ.get("HF2D_VMEM_MB", "110")) << 20
    return vmem_limit_bytes


def _rect_cover(flags, cap=6):
    """Greedy exact cover of a boolean tile map by disjoint rectangles.

    Repeatedly removes the largest all-True axis-aligned rectangle
    (classic max-rectangle-in-histogram sweep).  Returns a list of
    (x0, x1, y0, y1) half-open tile rects, or None if more than ``cap``
    rects would be needed — the region-split dispatch then falls back
    to the dual-body kernel (a long region list would trade the ~20%
    dual tax for per-call overheads and a combinatorial kernel cache).
    """
    m = np.array(flags, bool)
    rects = []
    while m.any():
        if len(rects) == cap:
            return None
        nx, ny = m.shape
        hist = np.zeros(ny, np.int64)
        best = (0, None)
        for i in range(nx):
            hist = np.where(m[i], hist + 1, 0)
            # largest rectangle in histogram ending at row i
            stack = []          # (start_col, height)
            for j, hh in enumerate(list(hist) + [0]):
                start = j
                while stack and stack[-1][1] >= hh:
                    s, ph = stack.pop()
                    area = ph * (j - s)
                    if area > best[0]:
                        best = (area, (i - ph + 1, i + 1, s, j))
                    start = s
                stack.append((start, hh))
        _, (x0, x1, y0, y1) = best
        rects.append((x0, x1, y0, y1))
        m[x0:x1, y0:y1] = False
    return rects


def _machinery(meta, params, chem, beta_tab, cfl_tab, turb_start,
               tile, K, vmem_limit_bytes, interior_x=None,
               red_sum=None, red_max=None, red_min=None, k_loop=None,
               persistent=False, y_plus=None, lam_t_const=None,
               spec_map=None):
    """Build the fused-kernel machinery; returns a namespace with
    ``make_block`` / ``aux_at`` / ``scan_dt`` / ``explode`` / ``crop`` /
    ``refresh``.

    ``meta`` may be a traced value (the multi-chip path calls
    this inside shard_map on the halo-extended local block).  The
    volumetric source field is a runtime argument of each block (so
    source-bearing decks can update it per outer cycle without a
    recompile).
    ``interior_x``: optional (lo, hi) padded-X range; RMS/DD/instability
    partials only count columns in it (shard halo columns are computed
    redundantly on every shard and must not be double-reduced).
    ``red_sum/red_max/red_min``: reduction hooks applied after the local
    reduction (identity on one device; psum/pmax/pmin across a mesh).
    ``persistent``: strip-staged halo windows.  The slim carry stays in
    the COMPACT (Xp, Yp) layout across K-blocks (input/output aliased
    through the kernel), and instead of re-staging full overlapping
    (WX, WY) windows through the exploded layout every block, only the
    halo RINGS are staged: per block, XLA slices 2·HX halo rows and
    2·HY halo columns per tile out of the carry into two small strip
    arrays (disjoint, alignment-friendly blocks), and the kernel
    assembles each tile's window in VMEM from [x-strip | center+y-strips
    | x-strip].  This removes the full compact->exploded HBM round trip
    of the ~33-plane carry per K-block (explode traffic ~2.8x the carry
    size; strips are ~(2HX/TX + 2HY/TY) of it), which is what made
    small K / large-window low-redundancy tiles unaffordable.
    ``make_block`` then takes/returns a SlimState with (Xp, Yp) planes;
    pad/slice at the chunk boundaries (see make_pallas_chunk).
    """
    p = params
    ident = lambda x: x     # noqa: E731
    red_sum = red_sum or ident
    red_max = red_max or ident
    red_min = red_min or ident
    if k_loop is None:
        # rolled K-loop by default: caps Mosaic compile time and VMEM
        # liveness, and measured slightly faster than the unrolled form
        # (0.537 vs 0.48-0.52 GCUPS at 2048^2 K=4; scripts/tile_sweep.py)
        k_loop = os.environ.get("HF2D_KLOOP", "1") == "1"
    TX, TY = tile
    # Pallas TPU blocks must have their last two dims divisible by (8, 128):
    # round the tile up and use asymmetric halos that preserve divisibility.
    X, Y = p.MaxX, p.MaxY
    TX = min(-(-TX // 8) * 8, -(-X // 8) * 8)
    TY = min(-(-TY // 128) * 128, -(-Y // 128) * 128)
    HX = -(-(halo_depth(p) * K) // 4) * 4
    # Y halo: lane alignment forces HY = 64 between tiles, but when one tile
    # spans the whole Y extent the window edge IS the grid edge (the explode
    # pad's edge replication == the XLA path's edge-replicated shifts), so
    # no halo is needed at all — this removes the largest redundant-compute
    # term (e.g. 128x256 tiles: window/center 1.78x -> 1.19x at full Y) and
    # lifts the 3K <= 64 temporal-blocking limit in Y.
    nby_pre = -(-Y // TY)
    HY = 0 if nby_pre == 1 else 64
    assert K >= 1 and (HY == 0 or halo_depth(p) * K <= HY), \
        "fuse_iters limited by the Y halo (64) when Y is tiled"
    nbx = -(-X // TX)
    nby = nby_pre
    Xp, Yp = nbx * TX, nby * TY
    WX, WY = TX + 2 * HX, TY + 2 * HY
    dtype = p.jdtype

    # interior specialization (HF2D_SPEC, default on): tiles whose whole
    # window lies inside the generic-interior node map run a second
    # kernel branch whose StaticCtx masks are Python-bool constants —
    # the fold-aware combinators then remove the mask select/logic ops
    # at trace time (bitwise-identical results; ~23% less tile work,
    # measured by the all-constant ablation: scripts/mask_ablate_bench).
    spec_flags = None
    if (spec_map is not None
            and os.environ.get("HF2D_SPEC", "1") == "1"):
        sm_np = np.asarray(spec_map)
        flags = np.zeros((nbx, nby), np.int32)
        for si in range(nbx):
            sx0, sx1 = si * TX - HX, si * TX + TX + HX
            if sx0 < 0 or sx1 > X:
                continue            # window leaves the real extent
            for sj in range(nby):
                sy0, sy1 = sj * TY - HY, sj * TY + TY + HY
                if sy0 < 0 or sy1 > Y:
                    continue
                flags[si, sj] = int(sm_np[sx0:sx1, sy0:sy1].all())
        if flags.any():
            spec_flags = flags            # 2-D host array; see below
    # Execution mode for the specialization:
    # * "rect": the specialized tiles form an exact rectangle (the usual
    #   case — an open interior inside a boundary frame).  The K-block is
    #   issued as up to 5 SINGLE-BODY pallas calls (one specialized
    #   rectangle + 4 general frame slabs) chained in place through
    #   input/output aliasing — measured ~20% faster than the dual-body
    #   branch form (a two-body kernel degrades Mosaic's pipeline even
    #   for tiles that take the cheap branch: spec-all 17.2 ms/iter vs
    #   14.3 for the single-body ablation at 4096^2).
    # * "multirect": the spec set has holes (interior solids) but still
    #   covers with a few disjoint rectangles — one single-body spec
    #   call per rectangle, plus ONE scatter call (scalar-prefetch tile
    #   table) for the non-rectangular general remainder.
    # * "dual": cover too fragmented (or HF2D_SPECMODE=dual) — one
    #   kernel with both bodies and a per-tile SMEM flag dispatch.
    spec_mode = None
    rect = None
    rect_list = None
    if spec_flags is not None:
        tis, tjs = np.nonzero(spec_flags)
        rx0, rx1 = int(tis.min()), int(tis.max()) + 1
        ry0, ry1 = int(tjs.min()), int(tjs.max()) + 1
        mode_env = os.environ.get("HF2D_SPECMODE", "rect")
        if mode_env == "rect" and spec_flags[rx0:rx1, ry0:ry1].all():
            spec_mode = "rect"
            rect = (rx0, rx1, ry0, ry1)
        elif mode_env == "rect":
            # scattered spec set (interior solids punch holes in the
            # generic interior): cover it with a few disjoint spec
            # rectangles; the non-spec remainder is non-rectangular, so
            # it runs as ONE scatter call (tile table via scalar
            # prefetch — measured perf-neutral vs slab calls).  Falls
            # back to the dual-body kernel when the cover fragments.
            cover = _rect_cover(spec_flags)
            if cover is not None:
                spec_mode = "multirect"
                rect_list = cover
            else:
                spec_mode = "dual"
        else:
            spec_mode = "dual"

    # exploded-window layout via edge-replicated pad + static slices
    # (equivalent to a clamped-index gather, but XLA lowers static
    # slice+concat much faster than a dynamic 2-level take)
    def explode(a):
        pad = [(0, 0)] * (a.ndim - 2) + [(HX, Xp - X + HX),
                                         (HY, Yp - Y + HY)]
        ap = jnp.pad(a, pad, mode="edge")
        ap = jnp.concatenate([ap[..., i * TX:i * TX + WX, :]
                              for i in range(nbx)], axis=-2)
        return jnp.concatenate([ap[..., :, j * TY:j * TY + WY]
                                for j in range(nby)], axis=-1)

    p_blk = SolverParams(**{**p.__dict__, "MaxX": WX, "MaxY": WY})
    EX, EY = nbx * WX, nby * WY

    def crop(a):
        """Padded carry layout (…, Xp, Yp) -> (…, X, Y)."""
        return a[..., :X, :Y]

    def _rows_clamped(c, g0, n):
        """n rows of the carry starting at global row g0, clamped to
        [0, X-1] (edge replication beyond the real extent, matching
        explode()'s jnp.pad mode="edge") — built from PURE slices and
        small edge broadcasts so XLA only ever copies strip-sized bytes
        (an edge-mode pad of the full (Xp, Yp) carry materializes a
        whole padded copy per leaf per block)."""
        pieces = []
        g = g0
        while g < g0 + n:
            if g < 0:
                take = min(-g, g0 + n - g)
                pieces.append(jnp.broadcast_to(
                    c[..., 0:1, :], c.shape[:-2] + (take,) + c.shape[-1:]))
            elif g >= X:
                take = g0 + n - g
                pieces.append(jnp.broadcast_to(
                    c[..., X - 1:X, :],
                    c.shape[:-2] + (take,) + c.shape[-1:]))
            else:
                take = min(X, g0 + n) - g
                pieces.append(c[..., g:g + take, :])
            g += take
        return pieces[0] if len(pieces) == 1 else \
            jnp.concatenate(pieces, axis=-2)

    def _cols_clamped(c, g0, n):
        """n columns starting at global col g0, clamped to [0, Y-1]."""
        pieces = []
        g = g0
        while g < g0 + n:
            if g < 0:
                take = min(-g, g0 + n - g)
                pieces.append(jnp.broadcast_to(
                    c[..., :, 0:1], c.shape[:-1] + (take,)))
            elif g >= Y:
                take = g0 + n - g
                pieces.append(jnp.broadcast_to(
                    c[..., :, Y - 1:Y], c.shape[:-1] + (take,)))
            else:
                take = min(Y, g0 + n) - g
                pieces.append(c[..., :, g:g + take])
            g += take
        return pieces[0] if len(pieces) == 1 else \
            jnp.concatenate(pieces, axis=-1)

    def build_xstrips(c):
        """(…, Xp, Yp) carry -> (…, nbx*2HX, EY) halo-ROW strips.

        Tile i's window rows [0, HX) and [HX+TX, WX) in window-column
        layout, sourced from the clamped global rows, then Y-exploded
        into the same overlapping window columns the kernel windows use.
        Values beyond the real (X, Y) extent replicate the last real
        row/col exactly like explode() did, so the assembled windows are
        bitwise-identical to the exploded staging everywhere a real node
        can read."""
        rows = jnp.concatenate(
            [_rows_clamped(c, i * TX - HX + (0 if off == 0 else TX + HX),
                           HX)
             for i in range(nbx) for off in (0, 1)], axis=-2)
        # Y-explode the (small) strip-row array into window columns
        return jnp.concatenate(
            [_cols_clamped(rows, j * TY - HY, WY) for j in range(nby)],
            axis=-1)

    def build_ystrips(c):
        """(…, Xp, Yp) carry -> (…, Xp, nby*2HY) halo-COLUMN strips
        (tile j's window cols [0, HY) and [HY+TY, WY), center rows)."""
        return jnp.concatenate(
            [_cols_clamped(c, j * TY - HY + (0 if off == 0 else TY + HY),
                           HY)
             for j in range(nby) for off in (0, 1)], axis=-1)

    # static meta inputs, staged once (per chunk call when meta is traced).
    # persistent mode stages meta exactly like the slim carry — center
    # blocks plus halo strips, window-assembled in VMEM — so no kernel
    # input buffer is window-sized and per-block meta HBM traffic drops
    # from window-redundant to ~center-sized.  (Measured: this does NOT
    # lift the remote-compile-helper's ~350-450 KB ceiling — that limit
    # binds on the in-kernel assembled window VALUE, not on input buffer
    # planes; 128x512xK=8 still crashes with strip-staged inputs.)  Pad
    # lanes of the meta centers are zeros (unset nodes): window halos
    # beyond the real extent come from the clamped strips (edge
    # replication, == explode()'s mode="edge"), so real-node windows are
    # bitwise identical to the exploded staging.
    ctx_stream = persistent and os.environ.get("HF2D_CTXSTREAM", "1") == "1"
    # case-static meta pruning: only stage the planes the kernel can
    # statically read — every staged plane is DMA'd per block per tile
    # whether consumed or not.  idXl..idYd feed the n1..n4 weights
    # always; CT/TCT only feed the in-kernel decode (absent under ctx
    # streaming); BGX/BGY/Uw/Vw only the fill wall branch; l_min only
    # the turbulence length scales.  Pruned fields enter the in-kernel
    # GridMeta as zeros, which the statically-absent consumers never
    # read (the interpret-mode bitwise tests run the same pruning).
    MB = ["idXl", "idXr", "idYu", "idYd"]
    if not ctx_stream:
        MB += ["CT", "TCT"]
    if p.has_walls:
        MB += ["BGX", "BGY", "Uw", "Vw"]
    if p.models:
        MB += ["l_min"]
    # chunk-constant planes that left the slim carry (read-only inputs,
    # staged exactly like meta): y_plus only when the closure reads it;
    # lam_t only outside SM_NS (where fill does not recompute it)
    stage_src = {f: getattr(meta, f) for f in MB}
    if needs_y_plus(p):
        assert y_plus is not None, "y_plus plane required for this case"
        MB = MB + ["y_plus"]
        stage_src["y_plus"] = y_plus
    if p.sm != fl.SM_NS:
        assert lam_t_const is not None
        MB = MB + ["lam_t"]
        stage_src["lam_t"] = lam_t_const
    if persistent:
        def _pad_blk(a):
            return jnp.pad(a, [(0, 0)] * (a.ndim - 2)
                           + [(0, Xp - X), (0, Yp - Y)])

        meta_ctr = {f: _pad_blk(stage_src[f]) for f in MB}
        meta_xs = {f: build_xstrips(meta_ctr[f]) for f in MB}
        meta_ys = ({f: build_ystrips(meta_ctr[f]) for f in MB}
                   if HY else None)
    else:
        meta_ex = {f: explode(stage_src[f]) for f in MB}
    if ctx_stream:
        # decode once per CHUNK at XLA level, stream the bit-packed bool
        # planes (static_ctx.build_packed_ctx) like the meta planes; the
        # kernel unpacks per block (~3 ops/mask) instead of re-running
        # the full ~800 op/cell decode per invocation.  Float weights and
        # the j0-dependent y_r/jp1 are rebuilt in-kernel from the meta
        # window (trivial, bitwise identical); only the 4 uint32
        # bit-planes travel (~0.4 GB incl. strips at 4096² vs ~2 GB for
        # the unpacked form, which OOMed HBM).
        ctx_pk = _pad_blk(build_packed_ctx(meta, p))
        ctx_pk_xs = build_xstrips(ctx_pk)
        ctx_pk_ys = build_ystrips(ctx_pk) if HY else None

    def aux_at(it):
        return make_aux(beta_tab, cfl_tab, turb_start, it, dtype)

    # the external-source field enters the kernel only when the case has
    # SetSources2D objects; otherwise a literal zero inside the kernel
    # body lets Mosaic fold the Src*dt term (and saves the input DMA)
    has_src = p.has_ext_src
    nS = len(SLIM_BIG)
    nM = len(MB)
    # persistent staging: per slim/meta leaf the kernel gets [center
    # block, x-strip block, y-strip block] instead of one pre-exploded
    # window
    n_per = (3 if HY else 2) if persistent else 1
    n_stage = nS * n_per
    n_meta_stage = nM * n_per
    n_ctx_stage = n_per if ctx_stream else 0

    def make_fused(KK, body="general", dims=None, offset=(0, 0),
                   scatter_n=None):
        """pallas_call running KK fused iterations per invocation.

        ``body``: "general" (full StaticCtx decode), "spec" (interior-
        specialized constants — single body, no packed-ctx inputs), or
        "dual" (both bodies + per-tile SMEM flag dispatch).
        ``dims``/``offset``: tile-grid extent and origin of this call —
        region-mode blocks cover the grid with several single-body calls
        (a specialized interior rectangle + general frame slabs).
        ``scatter_n``: scatter form — a 1-D grid over ``scatter_n``
        arbitrary tiles whose (ti, tj) coordinates arrive as a
        scalar-prefetch table indexed by the BlockSpec index maps
        (pltpu.PrefetchScalarGridSpec); region mode uses ONE scatter
        call for the whole general boundary frame instead of 4 slab
        calls, saving 3 pipeline fill/drains per K-block.
        """
        gx, gy = dims if dims is not None else (nbx, nby)
        ox, oy = offset
        scatter = scatter_n is not None
        n_ctx = n_ctx_stage if body != "spec" else 0
        n_flag = 1 if body == "dual" else 0
        n_in = n_stage + n_meta_stage + n_ctx + (1 if has_src else 0)
        use_ctx = ctx_stream and body != "spec"

        def kernel(*krefs):
            if scatter:
                tt_ref, scal_ref, *refs = krefs
            else:
                scal_ref, *refs = krefs
            slim_refs = refs[:nS]
            xs_refs = refs[nS:2 * nS] if persistent else None
            ys_refs = refs[2 * nS:3 * nS] if (persistent and HY) else None
            meta_refs = refs[n_stage:n_stage + nM]
            mxs_refs = (refs[n_stage + nM:n_stage + 2 * nM]
                        if persistent else None)
            mys_refs = (refs[n_stage + 2 * nM:n_stage + 3 * nM]
                        if (persistent and HY) else None)
            c0 = n_stage + n_meta_stage
            # ctx refs: [pk_ctr, pk_xs, (pk_ys)]
            ctxp_refs = refs[c0:c0 + n_ctx] if use_ctx else None
            src_ref = (refs[c0 + n_ctx] if has_src
                       else None)
            chem_refs = refs[n_in:n_in + len(CHEM_FIELDS)]
            spec_ref = (refs[n_in + len(CHEM_FIELDS)] if n_flag else None)
            k0 = n_in + len(CHEM_FIELDS) + n_flag
            out_refs = refs[k0:k0 + nS]
            (pr_num, pr_den, pr_max, pr_uns,
             pr_ovr) = refs[k0 + nS:k0 + nS + 5]

            if scatter:
                g = pl.program_id(0)
                ti = tt_ref[0, g]
                tj = tt_ref[1, g]
                first = g == 0
            else:
                ti = pl.program_id(0) + ox
                tj = pl.program_id(1) + oy
                first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

            @pl.when(first)
            def _init():
                pr_num[...] = jnp.zeros_like(pr_num)
                pr_den[...] = jnp.zeros_like(pr_den)
                pr_max[...] = jnp.zeros_like(pr_max)
                pr_uns[...] = jnp.zeros_like(pr_uns)
                pr_ovr[...] = jnp.zeros_like(pr_ovr)

            def assemble(c_ref, xs_ref, ys_ref):
                """Window value from [x-strip ; y-strip | center | y-strip
                ; x-strip] — the strips carry the overlapping halo ring
                the disjoint center blocks can't."""
                c = c_ref[...]
                if HY:
                    ysr = ys_ref[...]
                    c = jnp.concatenate(
                        [ysr[..., :, 0:HY], c, ysr[..., :, HY:2 * HY]],
                        axis=-1)
                xsr = xs_ref[...]
                return jnp.concatenate(
                    [xsr[..., 0:HX, :], c, xsr[..., HX:2 * HX, :]],
                    axis=-2)

            if persistent:
                mvals = {f: assemble(meta_refs[k], mxs_refs[k],
                                     mys_refs[k] if HY else None)
                         for k, f in enumerate(MB)}
            else:
                mvals = {f: meta_refs[k][...]
                         for k, f in enumerate(MB)}
            # chunk-constant windows that are not GridMeta fields
            yp_w = mvals.pop("y_plus", None)
            lam_w = mvals.pop("lam_t", None)
            zi32 = jnp.zeros((WX, WY), jnp.int32)
            # pruned meta planes: zeros of the right dtype (their
            # consumers are statically absent for this case)
            meta_dt = {"CT": jnp.uint32, "TCT": jnp.uint32,
                       "BGX": dtype, "BGY": dtype, "Uw": dtype,
                       "Vw": dtype, "l_min": dtype}
            for f, dt_f in meta_dt.items():
                if f not in mvals:
                    mvals[f] = jnp.zeros((WX, WY), dt_f)
            meta_blk = GridMeta(NGX=zi32.astype(jnp.int8),
                                NGY=zi32.astype(jnp.int8),
                                i_wall=zi32, j_wall=zi32, **mvals)
            src_w = (src_ref[...] if has_src
                     else jnp.zeros((9, WX, WY), dtype))

            # chem tables live in SMEM; materialize them as static tuples
            # of scalar reads (table_lookup indexes knots statically) —
            # rank-1 VMEM vectors crash Mosaic layout inference
            def chem_leaf(k, f):
                size = getattr(chem, f).shape[0]
                if size == 1:
                    return chem_refs[k][0]
                return tuple(chem_refs[k][i] for i in range(size))
            chem_blk = ChemTables(**{f: chem_leaf(k, f)
                                     for k, f in enumerate(CHEM_FIELDS)})

            j0 = tj * TY - HY   # global j of window row 0 (clamped rows
            #                     are only read as masked neighbors)

            def general_ctx():
                if ctx_stream:
                    # cheap unpack of the pre-decoded ctx (streamed like
                    # meta)
                    pk_w = assemble(ctxp_refs[0], ctxp_refs[1],
                                    ctxp_refs[2] if HY else None)
                    return unpack_static_ctx(pk_w, meta_blk, p_blk, j0)
                # static decode once per invocation, shared by all KK
                # iterations
                return build_static_ctx(meta_blk, p_blk, j0)

            # validity mask over the tile center: pad rows/columns beyond
            # the real (X, Y) extent carry edge-replicated node flags and
            # must not contribute to the RMS/DD/instability partials (the
            # XLA path reduces over real nodes only); the shard path
            # additionally restricts to this shard's interior columns
            gi = ti * TX + jax.lax.broadcasted_iota(jnp.int32, (TX, TY), 0)
            gj = tj * TY + jax.lax.broadcasted_iota(jnp.int32, (TX, TY), 1)
            in_x = (gi < X) & (gj < Y)
            if interior_x is not None:
                in_x = in_x & (gi >= interior_x[0]) & (gi < interior_x[1])

            def make_iter_body(ctx_blk, active_c):
              def iter_body(i, carry):
                slim = SlimState(**dict(zip(SLIM_BIG, carry)),
                                 dt=scal_ref[0].astype(dtype))
                base = 1 + 6 * i
                aux_g = StepAux(beta_scen=scal_ref[base + 0].astype(dtype),
                                cfl_scen=scal_ref[base + 1].astype(dtype),
                                is_mu_t_iter=scal_ref[base + 2] > 0.5)
                aux_p = StepAux(beta_scen=scal_ref[base + 3].astype(dtype),
                                cfl_scen=scal_ref[base + 4].astype(dtype),
                                is_mu_t_iter=scal_ref[base + 5] > 0.5)

                full = expand(slim, p_blk, src_w, yp_w, lam_w)
                out_state, dt_fld, _ = gfc(full, meta_blk, p_blk, chem_blk,
                                           aux_g, j0=j0, return_fields=True,
                                           ctx=ctx_blk)
                out_state = SolverState(**{**out_state.__dict__,
                                           "dt": slim.dt})
                S_c, beta_c, _, _, fields = pass12(out_state, meta_blk,
                                                   p_blk, aux_p, j0=j0,
                                                   return_fields=True,
                                                   ctx=ctx_blk)
                slim = SlimState(
                    **{f: getattr(out_state, f) for f in SLIM_BIG
                       if f not in ("S", "beta")},
                    S=S_c, beta=beta_c, dt=slim.dt)

                # ---- center partial reductions, accumulated in-place ----
                # reduce ONLY the row axis: (9,TX,TY) -> (9,TY) (a full
                # reduction would create a rank-1 intermediate, which
                # crashes Mosaic layout inference; the TY reduction runs
                # outside the kernel in XLA)
                gate = fields["gate"][:, HX:HX + TX, HY:HY + TY] & in_x[None]
                abs_dd = fields["abs_dd"][:, HX:HX + TX, HY:HY + TY]
                tmp = fields["tmp"][:, HX:HX + TX, HY:HY + TY]
                dd_l = fields["dd_local"][:, HX:HX + TX, HY:HY + TY]
                if p.isAlternateRMS:
                    acc = abs_dd if p.serial_rms_mode else abs_dd * abs_dd
                    num = jnp.sum(jnp.where(gate, acc, 0.0), axis=-2)
                    den = jnp.sum(jnp.where(gate, tmp * tmp, 0.0), axis=-2)
                else:
                    num = jnp.sum(jnp.where(gate, dd_l * dd_l, 0.0),
                                  axis=-2)
                    den = jnp.sum(gate, axis=-2).astype(dtype)
                ddm = jnp.max(jnp.where(gate, dd_l, 0.0), axis=-2)
                pr_num[:, pl.ds(i, 1), :] = (pr_num[:, pl.ds(i, 1), :]
                                             + num[:, None, :])
                pr_den[:, pl.ds(i, 1), :] = (pr_den[:, pl.ds(i, 1), :]
                                             + den[:, None, :])
                pr_max[:, pl.ds(i, 1), :] = jnp.maximum(
                    pr_max[:, pl.ds(i, 1), :], ddm[:, None, :])
                uns = band(active_c,
                           in_x & (out_state.Tg[HX:HX + TX,
                                                HY:HY + TY] < 0.0))
                pr_uns[pl.ds(i, 1), :] = (
                    pr_uns[pl.ds(i, 1), :]
                    + jnp.sum(uns.astype(jnp.int32)[None], axis=-2))
                # frozen-dt CFL guard: the block-frozen dt must not exceed
                # this iteration's freshly computed per-node CFL limit
                # (gfc's dt_field, deeps2d_core.cpp:1317-1327 — the dt the
                # reference would have used next).  Inactive nodes carry
                # dt_field = 1.0 >= dt, so only real CFL overruns count.
                ovr = in_x & (slim.dt > dt_fld[HX:HX + TX, HY:HY + TY])
                pr_ovr[pl.ds(i, 1), :] = (
                    pr_ovr[pl.ds(i, 1), :]
                    + jnp.sum(ovr.astype(jnp.int32)[None], axis=-2))
                return tuple(getattr(slim, f) for f in SLIM_BIG)

              return iter_body

            if persistent:
                carry0 = tuple(assemble(slim_refs[k], xs_refs[k],
                                        ys_refs[k] if HY else None)
                               for k in range(nS))
            else:
                carry0 = tuple(slim_refs[k][...] for k in range(nS))

            def run_body(ctx_blk):
                """KK fused iterations + center writeback for one ctx
                variant (general decode or the fold-constant interior
                specialization)."""
                active_c = (ctx_blk.active if isinstance(ctx_blk.active,
                                                         bool)
                            else ctx_blk.active[HX:HX + TX, HY:HY + TY])
                iter_body = make_iter_body(ctx_blk, active_c)
                carry = carry0
                if k_loop and KK > 1:
                    # rolled K-loop: one compiled body regardless of KK —
                    # caps both VMEM liveness and Mosaic compile time,
                    # enabling deeper temporal blocking / larger windows
                    # than the unrolled form (which keeps ~K iterations of
                    # plane intermediates live and compiles superlinearly
                    # in K)
                    carry = jax.lax.fori_loop(0, KK, iter_body, carry)
                else:
                    for i in range(KK):
                        carry = iter_body(i, carry)
                # ---- write center crops of the final carry ---------------
                for k in range(nS):
                    out_refs[k][...] = carry[k][..., HX:HX + TX,
                                                HY:HY + TY]

            if body == "dual":
                # per-tile dispatch: generic-interior tiles run the
                # specialized branch (bitwise-identical, ~23% cheaper);
                # everything else the general decode.  Exactly one branch
                # executes per grid step.  (Scattered-generic decks only:
                # the rectangle case issues single-body calls instead —
                # a two-body kernel costs ~20% even on cheap-branch tiles,
                # measured spec-all 17.2 vs 14.3 ms/iter at 4096^2.)
                is_spec = spec_ref[ti * nby + tj] > 0

                @pl.when(is_spec)
                def _spec():
                    run_body(specialized_interior_ctx(meta_blk, p_blk, j0))

                @pl.when(jnp.logical_not(is_spec))
                def _general():
                    run_body(general_ctx())
            elif body == "spec":
                run_body(specialized_interior_ctx(meta_blk, p_blk, j0))
            else:
                run_body(general_ctx())

        # pallas call plumbing ------------------------------------------------
        def lead_of(f):
            return {"S": (9,), "beta": (9,), "Yc": (4,)}.get(f, ())

        # index maps: rectangular region calls offset the 2-D grid ids;
        # the scatter call looks the block coordinates up in the
        # scalar-prefetch tile table (index maps receive the prefetch ref
        # after the grid ids)
        if scatter:
            def _imap(lead):
                if lead:
                    return lambda g, tt: (0, tt[0, g], tt[1, g])
                return lambda g, tt: (tt[0, g], tt[1, g])
        else:
            def _imap(lead):
                if lead:
                    return lambda i, j: (0, i + ox, j + oy)
                return lambda i, j: (i + ox, j + oy)

        def in_spec_for(f, kind):
            if kind == "slim":
                lead = lead_of(f)
            elif kind == "meta":
                lead = ()
            else:
                lead = (9,)
            if lead:
                return pl.BlockSpec(lead + (WX, WY), _imap(True),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((WX, WY), _imap(False),
                                memory_space=pltpu.VMEM)

        def strip_spec_for(f, bx, by):
            lead = lead_of(f)
            if lead:
                return pl.BlockSpec(lead + (bx, by), _imap(True),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((bx, by), _imap(False),
                                memory_space=pltpu.VMEM)

        if persistent:
            slim_in = ([strip_spec_for(f, TX, TY) for f in SLIM_BIG]
                       + [strip_spec_for(f, 2 * HX, WY) for f in SLIM_BIG]
                       + ([strip_spec_for(f, TX, 2 * HY)
                           for f in SLIM_BIG] if HY else []))
            meta_in = ([strip_spec_for(f, TX, TY) for f in MB]
                       + [strip_spec_for(f, 2 * HX, WY) for f in MB]
                       + ([strip_spec_for(f, TX, 2 * HY)
                           for f in MB] if HY else []))
        else:
            slim_in = [in_spec_for(f, "slim") for f in SLIM_BIG]
            meta_in = [in_spec_for(f, "meta") for f in MB]
        if use_ctx:
            def ctx_spec(bx, by):
                return pl.BlockSpec((N_CTX_WORDS, bx, by), _imap(True),
                                    memory_space=pltpu.VMEM)

            ctx_in = ([ctx_spec(TX, TY), ctx_spec(2 * HX, WY)]
                      + ([ctx_spec(TX, 2 * HY)] if HY else []))
        else:
            ctx_in = []
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + slim_in
                    + meta_in
                    + ctx_in
                    + ([in_spec_for(None, "src")] if has_src else [])
                    + [pl.BlockSpec(memory_space=pltpu.SMEM)
                       for _ in CHEM_FIELDS]
                    + ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                       if n_flag else []))

        # whole-array accumulator blocks (constant index_map => the block
        # persists across the sequential TPU grid; each program accumulates
        # its center partials into the per-inner-iteration rows)
        if scatter:
            acc3 = lambda g, tt: (0, 0, 0)          # noqa: E731
            acc2 = lambda g, tt: (0, 0)             # noqa: E731
        else:
            acc3 = lambda i, j: (0, 0, 0)           # noqa: E731
            acc2 = lambda i, j: (0, 0)              # noqa: E731
        out_specs = ([strip_spec_for(f, TX, TY) for f in SLIM_BIG]
                     + [pl.BlockSpec((9, KK, TY), acc3,
                                     memory_space=pltpu.VMEM)] * 3
                     + [pl.BlockSpec((KK, TY), acc2,
                                     memory_space=pltpu.VMEM)] * 2)

        out_shapes = ([jax.ShapeDtypeStruct(lead_of(f) + (Xp, Yp), dtype)
                       for f in SLIM_BIG]
                      + [jax.ShapeDtypeStruct((9, KK, TY), dtype)] * 3
                      + [jax.ShapeDtypeStruct((KK, TY), jnp.int32)] * 2)

        # persistent: center block (i,j) is read and written by the SAME
        # grid step only (the overlapping halo ring comes from the strip
        # arrays, not this buffer) -> in-place aliasing is hazard-free and
        # keeps the carry single-buffered in HBM.  Region-mode calls
        # cover only part of the grid: aliasing also preserves the
        # UNCOVERED tiles' old center values, which the later frame-slab
        # calls then read as their own (pre-block) centers.
        # (alias indices count the scalar-prefetch table as input 0 in
        # the scatter form — verified: a wrong offset fails loudly at
        # lowering with a shape/dtype mismatch)
        base = 2 if scatter else 1
        aliases = {base + k: k for k in range(nS)} if persistent else {}

        kw = dict(
            out_shape=out_shapes,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes),
            interpret=(jax.default_backend() == "cpu"))
        if scatter:
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(scatter_n,),
                    in_specs=in_specs,
                    out_specs=out_specs),
                **kw)
        return pl.pallas_call(
            kernel,
            grid=(gx, gy),
            in_specs=in_specs,
            out_specs=out_specs,
            **kw)

    fused_cache = {}
    _, _, _, active_m = node_masks(meta)
    if persistent:
        # the persistent carry is (Xp, Yp): pad lanes beyond (X, Y) evolve
        # unmasked garbage and must not reach the dt min
        dt_mask = jnp.pad(active_m, ((0, Xp - X), (0, Yp - Y)))
    else:
        dt_mask = active_m

    def scan_dt(slim, cfl_scen):
        """Global dt reduction from the carried primitives
        (deeps2d_core.cpp:1317-1327 with the fast-path prim lag)."""
        cfl_min = jnp.minimum(jnp.asarray(p.CFL, dtype), cfl_scen)
        k_new = _safe_div(slim.CP, slim.CP - slim.R, 2.0)
        aaa = jnp.sqrt(jnp.maximum(k_new * slim.R * slim.Tg, 0.0))
        dtn = cfl_min * jnp.minimum(p.dx / (aaa + jnp.abs(slim.U)),
                                    p.dy / (aaa + jnp.abs(slim.V)))
        dt_new = red_min(
            jnp.minimum(1.0, jnp.min(jnp.where(dt_mask, dtn, 1.0))))
        if p.serial_dt_mode:
            dt_new = jnp.minimum(dt_new, slim.dt)
        return dt_new.astype(dtype)

    # region-mode needs the in-place aliasing of persistent staging to
    # leave uncovered tiles' centers intact between the per-region calls
    eff_spec_mode = spec_mode
    if spec_mode in ("rect", "multirect") and not persistent:
        eff_spec_mode = "dual"
    scatter_tab = None
    if eff_spec_mode == "multirect":
        covered = np.zeros((nbx, nby), bool)
        regions = []
        for (qx0, qx1, qy0, qy1) in rect_list:
            regions.append(("spec", (qx1 - qx0, qy1 - qy0), (qx0, qy0)))
            covered[qx0:qx1, qy0:qy1] = True
        frame = [(si, sj) for si in range(nbx) for sj in range(nby)
                 if not covered[si, sj]]
        if frame:
            scatter_tab = jnp.asarray(np.asarray(frame, np.int32).T)
            regions.append(("scatter", len(frame), None))
    elif eff_spec_mode == "rect":
        rx0, rx1, ry0, ry1 = rect
        regions = [("spec", (rx1 - rx0, ry1 - ry0), (rx0, ry0))]
        frame = [(si, sj) for si in range(nbx) for sj in range(nby)
                 if not (rx0 <= si < rx1 and ry0 <= sj < ry1)]
        # one scatter call for the whole general boundary frame (tile
        # coords via scalar-prefetch table) instead of 4 slab calls —
        # saves 3 pipeline fill/drains per K-block.  MEASURED NEUTRAL
        # (HF2D_SCATTER=1 0.9716 vs slabs 0.9709 GCUPS at 2048^2, within
        # noise) while the Mosaic compile of the dynamic index maps is
        # ~3x slower (and exceeds 15 min at 4096^2), so the slab form
        # stays the default; the per-call fill/drain cost the scatter
        # form removes is thereby measured negligible (PERF.md ledger).
        if (len(frame) > 0
                and os.environ.get("HF2D_SCATTER", "0") == "1"):
            scatter_tab = jnp.asarray(
                np.asarray(frame, np.int32).T)      # (2, n) row-major
            regions.append(("scatter", len(frame), None))
        else:
            if rx0 > 0:
                regions.append(("general", (rx0, nby), (0, 0)))
            if rx1 < nbx:
                regions.append(("general", (nbx - rx1, nby), (rx1, 0)))
            if ry0 > 0:
                regions.append(("general", (rx1 - rx0, ry0), (rx0, 0)))
            if ry1 < nby:
                regions.append(("general", (rx1 - rx0, nby - ry1),
                                (rx0, ry1)))
    elif eff_spec_mode == "dual":
        regions = [("dual", (nbx, nby), (0, 0))]
        spec_flags_dev = jnp.asarray(
            np.asarray(spec_flags, np.int32).reshape(-1))
    else:
        regions = [("general", (nbx, nby), (0, 0))]

    def make_block(KK):
        if KK not in fused_cache:
            fused_cache[KK] = [
                (make_fused(KK, "general", scatter_n=dims)
                 if body == "scatter"
                 else make_fused(KK, body, dims, off))
                for (body, dims, off) in regions]
        fused_list = fused_cache[KK]

        def block(slim, kbase, src_ex, dt_in=None, raw_diag=False):
            """Run iterations kbase .. kbase+KK-1 (gfc stage) paired with
            pass12 at kbase+1 .. kbase+KK; dt frozen at block entry.
            ``src_ex`` is the pre-exploded volumetric source field.
            Persistent mode: ``slim``'s planes are (Xp, Yp); only the halo
            ring is staged (x/y strip arrays), the kernel assembles the
            windows in VMEM and writes the centers back in place.
            ``dt_in``: use this frozen dt instead of reducing one here
            (callers that split a block across sub-kernels must share one).
            ``raw_diag``: return the local partial reductions (num/den/
            ddm/uns, pre-hook, no RMS formula) so such callers can combine
            partials across sub-kernels before the global reduction."""
            aux0 = aux_at(kbase)
            dt_k = scan_dt(slim, aux0.cfl_scen) if dt_in is None else dt_in
            scal = [dt_k.astype(jnp.float32)]
            for i in range(KK):
                aux_g = aux_at(kbase + i)
                aux_p = aux_at(kbase + i + 1)
                scal += [aux_g.beta_scen.astype(jnp.float32),
                         aux_g.cfl_scen.astype(jnp.float32),
                         aux_g.is_mu_t_iter.astype(jnp.float32),
                         aux_p.beta_scen.astype(jnp.float32),
                         aux_p.cfl_scen.astype(jnp.float32),
                         aux_p.is_mu_t_iter.astype(jnp.float32)]
            scal = jnp.stack(scal)
            if persistent:
                centers = [getattr(slim, f) for f in SLIM_BIG]
                slim_ins = (centers
                            + [build_xstrips(a) for a in centers]
                            + ([build_ystrips(a) for a in centers]
                               if HY else []))
            else:
                slim_ins = [explode(getattr(slim, f)) for f in SLIM_BIG]
            if persistent:
                meta_ins = ([meta_ctr[f] for f in MB]
                            + [meta_xs[f] for f in MB]
                            + ([meta_ys[f] for f in MB]
                               if HY else []))
            else:
                meta_ins = [meta_ex[f] for f in MB]
            if ctx_stream:
                ctx_ins = ([ctx_pk, ctx_pk_xs]
                           + ([ctx_pk_ys] if HY else []))
            else:
                ctx_ins = []
            # region mode: the slim CENTER arrays thread through the
            # calls in place (aliased); strips/meta/ctx staged once from
            # the pre-block carry, so every tile still reads pre-block
            # neighbor values (Jacobi preserved).  Partials are combined
            # across calls (sum/max — same totals as one grid).
            centers_cur = slim_ins[:nS]
            strips_rest = slim_ins[nS:]
            num = den = ddm = uns = ovr = None
            for (body, _, _), fused in zip(regions, fused_list):
                ins = (centers_cur + strips_rest
                       + meta_ins
                       + (ctx_ins if body != "spec" else [])
                       + ([src_ex] if has_src else [])
                       + [getattr(chem, f) for f in CHEM_FIELDS]
                       + ([spec_flags_dev] if body == "dual" else []))
                if body == "scatter":
                    outs = fused(scatter_tab, scal, *ins)
                else:
                    outs = fused(scal, *ins)
                centers_cur = list(outs[:nS])
                n_, d_, m_, u_, o_ = outs[nS:]
                num = n_ if num is None else num + n_
                den = d_ if den is None else den + d_
                ddm = m_ if ddm is None else jnp.maximum(ddm, m_)
                uns = u_ if uns is None else uns + u_
                ovr = o_ if ovr is None else ovr + o_
            if persistent:
                new_leaves = centers_cur         # stay (Xp, Yp)
            else:
                new_leaves = [a[..., :X, :Y] for a in centers_cur]
            slim2 = SlimState(**dict(zip(SLIM_BIG, new_leaves)), dt=dt_k)
            if raw_diag:
                return slim2, {"num": num.sum(-1), "den": den.sum(-1),
                               "ddm": ddm.max(-1), "uns": uns.sum(-1),
                               "ovr": ovr.sum(-1)}
            nsum = red_sum(num.sum(-1))             # (9, KK)
            dsum = red_sum(den.sum(-1))
            if p.isAlternateRMS:
                fb = 0.0 if p.serial_rms_mode else nsum
                rms = jnp.where((nsum > 0) & (dsum > 0),
                                jnp.sqrt(_safe_div(nsum, dsum)), fb)
            else:
                rms = jnp.where(dsum > 0, jnp.sqrt(_safe_div(nsum, dsum)),
                                nsum)
            diag = {"RMS": rms.T,                       # (KK, 9)
                    "DD_max": red_max(ddm.max(-1)).T,   # (KK, 9)
                    "dt_used": jnp.broadcast_to(dt_k, (KK,)),
                    "unstable": red_sum(uns.sum(-1)) > 0,        # (KK,)
                    # frozen-dt CFL-violation monitor (kernel iter_body)
                    "dt_overrun": red_sum(ovr.sum(-1)) > 0}      # (KK,)
            return slim2, diag

        return block

    return SimpleNamespace(make_block=make_block, aux_at=aux_at,
                           scan_dt=scan_dt, explode=explode, crop=crop,
                           pad_xy=(Xp - X, Yp - Y))


def make_pallas_chunk(meta: GridMeta, params: SolverParams,
                      chem: ChemTables, beta_tab, cfl_tab, turb_start,
                      tile=(64, 128), fuse_iters: int = 1,
                      vmem_limit_bytes=None, persistent=None,
                      spec_map=None):
    """Build chunk(state, n_iters, start_iter, src_ext) running the fused
    kernel.

    Matches make_fast_chunk's interface and prologue/epilogue structure
    (plus an optional trailing ``meta_arg``: when the Solver passes the
    GridMeta as a runtime argument, the exploded windows and static ctx
    are computed on device per call instead of being baked into the
    module as constants — at 4096² the baked exploded meta alone exceeds
    the remote-compile request limit, and even at 2048² it was a ~200 MB
    upload per compile).
    ``fuse_iters`` (K) fuses K whole iterations per kernel launch (see
    module docstring for the dt-freezing semantics).  ``vmem_limit_bytes``
    raises Mosaic's VMEM budget above the 16 MB default scoped limit — the
    fused kernel's live-plane stack exceeds it for tiles past (64, 128)
    (v5e has 128 MB VMEM).
    """
    if not params.uniform_mesh:
        raise NotImplementedError(
            "the fused Pallas kernel supports uniform meshes only; run "
            "non-uniform cases on the XLA path (core.step)")
    p = params
    K = int(fuse_iters)
    vmem = _default_vmem(vmem_limit_bytes)
    if persistent is None:
        persistent = os.environ.get("HF2D_PERSIST", "1") == "1"

    def chunk(state: SolverState, n_iters: int, start_iter, src_ext,
              meta_arg: GridMeta = None):
        mt = meta if meta_arg is None else meta_arg
        yp_const = state.y_plus if needs_y_plus(p) else None
        lam_const = None if p.sm == fl.SM_NS else state.lam_t
        M = _machinery(mt, p, chem, beta_tab, cfl_tab, turb_start, tile,
                       K, vmem, persistent=persistent, y_plus=yp_const,
                       lam_t_const=lam_const, spec_map=spec_map)
        block_k = M.make_block(K)
        ctx_g = build_static_ctx(mt, p)
        if not p.has_ext_src:
            src_ext = jnp.zeros((9, p.MaxX, p.MaxY), p.jdtype)
            src_ex = None
        else:
            src_ex = M.explode(src_ext)
        aux0 = M.aux_at(start_iter)
        S_c, beta_c, _, _, diag0 = pass12(state, mt, p, aux0, ctx=ctx_g)
        slim = shrink(SolverState(**{**state.__dict__, "S": S_c,
                                     "beta": beta_c}))
        if persistent:
            # pad the carry to the (Xp, Yp) block multiple once per CHUNK;
            # pad lanes are never read (strips clamp to the real extent)
            pxx, pyy = M.pad_xy

            def pad_blk(a):
                return jnp.pad(a, [(0, 0)] * (a.ndim - 2)
                               + [(0, pxx), (0, pyy)])

            slim = SlimState(**{f: pad_blk(getattr(slim, f))
                                for f in SLIM_BIG}, dt=slim.dt)
        nb, rem = divmod(n_iters - 1, K)
        diags = None
        if nb:
            ks = start_iter + K * jnp.arange(nb)
            slim, diags = jax.lax.scan(
                lambda s, k: block_k(s, k, src_ex), slim, ks)
            # flatten (nb, K, ...) -> (nb*K, ...)
            diags = jax.tree.map(
                lambda a: a.reshape((nb * K,) + a.shape[2:]), diags)
        if rem:
            slim, d2 = M.make_block(rem)(slim, start_iter + nb * K, src_ex)
            diags = (d2 if diags is None else
                     jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0),
                                  diags, d2))
        if persistent:
            slim = SlimState(**{f: M.crop(getattr(slim, f))
                                for f in SLIM_BIG}, dt=slim.dt)
        full = expand(slim, p, src_ext, yp_const, lam_const)
        out, dt_new, unstable_last = gfc(full, mt, p, chem,
                                         M.aux_at(start_iter + n_iters - 1),
                                         ctx=ctx_g)
        out = SolverState(**{**out.__dict__, "dt": dt_new,
                             "y_plus": state.y_plus})

        def lead(a, b):
            return jnp.concatenate([a[None], b], 0) if b is not None \
                else a[None]

        def trail(b, a):
            return jnp.concatenate([b, a[None]], 0) if b is not None \
                else a[None]

        all_diag = {
            "RMS": lead(diag0["RMS"], diags["RMS"] if diags else None),
            "dt_used": lead(diag0["dt_used"],
                            diags["dt_used"] if diags else None),
            "DD_max": lead(diag0["DD_max"],
                           diags["DD_max"] if diags else None),
            "unstable": trail(diags["unstable"] if diags else None,
                              unstable_last),
            # the epilogue gfc recomputes a fresh dt (no freeze) -> False
            "dt_overrun": trail(diags["dt_overrun"] if diags else None,
                                jnp.asarray(False)),
        }
        return out, all_diag

    return chunk
