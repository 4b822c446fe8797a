"""Fused Pallas TPU kernel for the rotated solver iteration.

One kernel invocation performs the whole iteration per (TX, TY) tile:
gradients -> FillNode2D -> chemistry -> wall heat -> pass 1 -> pass 2
(commit + beta), reading exactly the 33-plane slim carry + static metadata
from HBM once and writing the new carry once — the HBM-traffic optimum for
the scheme.  The physics is the *same* stage code as the XLA path
(core/step.py, core/physics.py) evaluated on VMEM blocks, so the two paths
cannot drift apart.

Tiling: the domain is padded by a halo ring H=3 (enough for the deepest
dependency chain: center pass-1 needs neighbor dSdx, which needs flux A two
cells out, which needs gradients three cells out) plus round-up to tile
multiples; padded nodes carry CT=0 (not NODE_IS_SET) and are inert.  Each
tile DMAs its (TX+2H, TY+2H) window of every field, computes everything
redundantly on the halo, and writes back only the (TX, TY) center.

dt semantics on this path: the global dt reduction is evaluated at scan
level from the carried primitives, which gives the primitives one extra
iteration of lag relative to the reference's already-lagged dt (the
mixture properties are the exact pre-chemistry values via the CP_prev /
R_prev carry).  CFL-limited dt differs by O(1e-3) relative; the XLA path
keeps the reference-exact pairing and remains the validation reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import flags as fl
from ..core.physics import node_masks, _safe_div
from ..core.state import ChemTables, GridMeta, SolverParams, SolverState
from ..core.step import (SlimState, StepAux, expand, gfc, make_aux, pass12,
                         shrink, _SLIM_FIELDS)

HALO = 3

# slim leaves staged through the kernel (dt is a scalar, passed via SMEM)
SLIM_BIG = [f for f in _SLIM_FIELDS if f != "dt"]
META_BIG = ["CT", "TCT", "idXl", "idXr", "idYu", "idYd", "BGX", "BGY",
            "Uw", "Vw", "l_min"]
CHEM_FIELDS = [f.name for f in ChemTables.__dataclass_fields__.values()]


def _pad2(a, px, py, H, fill=0):
    pad = [(0, 0)] * (a.ndim - 2) + [(H, px + H), (H, py + H)]
    return jnp.pad(a, pad, constant_values=fill)


def pad_tree(state_or_meta, X, Y, TX, TY, fields):
    px = (-X) % TX
    py = (-Y) % TY
    kw = {}
    for f in fields:
        kw[f] = _pad2(getattr(state_or_meta, f), px, py, HALO)
    return kw


def make_pallas_chunk(meta: GridMeta, params: SolverParams,
                      chem: ChemTables, beta_tab, cfl_tab, turb_start,
                      src_ext, tile=(64, 64)):
    """Build chunk(state, n_iters, start_iter) running the fused kernel.

    ``state`` is an (unpadded) SolverState at rest; padding/unpadding happen
    inside.  Matches make_fast_chunk's interface and prologue/epilogue
    structure.
    """
    p = params
    TX, TY = tile
    H = HALO
    X, Y = p.MaxX, p.MaxY
    Xp = X + ((-X) % TX)
    Yp = Y + ((-Y) % TY)
    nbx, nby = Xp // TX, Yp // TY
    WX, WY = TX + 2 * H, TY + 2 * H
    dtype = p.jdtype

    # padded static inputs (built once at trace time)
    meta_pad = {f: _pad2(getattr(meta, f), (-X) % TX, (-Y) % TY, H)
                for f in META_BIG}
    src_pad = _pad2(src_ext, (-X) % TX, (-Y) % TY, H)
    p_blk = SolverParams(**{**p.__dict__, "MaxX": WX, "MaxY": WY})

    def aux_at(it):
        return make_aux(beta_tab, cfl_tab, turb_start, it, dtype)

    n_in = len(SLIM_BIG) + len(META_BIG) + 1   # + src_ext

    def kernel(scal_ref, *refs):
        slim_refs = refs[:len(SLIM_BIG)]
        meta_refs = refs[len(SLIM_BIG):len(SLIM_BIG) + len(META_BIG)]
        src_ref = refs[len(SLIM_BIG) + len(META_BIG)]
        chem_refs = refs[n_in:n_in + len(CHEM_FIELDS)]
        k0 = n_in + len(CHEM_FIELDS)
        out_refs = refs[k0:k0 + len(SLIM_BIG)]
        pr_num, pr_den, pr_max, pr_uns = refs[k0 + len(SLIM_BIG):
                                              k0 + len(SLIM_BIG) + 4]
        scr0 = k0 + len(SLIM_BIG) + 4
        win_scr = refs[scr0:scr0 + n_in]
        out_scr = refs[scr0 + n_in:scr0 + 2 * n_in - len(META_BIG) - 1]
        in_sems = refs[-2]
        out_sems = refs[-1]

        ti = pl.program_id(0)
        tj = pl.program_id(1)
        x0 = ti * TX
        y0 = tj * TY

        # ---- fetch all windows --------------------------------------------
        copies = []
        for k, ref in enumerate(list(slim_refs) + list(meta_refs)
                                + [src_ref]):
            idx = (pl.ds(x0, WX), pl.ds(y0, WY))
            if ref.ndim == 3:
                idx = (slice(None),) + idx
            c = pltpu.make_async_copy(ref.at[idx], win_scr[k],
                                     in_sems.at[k])
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

        mvals = {f: win_scr[len(SLIM_BIG) + k][...]
                 for k, f in enumerate(META_BIG)}
        # sanitize never-written halo-ring lanes (outside every tile
        # center): they are not NODE_IS_SET, but uninitialized HBM could
        # hold NaNs that would poison 0*NaN products in masked branches
        is_set_w = (mvals["CT"] & jnp.uint32(fl.CT_NODE_IS_SET_2D)) != 0

        def clean(v):
            return jnp.where(is_set_w, v, 0.0) if v.ndim == 2 \
                else jnp.where(is_set_w[None], v, 0.0)

        slim = SlimState(
            **{f: clean(win_scr[k][...])
               for k, f in enumerate(SLIM_BIG)},
            dt=scal_ref[0].astype(dtype))
        zi32 = jnp.zeros((WX, WY), jnp.int32)
        meta_blk = GridMeta(NGX=zi32.astype(jnp.int8),
                            NGY=zi32.astype(jnp.int8),
                            i_wall=zi32, j_wall=zi32, **mvals)
        src_w = clean(win_scr[len(SLIM_BIG) + len(META_BIG)][...])
        # chem tables live in SMEM; materialize them as static tuples of
        # scalar reads (table_lookup indexes knots statically) — rank-1
        # VMEM vectors crash Mosaic layout inference
        def chem_leaf(k, f):
            size = getattr(chem, f).shape[0]
            if size == 1:
                return chem_refs[k][0]
            return tuple(chem_refs[k][i] for i in range(size))
        chem_blk = ChemTables(**{f: chem_leaf(k, f)
                                 for k, f in enumerate(CHEM_FIELDS)})

        j0 = y0 - H    # unpadded global j of window row 0
        aux_g = StepAux(beta_scen=scal_ref[1].astype(dtype),
                        cfl_scen=scal_ref[2].astype(dtype),
                        is_mu_t_iter=scal_ref[3] > 0.5)
        aux_p = StepAux(beta_scen=scal_ref[4].astype(dtype),
                        cfl_scen=scal_ref[5].astype(dtype),
                        is_mu_t_iter=scal_ref[6] > 0.5)

        full = expand(slim, p_blk, src_w)
        out_state, _, _ = gfc(full, meta_blk, p_blk, chem_blk, aux_g,
                              j0=j0, return_fields=True)
        out_state = SolverState(**{**out_state.__dict__, "dt": slim.dt})
        S_c, beta_c, _, _, fields = pass12(out_state, meta_blk, p_blk,
                                           aux_p, j0=j0,
                                           return_fields=True)

        # ---- write center crops ------------------------------------------
        new_slim = {**{f: getattr(out_state, f) for f in SLIM_BIG},
                    "S": S_c, "beta": beta_c}
        ctr = (slice(None), pl.ds(H, TX), pl.ds(H, TY))
        wcopies = []
        for k, f in enumerate(SLIM_BIG):
            v = new_slim[f]
            if v.ndim == 3:
                out_scr[k][...] = v[:, H:H + TX, H:H + TY]
                dst = out_refs[k].at[(slice(None), pl.ds(x0 + H, TX),
                                      pl.ds(y0 + H, TY))]
            else:
                out_scr[k][...] = v[H:H + TX, H:H + TY]
                dst = out_refs[k].at[(pl.ds(x0 + H, TX),
                                      pl.ds(y0 + H, TY))]
            c = pltpu.make_async_copy(out_scr[k], dst, out_sems.at[k])
            c.start()
            wcopies.append(c)

        # ---- center partial reductions ------------------------------------
        gate = fields["gate"][:, H:H + TX, H:H + TY]
        abs_dd = fields["abs_dd"][:, H:H + TX, H:H + TY]
        tmp = fields["tmp"][:, H:H + TX, H:H + TY]
        dd_l = fields["dd_local"][:, H:H + TX, H:H + TY]
        kd = dict(axis=(-2, -1), keepdims=True)   # (9,TX,TY) -> (9,1,1)
        if p.isAlternateRMS:
            acc = abs_dd if p.serial_rms_mode else abs_dd * abs_dd
            num = jnp.sum(jnp.where(gate, acc, 0.0), **kd)
            den = jnp.sum(jnp.where(gate, tmp * tmp, 0.0), **kd)
        else:
            num = jnp.sum(jnp.where(gate, dd_l * dd_l, 0.0), **kd)
            den = jnp.sum(gate, **kd).astype(dtype)
        ddm = jnp.max(jnp.where(gate, dd_l, 0.0), **kd)
        # partial buffers are whole-(9,nbx,nby) blocks mapped to the same
        # offset for every program (the TPU grid is sequential, so each
        # tile writes its own cell without races); keepdims keeps every
        # intermediate rank>=2 for Mosaic layout inference
        pr_num[:, pl.ds(ti, 1), pl.ds(tj, 1)] = num
        pr_den[:, pl.ds(ti, 1), pl.ds(tj, 1)] = den
        pr_max[:, pl.ds(ti, 1), pl.ds(tj, 1)] = ddm
        solid, is_set, fc, active = node_masks(meta_blk)
        uns = active[H:H + TX, H:H + TY] \
            & (out_state.Tg[H:H + TX, H:H + TY] < 0.0)
        pr_uns[pl.ds(ti, 1), pl.ds(tj, 1)] = \
            jnp.sum(uns.astype(jnp.int32), **kd)

        for c in wcopies:
            c.wait()

    # pallas call plumbing --------------------------------------------------
    def any_spec():
        return pl.BlockSpec(memory_space=pltpu.ANY)

    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [any_spec() for _ in range(n_in)]
                + [pl.BlockSpec(memory_space=pltpu.SMEM)
                   for _ in CHEM_FIELDS])
    out_specs = ([any_spec() for _ in SLIM_BIG]
                 + [pl.BlockSpec((9, nbx, nby), lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9, nbx, nby), lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9, nbx, nby), lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nbx, nby), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM)])

    def win_shape(f, kind):
        if kind == "slim":
            lead = {"S": (9,), "beta": (9,), "Yc": (4,)}.get(f, ())
            return lead + (WX, WY)
        if kind == "meta":
            return (WX, WY)
        return (9, WX, WY)     # src

    def win_dtype(f, kind):
        if kind == "meta":
            if f in ("CT", "TCT"):
                return jnp.uint32
            if f in ("idXl", "idXr", "idYu", "idYd"):
                return jnp.int8
        return dtype

    scratch_shapes = (
        [pltpu.VMEM(win_shape(f, "slim"), dtype) for f in SLIM_BIG]
        + [pltpu.VMEM(win_shape(f, "meta"), win_dtype(f, "meta"))
           for f in META_BIG]
        + [pltpu.VMEM((9, WX, WY), dtype)]
        + [pltpu.VMEM({"S": (9,), "beta": (9,), "Yc": (4,)}.get(f, ())
                      + (TX, TY), dtype) for f in SLIM_BIG]
        + [pltpu.SemaphoreType.DMA((n_in,)),
           pltpu.SemaphoreType.DMA((len(SLIM_BIG),))])

    XA, YA = Xp + 2 * H, Yp + 2 * H

    def out_shapes():
        shapes = []
        for f in SLIM_BIG:
            lead = {"S": (9,), "beta": (9,), "Yc": (4,)}.get(f, ())
            shapes.append(jax.ShapeDtypeStruct(lead + (XA, YA), dtype))
        shapes += [jax.ShapeDtypeStruct((9, nbx, nby), dtype),
                   jax.ShapeDtypeStruct((9, nbx, nby), dtype),
                   jax.ShapeDtypeStruct((9, nbx, nby), dtype),
                   jax.ShapeDtypeStruct((nbx, nby), jnp.int32)]
        return shapes

    fused = pl.pallas_call(
        kernel,
        grid=(nbx, nby),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes(),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=(jax.default_backend() == "cpu"))

    # ------------------------------------------------------------------
    solid_m, is_set_m, fc_m, active_m = node_masks(meta)
    active_pad = _pad2(active_m, (-X) % TX, (-Y) % TY, H, fill=False)

    def scan_dt(slim_pad, cfl_scen):
        """Global dt reduction from the carried primitives
        (deeps2d_core.cpp:1317-1327 with the fast-path prim lag)."""
        cfl_min = jnp.minimum(jnp.asarray(p.CFL, dtype), cfl_scen)
        k_new = _safe_div(slim_pad.CP, slim_pad.CP - slim_pad.R, 2.0)
        aaa = jnp.sqrt(jnp.maximum(k_new * slim_pad.R * slim_pad.Tg, 0.0))
        dtn = cfl_min * jnp.minimum(p.dx / (aaa + jnp.abs(slim_pad.U)),
                                    p.dy / (aaa + jnp.abs(slim_pad.V)))
        dt_new = jnp.minimum(1.0, jnp.min(jnp.where(active_pad, dtn, 1.0)))
        if p.serial_dt_mode:
            dt_new = jnp.minimum(dt_new, slim_pad.dt)
        return dt_new.astype(dtype)

    def rotated(slim_pad, k):
        aux_g = aux_at(k)
        aux_p = aux_at(k + 1)
        dt_k = scan_dt(slim_pad, aux_g.cfl_scen)
        scal = jnp.stack([
            dt_k.astype(jnp.float32),
            aux_g.beta_scen.astype(jnp.float32),
            aux_g.cfl_scen.astype(jnp.float32),
            aux_g.is_mu_t_iter.astype(jnp.float32),
            aux_p.beta_scen.astype(jnp.float32),
            aux_p.cfl_scen.astype(jnp.float32),
            aux_p.is_mu_t_iter.astype(jnp.float32)])
        ins = ([getattr(slim_pad, f) for f in SLIM_BIG]
               + [meta_pad[f] for f in META_BIG] + [src_pad]
               + [getattr(chem, f) for f in CHEM_FIELDS])
        outs = fused(scal, *ins)
        new_leaves = outs[:len(SLIM_BIG)]
        num, den, ddm, uns = outs[len(SLIM_BIG):]
        slim2 = SlimState(**dict(zip(SLIM_BIG, new_leaves)), dt=dt_k)
        nsum = num.sum((1, 2))
        dsum = den.sum((1, 2))
        if p.isAlternateRMS:
            fb = 0.0 if p.serial_rms_mode else nsum
            rms = jnp.where((nsum > 0) & (dsum > 0),
                            jnp.sqrt(_safe_div(nsum, dsum)), fb)
        else:
            rms = jnp.where(dsum > 0, jnp.sqrt(_safe_div(nsum, dsum)),
                            nsum)
        diag = {"RMS": rms, "DD_max": ddm.max((1, 2)), "dt_used": dt_k,
                "unstable": uns.sum() > 0}
        return slim2, diag

    def pad_slim(slim):
        return SlimState(**{f: _pad2(getattr(slim, f), (-X) % TX,
                                     (-Y) % TY, H) for f in SLIM_BIG},
                         dt=slim.dt)

    def crop(arr):
        return arr[..., H:H + X, H:H + Y]

    def unpad_slim(slim_pad):
        return SlimState(**{f: crop(getattr(slim_pad, f))
                            for f in SLIM_BIG}, dt=slim_pad.dt)

    def chunk(state: SolverState, n_iters: int, start_iter):
        aux0 = aux_at(start_iter)
        S_c, beta_c, _, _, diag0 = pass12(state, meta, p, aux0)
        slim = shrink(SolverState(**{**state.__dict__, "S": S_c,
                                     "beta": beta_c}))
        slim_pad = pad_slim(slim)
        if n_iters > 1:
            ks = start_iter + jnp.arange(n_iters - 1)
            slim_pad, diags = jax.lax.scan(rotated, slim_pad, ks)
        else:
            diags = None
        slim = unpad_slim(slim_pad)
        full = expand(slim, p, src_ext)
        out, dt_new, unstable_last = gfc(full, meta, p, chem,
                                         aux_at(start_iter + n_iters - 1))
        out = SolverState(**{**out.__dict__, "dt": dt_new})

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
        }
        return out, all_diag

    return chunk
