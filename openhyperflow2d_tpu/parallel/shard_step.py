"""Explicit shard_map halo-exchange inner loop.

The GSPMD path (parallel/mesh.py) lets XLA infer the halo collectives from
the global-array stencil.  This module is the hand-scheduled alternative —
the direct TPU analog of the reference's MPI strip decomposition with
1-column halo Send/Recv (deeps2d_core.cpp:1336-1399):

* the domain is strip-partitioned along X over the mesh's 'x' axis;
* each iteration ppermutes H=3 boundary columns to the neighbor shards
  (one logical hop over ICI), runs the same stage functions on the extended
  block, and crops the interior;
* dt / RMS reductions are lax.pmin / lax.psum — keeping the reference-exact
  dt pairing (unlike the Pallas path, the collective can sit mid-iteration).

Halo semantics at the global boundary: the ring ppermute wraps, so the
first/last shard receives the far end's columns; the received CT/TCT halos
are zeroed there, which reproduces "no neighbor" (idXl/idXr = 0 already
masks every stencil read, and zero CT kills the wall/solid masks used by
the conjugate-heat shifts).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import flags as fl
from ..core.physics import _safe_div
from ..core.state import ChemTables, GridMeta, SolverParams, SolverState
from ..core.static_ctx import build_static_ctx
from ..core.step import (SlimState, StepAux, expand, gfc, make_aux,
                         needs_y_plus, pass12, shrink, _SLIM_FIELDS)
from ..ops.pallas_step import halo_depth

HALO = 3    # worst-case depth; the chunk builders use halo_depth(params)
SLIM_BIG = [f for f in _SLIM_FIELDS if f != "dt"]
# the optional non-uniform spacing maps are excluded: the sharded fast
# paths support uniform meshes only (make_* guards below) and the absent
# (None) maps must not reach _pad_x / the shard_map leaf lists
META_FIELDS = [f for f in GridMeta.__dataclass_fields__
               if f not in ("dx_map", "dy_map")]


def _require_uniform(params: SolverParams, path: str):
    if not params.uniform_mesh:
        raise NotImplementedError(
            f"{path} supports uniform meshes only; run non-uniform cases "
            "on the XLA path (core.step)")


def _pad_x(a, px):
    pad = [(0, 0)] * (a.ndim - 2) + [(0, px), (0, 0)]
    return jnp.pad(a, pad)


def make_shard_chunk(meta: GridMeta, params: SolverParams, chem: ChemTables,
                     beta_tab, cfl_tab, turb_start, mesh: Mesh,
                     halo_ablate: bool = False):
    """``halo_ablate``: replace every per-iteration halo ppermute with a
    same-shaped LOCAL slice (results wrong at strip seams, timing valid)
    — isolates the halo-exchange overhead %, BASELINE.md's third metric
    (the reference can't measure this either; its Isend/Irecv overlap is
    the same ablation done by hand, deeps2d_core.cpp:1336-1409)."""
    _require_uniform(params, "make_shard_chunk")
    p = params
    H = halo_depth(params)
    n = mesh.shape["x"]
    X, Y = p.MaxX, p.MaxY
    px = (-X) % n
    Xp = X + px
    dtype = p.jdtype

    meta_pad = GridMeta(**{f: _pad_x(getattr(meta, f), px)
                           for f in META_FIELDS})
    p_loc = SolverParams(**{**p.__dict__, "MaxX": Xp // n + 2 * H})

    def aux_at(it):
        return make_aux(beta_tab, cfl_tab, turb_start, it, dtype)

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    def ext(a, zero_edge=False):
        """Extend the local block with H halo columns from the neighbors."""
        if halo_ablate:
            left, right = a[..., -H:, :], a[..., :H, :]
        else:
            left = lax.ppermute(a[..., -H:, :], "x", fwd)   # from left nbr
            right = lax.ppermute(a[..., :H, :], "x", bwd)   # from right nbr
        if zero_edge:
            idx = lax.axis_index("x")
            left = jnp.where(idx == 0, jnp.zeros_like(left), left)
            right = jnp.where(idx == n - 1, jnp.zeros_like(right), right)
        return jnp.concatenate([left, a, right], axis=-2)

    def crop(a):
        return a[..., H:-H, :]

    def body(meta_ext, src_ext_loc, ctx_ext, yp_ext, lam_ext, slim, k):
        aux_g = aux_at(k)
        aux_p = aux_at(k + 1)
        slim_ext = SlimState(**{f: ext(getattr(slim, f))
                                for f in SLIM_BIG}, dt=slim.dt)
        full = expand(slim_ext, p_loc, src_ext_loc, yp_ext, lam_ext)
        out, dt_field, unstable = gfc(full, meta_ext, p_loc, chem, aux_g,
                                      j0=0, return_fields=True, ctx=ctx_ext)
        # reduce the pre-chemistry per-node dt over the shard interior, then
        # globally (the reference's per-rank min + Bcast,
        # deeps2d_core.cpp:805-825)
        dt_new = lax.pmin(jnp.minimum(1.0, jnp.min(crop(dt_field))), "x")
        if p.serial_dt_mode:
            dt_new = jnp.minimum(dt_new, slim.dt)
        out = SolverState(**{**out.__dict__, "dt": dt_new.astype(dtype)})
        S_c, beta_c, _, _, fields = pass12(out, meta_ext, p_loc, aux_p,
                                           j0=0, return_fields=True,
                                           ctx=ctx_ext)
        new_slim = SlimState(
            **{f: crop(getattr(out, f)) for f in SLIM_BIG
               if f not in ("S", "beta")},
            S=crop(S_c), beta=crop(beta_c), dt=dt_new.astype(dtype))

        gate = crop(fields["gate"])
        abs_dd = crop(fields["abs_dd"])
        tmp = crop(fields["tmp"])
        dd_l = crop(fields["dd_local"])
        if p.isAlternateRMS:
            acc = abs_dd if p.serial_rms_mode else abs_dd * abs_dd
            num = lax.psum(jnp.sum(jnp.where(gate, acc, 0.0),
                                   (-2, -1)), "x")
            den = lax.psum(jnp.sum(jnp.where(gate, tmp * tmp, 0.0),
                                   (-2, -1)), "x")
        else:
            num = lax.psum(jnp.sum(jnp.where(gate, dd_l * dd_l, 0.0),
                                   (-2, -1)), "x")
            den = lax.psum(jnp.sum(gate, (-2, -1)).astype(dtype), "x")
        fallback = 0.0 if (p.isAlternateRMS and p.serial_rms_mode) else num
        rms = jnp.where((num > 0) & (den > 0),
                        jnp.sqrt(_safe_div(num, den)), fallback)
        ddm = lax.pmax(jnp.max(jnp.where(gate, dd_l, 0.0), (-2, -1)), "x")
        uns = lax.pmax(jnp.any(crop(unstable)).astype(jnp.int32), "x")
        diag = {"RMS": rms, "DD_max": ddm, "dt_used": dt_new,
                "unstable": uns > 0}
        return new_slim, diag

    def sharded_inner(meta_loc_tree, src_loc, slim0_tree, yp_loc,
                      lam_loc, start_iter, n_iters):
        meta_loc = GridMeta(**dict(zip(META_FIELDS, meta_loc_tree)))
        slim0 = SlimState(**dict(zip(_SLIM_FIELDS, slim0_tree)))
        meta_ext = GridMeta(**{
            f: ext(getattr(meta_loc, f),
                   zero_edge=(f in ("CT", "TCT", "idXl", "idXr",
                                    "idYu", "idYd")))
            for f in META_FIELDS})
        src_ext_loc = ext(src_loc)
        # chunk-constant planes outside the scan carry (core/step.py
        # SlimState diet): halo-extended once, reused every iteration
        yp_ext = ext(yp_loc) if needs_y_plus(p) else None
        lam_ext = ext(lam_loc) if p.sm != fl.SM_NS else None
        ctx_ext = build_static_ctx(meta_ext, p_loc)
        ks = start_iter + jnp.arange(n_iters - 1)
        slim_f, diags = lax.scan(partial(body, meta_ext, src_ext_loc,
                                         ctx_ext, yp_ext, lam_ext),
                                 slim0, ks)
        return tuple(getattr(slim_f, f) for f in _SLIM_FIELDS), diags

    spec_x = P(None, "x", None)
    spec_x2 = P("x", None)

    def spec_for(a):
        return spec_x if a.ndim == 3 else (spec_x2 if a.ndim == 2 else P())

    meta_leaves = [getattr(meta_pad, f) for f in META_FIELDS]
    slim_ranks = {"S": 3, "beta": 3, "Yc": 3}
    out_specs = (tuple(
        (P() if f == "dt" else
         (spec_x if slim_ranks.get(f, 2) == 3 else spec_x2))
        for f in _SLIM_FIELDS), {"RMS": P(), "DD_max": P(),
                                 "dt_used": P(), "unstable": P()})

    def in_spec_for_slim(f):
        if f == "dt":
            return P()
        return spec_x if slim_ranks.get(f, 2) == 3 else spec_x2

    ctx_g = build_static_ctx(meta, p)

    def chunk(state: SolverState, n_iters: int, start_iter, src_ext):
        if not p.has_ext_src:
            src_ext = jnp.zeros((9, p.MaxX, p.MaxY), p.jdtype)
        src_pad = _pad_x(src_ext, px)
        aux0 = aux_at(start_iter)
        S_c, beta_c, _, _, diag0 = pass12(state, meta, p, aux0, ctx=ctx_g)
        slim = shrink(SolverState(**{**state.__dict__, "S": S_c,
                                     "beta": beta_c}))
        slim_pad = SlimState(**{f: _pad_x(getattr(slim, f), px)
                                for f in SLIM_BIG}, dt=slim.dt)
        yp_pad = _pad_x(state.y_plus, px)
        lam_pad = _pad_x(state.lam_t, px)
        if n_iters > 1:
            inner = shard_map(
                partial(sharded_inner, n_iters=n_iters),
                mesh=mesh,
                in_specs=(tuple(spec_for(a) for a in meta_leaves),
                          spec_x,
                          tuple(in_spec_for_slim(f) for f in _SLIM_FIELDS),
                          spec_x2, spec_x2,
                          P()),
                out_specs=out_specs,
                check_vma=False)
            slim_leaves, diags = inner(
                tuple(meta_leaves), src_pad,
                tuple(getattr(slim_pad, f) for f in _SLIM_FIELDS),
                yp_pad, lam_pad,
                start_iter)
            slim_pad = SlimState(**dict(zip(_SLIM_FIELDS, slim_leaves)))
        else:
            diags = None
        slim = SlimState(**{f: getattr(slim_pad, f)[..., :X, :]
                            for f in SLIM_BIG}, dt=slim_pad.dt)
        yp_const = state.y_plus if needs_y_plus(p) else None
        lam_const = None if p.sm == fl.SM_NS else state.lam_t
        full = expand(slim, p, src_ext, yp_const, lam_const)
        out, dt_new, unstable_last = gfc(full, meta, p, chem,
                                         aux_at(start_iter + n_iters - 1),
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
        }
        return out, all_diag

    return chunk


def make_pallas_shard_chunk(meta: GridMeta, params: SolverParams,
                            chem: ChemTables, beta_tab, cfl_tab,
                            turb_start, mesh: Mesh,
                            tile=(64, 128), fuse_iters: int = 4,
                            vmem_limit_bytes=None, overlap: bool = False):
    """Multi-chip fused-Pallas inner loop: X-strip decomposition where
    every shard runs the fused kernel (ops/pallas_step) on its
    halo-extended local block.

    The TPU-native analog of the reference's MPI strips (SURVEY §2.8) at
    kernel granularity: per block of K = ``fuse_iters`` iterations each
    shard ppermutes 3K boundary columns to its neighbors (one ICI hop,
    amortized over the K fused iterations), runs the kernel, and crops the
    interior.  dt is lax.pmin'ed at block entry and frozen for the block
    (same semantics as the single-chip fused path); RMS/DD/instability
    partials are psum'ed with the shard-halo columns masked out so no cell
    is double-counted.  Global-boundary halos reuse the zero-CT trick of
    ``make_shard_chunk``: the wrap columns are never read (the boundary
    nodes' own idXl/idXr flags collapse the stencil) and never computed on.

    ``overlap=True`` restructures each K-block into the reference's
    Isend/Irecv -> work -> Wait pattern (deeps2d_core.cpp:1336-1409):
    the two 3K-wide EDGE strips are advanced first through the plain XLA
    stage functions (the same gfc/pass12 code the kernel fuses — cheap at
    strip width), their fresh boundary columns feed the lax.ppermute
    immediately, and the interior Pallas kernel runs while the collective
    is in flight (XLA's async collective-permute scheduler hides it).
    Costs ~2·3K columns of XLA-path compute per block in exchange for
    fully hidden halo latency; numerics are identical to reduction-order
    associativity (the RMS/DD partials are combined edge+interior before
    the same psum).
    """
    from ..core.static_ctx import build_static_ctx as _bsc
    from ..ops.pallas_step import _default_vmem, _machinery

    _require_uniform(params, "make_pallas_shard_chunk")
    p = params
    K = int(fuse_iters)
    H = halo_depth(params) * K
    n = mesh.shape["x"]
    X, Y = p.MaxX, p.MaxY
    px = (-X) % n
    Xp = X + px
    X_loc = Xp // n
    Xext = X_loc + 2 * H
    dtype = p.jdtype
    vmem = _default_vmem(vmem_limit_bytes)

    if overlap and X_loc < 2 * H:
        raise ValueError(
            f"overlap=True needs a local strip of at least 2*3K columns "
            f"(X_loc={X_loc} < {2 * H}): the two fresh 3K-wide edges must "
            f"not overlap; use more columns per shard or a smaller "
            f"fuse_iters")
    meta_pad = GridMeta(**{f: _pad_x(getattr(meta, f), px)
                           for f in META_FIELDS})
    p_loc = SolverParams(**{**p.__dict__, "MaxX": Xext})

    def aux_at(it):
        return make_aux(beta_tab, cfl_tab, turb_start, it, dtype)

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    def ext(a, zero_edge=False):
        left = lax.ppermute(a[..., -H:, :], "x", fwd)    # from left nbr
        right = lax.ppermute(a[..., :H, :], "x", bwd)    # from right nbr
        if zero_edge:
            idx = lax.axis_index("x")
            left = jnp.where(idx == 0, jnp.zeros_like(left), left)
            right = jnp.where(idx == n - 1, jnp.zeros_like(right), right)
        return jnp.concatenate([left, a, right], axis=-2)

    def crop(a):
        return a[..., H:H + X_loc, :]

    def sharded_inner(meta_leaves, src_loc, slim_leaves, yp_loc,
                      lam_loc, start_iter, n_iters):
        meta_loc = GridMeta(**dict(zip(META_FIELDS, meta_leaves)))
        slim0 = SlimState(**dict(zip(_SLIM_FIELDS, slim_leaves)))
        meta_ext = GridMeta(**{
            f: ext(getattr(meta_loc, f),
                   zero_edge=(f in ("CT", "TCT", "idXl", "idXr",
                                    "idYu", "idYd")))
            for f in META_FIELDS})
        yp_ext = ext(yp_loc) if needs_y_plus(p) else None
        lam_ext = ext(lam_loc) if p.sm != fl.SM_NS else None
        M = _machinery(
            meta_ext, p_loc, chem, beta_tab, cfl_tab, turb_start,
            tile, K, vmem, interior_x=(H, H + X_loc),
            red_sum=lambda x: lax.psum(x, "x"),
            red_max=lambda x: lax.pmax(x, "x"),
            red_min=lambda x: lax.pmin(x, "x"),
            y_plus=yp_ext, lam_t_const=lam_ext)
        make_block = M.make_block
        src_ex = M.explode(ext(src_loc)) if p.has_ext_src else None

        def make_body(KK):
            blk = make_block(KK)

            def body(slim, kbase):
                slim_ext = SlimState(
                    **{f: ext(getattr(slim, f)) for f in SLIM_BIG},
                    dt=slim.dt)
                slim2_ext, diag = blk(slim_ext, kbase, src_ex)
                slim2 = SlimState(
                    **{f: crop(getattr(slim2_ext, f)) for f in SLIM_BIG},
                    dt=slim2_ext.dt)
                return slim2, diag

            return body

        nb, rem = divmod(n_iters - 1, K)
        slim = slim0
        diags = None
        if nb:
            ks = start_iter + K * jnp.arange(nb)
            slim, diags = lax.scan(make_body(K), slim, ks)
            diags = jax.tree.map(
                lambda a: a.reshape((nb * K,) + a.shape[2:]), diags)
        if rem:
            slim, d2 = make_body(rem)(slim, start_iter + nb * K)
            diags = (d2 if diags is None else
                     jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0),
                                  diags, d2))
        return tuple(getattr(slim, f) for f in _SLIM_FIELDS), diags

    def sharded_inner_overlap(meta_leaves, src_loc, slim_leaves, yp_loc,
                              lam_loc, start_iter, n_iters):
        """Isend/Irecv -> work -> Wait variant: XLA edge strips first,
        ppermute their fresh boundary columns, interior kernel underneath
        (see the ``overlap`` paragraph in the factory docstring)."""
        meta_loc = GridMeta(**dict(zip(META_FIELDS, meta_leaves)))
        slim0 = SlimState(**dict(zip(_SLIM_FIELDS, slim_leaves)))
        yp_ext = ext(yp_loc) if needs_y_plus(p) else None
        lam_ext = ext(lam_loc) if p.sm != fl.SM_NS else None
        meta_ext = GridMeta(**{
            f: ext(getattr(meta_loc, f),
                   zero_edge=(f in ("CT", "TCT", "idXl", "idXr",
                                    "idYu", "idYd")))
            for f in META_FIELDS})
        H3 = 3 * H   # edge-strip width: outputs [H, 2H) stay clean of the
        #              strip's replicated far edge after K iterations

        def eL(a):
            return a[..., :H3, :] if a is not None else None

        def eR(a):
            return a[..., -H3:, :] if a is not None else None

        def mid(a):
            return a[..., H:H + X_loc, :] if a is not None else None

        meta_eL = GridMeta(**{f: eL(getattr(meta_ext, f))
                              for f in META_FIELDS})
        meta_eR = GridMeta(**{f: eR(getattr(meta_ext, f))
                              for f in META_FIELDS})
        meta_int = GridMeta(**{f: mid(getattr(meta_ext, f))
                               for f in META_FIELDS})
        p_edge = SolverParams(**{**p.__dict__, "MaxX": H3})
        p_int = SolverParams(**{**p.__dict__, "MaxX": X_loc})
        ctx_eL = _bsc(meta_eL, p_edge)
        ctx_eR = _bsc(meta_eR, p_edge)
        M_int = _machinery(meta_int, p_int, chem, beta_tab, cfl_tab,
                           turb_start, tile, K, vmem,
                           interior_x=(H, X_loc - H),
                           red_min=lambda x: lax.pmin(x, "x"),
                           y_plus=mid(yp_ext), lam_t_const=mid(lam_ext))
        src_ext_loc = ext(src_loc)
        src_int_ex = (M_int.explode(mid(src_ext_loc)) if p.has_ext_src
                      else None)
        src_eL, src_eR = eL(src_ext_loc), eR(src_ext_loc)

        def f32r(v):
            # the kernel ingests its per-block scalars (dt, scenario
            # values) through float32 SMEM (ops/pallas_step scal packing);
            # the edge strips must see the SAME rounded values or f64 runs
            # drift at the 1e-7 level
            return jnp.asarray(v).astype(jnp.float32).astype(dtype)

        def edge_block(KK, sl, meta_e, ctx_e, src_e, yp_e, lam_e,
                       kbase, dt_k):
            """KK rotated iterations of the XLA stage functions on one
            3K-wide strip; returns (carry, raw partials over the H fresh
            boundary columns [H, 2H)) — the same per-iteration math the
            kernel accumulates (ops/pallas_step iter_body)."""
            carry = SlimState(**{f: getattr(sl, f) for f in SLIM_BIG},
                              dt=f32r(dt_k))
            csl = slice(H, 2 * H)
            nums, dens, ddms, unss, ovrs = [], [], [], [], []
            for i in range(KK):
                ag, ap = aux_at(kbase + i), aux_at(kbase + i + 1)
                aux_g = StepAux(beta_scen=f32r(ag.beta_scen),
                                cfl_scen=f32r(ag.cfl_scen),
                                is_mu_t_iter=ag.is_mu_t_iter)
                aux_p = StepAux(beta_scen=f32r(ap.beta_scen),
                                cfl_scen=f32r(ap.cfl_scen),
                                is_mu_t_iter=ap.is_mu_t_iter)
                full = expand(carry, p_edge, src_e, yp_e, lam_e)
                out, dt_f, uns_f = gfc(full, meta_e, p_edge, chem, aux_g,
                                       j0=0, return_fields=True, ctx=ctx_e)
                out = SolverState(**{**out.__dict__, "dt": f32r(dt_k)})
                S_c, beta_c, _, _, fields = pass12(out, meta_e, p_edge,
                                                   aux_p, j0=0,
                                                   return_fields=True,
                                                   ctx=ctx_e)
                carry = SlimState(
                    **{f: getattr(out, f) for f in SLIM_BIG
                       if f not in ("S", "beta")},
                    S=S_c, beta=beta_c, dt=f32r(dt_k))
                g = fields["gate"][:, csl, :]
                ad = fields["abs_dd"][:, csl, :]
                tm = fields["tmp"][:, csl, :]
                dl = fields["dd_local"][:, csl, :]
                if p.isAlternateRMS:
                    acc = ad if p.serial_rms_mode else ad * ad
                    nums.append(jnp.sum(jnp.where(g, acc, 0.0), (-2, -1)))
                    dens.append(jnp.sum(jnp.where(g, tm * tm, 0.0),
                                        (-2, -1)))
                else:
                    nums.append(jnp.sum(jnp.where(g, dl * dl, 0.0),
                                        (-2, -1)))
                    dens.append(jnp.sum(g, (-2, -1)).astype(dtype))
                ddms.append(jnp.max(jnp.where(g, dl, 0.0), (-2, -1)))
                unss.append(jnp.sum(uns_f[csl, :].astype(jnp.int32)))
                # frozen-dt CFL guard over the fresh edge columns (same
                # monitor as the kernel's pr_ovr, ops/pallas_step)
                ovrs.append(jnp.sum(
                    (f32r(dt_k) > dt_f[csl, :]).astype(jnp.int32)))
            return carry, {"num": jnp.stack(nums, -1),
                           "den": jnp.stack(dens, -1),
                           "ddm": jnp.stack(ddms, -1),
                           "uns": jnp.stack(unss, -1),
                           "ovr": jnp.stack(ovrs, -1)}

        def make_body(KK):
            blk_int = M_int.make_block(KK)

            def body(slim_c, kbase):
                aux0 = aux_at(kbase)
                slim_mid = SlimState(**{f: mid(getattr(slim_c, f))
                                        for f in SLIM_BIG}, dt=slim_c.dt)
                # one shared frozen dt for edges + interior (each local
                # node counted once per shard; pmin across the mesh)
                dt_k = M_int.scan_dt(slim_mid, aux0.cfl_scen)
                sL, rL = edge_block(
                    KK, SlimState(**{f: eL(getattr(slim_c, f))
                                     for f in SLIM_BIG}, dt=dt_k),
                    meta_eL, ctx_eL, src_eL, eL(yp_ext), eL(lam_ext),
                    kbase, dt_k)
                sR, rR = edge_block(
                    KK, SlimState(**{f: eR(getattr(slim_c, f))
                                     for f in SLIM_BIG}, dt=dt_k),
                    meta_eR, ctx_eR, src_eR, eR(yp_ext), eR(lam_ext),
                    kbase, dt_k)
                new_l = {f: getattr(sL, f)[..., H:2 * H, :]
                         for f in SLIM_BIG}
                new_r = {f: getattr(sR, f)[..., H:2 * H, :]
                         for f in SLIM_BIG}
                # "Isend/Irecv": the fresh edges travel over ICI while the
                # interior kernel computes below (async collective permute)
                recv_l = {f: lax.ppermute(new_r[f], "x", fwd)
                          for f in SLIM_BIG}
                recv_r = {f: lax.ppermute(new_l[f], "x", bwd)
                          for f in SLIM_BIG}
                sI, rI = blk_int(slim_mid, kbase, src_int_ex, dt_in=dt_k,
                                 raw_diag=True)
                # "Wait": reassemble the extended block for the next one
                new_ext = {
                    f: jnp.concatenate(
                        [recv_l[f], new_l[f],
                         getattr(sI, f)[..., H:X_loc - H, :],
                         new_r[f], recv_r[f]], axis=-2)
                    for f in SLIM_BIG}
                num = lax.psum(rL["num"] + rI["num"] + rR["num"], "x")
                den = lax.psum(rL["den"] + rI["den"] + rR["den"], "x")
                if p.isAlternateRMS:
                    fb = 0.0 if p.serial_rms_mode else num
                    rms = jnp.where((num > 0) & (den > 0),
                                    jnp.sqrt(_safe_div(num, den)), fb)
                else:
                    rms = jnp.where(den > 0,
                                    jnp.sqrt(_safe_div(num, den)), num)
                ddm = lax.pmax(
                    jnp.maximum(jnp.maximum(rL["ddm"], rI["ddm"]),
                                rR["ddm"]), "x")
                uns = lax.psum(rL["uns"] + rI["uns"] + rR["uns"], "x")
                ovr = lax.psum(rL["ovr"] + rI["ovr"] + rR["ovr"], "x")
                diag = {"RMS": rms.T, "DD_max": ddm.T,
                        "dt_used": jnp.broadcast_to(dt_k, (KK,)),
                        "unstable": uns > 0,
                        "dt_overrun": ovr > 0}
                return SlimState(**new_ext, dt=dt_k), diag

            return body

        slim_c = SlimState(**{f: ext(getattr(slim0, f))
                              for f in SLIM_BIG}, dt=slim0.dt)
        nb, rem = divmod(n_iters - 1, K)
        diags = None
        if nb:
            ks = start_iter + K * jnp.arange(nb)
            slim_c, diags = lax.scan(make_body(K), slim_c, ks)
            diags = jax.tree.map(
                lambda a: a.reshape((nb * K,) + a.shape[2:]), diags)
        if rem:
            slim_c, d2 = make_body(rem)(slim_c, start_iter + nb * K)
            diags = (d2 if diags is None else
                     jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0),
                                  diags, d2))
        slim_f = SlimState(**{f: crop(getattr(slim_c, f))
                              for f in SLIM_BIG}, dt=slim_c.dt)
        return tuple(getattr(slim_f, f) for f in _SLIM_FIELDS), diags

    spec_x = P(None, "x", None)
    spec_x2 = P("x", None)
    slim_ranks = {"S": 3, "beta": 3, "Yc": 3}

    def spec_for(a):
        return spec_x if a.ndim == 3 else (spec_x2 if a.ndim == 2 else P())

    def in_spec_for_slim(f):
        if f == "dt":
            return P()
        return spec_x if slim_ranks.get(f, 2) == 3 else spec_x2

    meta_leaves = [getattr(meta_pad, f) for f in META_FIELDS]
    out_specs = (tuple(
        (P() if f == "dt" else
         (spec_x if slim_ranks.get(f, 2) == 3 else spec_x2))
        for f in _SLIM_FIELDS), {"RMS": P(), "DD_max": P(),
                                 "dt_used": P(), "unstable": P(),
                                 "dt_overrun": P()})

    ctx_g = build_static_ctx(meta, p)

    def chunk(state: SolverState, n_iters: int, start_iter, src_ext):
        if not p.has_ext_src:
            src_ext = jnp.zeros((9, p.MaxX, p.MaxY), p.jdtype)
        src_pad = _pad_x(src_ext, px)
        aux0 = aux_at(start_iter)
        S_c, beta_c, _, _, diag0 = pass12(state, meta, p, aux0, ctx=ctx_g)
        slim = shrink(SolverState(**{**state.__dict__, "S": S_c,
                                     "beta": beta_c}))
        slim_pad = SlimState(**{f: _pad_x(getattr(slim, f), px)
                                for f in SLIM_BIG}, dt=slim.dt)
        yp_pad = _pad_x(state.y_plus, px)
        lam_pad = _pad_x(state.lam_t, px)
        if n_iters > 1:
            inner = shard_map(
                partial(sharded_inner_overlap if overlap
                        else sharded_inner, n_iters=n_iters),
                mesh=mesh,
                in_specs=(tuple(spec_for(a) for a in meta_leaves),
                          spec_x,
                          tuple(in_spec_for_slim(f) for f in _SLIM_FIELDS),
                          spec_x2, spec_x2,
                          P()),
                out_specs=out_specs,
                check_vma=False)
            slim_leaves, diags = inner(
                tuple(meta_leaves), src_pad,
                tuple(getattr(slim_pad, f) for f in _SLIM_FIELDS),
                yp_pad, lam_pad,
                start_iter)
            slim_pad = SlimState(**dict(zip(_SLIM_FIELDS, slim_leaves)))
        else:
            diags = None
        slim = SlimState(**{f: getattr(slim_pad, f)[..., :X, :]
                            for f in SLIM_BIG}, dt=slim_pad.dt)
        yp_const = state.y_plus if needs_y_plus(p) else None
        lam_const = None if p.sm == fl.SM_NS else state.lam_t
        full = expand(slim, p, src_ext, yp_const, lam_const)
        out, dt_new, unstable_last = gfc(full, meta, p, chem,
                                         aux_at(start_iter + n_iters - 1),
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
            # frozen-dt CFL monitor (see ops/pallas_step); epilogue gfc
            # recomputes a fresh dt -> False
            "dt_overrun": trail(diags["dt_overrun"] if diags else None,
                                jnp.asarray(False)),
        }
        return out, all_diag

    return chunk
