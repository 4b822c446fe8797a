"""Precomputed per-node static context: masks, stencil weights, geometry.

Every per-iteration branch of the reference decodes the CT/TCT bit flags
(deeps2d_core.cpp:893-991, hyper_flow_node.hpp:374-600) — in the first
TPU implementation those decodes (u32 and/cmp/not chains) were recomputed
on every inner iteration and accounted for ~40% of the VPU op stream
(measured by jaxpr census: ~840 of ~1900 plane-ops per iteration were
mask/int work).  All of them are pure functions of the static GridMeta +
SolverParams, so this module computes them ONCE:

* the XLA scan paths close over the ctx (read from HBM, no recompute);
* the Pallas kernel rebuilds it per invocation from the window metadata
  (no extra HBM traffic; amortized across fused iterations when temporal
  blocking is on).

Mask/weight semantics are unchanged from the original inline decode — see
the field comments for the reference cites.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import flags as fl


def iscond(ct, flag):
    f = jnp.uint32(flag & 0xFFFFFFFF)
    return (ct & f) == f


# edge-replicated CT shifts (uint32 — NOT the bool planes: i1 concats
# fail Mosaic register-cast lowering, so the heat visit masks below are
# derived by shifting the integer CT plane and testing bits afterwards)
def _sxl(q):
    return jnp.concatenate([q[:1, :], q[:-1, :]], axis=0)


def _sxr(q):
    return jnp.concatenate([q[1:, :], q[-1:, :]], axis=0)


def _syd(q):
    return jnp.concatenate([q[:, :1], q[:, :-1]], axis=1)


def _syu(q):
    return jnp.concatenate([q[:, 1:], q[:, -1:]], axis=1)


def _heat_visit_masks(ct, solid, wall):
    """The 8 conjugate-heat visit masks (deeps2d_core.cpp:2679-2833):
    hv_* = solid node whose (xl/yd/yu/xr) neighbor is a wall GAS node;
    hw_* = wall gas node whose (down/up/left/right) neighbor is solid.
    ``wall`` is the wall_law|wall_ns plane; gas-ness (~solid) is applied
    here exactly as calc_heat_on_wall_sources did inline."""
    def wall_gas_of(c):
        w = iscond(c, fl.CT_WALL_LAW_2D) | iscond(c, fl.CT_WALL_NO_SLIP_2D)
        return w & ~iscond(c, fl.CT_SOLID_2D)

    def solid_of(c):
        return iscond(c, fl.CT_SOLID_2D)

    ct_xl, ct_xr, ct_yd, ct_yu = _sxl(ct), _sxr(ct), _syd(ct), _syu(ct)
    wall_gas = wall & ~solid
    return {
        "hv_xl": solid & wall_gas_of(ct_xl),
        "hv_yd": solid & wall_gas_of(ct_yd),
        "hv_yu": solid & wall_gas_of(ct_yu),
        "hv_xr": solid & wall_gas_of(ct_xr),
        "hw_down": wall_gas & solid_of(ct_yd),
        "hw_up": wall_gas & solid_of(ct_yu),
        "hw_left": wall_gas & solid_of(ct_xl),
        "hw_right": wall_gas & solid_of(ct_xr),
    }


@dataclass
class StaticCtx:
    """Static per-node planes consumed by the solver stages."""

    # --- per-equation BC masks, (9, X, Y) bool (deeps2d_core.cpp:893-991)
    evolve: jnp.ndarray   # active & eq-solved & ~Dirichlet
    dxn: jnp.ndarray      # Neumann d/dx flag present
    dyn: jnp.ndarray
    dx2: jnp.ndarray      # soft 2nd-order BC
    dy2: jnp.ndarray
    ddmask: jnp.ndarray   # static part of the DD/beta gate (pass 2, :1075)
    # fused combinations used every iteration by pass 1
    ev_flux_x: jnp.ndarray   # evolve & ~dxn  (flux difference path)
    ev_avg_x: jnp.ndarray    # evolve &  dxn  (neighbor-average path)
    ev_flux_y: jnp.ndarray
    ev_avg_y: jnp.ndarray

    # --- node classification, (X, Y) bool
    solid: jnp.ndarray
    fc: jnp.ndarray       # NT_FC (inlet) nodes
    active: jnp.ndarray   # set & ~solid & ~fc
    nrbc: jnp.ndarray     # CT_NONREFLECTED

    # --- neighbor structure (deeps2d_core.cpp:869-888)
    bXl: jnp.ndarray      # neighbor-present bools
    bXr: jnp.ndarray
    bYu: jnp.ndarray
    bYd: jnp.ndarray
    n1: jnp.ndarray       # idXl as dtype (asymmetric wall weights)
    n2: jnp.ndarray
    n3: jnp.ndarray
    n4: jnp.ndarray
    rn_n: jnp.ndarray     # 1 / max(n1+n2, 1)  (exact: values in {1, 2})
    rm_m: jnp.ndarray
    dx1nn: jnp.ndarray    # 1 / (dx * n_n)  (gradient weights, :1169-1237)
    dy1mm: jnp.ndarray

    # --- FillNode2D masks (hyper_flow_node.hpp:374-600)
    u_const: jnp.ndarray
    v_const: jnp.ndarray
    wall_law: jnp.ndarray
    wall_ns: jnp.ndarray  # no-slip & ~wall-law
    wall: jnp.ndarray     # no-slip | wall-law
    turb_on: jnp.ndarray  # TCT != 0
    sig: jnp.ndarray      # SigW on walls else SigF (hpp:494-519)
    y_r: jnp.ndarray      # node radius (j + j0 + 0.5) dy
    jp1: jnp.ndarray      # j + j0 + 1 (axisym F/(j+1) divisor)

    # --- turbulence model masks (hyper_flow_turbulence.hpp:22-61)
    m_prandtl: jnp.ndarray
    m_keps: jnp.ndarray
    m_sa: jnp.ndarray
    m_smag: jnp.ndarray
    kconst: jnp.ndarray
    econst: jnp.ndarray
    ewall: jnp.ndarray
    sa_bc: jnp.ndarray    # SA wall/const boundary nodes
    l_base: jnp.ndarray   # max(l_min, min(dx,dy)) * 0.41
    n_0: jnp.ndarray      # l_min * 0.41
    l_s: jnp.ndarray      # l_base, zeros replaced by 1
    l_min_s: jnp.ndarray  # l_min, zeros replaced by 1

    # --- gradient-stage masks (deeps2d_core.cpp:1169-1237)
    dydx_ok: jnp.ndarray
    dydy_ok: jnp.ndarray
    g_dydx: jnp.ndarray   # active & dydx_ok
    g_dydy: jnp.ndarray
    km: jnp.ndarray       # active & (keps | sa)
    em: jnp.ndarray       # active & keps

    # --- chemistry (deeps2d_core.cpp:4697-4780)
    react: jnp.ndarray    # active & ~CT_Y_CONST

    # --- conjugate-heat visit masks (deeps2d_core.cpp:2679-2833): all 8
    # are pure meta functions, precomputed so the kernel never shifts i1
    # planes (bool concats fail Mosaic: 'Invalid vector register cast').
    # hv_*: solid node with a wall gas neighbor in that direction
    # (visitor order sxl, syd, syu, sxr = gas at I-1, J-1, J+1, I+1);
    # hw_*: wall gas node with a solid neighbor in that direction.
    hv_xl: jnp.ndarray
    hv_yd: jnp.ndarray
    hv_yu: jnp.ndarray
    hv_xr: jnp.ndarray
    hw_down: jnp.ndarray
    hw_up: jnp.ndarray
    hw_left: jnp.ndarray
    hw_right: jnp.ndarray


jax.tree_util.register_dataclass(
    StaticCtx, data_fields=[f for f in StaticCtx.__annotations__],
    meta_fields=[])


# --------------------------------------------------------------------------
# bit-packed transport form: the fused Pallas kernel used to re-run the
# full decode above once per invocation on every (window-redundant) tile —
# ~800 plane-ops/cell, ~10 ms per K-block at 4096² (PERF.md).  Packing the
# ~119 bool planes into 4 uint32 bit-planes outside the kernel (once per
# chunk) and unpacking in-kernel (shift+and+cmp, ~3 ops/mask) plus
# streaming the 13 float weight planes directly cuts that per-block decode
# to ~a third.  y_r / jp1 are NOT streamed: they depend on the window row
# offset j0 and the in-kernel iota form must be preserved bitwise (ghost
# columns beyond the real extent carry their true global j, not an
# edge-replicated copy).
# --------------------------------------------------------------------------
_CTX_BOOL_STACKS = [
    "evolve", "dxn", "dyn", "dx2", "dy2", "ddmask",
    "ev_flux_x", "ev_avg_x", "ev_flux_y", "ev_avg_y",
]
_CTX_BOOL_PLANES = [
    "solid", "fc", "active", "nrbc", "bXl", "bXr", "bYu", "bYd",
    "u_const", "v_const", "wall_law", "wall_ns", "wall", "turb_on",
    "m_prandtl", "m_keps", "m_sa", "m_smag", "kconst", "econst",
    "ewall", "sa_bc", "dydx_ok", "dydy_ok", "g_dydx", "g_dydy",
    "km", "em", "react",
    "hv_xl", "hv_yd", "hv_yu", "hv_xr",
    "hw_down", "hw_up", "hw_left", "hw_right",
]
N_CTX_BITS = 9 * len(_CTX_BOOL_STACKS) + len(_CTX_BOOL_PLANES)
N_CTX_WORDS = -(-N_CTX_BITS // 32)


def _pack_bits(bits):
    words = []
    for w0 in range(0, len(bits), 32):
        grp = bits[w0:w0 + 32]
        acc = grp[0].astype(jnp.uint32)
        for i, b in enumerate(grp[1:], start=1):
            acc = acc | (b.astype(jnp.uint32) << i)
        words.append(acc)
    return jnp.stack(words)


def build_packed_ctx(meta, params):
    """(N_CTX_WORDS, X, Y) uint32 bit-planes of every bool StaticCtx
    field, computed DIRECTLY from meta — same formulas as
    build_static_ctx but never materializing the (9, X, Y) bool stacks
    (the stacked transient costs ~2 GB at 4096² inside a jitted chunk;
    the elementwise OR chains here fuse to nothing).  Bit layout matches
    unpack_static_ctx.  Float/weight planes are NOT packed: they are all
    trivial per-cell functions of meta planes the kernel already holds
    and are rebuilt there (see unpack_static_ctx)."""
    p = params
    if not p.uniform_mesh:
        raise NotImplementedError(
            "packed StaticCtx hardcodes the uniform-mesh mixing-length "
            "floor min(dx, dy); non-uniform meshes must use "
            "build_static_ctx on the XLA path")
    ct, tct = meta.CT, meta.TCT
    shape = ct.shape
    ones = jnp.ones(shape, bool)
    zeros = jnp.zeros(shape, bool)
    solid = iscond(ct, fl.CT_SOLID_2D)
    is_set = iscond(ct, fl.CT_NODE_IS_SET_2D)
    fc = iscond(ct, fl.NT_FC_2D)
    active = is_set & ~solid & ~fc
    keps = iscond(tct, fl.TCT_k_eps_Model_2D)
    sa = iscond(tct, fl.TCT_Spalart_Allmaras_Model_2D)
    turb2 = (keps | sa) if p.sm == fl.SM_NS else zeros

    stacks = {f: [] for f in _CTX_BOOL_STACKS}
    for k in range(9):
        if k < 4:
            c = iscond(ct, fl.CT_Rho_CONST_2D << k)
            dxn = iscond(ct, fl.CT_dRhodx_NULL_2D << k)
            dyn = iscond(ct, fl.CT_dRhody_NULL_2D << k)
            dx2 = iscond(ct, fl.CT_d2Rhodx2_NULL_2D << k)
            dy2 = iscond(ct, fl.CT_d2Rhody2_NULL_2D << k)
            act, ddc = ones, c
        elif k < 7:
            c = iscond(ct, fl.CT_Y_CONST_2D)
            dxn = iscond(ct, fl.CT_dYdx_NULL_2D)
            dyn = iscond(ct, fl.CT_dYdy_NULL_2D)
            dx2 = iscond(ct, fl.CT_d2Ydx2_NULL_2D)
            dy2 = iscond(ct, fl.CT_d2Ydy2_NULL_2D)
            act, ddc = ones, c
        else:
            s = k - 7
            c = iscond(tct, fl.TCT_k_CONST_2D << s)
            dxn = iscond(tct, fl.TCT_dkdx_NULL_2D << s)
            dyn = iscond(tct, fl.TCT_dkdy_NULL_2D << s)
            dx2 = iscond(tct, fl.TCT_d2kdx2_NULL_2D << s)
            dy2 = iscond(tct, fl.TCT_d2kdy2_NULL_2D << s)
            act = (turb2 if k == 7 else
                   (keps if p.sm == fl.SM_NS else zeros))
            ddc = iscond(ct, fl.TCT_k_CONST_2D << s)
        evolve = active & act & ~c
        stacks["evolve"].append(evolve)
        stacks["dxn"].append(dxn)
        stacks["dyn"].append(dyn)
        stacks["dx2"].append(dx2)
        stacks["dy2"].append(dy2)
        stacks["ddmask"].append(active & act & ~ddc)
        stacks["ev_flux_x"].append(evolve & ~dxn)
        stacks["ev_avg_x"].append(evolve & dxn)
        stacks["ev_flux_y"].append(evolve & ~dyn)
        stacks["ev_avg_y"].append(evolve & dyn)

    wall_lawm = iscond(ct, fl.CT_WALL_LAW_2D)
    wall_nsm = iscond(ct, fl.CT_WALL_NO_SLIP_2D) & ~wall_lawm
    m_prandtl = iscond(tct, fl.TCT_Prandtl_Model_2D)
    m_keps = keps & ~m_prandtl
    m_sa = sa & ~m_prandtl & ~m_keps
    dydx_ok = ~iscond(ct, fl.CT_dYdx_NULL_2D)
    dydy_ok = ~iscond(ct, fl.CT_dYdy_NULL_2D)
    planes = {
        "solid": solid, "fc": fc, "active": active,
        "nrbc": iscond(ct, fl.CT_NONREFLECTED_2D),
        "bXl": meta.idXl != 0, "bXr": meta.idXr != 0,
        "bYu": meta.idYu != 0, "bYd": meta.idYd != 0,
        "u_const": iscond(ct, fl.CT_U_CONST_2D),
        "v_const": iscond(ct, fl.CT_V_CONST_2D),
        "wall_law": wall_lawm, "wall_ns": wall_nsm,
        "wall": wall_nsm | wall_lawm, "turb_on": tct != 0,
        "m_prandtl": m_prandtl, "m_keps": m_keps, "m_sa": m_sa,
        "m_smag": (iscond(tct, fl.TCT_Smagorinsky_Model_2D)
                   & ~m_prandtl & ~m_keps & ~m_sa),
        "kconst": iscond(tct, fl.TCT_k_CONST_2D),
        "econst": iscond(tct, fl.TCT_eps_CONST_2D),
        "ewall": iscond(tct, fl.TCT_eps_Cmk2kXn_WALL_2D),
        "sa_bc": (iscond(ct, fl.CT_WALL_NO_SLIP_2D) | wall_lawm
                  | iscond(tct, fl.TCT_nu_t_CONST_2D)),
        "dydx_ok": dydx_ok, "dydy_ok": dydy_ok,
        "g_dydx": active & dydx_ok, "g_dydy": active & dydy_ok,
        "km": active & (keps | sa), "em": active & keps,
        "react": active & ~iscond(ct, fl.CT_Y_CONST_2D),
    }
    planes.update(_heat_visit_masks(ct, solid, wall_nsm | wall_lawm))
    bits = []
    for f in _CTX_BOOL_STACKS:
        bits.extend(stacks[f])
    bits.extend(planes[f] for f in _CTX_BOOL_PLANES)
    return _pack_bits(bits)


def unpack_static_ctx(packed, meta, params, j0=0) -> StaticCtx:
    """Inverse of build_packed_ctx on a (window) block.  The bool masks
    come from the bit-planes (~3 ops each); the float/weight planes and
    the j0-dependent y_r / jp1 are rebuilt from the window's meta planes
    with EXACTLY build_static_ctx's expressions, so the result is
    bitwise identical to an in-kernel build_static_ctx(meta, params,
    j0).  Uniform meshes only (the Pallas path already requires that)."""
    p = params
    if not p.uniform_mesh:
        raise NotImplementedError(
            "packed StaticCtx hardcodes the uniform-mesh mixing-length "
            "floor min(dx, dy); non-uniform meshes must use "
            "build_static_ctx on the XLA path")
    dtype = p.jdtype
    shape = packed.shape[1:]
    idx = 0
    one = jnp.uint32(1)

    def nextbit():
        nonlocal idx
        w, b = divmod(idx, 32)
        idx += 1
        return ((packed[w] >> jnp.uint32(b)) & one) != 0

    vals = {}
    for f in _CTX_BOOL_STACKS:
        vals[f] = jnp.stack([nextbit() for _ in range(9)])
    for f in _CTX_BOOL_PLANES:
        vals[f] = nextbit()

    n1 = meta.idXl.astype(dtype)
    n2 = meta.idXr.astype(dtype)
    n3 = meta.idYu.astype(dtype)
    n4 = meta.idYd.astype(dtype)
    n_n = jnp.maximum(n1 + n2, 1.0)
    m_m = jnp.maximum(n3 + n4, 1.0)
    rn_n = 1.0 / n_n
    rm_m = 1.0 / m_m
    vals.update(
        n1=n1, n2=n2, n3=n3, n4=n4,
        rn_n=rn_n.astype(dtype), rm_m=rm_m.astype(dtype),
        dx1nn=(rn_n / p.dx).astype(dtype),
        dy1mm=(rm_m / p.dy).astype(dtype),
        sig=jnp.where(vals["wall"], jnp.asarray(p.SigW, dtype),
                      jnp.asarray(p.SigF, dtype)))
    l_base = jnp.maximum(meta.l_min, min(p.dx, p.dy)) * 0.41
    vals.update(
        l_base=l_base.astype(dtype),
        n_0=(meta.l_min * 0.41).astype(dtype),
        l_s=jnp.where(l_base != 0, l_base, 1).astype(dtype),
        l_min_s=jnp.where(meta.l_min != 0, meta.l_min, 1).astype(dtype))
    jj = j0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
    vals["y_r"] = (jj + 0.5) * p.dy
    vals["jp1"] = jj + 1.0
    return StaticCtx(**vals)


def spec_supported(params) -> bool:
    """Whether the interior-specialized kernel branch exists for this
    case family.  The specialized StaticCtx folds the per-equation mask
    stacks to single Python bools, which requires every equation to be
    uniformly active on a generic node — true for the NS + k-eps family
    (all 9 equations evolve); Euler/laminar cases have evolve[7:9] False
    (mixed per-equation values) and run the general branch everywhere."""
    return params.sm == fl.SM_NS and "keps" in params.models


def generic_interior_map(CT, TCT, idXl, idXr, idYu, idYd, params):
    """(X, Y) bool numpy map of 'generic interior' nodes — nodes whose
    full StaticCtx decode equals the constants of
    ``specialized_interior_ctx`` (verified by tests/test_spec_kernel.py
    against build_static_ctx).  A generic node carries exactly the
    IS_SET flag and exactly the k-eps model bit, with all four
    neighbors present; any extra CT/TCT bit (BC, wall, solid, const,
    Neumann, d2, nonreflected, other models) makes it non-generic.
    Returns None when the case family has no specialized branch."""
    import numpy as np
    if not spec_supported(params):
        return None
    return ((np.asarray(CT).astype(np.uint32)
             == np.uint32(fl.CT_NODE_IS_SET_2D))
            & (np.asarray(TCT).astype(np.uint32)
               == np.uint32(fl.TCT_k_eps_Model_2D))
            & (np.asarray(idXl) == 1) & (np.asarray(idXr) == 1)
            & (np.asarray(idYu) == 1) & (np.asarray(idYd) == 1))


def specialized_interior_ctx(meta, params, j0=0) -> StaticCtx:
    """StaticCtx of a generic-interior node with every mask a PYTHON
    BOOL and every stencil weight a scalar: the fold-aware combinators
    (core.physics wsel/band/bor/bnot) then eliminate the mask ops at
    trace time, so a tile whose whole window is generic (see
    ``generic_interior_map``) computes the same values as the general
    decode with ~30% fewer vector ops (measured: scripts/
    mask_ablate_bench.py).  Float planes that carry real physics
    (l_min-derived length scales, y_r/jp1) keep their exact general
    expressions, so results are bitwise identical on generic windows.
    """
    p = params
    assert spec_supported(p)
    dtype = p.jdtype
    one = jnp.asarray(1.0, dtype)
    half = jnp.asarray(0.5, dtype)
    shape = meta.CT.shape
    # same expressions as build_static_ctx so values/roundings match
    l_base = jnp.maximum(meta.l_min, min(p.dx, p.dy)) * 0.41
    jj = j0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
    return StaticCtx(
        evolve=True, dxn=False, dyn=False, dx2=False, dy2=False,
        ddmask=True, ev_flux_x=True, ev_avg_x=False,
        ev_flux_y=True, ev_avg_y=False,
        solid=False, fc=False, active=True, nrbc=False,
        bXl=True, bXr=True, bYu=True, bYd=True,
        n1=one, n2=one, n3=one, n4=one, rn_n=half, rm_m=half,
        dx1nn=(half / p.dx).astype(dtype),
        dy1mm=(half / p.dy).astype(dtype),
        u_const=False, v_const=False, wall_law=False, wall_ns=False,
        wall=False, turb_on=True, sig=jnp.asarray(p.SigF, dtype),
        y_r=(jj + 0.5) * p.dy, jp1=jj + 1.0,
        m_prandtl=False, m_keps=True, m_sa=False, m_smag=False,
        kconst=False, econst=False, ewall=False, sa_bc=False,
        l_base=l_base.astype(dtype),
        n_0=(meta.l_min * 0.41).astype(dtype),
        l_s=jnp.where(l_base != 0, l_base, 1).astype(dtype),
        l_min_s=jnp.where(meta.l_min != 0, meta.l_min, 1).astype(dtype),
        dydx_ok=True, dydy_ok=True, g_dydx=True, g_dydy=True,
        km=True, em=True, react=True,
        hv_xl=False, hv_yd=False, hv_yu=False, hv_xr=False,
        hw_down=False, hw_up=False, hw_left=False, hw_right=False)


def build_static_ctx(meta, params, j0=0) -> StaticCtx:
    """Decode GridMeta + SolverParams into a StaticCtx.

    ``j0`` is the global j index of row 0 (nonzero for Pallas tile
    windows); it may be a traced scalar.
    """
    p = params
    ct, tct = meta.CT, meta.TCT
    X = ct.shape
    dtype = p.jdtype

    # ---- equation masks (exact port of the former step.eq_masks) --------
    c, dxn, dyn, dx2, dy2, act, ddc = [], [], [], [], [], [], []
    ones = jnp.ones(X, bool)
    for k in range(4):
        c.append(iscond(ct, fl.CT_Rho_CONST_2D << k))
        dxn.append(iscond(ct, fl.CT_dRhodx_NULL_2D << k))
        dyn.append(iscond(ct, fl.CT_dRhody_NULL_2D << k))
        dx2.append(iscond(ct, fl.CT_d2Rhodx2_NULL_2D << k))
        dy2.append(iscond(ct, fl.CT_d2Rhody2_NULL_2D << k))
        act.append(ones)
        ddc.append(c[-1])
    for k in range(4, 7):
        c.append(iscond(ct, fl.CT_Y_CONST_2D))
        dxn.append(iscond(ct, fl.CT_dYdx_NULL_2D))
        dyn.append(iscond(ct, fl.CT_dYdy_NULL_2D))
        dx2.append(iscond(ct, fl.CT_d2Ydx2_NULL_2D))
        dy2.append(iscond(ct, fl.CT_d2Ydy2_NULL_2D))
        act.append(ones)
        ddc.append(c[-1])
    keps = iscond(tct, fl.TCT_k_eps_Model_2D)
    sa = iscond(tct, fl.TCT_Spalart_Allmaras_Model_2D)
    zeros = jnp.zeros(X, bool)
    turb2 = (keps | sa) if p.sm == fl.SM_NS else zeros
    for k in range(7, 9):
        s = k - 7
        c.append(iscond(tct, fl.TCT_k_CONST_2D << s))
        dxn.append(iscond(tct, fl.TCT_dkdx_NULL_2D << s))
        dyn.append(iscond(tct, fl.TCT_dkdy_NULL_2D << s))
        dx2.append(iscond(tct, fl.TCT_d2kdx2_NULL_2D << s))
        dy2.append(iscond(tct, fl.TCT_d2kdy2_NULL_2D << s))
        act.append(turb2 if k == 7 else
                   (keps if p.sm == fl.SM_NS else zeros))
        # reference pass-2 gate tests CT (not TCT) for these equations
        ddc.append(iscond(ct, fl.TCT_k_CONST_2D << s))

    # ---- node masks ------------------------------------------------------
    solid = iscond(ct, fl.CT_SOLID_2D)
    is_set = iscond(ct, fl.CT_NODE_IS_SET_2D)
    fc = iscond(ct, fl.NT_FC_2D)
    active = is_set & ~solid & ~fc
    nrbc = iscond(ct, fl.CT_NONREFLECTED_2D)

    cmask = jnp.stack(c)
    eact = jnp.stack(act)
    ddc_s = jnp.stack(ddc)
    evolve = active[None] & eact & ~cmask
    ddmask = active[None] & eact & ~ddc_s
    dxn_s = jnp.stack(dxn)
    dyn_s = jnp.stack(dyn)
    ev_flux_x = evolve & ~dxn_s
    ev_avg_x = evolve & dxn_s
    ev_flux_y = evolve & ~dyn_s
    ev_avg_y = evolve & dyn_s

    # ---- neighbor structure ----------------------------------------------
    bXl = meta.idXl != 0
    bXr = meta.idXr != 0
    bYu = meta.idYu != 0
    bYd = meta.idYd != 0
    n1 = meta.idXl.astype(dtype)
    n2 = meta.idXr.astype(dtype)
    n3 = meta.idYu.astype(dtype)
    n4 = meta.idYd.astype(dtype)
    n_n = jnp.maximum(n1 + n2, 1.0)
    m_m = jnp.maximum(n3 + n4, 1.0)
    rn_n = 1.0 / n_n
    rm_m = 1.0 / m_m
    dx1nn = (rn_n / p.dx).astype(dtype)
    dy1mm = (rm_m / p.dy).astype(dtype)

    # ---- fill masks --------------------------------------------------------
    u_const = iscond(ct, fl.CT_U_CONST_2D)
    v_const = iscond(ct, fl.CT_V_CONST_2D)
    wall_lawm = iscond(ct, fl.CT_WALL_LAW_2D)
    wall_nsm = iscond(ct, fl.CT_WALL_NO_SLIP_2D) & ~wall_lawm
    wall = wall_nsm | wall_lawm
    turb_on = tct != 0
    sig = jnp.where(wall, jnp.asarray(p.SigW, dtype),
                    jnp.asarray(p.SigF, dtype))
    jj = j0 + jax.lax.broadcasted_iota(jnp.int32, X, 1).astype(dtype)
    y_r = (jj + 0.5) * p.dy
    jp1 = jj + 1.0

    # ---- turbulence masks --------------------------------------------------
    m_prandtl = iscond(tct, fl.TCT_Prandtl_Model_2D)
    m_keps = keps & ~m_prandtl
    m_sa = sa & ~m_prandtl & ~m_keps
    m_smag = (iscond(tct, fl.TCT_Smagorinsky_Model_2D)
              & ~m_prandtl & ~m_keps & ~m_sa)
    kconst = iscond(tct, fl.TCT_k_CONST_2D)
    econst = iscond(tct, fl.TCT_eps_CONST_2D)
    ewall = iscond(tct, fl.TCT_eps_Cmk2kXn_WALL_2D)
    sa_bc = (iscond(ct, fl.CT_WALL_NO_SLIP_2D) | wall_lawm
             | iscond(tct, fl.TCT_nu_t_CONST_2D))
    if p.uniform_mesh:
        min_dxdy = min(p.dx, p.dy)
    else:
        # per-node min(dy, dx) on non-uniform meshes (hyper_flow_node.hpp:
        # 608 reads the node's own spacing for the mixing-length floor)
        min_dxdy = jnp.minimum(meta.dx_map, meta.dy_map).astype(dtype)
    l_base = jnp.maximum(meta.l_min, min_dxdy) * 0.41
    n_0 = meta.l_min * 0.41
    l_s = jnp.where(l_base != 0, l_base, 1)
    l_min_s = jnp.where(meta.l_min != 0, meta.l_min, 1)

    # ---- gradient masks -----------------------------------------------------
    dydx_ok = ~iscond(ct, fl.CT_dYdx_NULL_2D)
    dydy_ok = ~iscond(ct, fl.CT_dYdy_NULL_2D)
    km = active & (keps | sa)
    em = active & keps

    # ---- chemistry -----------------------------------------------------------
    react = active & ~iscond(ct, fl.CT_Y_CONST_2D)

    return StaticCtx(
        evolve=evolve, dxn=dxn_s, dyn=dyn_s,
        dx2=jnp.stack(dx2), dy2=jnp.stack(dy2), ddmask=ddmask,
        ev_flux_x=ev_flux_x, ev_avg_x=ev_avg_x,
        ev_flux_y=ev_flux_y, ev_avg_y=ev_avg_y,
        solid=solid, fc=fc, active=active, nrbc=nrbc,
        bXl=bXl, bXr=bXr, bYu=bYu, bYd=bYd,
        n1=n1, n2=n2, n3=n3, n4=n4, rn_n=rn_n.astype(dtype),
        rm_m=rm_m.astype(dtype), dx1nn=dx1nn, dy1mm=dy1mm,
        u_const=u_const, v_const=v_const, wall_law=wall_lawm,
        wall_ns=wall_nsm, wall=wall, turb_on=turb_on, sig=sig,
        y_r=y_r, jp1=jp1,
        m_prandtl=m_prandtl, m_keps=m_keps, m_sa=m_sa, m_smag=m_smag,
        kconst=kconst, econst=econst, ewall=ewall, sa_bc=sa_bc,
        l_base=l_base.astype(dtype), n_0=n_0.astype(dtype),
        l_s=l_s.astype(dtype), l_min_s=l_min_s.astype(dtype),
        dydx_ok=dydx_ok, dydy_ok=dydy_ok,
        g_dydx=active & dydx_ok, g_dydy=active & dydy_ok, km=km, em=em,
        react=react, **_heat_visit_masks(ct, solid, wall))
