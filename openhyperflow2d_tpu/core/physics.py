"""Per-node physics kernel: EOS, fluxes, turbulence, chemistry.

Vectorized TPU-native re-implementation of ``FlowNode2D::FillNode2D``
(hyper_flow_node.hpp:374-600), ``TurbModRANS2D`` (601-957),
``TurbulenceAxisymmAddOn`` (241-252) and ``CalcChemicalReactions``
(libDEEPS2D/deeps2d_core.cpp:4697-4780).

Every per-node branch of the reference becomes a ``jnp.where`` mask — the
whole kernel is branch-free VPU work.  Per-equation state is manipulated as
Python lists of (X, Y) planes and stacked exactly once per output array:
chained ``.at[eq].set`` updates on (9, X, Y) arrays would each materialize a
full-array copy on TPU, which dominated the step cost before this layout.

Nodes failing the reference's guards (solid, rho==0, k<1) keep their
previous values through the masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config.tables import table_lookup
from . import flags as fl
from .state import (ChemTables, GridMeta, SolverParams, SolverState,
                    node_dx_dy)
from .static_ctx import StaticCtx, build_static_ctx, iscond

TURB_INTENSITY = 0.005   # FlowNodeTurbulence2D::I (hyper_flow_turbulence.hpp:135)


def _safe_div(a, b, fallback=0.0):
    ok = b != 0
    return jnp.where(ok, a / jnp.where(ok, b, 1), fallback)


# ---------------------------------------------------------------------------
# Fold-aware mask combinators.  The interior-specialized kernel branch
# (ops/pallas_step, HF2D_SPEC) passes a StaticCtx whose mask fields are
# plain Python bools; these helpers fold the selects/logic at TRACE time,
# so the specialized tile body never emits the mask ops at all (the other
# branch of a folded select is then removed by jaxpr DCE).  With array
# masks they are exactly jnp.where / & / | / ~, so the XLA paths and the
# general kernel branch are bit-for-bit unchanged.
# ---------------------------------------------------------------------------
def wsel(cond, a, b):
    """jnp.where that folds Python/numpy bool-scalar conditions."""
    if isinstance(cond, (bool, np.bool_)):
        taken, other = (a, b) if cond else (b, a)
        shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))
        dtype = jnp.result_type(a, b)
        return jnp.broadcast_to(jnp.asarray(taken, dtype), shape)
    return jnp.where(cond, a, b)


def band(a, b):
    """a & b with Python-bool folding (False short-circuits to False)."""
    if isinstance(a, (bool, np.bool_)):
        return b if a else False
    if isinstance(b, (bool, np.bool_)):
        return a if b else False
    return a & b


def bor(a, b):
    """a | b with Python-bool folding (True short-circuits to True)."""
    if isinstance(a, (bool, np.bool_)):
        return True if a else b
    if isinstance(b, (bool, np.bool_)):
        return True if b else a
    return a | b


def bnot(a):
    """~a that is safe on Python bools (~False == -1 in Python!)."""
    if isinstance(a, (bool, np.bool_)):
        return not a
    return ~a


def node_masks(meta: GridMeta):
    """Common node classification masks."""
    ct = meta.CT
    solid = iscond(ct, fl.CT_SOLID_2D)
    is_set = iscond(ct, fl.CT_NODE_IS_SET_2D)
    fc = iscond(ct, fl.NT_FC_2D)
    active = is_set & ~solid & ~fc
    return solid, is_set, fc, active


def _planes(arr, n):
    return [arr[e] for e in range(n)]


def fill_node(state: SolverState, meta: GridMeta, params: SolverParams,
              is_mu_t, is_init: bool, j0=0, ctx: StaticCtx = None
              ) -> SolverState:
    """FillNode2D over the whole grid.

    ``is_mu_t`` is a per-node bool mask (the run loop passes 1 for NT_FC
    nodes always and iter>=TurbStartIter for the rest,
    deeps2d_core.cpp:1240-1244,1330-1331); ``is_init`` is a Python bool
    selecting the initialization variant (compiled separately).
    """
    p = params
    if ctx is None:
        ctx = build_static_ctx(meta, p, j0)
    dt = state.S.dtype

    ne = fl.NUM_EQ
    s = _planes(state.S, ne)
    a_l = _planes(state.A, ne)
    b_l = _planes(state.B, ne)
    f_l = _planes(state.F, ne)
    src = _planes(state.Src, ne)
    rho = s[fl.i2d_Rho]
    solid = ctx.solid

    k_cpcv = _safe_div(state.CP, state.CP - state.R, 2.0)
    guard = band(bnot(solid), (rho != 0) & (k_cpcv >= 1))
    rho_s = jnp.where(rho != 0, rho, 1)
    if p.fast_math:
        r_rho = 1.0 / rho_s

        def div_rho(a):
            return a * r_rho
    else:
        def div_rho(a):
            return a / rho_s

    # --- U/V with per-equation Dirichlet enforcement (hpp:413-421) --------
    u_const = ctx.u_const
    v_const = ctx.v_const
    U = wsel(u_const, state.U, div_rho(s[fl.i2d_RhoU]))
    V = wsel(v_const, state.V, div_rho(s[fl.i2d_RhoV]))
    s[fl.i2d_RhoU] = wsel(u_const, U * rho, s[fl.i2d_RhoU])
    s[fl.i2d_RhoV] = wsel(v_const, V * rho, s[fl.i2d_RhoV])

    mu_t = state.mu_t
    lam_t = state.lam_t

    turb_on = ctx.turb_on
    if p.sm == fl.SM_NS:
        if is_init:
            mu_t = wsel(turb_on, 5.0 * state.mu, jnp.zeros_like(mu_t))
            lam_t = wsel(turb_on, lam_t, jnp.zeros_like(lam_t))
        # Turbulence models (TurbModRANS2D) see the Dirichlet-enforced U,V.
        mu_t, lam_t = _turb_mod_rans(
            state, meta, p, s, U, V, a_l, b_l, f_l, src, mu_t, lam_t,
            is_mu_t, is_init, ctx)

    # --- formation enthalpy sum (hpp:438-445) -----------------------------
    Hu = [jnp.asarray(h, dt) for h in p.Hu]
    h_form = jnp.zeros_like(rho)
    rho_air = rho
    for c in range(fl.NUM_COMPONENTS):
        h_form = h_form + Hu[c] * s[4 + c]
        rho_air = rho_air - s[4 + c]
    h_form = h_form + Hu[fl.NUM_COMPONENTS] * rho_air

    # --- wall handling (hpp:447-488) --------------------------------------
    wall_law = ctx.wall_law
    wall_ns = ctx.wall_ns
    zero = jnp.zeros_like(rho)
    src_add = [zero] * ne
    if p.has_walls:
        # WALL_LAW: project momentum onto the wall direction
        w_mag = jnp.sqrt(U * U + V * V + 1.e-30)
        s[fl.i2d_RhoU] = wsel(wall_law, w_mag * meta.BGX,
                              s[fl.i2d_RhoU])
        s[fl.i2d_RhoV] = wsel(wall_law, w_mag * meta.BGY,
                              s[fl.i2d_RhoV])
        U = wsel(wall_law, div_rho(s[fl.i2d_RhoU]), U)
        V = wsel(wall_law, div_rho(s[fl.i2d_RhoV]), V)
        # WALL_NO_SLIP: optional moving-wall sources, gas moves with wall
        U_pre = wsel(wall_ns, div_rho(s[fl.i2d_RhoU]), U)
        V_pre = wsel(wall_ns, div_rho(s[fl.i2d_RhoV]), V)
        if p.isSrcAdd:
            # per-node dx/dy on non-uniform meshes (hyper_flow_node.hpp:
            # 463-464 reads the node's own spacing)
            ndx, ndy = node_dx_dy(meta, p)
            sa_rho = (meta.BGX * (U_pre - meta.Uw) * rho / ndx
                      + meta.BGY * (V_pre - meta.Vw) * rho / ndy)
            src_add[fl.i2d_Rho] = wsel(wall_ns, sa_rho, 0.0)
            src_add[fl.i2d_RhoU] = wsel(
                wall_ns, meta.BGX * (U_pre - meta.Uw) * rho, 0.0)
            src_add[fl.i2d_RhoV] = wsel(
                wall_ns, meta.BGY * (V_pre - meta.Vw) * rho, 0.0)
            for c in range(fl.NUM_COMPONENTS):
                src_add[4 + c] = wsel(wall_ns, sa_rho * state.Yc[c],
                                      0.0)
        U = wsel(wall_ns, meta.Uw, U)
        V = wsel(wall_ns, meta.Vw, V)
        s[fl.i2d_RhoU] = wsel(wall_ns, U * rho, s[fl.i2d_RhoU])
        s[fl.i2d_RhoV] = wsel(wall_ns, V * rho, s[fl.i2d_RhoV])

    # --- EOS (hpp:490-492) -------------------------------------------------
    p_new = (k_cpcv - 1.0) * (s[fl.i2d_RhoE]
                              - rho * (U * U + V * V) * 0.5 - h_form)
    Tg_new = _safe_div(p_new, state.R * rho_s)

    # --- effective transport & viscous/convective fluxes -------------------
    y_r = ctx.y_r                            # node radius (x,y init: 3877)

    if p.sm == fl.SM_NS:
        lam_t = mu_t * state.CP
        sig = ctx.sig
        mu_eff = wsel(is_mu_t,
                      jnp.maximum(0.0, state.mu + mu_t * sig), state.mu)
        lam_eff = wsel(is_mu_t,
                       jnp.maximum(0.0, state.lam + lam_t * sig),
                       state.lam)
        diff = lam_eff / state.CP
        L2 = (2.0 / 3.0) * mu_eff
        if p.ft == fl.FT_AXISYMMETRIC:
            dila = L2 * (state.dUdx + state.dVdy + V / y_r)
        else:
            dila = L2 * (state.dUdx + state.dVdy)

    # convective fluxes (hpp:521-534); eqs 7..8 already hold the
    # (model-masked) turbulence fluxes written by the dispatch above
    an = list(a_l)
    bn = list(b_l)
    fn = list(f_l)
    an[0] = s[fl.i2d_RhoU]
    an[1] = p_new + s[fl.i2d_RhoU] * U
    an[2] = s[fl.i2d_RhoV] * U
    an[3] = (s[fl.i2d_RhoE] + p_new) * U
    bn[0] = s[fl.i2d_RhoV]
    bn[1] = an[2]
    bn[2] = p_new + s[fl.i2d_RhoV] * V
    bn[3] = (s[fl.i2d_RhoE] + p_new) * V
    for c in range(4, 4 + fl.NUM_COMPONENTS):
        an[c] = s[c] * U
        bn[c] = s[c] * V

    if p.ft == fl.FT_AXISYMMETRIC:
        # FT enum value is 1 for axisymmetric, so FT* factors are unity
        fn[0] = bn[0]
        fn[1] = an[2]
        fn[2] = fn[0] * V
        fn[3] = bn[3]
        for c in range(4, 4 + fl.NUM_COMPONENTS):
            fn[c] = bn[c]

    if p.sm == fl.SM_NS:
        sxx = 2.0 * mu_eff * state.dUdx - dila
        syy = 2.0 * mu_eff * state.dVdy - dila
        txy = mu_eff * (state.dUdy + state.dVdx)
        qx = lam_eff * state.dTdx
        qy = lam_eff * state.dTdy
        for c in range(fl.NUM_COMPONENTS + 1):
            qx = qx + diff * (state.CP * Tg_new + Hu[c]) * state.droYdx[c]
            qy = qy + diff * (state.CP * Tg_new + Hu[c]) * state.droYdy[c]
        RX1, RX2, RX3 = sxx, txy, U * sxx + V * txy + qx
        RY1, RY2, RY3 = txy, syy, U * txy + V * syy + qy
        an[1] = an[1] - RX1
        an[2] = an[2] - RX2
        an[3] = an[3] - RX3
        bn[1] = bn[1] - RY1
        bn[2] = bn[2] - RY2
        bn[3] = bn[3] - RY3
        for c in range(4, 4 + fl.NUM_COMPONENTS):
            an[c] = an[c] - diff * state.droYdx[c - 4]
            bn[c] = bn[c] - diff * state.droYdy[c - 4]
        if p.ft == fl.FT_AXISYMMETRIC:
            t00 = 2.0 * mu_eff * V / y_r - dila
            fn[1] = fn[1] - RY1
            fn[2] = fn[2] - (RY2 + t00)
            fn[3] = fn[3] - RY3
            for c in range(4, 4 + fl.NUM_COMPONENTS):
                fn[c] = fn[c] - diff * state.droYdy[c - 4]
        else:
            # flat NS zeroes the whole F vector, all NumEq (hpp:595-598)
            fn = [zero] * ne

    # --- assemble outputs through the guard mask ---------------------------
    def sel(new, old):
        return wsel(guard, new, old)

    A_out = jnp.stack([sel(an[e], state.A[e]) for e in range(ne)])
    B_out = jnp.stack([sel(bn[e], state.B[e]) for e in range(ne)])
    F_out = jnp.stack([sel(fn[e], state.F[e]) for e in range(ne)])
    S_out = jnp.stack([sel(s[e], state.S[e]) for e in range(ne)])
    Src_out = jnp.stack([sel(src[e], state.Src[e]) for e in range(ne)])
    SrcAdd_out = jnp.stack([sel(src_add[e], state.SrcAdd[e])
                            for e in range(ne)])

    return SolverState(**{
        **state.__dict__,
        "S": S_out, "A": A_out, "B": B_out, "F": F_out,
        "Src": Src_out, "SrcAdd": SrcAdd_out,
        "U": sel(U, state.U), "V": sel(V, state.V),
        "p": sel(p_new, state.p), "Tg": sel(Tg_new, state.Tg),
        "mu_t": sel(mu_t, state.mu_t), "lam_t": sel(lam_t, state.lam_t)})


def _turb_mod_rans(state, meta, p, s, U, V, a_l, b_l, f_l, src, mu_t, lam_t,
                   is_mu_t, is_init, ctx: StaticCtx):
    """TurbModRANS2D (hyper_flow_node.hpp:601-957) over the grid.

    Mutates the plane lists (s, a_l, b_l, f_l, src) in place for the
    turbulence equations (model-masked); returns (mu_t, lam_t).
    Model selection per node by TCT bits (the reference's if/else-if chain);
    the extended-model variant ``tem`` is a static parameter.  Model
    families absent from ``p.models`` (no node of the case carries their
    TCT bit — build_case computes this) are skipped statically.
    """
    dt = s[0].dtype
    rho = s[fl.i2d_Rho]
    rho_s = jnp.where(rho != 0, rho, 1)
    tem = p.tem

    l_base = ctx.l_base
    m_prandtl = ctx.m_prandtl
    m_keps = ctx.m_keps
    m_sa = ctx.m_sa
    m_smag = ctx.m_smag

    has_prandtl = "prandtl" in p.models
    has_keps = "keps" in p.models
    has_sa = "sa" in p.models
    has_smag = "smag" in p.models

    if has_prandtl or has_keps or has_sa or has_smag:
        grad_mag = jnp.maximum(jnp.abs(state.dUdy), jnp.abs(state.dVdx))

    # ---------------- Prandtl zero-equation family (612-638) --------------
    if has_prandtl:
        n_0 = ctx.n_0
        if tem == fl.TEM_vanDriest:
            l_p = n_0 * (1.0 - jnp.exp(-state.y_plus / 26.0))
        elif tem == fl.TEM_Escudier and p.delta_bl > 0:
            l_p = jnp.minimum(n_0, 0.09 * p.delta_bl)
        elif tem == fl.TEM_Klebanoff and p.delta_bl > 0:
            l_p = n_0 / jnp.sqrt(1.0 + 5.5 * (meta.l_min / p.delta_bl) ** 6)
        else:
            l_p = n_0
        mu_t = wsel(m_prandtl, rho * l_p * l_p * grad_mag, mu_t)
        lam_t = wsel(m_prandtl, mu_t * state.CP, lam_t)

    # ---------------- k-eps family (640-820) -------------------------------
    if has_keps:
        Sk = s[fl.i2d_k]
        Se = s[fl.i2d_eps]
        tmp1 = state.dUdy + state.dVdx
        tmp2 = rho * l_base
        tmp3 = state.dUdx ** 2 + state.dVdy ** 2
        if p.ft == fl.FT_AXISYMMETRIC:
            tmp3 = tmp3 + U / ctx.y_r
        mu_t_ke = jnp.where(mu_t == 0, rho * l_base * l_base * grad_mag,
                            mu_t)
        G = mu_t_ke * (tmp1 * tmp1 + 2.0 * tmp3)
        Rt = jnp.where((Se != 0) & (state.mu != 0),
                       _safe_div(Sk * Sk,
                                 Se * jnp.where(state.mu != 0, state.mu,
                                                1)),
                       0.0)

        f1 = 1.0
        f2 = 1.0
        f_mu = jnp.ones_like(rho)
        L_k = jnp.zeros_like(rho)
        L_eps = jnp.zeros_like(rho)
        Mt = jnp.zeros_like(rho)
        C1eps, C2eps, C_mu = 1.44, 1.92, 0.09
        sig_k, sig_eps = 1.0, 1.3
        if tem == fl.TEM_k_eps_Chien:
            C1eps, C2eps = 1.35, 1.8
            f2 = 1.0 - 0.4 / 1.8 * jnp.exp(-(Rt * Rt) / 36.0)
            f_mu = 1.0 - jnp.exp(-0.0115 * state.y_plus)
            tmp2_s = jnp.where(tmp2 != 0, tmp2, 1)
            L_k = -2.0 * state.mu * Sk / (tmp2_s * tmp2_s)
            L_eps = (-2.0 * state.mu * Se / (tmp2_s * tmp2_s)
                     * jnp.exp(-state.y_plus / 2.0))
            k_cpcv = _safe_div(state.CP, state.CP - state.R, 2.0)
            Mt = 1.5 * _safe_div(Sk, k_cpcv * state.p)
        elif tem == fl.TEM_k_eps_JL:
            f_mu = jnp.exp(-2.5 / (1.0 + Rt / 50.0))
        elif tem == fl.TEM_k_eps_LSY:
            f_mu = jnp.exp(-3.4 / (1.0 + Rt / 50.0) / (1.0 + Rt / 50.0))
        elif tem == fl.TEM_k_eps_RNG:
            nu_0 = 4.38
            nu_r = jnp.where(Se != 0.0,
                             jnp.sqrt(jnp.maximum(G, 0.0))
                             * _safe_div(Sk, Se), 0.0)
            C_mu = 0.0845
            C1eps = 1.42
            C2eps = (1.68 + C_mu * nu_r ** 3 * (1.0 - nu_r / nu_0)
                     / (1.0 + 0.012 * nu_r ** 3))
            sig_k = sig_eps = 0.7194

        w_mag = jnp.sqrt(U * U + V * V + 1.e-30)
        tmpI = TURB_INTENSITY * w_mag
        k_init = 1.5 * tmpI * tmpI * rho
        l_s = ctx.l_s

        def eps_of_k(sk):
            return (C_mu ** 0.75
                    * jnp.maximum(_safe_div(sk, rho_s), 0.0) ** 1.5 / l_s)

        if is_init:
            Sk = jnp.where(m_keps, k_init, Sk)
            Se = jnp.where(m_keps, eps_of_k(Sk), Se)
            mu_t_new = jnp.abs(C_mu * f_mu * _safe_div(Sk * Sk, Se))
            mu_t_ke = jnp.where(Se != 0, mu_t_new, mu_t_ke)

        kconst = ctx.kconst
        econst = ctx.econst
        Sk = wsel(band(m_keps, kconst), k_init, Sk)
        Se = wsel(band(m_keps, bor(econst, ctx.ewall)), eps_of_k(Sk), Se)

        nu_t = jnp.abs(C_mu * f_mu * _safe_div(Sk * Sk, Se))
        mu_t_ke = wsel(band(is_mu_t, Se != 0),
                       jnp.minimum(nu_t, mu_t_ke), mu_t_ke)

        if not is_init:
            if p.fast_math:
                mt_sk = mu_t_ke * (1.0 / sig_k)
                mt_se = mu_t_ke * (1.0 / sig_eps)
            else:
                mt_sk = mu_t_ke / sig_k
                mt_se = mu_t_ke / sig_eps
            rx_k = (state.mu + mt_sk) * state.dkdx
            rx_e = (state.mu + mt_se) * state.depsdx
            ry_k = (state.mu + mt_sk) * state.dkdy
            ry_e = (state.mu + mt_se) * state.depsdy
            a_l[fl.i2d_k] = wsel(m_keps, Sk * U - rx_k, a_l[fl.i2d_k])
            a_l[fl.i2d_eps] = wsel(m_keps, Se * U - rx_e,
                                   a_l[fl.i2d_eps])
            b_l[fl.i2d_k] = wsel(m_keps, Sk * V - ry_k, b_l[fl.i2d_k])
            b_l[fl.i2d_eps] = wsel(m_keps, Se * V - ry_e,
                                   b_l[fl.i2d_eps])
            src_k = wsel(band(Sk != 0, bnot(kconst)),
                         G - Se * (1.0 + Mt) + L_k * rho,
                         src[fl.i2d_k])
            src_e = wsel(
                band(Sk != 0, bnot(econst)),
                C1eps * f1 * _safe_div(Se, Sk) * G
                - C2eps * f2 * _safe_div(Se * Se, Sk) + L_eps * rho,
                src[fl.i2d_eps])
            src[fl.i2d_k] = wsel(m_keps, src_k, src[fl.i2d_k])
            src[fl.i2d_eps] = wsel(m_keps, src_e, src[fl.i2d_eps])
            # axisymmetric add-on (hpp:241-252)
            if p.ft == fl.FT_AXISYMMETRIC:
                f_k = (state.mu + mu_t_ke) * state.dkdy
                f_e = (state.mu + mu_t_ke / 1.3) * state.depsdy
                f_l[fl.i2d_k] = wsel(m_keps, f_k, f_l[fl.i2d_k])
                f_l[fl.i2d_eps] = wsel(m_keps, f_e, f_l[fl.i2d_eps])
        else:
            f_l[fl.i2d_k] = wsel(m_keps, 0.0, f_l[fl.i2d_k])
            f_l[fl.i2d_eps] = wsel(m_keps, 0.0, f_l[fl.i2d_eps])
            src[fl.i2d_k] = wsel(m_keps, 0.0, src[fl.i2d_k])
            src[fl.i2d_eps] = wsel(m_keps, 0.0, src[fl.i2d_eps])

        s[fl.i2d_k] = wsel(m_keps, Sk, s[fl.i2d_k])
        s[fl.i2d_eps] = wsel(m_keps, Se, s[fl.i2d_eps])
        mu_t = wsel(m_keps, mu_t_ke, mu_t)

    # ---------------- Spalart-Allmaras (822-917) ---------------------------
    if has_sa:
        Snu = s[fl.i2d_nu_t]
        wall = ctx.sa_bc
        fc = ctx.fc
        nu = state.mu / rho_s
        if is_init:
            Snu_new = nu / 100.0
            full = jnp.zeros_like(wall)
        else:
            full = ~wall & ~fc
            Snu_new = jnp.where(wall, 0.0,
                                jnp.where(fc, nu * TURB_INTENSITY, Snu))
        Cb1, Cb2, sig_sa = 0.1355, 0.622, 2.0 / 3.0
        kk = 0.41
        Cw1 = Cb1 / (kk * kk) + (1 + Cb2) / sig_sa
        Cw2, Cw3, Cv1 = 0.3, 2.0, 7.1
        Ct2, Ct4, C5 = 2.0, 0.5, 3.5
        k_cpcv = _safe_div(state.CP, state.CP - state.R, 2.0)
        a_sound2 = k_cpcv * state.R * state.Tg
        ksi = _safe_div(Snu, nu)
        fv1_full = ksi ** 3 / (ksi ** 3 + Cv1 ** 3)
        fv2 = 1.0 - ksi / (1.0 + ksi * fv1_full)
        Wxy = 0.5 * (state.dVdx - state.dUdy)
        Omega = jnp.sqrt(2.0 * Wxy * Wxy)
        l_min_s = ctx.l_min_s
        S_hat = Omega + Snu / (kk * kk * l_min_s * l_min_s) * fv2
        S_hat = jnp.maximum(S_hat, 0.3 * Omega)
        S_hat_s = jnp.where(S_hat != 0, S_hat, 1)
        r_sa = jnp.minimum(Snu / (S_hat_s * kk * kk * l_min_s * l_min_s),
                           10.0)
        g_sa = r_sa + Cw2 * (r_sa ** 6 - r_sa)
        g_s = jnp.where(g_sa != 0, g_sa, 1)
        fw = g_sa * ((1.0 + Cw3 ** 6) / (g_s ** 6 + Cw3 ** 6)) ** (1.0 / 6.0)
        ft2 = Ct2 * jnp.exp(-Ct4 * ksi * ksi)
        nu_hat = _safe_div(mu_t,
                           rho_s * jnp.where(fv1_full != 0, fv1_full, 1))
        div_nu = state.dkdx + state.dkdy
        rx_nu = (nu + Snu) * state.dkdx / sig_sa
        ry_nu = (nu + Snu) * state.dkdy / sig_sa
        src_nu = (Cb1 * (1.0 - ft2) * S_hat * Snu
                  - (Cw1 * fw - Cb1 / (kk * kk) * ft2)
                  * (Snu / l_min_s) ** 2
                  + (Cb2 * div_nu * div_nu) / sig_sa
                  - C5 * nu_hat * nu_hat
                  * _safe_div(state.dUdy * state.dVdx, a_sound2))
        if not is_init:
            a_l[fl.i2d_nu_t] = jnp.where(m_sa & full, Snu * U - rx_nu,
                                         a_l[fl.i2d_nu_t])
            b_l[fl.i2d_nu_t] = jnp.where(m_sa & full, Snu * V - ry_nu,
                                         b_l[fl.i2d_nu_t])
            src[fl.i2d_nu_t] = jnp.where(m_sa & full, src_nu,
                                         src[fl.i2d_nu_t])
            # axisym add-on for SA (hpp:246-247)
            if p.ft == fl.FT_AXISYMMETRIC:
                f_nu = (nu + Snu) * state.dkdy
                f_l[fl.i2d_nu_t] = jnp.where(m_sa, f_nu, f_l[fl.i2d_nu_t])
        else:
            f_l[fl.i2d_nu_t] = jnp.where(m_sa, 0.0, f_l[fl.i2d_nu_t])
            src[fl.i2d_nu_t] = jnp.where(m_sa, 0.0, src[fl.i2d_nu_t])
        s[fl.i2d_nu_t] = jnp.where(m_sa, Snu_new, s[fl.i2d_nu_t])
        fv1_eff = jnp.where(full, fv1_full, 1.0)
        mu_t_sa = jnp.maximum(0.0, rho * s[fl.i2d_nu_t] * fv1_eff)
        mu_t = jnp.where(m_sa & is_mu_t, mu_t_sa, mu_t)
        lam_t = jnp.where(m_sa & is_mu_t, mu_t * state.CP, lam_t)

    # ---------------- Smagorinsky LES (927-956) ----------------------------
    if has_smag:
        Cs = 0.1
        if p.uniform_mesh:
            delta_les = (p.dx * p.dy) ** 0.5
        else:
            # per-node filter width sqrt(dx*dy) (hyper_flow_node.hpp:939)
            ndx, ndy = node_dx_dy(meta, p)
            delta_les = jnp.sqrt(ndx * ndy)
        Wxy_s = 0.5 * (state.dVdx - state.dUdy)
        Omega_s = jnp.sqrt(2.0 * Wxy_s * Wxy_s)
        mu_t_sm = jnp.maximum(0.0, rho * (Cs * delta_les) ** 2 * Omega_s)
        mu_t = jnp.where(m_smag & is_mu_t, mu_t_sm, mu_t)
        lam_t = jnp.where(m_smag & is_mu_t, mu_t * state.CP, lam_t)

    return mu_t, lam_t


def calc_chemical_reactions(state: SolverState, meta: GridMeta,
                            params: SolverParams, chem: ChemTables,
                            active, ctx: StaticCtx = None) -> SolverState:
    """CalcChemicalReactions, Zeldovich infinitely-fast model
    (deeps2d_core.cpp:4697-4780), applied to ``active`` nodes.

    Order of operations preserved exactly (renormalize -> burn -> mixture
    props -> clip -> renormalize -> store), since it shapes species fields
    at the 1e-6 level.
    """
    p = params
    S = state.S
    rho = S[fl.i2d_Rho]
    rho_s = jnp.where(rho != 0, rho, 1)
    Tg = state.Tg

    if p.fast_math:
        r_rho = 1.0 / rho_s
        Yfu = S[fl.i2d_Yfu] * r_rho
        Yox = S[fl.i2d_Yox] * r_rho
        Ycp = S[fl.i2d_Ycp] * r_rho
    else:
        Yfu = S[fl.i2d_Yfu] / rho_s
        Yox = S[fl.i2d_Yox] / rho_s
        Ycp = S[fl.i2d_Ycp] / rho_s
    Yair = 1.0 - (Yfu + Yox + Ycp)

    if ctx is not None:
        react = ctx.react
    else:
        react = active & ~iscond(meta.CT, fl.CT_Y_CONST_2D)

    if p.chemistry == fl.CRM_ZELDOVICH:
        ssum = Yfu + Yox + Ycp + Yair
        Y0 = _safe_div(jnp.ones_like(ssum), ssum, 1.0)
        Yfu_n = Yfu * Y0
        Yox_n = Yox * Y0
        Ycp_n = Ycp * Y0
        burn = band(react, Tg > p.Tf)
        lean = Yox_n > Yfu_n * p.K0         # oxidizer excess
        Yox_b = jnp.where(lean, Yox_n - Yfu_n * p.K0, 0.0)
        Yfu_b = jnp.where(lean, 0.0, Yfu_n - Yox_n / max(p.K0, 1e-30))
        Ycp_b = jnp.where(lean, 1.0 - Yox_b - Yair, 1.0 - Yfu_b - Yair)
        Yfu = jnp.where(burn, Yfu_b, wsel(react, Yfu_n, Yfu))
        Yox = jnp.where(burn, Yox_b, wsel(react, Yox_n, Yox))
        Ycp = jnp.where(burn, Ycp_b, wsel(react, Ycp_n, Ycp))

    # mixture properties at Tg (pre-clip mass fractions); strictly-
    # ascending tables (params.chem_asc, checked host-side by build_case)
    # take table_lookup's exact telescoped fast path
    def tl(prefix):
        def one(sp, w):
            return table_lookup(
                getattr(chem, f"{prefix}_{sp}_x"),
                getattr(chem, f"{prefix}_{sp}_y"), Tg,
                ascending=(f"{prefix}_{sp}" in p.chem_asc)) * w
        return (one("Fuel", Yfu) + one("OX", Yox) + one("cp", Ycp)
                + one("air", Yair))

    R_new = (chem.R_Fuel * Yfu + chem.R_OX * Yox + chem.R_cp * Ycp
             + chem.R_air * Yair)
    CP_new = tl("Cp")
    if p.sm == fl.SM_NS:
        lam_new = tl("lam")
        mu_new = tl("mu")
    else:
        lam_new = state.lam
        mu_new = state.mu

    Yair = jnp.where(Yair < 1.e-5, 0.0, Yair)
    Ycp = jnp.where(Ycp < 1.e-8, 0.0, Ycp)
    Yox = jnp.where(Yox < 1.e-8, 0.0, Yox)
    Yfu = jnp.where(Yfu < 1.e-8, 0.0, Yfu)
    ssum = Yfu + Yox + Ycp + Yair
    Y0 = _safe_div(jnp.ones_like(ssum), ssum, 1.0)
    Yfu = Yfu * Y0
    Yox = Yox * Y0
    Ycp = Ycp * Y0
    Yair = Yair * Y0

    Yc_new = jnp.stack([
        wsel(active, val, state.Yc[c])
        for c, val in zip(range(4), (Yfu, Yox, Ycp, Yair))])

    store = react
    S_new = jnp.stack([
        S[0], S[1], S[2], S[3],
        wsel(store, jnp.abs(Yfu * rho), S[fl.i2d_Yfu]),
        wsel(store, jnp.abs(Yox * rho), S[fl.i2d_Yox]),
        wsel(store, jnp.abs(Ycp * rho), S[fl.i2d_Ycp]),
        S[7], S[8]])

    return SolverState(**{
        **state.__dict__,
        "S": S_new, "Yc": Yc_new,
        "R": wsel(active, R_new, state.R),
        "CP": wsel(active, CP_new, state.CP),
        "lam": wsel(active, lam_new, state.lam),
        "mu": wsel(active, mu_new, state.mu)})


def calc_heat_on_wall_sources(state: SolverState, meta: GridMeta,
                              params: SolverParams,
                              ctx: StaticCtx = None) -> SolverState:
    """CalcHeatOnWallSources (deeps2d_core.cpp:2679-2833): conjugate wall
    heat flux for non-adiabatic walls.

    Every wall (no-slip / wall-law) gas node with a solid neighbor deposits
    a convective flux Q = -lam_eff (T_solid - T_gas)/d on the solid node and
    receives SrcAdd[rhoE] = -dt Q / d.  The C++ visits gas nodes in (i,j)
    scan order and averages when a solid node is hit twice (Q>0 test); the
    fold below reproduces that exact visit order per solid node
    [(I-1,J) right-facing, (I,J-1) up, (I,J+1) down, (I+1,J) left].
    NOTE: the reference's extra neighbor term in lam_eff is dead code (the
    per-node UpNode/DownNode/... pointers are never assigned, so lam_eff is
    the wall node's own lam + lam_t).
    """
    p = params
    ct = meta.CT
    dt_ = state.dt
    if ctx is not None:
        solid = ctx.solid
        wall = band(bnot(solid), ctx.wall)
    else:
        solid = iscond(ct, fl.CT_SOLID_2D)
        wall = (~solid & (iscond(ct, fl.CT_WALL_LAW_2D)
                          | iscond(ct, fl.CT_WALL_NO_SLIP_2D)))
    lam_eff = state.lam + state.lam_t
    Tg = state.Tg

    def sxl(q):
        return jnp.concatenate([q[:1, :], q[:-1, :]], axis=0)

    def sxr(q):
        return jnp.concatenate([q[1:, :], q[-1:, :]], axis=0)

    def syd(q):
        return jnp.concatenate([q[:, :1], q[:, :-1]], axis=1)

    def syu(q):
        return jnp.concatenate([q[:, 1:], q[:, -1:]], axis=1)

    # the 8 visit masks are static (meta-only): with a ctx they are
    # precomputed (static_ctx._heat_visit_masks — also keeps i1 shifts
    # out of the Pallas kernel, which Mosaic cannot lower)
    if ctx is not None:
        pres = (ctx.hv_xl, ctx.hv_yd, ctx.hv_yu, ctx.hv_xr)
    else:
        pres = (solid & sxl(wall), solid & syd(wall),
                solid & syu(wall), solid & sxr(wall))
    visitors = []
    for shift_in, d, present in ((sxl, p.dx, pres[0]),  # gas at I-1
                                 (syd, p.dy, pres[1]),  # gas at J-1
                                 (syu, p.dy, pres[2]),  # gas at J+1
                                 (sxr, p.dx, pres[3])):  # gas at I+1
        c = -shift_in(lam_eff) * (Tg - shift_in(Tg)) / d
        visitors.append((present, c))

    q = jnp.zeros_like(Tg)
    q_after = []
    for present, c in visitors:
        q = wsel(present, jnp.where(q > 0.0, (q + c) * 0.5, c), q)
        q_after.append(q)

    # SrcAdd[rhoE] per gas node: directions processed D, U, L, R — the last
    # solid direction wins; uses the solid's Q right after this gas node's
    # own write (q_after rank of that (solid, visitor) pair).
    src_e = state.SrcAdd[fl.i2d_RhoE]
    if ctx is not None:
        down_solid, up_solid = ctx.hw_down, ctx.hw_up
        left_solid, right_solid = ctx.hw_left, ctx.hw_right
    else:
        down_solid, up_solid = wall & syd(solid), wall & syu(solid)
        left_solid, right_solid = wall & sxl(solid), wall & sxr(solid)
    src_e = wsel(down_solid, -dt_ * syd(q_after[2]) / p.dy, src_e)
    src_e = wsel(up_solid, -dt_ * syu(q_after[1]) / p.dy, src_e)
    src_e = wsel(left_solid, -dt_ * sxl(q_after[3]) / p.dx, src_e)
    src_e = wsel(right_solid, -dt_ * sxr(q_after[0]) / p.dx, src_e)

    ne = fl.NUM_EQ
    src_add = jnp.stack([state.SrcAdd[e] if e != fl.i2d_RhoE else src_e
                         for e in range(ne)])
    return SolverState(**{**state.__dict__, "SrcAdd": src_add,
                          "Q_conv": q})
