"""The fused solver iteration: two-pass blending-factor explicit scheme.

TPU-native re-implementation of the hot loops of ``DEEPS2D_Run``
(libDEEPS2D/deeps2d_core.cpp:853-1334):

* pass 1 — per-equation BC-flag decoding, stencil flux differences and the
  superlocal blending-factor update rule
  ``NextS = beta*S + (1-beta)*avg(S_nbrs) - dt/dx*dA - dt/dy*(dB + F/r)
  + Src*dt + SrcAdd`` (1015-1021);
* pass 2 — residual ``DD``, blending-factor (BFF_*) update (1078-1121), RMS
  accumulation (1122-1153), commit (1156-1164), gradient recomputation
  (1169-1237), ``FillNode2D``, local dt (1317-1327), chemistry (1328).

The C++ sweeps nodes sequentially (Gauss–Seidel-flavoured within a strip);
this implementation is a pure Jacobi update — every read is from the
previous iterate — which converges to the same steady state (SURVEY §7:
bit-exact order replication is impossible; validation is tolerance-based).

All neighbor access uses edge-replicated shifts with the reference's
neighbor-collapse flags (idXl/idXr/idYu/idYd), so the wall-adjacent stencil
asymmetry (869-888) is preserved exactly.  Under `jit` with a sharded mesh,
XLA turns the shifts into ICI halo exchanges automatically.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..config.tables import table_lookup
from . import flags as fl
from .physics import (band, bnot, bor, calc_chemical_reactions,
                      calc_heat_on_wall_sources, fill_node, iscond,
                      node_masks, _safe_div, wsel)
from .state import ChemTables, GridMeta, SolverParams, SolverState
from .static_ctx import StaticCtx, build_static_ctx


# ---------------------------------------------------------------------------
# shifts (edge-replicated; out-of-range values are masked by idX*/idY*)
# ---------------------------------------------------------------------------
def shift_xl(q):
    """Value of the left (i-1) neighbor."""
    return jnp.concatenate([q[..., :1, :], q[..., :-1, :]], axis=-2)


def shift_xr(q):
    """Value of the right (i+1) neighbor."""
    return jnp.concatenate([q[..., 1:, :], q[..., -1:, :]], axis=-2)


def shift_yd(q):
    """Value of the down (j-1) neighbor."""
    return jnp.concatenate([q[..., :, :1], q[..., :, :-1]], axis=-1)


def shift_yu(q):
    """Value of the up (j+1) neighbor."""
    return jnp.concatenate([q[..., :, 1:], q[..., :, -1:]], axis=-1)


def neighbors(q, idXl, idXr, idYu, idYd):
    """Left/Right/Up/Down neighbor values with wall collapse
    (N1 = i - idXl etc., deeps2d_core.cpp:869-888)."""
    L = wsel(idXl, shift_xl(q), q)
    Rn = wsel(idXr, shift_xr(q), q)
    Up = wsel(idYu, shift_yu(q), q)
    Dn = wsel(idYd, shift_yd(q), q)
    return L, Rn, Up, Dn


@dataclass(frozen=True)
class StepAux:
    """Traced per-iteration scalars."""
    beta_scen: object   # beta_Scenario(iter+last_iter)
    cfl_scen: object    # CFL_Scenario(iter+last_iter)
    is_mu_t_iter: object  # bool scalar: iter+last_iter >= TurbStartIter


jax.tree_util.register_dataclass(
    StepAux, data_fields=["beta_scen", "cfl_scen", "is_mu_t_iter"],
    meta_fields=[])


def pass12(state: SolverState, meta: GridMeta, params: SolverParams,
           aux: StepAux, j0=0, return_fields: bool = False,
           ctx: StaticCtx = None):
    """Pass 1 (stencil/flux update) + pass 2 (DD/beta/RMS/commit).

    Returns (S_committed, beta_out, dSdx_new, dSdy_new, diag).  With
    ``return_fields`` the diag contains the unreduced per-node quantities
    (for tiled kernels that must reduce over tile interiors only).
    """
    p = params
    if ctx is None:
        ctx = build_static_ctx(meta, p, j0)
    dt_ = state.dt
    dtype = state.S.dtype
    dtdx = dt_ / p.dx
    dtdy = dt_ / p.dy
    dxx = p.dy / (p.dx + p.dy)   # neighbor-average weights (643-644)
    dyy = p.dx / (p.dx + p.dy)

    active = ctx.active
    dx2m, dy2m = ctx.dx2, ctx.dy2

    idXl, idXr, idYu, idYd = ctx.bXl, ctx.bXr, ctx.bYu, ctx.bYd
    n1, n2, n3, n4 = ctx.n1, ctx.n2, ctx.n3, ctx.n4
    # 1/n_n with n_n in {1, 2}: the reciprocal-multiply is exact
    rn_n, rm_m = ctx.rn_n, ctx.rm_m

    evolve = ctx.evolve                            # (9, X, Y)

    # ---------------- PASS 1 (853-1026) -----------------------------------
    S = state.S
    S_L, S_R, S_U, S_D = neighbors(S, idXl, idXr, idYu, idYd)
    A_L, A_R, _, _ = neighbors(state.A, idXl, idXr, idYu, idYd)
    _, _, B_U, B_D = neighbors(state.B, idXl, idXr, idYu, idYd)

    # dxn/dyn masks are "Neumann flag present": flag absent -> flux
    # difference, flag present -> neighbor average + zero gradient
    # (deeps2d_core.cpp:940-1007).
    dSdx_new = wsel(ctx.ev_flux_x, (A_R - A_L) * rn_n,
                    wsel(evolve, 0.0, state.dSdx))
    dSdy_new = wsel(ctx.ev_flux_y, (B_U - B_D) * rm_m,
                    wsel(evolve, 0.0, state.dSdy))

    # Neumann averaging mutates S before the blend (996-1006); x first, y
    # overrides if both flags are set.
    S_eff = wsel(ctx.ev_avg_x, (S_L * n2 + S_R * n1) * rn_n, S)
    S_eff = wsel(ctx.ev_avg_y, (S_U * n3 + S_D * n4) * rm_m, S_eff)

    # 2nd-order soft-BC averaging, statically skipped when no node of the
    # case carries a d2*-NULL flag (params.has_d2x/y from build_case)
    if p.has_d2x:
        dSdx_L, dSdx_R, _, _ = neighbors(dSdx_new, idXl, idXr, idYu, idYd)
        dXX = wsel(dx2m, (dSdx_L + dSdx_R) * 0.5, dSdx_new)
    else:
        dXX = dSdx_new
    if p.has_d2y:
        _, _, dSdy_U, dSdy_D = neighbors(dSdy_new, idXl, idXr, idYu, idYd)
        dYY = wsel(dy2m, (dSdy_U + dSdy_D) * 0.5, dSdy_new)
    else:
        dYY = dSdy_new

    beta = state.beta
    blend = (dxx * (S_L + S_R) + dyy * (S_U + S_D)) * 0.5
    if p.ft == fl.FT_AXISYMMETRIC:
        y_term = dYY + state.F / ctx.jp1[None]
    else:
        y_term = dYY
    next_s = (S_eff * beta + (1.0 - beta) * blend
              - (dtdx * dXX + dtdy * y_term)
              + state.Src * dt_ + state.SrcAdd)
    next_s = wsel(evolve, next_s, S_eff)

    # ---------------- PASS 2: DD / beta / RMS / commit (1062-1164) ---------
    tmp = S_eff
    abs_dd = next_s - tmp
    big = jnp.abs(tmp) > 1.e-15
    # |tmp| > 1e-15 implies tmp != 0, so the safe denominator reuses `big`
    dd_local = jnp.where(big, jnp.abs(abs_dd / jnp.where(big, tmp, 1.0)),
                         1.0)
    if p.bff in (fl.BFF_SQR, fl.BFF_SQRR):
        sqrt_res = jnp.where(big, jnp.sqrt(dd_local), 0.0)

    beta_min = jnp.minimum(jnp.asarray(p.beta0, dtype), aux.beta_scen)
    if p.has_nrbc:
        # per-node override on CT_NONREFLECTED nodes; statically skipped
        # (beta_min stays a scalar) when the case marked none
        beta_min = jnp.asarray(
            wsel(ctx.nrbc, jnp.asarray(p.nrbc_beta0, dtype),
                 beta_min))[None]
    if p.bff == fl.BFF_L:
        new_beta = jnp.minimum(beta_min,
                               beta_min ** 2 / (beta_min + dd_local))
    elif p.bff == fl.BFF_LR:
        new_beta = jnp.minimum((beta_min + beta) * 0.5,
                               beta_min ** 2 / (beta_min + dd_local))
    elif p.bff == fl.BFF_S:
        new_beta = jnp.minimum(beta_min,
                               beta_min ** 2 / (beta_min + dd_local ** 2))
    elif p.bff == fl.BFF_SR:
        new_beta = jnp.minimum((beta_min + beta) * 0.5,
                               beta_min ** 2 / (beta_min + dd_local ** 2))
    elif p.bff == fl.BFF_SQR:
        new_beta = jnp.minimum(beta_min,
                               beta_min ** 2 / (beta_min + sqrt_res))
    elif p.bff == fl.BFF_SQRR:
        new_beta = jnp.minimum((beta_min + beta) * 0.5,
                               beta_min ** 2 / (beta_min + sqrt_res))
    else:
        new_beta = beta

    dd_gate = band(ctx.ddmask, tmp != 0.0)
    beta_out = wsel(dd_gate, new_beta, beta)

    if return_fields:
        # next_s already carries the evolve selection (pass 1 tail)
        S_committed = next_s
        fields = {"abs_dd": abs_dd, "tmp": tmp, "dd_local": dd_local,
                  "gate": dd_gate, "dt_used": dt_}
        return S_committed, beta_out, dSdx_new, dSdy_new, fields

    if p.isAlternateRMS:
        # serial build accumulates the SIGNED residual (deeps2d_core.cpp:
        # 1139-1141) and returns 0 when the sum is not positive (1541-1549);
        # the MPI build accumulates absDD^2 (1128-1130)
        acc = abs_dd if p.serial_rms_mode else abs_dd * abs_dd
        rms = jnp.sum(jnp.where(dd_gate, acc, 0.0), axis=(-2, -1))
        sum_div = jnp.sum(jnp.where(dd_gate, tmp * tmp, 0.0), axis=(-2, -1))
        fallback = 0.0 if p.serial_rms_mode else rms
        rms_out = jnp.where((rms > 0) & (sum_div > 0),
                            jnp.sqrt(_safe_div(rms, sum_div)), fallback)
    else:
        rms = jnp.sum(jnp.where(dd_gate, dd_local * dd_local, 0.0),
                      axis=(-2, -1))
        irms = jnp.sum(dd_gate, axis=(-2, -1)).astype(dtype)
        rms_out = jnp.where(irms > 0, jnp.sqrt(_safe_div(rms, irms)), rms)
    dd_max = jnp.max(jnp.where(dd_gate, dd_local, 0.0), axis=(-2, -1))

    # next_s already carries the evolve selection (pass 1 tail)
    S_committed = next_s

    diag = {"RMS": rms_out, "DD_max": dd_max, "dt_used": dt_}
    return S_committed, beta_out, dSdx_new, dSdy_new, diag


def gfc(state: SolverState, meta: GridMeta, params: SolverParams,
        chem: ChemTables, aux: StepAux, j0=0, return_fields: bool = False,
        ctx: StaticCtx = None):
    """Gradients + FillNode2D + local dt + chemistry + wall heat flux
    (the tail of pass 2, deeps2d_core.cpp:1169-1334 + 1402-1409).

    ``state`` holds the committed S / updated beta; primitives (U, V, Tg, p)
    and transport properties are the previous iteration's fill outputs.
    Returns (out_state, dt_new, unstable); ``out_state.dt`` is left at the
    incoming value (callers decide the dt hand-off).
    """
    p = params
    if ctx is None:
        ctx = build_static_ctx(meta, p, j0)
    dtype = state.S.dtype
    active = ctx.active
    idXl, idXr, idYu, idYd = ctx.bXl, ctx.bXr, ctx.bYu, ctx.bYd
    n1, n2, n3, n4 = ctx.n1, ctx.n2, ctx.n3, ctx.n4
    S_committed = state.S

    # ---------------- gradients (1169-1237) --------------------------------
    st = state
    if p.sm == fl.SM_NS:
        dx1nn = ctx.dx1nn
        dy1mm = ctx.dy1mm
        Sc_L, Sc_R, Sc_U, Sc_D = neighbors(S_committed, idXl, idXr, idYu,
                                           idYd)
        rho_c = S_committed[fl.i2d_Rho]
        rho_cs = jnp.where(rho_c != 0, rho_c, 1)
        if p.fast_math:
            r_rho_c = 1.0 / rho_cs

            def div_rho_c(a):
                return a * r_rho_c
        else:
            def div_rho_c(a):
                return a / rho_cs

        dydx_ok = ctx.dydx_ok
        dydy_ok = ctx.dydy_ok
        droYdx_l = []
        droYdy_l = []
        air_R = Sc_R[fl.i2d_Rho]
        air_L = Sc_L[fl.i2d_Rho]
        air_U = Sc_U[fl.i2d_Rho]
        air_D = Sc_D[fl.i2d_Rho]
        for k in range(4, 7):
            gx = (Sc_R[k] - Sc_L[k]) * dx1nn
            gy = (Sc_U[k] - Sc_D[k]) * dy1mm
            droYdx_l.append(
                wsel(ctx.g_dydx, gx, st.droYdx[k - 4]))
            droYdy_l.append(
                wsel(ctx.g_dydy, gy, st.droYdy[k - 4]))
            air_R = air_R - wsel(dydx_ok, Sc_R[k], 0.0)
            air_L = air_L - wsel(dydx_ok, Sc_L[k], 0.0)
            air_U = air_U - wsel(dydy_ok, Sc_U[k], 0.0)
            air_D = air_D - wsel(dydy_ok, Sc_D[k], 0.0)
        droYdx_l.append(
            wsel(ctx.g_dydx, (air_R - air_L) * dx1nn,
                 wsel(active, 0.0, st.droYdx[fl.NUM_COMPONENTS])))
        droYdy_l.append(
            wsel(ctx.g_dydy, (air_U - air_D) * dy1mm,
                 wsel(active, 0.0, st.droYdy[fl.NUM_COMPONENTS])))
        droYdx = jnp.stack(droYdx_l)
        droYdy = jnp.stack(droYdy_l)

        wall = ctx.wall
        U_L, U_R, U_U, U_D = neighbors(st.U, idXl, idXr, idYu, idYd)
        V_L, V_R, V_U, V_D = neighbors(st.V, idXl, idXr, idYu, idYd)

        if p.has_walls:
            def grad_x(qr, ql):
                # wall nodes use the asymmetric n1*right - n2*left weights
                return wsel(wall, (qr * n1 - ql * n2) * dx1nn,
                            (qr - ql) * dx1nn)

            def grad_y(qu, qd):
                return wsel(wall, (qu * n3 - qd * n4) * dy1mm,
                            (qu - qd) * dy1mm)
        else:
            def grad_x(qr, ql):
                return (qr - ql) * dx1nn

            def grad_y(qu, qd):
                return (qu - qd) * dy1mm

        dUdx = wsel(active, grad_x(U_R, U_L), st.dUdx)
        dVdx = wsel(active, grad_x(V_R, V_L), st.dVdx)
        dUdy = wsel(active, grad_y(U_U, U_D), st.dUdy)
        dVdy = wsel(active, grad_y(V_U, V_D), st.dVdy)

        km = ctx.km
        has_turb2 = ("keps" in p.models) or ("sa" in p.models)
        if has_turb2:
            dkdx = wsel(km, div_rho_c(grad_x(Sc_R[fl.i2d_k],
                                             Sc_L[fl.i2d_k])),
                        st.dkdx)
            dkdy = wsel(km, div_rho_c(grad_y(Sc_U[fl.i2d_k],
                                             Sc_D[fl.i2d_k])),
                        st.dkdy)
        else:
            dkdx, dkdy = st.dkdx, st.dkdy
        em = ctx.em
        if "keps" in p.models:
            depsdx = wsel(em, div_rho_c(grad_x(Sc_R[fl.i2d_eps],
                                               Sc_L[fl.i2d_eps])),
                          st.depsdx)
            depsdy = wsel(em, div_rho_c(grad_y(Sc_U[fl.i2d_eps],
                                               Sc_D[fl.i2d_eps])),
                          st.depsdy)
        else:
            depsdx, depsdy = st.depsdx, st.depsdy

        Tg_L, Tg_R, Tg_U, Tg_D = neighbors(st.Tg, idXl, idXr, idYu, idYd)
        dTdx = wsel(active, (Tg_R - Tg_L) * dx1nn, st.dTdx)
        dTdy = wsel(active, (Tg_U - Tg_D) * dy1mm, st.dTdy)
    else:
        droYdx, droYdy = st.droYdx, st.droYdy
        dUdx, dUdy, dVdx, dVdy = st.dUdx, st.dUdy, st.dVdx, st.dVdy
        dTdx, dTdy = st.dTdx, st.dTdy
        dkdx, dkdy, depsdx, depsdy = st.dkdx, st.dkdy, st.depsdx, st.depsdy

    mid = SolverState(**{**st.__dict__,
        "droYdx": droYdx, "droYdy": droYdy,
        "dUdx": dUdx, "dUdy": dUdy, "dVdx": dVdx, "dVdy": dVdy,
        "dTdx": dTdx, "dTdy": dTdy,
        "dkdx": dkdx, "dkdy": dkdy, "depsdx": depsdx, "depsdy": depsdy})

    # ---------------- FillNode2D (1240-1244, 1330-1331) --------------------
    # active nodes: is_mu_t iff iter+last_iter >= TurbStartIter;
    # NT_FC nodes: always refreshed with is_mu_t=1.
    # logical-or form of where(fc, True, iter-flag): Mosaic cannot lower the
    # i8->i1 select this produced
    is_mu_t = bor(ctx.fc, jnp.asarray(aux.is_mu_t_iter, bool))
    filled = fill_node(mid, meta, p, is_mu_t, is_init=False, j0=j0, ctx=ctx)

    unstable_field = band(active, filled.Tg < 0.0)
    unstable = unstable_field if return_fields else jnp.any(unstable_field)

    # ---------------- local dt (1317-1327) ---------------------------------
    cfl_min = jnp.minimum(jnp.asarray(p.CFL, dtype), aux.cfl_scen)
    k_new = _safe_div(filled.CP, filled.CP - filled.R, 2.0)
    aaa = jnp.sqrt(jnp.maximum(k_new * filled.R * filled.Tg, 0.0))
    dt_nodes = cfl_min * jnp.minimum(p.dx / (aaa + jnp.abs(filled.U)),
                                     p.dy / (aaa + jnp.abs(filled.V)))
    dt_field = wsel(active, dt_nodes, 1.0)
    dt_new = jnp.minimum(1.0, jnp.min(dt_field))
    if p.serial_dt_mode:
        dt_new = jnp.minimum(dt_new, state.dt)

    # ---------------- chemistry (1328) -------------------------------------
    out = calc_chemical_reactions(filled, meta, p, chem, active, ctx=ctx)

    # ---------------- conjugate wall heat flux (1402-1409) ------------------
    if not p.isAdiabaticWall and p.has_walls:
        out = calc_heat_on_wall_sources(out, meta, p, ctx=ctx)

    if return_fields:
        # per-node dt field (pre-chemistry properties, exactly as reduced
        # above) for callers that must reduce over tile/shard interiors
        return out, dt_field.astype(dtype), unstable
    return out, dt_new.astype(dtype), unstable


def solver_step(state: SolverState, meta: GridMeta, params: SolverParams,
                chem: ChemTables, aux: StepAux, ctx: StaticCtx = None):
    """One full inner iteration (reference order: pass1 -> pass2 -> gradients
    -> fill -> dt -> chemistry -> heat).  Returns (new_state, diag)."""
    if ctx is None:
        ctx = build_static_ctx(meta, params)
    S_c, beta_c, dSdx_n, dSdy_n, diag = pass12(state, meta, params, aux,
                                               ctx=ctx)
    mid = SolverState(**{**state.__dict__, "S": S_c, "beta": beta_c,
                         "dSdx": dSdx_n, "dSdy": dSdy_n})
    out, dt_new, unstable = gfc(mid, meta, params, chem, aux, ctx=ctx)
    out = SolverState(**{**out.__dict__, "dt": dt_new})
    diag = {**diag, "dt_next": dt_new, "unstable": unstable}
    return out, diag


# ---------------------------------------------------------------------------
# Fast scan path: slim carry
# ---------------------------------------------------------------------------
@dataclass
class SlimState:
    """Minimal inner-loop carry (31 planes vs ~111 for SolverState).

    Everything else (fluxes A/B/F, dSdx/dSdy, gradients, SrcAdd, Q_conv) is
    a pure function of these fields within one rotated iteration and is
    recomputed in-loop — the main HBM-traffic reduction vs carrying the full
    node state, mirroring how the reference's per-node kernel recomputes
    fluxes rather than persisting them.

    Round-4 diet: ``lam_t`` left the carry (FillNode2D unconditionally
    recomputes it as mu_t*CP under SM_NS, hyper_flow_node.hpp:494; under
    other solver modes it never changes in-loop, so it enters as a
    chunk-constant) and ``y_plus`` left it too (only the per-outer-cycle
    recalc writes it, deeps2d_core.cpp:2364-2388 — constant within a
    chunk, staged read-only).
    """

    S: jnp.ndarray
    beta: jnp.ndarray
    U: jnp.ndarray
    V: jnp.ndarray
    p: jnp.ndarray
    Tg: jnp.ndarray
    Yc: jnp.ndarray
    R: jnp.ndarray
    CP: jnp.ndarray
    lam: jnp.ndarray
    mu: jnp.ndarray
    mu_t: jnp.ndarray
    dt: jnp.ndarray


jax.tree_util.register_dataclass(
    SlimState, data_fields=[f for f in SlimState.__annotations__],
    meta_fields=[])

_SLIM_FIELDS = list(SlimState.__annotations__)


def shrink(state: SolverState) -> SlimState:
    return SlimState(**{f: getattr(state, f) for f in _SLIM_FIELDS})


def expand(slim: SlimState, params: SolverParams, src_ext,
           y_plus=None, lam_t=None) -> SolverState:
    """SlimState -> SolverState with recomputable fields zeroed.

    The zero defaults are exact: dSdx/dSdy/gradients of never-updated nodes
    are 0 by construction, SrcAdd/Q_conv are rebuilt every iteration, and
    A/B/F are produced by the in-loop fill before any consumer reads them.

    ``y_plus``: chunk-constant plane (zeros when the case's turbulence
    closure never reads it — TEM_vanDriest / TEM_k_eps_Chien only; chunk
    callers restore the true plane on output).  ``lam_t``: None under
    SM_NS reconstructs mu_t*CP — the invariant FillNode2D re-establishes
    every iteration (hyper_flow_node.hpp:494), so the value only matters
    through fill's guard fallback on rho==0 / CP<R degenerate nodes;
    non-NS callers pass the true chunk-constant plane through.
    """
    ne = fl.NUM_EQ
    X, Y = slim.S.shape[-2:]
    dt = slim.S.dtype
    z9 = jnp.zeros((ne, X, Y), dt)
    z4 = jnp.zeros((4, X, Y), dt)
    z1 = jnp.zeros((X, Y), dt)
    if lam_t is None:
        lam_t = slim.mu_t * slim.CP
    if y_plus is None:
        y_plus = z1
    kw = {f: getattr(slim, f) for f in _SLIM_FIELDS}
    return SolverState(
        A=z9, B=z9, F=z9, dSdx=z9, dSdy=z9,
        Src=src_ext, SrcAdd=z9,
        droYdx=z4, droYdy=z4,
        dUdx=z1, dUdy=z1, dVdx=z1, dVdy=z1, dTdx=z1, dTdy=z1,
        dkdx=z1, dkdy=z1, depsdx=z1, depsdy=z1, Q_conv=z1,
        lam_t=lam_t, y_plus=y_plus, **kw)


def needs_y_plus(params) -> bool:
    """True iff this case's turbulence closure reads y+ in the inner loop
    (van Driest damping, hyper_flow_node.hpp:616-618, or Chien's f_mu /
    L_eps, 700-714).  All other closures never touch it, so the fast
    paths skip staging the plane entirely."""
    return (("prandtl" in params.models
             and params.tem == fl.TEM_vanDriest)
            or ("keps" in params.models
                and params.tem == fl.TEM_k_eps_Chien))


def make_aux(beta_tab, cfl_tab, turb_start, it, dtype):
    itf = it.astype(dtype)
    return StepAux(
        beta_scen=table_lookup(beta_tab[0], beta_tab[1], itf),
        cfl_scen=table_lookup(cfl_tab[0], cfl_tab[1], itf),
        is_mu_t_iter=(it >= turb_start))


def make_fast_chunk(meta: GridMeta, params: SolverParams, chem: ChemTables,
                    beta_tab, cfl_tab, turb_start, probe_idx=(),
                    meta_as_arg: bool = False):
    """Build chunk(state, n_iters, start_iter, src_ext) -> (state', diags)
    running ``n_iters`` iterations with the slim carry.

    ``src_ext`` (the SetSources2D volumetric source field) is a traced
    runtime argument so source-bearing decks can update it every outer
    cycle without recompiling (deeps2d_core.cpp:1716-1722 re-applies the
    source list each cycle).

    ``probe_idx``: static tuple of (i, j) monitor-point node indices;
    when non-empty the diags carry per-iteration p/T probes
    (diag["probes"], (n_iters, n_points, 2)) so monitor rows can be
    written at NOutStep granularity exactly like the reference
    (deeps2d_core.cpp:1465-1486, 2560-2569).

    ``meta_as_arg``: the chunk takes the GridMeta as a 5th runtime
    argument (and rebuilds the static ctx from it, once per call) instead
    of closing over it — required under a multi-process mesh, where
    closing over process-spanning arrays is not allowed.

    Identical operation sequence to ``solver_step`` repeated n times; the
    loop boundary is rotated so only SlimState crosses scan iterations:

        prologue: pass12 @ iter 0
        scan_k:   [gradients+fill+dt+chem+heat] @ iter k,
                  pass12 @ iter k+1        (k = 0 .. n-2)
        epilogue: [gradients+fill+dt+chem+heat] @ iter n-1
    """
    dtype = params.jdtype
    ctx0 = None if meta_as_arg else build_static_ctx(meta, params)

    def probes_of(st):
        return jnp.stack([jnp.stack([st.p[i, j], st.Tg[i, j]])
                          for (i, j) in probe_idx])

    def aux_at(it):
        return make_aux(beta_tab, cfl_tab, turb_start, it, dtype)

    def chunk(state: SolverState, n_iters: int, start_iter, src_ext,
              meta_arg: GridMeta = None):
        if meta_as_arg:
            mt = meta_arg
            ctx = build_static_ctx(mt, params)
        else:
            mt = meta
            ctx = ctx0
        if not params.has_ext_src:
            # no SetSources2D objects in this case: a literal zero source
            # lets XLA fold the Src*dt term of pass 1 away entirely
            src_ext = jnp.zeros((fl.NUM_EQ, params.MaxX, params.MaxY),
                                dtype)
        # chunk-constant planes outside the scan carry (see SlimState)
        yp_const = state.y_plus if needs_y_plus(params) else None
        lam_const = None if params.sm == fl.SM_NS else state.lam_t

        def rotated(slim, k):
            full = expand(slim, params, src_ext, yp_const, lam_const)
            out, dt_new, unstable = gfc(full, mt, params, chem, aux_at(k),
                                        ctx=ctx)
            out = SolverState(**{**out.__dict__, "dt": dt_new})
            S_c, beta_c, _, _, diag = pass12(out, mt, params,
                                             aux_at(k + 1), ctx=ctx)
            slim2 = shrink(SolverState(**{**out.__dict__, "S": S_c,
                                          "beta": beta_c}))
            diag = {**diag, "unstable": unstable}
            if probe_idx:
                # post-fill primitives of iteration k (reference probes
                # node values after the iteration, 1465-1486)
                diag["probes"] = probes_of(out)
            return slim2, diag

        # prologue: iteration start_iter's pass12 (fluxes already in state)
        aux0 = aux_at(start_iter)
        S_c, beta_c, _, _, diag0 = pass12(state, mt, params, aux0,
                                          ctx=ctx)
        slim = shrink(SolverState(**{**state.__dict__, "S": S_c,
                                     "beta": beta_c}))
        if n_iters > 1:
            ks = start_iter + jnp.arange(n_iters - 1)
            slim, diags = jax.lax.scan(rotated, slim, ks)
        else:
            diags = None
        # epilogue: final iteration's gradients/fill/chem; the true
        # y_plus plane (untouched by the inner loop) is restored on the
        # output so swap/output files stay byte-faithful even for
        # closures that never read it
        full = expand(slim, params, src_ext, yp_const, lam_const)
        out, dt_new, unstable_last = gfc(full, mt, params, chem,
                                         aux_at(start_iter + n_iters - 1),
                                         ctx=ctx)
        out = SolverState(**{**out.__dict__, "dt": dt_new,
                             "y_plus": state.y_plus})

        def lead(a, b):
            return jnp.concatenate([a[None], b], 0) if b is not None \
                else a[None]

        def trail(b, a):
            return jnp.concatenate([b, a[None]], 0) if b is not None \
                else a[None]

        all_diag = {
            # pass12 diags: iterations start .. start+n-1 (prologue first)
            "RMS": lead(diag0["RMS"], diags["RMS"] if diags else None),
            "dt_used": lead(diag0["dt_used"],
                            diags["dt_used"] if diags else None),
            "DD_max": lead(diag0["DD_max"],
                           diags["DD_max"] if diags else None),
            # fill-stage diags: iterations start .. start+n-1 (epilogue last)
            "unstable": trail(diags["unstable"] if diags else None,
                              unstable_last),
        }
        if probe_idx:
            all_diag["probes"] = trail(
                diags["probes"] if diags else None, probes_of(out))
        return out, all_diag

    return chunk
