"""Packed StaticCtx transport: round-trip, bit-layout pin, kernel toggle.

The fused Pallas kernel streams the bool StaticCtx planes as bit-packed
uint32 words (static_ctx.build_packed_ctx) and unpacks them in-kernel
(unpack_static_ctx) instead of re-running the full flag decode per
invocation.  The positional bit layout is an internal wire format: these
tests pin it so a field-list edit cannot silently shift bits, and assert
the round trip is bitwise identical to the direct decode on decks
covering every mask family (k-eps, SA, Prandtl, Smagorinsky, walls,
solids, NRBC, d2-BC, axisym).
"""

import numpy as np
import pytest

from openhyperflow2d_tpu.core.static_ctx import (
    _CTX_BOOL_PLANES, _CTX_BOOL_STACKS, N_CTX_BITS, N_CTX_WORDS, StaticCtx,
    build_packed_ctx, build_static_ctx, unpack_static_ctx)
from openhyperflow2d_tpu.core.state import meta_from_grid
from openhyperflow2d_tpu.examples import channel_deck, reacting_rans_deck
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def _nrbc_d2_axisym_deck():
    """Axisymmetric k-eps channel with a FARFIELD (NRBC) top bound and
    d2-NULL soft BCs on the outflow — lights up nrbc + dx2/dy2 + axisym
    y_r/jp1 alongside the k-eps family."""
    d = channel_deck(nx=48, ny=40, problem_type=1, turb_model=4,
                     turb_ext_model=0, flow_type=1)
    d.data["Contour1.Bound1.Cond"] = "NT_FARFIELD_2D"
    d.data["Contour1.Bound2.Cond"] = ("NT_D2X_2D, TCT_dkdx_NULL_2D, "
                                      "TCT_depsdx_NULL_2D")
    d.data["Contour1.Bound3.Cond"] = ("NT_D0Y_2D, NT_D2Y_2D, "
                                      "TCT_k_CONST_2D, TCT_eps_CONST_2D")
    return d


DECKS = {
    "keps-walls-step-heat": lambda: reacting_rans_deck(
        48, 40, wall_bottom=True, adiabatic=False, with_step=True),
    "sa-wall": lambda: channel_deck(nx=48, ny=40, problem_type=1,
                                    turb_model=3, turb_ext_model=0,
                                    wall_bottom=True),
    "prandtl-wall-law": lambda: _prandtl_wall_law_deck(),
    "smag": lambda: channel_deck(nx=48, ny=40, problem_type=1,
                                 turb_model=5, turb_ext_model=5,
                                 wall_bottom=True),
    "nrbc-d2-axisym": _nrbc_d2_axisym_deck,
    # floating solid rect mid-stream: walls on all four faces, so every
    # conjugate-heat visit-mask orientation (hv_*/hw_*) lights up
    "rect-allsides": lambda: _floating_rect_deck(),
}


def _floating_rect_deck():
    d = channel_deck(nx=48, ny=40, problem_type=1, turb_model=0,
                     with_rect=True)
    d.data["Rect1.Ystart"] = str(40 * 0.01 * 0.3)
    d.data["isAdiabaticWall"] = "0"
    return d


def _prandtl_wall_law_deck():
    d = channel_deck(nx=48, ny=40, problem_type=1, turb_model=2,
                     turb_ext_model=1)
    d.data["Contour1.Bound3.Cond"] = "NT_WALL_LAW_2D"
    return d


@pytest.mark.parametrize("name", sorted(DECKS))
@pytest.mark.parametrize("j0", [0, 7])
def test_packed_ctx_roundtrip_bitwise(name, j0):
    """unpack(build_packed(meta, p), meta, p, j0) must equal
    build_static_ctx(meta, p, j0) field-by-field — values AND dtypes."""
    case = build_case(DECKS[name]())
    meta, p = meta_from_grid(case.grid), case.params
    ref = build_static_ctx(meta, p, j0)
    packed = build_packed_ctx(meta, p)
    assert packed.shape == (N_CTX_WORDS,) + meta.CT.shape
    got = unpack_static_ctx(packed, meta, p, j0)
    for f in StaticCtx.__annotations__:
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        assert a.dtype == b.dtype, f
        np.testing.assert_array_equal(b, a, err_msg=f"{name}:{f}")


def test_packed_ctx_covers_every_mask_family():
    """The deck set above must actually light up every bool field the
    packed form carries (a field that is all-False everywhere would make
    the round-trip test vacuous for its bit)."""
    lit = set()
    for mk in DECKS.values():
        case = build_case(mk())
        ctx = build_static_ctx(meta_from_grid(case.grid), case.params)
        for f in _CTX_BOOL_STACKS + _CTX_BOOL_PLANES:
            if bool(np.asarray(getattr(ctx, f)).any()):
                lit.add(f)
    dark = set(_CTX_BOOL_STACKS + _CTX_BOOL_PLANES) - lit
    assert not dark, f"mask families never exercised: {sorted(dark)}"


def test_ctx_bit_layout_pinned():
    """Wire-format pin: editing the field lists (order, membership) is a
    layout change and must be made deliberately, together with this test
    and any serialized packed-ctx consumers."""
    assert _CTX_BOOL_STACKS == [
        "evolve", "dxn", "dyn", "dx2", "dy2", "ddmask",
        "ev_flux_x", "ev_avg_x", "ev_flux_y", "ev_avg_y",
    ]
    assert _CTX_BOOL_PLANES == [
        "solid", "fc", "active", "nrbc", "bXl", "bXr", "bYu", "bYd",
        "u_const", "v_const", "wall_law", "wall_ns", "wall", "turb_on",
        "m_prandtl", "m_keps", "m_sa", "m_smag", "kconst", "econst",
        "ewall", "sa_bc", "dydx_ok", "dydy_ok", "g_dydx", "g_dydy",
        "km", "em", "react",
        "hv_xl", "hv_yd", "hv_yu", "hv_xr",
        "hw_down", "hw_up", "hw_left", "hw_right",
    ]
    assert N_CTX_BITS == 9 * 10 + 37 == 127
    assert N_CTX_WORDS == 4


def test_packed_ctx_rejects_nonuniform_mesh():
    """The packed form hardcodes the uniform-mesh mixing-length floor
    (min(dx, dy)); non-uniform meshes must be rejected explicitly, not
    silently mis-floored."""
    nx = ny = 24
    dxm = np.full((nx, ny), 0.01)
    dxm[nx // 2:] = 0.02
    case = build_case(channel_deck(nx=nx, ny=ny), dx_map=dxm)
    meta, p = meta_from_grid(case.grid), case.params
    assert not p.uniform_mesh
    with pytest.raises((NotImplementedError, ValueError)):
        build_packed_ctx(meta, p)


def _pallas_persistent_solver(deck, fuse=2):
    return Solver(build_case(deck), use_pallas=True, pallas_tile=(16, 16),
                  pallas_fuse=fuse)


@pytest.mark.parametrize("name", ["keps-walls-step-heat", "nrbc-d2-axisym"])
def test_ctxstream_toggle_bitwise(name, monkeypatch):
    """HF2D_CTXSTREAM=0 (in-kernel decode) vs =1 (streamed packed ctx)
    must be bitwise identical through the persistent fused kernel — on
    the walls+solid+heat deck and the nrbc+d2+axisym deck."""
    states = {}
    diags = {}
    for v in ("0", "1"):
        monkeypatch.setenv("HF2D_CTXSTREAM", v)
        monkeypatch.setenv("HF2D_PERSIST", "1")
        s = _pallas_persistent_solver(DECKS[name]())
        diags[v] = s.run_iters(5)
        states[v] = s.state
    np.testing.assert_array_equal(np.asarray(diags["0"]["RMS"]),
                                  np.asarray(diags["1"]["RMS"]))
    for f in ["S", "beta", "U", "V", "p", "Tg", "mu_t", "lam_t", "R",
              "CP", "Q_conv"]:
        a = np.asarray(getattr(states["0"], f))
        b = np.asarray(getattr(states["1"], f))
        np.testing.assert_array_equal(b, a, err_msg=f"{name}:{f}")
