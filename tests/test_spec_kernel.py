"""Interior-specialized kernel branch (ops/pallas_step, HF2D_SPEC).

Generic-interior tiles run a second kernel body whose StaticCtx masks are
Python-bool constants folded at trace time (core.physics wsel/band/bor/
bnot).  These tests pin:

* the genericity predicate: every node generic_interior_map marks must
  decode (build_static_ctx) to exactly the constants of
  specialized_interior_ctx — the specialization is then bitwise-safe;
* bitwise identity of the full fused chunk with specialization on vs off
  on a grid large enough that interior tiles actually take the
  specialized branch.
"""

import os

import numpy as np
import pytest

from openhyperflow2d_tpu.core.static_ctx import (build_static_ctx,
                                                 generic_interior_map,
                                                 specialized_interior_ctx,
                                                 StaticCtx)
from openhyperflow2d_tpu.examples import reacting_rans_deck
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


@pytest.mark.parametrize("walls", [False, True], ids=["open", "walls"])
def test_generic_map_matches_decode(walls):
    """Meta-test of the predicate: on generic nodes the full decode must
    equal the specialized constants for every mask field, and the float
    weight planes must equal the specialized scalars."""
    from openhyperflow2d_tpu.core.state import meta_from_grid

    deck = reacting_rans_deck(48, 40, wall_bottom=walls,
                              adiabatic=not walls, with_step=walls)
    case = build_case(deck, dtype="float32")
    g = case.grid
    gen = generic_interior_map(g.CT, g.TCT, g.idXl, g.idXr, g.idYu,
                               g.idYd, case.params)
    assert gen is not None and gen.any()
    meta = meta_from_grid(g, dtype=case.params.jdtype)
    ctx = build_static_ctx(meta, case.params)
    spec = specialized_interior_ctx(meta, case.params)
    for f in StaticCtx.__annotations__:
        sv = getattr(spec, f)
        gv = np.asarray(getattr(ctx, f))
        if isinstance(sv, bool):
            got = gv[..., gen] if gv.ndim == 2 else gv[:, gen]
            assert (got == sv).all(), (f, sv)
        else:
            sv = np.asarray(sv)
            if sv.ndim == 0:        # scalar weight vs general plane
                assert (gv[gen] == sv).all(), f
            else:                   # kept float planes: same expression
                np.testing.assert_array_equal(gv[gen], sv[gen], err_msg=f)


@pytest.mark.parametrize("mode", ["rect", "dual"])
def test_spec_kernel_bitwise(monkeypatch, mode):
    """Full fused chunk, spec on vs off, in both execution modes:

    * rect: the generic tiles form a rectangle -> 5 single-body calls.
      STATE is bitwise identical; the RMS/DD diag partials are summed
      across calls instead of one sequential tile accumulator, so those
      agree to float-summation-order (~1e-7), asserted tightly.
    * dual: one kernel, per-tile SMEM flag dispatch — everything
      bitwise including the diags (same accumulator order).

    Grid 64x384 with (16, 128)-class tiles gives interior tiles whose
    windows avoid every boundary, so the specialized path actually
    executes (verified via a counting wrapper)."""
    from openhyperflow2d_tpu.ops import pallas_step

    calls = {"spec": 0}
    orig = pallas_step.specialized_interior_ctx

    def counting(*a, **k):
        calls["spec"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pallas_step, "specialized_interior_ctx", counting)

    def mk():
        case = build_case(reacting_rans_deck(64, 384), dtype="float32")
        return case

    monkeypatch.setenv("HF2D_SPEC", "1")
    monkeypatch.setenv("HF2D_SPECMODE", mode)
    a = Solver(mk(), use_pallas=True, pallas_tile=(16, 128),
               pallas_fuse=4)
    da = a.run_iters(9)
    assert calls["spec"] > 0, "specialized branch was never traced"

    monkeypatch.setenv("HF2D_SPEC", "0")
    b = Solver(mk(), use_pallas=True, pallas_tile=(16, 128),
               pallas_fuse=4)
    db = b.run_iters(9)

    for f in ["S", "beta", "U", "V", "p", "Tg", "Yc", "R", "CP",
              "lam", "mu", "mu_t", "dt"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(a.state, f)),
            np.asarray(getattr(b.state, f)), err_msg=f)
    for k in ("RMS", "DD_max", "dt_used"):
        if mode == "dual":
            np.testing.assert_array_equal(np.asarray(da[k]),
                                          np.asarray(db[k]), err_msg=k)
        else:
            np.testing.assert_allclose(np.asarray(da[k]),
                                       np.asarray(db[k]), rtol=2e-6,
                                       atol=0, err_msg=k)
    assert (np.asarray(da["unstable"]) == np.asarray(db["unstable"])).all()
    assert (np.asarray(da["dt_overrun"])
            == np.asarray(db["dt_overrun"])).all()


@pytest.mark.parametrize("walls", [False, True], ids=["open", "walls"])
def test_scatter_frame_bitwise(monkeypatch, walls):
    """Region mode's general boundary frame as ONE scalar-prefetch
    scatter call (HF2D_SCATTER=1; measured perf-neutral on TPU, so the
    slab form is the default) must be bitwise identical to
    the 4 rectangular slab calls (HF2D_SCATTER=0, default): same tiles, same
    single 'general' body, only the grid traversal/issue form differs.
    The diag partials are also bitwise (same per-tile accumulation
    order: the scatter table enumerates tiles row-major like the slab
    calls' sum is order-insensitive per (eq, TY-column) row)."""

    def mk():
        deck = reacting_rans_deck(64, 384, wall_bottom=walls,
                                  adiabatic=not walls, with_step=walls)
        return build_case(deck, dtype="float32")

    monkeypatch.setenv("HF2D_SPEC", "1")
    monkeypatch.setenv("HF2D_SPECMODE", "rect")
    monkeypatch.setenv("HF2D_SCATTER", "1")
    a = Solver(mk(), use_pallas=True, pallas_tile=(16, 128),
               pallas_fuse=4)
    da = a.run_iters(9)

    monkeypatch.setenv("HF2D_SCATTER", "0")
    b = Solver(mk(), use_pallas=True, pallas_tile=(16, 128),
               pallas_fuse=4)
    db = b.run_iters(9)

    for f in ["S", "beta", "U", "V", "p", "Tg", "Yc", "R", "CP",
              "lam", "mu", "mu_t", "dt"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(a.state, f)),
            np.asarray(getattr(b.state, f)), err_msg=f)
    for k in ("RMS", "DD_max", "dt_used"):
        np.testing.assert_allclose(np.asarray(da[k]), np.asarray(db[k]),
                                   rtol=2e-6, atol=0, err_msg=k)
    assert (np.asarray(da["unstable"]) == np.asarray(db["unstable"])).all()
    assert (np.asarray(da["dt_overrun"])
            == np.asarray(db["dt_overrun"])).all()


def test_multirect_bluff_body_bitwise(monkeypatch):
    """Interior-solid decks (bluff-body combustor): the generic tile set
    has a mid-grid hole, so region mode covers it with several disjoint
    single-body spec rectangles + ONE scatter call for the general
    remainder ("multirect").  Must be bitwise identical to the
    dual-body dispatch on the state; diags agree to summation order."""
    from openhyperflow2d_tpu.examples import combustor_deck
    from openhyperflow2d_tpu.ops import pallas_step

    def mk():
        return build_case(combustor_deck(160, 384, bluff_body=True),
                          dtype="float32")

    # the multirect branch must actually engage (>= 2 spec rect calls)
    made = []
    orig = pallas_step._rect_cover

    def counting(*a, **k):
        r = orig(*a, **k)
        made.append(r)
        return r

    monkeypatch.setattr(pallas_step, "_rect_cover", counting)
    monkeypatch.setenv("HF2D_SPEC", "1")
    monkeypatch.setenv("HF2D_SPECMODE", "rect")
    a = Solver(mk(), use_pallas=True, pallas_tile=(16, 128),
               pallas_fuse=4)
    da = a.run_iters(9)
    assert made and made[-1] is not None and len(made[-1]) >= 2, made

    monkeypatch.setenv("HF2D_SPECMODE", "dual")
    b = Solver(mk(), use_pallas=True, pallas_tile=(16, 128),
               pallas_fuse=4)
    db = b.run_iters(9)

    for f in ["S", "beta", "U", "V", "p", "Tg", "Yc", "R", "CP",
              "lam", "mu", "mu_t", "dt"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(a.state, f)),
            np.asarray(getattr(b.state, f)), err_msg=f)
    for k in ("RMS", "DD_max", "dt_used"):
        np.testing.assert_allclose(np.asarray(da[k]), np.asarray(db[k]),
                                   rtol=2e-6, atol=0, err_msg=k)
    assert (np.asarray(da["unstable"]) == np.asarray(db["unstable"])).all()
    assert (np.asarray(da["dt_overrun"])
            == np.asarray(db["dt_overrun"])).all()
