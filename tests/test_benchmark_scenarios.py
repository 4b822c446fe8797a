"""BASELINE.json benchmark scenarios: build + short stable runs.

These exercise the full component matrix: circle solids, NACA airfoil with
attack angle, multicomponent non-reacting bubble, axisymmetric reacting
RANS with wall fuel injection.
"""

import numpy as np
import pytest

from openhyperflow2d_tpu.core import flags as fl
from openhyperflow2d_tpu.examples import (airfoil_deck, bubble_deck,
                                          cylinders_deck, scramjet_deck)
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def _run(deck, iters=20, **kw):
    case = build_case(deck, **kw)
    s = Solver(case)
    d = s.run_iters(iters)
    return case, s, d


@pytest.mark.slow
def test_three_cylinders():
    case, s, d = _run(cylinders_deck(nx=128, ny=64, mach=2.0), iters=20)
    solid = case.grid.is_cond(fl.CT_SOLID_2D)
    assert solid.sum() > 150          # three cylinders rasterized + filled
    assert not np.asarray(d["unstable"]).any()
    st = s.host_state()
    # bow shocks: pressure rises ahead of the first cylinder
    assert np.asarray(st.p).max() > 2.0e5


@pytest.mark.slow
def test_airfoil_with_attack_angle():
    # coarse grids leave no interior cells in a 12%-thick airfoil (the
    # reference aborts identically: FillArea2D AS_ERR_INIT_POINT)
    case, s, d = _run(airfoil_deck(nx=256, ny=128, mach=0.7,
                                   attack_deg=2.0,
                                   problem_type=0, turb_model=0), iters=20)
    solid = case.grid.is_cond(fl.CT_SOLID_2D)
    assert solid.sum() > 40
    assert not np.asarray(d["unstable"]).any()
    # Cx probe window configured from the deck
    assert case.is_Cx_calc
    from openhyperflow2d_tpu.postproc.outcfd import calc_cx
    st = s.host_state()
    cp = case.Cx_params
    cx = calc_cx(case.grid, st, cp["x0_body"], cp["y0_body"],
                 cp["dx_body"], cp["dy_body"],
                 case.flow2d_list[cp["Cx_Flow_index"] - 1])
    assert np.isfinite(cx)


@pytest.mark.slow
def test_shock_bubble_multicomponent():
    case, s, d = _run(bubble_deck(nx=128, ny=64), iters=30)
    assert not np.asarray(d["unstable"]).any()
    st = s.host_state()
    yfu = np.asarray(st.S)[fl.i2d_Yfu] / np.maximum(np.asarray(st.S)[0],
                                                    1e-30)
    # the light-gas bubble exists and stays bounded
    assert 0.5 < yfu.max() <= 1.0 + 1e-9
    assert yfu.min() >= -1e-12
    # non-reacting: no combustion products generated
    assert np.asarray(st.S)[fl.i2d_Ycp].max() < 1e-8


@pytest.mark.slow
def test_axisymmetric_scramjet_reacting():
    case, s, d = _run(scramjet_deck(nx=128, ny=48), iters=20)
    assert case.params.ft == fl.FT_AXISYMMETRIC
    assert case.params.sm == fl.SM_NS
    assert not np.asarray(d["unstable"]).any()
    st = s.host_state()
    # fuel source active
    assert np.asarray(s._src_ext)[fl.i2d_Yfu].max() > 0
    assert np.isfinite(np.asarray(st.Tg)).all()
    # k-eps running
    assert np.abs(np.asarray(st.S)[fl.i2d_k]).max() > 0
