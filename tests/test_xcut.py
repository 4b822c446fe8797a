"""XCut mass-flow conservation — the reference's per-cycle numerical check
(deeps2d_core.cpp:1762-1768, CalcMassFlowRateX2D out_cfd_param.cpp:170-196).

On a steady uniform channel the mass flow through any X station must equal
the inlet value rho*U*H, and two stations must agree with each other — the
manual conservation oracle the reference prints every outer cycle, here
pinned as an automatic test.
"""

import numpy as np

from openhyperflow2d_tpu.core import flags as fl
from openhyperflow2d_tpu.examples import channel_deck
from openhyperflow2d_tpu.postproc.outcfd import (calc_area_x,
                                                 calc_mass_flow_rate_x)
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def test_xcut_mass_flow_conserved_uniform_stream():
    nx, ny = 64, 48
    deck = channel_deck(nx=nx, ny=ny, u=500.0, problem_type=0)
    case = build_case(deck)
    solver = Solver(case)
    solver.run_iters(10)
    st = solver.host_state()
    grid = case.grid

    lx = nx * grid.dx
    h = ny * grid.dy
    m1 = calc_mass_flow_rate_x(grid, st, 0.3 * lx, 0.0, h)
    m2 = calc_mass_flow_rate_x(grid, st, 0.7 * lx, 0.0, h)
    # stations agree (conservation on the uniform stream)
    assert np.isclose(m1, m2, rtol=1e-10)

    # and match the freestream rho*U*H to physics accuracy (the boundary
    # rows carry the D0Y/FC BC values, so this is a 1%-level check)
    i = int(0.3 * lx / grid.dx)
    rhoU = np.asarray(st.S)[fl.i2d_RhoU][i, ny // 2]
    area = calc_area_x(grid, 0.3 * lx, 0.0, h)
    assert np.isclose(m1, rhoU * area, rtol=1e-2)
    assert m1 > 0


def test_xcut_area_excludes_solids():
    nx, ny = 96, 48
    deck = channel_deck(nx=nx, ny=ny, u=500.0, problem_type=0,
                        with_rect=True)
    case = build_case(deck)
    grid = case.grid
    lx, h = nx * grid.dx, ny * grid.dy
    # the rect spans x in [0.3, 0.4]*lx, y in [0, 0.25]*ly
    a_open = calc_area_x(grid, 0.1 * lx, 0.0, h)
    a_cut = calc_area_x(grid, 0.35 * lx, 0.0, h)
    assert a_cut < a_open
    assert a_open > 0
