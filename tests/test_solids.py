"""Solid primitives: rectangle, circle, NACA airfoil construction + flow."""

import numpy as np
import pytest

from openhyperflow2d_tpu.core import flags as fl
from openhyperflow2d_tpu.examples import channel_deck
from openhyperflow2d_tpu.gasdyn.flow import Flow2D
from openhyperflow2d_tpu.geometry.grid import HostGrid
from openhyperflow2d_tpu.geometry.solids import (bound_circle, solid_rect,
                                                 solid_airfoil_naca)
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def _flow():
    return Flow2D(mu=5e-5, lam=0.03, Cp=1004.5, T=300.0, P=1.e5,
                  R=287.05, u=0.0, v=0.0)


def test_solid_rect_marks_solid_region():
    g = HostGrid(64, 64, 0.01, 0.01)
    solid_rect(g, 0.2, 0.2, 0.2, 0.2, _flow(), (0, 0, 0, 1), 0)
    solid = g.is_cond(fl.CT_SOLID_2D)
    assert solid[30, 30]
    assert not solid[10, 10]
    # interior of the rect is solid, boundary nodes are wall-flagged
    wall = g.is_cond(fl.CT_WALL_NO_SLIP_2D)
    assert wall[20, 25] or wall[20, 24]
    # roughly 20x20 nodes
    assert 300 < solid.sum() < 600


def test_solid_rect_keps_wall_flags():
    g = HostGrid(64, 64, 0.01, 0.01)
    solid_rect(g, 0.2, 0.2, 0.2, 0.2, _flow(), (0, 0, 0, 1),
               fl.TCT_k_eps_Model_2D)
    # horizontal edges get the d/dy wall treatment flags
    assert g.is_turb_cond(fl.TCT_eps_mud2kdy2_WALL_2D, 30, 20)
    assert g.is_turb_cond(fl.TCT_k_CONST_2D, 30, 20)


def test_bound_circle_solid():
    g = HostGrid(64, 64, 0.01, 0.01)
    bound_circle(g, 0.22, 0.32, 0.32, 0.32, _flow(), (0, 0, 0, 1), 0,
                 material_id=1)
    solid = g.is_cond(fl.CT_SOLID_2D)
    assert solid[32, 32]                     # center
    assert not solid[5, 5]
    area = solid.sum() * 0.01 * 0.01
    assert area == pytest.approx(np.pi * 0.1 ** 2, rel=0.25)


def test_naca_airfoil_builds():
    g = HostGrid(128, 64, 0.01, 0.01)
    solid_airfoil_naca(g, 0.3, 0.32, mm=0.02, pp=0.4, thick=0.12,
                       flow2d=_flow(), Y=(0, 0, 0, 1),
                       tct=0, scale=0.6, attack_angle=0.0)
    solid = g.is_cond(fl.CT_SOLID_2D)
    assert solid.sum() > 50
    # airfoil occupies a chord-long, thin region
    si, sj = np.nonzero(solid)
    assert (si.max() - si.min()) > 3 * (sj.max() - sj.min())


def test_flow_around_rect_runs():
    """Deck-driven rect (duct narrowing config) through the full solver.

    NOTE: an NS + Prandtl-model run of this impulsive-start config blows up
    because the zero-equation mixing length l = 0.41*l_min is domain-scale
    far from walls (identical formula and behaviour in the reference,
    hyper_flow_node.hpp:637) — so this exercises the Euler path."""
    deck = channel_deck(nx=96, ny=48, u=400.0, problem_type=0,
                        turb_model=0, with_rect=True, cfl=0.1, beta=0.975)
    case = build_case(deck)
    assert case.grid.is_cond(fl.CT_SOLID_2D).sum() > 50
    s = Solver(case)
    d = s.run_iters(30)
    assert not np.asarray(d["unstable"]).any()
    st = s.host_state()
    # the solid stays stationary and the flow deflects around it
    solid = case.grid.is_cond(fl.CT_SOLID_2D)
    assert np.abs(np.asarray(st.U)[solid]).max() == 0
    assert np.abs(np.asarray(st.V)).max() > 1.0
    # wall distances not computed for Euler (reference: SM_NS only)
