"""Non-uniform mesh: per-node dx/dy maps (the ``_UNIFORM_MESH_``-off analog).

The reference stores per-node dx/dy (hyper_flow_node.hpp:150) but reads
them in exactly three node-local physics sites: the moving-wall SrcAdd
(hyper_flow_node.hpp:463-464), the mixing-length floor (608-610) and the
Smagorinsky filter width (939-947).  Its hot-loop stencil constants,
gradients, local dt and CalcHeatOnWallSources use the *global* dx/dy even
in non-uniform builds (deeps2d_core.cpp:643-644, 843-844; dx_local=dx at
2714-2715), and the non-uniform node fields are initialized to the global
spacing anyway (3870-3873).  These tests pin that contract:

* constant maps reproduce the uniform solver exactly;
* a genuinely stretched map changes the turbulence closure and stays
  stable;
* the Pallas fast path (tuned for the uniform bench family) refuses
  non-uniform cases instead of silently ignoring the maps.
"""

import numpy as np
import pytest

from openhyperflow2d_tpu.core import flags as fl
from openhyperflow2d_tpu.examples import channel_deck
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver

DX = DY = 0.01   # channel_deck spacing


def _wall_channel(tm, tem, cfl=0.05):
    d = channel_deck(nx=96, ny=48, u=300.0, problem_type=1,
                     turb_model=tm, turb_ext_model=tem, cfl=cfl, beta=0.95)
    d.data["Contour1.Bound3.Cond"] = "NT_WNS_2D"
    d.data["delta_bl"] = "0.2"
    return d


def _const_maps(nx=96, ny=48):
    return np.full((nx, ny), DX), np.full((nx, ny), DY)


@pytest.mark.parametrize("tm,tem,name", [
    (2, fl.TEM_Prandtl, "prandtl"),          # mixing-length floor site
    (5, fl.TEM_Smagorinsky, "smagorinsky"),  # filter-width site
])
def test_constant_maps_match_uniform(tm, tem, name):
    """dx_map/dy_map == the deck spacing must be the uniform solver
    bit-for-bit (every per-node read sees the same value)."""
    s_u = Solver(build_case(_wall_channel(tm, tem)))
    dx_map, dy_map = _const_maps()
    s_n = Solver(build_case(_wall_channel(tm, tem),
                            dx_map=dx_map, dy_map=dy_map))
    assert not s_n.params.uniform_mesh
    d_u = s_u.run_iters(15)
    d_n = s_n.run_iters(15)
    assert not np.asarray(d_n["unstable"]).any(), name
    np.testing.assert_allclose(np.asarray(s_n.state.S),
                               np.asarray(s_u.state.S),
                               rtol=1e-14, atol=0, err_msg=name)
    np.testing.assert_allclose(np.asarray(d_n["RMS"]),
                               np.asarray(d_u["RMS"]),
                               rtol=1e-12, err_msg=name)


def test_stretched_map_changes_closure_and_stays_stable():
    """A wall-refined dy map (geometric stretch away from the bottom
    wall) must change the Smagorinsky eddy viscosity — the per-node
    filter width sqrt(dx*dy) enters mu_t directly — without destabilising
    the run."""
    nx, ny = 96, 48
    dy_col = DY * np.geomspace(0.25, 4.0, ny)     # fine at the wall
    dy_map = np.broadcast_to(dy_col, (nx, ny)).copy()
    s_u = Solver(build_case(_wall_channel(5, fl.TEM_Smagorinsky)))
    s_n = Solver(build_case(_wall_channel(5, fl.TEM_Smagorinsky),
                            dy_map=dy_map))
    d_n = s_n.run_iters(25)
    s_u.run_iters(25)
    assert not np.asarray(d_n["unstable"]).any()
    mu_u = np.asarray(s_u.state.mu_t)
    mu_n = np.asarray(s_n.state.mu_t)
    assert np.isfinite(np.asarray(s_n.state.S)).all()
    assert np.isfinite(mu_n).all()
    assert mu_n.max() > 0
    # the stretched filter width must actually show up in the closure
    assert np.abs(mu_n - mu_u).max() > 1e-12


def test_pallas_path_refuses_nonuniform():
    dx_map, dy_map = _const_maps()
    case = build_case(_wall_channel(2, fl.TEM_Prandtl),
                      dx_map=dx_map, dy_map=dy_map)
    with pytest.raises(NotImplementedError):
        Solver(case, use_pallas=True)


def test_bad_map_shape_rejected():
    with pytest.raises(ValueError):
        build_case(_wall_channel(2, fl.TEM_Prandtl),
                   dx_map=np.full((8, 8), DX))
    with pytest.raises(ValueError):
        build_case(_wall_channel(2, fl.TEM_Prandtl),
                   dy_map=np.zeros((96, 48)))
