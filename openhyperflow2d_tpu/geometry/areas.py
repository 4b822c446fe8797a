"""Area flood fill.

Re-implements ``Area2D::FillArea2D`` (libOpenHyperFLOW2D/
hyper_flow_area.cpp:66-186): BFS from a seed through nodes without
CT_NODE_IS_SET, stamping the area's condition/turbulence bits, importing the
Flow2D state, and maintaining gas/solid interface neighbor flags
(idXl/idXr/idYu/idYd + NGX/NGY zeroing) on already-set neighbors.
"""

from __future__ import annotations

from collections import deque

from ..core import flags as fl
from ..gasdyn.flow import Flow, Flow2D
from .grid import HostGrid


class AreaError(RuntimeError):
    pass


def fill_area(grid: HostGrid, X: int, Y: int, bnt: int, flow2d: Flow2D = None,
              p_Y=None, att: int = 0):
    """Flood fill from node (X, Y).

    ``bnt``/``att`` are the CT / TCT bits stamped on filled nodes (the
    reference ORs CT_NODE_IS_SET automatically).  When ``flow2d`` is given the
    gas state is imported into every filled node; passing CT_SOLID_2D in
    ``bnt`` marks a solid region.
    """
    if isinstance(flow2d, Flow) and not isinstance(flow2d, Flow2D):
        flow2d = Flow2D(flow=flow2d)
    XMax, YMax = grid.MaxX, grid.MaxY
    if not (XMax > X and YMax > Y):
        raise AreaError("fill seed out of range")
    if grid.is_cond(fl.CT_NODE_IS_SET_2D, X, Y):
        raise AreaError(f"fill seed ({X},{Y}) is already set")

    ant = bnt | fl.CT_NODE_IS_SET_2D
    filled = []
    grid.CT[X, Y] = ant
    grid.TCT[X, Y] = att
    frontier = deque([(X, Y)])
    while frontier:
        tX, tY = frontier.popleft()
        filled.append((tX, tY))
        if p_Y is not None:
            for c in range(4):
                grid.Y[c, tX, tY] = p_Y[c]
        if flow2d is not None:
            grid.set_node_from_flow2d((tX, tY), flow2d)
        grid.BGX[tX, tY] = 1.0
        grid.BGY[tX, tY] = 1.0
        grid.NGX[tX, tY] = 1
        grid.NGY[tX, tY] = 1
        grid.idXl[tX, tY] = 1
        grid.idYu[tX, tY] = 1
        grid.idXr[tX, tY] = 1
        grid.idYd[tX, tY] = 1

        is_solid_here = (ant & fl.CT_SOLID_2D) == fl.CT_SOLID_2D
        for (nX, nY, back_ng, back_id) in (
                (tX - 1, tY, "NGX", "idXr"),
                (tX + 1, tY, "NGX", "idXl"),
                (tX, tY - 1, "NGY", "idYu"),
                (tX, tY + 1, "NGY", "idYd")):
            if not (0 <= nX < XMax and 0 <= nY < YMax):
                continue
            if not grid.is_cond(fl.CT_NODE_IS_SET_2D, nX, nY):
                grid.CT[nX, nY] = ant
                grid.TCT[nX, nY] = att
                frontier.append((nX, nY))
            elif (is_solid_here
                  and not grid.is_cond(fl.CT_SOLID_2D, nX, nY)):
                # gas node adjacent to freshly filled solid loses the facing
                # neighbor and its wall-direction coefficient
                getattr(grid, back_ng)[nX, nY] = 0
                getattr(grid, back_id)[nX, nY] = 0
    return filled
