"""Device-side solver state and static grid metadata pytrees.

The reference's per-node array-of-structs (hyper_flow_node.hpp:138-239)
splits into:

* :class:`SolverState` — the dynamic carry of the time loop (conservative
  variables, blending factors, primitives, gradients, transport properties,
  flux vectors) as ``(NumEq|4, X, Y)`` / ``(X, Y)`` planes;
* :class:`GridMeta` — read-only per-node metadata (condition bits, neighbor
  flags, wall geometry) staged once;
* :class:`SolverParams` — static compile-time configuration (hashable, used
  as a closure constant so XLA specializes the kernel).

All dynamic fields live in one dtype (float64 for CPU validation runs,
float32/bfloat16 on TPU).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config.tables import Table
from . import flags as fl


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields))
    return cls


@dataclass
class SolverState:
    """Dynamic carry of the inner iteration loop."""

    S: jnp.ndarray        # (9, X, Y) conservative variables
    beta: jnp.ndarray     # (9, X, Y) per-eq blending factors
    A: jnp.ndarray        # (9, X, Y) x-flux (convective - viscous)
    B: jnp.ndarray        # (9, X, Y) y-flux
    F: jnp.ndarray        # (9, X, Y) axisymmetric flux
    dSdx: jnp.ndarray     # (9, X, Y)
    dSdy: jnp.ndarray     # (9, X, Y)
    Src: jnp.ndarray      # (9, X, Y) sources (external + turbulence)
    SrcAdd: jnp.ndarray   # (9, X, Y) wall / heat sources
    U: jnp.ndarray        # (X, Y) primitives
    V: jnp.ndarray
    p: jnp.ndarray
    Tg: jnp.ndarray
    Yc: jnp.ndarray       # (4, X, Y) mass fractions
    R: jnp.ndarray        # (X, Y) mixture gas constant
    CP: jnp.ndarray
    lam: jnp.ndarray
    mu: jnp.ndarray
    mu_t: jnp.ndarray
    lam_t: jnp.ndarray
    droYdx: jnp.ndarray   # (4, X, Y)
    droYdy: jnp.ndarray
    dUdx: jnp.ndarray     # (X, Y) velocity/temperature gradients
    dUdy: jnp.ndarray
    dVdx: jnp.ndarray
    dVdy: jnp.ndarray
    dTdx: jnp.ndarray
    dTdy: jnp.ndarray
    dkdx: jnp.ndarray     # turbulence gradients
    dkdy: jnp.ndarray
    depsdx: jnp.ndarray
    depsdy: jnp.ndarray
    y_plus: jnp.ndarray   # (X, Y)
    Q_conv: jnp.ndarray   # (X, Y) wall convective heat flux
    dt: jnp.ndarray       # scalar — dt for THIS iteration (one-iter lag)


_register(SolverState, [f.name for f in dataclasses.fields(SolverState)])


@dataclass
class GridMeta:
    """Static per-node metadata (device-resident, read-only)."""

    CT: jnp.ndarray       # (X, Y) uint32 condition bits
    TCT: jnp.ndarray      # (X, Y) uint32 turbulence condition bits
    idXl: jnp.ndarray     # (X, Y) int8 neighbor-present flags
    idXr: jnp.ndarray
    idYu: jnp.ndarray
    idYd: jnp.ndarray
    NGX: jnp.ndarray      # (X, Y) int8
    NGY: jnp.ndarray
    BGX: jnp.ndarray      # (X, Y) wall cosines
    BGY: jnp.ndarray
    Uw: jnp.ndarray       # (X, Y) wall velocity
    Vw: jnp.ndarray
    l_min: jnp.ndarray    # (X, Y) wall distance
    i_wall: jnp.ndarray   # (X, Y) int32
    j_wall: jnp.ndarray
    # Per-node spacing maps — the `_UNIFORM_MESH_`-off analog (per-node
    # dx/dy fields, hyper_flow_node.hpp:150).  None (the default) = uniform
    # mesh, matching the reference's own build (.models:5).  When set,
    # they replace the scalar dx/dy exactly where the reference reads
    # FlowNode2D::dx/dy — the moving-wall SrcAdd (hyper_flow_node.hpp:
    # 463-464), the mixing length l (608-610) and the Smagorinsky filter
    # width (939-947); the pass-1 stencil constants, gradients and local
    # dt keep the *global* dx/dy, which is what the reference hot loop
    # does even in non-uniform builds (deeps2d_core.cpp:643-644, 843-844,
    # and dx_local=dx in CalcHeatOnWallSources, 2714-2715).
    dx_map: jnp.ndarray = None
    dy_map: jnp.ndarray = None


_register(GridMeta, [f.name for f in dataclasses.fields(GridMeta)])


def node_dx_dy(meta: "GridMeta", params: "SolverParams"):
    """Per-node spacing: (dx, dy) scalars for uniform meshes, the staged
    (X, Y) maps otherwise (FlowNode2D::dx/dy, hyper_flow_node.hpp:150)."""
    if params.uniform_mesh:
        return params.dx, params.dy
    return meta.dx_map, meta.dy_map


@dataclass
class ChemTables:
    """Species property tables + constants staged on device.

    Lookup order mirrors ChemicalReactionsModelData2D
    (libDEEPS2D/deeps2d_core.hpp): per-species R (scalars), Cp/lam/mu
    tables of temperature.
    """

    R_Fuel: jnp.ndarray
    R_OX: jnp.ndarray
    R_cp: jnp.ndarray
    R_air: jnp.ndarray
    # each table: (xs, ys) 1-D knot arrays
    Cp_Fuel_x: jnp.ndarray
    Cp_Fuel_y: jnp.ndarray
    Cp_OX_x: jnp.ndarray
    Cp_OX_y: jnp.ndarray
    Cp_cp_x: jnp.ndarray
    Cp_cp_y: jnp.ndarray
    Cp_air_x: jnp.ndarray
    Cp_air_y: jnp.ndarray
    lam_Fuel_x: jnp.ndarray
    lam_Fuel_y: jnp.ndarray
    lam_OX_x: jnp.ndarray
    lam_OX_y: jnp.ndarray
    lam_cp_x: jnp.ndarray
    lam_cp_y: jnp.ndarray
    lam_air_x: jnp.ndarray
    lam_air_y: jnp.ndarray
    mu_Fuel_x: jnp.ndarray
    mu_Fuel_y: jnp.ndarray
    mu_OX_x: jnp.ndarray
    mu_OX_y: jnp.ndarray
    mu_cp_x: jnp.ndarray
    mu_cp_y: jnp.ndarray
    mu_air_x: jnp.ndarray
    mu_air_y: jnp.ndarray

    @classmethod
    def from_tables(cls, R: dict, tables: dict, dtype=jnp.float64):
        """Build from {species: R} and {(prop, species): Table}."""
        kw = {}
        for sp in ("Fuel", "OX", "cp", "air"):
            # shape (1,): Pallas TPU blocks must be rank >= 1
            kw[f"R_{sp}"] = jnp.asarray([R[sp]], dtype)
            for prop in ("Cp", "lam", "mu"):
                t: Table = tables[(prop, sp)]
                kw[f"{prop}_{sp}_x"] = jnp.asarray(t.x, dtype)
                kw[f"{prop}_{sp}_y"] = jnp.asarray(t.y, dtype)
        return cls(**kw)


_register(ChemTables, [f.name for f in dataclasses.fields(ChemTables)])


@dataclass(frozen=True)
class SolverParams:
    """Static (compile-time) solver configuration."""

    MaxX: int
    MaxY: int
    dx: float
    dy: float
    ft: int = fl.FT_FLAT              # FlowType (flat / axisymmetric)
    sm: int = fl.SM_EULER             # ProblemType (Euler / NS)
    tem: int = fl.TEM_k_eps_Std       # TurbExtModel
    bff: int = fl.BFF_SQR             # blending factor function
    beta0: float = 0.9
    nrbc_beta0: float = 0.25
    CFL: float = 0.1
    SigW: float = 1.0
    SigF: float = 1.0
    delta_bl: float = 0.0
    K0: float = 0.0                   # stoichiometric OX/fuel ratio
    gamma_c: float = 0.0              # chemistry completion factor
    Tf: float = 0.0                   # ignition temperature
    Ts0: float = 300.0
    Hu: tuple = (0.0, 0.0, 0.0, 0.0)  # heats of formation (fu, ox, cp, air)
    chemistry: int = fl.CRM_ZELDOVICH
    isAdiabaticWall: bool = True
    isAlternateRMS: bool = False
    TurbStartIter: int = 0
    isSrcAdd: bool = False
    turb_mod: int = 0                 # deck TurbulenceModel id
    # The serial (non-MPI) reference build never resets its dt_min
    # accumulator (deeps2d_core.cpp:846-852), so dt decreases monotonically;
    # the MPI build recomputes it every iteration.  MPI semantics are
    # canonical here; enable this flag to replicate serial golden runs.
    serial_dt_mode: bool = False
    # serial build's AlternateRMS accumulates the SIGNED residual (not its
    # square) and zeroes the result when the sum is negative
    # (deeps2d_core.cpp:1139-1141, 1541-1549); the MPI build squares it
    serial_rms_mode: bool = False
    # static specialization (build_case narrows these from the grid):
    # turbulence-model code paths that can appear on any node of this case
    models: tuple = ("prandtl", "keps", "sa", "smag")
    # any wall-law / no-slip nodes present (gates wall handling + y+ path)
    has_walls: bool = True
    # any node carrying a 2nd-order (d2*/dx2|dy2 NULL) soft BC flag — gates
    # the dSdx/dSdy neighbor-averaging branch of pass 1 (defaults True =
    # no specialization)
    has_d2x: bool = True
    has_d2y: bool = True
    # any CT_NONREFLECTED nodes (gates the nrbc beta0 override)
    has_nrbc: bool = True
    # any external volumetric sources (SetSources2D); False lets XLA fold
    # the Src*dt term of pass 1 for the mean-flow/species equations
    has_ext_src: bool = True
    # chem table names (f"{prop}_{species}") whose knots are strictly
    # ascending — those lookups take the telescoped slope-delta fast path
    # in table_lookup (exact identity for ascending knots)
    chem_asc: tuple = ()
    # uniform mesh (the reference's _UNIFORM_MESH_, .models:5); False makes
    # the node-local physics read GridMeta.dx_map/dy_map instead of dx/dy
    uniform_mesh: bool = True
    # allow reciprocal-multiply transforms of repeated divisions (changes
    # last-ulp rounding; off for reference-parity golden validation)
    fast_math: bool = False
    dtype: str = "float64"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def state_from_grid(grid, params: SolverParams, dt0: float) -> SolverState:
    """Stage a HostGrid's dynamic fields as a SolverState."""
    dt = params.jdtype
    X, Y = grid.MaxX, grid.MaxY
    ne = fl.NUM_EQ

    def a(x):
        return jnp.asarray(x, dt)

    z9 = jnp.zeros((ne, X, Y), dt)
    z1 = jnp.zeros((X, Y), dt)
    z4 = jnp.zeros((4, X, Y), dt)

    # optional per-field overrides staged through grid.extras["init_<f>"]:
    # fill-time turbulence fluxes from the area flood fill (solver/init.py;
    # hyper_flow_area.cpp:174) — they survive the turbulence reset just as
    # the reference's A/B arrays do — and, on the swap-file resume path
    # (io_out/swapfile.grid_from_swap), every recomputable field persisted
    # in the reference's FlowNode2D matrix
    def ex(name, default):
        v = grid.extras.get(f"init_{name}")
        return a(v) if v is not None else default

    return SolverState(
        S=a(grid.S), beta=a(grid.beta),
        A=ex("A", z9), B=ex("B", z9), F=ex("F", z9),
        dSdx=ex("dSdx", z9), dSdy=ex("dSdy", z9),
        Src=a(grid.Src), SrcAdd=ex("SrcAdd", z9),
        U=a(grid.U), V=a(grid.V), p=a(grid.p), Tg=a(grid.Tg),
        Yc=a(grid.Y), R=a(grid.R), CP=a(grid.CP), lam=a(grid.lam),
        mu=a(grid.mu), mu_t=a(grid.mu_t), lam_t=a(grid.lam_t),
        droYdx=ex("droYdx", z4), droYdy=ex("droYdy", z4),
        dUdx=ex("dUdx", z1), dUdy=ex("dUdy", z1),
        dVdx=ex("dVdx", z1), dVdy=ex("dVdy", z1),
        dTdx=ex("dTdx", z1), dTdy=ex("dTdy", z1),
        dkdx=ex("dkdx", z1), dkdy=ex("dkdy", z1),
        depsdx=ex("depsdx", z1), depsdy=ex("depsdy", z1),
        y_plus=a(grid.y_plus), Q_conv=ex("Q_conv", z1),
        dt=jnp.asarray(dt0, dt))


def meta_from_grid(grid, dtype=None) -> GridMeta:
    """Stage a HostGrid's static fields as a GridMeta.

    ``dtype``: dtype for the float planes (BGX/BGY/Uw/Vw/l_min and the
    optional spacing maps).  Pass the case's solver dtype — a float64
    meta plane silently promotes a float32 state through the wall-branch
    arithmetic of fill_node when x64 is globally enabled (the CPU test
    config).  Default keeps the historical x64-flag behavior.
    """
    f8 = dtype if dtype is not None else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    return GridMeta(
        CT=jnp.asarray(fl.ct_to_uint32(grid.CT)),
        TCT=jnp.asarray(grid.TCT.astype(np.uint32)),
        idXl=jnp.asarray(grid.idXl.astype(np.int8)),
        idXr=jnp.asarray(grid.idXr.astype(np.int8)),
        idYu=jnp.asarray(grid.idYu.astype(np.int8)),
        idYd=jnp.asarray(grid.idYd.astype(np.int8)),
        NGX=jnp.asarray(grid.NGX), NGY=jnp.asarray(grid.NGY),
        BGX=jnp.asarray(grid.BGX, f8), BGY=jnp.asarray(grid.BGY, f8),
        Uw=jnp.asarray(grid.Uw, f8), Vw=jnp.asarray(grid.Vw, f8),
        l_min=jnp.asarray(grid.l_min, f8),
        i_wall=jnp.asarray(grid.i_wall), j_wall=jnp.asarray(grid.j_wall),
        dx_map=(None if grid.extras.get("dx_map") is None
                else jnp.asarray(grid.extras["dx_map"], f8)),
        dy_map=(None if grid.extras.get("dy_map") is None
                else jnp.asarray(grid.extras["dy_map"], f8)))
