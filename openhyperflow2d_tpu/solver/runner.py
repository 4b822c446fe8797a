"""Time-marching driver: the DEEPS2D_Run equivalent.

Structure mirrors the reference (deeps2d_core.cpp:512-2023): an outer cycle
of ``Nstep`` inner iterations.  The inner loop is one ``lax.scan`` compiled
end-to-end (the whole two-pass scheme + physics per iteration); the outer
cycle returns to Python for output, monitors, checkpointing and the exit
condition — exactly the points where the reference does rank-0 work.

Per-iteration diagnostics (RMS per equation, dt) stream out of the scan as
stacked arrays, so RMS files can be written with NOutStep granularity
without host round-trips inside the loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import flags as fl
from ..core.physics import fill_node, node_masks
from ..core.state import (ChemTables, GridMeta, SolverParams, SolverState,
                          meta_from_grid, state_from_grid)
from ..core.step import StepAux, make_fast_chunk, solver_step
from .init import Case, chem_tables_device


def choose_step_path(platform: str, dtype: str, uniform_mesh: bool,
                     n_devices: int = 1, n_processes: int = 1):
    """Default step-path selection for the CLI: the fused Pallas kernel is
    the production path (4.7x the XLA scan, PERF.md), used whenever its
    preconditions hold; everything else falls back to the reference-exact
    XLA scan.  Mirrors the reference's single hot loop per deck
    (deeps2d_core.cpp:512).  Returns ``(use_pallas, reason)``.
    """
    if platform != "tpu":
        return False, (f"platform is {platform!r}; the fused kernel "
                       f"targets TPU")
    if str(dtype) != "float32":
        return False, (f"dtype {dtype}: f64 validation runs use the "
                       f"reference-exact XLA path")
    if not uniform_mesh:
        return False, "non-uniform mesh runs on the XLA path only"
    if n_processes > 1 or n_devices > 1:
        return False, ("multi-device runs shard the XLA path via GSPMD "
                       "(use parallel.shard_step for fused multi-chip)")
    return True, "TPU, float32, uniform mesh, single chip"


@dataclass
class RunStats:
    iters: int = 0
    global_time: float = 0.0
    rms_history: list = field(default_factory=list)   # (iter, RMS[9])
    monitors: list = field(default_factory=list)
    steps_per_sec: float = 0.0
    unstable: bool = False
    # fused paths only: a block-frozen dt exceeded some node's freshly
    # computed CFL limit during the cycle (ops/pallas_step iter_body)
    dt_overrun: bool = False


class Solver:
    """Single-driver solver over one (possibly sharded) device state."""

    def __init__(self, case: Case, shardings=None, use_pallas: bool = False,
                 pallas_tile=(64, 64), pallas_fuse: int = 1):
        self.use_pallas = use_pallas
        self.pallas_tile = pallas_tile
        self.pallas_fuse = pallas_fuse
        self._init_common(case, shardings)

    def _init_common(self, case: Case, shardings=None):
        self.case = case
        p = case.params
        self.params = p
        dtype = p.jdtype
        self.meta = meta_from_grid(case.grid, dtype=dtype)
        self.chem = chem_tables_device(case.chem, dtype)
        self.state = state_from_grid(case.grid, p, case.dt0)
        # external volumetric sources (SetSources2D) — quasi-static input
        self._src_ext = jnp.asarray(case.grid.Src, dtype)
        self.beta_xs = jnp.asarray(case.beta_scenario.x, dtype)
        self.beta_ys = jnp.asarray(case.beta_scenario.y, dtype)
        self.cfl_xs = jnp.asarray(case.cfl_scenario.x, dtype)
        self.cfl_ys = jnp.asarray(case.cfl_scenario.y, dtype)
        self.last_iter = 0
        self.global_time = float(case.deck.get_float("InitTime", 0.0,
                                                     required=False))
        # swap-file resume: GlobalTime from node(0,0).time unless the deck
        # overrides it with a positive InitTime (deeps2d_core.cpp:4618-4621)
        if getattr(case, "preloaded", False) and self.global_time <= 0.0:
            self.global_time = case.preload_time
        self.current_time_part = 0.0
        self.stats = RunStats()
        self.shardings = shardings
        if shardings is not None:
            self.meta = jax.device_put(self.meta, shardings["meta"])
            self.state = jax.device_put(self.state, shardings["state"])

        # initial FillNode2D(0,1) — run after staging so the device state
        # gets fluxes + turbulence init exactly once (deeps2d_core.cpp:4565);
        # skipped on swap-file resume, where the fluxes come from the swap
        # (the first-init loop sits under !PreloadFlag, 4510)
        if not getattr(case, "preloaded", False):
            self._init_fill = jax.jit(partial(fill_node, meta=self.meta,
                                              params=p,
                                              is_mu_t=jnp.zeros(
                                                  (p.MaxX, p.MaxY), bool),
                                              is_init=True))
            self.state = self._init_fill(self.state)

        # donate the incoming state buffers: the chunk's output state has
        # the same shapes, so XLA reuses the allocation — at 4Kx4K the
        # full SolverState is ~7.6 GB and without donation input+output
        # both stay live across the call (HBM OOM on a 16 GB chip)
        self._chunk_fn = jax.jit(self._make_chunk_fn(), static_argnums=(1,),
                                 donate_argnums=(0,))

    def _make_chunk_fn(self):
        # pass the GridMeta as a runtime argument instead of closing over
        # it: required under a multi-process mesh, and it keeps the Pallas
        # module free of baked exploded-meta constants (whose serialized
        # size breaks remote compiles at 4Kx4K)
        self._pass_meta = getattr(self, "_multihost", False)
        if getattr(self, "use_pallas", False):
            if not self.params.uniform_mesh:
                raise NotImplementedError(
                    "non-uniform meshes run on the XLA path only (the "
                    "Pallas kernel is tuned for the uniform bench family)")
            self._pass_meta = True
            from ..core.static_ctx import generic_interior_map
            from ..ops.pallas_step import make_pallas_chunk
            g = self.case.grid
            # host map of generic-interior nodes -> per-tile interior
            # specialization (ops/pallas_step; HF2D_SPEC=0 disables)
            spec_map = generic_interior_map(g.CT, g.TCT, g.idXl, g.idXr,
                                            g.idYu, g.idYd, self.params)
            return make_pallas_chunk(
                self.meta, self.params, self.chem,
                (self.beta_xs, self.beta_ys), (self.cfl_xs, self.cfl_ys),
                self.params.TurbStartIter,
                tile=self.pallas_tile,
                fuse_iters=getattr(self, "pallas_fuse", 1),
                spec_map=spec_map)
        probe_idx = tuple(self._probe_index(mp.x, mp.y)
                          for mp in self.case.monitor_points)
        # Large grids pass meta as a runtime argument: closing over it
        # bakes the GridMeta AND the decoded StaticCtx planes into the
        # module as constants, whose serialized size exceeds the
        # remote-compile request limit at 4096^2 (HTTP 413).  Small
        # grids keep the baked form: recomputing the ctx in-graph lets
        # the compiler reassociate its arithmetic, which perturbs
        # results at the ulp level — the validation-scale tests pin the
        # baked path's exact trajectories.
        big = self.params.MaxX * self.params.MaxY >= (1 << 22)   # >= 2048^2
        if big:
            self._pass_meta = True
        return make_fast_chunk(
            self.meta, self.params, self.chem,
            (self.beta_xs, self.beta_ys), (self.cfl_xs, self.cfl_ys),
            self.params.TurbStartIter, probe_idx=probe_idx,
            meta_as_arg=getattr(self, "_multihost", False) or big)

    def set_sources(self, src):
        """Update the volumetric source field (SetSources2D re-application
        each outer cycle, deeps2d_core.cpp:1716-1722).  A traced argument
        of the compiled chunk — no recompile."""
        new = jnp.asarray(src, self.params.jdtype)
        old_sharding = getattr(self._src_ext, "sharding", None)
        if old_sharding is not None:
            if getattr(self, "_multihost", False):
                from ..parallel.multihost import make_global_array
                new = make_global_array(np.asarray(src, self.params.dtype),
                                        old_sharding)
            else:
                new = jax.device_put(new, old_sharding)
        self._src_ext = new

    def run_iters(self, n_iters: int):
        """Run ``n_iters`` inner iterations; returns stacked diagnostics."""
        extra = ((self.meta,) if getattr(self, "_pass_meta", False) else ())
        state, diags = self._chunk_fn(self.state, n_iters,
                                      jnp.asarray(self.last_iter),
                                      self._src_ext, *extra)
        jax.block_until_ready(state)
        self.state = state
        self.last_iter += n_iters
        if getattr(self, "_multihost", False):
            # diags are fully replicated; np views need local shards
            from ..parallel.multihost import gather_to_host
            diags = gather_to_host(diags)
        dts = np.asarray(diags["dt_used"])
        self.current_time_part += float(dts.sum())
        return diags

    def run_cycle(self):
        """One outer cycle = Nstep inner iterations + host-side bookkeeping.
        Returns (diags, seconds)."""
        t0 = time.time()
        diags = self.run_iters(self.case.Nstep)
        dt_wall = time.time() - t0
        self.global_time += self.current_time_part
        self.current_time_part = 0.0
        self.stats.iters = self.last_iter
        self.stats.steps_per_sec = self.case.Nstep / max(dt_wall, 1e-9)
        self.stats.unstable = bool(np.asarray(diags["unstable"]).any())
        ovr = diags.get("dt_overrun") if hasattr(diags, "get") else None
        self.stats.dt_overrun = (bool(np.asarray(ovr).any())
                                 if ovr is not None else False)
        if self.params.sm == fl.SM_NS and len(self.case.wall_nodes):
            self.recalc_y_plus()
        return diags, dt_wall

    def _yplus_device_fn(self):
        """Compiled per-cycle y+ update (ParallelRecalc_y_plus,
        deeps2d_core.cpp:1649-1677 + 2260-2322): friction velocity is
        computed elementwise on every node and masked to the wall set
        (no host round-trip), then broadcast to every node keyed by its
        nearest-wall index with ONE flat device gather — once per outer
        cycle, not per iteration, so the scalar-unit cost is negligible
        next to the 2 GB/cycle D2H it replaces at 4Kx4K."""
        p = self.params
        
        def fn(S0, dUdy, dVdx, mu, y_plus_old, ct, i_wall,
               j_wall, l_min):
            wall = ((ct & jnp.uint32(fl.CT_WALL_NO_SLIP_2D))
                    == jnp.uint32(fl.CT_WALL_NO_SLIP_2D)) | \
                   ((ct & jnp.uint32(fl.CT_WALL_LAW_2D))
                    == jnp.uint32(fl.CT_WALL_LAW_2D))
            solid = ((ct & jnp.uint32(fl.CT_SOLID_2D))
                     == jnp.uint32(fl.CT_SOLID_2D))
            is_set = ((ct & jnp.uint32(fl.CT_NODE_IS_SET_2D))
                      == jnp.uint32(fl.CT_NODE_IS_SET_2D))
            active = is_set & ~solid
            tau_w = (jnp.abs(dUdy) + jnp.abs(dVdx)) * mu
            rho_s = jnp.where(S0 != 0, S0, 1)
            u_w = jnp.sqrt(jnp.where(S0 != 0, tau_w / rho_s, 0.0) + 1e-30)
            # non-solid wall set only (GetWallNodes, 2081-2104)
            u_map = jnp.where(wall & ~solid, u_w, 0.0)
            idx = (i_wall * p.MaxY + j_wall).reshape(-1)
            u_at = jnp.take(u_map.reshape(-1), idx).reshape(S0.shape)
            mu_s = jnp.where(mu != 0, mu, 1)
            yp = jnp.abs(u_at * l_min * S0 / mu_s)
            return jnp.where(active, yp, y_plus_old)

        return jax.jit(fn)

    def recalc_y_plus(self):
        """Per-cycle y+ update, fully on-device (see _yplus_device_fn)."""
        if not hasattr(self, "_yplus_fn"):
            self._yplus_fn = self._yplus_device_fn()
        st = self.state
        m = self.meta
        new_yp = self._yplus_fn(st.S[fl.i2d_Rho], st.dUdy, st.dVdx, st.mu,
                                st.y_plus, m.CT, m.i_wall, m.j_wall,
                                m.l_min)
        self.state = SolverState(**{**st.__dict__, "y_plus": new_yp})

    def recalc_y_plus_host(self):
        """Host (numpy) reference implementation of the same update —
        kept as the oracle for tests/test_yplus_device.py."""
        st = self.host_state()
        wn = self.case.wall_nodes
        iw = wn[:, 0]
        jw = wn[:, 1]
        tau_w = (np.abs(np.asarray(st.dUdy)[iw, jw])
                 + np.abs(np.asarray(st.dVdx)[iw, jw])) \
            * np.asarray(st.mu)[iw, jw]
        rho_w = np.asarray(st.S)[0][iw, jw]
        u_w = np.sqrt(np.where(rho_w != 0,
                               tau_w / np.where(rho_w != 0, rho_w, 1), 0.0)
                      + 1e-30)
        u_map = np.zeros((self.params.MaxX, self.params.MaxY))
        u_map[iw, jw] = u_w
        g = self.case.grid
        active = (g.is_cond(fl.CT_NODE_IS_SET_2D)
                  & ~g.is_cond(fl.CT_SOLID_2D))
        mu = np.asarray(st.mu)
        mu_s = np.where(mu != 0, mu, 1)
        y_plus = np.abs(u_map[g.i_wall, g.j_wall]
                        * np.asarray(self.meta.l_min)
                        * np.asarray(st.S)[0] / mu_s)
        return np.where(active, y_plus, np.asarray(st.y_plus))

    # ------------------------------------------------------------------
    def monitor_condition(self, diags) -> bool:
        """Exit test (deeps2d_core.cpp:1870-1883): continue while true."""
        mi = self.case.MonitorIndex
        emv = self.case.ExitMonitorValue
        rms = np.asarray(diags["RMS"])[-1]     # last iteration of the cycle
        if mi == 5:
            return self.global_time < emv
        if mi == 0:
            return float(rms.max()) > emv
        return float(rms[mi - 1]) > emv

    def max_rms(self, diags):
        rms = np.asarray(diags["RMS"])[-1]
        mi = self.case.MonitorIndex
        if mi == 0 or mi > 4:
            return float(rms.max()), int(rms.argmax())
        return float(rms[mi - 1]), mi - 1

    def host_state(self):
        """Fetch the dynamic state back to numpy (for output/checkpoint).
        Under a multi-process mesh this is the per-host shard assembly in
        grid order (the reference's rank-0 gather,
        deeps2d_core.cpp:1679-1714)."""
        if getattr(self, "_multihost", False):
            from ..parallel.multihost import gather_to_host
            return gather_to_host(self.state)
        return jax.tree.map(np.asarray, self.state)

    def _probe_index(self, x: float, y: float):
        p = self.params
        i = int((x - p.dx * 0.5) / p.dx)
        j = int(y / p.dy)
        return (min(max(i, 0), p.MaxX - 1), min(max(j, 0), p.MaxY - 1))

    def probe_many(self, points):
        """Monitor-point p/T for a list of (x, y) probes in ONE compiled
        fetch (deeps2d_core.cpp:1470-1473) — one device round-trip per
        cycle instead of two per point, and multi-host safe (the jitted
        gather returns a replicated array)."""
        idx = tuple(self._probe_index(px, py) for (px, py) in points)
        cache = getattr(self, "_probe_fns", None)
        if cache is None:
            cache = self._probe_fns = {}
        fn = cache.get(idx)
        if fn is None:
            def gather(p_fld, tg_fld):
                return jnp.stack(
                    [jnp.stack([p_fld[i, j], tg_fld[i, j]])
                     for (i, j) in idx])
            fn = cache[idx] = jax.jit(gather)
        vals = np.asarray(fn(self.state.p, self.state.Tg))
        return [(float(v[0]), float(v[1])) for v in vals]

    def probe(self, x: float, y: float):
        """Single monitor-point p/T."""
        return self.probe_many([(x, y)])[0]


def run_case(case: Case, max_cycles: int = None, verbose: bool = True,
             on_cycle=None):
    """Full run loop with the reference's exit semantics."""
    solver = Solver(case)
    cycles = 0
    while True:
        diags, secs = solver.run_cycle()
        cycles += 1
        mrms, k = solver.max_rms(diags)
        if verbose:
            print(f"Cycle {cycles}: iter={solver.last_iter} "
                  f"maxRMS[{k}]={mrms * 100:.5f}% "
                  f"t={solver.global_time:.6f}s "
                  f"({solver.stats.steps_per_sec:.1f} step/sec)")
        if on_cycle is not None:
            on_cycle(solver, diags)
        if solver.stats.unstable:
            print("ERROR: Computational instability (Tg < 0)")
            break
        if not solver.monitor_condition(diags):
            break
        if max_cycles is not None and cycles >= max_cycles:
            break
    return solver


def profile_solver(solver, n_iters: int = 50, trace_dir: str = "/tmp/hf2d_trace"):
    """Capture a jax.profiler trace of the inner loop (the reference's
    wall-clock step/sec prints, upgraded to a full op-level timeline)."""
    solver.run_iters(2)   # ensure compiled
    with jax.profiler.trace(trace_dir):
        solver.run_iters(n_iters)
    return trace_dir
