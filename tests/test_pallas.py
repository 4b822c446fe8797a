"""Fused Pallas kernel vs the XLA path (interpret mode on CPU).

The kernel evaluates the SAME stage functions on VMEM tiles, so results
must agree exactly wherever the inputs agree.  The one designed difference
is the dt pairing (pallas computes the global dt reduction from the carried
primitives — one extra iteration of lag; see ops/pallas_step.py), so:

* on a uniform stream (stationary dt inputs) the paths agree bitwise;
* on evolving flows they diverge only at the dt-relative-difference level.
"""

import numpy as np
import pytest

from openhyperflow2d_tpu.examples import (channel_deck, freestream_deck,
                                          reacting_rans_deck)
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


@pytest.mark.parametrize("problem_type", [0, 1])
def test_pallas_exact_on_freestream(problem_type):
    ref = Solver(build_case(freestream_deck(problem_type=problem_type,
                                            nx=48, ny=32)))
    pal = Solver(build_case(freestream_deck(problem_type=problem_type,
                                            nx=48, ny=32)),
                 use_pallas=True, pallas_tile=(16, 16))
    ref.run_iters(4)
    d = pal.run_iters(4)
    assert not np.asarray(d["unstable"]).any()
    for f in ["S", "beta", "U", "V", "p", "Tg", "mu_t", "R", "CP"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(pal.state, f))
        np.testing.assert_allclose(b, a, atol=1e-20)


def test_pallas_close_on_evolving_flow():
    deck = channel_deck(nx=48, ny=40, mach2_v=-80.0)
    ref = Solver(build_case(deck))
    pal = Solver(build_case(channel_deck(nx=48, ny=40, mach2_v=-80.0)),
                 use_pallas=True, pallas_tile=(16, 16))
    d1 = ref.run_iters(5)
    d2 = pal.run_iters(5)
    # iteration 0 shares the initial dt exactly
    assert np.asarray(d1["dt_used"])[0] == np.asarray(d2["dt_used"])[0]
    for f in ["S", "U", "V", "p", "Tg"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(pal.state, f))
        rel = np.abs(a - b) / (np.abs(a).max() + 1e-30)
        assert rel.max() < 5e-3, (f, rel.max())


def test_pallas_reacting_rans_runs():
    pal = Solver(build_case(reacting_rans_deck(48, 40)),
                 use_pallas=True, pallas_tile=(16, 16))
    d = pal.run_iters(5)
    assert not np.asarray(d["unstable"]).any()
    assert np.isfinite(np.asarray(d["RMS"])).all()
    assert np.abs(np.asarray(pal.state.mu_t)).max() > 0


def test_pallas_non_multiple_grid():
    """Grid sizes that don't divide the tile exercise the padding path."""
    pal = Solver(build_case(channel_deck(nx=50, ny=37)),
                 use_pallas=True, pallas_tile=(16, 16))
    ref = Solver(build_case(channel_deck(nx=50, ny=37)))
    d = pal.run_iters(3)
    ref.run_iters(3)
    assert not np.asarray(d["unstable"]).any()
    a = np.asarray(ref.state.p)
    b = np.asarray(pal.state.p)
    rel = np.abs(a - b) / np.abs(a).max()
    assert rel.max() < 5e-3


@pytest.mark.parametrize("fuse", [2, 3])
def test_pallas_fused_exact_on_freestream(fuse):
    """Temporal blocking (K fused iterations per kernel launch): on a
    uniform stream dt inputs are stationary, so the block-frozen dt equals
    the per-iteration dt and results must match the XLA path bitwise.
    n_iters=6 with K=3 exercises the remainder-block path too (6-1=5=3+2).
    """
    ref = Solver(build_case(freestream_deck(problem_type=1, nx=48, ny=32)))
    pal = Solver(build_case(freestream_deck(problem_type=1, nx=48, ny=32)),
                 use_pallas=True, pallas_tile=(16, 16), pallas_fuse=fuse)
    ref.run_iters(6)
    d = pal.run_iters(6)
    assert not np.asarray(d["unstable"]).any()
    assert np.asarray(d["RMS"]).shape[0] == 6
    for f in ["S", "beta", "U", "V", "p", "Tg", "mu_t", "R", "CP"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(pal.state, f))
        np.testing.assert_allclose(b, a, atol=1e-20)


def test_pallas_fused_close_on_reacting():
    """K>1 freezes dt within blocks (documented deviation): fields stay
    within the dt-sensitivity envelope of the K=1 kernel."""
    p1 = Solver(build_case(reacting_rans_deck(48, 40)),
                use_pallas=True, pallas_tile=(16, 16))
    p4 = Solver(build_case(reacting_rans_deck(48, 40)),
                use_pallas=True, pallas_tile=(16, 16), pallas_fuse=4)
    d1 = p1.run_iters(9)
    d4 = p4.run_iters(9)
    assert not np.asarray(d4["unstable"]).any()
    assert np.asarray(d4["RMS"]).shape == np.asarray(d1["RMS"]).shape
    for f in ["S", "U", "p", "Tg"]:
        a = np.asarray(getattr(p1.state, f))
        b = np.asarray(getattr(p4.state, f))
        rel = np.abs(a - b) / (np.abs(a).max() + 1e-30)
        assert rel.max() < 5e-3, (f, rel.max())


def _pallas_solver(deck, tile, fuse, persistent):
    import jax
    from openhyperflow2d_tpu.ops.pallas_step import make_pallas_chunk
    s = Solver(build_case(deck), use_pallas=True, pallas_tile=tile,
               pallas_fuse=fuse)
    s._chunk_fn = jax.jit(make_pallas_chunk(
        s.meta, s.params, s.chem, (s.beta_xs, s.beta_ys),
        (s.cfl_xs, s.cfl_ys), s.params.TurbStartIter, tile=tile,
        fuse_iters=fuse, persistent=persistent), static_argnums=(1,))
    return s


def test_pallas_persistent_carry_bitwise_vs_classic():
    """The persistent exploded-layout carry (halo-strip refresh between
    K-blocks, ops/pallas_step._machinery(persistent=True)) must be
    BIT-IDENTICAL to the classic explode-per-block path: the refresh
    copies exactly the values a fresh explode would stage, and every
    stale/pad lane it leaves behind is select-masked (idXl/idXr/idYu/idYd
    = 0 at grid edges).  nx=50/ny=300 with a (16, 128) tile forces
    nbx=4/nby=3 windows, X and Y pad remainders (64-50, 384-300), the
    off-grid strip fixes, and fuse=3 over 8 iters hits the remainder
    block (8-1 = 2*3 + 1)."""
    mk = lambda: channel_deck(nx=50, ny=300, mach2_v=-80.0)  # noqa: E731
    pers = _pallas_solver(mk(), (16, 128), 3, True)
    clas = _pallas_solver(mk(), (16, 128), 3, False)
    dp = pers.run_iters(8)
    dc = clas.run_iters(8)
    np.testing.assert_array_equal(np.asarray(dp["RMS"]),
                                  np.asarray(dc["RMS"]))
    np.testing.assert_array_equal(np.asarray(dp["dt_used"]),
                                  np.asarray(dc["dt_used"]))
    for f in ["S", "beta", "U", "V", "p", "Tg", "mu_t", "R", "CP"]:
        a = np.asarray(getattr(clas.state, f))
        b = np.asarray(getattr(pers.state, f))
        np.testing.assert_array_equal(b, a, err_msg=f)
    # sanity vs the XLA path (dt-lag envelope)
    ref = Solver(build_case(mk()))
    ref.run_iters(8)
    for f in ["S", "U", "p", "Tg"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(pers.state, f))
        rel = np.abs(a - b) / (np.abs(a).max() + 1e-30)
        assert rel.max() < 5e-3, (f, rel.max())


def test_pallas_walled_heat_close_to_xla():
    """Walls-on bench physics (no-slip bottom wall + conjugate heat +
    sigma weighting — the Wedge-class feature set) through the fused
    kernel: matches the XLA path within the dt-lag envelope (wider here
    than on the open-channel cases: the step's impulsive bow shock makes
    dt move faster per iteration, so the fused path's K-frozen dt
    deviates more — measured ~7e-3 at iteration 7)."""
    mk = lambda: reacting_rans_deck(48, 40, wall_bottom=True,  # noqa: E731
                                    adiabatic=False, with_step=True)
    ref = Solver(build_case(mk()))
    pal = Solver(build_case(mk()), use_pallas=True, pallas_tile=(16, 16),
                 pallas_fuse=2)
    ref.run_iters(7)
    d = pal.run_iters(7)
    assert not np.asarray(d["unstable"]).any()
    assert np.abs(np.asarray(pal.state.mu_t)).max() > 0
    # the wall SrcAdd/heat stages actually fired
    assert np.abs(np.asarray(pal.state.Q_conv)).max() > 0
    for f in ["S", "U", "V", "p", "Tg"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(pal.state, f))
        rel = np.abs(a - b) / (np.abs(a).max() + 1e-30)
        assert rel.max() < 2e-2, (f, rel.max())


def test_pallas_rms_excludes_tile_padding():
    """Grid sizes that don't divide the tile: the edge-replicated pad
    rows/cols must not contribute to the RMS reduction (they previously
    biased it ~12%); agreement with the XLA path is at the dt-lag level."""
    deck = channel_deck(nx=50, ny=37)
    ref = Solver(build_case(deck))
    pal = Solver(build_case(channel_deck(nx=50, ny=37)),
                 use_pallas=True, pallas_tile=(16, 16))
    a = np.asarray(ref.run_iters(3)["RMS"])
    b = np.asarray(pal.run_iters(3)["RMS"])
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-3


def test_halo_depth_selection():
    """halo_depth: 2 on d2-free cases (deepest chain: center <- A/SrcAdd
    at +-1 <- gradients at +-2), 3 when a d2*-NULL soft BC makes pass-1
    average neighbor dSdx (core/step.py dXX)."""
    from openhyperflow2d_tpu.ops.pallas_step import halo_depth
    p2 = build_case(channel_deck(nx=32, ny=24)).params
    assert not (p2.has_d2x or p2.has_d2y)
    assert halo_depth(p2) == 2
    d = channel_deck(nx=32, ny=24)
    d.data["Contour1.Bound2.Cond"] = "NT_D2X_2D"
    p3 = build_case(d).params
    assert p3.has_d2x and halo_depth(p3) == 3


def test_halo2_bitwise_vs_halo3(monkeypatch):
    """On a d2-free deck the halo-2 kernel must be BITWISE identical to
    the (over-provisioned) halo-3 kernel: the extra ring only feeds
    values the center never depends on.  Walls+solid+heat deck so the
    deepest chains (SrcAdd via the conjugate-heat shifts, turbulence
    gradients) are all exercised."""
    mk = lambda: reacting_rans_deck(48, 40, wall_bottom=True,  # noqa: E731
                                    adiabatic=False, with_step=True)
    states = {}
    for h in ("2", "3"):
        monkeypatch.setenv("HF2D_HALO", h)
        s = Solver(build_case(mk()), use_pallas=True, pallas_tile=(16, 16),
                   pallas_fuse=3)
        d = s.run_iters(7)
        states[h] = (s.state, np.asarray(d["RMS"]))
    np.testing.assert_array_equal(states["2"][1], states["3"][1])
    for f in ["S", "beta", "U", "V", "p", "Tg", "mu_t", "Q_conv"]:
        a = np.asarray(getattr(states["3"][0], f))
        b = np.asarray(getattr(states["2"][0], f))
        np.testing.assert_array_equal(b, a, err_msg=f)


def test_pallas_euler_lam_t_const_path():
    """Euler decks (sm != SM_NS): fill does NOT recompute lam_t, so the
    carry diet stages it as a chunk-constant plane — exercise that path
    through the fused kernel and pin bitwise equality with the XLA path
    on a uniform stream (stationary dt => no dt-lag)."""
    mk = lambda: freestream_deck(problem_type=0, nx=48, ny=32)  # noqa
    ref = Solver(build_case(mk()))
    pal = Solver(build_case(mk()), use_pallas=True, pallas_tile=(16, 16),
                 pallas_fuse=3)
    assert ref.params.sm != 1    # SM_NS == 1: this is the Euler path
    ref.run_iters(7)
    d = pal.run_iters(7)
    assert not np.asarray(d["unstable"]).any()
    for f in ["S", "beta", "U", "V", "p", "Tg", "lam_t", "y_plus"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(pal.state, f))
        np.testing.assert_array_equal(b, a, err_msg=f)


def test_pallas_yplus_staged_path():
    """Closures that read y+ in the inner loop (Chien here) stage the
    chunk-constant y_plus plane into the kernel (needs_y_plus path of
    the carry diet).  Make the plane non-trivial via the per-cycle
    recalc, then pin the fused path against the XLA path within the
    dt-lag envelope."""
    from openhyperflow2d_tpu.core import flags as fl
    from openhyperflow2d_tpu.core.step import needs_y_plus

    def mk():
        d = channel_deck(nx=48, ny=40, problem_type=1, turb_model=4,
                         turb_ext_model=fl.TEM_k_eps_Chien,
                         wall_bottom=True, cfl=0.1)
        return build_case(d)

    ref = Solver(mk())
    pal = Solver(mk(), use_pallas=True, pallas_tile=(16, 16),
                 pallas_fuse=2)
    assert needs_y_plus(ref.params)
    for s in (ref, pal):
        s.run_iters(3)
        s.recalc_y_plus()
    assert np.abs(np.asarray(ref.state.y_plus)).max() > 0
    yp_before = np.asarray(pal.state.y_plus).copy()
    d = pal.run_iters(5)
    ref.run_iters(5)
    assert not np.asarray(d["unstable"]).any()
    # the chunk must pass its own y_plus plane through untouched
    np.testing.assert_array_equal(np.asarray(pal.state.y_plus), yp_before)
    for f in ["S", "U", "p", "Tg", "mu_t"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(pal.state, f))
        rel = np.abs(a - b) / (np.abs(a).max() + 1e-30)
        assert rel.max() < 5e-3, (f, rel.max())


def test_halo_env_underprovision_rejected(monkeypatch):
    """HF2D_HALO below the case's dependency depth must raise, not
    silently compute wrong stencils."""
    from openhyperflow2d_tpu.ops.pallas_step import halo_depth
    p = build_case(channel_deck(nx=32, ny=24)).params
    monkeypatch.setenv("HF2D_HALO", "1")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        halo_depth(p)
    monkeypatch.setenv("HF2D_HALO", "3")
    assert halo_depth(p) == 3


def test_dt_overrun_guard():
    """Frozen-dt CFL monitor (VERDICT r4 item 5): each fused iteration
    compares the block-frozen dt against that iteration's freshly computed
    per-node CFL limit (gfc's dt_field).  The reacting impulsive start
    (dt limit swinging several %/iter) must trip it at K=8; a uniform
    freestream (stationary dt inputs) must stay clean."""
    from openhyperflow2d_tpu.examples import reacting_rans_deck

    pal = Solver(build_case(reacting_rans_deck(48, 40)),
                 use_pallas=True, pallas_tile=(16, 16), pallas_fuse=8)
    d = pal.run_iters(17)
    assert np.asarray(d["dt_overrun"]).shape == (17,)
    assert np.asarray(d["dt_overrun"]).any()
    assert pal.run_cycle is not None   # surface exists
    # stats surface: run_cycle records the flag
    d2, _ = pal.run_cycle()
    assert isinstance(pal.stats.dt_overrun, bool)

    fs = Solver(build_case(freestream_deck(problem_type=1, nx=48, ny=32)),
                use_pallas=True, pallas_tile=(16, 16), pallas_fuse=4)
    dfs = fs.run_iters(9)
    assert not np.asarray(dfs["dt_overrun"]).any()
