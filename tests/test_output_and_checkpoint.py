"""Output writers, post-processing, checkpoint/restore, CLI smoke tests."""

import os

import numpy as np
import pytest

from openhyperflow2d_tpu.examples import channel_deck, freestream_deck
from openhyperflow2d_tpu.io_out.tecplot import read_tecplot_zone, save_data_2d
from openhyperflow2d_tpu.postproc import outcfd
from openhyperflow2d_tpu.solver.checkpoint import (load_checkpoint,
                                                   save_checkpoint)
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


@pytest.fixture(scope="module")
def channel_solver():
    deck = channel_deck(nx=48, ny=32, mach2_v=-80.0)
    case = build_case(deck)
    s = Solver(case)
    s.run_iters(20)
    return case, s


def test_tecplot_roundtrip(channel_solver, tmp_path):
    case, s = channel_solver
    st = s.host_state()
    path = str(tmp_path / "out.plt")
    save_data_2d(path, case.grid, st, case.params, s.global_time)
    g = read_tecplot_zone(path, case.params.MaxX, case.params.MaxY)
    # 6-significant-digit round trip
    np.testing.assert_allclose(g["U"], np.asarray(st.U), rtol=2e-5,
                               atol=1e-4)
    np.testing.assert_allclose(g["p"], np.asarray(st.p), rtol=2e-5)


def test_snapshot_p_asterisk_and_cp_columns(channel_solver, tmp_path):
    """is_p_asterisk_out puts p* in column 12 and cp_arr fills the final
    Cp column (deeps2d_core.cpp:2644-2647, 2664-2668)."""
    from openhyperflow2d_tpu.core import flags as fl
    case, s = channel_solver
    st = s.host_state()
    X, Y = case.params.MaxX, case.params.MaxY
    cp_arr = np.linspace(-1.0, 1.0, X * Y).reshape(X, Y)
    path = str(tmp_path / "past.plt")
    save_data_2d(path, case.grid, st, case.params, s.global_time,
                 is_p_asterisk_out=True, cp_arr=cp_arr)
    with open(path) as f:
        header = f.readline()
    assert ", p*," in header
    g = read_tecplot_zone(path, X, Y)
    ps = outcfd.p_asterisk(st)
    gas = ~case.grid.is_cond(fl.CT_SOLID_2D)
    rho = np.asarray(st.S)[0]
    written = gas & (rho != 0.0)
    # 6-significant-digit formatting round trip
    np.testing.assert_allclose(g["mu_t_mu"][written], ps[written],
                               rtol=2e-5)
    np.testing.assert_allclose(g["Cp"], cp_arr, rtol=2e-5, atol=1e-5)
    # default path still writes mu_t/mu and a zero Cp column
    path2 = str(tmp_path / "mut.plt")
    save_data_2d(path2, case.grid, st, case.params, s.global_time)
    g2 = read_tecplot_zone(path2, X, Y)
    mut = np.asarray(st.mu_t) / np.asarray(st.mu)
    np.testing.assert_allclose(g2["mu_t_mu"][written], mut[written],
                               rtol=2e-5, atol=1e-8)
    assert (g2["Cp"] == 0).all()


def test_p_asterisk_and_mass_flow(channel_solver):
    case, s = channel_solver
    st = s.host_state()
    ps = outcfd.p_asterisk(st)
    # total pressure >= static pressure everywhere in the gas
    gas = ~case.grid.is_cond(0x040000000)
    assert (ps[gas] >= np.asarray(st.p)[gas] - 1e-9).all()
    # mass flow at inlet column ~ rho*U*height
    mp = outcfd.calc_mass_flow_rate_x(case.grid, st, 0.0, 0.0,
                                      case.params.MaxY * case.params.dy)
    rho = np.asarray(st.S)[0, 0, :]
    u = np.asarray(st.U)[0, :]
    expect = (rho * u * case.params.dy).sum()
    assert mp == pytest.approx(expect, rel=1e-12)


def test_average_pressure(channel_solver):
    case, s = channel_solver
    st = s.host_state()
    pa = outcfd.calc_average_pressure(case.grid, st, 0.0,
                                      case.params.MaxX * case.params.dx,
                                      case.params.MaxY * case.params.dy)
    p = np.asarray(st.p)
    assert p.min() <= pa <= p.max()


def test_checkpoint_roundtrip(tmp_path):
    deck = freestream_deck(nx=16, ny=16)
    case = build_case(deck)
    s1 = Solver(case)
    s1.run_iters(7)
    s1.global_time = 1.25e-5
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, s1)

    case2 = build_case(freestream_deck(nx=16, ny=16))
    s2 = Solver(case2)
    load_checkpoint(path, s2)
    assert s2.last_iter == 7
    assert s2.global_time == pytest.approx(1.25e-5)
    np.testing.assert_array_equal(np.asarray(s2.state.S),
                                  np.asarray(s1.state.S))
    # resumed run proceeds identically to an uninterrupted one
    s1.run_iters(5)
    s2.run_iters(5)
    np.testing.assert_allclose(np.asarray(s2.state.S),
                               np.asarray(s1.state.S), rtol=1e-12)


def test_checkpoint_shape_mismatch(tmp_path):
    deck = freestream_deck(nx=16, ny=16)
    s1 = Solver(build_case(deck))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, s1)
    s2 = Solver(build_case(freestream_deck(nx=24, ny=16)))
    with pytest.raises(ValueError):
        load_checkpoint(path, s2)


def test_cli_end_to_end(tmp_path):
    """Full CLI run on a small deck: output files + clean exit."""
    from openhyperflow2d_tpu.cli import main
    deck_text_path = tmp_path / "Channel.dat"
    d = channel_deck(nx=32, ny=24, nmax=30)
    # serialize the parsed deck back out in reference format
    lines = ["<start/Channel>"]
    for k, v in d.data.items():
        lines.append(f"<data/{k}={v}>")
    for name, t in d.tables.items():
        lines.append(f"<table={name}/{t.n}>")
        for x, y in zip(t.x, t.y):
            lines.append(f"{x} {y}")
        lines.append("<endtable>")
    lines.append("<end/Channel>")
    deck_text_path.write_text("\n".join(lines))

    rc = main([str(deck_text_path), "--max-cycles", "2",
               "--outdir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "Channel.plt").exists()
    assert (tmp_path / "RMS-Channel").exists()
    assert (tmp_path / "Channel.ckpt.npz").exists()
    g = read_tecplot_zone(str(tmp_path / "Channel.plt"), 32, 24)
    assert np.isfinite(g["p"]).all()


def test_native_wall_distance_matches_numpy():
    """Native bucket-grid nearest-wall transform is bit-exact vs the
    reference-semantics numpy implementation (incl. tie-breaking)."""
    from openhyperflow2d_tpu.core import flags as fl
    from openhyperflow2d_tpu.geometry import native
    from openhyperflow2d_tpu.geometry.grid import HostGrid
    from openhyperflow2d_tpu.geometry.wall import set_min_distance_to_wall
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(42)
    X, Y, dx, dy = 80, 64, 0.013, 0.011
    g = HostGrid(X, Y, dx, dy)
    g.CT[:] = fl.CT_NODE_IS_SET_2D
    solid = np.zeros((X, Y), bool)
    solid[20:35, 10:25] = True
    solid[60:70, 40:55] = True
    g.CT[solid] |= fl.CT_SOLID_2D
    wn = []
    for j in range(Y):
        for i in range(X):
            if not solid[i, j] and (
                    (i > 0 and solid[i - 1, j]) or
                    (i < X - 1 and solid[i + 1, j]) or
                    (j > 0 and solid[i, j - 1]) or
                    (j < Y - 1 and solid[i, j + 1])):
                wn.append((i, j))
    wn = np.array(wn, np.int32)
    set_min_distance_to_wall(g, wn)   # numpy path (small grid)
    active = (g.is_cond(fl.CT_NODE_IS_SET_2D)
              & ~g.is_cond(fl.CT_SOLID_2D))
    lm, iw, jw = native.min_wall_distance(
        wn, active, dx, dy, 0.0, max(dx * X, dy * Y))
    np.testing.assert_array_equal(lm[active], g.l_min[active])
    np.testing.assert_array_equal(iw[active], g.i_wall[active])
    np.testing.assert_array_equal(jw[active], g.j_wall[active])


def test_cli_heatflux_x_flow_index_and_window(tmp_path):
    """HeatFlux-X call-site wiring (deeps2d_core.cpp:1796 + 2894-2902):
    the CLI must normalize with flow2d_list[Cp_Flow_Index-1] and window
    the wall scan with y_max/y_min — not the round-3 hardcoded
    (flow 1, full height)."""
    from openhyperflow2d_tpu.config.deck import deck_to_text, parse_deck
    from openhyperflow2d_tpu.cli import main
    from openhyperflow2d_tpu.examples import reacting_rans_deck
    from openhyperflow2d_tpu.postproc.outcfd import save_x_heat_flux

    d = reacting_rans_deck(32, 24, wall_bottom=True, adiabatic=False,
                           with_step=True)
    d.data["isOutHeatFluxX"] = "1"
    d.data["Cp_Flow_Index"] = "2"       # non-default flow
    d.data["y_min"] = "0"
    d.data["y_max"] = "4"               # excludes the step-top walls (j=6)
    d.data["Nmax"] = "6"
    deck_path = tmp_path / "HF.dat"
    deck_path.write_text(deck_to_text(d))

    rc = main([str(deck_path), "--max-cycles", "1",
               "--outdir", str(tmp_path), "--no-swap"])
    assert rc == 0
    hf_path = tmp_path / "HeatFlux-X-Channel"
    assert hf_path.exists()

    # rebuild the identical end state from the CLI's checkpoint and call
    # the writer directly with the deck-keyed flow/window -> byte-equal
    case = build_case(parse_deck(deck_to_text(d)))
    s = Solver(case)
    load_checkpoint(str(tmp_path / "Channel.ckpt.npz"), s)
    st = s.host_state()
    hp = case.heatflux_params
    assert hp == {"Cp_Flow_index": 2, "y_max": 4, "y_min": 0}
    exp_path = tmp_path / "expected"
    save_x_heat_flux(str(exp_path), case.grid, st,
                     case.flow2d_list[hp["Cp_Flow_index"] - 1],
                     case.params.Ts0, hp["y_max"], hp["y_min"])
    assert hf_path.read_bytes() == exp_path.read_bytes()

    # hand-computed Cp at a bottom-wall column with flow-2 normalization
    fl2 = case.flow2d_list[1]
    q2 = 0.5 * fl2.ROG() * fl2.Wg() ** 2
    rows = [ln.split() for ln in hf_path.read_text().splitlines()[1:]]
    i_col = 3
    cp_file = float(rows[i_col][3])
    cp_hand = (float(np.asarray(st.p)[i_col, 0]) - fl2.Pg()) / q2
    assert cp_file == pytest.approx(cp_hand, rel=2e-6)

    # the old hardcoded call site (flow 1, full height) writes a
    # DIFFERENT file -> the keys are load-bearing
    old_path = tmp_path / "old_hardcoded"
    save_x_heat_flux(str(old_path), case.grid, st, case.flow2d_list[0],
                     case.params.Ts0, case.params.MaxY, 0)
    assert hf_path.read_bytes() != old_path.read_bytes()


def test_choose_step_path():
    """CLI default path selection (one production hot loop per deck, like
    deeps2d_core.cpp:512): fused Pallas on single-chip TPU f32 uniform
    runs, reference-exact XLA scan otherwise."""
    from openhyperflow2d_tpu.solver.runner import choose_step_path
    on, _ = choose_step_path("tpu", "float32", True, 1, 1)
    assert on
    for plat, dt, uni, nd, np_ in [
            ("cpu", "float32", True, 1, 1),      # non-TPU
            ("tpu", "float64", True, 1, 1),      # f64 validation
            ("tpu", "float32", False, 1, 1),     # non-uniform mesh
            ("tpu", "float32", True, 4, 1),      # GSPMD sharding
            ("tpu", "float32", True, 1, 2)]:     # multi-process
        off, why = choose_step_path(plat, dt, uni, nd, np_)
        assert not off and why


def test_cli_output_file_suffix_keys(tmp_path):
    """OutFileName = ProjectName + OutputFile, the transient file is
    "tp-" + OutFileName, ErrFileName = ProjectName + ErrorFile
    (deeps2d_core.cpp:2884-2887) — the suffixes come from the deck, not a
    hardcoded ".plt"."""
    from openhyperflow2d_tpu.config.deck import deck_to_text
    from openhyperflow2d_tpu.cli import main

    d = channel_deck(nx=32, ny=24, nmax=30)
    d.data["OutputFile"] = ".dat.plt"
    d.data["ErrorFile"] = ".failed.plt"
    deck_path = tmp_path / "Channel.dat"
    deck_path.write_text(deck_to_text(d))

    rc = main([str(deck_path), "--max-cycles", "1",
               "--outdir", str(tmp_path), "--no-swap"])
    assert rc == 0
    assert (tmp_path / "Channel.dat.plt").exists()
    assert (tmp_path / "tp-Channel.dat.plt").exists()
    assert not (tmp_path / "Channel.plt").exists()

    case = build_case(channel_deck(nx=8, ny=8))
    # defaults when the keys are absent match the shipped decks
    assert case.output_suffix == ".plt"
    assert case.error_suffix == "-err.plt"
