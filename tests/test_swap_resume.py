"""Deck-driven .hf2d auto-resume (PreloadFlag) wired into build_case/CLI.

Reference semantics under test (SURVEY §3.5): LoadSwapFile2D maps the whole
node matrix from <Project>.hf2d when present with the right size
(obj_data.cpp:117-319, deeps2d_core.cpp:3197-3252), the fresh-init blocks
are skipped (!PreloadFlag guards at 3859/4081/4166/4287/4299/4510/4639),
bound state is re-applied only under per-bound ``.isReset`` (3493-3505),
GlobalTime restores from node(0,0).time (4618-4621), and the swap is synced
every outer cycle (1818-1848).
"""

import dataclasses
import os

import numpy as np
import pytest

from openhyperflow2d_tpu.config.deck import deck_to_text
from openhyperflow2d_tpu.examples import channel_deck
from openhyperflow2d_tpu.io_out.swapfile import write_swap_file
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def test_preload_exact_continuation(tmp_path):
    """Interrupted-at-the-swap continuation is bit-identical to the
    uninterrupted run (float64: the swap stores f8, so staging through it
    is lossless; dt and the iteration counter are process state in the
    reference too and are restored explicitly here)."""
    deck = channel_deck(nx=32, ny=24)
    ref = Solver(build_case(deck))
    ref.run_iters(10)
    ref.global_time = 1.25e-5
    dt_mid = np.asarray(ref.state.dt).copy()
    swap = str(tmp_path / "channel.hf2d")
    write_swap_file(swap, ref, ref.case.grid)
    ref.run_iters(10)

    deck2 = channel_deck(nx=32, ny=24)
    deck2.data["ProjectName"] = "channel"
    deck2.data["GasSwapFile"] = ".hf2d"
    case2 = build_case(deck2, use_swap=True, swap_dir=str(tmp_path))
    assert case2.preloaded
    assert case2.swap_path == swap
    res = Solver(case2)
    assert res.global_time == pytest.approx(1.25e-5)
    res.state = dataclasses.replace(
        res.state, dt=res.state.dt * 0 + dt_mid)
    res.last_iter = 10          # scenario/turb-start indexing continues
    res.run_iters(10)

    for f in ["S", "beta", "A", "B", "U", "V", "p", "Tg", "Yc",
              "dSdx", "dSdy", "R", "CP", "lam", "mu"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(res.state, f)),
            np.asarray(getattr(ref.state, f)), err_msg=f)


def test_no_preload_without_swap_file(tmp_path):
    deck = channel_deck(nx=32, ny=24)
    deck.data["ProjectName"] = "nothere"
    case = build_case(deck, use_swap=True, swap_dir=str(tmp_path))
    assert not case.preloaded          # fresh start; bounds force-reset


def test_preload_rejects_wrong_size(tmp_path):
    deck = channel_deck(nx=32, ny=24)
    deck.data["ProjectName"] = "bad"
    bad = tmp_path / "bad.hf2d"
    bad.write_bytes(b"\0" * 1000)
    case = build_case(deck, use_swap=True, swap_dir=str(tmp_path))
    assert not case.preloaded


@pytest.mark.slow
def test_cli_auto_resume(tmp_path, capsys):
    """CLI kill/re-invoke: second invocation auto-resumes from the swap
    the first one synced, continuing GlobalTime."""
    from openhyperflow2d_tpu.cli import main

    deck = channel_deck(nx=32, ny=24, nmax=5)
    deck.data["ProjectName"] = "chan"
    deck_file = tmp_path / "chan.dat"
    deck_file.write_text(deck_to_text(deck))

    rc = main([str(deck_file), "--outdir", str(tmp_path),
               "--max-cycles", "2"])
    assert rc == 0
    out1 = capsys.readouterr().out
    assert "PreloadFlag" not in out1
    t1 = float(out1.split("t=")[-1].split("s")[0])
    assert os.path.getsize(tmp_path / "chan.hf2d") == 32 * 24 * 1248

    rc = main([str(deck_file), "--outdir", str(tmp_path),
               "--max-cycles", "2"])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert "PreloadFlag=1" in out2
    t2 = float(out2.split("t=")[-1].split("s")[0])
    assert t2 > t1 * 1.5               # GlobalTime continued, not reset


GOLDEN_SWAP = "/tmp/golden/OS500/ObliqueShock.hf2d"
GOLDEN_RESUME_PLT = "/tmp/golden/OS500resume/ObliqueShock.plt"


@pytest.mark.slow
@pytest.mark.skipif(not (os.path.exists(GOLDEN_SWAP)
                         and os.path.exists(GOLDEN_RESUME_PLT)),
                    reason="reference golden swap not generated on this "
                           "machine (see VALIDATION.md)")
def test_build_case_preloads_reference_swap(tmp_path):
    """The deck-driven auto-resume path (build_case(use_swap=True)) maps a
    REFERENCE-written .hf2d — full PreloadFlag semantics including the
    per-bound isReset gating (all ObliqueShock bounds carry isReset=0) —
    and continues within the same envelope as the reference's own resumed
    run (test_swapfile.test_resume_from_reference_swap tolerances)."""
    import shutil

    from openhyperflow2d_tpu.config.deck import load_deck
    from openhyperflow2d_tpu.io_out.tecplot import read_tecplot_zone

    shutil.copy(GOLDEN_SWAP, tmp_path / "ObliqueShock.hf2d")
    deck = load_deck(
        "/root/reference/OpenHyperFLOW2D/TestCases/ObliqueShock.dat")
    case = build_case(deck, serial_dt_mode=True, use_swap=True,
                      swap_dir=str(tmp_path))
    assert case.preloaded
    s = Solver(case)
    # GlobalTime restores from node(0,0).time (deeps2d_core.cpp:4621) —
    # which the reference never actually writes during the run for the
    # shipped decks (the per-node time stamp at :867 does not reach the
    # corner), so the reference's own resume restarts at 0 and ours must
    # match that quirk exactly
    from openhyperflow2d_tpu.io_out.swapfile import read_swap_file
    t00 = float(read_swap_file(GOLDEN_SWAP, 320, 80)["time"][0, 0])
    assert s.global_time == t00
    d = s.run_iters(101)
    assert not np.asarray(d["unstable"]).any()
    st = s.host_state()
    g = read_tecplot_zone(GOLDEN_RESUME_PLT, 320, 80)
    for name, mine in [("p", st.p), ("U", st.U), ("Rho", st.S[0])]:
        err = np.abs(np.asarray(mine) - g[name]) / np.abs(g[name]).max()
        assert err.mean() < 1e-4, (name, err.mean())
        assert err.max() < 3e-2, (name, err.max())
