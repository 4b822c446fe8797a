"""Multi-process (multi-host) runtime: jax.distributed + global mesh.

The TPU-native replacement for the reference's MPI scatter/gather
(hf2d_start.cpp:142-229, deeps2d_core.cpp:1679-1758): 2 spawned processes
x 4 virtual CPU devices build the same case, run the sharded solver over
one 8-device mesh spanning both processes, and process 0 writes the
Tecplot snapshot from the per-host shard assembly.  The result must match
the single-process 8-device run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np
proc_id, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from openhyperflow2d_tpu.parallel.multihost import (gather_to_host,
                                                    init_distributed,
                                                    is_primary,
                                                    shard_solver_global)
init_distributed(f"127.0.0.1:{port}", nproc, proc_id)
assert jax.device_count() == 4 * nproc, jax.devices()
from openhyperflow2d_tpu.examples import channel_deck
from openhyperflow2d_tpu.io_out.tecplot import save_data_2d
from openhyperflow2d_tpu.parallel.mesh import make_mesh
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver

case = build_case(channel_deck(nx=64, ny=32))
s = Solver(case)
mesh = make_mesh(len(jax.devices()))
shard_solver_global(s, mesh)
d = s.run_iters(8)
assert np.isfinite(np.asarray(d["RMS"])).all()
st = s.host_state()
if is_primary():
    save_data_2d(os.path.join(outdir, "mh.plt"), case.grid, st,
                 case.params, 0.0)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = {**os.environ,
           "PYTHONPATH": REPO,
           "JAX_PLATFORMS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    # single-process 8-device reference
    import jax
    from openhyperflow2d_tpu.examples import channel_deck
    from openhyperflow2d_tpu.io_out.tecplot import save_data_2d
    from openhyperflow2d_tpu.parallel.mesh import make_mesh, shard_solver
    from openhyperflow2d_tpu.solver.init import build_case
    from openhyperflow2d_tpu.solver.runner import Solver

    case = build_case(channel_deck(nx=64, ny=32))
    s = Solver(case)
    shard_solver(s, make_mesh(8))
    s.run_iters(8)
    ref_plt = tmp_path / "ref.plt"
    save_data_2d(str(ref_plt), case.grid, s.host_state(), case.params, 0.0)

    got = (tmp_path / "mh.plt").read_bytes()
    want = ref_plt.read_bytes()
    assert got == want, "multi-process Tecplot differs from single-process"


@pytest.mark.slow
def test_cli_multiprocess(tmp_path):
    """CLI end-to-end under 2 processes: process 0 writes the outputs."""
    from openhyperflow2d_tpu.config.deck import deck_to_text
    from openhyperflow2d_tpu.examples import channel_deck

    deck = channel_deck(nx=64, ny=32, nmax=5)
    deck.data["ProjectName"] = "mh"
    deck_file = tmp_path / "mh.dat"
    deck_file.write_text(deck_to_text(deck))
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    wrapper = tmp_path / "cli_worker.py"
    wrapper.write_text(
        "import sys\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from openhyperflow2d_tpu.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n")
    procs = [subprocess.Popen(
        [sys.executable, str(wrapper), str(deck_file),
         "--outdir", str(tmp_path / "mhout"), "--max-cycles", "2",
         "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", "2", "--process-id", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    assert (tmp_path / "mhout" / "mh.plt").exists()
    assert (tmp_path / "mhout" / "RMS-mh").exists()
