"""Run every shipped reference TestCase deck through BOTH solver paths
on the TPU and compare final fields — the 'all decks run the flagship
kernel on hardware' matrix (round 4: the Mosaic walls+heat fix and the
Euler lam_t-const staging made the last deck families compilable).

Each deck is patched to a short run (Nmax/NOutStep) and driven through
the real CLI.  Prints one JSON line per deck with compile+run wall
times and the max relative deviation pallas-vs-XLA (expected within the
K-frozen-dt envelope; ObliqueShock/Step/TriplePoint are Euler decks —
stationary-dt phases keep them tight).

Usage: python scripts/testcases_pallas_matrix.py [names...]
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
TESTCASES = "/root/reference/OpenHyperFLOW2D/TestCases"


def patch_deck(src, dst, nmax=13, noutstep=12):
    txt = open(src).read()
    txt = re.sub(r"<data/Nmax=\d+>", f"<data/Nmax={nmax}>", txt)
    txt = re.sub(r"<data/NOutStep=\d+>", f"<data/NOutStep={noutstep}>",
                 txt)
    # the shipped TriplePoint deck predates several required keys: the
    # REFERENCE binary aborts on it too (GetFloatVal + Abort, e.g.
    # deeps2d_core.cpp:369-372) — same defaults the golden tests apply
    defaults = {"beta_NonReflectedBC": "0.25", "isAlternateRMS": "1",
                "isIgnoreUnsetNodes": "0", "MonitorIndex": "5",
                "NumMonitorPoints": "0", "ExitMonitorValue": "1e-12"}
    add = [f"<data/{k}={v}>" for k, v in defaults.items()
           if f"<data/{k}=" not in txt]
    if add:
        txt = txt.replace("<data/beta=",
                          "\n".join(add) + "\n<data/beta=", 1)
    open(dst, "w").write(txt)


def grid_of(path):
    txt = open(path).read()
    mx = int(re.search(r"<data/MaxX=(\d+)>", txt).group(1))
    my = int(re.search(r"<data/MaxY=(\d+)>", txt).group(1))
    return mx, my


def run(deck, outdir, pallas):
    os.makedirs(outdir, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    args = [sys.executable, "-m", "openhyperflow2d_tpu.cli", deck,
            "--max-cycles", "2", "--no-swap", "--outdir", outdir]
    if pallas:
        args += ["--pallas", "--fuse", "4"]
    t0 = time.time()
    r = subprocess.run(args, capture_output=True, text=True, env=env,
                       timeout=2700)
    return r.returncode, time.time() - t0, r.stdout[-400:] + r.stderr[-400:]


def main():
    import numpy as np
    from openhyperflow2d_tpu.io_out.tecplot import read_tecplot_zone

    names = sys.argv[1:] or ["ObliqueShock", "Step", "Wedge",
                             "TriplePoint"]
    for name in names:
        base = f"/tmp/tc_{name}"
        deck = f"{base}/{name}.dat"
        os.makedirs(base, exist_ok=True)
        patch_deck(os.path.join(TESTCASES, name + ".dat"), deck)
        mx, my = grid_of(deck)
        rc_p, t_p, log_p = run(deck, f"{base}/pallas", True)
        rc_x, t_x, log_x = run(deck, f"{base}/xla", False)
        row = {"deck": name, "grid": f"{mx}x{my}",
               "pallas": {"rc": rc_p, "wall_s": round(t_p, 1)},
               "xla": {"rc": rc_x, "wall_s": round(t_x, 1)}}
        if rc_p == 0 and rc_x == 0:
            proj = None
            for f in os.listdir(f"{base}/pallas"):
                if f.endswith(".plt") and not f.startswith("tp-"):
                    proj = f
            a = read_tecplot_zone(f"{base}/xla/{proj}", mx, my)
            b = read_tecplot_zone(f"{base}/pallas/{proj}", mx, my)
            devs = {}
            for f in ["U", "V", "p", "T", "Rho"]:
                x = np.asarray(a[f], float)
                y = np.asarray(b[f], float)
                devs[f] = round(float(np.abs(x - y).max()
                                      / (np.abs(x).max() + 1e-30)), 6)
            row["max_rel_dev"] = devs
        else:
            row["tail"] = (log_p if rc_p else log_x)[-300:]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
