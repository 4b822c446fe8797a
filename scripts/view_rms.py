"""RMS residual viewer — the view_RMS.sh equivalent.

The reference tails the RMS-<project> file into a live gnuplot window
(bin/view_RMS.sh).  This renders the same per-equation residual history
with matplotlib (PNG or interactive), optionally polling the file.

Usage:
    python scripts/view_rms.py RMS-Channel [-o rms.png] [--watch 5]
"""

import argparse
import os
import sys
import time

EQ_NAMES = ["Rho", "RhoU", "RhoV", "RhoE", "RhoYfu", "RhoYox", "RhoYcp",
            "k", "eps"]


def load_rms(path):
    import numpy as np
    rows = []
    with open(path) as f:
        for line in f:
            ls = line.strip()
            if not ls or ls.startswith("#"):
                continue
            vals = ls.split()
            rows.append([float(v) for v in vals[:10]])
    return np.asarray(rows)


def render(path, out=None):
    import matplotlib
    if out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    data = load_rms(path)
    if data.size == 0:
        print("no rows yet")
        return
    fig, ax = plt.subplots(figsize=(9, 5))
    for k in range(1, min(10, data.shape[1])):
        if (data[:, k] > 0).any():
            ax.semilogy(data[:, 0], data[:, k], label=EQ_NAMES[k - 1])
    ax.set_xlabel("iteration")
    ax.set_ylabel("RMS residual")
    ax.legend(ncol=3, fontsize=8)
    ax.grid(True, alpha=0.3)
    ax.set_title(os.path.basename(path))
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=120)
        print(f"wrote {out}")
    else:
        plt.show()
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rms_file")
    ap.add_argument("-o", "--out", default=None, help="PNG output path")
    ap.add_argument("--watch", type=float, default=0,
                    help="re-render every N seconds (like the reference's "
                    "live gnuplot loop)")
    args = ap.parse_args()
    if args.watch:
        while True:
            render(args.rms_file, args.out)
            time.sleep(args.watch)
    render(args.rms_file, args.out)


if __name__ == "__main__":
    sys.exit(main())
