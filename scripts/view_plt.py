"""Field viewer for Tecplot POINT snapshots — the viewplt.sh equivalent.

The reference opens gnuplot with `splot ... u 1:2:13 t 'Mach'`
(TestCases/*_Res.dat).  This renders any variable of a <Project>.plt
(ours or the reference's — same format) as a pcolormesh PNG.

Usage:
    python scripts/view_plt.py Channel.plt [--var Mach] [-o field.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

VARS = ["X", "Y", "U", "V", "T", "p", "Rho", "Y_fuel", "Y_ox", "Y_cp",
        "Y_i", "mu_t_mu", "Mach", "l_min", "y_plus", "Cp"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("plt_file")
    ap.add_argument("--var", default="Mach", choices=VARS[2:])
    ap.add_argument("--zone", type=int, default=-1,
                    help="snapshot index (-1 = last)")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--nx", type=int, default=0,
                    help="grid X size (0 = infer from ZONE header)")
    ap.add_argument("--ny", type=int, default=0)
    args = ap.parse_args()

    import re

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nx, ny = args.nx, args.ny
    if not (nx and ny):
        with open(args.plt_file) as f:
            for line in f:
                m = re.search(r"I=\s*(\d+)\s*,?\s*J=\s*(\d+)", line)
                if m:
                    nx, ny = int(m.group(1)), int(m.group(2))
                    break
    if not (nx and ny):
        raise SystemExit("could not infer grid size; pass --nx/--ny")

    from openhyperflow2d_tpu.io_out.tecplot import read_tecplot_zone
    zones = read_tecplot_zone(args.plt_file, nx, ny, zone=args.zone)
    key = {"mu_t_mu": "mu_t_mu"}.get(args.var, args.var)
    # read_tecplot_zone returns the standard variable dict keyed by name
    field = zones[key] if key in zones else zones[args.var]

    fig, ax = plt.subplots(figsize=(9, 5))
    pm = ax.pcolormesh(field.T, cmap="turbo", shading="auto")
    fig.colorbar(pm, ax=ax, label=args.var)
    ax.set_aspect("equal")
    ax.set_title(f"{os.path.basename(args.plt_file)} — {args.var}")
    out = args.out or f"{os.path.splitext(args.plt_file)[0]}-{args.var}.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
