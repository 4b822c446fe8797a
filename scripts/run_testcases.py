#!/usr/bin/env python
"""Run the reference's shipped TestCases end-to-end (the `make test`
equivalent, Makefile:105-119) and report final fields + timings."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TESTCASES = "/root/reference/OpenHyperFLOW2D/TestCases"


def main():
    cases = sys.argv[1:] or ["ObliqueShock", "Step", "Wedge"]
    from openhyperflow2d_tpu.cli import main as cli_main
    for name in cases:
        deck = os.path.join(TESTCASES, name + ".dat")
        out = f"/tmp/hf2d_run_{name}"
        os.makedirs(out, exist_ok=True)
        print(f"=== {name} ===", flush=True)
        t0 = time.time()
        rc = cli_main([deck, "--outdir", out])
        print(f"{name}: rc={rc} wall={time.time() - t0:.0f}s -> {out}")


if __name__ == "__main__":
    main()
