#!/usr/bin/env python
"""Wrap the one-line JSON emitted by bench_dmft.py into the round artifact
(DMFT_BENCH_r05.json) with provenance metadata, keeping the bench's own
schema intact (``vs_baseline`` = performance ratio; physics in named
fields — VERDICT r4 item 6)."""
import json
import subprocess
import sys


def main(src: str, dst: str):
    line = None
    with open(src) as fh:
        for ln in fh:
            ln = ln.strip()
            if ln.startswith("{") and '"metric"' in ln:
                line = ln
    if line is None:
        sys.exit(f"no JSON line found in {src}")
    out = json.loads(line)
    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    meta = {
        "round": 5,
        "what": ("time-to-converged CDMFT loop, 2x2 Hubbard plaquette + 2 "
                 "replica baths (Ns=12), U=4, beta=100, mixed precision, one "
                 "real TPU chip over the axon tunnel (BASELINE metric 2); "
                 "round-5 adds per-stage solver-issued dispatch counts and "
                 "warm per-loop stage breakdown"),
        "anchor": "/root/reference/drivers/cdn_hm_2dsquare.f90:119-198",
        "git": git,
        "device": "TPU v5 lite (axon tunnel)",
    }
    merged = {**{k: out[k] for k in ("metric", "value", "unit",
                                     "vs_baseline")}, **meta,
              **{k: v for k, v in out.items()
                 if k not in ("metric", "value", "unit", "vs_baseline")}}
    with open(dst, "w") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")
    print(f"wrote {dst}: {out['value']} {out['unit']} "
          f"(vs_baseline {out['vs_baseline']})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dmft_r05.out",
         sys.argv[2] if len(sys.argv) > 2 else "DMFT_BENCH_r05.json")
