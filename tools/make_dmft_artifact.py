#!/usr/bin/env python
"""Assemble DMFT_BENCH_r{N}.json from a completed bench_dmft.py run.

Usage: python tools/make_dmft_artifact.py <stdout-file> <stderr-file> \
           <round> [out.json]

Parses the single JSON line printed by bench_dmft.py plus the per-stage
[timer] lines and the convergence trail, and writes a self-describing
artifact (BASELINE metric 2: time-to-converged DMFT loop on the 2x2
plaquette; anchor /root/reference/drivers/cdn_hm_2dsquare.f90:119-198).
"""
import json
import re
import subprocess
import sys


def main():
    out_file, err_file, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    dst = (sys.argv[4] if len(sys.argv) > 4
           else f"DMFT_BENCH_r{rnd:02d}.json")
    out = open(out_file, "rb").read().decode("utf-8", "replace")
    err = open(err_file, "rb").read().decode("utf-8", "replace")

    result = None
    for ln in out.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            result = json.loads(ln)
    if result is None:
        print("no result JSON found — bench did not complete", file=sys.stderr)
        sys.exit(2)

    stages = {}
    for name, secs in re.findall(r"\[timer\] (\w+): ([0-9.]+)s", out):
        stages.setdefault(name, []).append(float(secs))
    trail = re.findall(
        r"error=([0-9.einf+-]+) chi2=([0-9.e+-]+) dens=([0-9.]+) "
        r"egs=(-?[0-9.]+)", err)
    final = re.search(
        r"converged=(\w+) iters=(\d+) err=([0-9.e+-]+) egs=(-?[0-9.]+) "
        r"dens=([0-9.]+) device=([\w\- ]+)", err)

    art = dict(result)
    art.update({
        "round": rnd,
        "what": "time-to-converged CDMFT loop, 2x2 Hubbard plaquette + 2 "
                "replica baths (Ns=12), U=4, beta=100, mixed precision, "
                "one real TPU chip (BASELINE metric 2)",
        "anchor": "/root/reference/drivers/cdn_hm_2dsquare.f90:119-198",
        "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True,
                              text=True).stdout.strip(),
        "stages_s": {k: [round(x, 2) for x in v]
                     for k, v in stages.items()},
        "per_loop_error_trail": [float(t[0]) if t[0] != "inf" else None
                                 for t in trail],
    })
    if final:
        art.update({
            "converged": final.group(1) == "True",
            "iterations": int(final.group(2)),
            "final_error": float(final.group(3)),
            "egs": float(final.group(4)),
            "density": float(final.group(5)),
            "device": final.group(6).strip(),
        })
    with open(dst, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"wrote {dst}")
    print(json.dumps(art)[:400])


if __name__ == "__main__":
    main()
