#!/usr/bin/env python3
"""Merge per-mode ScaleProbe JSONs into one PROBE_rN.json and print
growth-exponent summaries (fit of log(sec) vs log(factor) over the
measured points) for the pair-emitting family."""
import json
import math
import sys

out_path = sys.argv[1]
inputs = sys.argv[2:]

merged = {"sf": None, "modes": {}}
for p in inputs:
    with open(p) as f:
        d = json.load(f)
    merged["sf"] = merged["sf"] or d.get("sf")
    for mode, per in d.get("modes", {}).items():
        merged["modes"].setdefault(mode, {}).update(per)

with open(out_path, "w") as f:
    json.dump(merged, f, indent=1, sort_keys=True)
print(f"wrote {out_path}")

for mode, per in sorted(merged["modes"].items()):
    factors = sorted(int(k) for k in per)
    if len(factors) < 2:
        continue
    ops = sorted({op for f2 in per.values() for op in f2})
    print(f"\n[{mode}] factors={factors}")
    for op in ops:
        pts = [(f, per[str(f)][op]["sec"], per[str(f)][op]["rows"])
               for f in factors if op in per[str(f)]
               and per[str(f)][op]["rows"] >= 0]
        if len(pts) < 2:
            print(f"  {op}: insufficient points")
            continue
        lo, hi = pts[0], pts[-1]
        # growth exponent: sec ~ factor^e over the measured span
        e = (math.log(hi[1] / lo[1]) / math.log(hi[0] / lo[0])
             if lo[1] > 0 else float("nan"))
        rows = "/".join(str(p[2]) for p in pts)
        secs = "/".join(f"{p[1]:.2f}" for p in pts)
        print(f"  {op}: sec {secs}  exp={e:+.2f}  rows {rows}")
