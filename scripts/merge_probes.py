#!/usr/bin/env python3
"""Merge per-mode ScaleProbe JSONs into one PROBE_rN.json and print
growth-exponent summaries (least-squares fit of log(sec) vs log(factor)
over ALL measured points, so a non-monotone middle point — e.g. a
cache-warm run — shows up as a poor fit rather than vanishing into an
endpoint slope) for the pair-emitting family."""
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
        m = merged["modes"].setdefault(mode, {})
        # deep-merge per factor: a shallow update() would let a later
        # input's factor dict CLOBBER earlier inputs' ops at the same
        # factor (bit round 10 when merging per-op targeted probes)
        for factor, ops in per.items():
            m.setdefault(factor, {}).update(ops)

with open(out_path, "w") as f:
    json.dump(merged, f, indent=1, sort_keys=True)
print(f"wrote {out_path}")

import re

for mode, per in sorted(merged["modes"].items()):
    factors = sorted(int(k) for k in per)
    if len(factors) < 2:
        continue
    ops = sorted({op for f2 in per.values() for op in f2})
    # the `queries` mode emits one entry per scaled query volume
    # (op_qNN at factor NN/10) — fold them back to one op so the
    # growth fit runs over the nq axis instead of reporting
    # "insufficient points" per distinct name
    # (queries mode only — elsewhere an op whose real name happens to
    # end in _q<digits> must not be folded with unrelated siblings)
    folded = {}
    for op in ops:
        m = re.fullmatch(r"(.+)_q(\d+)", op) if mode == "queries" else None
        folded.setdefault(m.group(1) if m else op, []).append(op)
    print(f"\n[{mode}] factors={factors}")
    for base, names in sorted(folded.items()):
        op = base if len(names) > 1 else names[0]
        pts = [(f, per[str(f)][nm]["sec"], per[str(f)][nm]["rows"])
               for f in factors for nm in names if nm in per[str(f)]
               and per[str(f)][nm]["rows"] >= 0]
        if len(pts) < 2:
            print(f"  {op}: insufficient points")
            continue
        # growth exponent: least-squares slope of log(sec) on
        # log(factor) over every measured point (not just endpoints)
        lpts = [(math.log(f), math.log(s)) for f, s, _ in pts if s > 0]
        if len(lpts) >= 2:
            n = len(lpts)
            mx = sum(x for x, _ in lpts) / n
            my = sum(y for _, y in lpts) / n
            sxx = sum((x - mx) ** 2 for x, _ in lpts)
            e = (sum((x - mx) * (y - my) for x, y in lpts) / sxx
                 if sxx > 0 else float("nan"))
        else:
            e = float("nan")
        rows = "/".join(str(p[2]) for p in pts)
        secs = "/".join(f"{p[1]:.2f}" for p in pts)
        print(f"  {op}: sec {secs}  exp={e:+.2f}  rows {rows}")
