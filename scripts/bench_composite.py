#!/usr/bin/env python
"""Assemble the committed min-of-N bench composite (r9-r13 protocol).

Reads per-run BENCHDETAIL copies (plans/r13/BENCHDETAIL_final_run*.json),
takes the per-query MIN wall and per-query MAX warmup_s across runs, and
writes the composite to BENCHDETAIL_sf0.1.json (+ BENCHDETAIL.json).

Usage: python scripts/bench_composite.py run1.json run2.json ... [--write]
"""

from __future__ import annotations

import json
import math
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    write = "--write" in sys.argv
    runs = [json.load(open(p)) for p in paths]
    base = json.loads(json.dumps(runs[-1]))  # deep copy of the last run

    names = set()
    for r in runs:
        names.update(r["queries"])
    composite = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        composite[n] = min(vals)
    base["queries"] = composite
    base["value"] = round(sum(composite.values()), 4)

    warm = {}
    for r in runs:
        for n, w in (r.get("warmup_s") or {}).items():
            warm[n] = max(warm.get(n, 0.0), w)
    if warm:
        base["warmup_s"] = {k: round(v, 4) for k, v in sorted(warm.items())}

    # geomean vs the r1 contract, matching bench.py's computation
    with open(os.path.join(HERE, "BENCH_r01.json")) as f:
        r1 = (json.load(f).get("parsed") or {}).get("queries") or {}
    ratios = [
        composite[n] / r1[n]
        for n in composite
        if n in r1 and r1[n] and composite[n]
    ]
    if ratios:
        base["geomean_vs_r1"] = round(
            math.exp(sum(math.log(x) for x in ratios) / len(ratios)), 4
        )
        worst = max(
            ((composite[n] / r1[n], n) for n in composite if n in r1 and r1[n]),
        )
        base["worst_vs_r1"] = {"query": worst[1], "ratio": round(worst[0], 4)}

    print(json.dumps({k: base[k] for k in ("value", "geomean_vs_r1") if k in base}))
    top = sorted(composite.items(), key=lambda x: -x[1])[:15]
    for n, v in top:
        print(f"{n:28s} {v:.3f}")
    if write:
        for out in ("BENCHDETAIL_sf0.1.json", "BENCHDETAIL.json"):
            with open(os.path.join(HERE, out), "w") as f:
                json.dump(base, f, indent=1)
        print("written")


if __name__ == "__main__":
    main()
