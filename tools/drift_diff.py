#!/usr/bin/env python3
"""Unchanged-query drift diff between two bench artifacts (the r18+
closing discipline): compares per-query medians and prints every
common canonical query whose time moved more than RATIO in either
direction, plus a summary count. Accepts either a raw bench line
(target/bench_full.json) or a BENCH_r*_local.json wrapper ({"parsed":
...}).

Usage: python3 tools/drift_diff.py OLD NEW [RATIO=1.3]
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    qs = doc.get("queries", {})
    # drop per-run samples AND one-shot cold entries — cold timings
    # (JIT + fixture build) routinely swing past any drift ratio and
    # would inflate the report with non-drift
    return {k: v for k, v in qs.items()
            if isinstance(v, (int, float)) and v >= 0
            and not re.search(r"_run\d+$", k) and not k.endswith("_cold")}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(old) & set(new))
    drifted = []
    for k in common:
        a, b = old[k], new[k]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r > ratio or r < 1 / ratio:
            drifted.append((k, a, b, r))
    drifted.sort(key=lambda t: -abs(t[3] - 1))
    print(f"common={len(common)} drifted_past_{ratio}x={len(drifted)}")
    for k, a, b, r in drifted:
        print(f"  {k}: {a:.3f} -> {b:.3f} ({r:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new queries ({len(only_new)}): " + ", ".join(only_new))


if __name__ == "__main__":
    main()
