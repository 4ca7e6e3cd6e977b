#!/usr/bin/env python3
"""Cross-round bench comparison: per-query min deltas between two
BENCH_r*.json artifacts (or any Bench stdout capture), with the
PERF_NOTES noise convention applied — a mover must be BOTH >1.3x and
>0.4 s absolute before it is worth a quiet-window re-measurement.

Usage: python3 tools/bench_diff.py BENCH_r10.json BENCH_r11.json
Accepts either the driver artifact ({"parsed": {...}} wrapper or the
raw final line) or a log file whose last {"metric":"total"...} line is
the bench result; per-query numbers come from "queries" (final line)
merged over "detail" (earlier line) when present.
"""
import json
import sys


def load(path):
    """Return ({query: min_seconds}, total, noisy_set, {query: loadavg})."""
    text = open(path).read()
    # driver artifact wrapper: the captured stdout tail (with embedded
    # JSON lines) lives under "tail", the parsed final line under
    # "parsed" — scan both as ordinary lines
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and ("tail" in wrapper or "parsed" in wrapper):
            text = (wrapper.get("tail") or "") + "\n" + json.dumps(
                wrapper.get("parsed") or {})
    except json.JSONDecodeError:
        pass
    queries, total, noisy, loads = {}, None, set(), {}
    for line in text.splitlines():
        line = line.strip()
        i = line.find("{")
        if i < 0:
            continue
        try:
            d = json.loads(line[i:])
        except json.JSONDecodeError:
            continue
        if "parsed" in d and isinstance(d["parsed"], dict):
            d = d["parsed"]
        if d.get("metric") == "detail":
            for q, v in d.get("detail", {}).items():
                queries[q] = v["min"] if isinstance(v, dict) else v
                if isinstance(v, dict) and "load" in v:
                    loads[q] = v["load"]
        if d.get("metric") == "total" or "queries" in d:
            total = d.get("value", total)
            noisy |= set(d.get("noisy", []))
            for q, v in d.get("queries", {}).items():
                queries.setdefault(q, v)
    return queries, total, noisy, loads


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, ta, na, la = load(sys.argv[1])
    b, tb, nb, lb = load(sys.argv[2])
    shared = sorted(set(a) & set(b))
    print(f"total: {ta} -> {tb}  ({len(a)} -> {len(b)} queries, "
          f"{len(shared)} shared)")
    movers = []
    for q in shared:
        if a[q] <= 0:
            continue
        ratio, delta = b[q] / a[q], b[q] - a[q]
        if (ratio > 1.3 or ratio < 1 / 1.3) and abs(delta) > 0.4:
            movers.append((ratio, delta, q))
    movers.sort(reverse=True)
    if not movers:
        print("no movers past the 1.3x/0.4s noise floor")
    # 1-min loadavg above this when a query started means its number was
    # taken under ambient pressure (quiet sweeps run at ~0.3-2 on this
    # box; the r13 q_gini phantom started under 4+) — a mover whose
    # SLOWER side ran polluted is discounted, the delta is load, not code
    LOAD_POLLUTED = 3.0
    for ratio, delta, q in movers:
        # a mover whose min was noise-flagged (uncorroborated) in EITHER
        # artifact is auto-discounted: the bench itself says that number
        # is unmeasurable, so the delta is not evidence of a regression
        flagged = (q in na) or (q in nb)
        slow_load = (lb if delta > 0 else la).get(q, -1)
        polluted = slow_load > LOAD_POLLUTED
        tag = ("discounted" if flagged or polluted
               else "REGRESSED" if delta > 0 else "improved")
        extra = ""
        if flagged:
            sides = [s for s, n in (("old", na), ("new", nb)) if q in n]
            extra = f"  [noisy in {'+'.join(sides)}]"
        elif polluted:
            extra = f"  [load-polluted: slower side started at {slow_load:.1f}]"
        loadinfo = "".join(
            f" {s}_load={l[q]:.1f}" for s, l in (("old", la), ("new", lb))
            if q in l and l[q] >= 0)
        print(f"{tag:10s} {q:28s} {a[q]:7.2f} -> {b[q]:7.2f}  "
              f"({ratio:5.2f}x, {delta:+.2f}s){extra}{loadinfo}")
    only_new = sorted(set(b) - set(a))
    if only_new:
        slow = [q for q in only_new if b[q] > 2.0]
        print(f"new queries: {len(only_new)}"
              + (f"; >2s: {', '.join(f'{q}={b[q]:.2f}' for q in slow)}"
                 if slow else ""))


if __name__ == "__main__":
    main()
