#!/usr/bin/env python3
"""Diff two bench ledger files (bench_history/*.json): per-query deltas,
sorted by absolute regression, plus totals.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--threshold 0.3]
"""
import json
import sys


def main(old_path, new_path, threshold=0.3):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((name, None, b, None))
        elif b is None:
            rows.append((name, a, None, None))
        else:
            rows.append((name, a, b, b - a))
    rows.sort(key=lambda r: -(abs(r[3]) if r[3] is not None else 1e9))
    print(f"{'query':<42} {'old':>7} {'new':>7} {'delta':>7}")
    for name, a, b, d in rows:
        if d is None:
            tag = "ADDED" if a is None else "REMOVED"
            val = b if a is None else a
            print(f"{name:<42} {'-' if a is None else f'{a:7.2f}'} "
                  f"{'-' if b is None else f'{b:7.2f}'}   {tag}")
        elif abs(d) >= threshold:
            print(f"{name:<42} {a:7.2f} {b:7.2f} {d:+7.2f}")
    print(f"\ntotal: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s), "
          f"{len(oq)} -> {len(nq)} queries")
    return 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    thr, args = 0.3, []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
                i += 1
            elif i + 1 < len(argv):
                thr = float(argv[i + 1])
                i += 2
            else:
                sys.exit("--threshold requires a value")
        elif a.startswith("--"):
            sys.exit(f"unknown flag: {a}")
        else:
            args.append(a)
            i += 1
    if len(args) != 2:
        sys.exit(__doc__.strip())
    sys.exit(main(args[0], args[1], thr))
