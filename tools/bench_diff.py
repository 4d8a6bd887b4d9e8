#!/usr/bin/env python3
"""Diff two bench ledger files (bench_history/*.json): per-query deltas,
sorted by absolute regression, plus totals.

A delta only counts as SIGNAL when it clears BOTH the absolute
threshold (seconds) and the relative threshold (fraction of the old
time) — round-2 showed single-run timings drifting +/-50% on unchanged
code, so small-absolute or small-relative moves are suppressed as
noise. Ledgers written by the min-of-N bench (the `iterations` field)
are already far less noisy; the thresholds guard the residual.

A query whose value is null FAILED in that run and is flagged, never
summed.

--gate turns the diff into a CI-style regression gate: exit 1 when any
query's min regresses more than --gate-factor (default 2x) vs the old
ledger AND lands above --gate-floor seconds (default 1.0 — a 0.05s ->
0.15s move is scheduler noise, not a regression), or when the new run
has FAILED queries. Run it against the last committed ledger before
handing the driver an official bench.

Usage: python3 tools/bench_diff.py OLD.json NEW.json
           [--threshold 0.3] [--rel-threshold 0.25]
           [--gate] [--gate-factor 2.0] [--gate-floor 1.0]
"""
import json
import sys


def main(old_path, new_path, threshold=0.3, rel=0.25, gate=False,
         gate_factor=2.0, gate_floor=1.0):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        in_old, in_new = name in oq, name in nq
        a, b = oq.get(name), nq.get(name)
        if not in_old or not in_new or a is None or b is None:
            rows.append((name, a, b, None, in_old, in_new))
        else:
            rows.append((name, a, b, b - a, True, True))
    rows.sort(key=lambda r: -(abs(r[3]) if r[3] is not None else 1e9))
    print(f"{'query':<42} {'old':>7} {'new':>7} {'delta':>7}")
    suppressed = 0
    for name, a, b, d, in_old, in_new in rows:
        if d is None:
            if not in_old:
                tag = "ADDED"
            elif not in_new:
                tag = "REMOVED"
            else:
                tag = "FAILED"
            fmt = lambda v, present: (
                f"{v:7.2f}" if v is not None else ("   FAIL" if present else "      -"))
            print(f"{name:<42} {fmt(a, in_old)} {fmt(b, in_new)}   {tag}")
        elif abs(d) >= threshold and abs(d) >= rel * a:
            print(f"{name:<42} {a:7.2f} {b:7.2f} {d:+7.2f}")
        elif abs(d) >= threshold:
            suppressed += 1
    if suppressed:
        print(f"... {suppressed} deltas >= {threshold}s suppressed as noise "
              f"(< {rel:.0%} relative change)")
    print(f"\ntotal: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s), "
          f"{len(oq)} -> {len(nq)} queries")
    new_failed = []
    for side, ledger in (("old", old), ("new", new)):
        failed = ledger.get("failed") or [
            k for k, v in ledger["queries"].items() if v is None]
        if failed:
            print(f"{side} FAILED queries (excluded from total): "
                  + ", ".join(sorted(failed)))
        if side == "new":
            new_failed = failed
    if gate:
        regressions = [
            (name, a, b) for name, a, b, d, in_old, in_new in rows
            if d is not None and b > gate_floor and b > gate_factor * a]
        ok = not regressions and not new_failed
        for name, a, b in regressions:
            print(f"GATE: {name} regressed {b / a:.1f}x "
                  f"({a:.2f}s -> {b:.2f}s)")
        if new_failed:
            print(f"GATE: new run has failed queries: "
                  + ", ".join(sorted(new_failed)))
        print("GATE: PASS" if ok else "GATE: FAIL")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    thr, rel, args = 0.3, 0.25, []
    gate, gate_factor, gate_floor = False, 2.0, 1.0
    i = 0

    def take(flag, i):
        a = argv[i]
        if "=" in a:
            return float(a.split("=", 1)[1]), i + 1
        if i + 1 < len(argv):
            return float(argv[i + 1]), i + 2
        sys.exit(f"{flag} requires a value")

    while i < len(argv):
        a = argv[i]
        if a.startswith("--rel-threshold"):
            rel, i = take("--rel-threshold", i)
        elif a.startswith("--threshold"):
            thr, i = take("--threshold", i)
        elif a.startswith("--gate-factor"):
            gate_factor, i = take("--gate-factor", i)
        elif a.startswith("--gate-floor"):
            gate_floor, i = take("--gate-floor", i)
        elif a == "--gate":
            gate, i = True, i + 1
        elif a.startswith("--"):
            sys.exit(f"unknown flag: {a}")
        else:
            args.append(a)
            i += 1
    if len(args) != 2:
        sys.exit(__doc__.strip())
    sys.exit(main(args[0], args[1], thr, rel, gate, gate_factor, gate_floor))
