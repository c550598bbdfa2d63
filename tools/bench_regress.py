#!/usr/bin/env python3
"""Cross-round bench regression gate.

Usage: python3 tools/bench_regress.py <new BENCH_FULL.json> <old BENCH_FULL.json>
           [--threshold 1.5] [--abs-floor 1.0]

Diffs two full-surface bench artifacts (graft.Bench detail dumps)
per-query on min-of-2 times, normalized for session drift by the
CANARY battery each artifact carries: the canaries are five unchanged
plans timed at session start/mid/end, so the ratio of the two rounds'
mean canary levels measures host/JIT/session speed difference on
identical work — dividing it out leaves only code-driven change.

A query REGRESSES when drift-normalized new/old > threshold AND the
normalized absolute slowdown exceeds abs-floor seconds (sub-second
blips on tiny queries are noise, not plan changes). Exit code 1 on any
regression — wire it after each full bench run; the judge's own gate
is the same shape (>1.5x-and-1s, by hand until this tool).
"""
import json, sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d or not isinstance(d["queries"], dict):
        sys.exit(f"{path}: no per-query detail map — run the full bench "
                 "(SPARK_GRAFT_BENCH_DETAIL=1), not the driver subset")
    qs = {k: (v["min"] if isinstance(v, dict) else float(v))
          for k, v in d["queries"].items()}
    can = d.get("canary", {})
    level = (sum(can.values()) / len(can)) if can else None
    return qs, level, d.get("value")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=")[1] for a in sys.argv[1:]
            if a.startswith("--") and "=" in a}
    thr = float(opts.get("--threshold", 1.5))
    floor = float(opts.get("--abs-floor", 1.0))
    if len(args) != 2:
        sys.exit(__doc__)
    new_qs, new_can, new_total = load(args[0])
    old_qs, old_can, old_total = load(args[1])

    # session-drift normalization: >1 means the NEW session ran slower
    # on unchanged plans; divide new times by it before comparing
    norm = (new_can / old_can) if (new_can and old_can) else 1.0

    common = sorted(set(new_qs) & set(old_qs))
    added = sorted(set(new_qs) - set(old_qs))
    removed = sorted(set(old_qs) - set(new_qs))

    regressions, improvements = [], []
    for q in common:
        n, o = new_qs[q] / norm, old_qs[q]
        if o <= 0:
            continue
        r = n / o
        if r > thr and (n - o) > floor:
            regressions.append((q, old_qs[q], new_qs[q], r))
        elif r < 1 / thr and (o - n) > floor:
            improvements.append((q, old_qs[q], new_qs[q], r))

    tot_new = sum(new_qs[q] for q in common) / norm
    tot_old = sum(old_qs[q] for q in common)
    print(f"canary levels: new={new_can:.3f}s old={old_can:.3f}s "
          f"-> drift norm {norm:.3f}" if new_can and old_can
          else "canary levels missing -> no drift normalization")
    print(f"common surface: {len(common)} queries, "
          f"{tot_old:.1f}s -> {tot_new:.1f}s normalized "
          f"({tot_new / tot_old:.2%})")
    if added:
        print(f"new queries ({len(added)}): "
              f"{sum(new_qs[q] for q in added):.1f}s combined: "
              + ", ".join(added))
    if removed:
        print(f"REMOVED queries ({len(removed)}): " + ", ".join(removed))
    for q, o, n, r in sorted(improvements, key=lambda t: t[3]):
        print(f"  faster : {q}  {o:.2f}s -> {n:.2f}s raw "
              f"({r:.2f}x normalized)")
    for q, o, n, r in sorted(regressions, key=lambda t: -t[3]):
        print(f"  REGRESS: {q}  {o:.2f}s -> {n:.2f}s raw "
              f"({r:.2f}x normalized)")
    print(f"== {len(regressions)} regressions "
          f"(>{thr}x and >{floor}s, drift-normalized) ==")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
