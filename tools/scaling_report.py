#!/usr/bin/env python3
"""Scale-stress report: compare two Bench detail lines (same entry set,
different SF dirs) and print per-entry and per-family scaling factors.

Usage: scaling_report.py <bench_small.json> <bench_large.json> [size_ratio]

size_ratio (default 10) is the data growth between the two runs; the
"exp" column is log(t_large/t_small)/log(size_ratio) — 1.0 = perfectly
linear in data size, 0 = constant (setup-dominated), 2.0 = quadratic.
Entries faster than FLOOR seconds in BOTH runs are constant-cost noise
(JVM/scheduler floor) and are reported in the family rollup but not
flagged individually.
"""
import json, math, sys
from collections import defaultdict

FLOOR = 0.15  # below this in both runs, timing is scheduler floor, not data cost


def load(p):
    with open(p) as f:
        return json.loads(f.readline())


def family(name):
    import re
    m = re.match(r"([a-z]+)", name)
    head = m.group(1)
    if head == "q":
        n = int(re.match(r"q(\d+)", name).group(1))
        return "q-dashboard" if n <= 17 else "q-analytic"
    return {"o": "ops", "d": "dedup", "s": "ann", "t": "text", "m": "multimodal",
            "mt": "maintenance", "st": "streaming", "p": "pipeline",
            "x": "plans"}.get(head, head)


def main():
    small, large = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, ql = small["queries"], large["queries"]
    # Per-entry measurement provenance: an entry in "insuite" was
    # fresh-JVM corrected in that run; in "fresh_failed" its correction
    # was attempted but the in-suite value shipped. If provenance
    # differs BETWEEN the two runs, the measured contamination factor
    # (~2-2.5x for streaming entries) masquerades as a scaling delta —
    # flag it (~prov) instead of letting the exp column lie.
    ps, pl = set(small.get("insuite", {})), set(large.get("insuite", {}))
    failed = set(small.get("fresh_failed", [])) | set(large.get("fresh_failed", []))
    rows = []
    for k in sorted(qs):
        a, b = qs[k], ql.get(k, -1)
        if a < 0 or b < 0:
            rows.append((k, a, b, None))
            continue
        exp = math.log(max(b, 1e-4) / max(a, 1e-4)) / math.log(ratio)
        rows.append((k, a, b, exp))
    fam = defaultdict(lambda: [0.0, 0.0])
    print(f"{'entry':32s} {'t_small':>8s} {'t_large':>8s} {'ratio':>7s} {'exp':>6s}")
    for k, a, b, exp in rows:
        f = fam[family(k)]
        if a >= 0: f[0] += a
        if b >= 0: f[1] += b
        if exp is None:
            print(f"{k:32s} {a:8.3f} {b:8.3f}    FAILED")
        elif not (a < FLOOR and b < FLOOR):
            flag = " <<" if exp > 1.15 and b > 1.0 else ""
            if (k in ps) != (k in pl) or k in failed:
                flag += " ~prov"
            print(f"{k:32s} {a:8.3f} {b:8.3f} {b/max(a,1e-4):7.2f} {exp:6.2f}{flag}")
    if failed:
        print(f"\nfresh_failed (in-suite values shipped): {sorted(failed)}")
    print("\nfamily rollup (sum of medians):")
    print(f"{'family':14s} {'t_small':>8s} {'t_large':>8s} {'ratio':>7s} {'exp':>6s}")
    for f in sorted(fam):
        a, b = fam[f]
        exp = math.log(max(b, 1e-4) / max(a, 1e-4)) / math.log(ratio)
        print(f"{f:14s} {a:8.2f} {b:8.2f} {b/max(a,1e-4):7.2f} {exp:6.2f}")
    ta, tb = small["value"], large["value"]
    print(f"\ntotal {ta:.1f}s -> {tb:.1f}s  ratio {tb/ta:.2f}  "
          f"exp {math.log(tb/ta)/math.log(ratio):.2f}")


if __name__ == "__main__":
    main()
