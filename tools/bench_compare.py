#!/usr/bin/env python3
"""Drift-normalized bench comparison (r14, VERDICT r13 #2).

Compares two BENCH_FULL.json artifacts:

    python3 tools/bench_compare.py OLD.json NEW.json [--threshold 1.25]

The box drifts under load (r13 measured a uniform +24% on untouched
entries), so a raw per-entry ratio confounds machine state with code
change. This tool separates them:

  1. per shared entry: ratio = new_best / old_best (the committed
     `queries` values are best-of-N minimums — Bench.scala's headline
     protocol — NOT medians)
  2. drift factor = MEDIAN of those ratios (a code change moves a few
     entries; load moves all of them — the median ratio IS the load)
  3. normalized ratio = ratio / drift factor; entries beyond the
     threshold in either direction are flagged as genuine regressions /
     improvements

When both artifacts carry `spread` fields (sorted raw rep timings per
entry; r15+ artifacts commit one element per rep actually run, r14
committed [min, median, max]), an entry is only flagged if its
normalized regression also exceeds the relative spread observed for it
(noise floor) — a slow entry whose own min..max straddles the delta is
reported as within-noise. Entries with a single-element spread ran once
and carry no noise-floor information.

Exit code: 0 if no regression flagged, 1 otherwise (CI-friendly).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    spread = d.get("spread", {})
    return qs, spread, d


def main():
    argv = sys.argv[1:]
    thr = 1.25
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                i += 1
                thr = float(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old_q, old_s, old_d = load(args[0])
    new_q, new_s, new_d = load(args[1])
    shared = sorted(set(old_q) & set(new_q))
    if not shared:
        print("no shared entries")
        sys.exit(2)
    ratios = {k: new_q[k] / old_q[k] for k in shared if old_q[k] > 0}
    rs = sorted(ratios.values())
    drift = rs[len(rs) // 2]
    old_total = sum(old_q[k] for k in shared)
    new_total = sum(new_q[k] for k in shared)
    print(f"shared entries: {len(shared)}")
    print(f"raw shared-total: {old_total:.1f}s -> {new_total:.1f}s "
          f"({new_total / old_total:.3f}x)")
    print(f"machine-drift factor (median per-entry ratio): {drift:.3f}x")
    print(f"drift-normalized shared-total: "
          f"{new_total / old_total / drift:.3f}x")

    def noise_floor(k):
        # widest demonstrated run-to-run swing (median over best) seen for
        # this entry in either artifact's committed spread; spreads are
        # sorted raw rep timings (any length >= 2 carries information)
        floors = [1.0]
        for s, q in ((old_s, old_q), (new_s, new_q)):
            if k in s and len(s[k]) >= 2 and s[k][0] > 0:
                floors.append(s[k][len(s[k]) // 2] / s[k][0])
        return max(floors)

    regressions, improvements = [], []
    for k in shared:
        if old_q[k] <= 0:
            continue
        norm = ratios[k] / drift
        if norm > thr and norm > noise_floor(k):
            regressions.append((norm, k))
        elif norm < 1 / thr:
            improvements.append((norm, k))
    for norm, k in sorted(regressions, reverse=True):
        print(f"REGRESSION {k}: {old_q[k]:.2f}s -> {new_q[k]:.2f}s "
              f"(normalized {norm:.2f}x, noise floor {noise_floor(k):.2f}x)")
    for norm, k in sorted(improvements):
        print(f"improvement {k}: {old_q[k]:.2f}s -> {new_q[k]:.2f}s "
              f"(normalized {norm:.2f}x)")
    if not regressions:
        print("no drift-normalized regressions above "
              f"{thr}x (and noise floors)")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
