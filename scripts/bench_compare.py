#!/usr/bin/env python3
"""Like-for-like comparison of two graft.Bench artifacts.

Usage: bench_compare.py OLD.json NEW.json [--threshold 1.5]

Implements the repo's bench-attribution protocol (NOTES_r09.md): the
same code measured in different machine windows differs by a uniform
multiplicative factor (round 9 measured 1.20x median across 113
untouched queries — host-level VM contention invisible to guest
load), so raw per-query deltas cannot be read as regressions.

The comparison therefore reports, in order of authority:
  1. the calib ratio (each artifact's fixed CPU-bound window scalar,
     present from round 9 on) — the direct window measurement;
  2. the median per-query ratio over common queries — the robust
     window estimate when calib is absent (uniform inflation moves
     the median; real regressions in a few queries do not);
  3. per-query ratios normalized by the window estimate — only a
     query whose NORMALIZED ratio exceeds --threshold is flagged,
     and the repo's protocol still requires two isolated re-runs
     before treating a flag as real (see graft.Bench scaladoc).
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        sys.exit(f"{path}: not a bench artifact (no 'queries' map)")
    return d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        sys.exit(__doc__)
    threshold = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a
                              else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    qo = {k: v for k, v in old["queries"].items() if v > 0}
    qn = {k: v for k, v in new["queries"].items() if v > 0}
    common = sorted(set(qo) & set(qn))
    print(f"old: {old.get('value'):8.1f} s  {len(qo):3d} queries  "
          f"calib {old.get('calib', 'n/a')}  ({args[0]})")
    print(f"new: {new.get('value'):8.1f} s  {len(qn):3d} queries  "
          f"calib {new.get('calib', 'n/a')}  ({args[1]})")
    added, removed = sorted(set(qn) - set(qo)), sorted(set(qo) - set(qn))
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{q} {qn[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    if not common:
        sys.exit("no common queries — nothing to compare")

    so, sn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(f"\nlike-for-like ({len(common)} common): "
          f"{sn:.1f} / {so:.1f} = {sn / so:.3f}x raw")

    ratios = sorted(qn[q] / qo[q] for q in common if qo[q] >= 0.2)
    med = statistics.median(ratios) if ratios else 1.0
    calib_ratio = None
    if "calib" in old and "calib" in new and old["calib"] > 0:
        calib_ratio = new["calib"] / old["calib"]
        print(f"window estimate: calib ratio {calib_ratio:.3f}, "
              f"median per-query ratio {med:.3f} "
              f"(agreement is the sanity check)")
    else:
        print(f"window estimate: median per-query ratio {med:.3f} "
              f"(no calib in one artifact — pre-round-9)")
    window = calib_ratio if calib_ratio is not None else med
    print(f"like-for-like window-normalized: {sn / so / window:.3f}x")

    flagged = [(q, qn[q] / qo[q] / window) for q in common
               if qo[q] >= 0.2 and qn[q] / qo[q] / window > threshold
               and qn[q] - qo[q] > 0.3]
    if flagged:
        print(f"\nqueries > {threshold}x after window normalization "
              f"(re-run isolated twice before believing):")
        for q, r in sorted(flagged, key=lambda x: -x[1]):
            print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f} s "
                  f"({r:.2f}x normalized)")
    else:
        print(f"\nno query exceeds {threshold}x after window "
              f"normalization")


if __name__ == "__main__":
    main()
