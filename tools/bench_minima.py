#!/usr/bin/env python3
"""Recompute the cross-window per-query minima — the bench number of
record on this throttling host (BASELINE.md round 13+) — from the
persisted window JSONs in bench/.

Usage:
    python3 tools/bench_minima.py bench/bench_r16_w*.json
    python3 tools/bench_minima.py --vs bench/bench_r15_w*.json -- bench/bench_r16_w*.json

Each window file is one graft.Bench output object
({"metric","value","queries":{name: sec},...}). The minima total is
sum over queries of the minimum per-query time across windows; a
query missing from some windows (added mid-round) contributes the
minimum over the windows that ran it. With --vs, also prints the
median per-query ratio of the target minima against the comparison
minima and any query regressed > 1.3x at > 0.5 s.
"""
import json
import statistics
import sys


def minima(paths):
    wins = [json.load(open(p))["queries"] for p in paths]
    keys = set()
    for w in wins:
        keys |= set(w)
    return {k: min(w[k] for w in wins if k in w) for k in keys}


def main(argv):
    if "--vs" in argv:
        if "--" not in argv:
            print("usage: --vs <base windows...> -- <target windows...>")
            return 1
        i = argv.index("--vs")
        sep = argv.index("--")
        base_paths, target_paths = argv[i + 1:sep], argv[sep + 1:]
    else:
        base_paths, target_paths = [], argv
    if not target_paths:
        print(__doc__)
        return 1
    tgt = minima(target_paths)
    print(f"windows={len(target_paths)} queries={len(tgt)} "
          f"minima_total={sum(tgt.values()):.1f}s")
    if base_paths:
        base = minima(base_paths)
        common = sorted(set(tgt) & set(base))
        ratios = sorted((tgt[k] / base[k], k) for k in common if base[k] > 0)
        if not ratios:
            print(f"vs {len(base_paths)}-window base: no common queries "
                  "with positive base minima — no ratio report")
            return 0
        med = statistics.median(r for r, _ in ratios)
        print(f"vs {len(base_paths)}-window base ({len(base)} queries, "
              f"{sum(base.values()):.1f}s): common={len(common)} "
              f"median_ratio={med:.3f}")
        bad = [(k, tgt[k], base[k], r) for r, k in ratios
               if r > 1.3 and tgt[k] > 0.5]
        if bad:
            print("regressed >1.3x at >0.5s:")
            for k, t, b, r in bad:
                print(f"  {k}: {t:.2f}s vs {b:.2f}s = {r:.2f}x")
        else:
            print("regressed >1.3x at >0.5s: none")
        new = sorted(set(tgt) - set(base))
        if new:
            print("new queries:", {k: round(tgt[k], 2) for k in new})
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
