#!/usr/bin/env python3
"""Cross-SF shape check for the scale chain (VERDICT r16 item #6).

The round-over-round 2x protocol compares same-SF readings, so it is
blind to a row that is stable at every SF but superlinear BETWEEN SFs
(the mm_resize pattern: ~22x wall for 10x data in two consecutive
rounds' chains, invisible to the same-SF comparison). This check walks
one round's chain artifacts and flags any row whose sfN/sfN-1 wall
ratio exceeds the data ratio x 1.5 at two consecutive chain points.

Usage:
  shape_check.py SF:FILE [SF:FILE ...]
e.g.
  shape_check.py 0.1:BENCH_DETAIL_sf0.1.json 1:BENCH_DETAIL_sf1.json \
      3:BENCH_DETAIL_sf3.json 10:BENCH_DETAIL_sf10.json

Rows with a DESIGNED superlinear exponent (documented in SURVEY /
operator scaladoc) are held to data_ratio**exponent * 1.5 instead, so
the check flags defects, not design. Rows faster than MIN_SECS at the
smaller SF are skipped for that pair (sub-second readings are JVM
noise, not shape).

Output: one JSON object on stdout — per-pair ratios for every flagged
row, plus `flagged` (the adjudication list: rows over threshold at
>= 2 consecutive pairs). Exit 0 always; the chain protocol says
flagged rows get isolated min-of-2 re-reads, not an automatic fail.
"""
import json
import sys

MIN_SECS = 1.0
SLACK = 1.5
# designed complexity exponents (wall ~ data**exponent): see the
# operator scaladocs; everything else is expected ~linear.
DESIGNED = {
    "cluster_kmeans": 1.5,       # two-level k-means, O(N^1.5)
    "dedup_blocking_recall": 1.5, # embeds the kmeans constituent
    "dedup_semantic": 1.5,        # ditto
}


def main(argv):
    points = []
    for a in argv:
        sf, path = a.split(":", 1)
        with open(path) as f:
            d = json.load(f)
        points.append((float(sf), path, d.get("queries", {})))
    points.sort(key=lambda p: p[0])
    if len(points) < 2:
        print(json.dumps({"error": "need >= 2 chain points"}))
        return
    over = {}    # row -> list of consecutive-pair flags (True/False)
    detail = {}  # row -> per-pair record
    for (sfa, pa, qa), (sfb, pb, qb) in zip(points, points[1:]):
        data_ratio = sfb / sfa
        for row in sorted(set(qa) & set(qb)):
            ta, tb = qa[row], qb[row]
            if not isinstance(ta, (int, float)) or not isinstance(tb, (int, float)):
                continue
            pair = f"sf{sfa:g}->sf{sfb:g}"
            if ta < MIN_SECS:
                over.setdefault(row, []).append(False)
                continue
            limit = (data_ratio ** DESIGNED.get(row, 1.0)) * SLACK
            ratio = tb / ta
            flagged = ratio > limit
            over.setdefault(row, []).append(flagged)
            if flagged:
                detail.setdefault(row, []).append({
                    "pair": pair, "wall_ratio": round(ratio, 2),
                    "limit": round(limit, 2), "secs": [ta, tb]})
    flagged2 = sorted(
        r for r, flags in over.items()
        if any(a and b for a, b in zip(flags, flags[1:])))
    print(json.dumps({
        "points": [{"sf": sf, "file": p} for sf, p, _ in points],
        "slack": SLACK, "min_secs": MIN_SECS, "designed": DESIGNED,
        "single_pair_flags": detail,
        "flagged": flagged2,
    }, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
