#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json records in raw AND anchor-normalized units.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [top_n]

Why: cross-round bench deltas on this host mix code changes with documented
multi-minute host slow windows (uniform 15-50% inflation). Records written
since round 10 carry per-pass HostAnchor measurements and queries_norm /
total_norm (see HostAnchor.scala); comparing the NORMALIZED columns removes
the host term, so a residual delta is attributable to code. Older records
(pre-round-10) have no anchors — the tool falls back to raw-only for them
and says so.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    for label, d in (("old", old), ("new", new)):
        anc = d.get("anchors")
        anc_s = (" anchors_par_ms=" +
                 "/".join(str(round(v["par_ms"])) for v in anc.values())
                 if anc else " (no anchors: pre-round-10 record)")
        print(f'{label}: total={d["value"]}s'
              f' total_norm={d.get("total_norm", "n/a")}s'
              f' n={len(d.get("queries", {}))}{anc_s}')

    both = set(old.get("queries", {})) & set(new.get("queries", {}))
    have_norm = "queries_norm" in old and "queries_norm" in new
    key = "queries_norm" if have_norm else "queries"
    print(f'\nper-query deltas ({ "normalized" if have_norm else "RAW — at least one record lacks anchors" }),'
          f' worst {top_n} regressions first:')
    rows = []
    for q in both:
        o, n = old[key].get(q, old["queries"][q]), new[key].get(q, new["queries"][q])
        if o > 0:
            rows.append((n / o, q, o, n))
    rows.sort(key=lambda t: -t[0])
    for r, q, o, n in rows[:top_n]:
        print(f"  {q:32s} {o:7.3f} -> {n:7.3f}  {r:5.2f}x")
    print("  ...")
    for r, q, o, n in rows[-5:]:
        print(f"  {q:32s} {o:7.3f} -> {n:7.3f}  {r:5.2f}x")
    import statistics
    print(f"\nmedian ratio: {statistics.median(r for r, *_ in rows):.3f}"
          f"  (uniform shift = host-like; concentrated = code-like)")


if __name__ == "__main__":
    main()
