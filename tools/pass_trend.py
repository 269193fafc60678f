#!/usr/bin/env python3
"""Classify cross-pass slowdown rows in BENCH_DETAIL records (judge r14 #1).

Usage: python3 tools/pass_trend.py <detail1.json> [detail2.json ...]

The question this answers: when a row's pass-3 time exceeds its pass-1 time
by >1.25x inside one bench run, is that (a) per-query session residue (the
same rows would grow in EVERY run — code-attached), or (b) transient host
stalls / long-tail scheduling noise (different rows each run, and the
affected rows cluster in suite order because a multi-second stall hits
whichever queries happen to be on the clock)?

Per record it reports:
  - rows with pass3/pass1 > 1.25x, in suite (alphabetical = execution)
    order, with their run-position, so temporal clustering is visible;
  - a clustering score: the fraction of flagged rows whose nearest flagged
    neighbor is within 3 run-positions (a host stall hits consecutive
    queries; independent per-query residue would scatter);
  - expected-by-chance context: with 3 passes of i.i.d. noise, P(monotone
    increasing) = 1/6 per row, so ~33 of ~200 rows read monotone before any
    ratio filter — a handful above 1.25x is consistent with noise alone.

Across records it reports the INTERSECTION of flagged rows: a query that
grows in every run is code-attached and needs a fix; an empty intersection
says the growth is not attached to queries, i.e. environment.
"""
import json
import sys

THRESH = 1.25


def flagged(path):
    with open(path) as f:
        d = json.load(f)
    qp = d.get("queries_passes")
    if not qp:
        sys.exit(f"{path}: no queries_passes (pre-round-14 record)")
    # stage: rows execute INSIDE their triggering query (q35 etc.), not at
    # their own alphabetical slot ('s' > 'q' would park them all at the end
    # of the suite and skew the adjacency clustering) — exclude them from
    # the position analysis; their growth is attributed via their consumer
    # queries and bench_compare's stage rows.
    names = sorted(n for n in qp if not n.startswith("stage:"))
    pos = {n: i for i, n in enumerate(names)}
    rows = []
    for n in names:
        ps = [v for v in qp[n] if v is not None]
        if len(ps) == 3 and ps[0] > 0 and ps[2] / ps[0] > THRESH:
            rows.append((n, pos[n], ps))
    return d, names, rows


def cluster_score(rows):
    if len(rows) < 2:
        return None
    ps = sorted(p for _, p, _ in rows)
    near = sum(1 for i, p in enumerate(ps)
               if (i > 0 and p - ps[i - 1] <= 3) or
                  (i + 1 < len(ps) and ps[i + 1] - p <= 3))
    return near / len(ps)


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    all_sets = []
    for path in sys.argv[1:]:
        d, names, rows = flagged(path)
        anchors = d.get("anchors", {})
        anc = "/".join(str(round(v["par_ms"])) for v in anchors.values())
        print(f"\n{path}: {len(rows)} rows with pass3/pass1 > {THRESH}x "
              f"of {len(names)} (chance-monotone baseline ~= "
              f"{len(names) // 6} rows before the ratio filter); "
              f"anchors par_ms {anc or 'n/a'}; "
              f"pass_valid {d.get('pass_valid', 'n/a')}")
        for n, p, ps in sorted(rows, key=lambda r: r[1]):
            print(f"  pos {p:3d} {n:32s} {ps} "
                  f"({ps[2] / ps[0]:.2f}x)")
        cs = cluster_score(rows)
        if cs is not None:
            print(f"  clustering: {cs:.0%} of flagged rows have a flagged "
                  "neighbor within 3 run-positions "
                  "(high = stall-shaped, low = scattered)")
        all_sets.append({n for n, _, _ in rows})
    if len(all_sets) > 1:
        inter = set.intersection(*all_sets)
        desc = (sorted(inter) if inter else
                "{} — no row grows in every run; the growth is "
                "environmental, not code-attached")
        print(f"\nintersection across {len(all_sets)} records: {desc}")


if __name__ == "__main__":
    main()
