#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/check.py <sfDir> <outDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (writes
<outDir>/<name>/ parquet + <outDir>/oracle_sql.json). For each query this
re-runs the oracle SQL in DuckDB over views named after the fixture tables and
compares: column names (sorted), row counts, and values (rows sorted by all
columns; exact for non-floats, exact-then-1e-9-tolerance report for floats).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def load_result(path):
    # directory of part-*.parquet written by Spark
    files = [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])

def canon(table):
    cols = sorted(table.column_names)
    rows = []
    for i in range(table.num_rows):
        rows.append(tuple(table.column(c)[i].as_py() for c in cols))
    def key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)
    rows.sort(key=key)
    return cols, rows

def cmp_vals(a, b):
    if a is None and b is None:
        return True, 0.0
    if a is None or b is None:
        return False, float("inf")
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, float("inf")
        if fa == fb:
            return True, 0.0
        diff = abs(fa - fb)
        rel = diff / max(abs(fa), abs(fb), 1e-300)
        return rel < 1e-9, rel
    if isinstance(a, (int,)) and isinstance(b, (int,)):
        return a == b, 0.0 if a == b else float("inf")
    return a == b, 0.0 if a == b else float("inf")

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        name = name[:-8] if name.endswith(".parquet") else name
        spark_tbl = load_result(path)
        if spark_tbl is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({spark_tbl.num_rows} rows)"); continue
        try:
            duck_tbl = con.sql(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sc, srows = canon(spark_tbl)
        dc, drows = canon(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1; continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}"); n_fail += 1; continue
        bad = None
        exact = True
        max_rel = 0.0
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            for c, (sv, dv) in zip(sc, zip(sr, dr)):
                ok, rel = cmp_vals(sv, dv)
                if sv != dv:
                    exact = False
                    max_rel = max(max_rel, rel if rel == rel else 0)
                if not ok:
                    bad = (i, c, sv, dv)
                    break
            if bad:
                break
        if bad:
            i, c, sv, dv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={sv!r} duck={dv!r}")
            n_fail += 1
        else:
            tag = "exact" if exact else f"float-tol maxrel={max_rel:.2e}"
            print(f"PASS {name}: {len(srows)} rows [{tag}]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
