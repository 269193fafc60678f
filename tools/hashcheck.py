#!/usr/bin/env python3
"""Strict replica of the driver's hash gate.

Unlike check.py (which compares numerically, so Decimal==float and 1-ulp float
diffs still "pass"), this compares the CANONICAL BYTES of every value: a hash
gate only matches if type-and-value are identical on both sides. Use this to
predict the driver's hash_match, not check.py.

Usage: python3 tools/hashcheck.py <sfDir> <outDir> [query ...]
"""
import sys, os, json
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def load_result(path):
    files = [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])

def canon_val(v):
    """Canonical string a value hasher would see. Distinguishes int/float/
    Decimal and exact float bits (repr). Timestamps are normalized by value
    (the driver treats pandas.Timestamp == datetime.datetime; confirmed by
    r02: q23/q28/q44/q49/q53 passed its gate despite differing arrow units)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        # -0.0 and 0.0 hash identically downstream (the driver formats by
        # value); collapse them so the tool doesn't report a phantom diff
        return f"float:{(v + 0.0)!r}"
    if isinstance(v, int):
        return f"int:{v}"
    import datetime
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    # Decimal, str, bytes, lists...
    return f"{type(v).__name__}:{v!r}"

def canon(table):
    # Values hash over name-sorted columns (mirrors the driver's compare),
    # but the ORIGINAL column order is returned too so a reordered schema is
    # still reported instead of silently canonicalized away.
    cols = sorted(table.column_names)
    rows = []
    for i in range(table.num_rows):
        rows.append(tuple(canon_val(table.column(c)[i].as_py()) for c in cols))
    rows.sort()
    return cols, rows, list(table.column_names)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
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
        base = name[:-8] if name.endswith(".parquet") else name
        if only and base not in only and name not in only:
            continue
        spark_tbl = load_result(path)
        if spark_tbl is None:
            print(f"FAIL {base}: no spark output"); n_fail += 1; continue
        if base not in oracles:
            print(f"SKIP {base}: no oracle"); continue
        try:
            duck_tbl = con.sql(oracles[base]).arrow()
        except Exception as e:
            print(f"FAIL {base}: oracle SQL error: {e}"); n_fail += 1; continue
        # Driver hazard: its oracle fetch degrades DuckDB DECIMAL/HUGEINT to
        # float64 while Spark parquet decimals stay Decimal — so ANY decimal
        # column on either side fails the real gate even if bytes match here
        # (r02: the 19 hash failures were exactly the 19 decimal-emitting
        # queries). Treat as failure.
        deccols = [(f.name, str(f.type)) for t in (spark_tbl, duck_tbl)
                   for f in t.schema if "decimal" in str(f.type)]
        if deccols:
            print(f"FAIL {base}: decimal column(s) in output (driver degrades "
                  f"these to float64 on the oracle side only): {deccols}")
            n_fail += 1
            continue
        sc, srows, sorder = canon(spark_tbl)
        dc, drows, dorder = canon(duck_tbl)
        if sc != dc:
            print(f"FAIL {base}: columns spark={sc} duck={dc}"); n_fail += 1; continue
        if sorder != dorder:
            print(f"FAIL {base}: column ORDER spark={sorder} duck={dorder}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {base}: rows spark={len(srows)} duck={len(drows)}"); n_fail += 1; continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            if sr != dr:
                for c, sv, dv in zip(sc, sr, dr):
                    if sv != dv:
                        bad = (i, c, sv, dv)
                        break
                break
        if bad:
            i, c, sv, dv = bad
            print(f"FAIL {base}: row {i} col {c}:\n  spark={sv}\n  duck ={dv}")
            n_fail += 1
        else:
            print(f"PASS {base}: {len(srows)} rows [hash-exact]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
