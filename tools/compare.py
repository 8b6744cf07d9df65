#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate:
read each Spark result parquet from the Verify outDir, run the paired
oracle SQL in DuckDB over the raw testdata tables, sort columns by name
and rows by all columns, and compare values exactly.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.sql(rel_sql).df()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = df.values.tolist()
    out = []
    for r in rows:
        vals = []
        for v in r:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out), list(df.columns)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # a table may be a single parquet file (the shipped testdata) or a
        # directory of part files (Spark-written variants, e.g. the r17
        # multi-split scaling testdata) — glob the directory form
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got, gcols = canon(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            want, wcols = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:300]}")
            fail += 1
            continue
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            fail += 1
        elif got != want:
            diff = [(g, w) for g, w in zip(got, want) if g != w]
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows, "
                  f"{len(diff)} differing (of zipped)")
            for g, w in diff[:3]:
                print(f"   spark: {g}\n  oracle: {w}")
            if len(got) != len(want):
                only_g = set(got) - set(want)
                only_w = set(want) - set(got)
                for x in list(only_g)[:2]:
                    print(f"   only-spark: {x}")
                for x in list(only_w)[:2]:
                    print(f"  only-oracle: {x}")
            fail += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
