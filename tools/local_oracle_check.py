#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB-oracle correctness gate.

NOT part of the shipped Scala engine (python/duckdb are driver-side
tools). Usage:
    sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
    python3 tools/local_oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
Compares each SparkEntry query's parquet dump against its oracle SQL:
arrow schema (after sorting columns by name), row count, and exact
values (rows sorted by all columns).
"""
import sys, json, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            mine = con.sql(f"SELECT * FROM read_parquet({files!r})").arrow()
            theirs = con.sql(sql).arrow()
            # sort columns by name (driver contract)
            mc = mine.select(sorted(mine.column_names))
            tc = theirs.select(sorted(theirs.column_names))
            problems = []
            if mc.column_names != tc.column_names:
                problems.append(f"cols {mc.column_names} vs {tc.column_names}")
            else:
                if mc.schema != tc.schema:
                    problems.append(f"schema\n  mine:   {mc.schema}\n  oracle: {tc.schema}")
                if mc.num_rows != tc.num_rows:
                    problems.append(f"rows {mc.num_rows} vs {tc.num_rows}")
                mp = mc.to_pandas().sort_values(mc.column_names).reset_index(drop=True)
                tp = tc.to_pandas().sort_values(tc.column_names).reset_index(drop=True)
                if not mp.equals(tp):
                    neq = (mp != tp) & ~(mp.isna() & tp.isna())
                    bad = neq.any(axis=1)
                    diff = bad.sum()
                    ex = ""
                    if diff:
                        i = bad.idxmax()
                        ex = f" e.g. row {i}:\n  mine:   {mp.loc[i].to_dict()}\n  oracle: {tp.loc[i].to_dict()}"
                    problems.append(f"values ({diff} rows differ){ex}")
            if problems:
                print(f"FAIL {name}: " + "; ".join(problems))
                n_fail += 1
            else:
                print(f"PASS {name} ({mc.num_rows} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: EXC {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail of {len(oracle)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
