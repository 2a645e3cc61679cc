#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped
by `graft.Verify`, run its DuckDB oracle on the same sf tables and compare
(sorted columns, exact values, row order as produced). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir> [queryName ...]
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures, ok, noracle = [], 0, 0
    for name in sorted(oracles) if not only else sorted(only):
        sql = oracles.get(name)
        if sql is None:
            noracle += 1
            continue
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"oracle failed: {e}"))
            continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            failures.append((name, f"schema mismatch: spark={s_cols} duck={d_cols}"))
            continue
        if spark_tbl.num_rows != duck.num_rows:
            failures.append((name, f"rows: spark={spark_tbl.num_rows} duck={duck.num_rows}"))
            continue
        bad = None
        for c in s_cols:
            sv = spark_tbl.column(c).to_pylist()
            dv = duck.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if a != b and not (math.isnan(a) and math.isnan(b)):
                        bad = f"col {c} row {i}: spark={a!r} duck={b!r} (diff={abs(a-b)})"
                        break
                elif str(a) != str(b):
                    bad = f"col {c} row {i}: spark={a!r} duck={b!r}"
                    break
            if bad:
                break
        if bad:
            failures.append((name, bad))
        else:
            ok += 1
            print(f"  OK {name} ({spark_tbl.num_rows} rows)")
    print(f"\n{ok} ok, {len(failures)} failed, {noracle} no-oracle (rows-only)")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    sys.exit(1 if failures else 0)

main()
