#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped
by `graft.Verify`, run its DuckDB oracle on the same sf tables and compare
(sorted columns, arrow TYPES, exact values, row order as produced). The
driver's hash is type-sensitive — a Spark int64 against a DuckDB
decimal128(38,0) hash-mismatches even when every stringified cell agrees —
so this checker compares arrow schemas BEFORE values (the r18 lesson:
eleven oracles shipped "green" under a str()-only compare).
Usage:
    python3 tools/check.py [--types-only] <sfDir> <verifyOutDir> [queryName ...]
--types-only skips the value compare (cheap full-catalog type sweep).
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normtype(t):
    """Equivalence classes the driver's arrow-level compare tolerates:
    duckdb surfaces utf8 where spark parquet reads back large_utf8 (and
    vice versa depending on versions) — same for binary. Everything else
    (int32/int64/decimal128/float64/bool/date/timestamp) must match
    exactly; decimal vs int is precisely the r18 failure class."""
    s = str(t)
    if s in ("large_string", "large_utf8"):
        return "string"
    if s == "utf8":
        return "string"
    if s in ("large_binary",):
        return "binary"
    return s

def main():
    args = sys.argv[1:]
    types_only = "--types-only" in args
    if types_only:
        args.remove("--types-only")
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
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
            # types-only: resolve the oracle's schema without executing it
            # (LIMIT 0 over a subquery plans but streams no rows) — this is
            # what makes the registration-time sweep actually cheap
            duck_sql = f"SELECT * FROM ({sql}) __t LIMIT 0" if types_only else sql
            duck = con.execute(duck_sql).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"oracle failed: {e}"))
            continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            failures.append((name, f"schema mismatch: spark={s_cols} duck={d_cols}"))
            continue
        tbad = [
            (c, str(spark_tbl.schema.field(c).type), str(duck.schema.field(c).type))
            for c in s_cols
            if normtype(spark_tbl.schema.field(c).type) != normtype(duck.schema.field(c).type)
        ]
        if tbad:
            failures.append((name, "type mismatch: " + "; ".join(
                f"col {c}: spark={st} duck={dt}" for c, st, dt in tbad)))
            continue
        if types_only:
            # the oracle ran under LIMIT 0 — no rows to compare
            ok += 1
            print(f"  OK(types) {name}")
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
