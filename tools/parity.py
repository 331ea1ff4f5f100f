#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY §5.2, §7.1).

Usage: parity.py [sfDir] [verifyOutDir] [only_query1,only_query2,...]

Reads each Spark result dumped by `graft.Verify` (one parquet dir per query)
plus `oracle_sql.json`, runs every oracle in DuckDB over the same fixture
tables, and compares:
  1. column-name sets (driver sorts columns by name before hashing),
  2. DuckDB-level column types (the driver flagged TINYINT vs BIGINT in r1),
  3. row counts,
  4. every value, in row order (assume the driver's hash is order-sensitive).

This is deliberately STRICTER and chattier than the driver: on mismatch it
prints the first few differing rows so the failure is debuggable.
Dev-tooling only — the engine itself is pure Scala/Spark.
"""
import duckdb, json, sys, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    fails = []
    names = [n for n in sorted(oracles) if only is None or n in only]
    for name in names:
        sql = oracles[name]
        d = f"{out}/{name}"
        if not glob.glob(f"{d}/*.parquet"):
            print(f"FAIL {name}: no spark output at {d}")
            fails.append(name)
            continue
        try:
            stypes = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()}
            otypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
            srows = con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet')").fetch_arrow_table()
            orows = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            fails.append(name)
            continue
        ok = True
        if sorted(stypes) != sorted(otypes):
            print(f"FAIL {name}: columns spark={sorted(stypes)} oracle={sorted(otypes)}")
            ok = False
        else:
            tdiff = {c: (stypes[c], otypes[c]) for c in stypes if stypes[c] != otypes[c]}
            if tdiff:
                print(f"FAIL {name}: type mismatch (spark, oracle): {tdiff}")
                ok = False
        if srows.num_rows != orows.num_rows:
            print(f"FAIL {name}: rows spark={srows.num_rows} oracle={orows.num_rows}")
            ok = False
        if ok:
            cols = sorted(srows.column_names)
            s = srows.select(cols).to_pylist()
            o = orows.select(cols).to_pylist()
            ndiff = 0
            for i, (a, b) in enumerate(zip(s, o)):
                if a != b:
                    if ndiff < 4:
                        da = {k: v for k, v in a.items() if b.get(k) != v}
                        db = {k: b.get(k) for k in da}
                        print(f"FAIL {name}: row {i} spark={da} oracle={db}")
                    ndiff += 1
            if ndiff:
                print(f"FAIL {name}: {ndiff}/{len(s)} rows differ")
                ok = False
        if ok:
            print(f"PASS {name} ({srows.num_rows} rows)")
        else:
            fails.append(name)
    print(f"== {len(names) - len(fails)}/{len(names)} pass" +
          (f"; FAILING: {', '.join(fails)}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
