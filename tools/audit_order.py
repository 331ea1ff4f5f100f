#!/usr/bin/env python3
"""Total-order audit over every declared oracle (SURVEY §2 policy #1/#8).

For each query in a Verify dump's oracle_sql.json, takes the FINAL ORDER BY
column list and checks, against a fixture dir in DuckDB:
  1. do ties exist in those columns over the full result?
  2. if so, is every output column part of the ORDER BY?
A query with ties AND unordered payload columns is nondeterministic between
engines (DuckDB's parallel sort reorders ties run-to-run above ~6M rows —
the round-5 sf1 rehearsal caught scan_project exactly this way). Rows tied
on ALL output columns are full duplicates and compare equal, so ordering
the whole projection is always sufficient.

Usage: audit_order.py [sfDir] [verifyOutDir]   (defaults: repo sf1 dump)
Exit code 1 when anything is flagged. Dev-tooling, like parity.py.
"""
import duckdb, json, re, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

d = duckdb.connect()
for t in TABLES:
    d.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
oracle = json.load(open(f"{OUT}/oracle_sql.json"))

flagged, skipped = [], []
for name, sql in oracle.items():
    idx = sql.upper().rfind("ORDER BY")
    # rfind can land on a window/subquery ORDER BY when the query has no
    # FINAL one — the identifier regex then rejects the garbage tail, so
    # both "no ORDER BY at all" and "unparseable tail" fall through to the
    # multi-row check below instead of silently passing
    tail = "" if idx < 0 else re.sub(
        r"\b(LIMIT|OFFSET)\s+\d+", "", sql[idx + 8:], flags=re.I).strip()
    cols = [re.sub(r"\s+(DESC|ASC|NULLS\s+FIRST|NULLS\s+LAST)\b", "", c,
                   flags=re.I).strip() for c in tail.split(",")] if tail else []
    if not cols or not all(
            re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", c) for c in cols):
        why = "no-order-by" if not cols else "expression-order: " + tail[:60]
        try:
            nrows = d.sql(f"WITH q AS ({sql}) SELECT count(*) FROM q").fetchone()[0]
        except Exception as e:  # noqa: BLE001
            nrows = -1
            why += " | count-err: " + str(e)[:60]
        if nrows == 1 and idx < 0:
            skipped.append((name, why + " (single row — fine)"))
        else:
            # a multi-row result whose final ordering we could not prove
            # total is a FLAG, not a skip — the audit must not exit 0 on
            # exactly the class it exists to catch
            flagged.append((name, -1, [why + f" ({nrows} rows)"]))
        continue
    cols = [c.split(".")[-1] for c in cols]
    try:
        nties = d.sql(
            f"WITH q AS ({sql}) SELECT count(*) FROM ("
            f"SELECT count(*) c FROM q GROUP BY {', '.join(cols)} "
            f"HAVING count(*) > 1)").fetchone()[0]
        if nties:
            qcols = [c[0] for c in
                     d.sql(f"WITH q AS ({sql}) SELECT * FROM q LIMIT 0").description]
            missing = [c for c in qcols if c not in cols]
            if missing:
                flagged.append((name, nties, missing))
    except Exception as e:  # noqa: BLE001 — report, don't die mid-audit
        skipped.append((name, "probe-err: " + str(e)[:80]))

for name, nties, missing in flagged:
    print(f"FLAG {name}: {nties} tie groups in ORDER BY cols, "
          f"unordered payload {missing}")
for name, why in skipped:
    print(f"skip {name}: {why}")
print(f"== {len(flagged)} flagged / {len(oracle)} queries "
      f"({len(skipped)} skipped)")
sys.exit(1 if flagged else 0)
