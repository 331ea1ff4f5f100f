#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY §5.2, §7.1).

Usage: parity.py [sfDir] [verifyOutDir] [only_query1,only_query2,...]

Reads each Spark result dumped by `graft.Verify` (one parquet dir per query)
plus `oracle_sql.json`, runs every oracle in DuckDB over the same fixture
tables, and compares:
  1. column-name sets (driver sorts columns by name before hashing),
  2. DuckDB-level column types (the driver flagged TINYINT vs BIGINT in r1),
  3. row counts,
  4. every value, in row order, at STRING level after mimicking the
     driver's two read paths: the Spark result via pandas.read_parquet
     (decimals stay Decimal objects with their parquet scale — trailing
     zeros and all) and the oracle via duckdb .df() (decimals → float64).
     Round 2 proved numeric equality is NOT enough: all 15 hash_match
     failures were Decimal('x.00') vs float repr divergences that a
     value-level compare (both sides read through DuckDB) cannot see.

This is deliberately STRICTER and chattier than the driver: on mismatch it
prints the first few differing rows so the failure is debuggable.
Dev-tooling only — the engine itself is pure Scala/Spark.
"""
import duckdb, json, os, re, sys, glob
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def survey2_keys(path="/root/repo/SURVEY.md"):
    """SURVEY §2 operator keys, same extraction as SurveyContractSpec."""
    txt = open(path, encoding="utf-8").read()
    start, end = txt.index("## §2."), txt.index("## §3.")
    return set(re.findall(r"(?m)^\| `([a-z0-9_]+)` \|", txt[start:end]))


def declare_order_check(out):
    """r6 verdict #6: the doc-drift that broke round 6's sbt test must be
    caught by the LOCAL gate too. Three sets must coincide on a full run:
    SURVEY §2 keys, Verify's dumped query dirs (== SparkEntry.queries
    keys), and oracle_sql.json keys ∪ the declared no-oracle set (dirs
    without an oracle are the P3 sketch tier — they must still be dumped).
    Returns a list of human-readable problems (empty == green)."""
    probs = []
    doc = survey2_keys()
    dirs = {d for d in os.listdir(out)
            if os.path.isdir(os.path.join(out, d))}
    oracles = set(json.load(open(f"{out}/oracle_sql.json")))
    if dirs != doc:
        if doc - dirs:
            probs.append(f"documented-but-not-dumped: {sorted(doc - dirs)}")
        if dirs - doc:
            probs.append(f"dumped-but-undocumented: {sorted(dirs - doc)}")
    if oracles - dirs:
        probs.append(f"oracle-without-query-output: {sorted(oracles - dirs)}")
    return probs


def norm(v):
    """Driver-hash-faithful normalization: everything becomes a string the
    way the respective pandas frame would stringify it. Only genuine nulls
    are unified (both paths agree on missingness, not representation)."""
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ", ".join(norm(x) for x in v) + "]"
    if v is None:
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bytes, bytearray)):
        return "bytes:" + bytes(v).hex()
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.integer):
        v = int(v)
    return str(v)


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
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {d}")
            fails.append(name)
            continue
        try:
            stypes = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()}
            otypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
            # Driver read paths: pandas for the Spark parquet, .df() for DuckDB.
            sdf = pd.read_parquet(d)
            odf = con.execute(sql).df()
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
        # Decimal/binary/nested outputs are banned outright: the driver's
        # hash sees Decimal scale (trailing zeros), chokes sorting
        # bytearrays, AND crashes in pandas sort_values on list/ndarray
        # cells (round-3's agg_collect_set_list red row — arrays were the
        # harness blind spot: norm() used to paper over them).
        def banned(t):
            return ("DECIMAL" in t or t == "BLOB" or "[]" in t
                    or t.startswith("MAP(") or t.startswith("STRUCT("))
        bad = sorted({c for c, t in list(stypes.items()) + list(otypes.items())
                      if banned(t)})
        if bad:
            print(f"FAIL {name}: decimal/binary/nested output columns {bad} — "
                  f"emit only double/bigint/string/timestamp/boolean "
                  f"(array_join arrays, hex binaries) in BOTH engines")
            ok = False
        # Replay the driver's real read path verbatim: it row-sorts the
        # whole frame before hashing, which is exactly where unhashable
        # cell types explode. A query must survive this, not just the
        # normalized cell compare below.
        try:
            sdf.sort_values(by=list(sdf.columns))
            odf.sort_values(by=list(odf.columns))
        except Exception as e:
            print(f"FAIL {name}: driver row-sort replay crashed: "
                  f"{type(e).__name__}: {e}")
            ok = False
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            ok = False
        if ok:
            cols = sorted(sdf.columns)
            ndiff = 0
            for c in cols:
                sv = sdf[c].tolist()
                ov = odf[c].tolist()
                for i, (a, b) in enumerate(zip(sv, ov)):
                    na, nb = norm(a), norm(b)
                    if na != nb:
                        if ndiff < 4:
                            print(f"FAIL {name}: row {i} col {c} "
                                  f"spark={na!r} ({type(a).__name__}) "
                                  f"oracle={nb!r} ({type(b).__name__})")
                        ndiff += 1
            if ndiff:
                print(f"FAIL {name}: {ndiff} cell diffs")
                ok = False
        if ok:
            print(f"PASS {name} ({len(sdf)} rows)")
        else:
            fails.append(name)
    contract = [] if only is not None else declare_order_check(out)
    for p in contract:
        print(f"FAIL declare-order: {p}")
    print(f"== {len(names) - len(fails)}/{len(names)} pass" +
          (f"; FAILING: {', '.join(fails)}" if fails else ""))
    sys.exit(1 if fails or contract else 0)


if __name__ == "__main__":
    main()
