#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir under outDir, loads the Spark parquet result and runs the
corresponding DuckDB oracle SQL from oracle_sql.json against the same sfDir
parquet tables, then compares schema (column names sorted), row count, and
values (columns sorted by name; rows compared both as ordered lists and as
sorted multisets so we know whether only ordering differs).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>

NB: the side-file queries (csv/orc/xml round trips, s12 compaction,
s15 schema evolution, wx_file_ingest, a13/a15 incremental state) read
/tmp artifacts written by
the most recent Spark run; re-running this check after a Verify/Bench at a
DIFFERENT scale factor compares fresh oracle reads against stale dumps.
Always re-run Verify at the same sfDir immediately before this check.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        spark_cols = list(spark_rel.columns)
        spark_rows = spark_rel.fetchall()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_rows)} rows")
            continue
        try:
            or_rel = con.sql(oracles[name])
            or_cols = list(or_rel.columns)
            or_rows = or_rel.fetchall()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(spark_cols) != sorted(or_cols):
            ok = False
            msgs.append(f"schema: spark={sorted(spark_cols)} oracle={sorted(or_cols)}")
        else:
            # Driver-side comparators may go through pandas/arrow where
            # DuckDB HUGEINT / DECIMAL render differently than int64
            # ("123.0" vs "123") — flag physical-type divergence as failure
            # even though fetchall() hides it (round-3 lesson: 8 queries).
            sp_types = dict(zip(spark_cols, [str(t) for t in spark_rel.types]))
            or_types = dict(zip(or_cols, [str(t) for t in or_rel.types]))
            for c in spark_cols:
                st, ot = sp_types[c], or_types[c]
                ints = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")
                if st != ot and ((ot in ("HUGEINT", "UHUGEINT") or ot.startswith("DECIMAL")) and st in ints):
                    ok = False
                    msgs.append(f"type divergence on {c}: spark={st} oracle={ot} (cast oracle to BIGINT/DOUBLE)")
        if len(spark_rows) != len(or_rows):
            ok = False
            msgs.append(f"rowcount: spark={len(spark_rows)} oracle={len(or_rows)}")
        if ok:
            # align column order by sorted name
            sp_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
            or_idx = [or_cols.index(c) for c in sorted(or_cols)]
            sp = [tuple(norm(r[i]) for i in sp_idx) for r in spark_rows]
            oc = [tuple(norm(r[i]) for i in or_idx) for r in or_rows]
            if sp != oc:
                ok = False
                if sorted(sp) == sorted(oc):
                    msgs.append("values match as multiset but ROW ORDER differs")
                    for i, (a, b) in enumerate(zip(sp, oc)):
                        if a != b:
                            msgs.append(f"  first order diff at row {i}: spark={a} oracle={b}")
                            break
                else:
                    diff = 0
                    for i, (a, b) in enumerate(zip(sorted(sp), sorted(oc))):
                        if a != b:
                            msgs.append(f"  value diff (sorted) row {i}: spark={a} oracle={b}")
                            diff += 1
                            if diff >= 3:
                                break
        if ok:
            n_pass += 1
            print(f"✓ {name}: {len(spark_rows)} rows")
        else:
            n_fail += 1
            print(f"✗ {name}:")
            for m in msgs:
                print(f"    {m}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
