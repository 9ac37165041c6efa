#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads each Verify output parquet, runs the matching oracle SQL in DuckDB
against the same testdata parquet tables, and compares: columns sorted by
name, rows sorted, values hashed. Usage:

    python3 tools/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out


def main(outdir, sfdir, report_path=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = skipped = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        # Verify dumps oracle_sql.json in full even under
        # SPARK_GRAFT_VERIFY_ONLY; skip queries that were not dumped.
        import os
        if not os.path.isdir(f"{outdir}/{name}"):
            skipped += 1
            report[name] = {"status": "not_dumped"}
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            duck_cols = [c.lower() for c in duck_rel.columns]
            # The driver's harness may canonicalize non-int64 integer types
            # (HUGEINT from sum(), DECIMAL) via float/Decimal -> "187.0" !=
            # "187". Flag them so the oracle SQL gets an explicit CAST.
            for c, t in zip(duck_rel.columns, duck_rel.types):
                if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL"):
                    print(f"WARN {name}: column {c} has oracle type {t}; "
                          f"CAST it to BIGINT/DOUBLE in the oracle SQL")
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            bad += 1
            report[name] = {"status": "fail", "err": str(e)[:500]}
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} != {sorted(duck_cols)}")
            bad += 1
            report[name] = {"status": "fail", "err": "schema mismatch",
                            "spark_cols": sorted(spark_cols),
                            "oracle_cols": sorted(duck_cols)}
            continue
        a = table_key(spark_rows, spark_cols)
        b = table_key(duck_rows, duck_cols)
        if a == b:
            print(f"OK   {name} ({len(a)} rows)")
            ok += 1
            report[name] = {"status": "ok", "rows": len(a)}
        else:
            report[name] = {"status": "fail", "err": "value mismatch",
                            "spark_rows": len(a), "oracle_rows": len(b)}
            print(f"FAIL {name}: value mismatch ({len(a)} vs {len(b)} rows)")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  row {i}: spark={x}")
                    print(f"          duck ={y}")
                    break
            if len(a) != len(b):
                sa, sb = set(map(tuple, a)), set(map(tuple, b))
                print(f"  only-spark: {list(sa - sb)[:2]}")
                print(f"  only-duck : {list(sb - sa)[:2]}")
            bad += 1
    print(f"\n{ok} ok, {bad} fail" +
          (f", {skipped} not dumped (VERIFY_ONLY filter)" if skipped else ""))
    if report_path:
        summary = {"sf_dir": sfdir,
                   "counts": {"ok": ok, "fail": bad, "not_dumped": skipped},
                   "queries": report}
        with open(report_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"report -> {report_path}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
