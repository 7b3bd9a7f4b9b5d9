"""Local stand-in for the driver's correctness gate: runs every
__spark_entry__.queries() entry at sf0.01 and compares against
oracle_sql() via DuckDB — row count, column names, order-insensitive
value hash (values stringified with float rounding).

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(only: list[str]) -> int:
    import __spark_entry__ as entry
    from ganda_spark.session import get_spark

    spark = get_spark("oracle-check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create or replace view {t} as "
            f"select * from '{SF_DIR}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            spark_cols = [c.lower() for c in df.columns]
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(spark_rows)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            duck_cols = [c.lower() for c in res.columns]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if not problems:
            hs = value_hash(spark_rows, spark_cols)
            hd = value_hash(duck_rows, duck_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a small diff sample
                ss = {
                    "\x1f".join(
                        _norm(r[i])
                        for i in sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                    )
                    for r in spark_rows
                }
                ds = {
                    "\x1f".join(
                        _norm(r[i])
                        for i in sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
                    )
                    for r in duck_rows
                }
                for x in list(ss - ds)[:3]:
                    print(f"   spark-only: {x[:160]}")
                for x in list(ds - ss)[:3]:
                    print(f"   duck-only : {x[:160]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"PASS {name}: rows={len(spark_rows)} [{time.time()-t0:.1f}s]")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:]) else 0)
